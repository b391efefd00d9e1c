"""Round-5 continuation batch: KMV sketch, two-sample KS, Cohen's kappa,
HITS hubs/authorities."""

import hashlib
import math

import pyspark.sql.functions as F
import pytest


def _md5_60(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------- KMV


def test_kmv_exact_branch_below_k(spark):
    from minimel_spark.operators.sketch import kmv_distinct

    df = spark.createDataFrame(
        [("g", f"u{i % 7}") for i in range(40)], "grp string, v string"
    )
    row = kmv_distinct(df, ["grp"], "v", k=64).first()
    assert row["n_kept"] == 7
    assert row["kmv_estimate"] == 7.0  # sketch IS the exact count below k
    assert row["n_exact"] == 7
    assert row["rel_err"] == 0.0


def test_kmv_saturated_matches_python_reference(spark):
    from minimel_spark.operators.sketch import kmv_distinct

    k = 16
    values = [f"url://{i}" for i in range(500)]
    df = spark.createDataFrame([("g", v) for v in values], "grp string, v string")
    row = kmv_distinct(df, ["grp"], "v", k=k).first()
    hs = sorted({_md5_60(v) for v in values})[:k]
    assert row["n_kept"] == k
    assert row["kth_hash"] == hs[-1]
    expect = float((k - 1) * (1 << 60)) / float(hs[-1])
    assert row["kmv_estimate"] == expect
    # ~1/sqrt(k-2) std err; be generous but assert sanity
    assert abs(row["rel_err"]) < 0.8


def test_kmv_union_equals_direct_sketch(spark):
    from minimel_spark.operators.sketch import kmv_distinct, kmv_union

    k = 8
    a = [("g", f"a{i}") for i in range(100)]
    b = [("g", f"b{i}") for i in range(100)] + a[:50]
    da = spark.createDataFrame(a, "grp string, v string")
    db = spark.createDataFrame(b, "grp string, v string")
    direct = kmv_distinct(da.union(db), ["grp"], "v", k=k, exact=False).first()

    def kept(df):
        h = df.select(
            "grp",
            F.conv(F.substring(F.md5(F.col("v")), 1, 15), 16, 10)
            .cast("long")
            .alias("_h"),
        )
        return h
    merged = kmv_union(kept(da).union(kept(db)), ["grp"], k=k).first()
    assert merged["n_kept"] == direct["n_kept"]
    assert merged["kth_hash"] == direct["kth_hash"]
    assert merged["kmv_estimate"] == direct["kmv_estimate"]


def test_kmv_rejects_bad_k(spark):
    from minimel_spark.operators.sketch import kmv_distinct, kmv_union

    df = spark.createDataFrame([("g", "v")], "grp string, v string")
    with pytest.raises(ValueError):
        kmv_distinct(df, ["grp"], "v", k=1)
    with pytest.raises(ValueError):
        kmv_union(df, ["grp"], k=0)


# ---------------------------------------------------------------- KS


def _ks_python(xs, ys):
    vals = sorted(set(xs) | set(ys))
    na, nb = len(xs), len(ys)
    best, loc = -1, None
    ca = cb = 0
    for v in vals:
        ca += sum(1 for x in xs if x == v)
        cb += sum(1 for y in ys if y == v)
        num = abs(ca * nb - cb * na)
        if num > best:
            best, loc = num, v
    return best / (na * nb), loc


def test_ks_matches_python_reference(spark):
    from minimel_spark.operators.diagnostics import ks_two_sample

    xs = [1.0, 2.0, 2.0, 3.0, 5.0, 8.0, 9.0]
    ys = [2.0, 4.0, 4.0, 6.0, 7.0]
    cur = spark.createDataFrame([(x,) for x in xs], "v double")
    ref = spark.createDataFrame([(y,) for y in ys], "v double")
    row = ks_two_sample(cur, ref, "v").first()
    d, loc = _ks_python(xs, ys)
    assert row["n_cur"] == 7 and row["n_ref"] == 5
    assert row["d_stat"] == pytest.approx(d, abs=1e-12)
    assert row["d_location"] == loc
    assert 0.0 <= row["p_approx"] <= 1.0


def test_ks_identical_and_disjoint(spark):
    from minimel_spark.operators.diagnostics import ks_two_sample

    xs = [float(i) for i in range(50)]
    same = spark.createDataFrame([(x,) for x in xs], "v double")
    row = ks_two_sample(same, same, "v").first()
    assert row["d_stat"] == 0.0
    assert row["p_approx"] == 1.0
    lo = spark.createDataFrame([(float(i),) for i in range(20)], "v double")
    hi = spark.createDataFrame([(float(i + 100),) for i in range(20)], "v double")
    row = ks_two_sample(lo, hi, "v").first()
    assert row["d_stat"] == 1.0  # fully separated CDFs
    assert row["d_location"] == 19.0  # smallest value attaining the max
    assert row["p_approx"] < 1e-6


def test_ks_empty_sides_yield_nulls(spark):
    from minimel_spark.operators.diagnostics import ks_two_sample

    empty = spark.createDataFrame([], "v double")
    some = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    row = ks_two_sample(empty, some, "v").first()
    assert row["n_cur"] == 0 and row["n_ref"] == 2
    assert row["d_stat"] is None and row["p_approx"] is None
    row = ks_two_sample(empty, empty, "v").first()
    assert row["n_cur"] == 0 and row["n_ref"] == 0 and row["d_stat"] is None


def test_ks_parallelism_invariant(spark):
    from minimel_spark.operators.diagnostics import ks_two_sample

    xs = [(float(i % 17),) for i in range(200)]
    ys = [(float(i % 13),) for i in range(150)]
    a1 = spark.createDataFrame(xs, "v double").repartition(1)
    a8 = spark.createDataFrame(xs, "v double").repartition(8)
    b1 = spark.createDataFrame(ys, "v double").repartition(1)
    b8 = spark.createDataFrame(ys, "v double").repartition(8)
    r1 = ks_two_sample(a1, b1, "v").first()
    r8 = ks_two_sample(a8, b8, "v").first()
    assert r1 == r8


# ---------------------------------------------------------------- kappa


def test_kappa_hand_example(spark):
    from minimel_spark.operators.evaluate import cohen_kappa

    # classic 2x2: a=20 yes/yes, b=5 yes/no, c=10 no/yes, d=15 no/no
    rows = (
        [("i%d" % i, True, True) for i in range(20)]
        + [("j%d" % i, True, False) for i in range(5)]
        + [("k%d" % i, False, True) for i in range(10)]
        + [("l%d" % i, False, False) for i in range(15)]
    )
    df = spark.createDataFrame(rows, "rec_id string, la boolean, lb boolean")
    row = cohen_kappa(
        df.select("rec_id", "la"),
        df.select("rec_id", "lb"),
        label_col_a="la",
        label_col_b="lb",
    ).first()
    n = 50
    po = 35 / n
    pe = (25 * 30 + 25 * 20) / (n * n)
    kappa = (po - pe) / (1 - pe)
    assert row["n_items"] == n
    assert row["po"] == pytest.approx(po, abs=1e-12)
    assert row["pe"] == pytest.approx(pe, abs=1e-12)
    assert row["kappa"] == pytest.approx(kappa, abs=1e-12)


def test_kappa_perfect_and_constant(spark):
    from minimel_spark.operators.evaluate import cohen_kappa

    perfect = spark.createDataFrame(
        [(f"i{i}", i % 3) for i in range(30)], "rec_id string, label int"
    )
    row = cohen_kappa(perfect, perfect).first()
    assert row["po"] == 1.0 and row["kappa"] == 1.0
    # both constant, same label: pe == 1 -> structural guard -> 1.0
    const = spark.createDataFrame(
        [(f"i{i}", 1) for i in range(10)], "rec_id string, label int"
    )
    row = cohen_kappa(const, const).first()
    assert row["kappa"] == 1.0
    # both constant, different labels: agreement 0, pe == 0 via disjoint
    # label sets -> kappa == 0 (no denominator blow-up)
    other = spark.createDataFrame(
        [(f"i{i}", 2) for i in range(10)], "rec_id string, label int"
    )
    row = cohen_kappa(const, other).first()
    assert row["po"] == 0.0 and row["kappa"] == 0.0


def test_kappa_multiclass_matches_python(spark):
    from minimel_spark.operators.evaluate import cohen_kappa

    import random

    rng = random.Random(7)
    labels = ["x", "y", "z"]
    rows = [
        (f"i{i}", rng.choice(labels), rng.choice(labels)) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "rec_id string, la string, lb string")
    row = cohen_kappa(
        df.select("rec_id", "la"),
        df.select("rec_id", "lb"),
        label_col_a="la",
        label_col_b="lb",
    ).first()
    n = len(rows)
    po = sum(1 for _, a, b in rows if a == b) / n
    pe = sum(
        sum(1 for r in rows if r[1] == c) * sum(1 for r in rows if r[2] == c)
        for c in labels
    ) / (n * n)
    assert row["kappa"] == pytest.approx((po - pe) / (1 - pe), abs=1e-12)


# ---------------------------------------------------------------- HITS


def test_hits_star_structure(spark):
    from minimel_spark.operators.graph import hits

    # h0 points at a1, a2, a3; h1 points at a1 only.
    edges = spark.createDataFrame(
        [(0, 10), (0, 11), (0, 12), (1, 10)], "src long, dst long"
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [0, 1, 10, 11, 12]], "node long"
    )
    out = {r["node"]: (r["hub"], r["authority"]) for r in hits(edges, nodes, 5).collect()}
    # node 0 is the stronger hub; node 10 the stronger authority
    assert out[0][0] > out[1][0] > 0.0
    assert out[10][1] > out[11][1] > 0.0
    assert out[11][1] == out[12][1]
    # pure hubs have zero authority; pure authorities zero hub
    assert out[0][1] == 0.0 and out[10][0] == 0.0
    # L1 normalization: each score family sums to 1
    assert sum(v[0] for v in out.values()) == pytest.approx(1.0, abs=1e-9)
    assert sum(v[1] for v in out.values()) == pytest.approx(1.0, abs=1e-9)


def test_hits_matches_python_reference(spark):
    from minimel_spark.operators.graph import hits

    edges_py = [(0, 1), (1, 2), (2, 0), (0, 2), (3, 2)]
    nodes_py = [0, 1, 2, 3, 4]
    n_iter = 4
    h = {u: 1.0 / len(nodes_py) for u in nodes_py}
    a = {u: 0.0 for u in nodes_py}
    for _ in range(n_iter):
        a_raw = {u: 0.0 for u in nodes_py}
        for s, d in edges_py:
            a_raw[d] += h[s]
        za = sum(a_raw.values())
        a = {u: (a_raw[u] / za if za > 0 else 0.0) for u in nodes_py}
        h_raw = {u: 0.0 for u in nodes_py}
        for s, d in edges_py:
            h_raw[s] += a[d]
        zh = sum(h_raw.values())
        h = {u: (h_raw[u] / zh if zh > 0 else 0.0) for u in nodes_py}
    edges = spark.createDataFrame(edges_py, "src long, dst long")
    nodes = spark.createDataFrame([(u,) for u in nodes_py], "node long")
    out = {r["node"]: r for r in hits(edges, nodes, n_iter).collect()}
    for u in nodes_py:
        assert out[u]["hub"] == pytest.approx(h[u], abs=1e-12)
        assert out[u]["authority"] == pytest.approx(a[u], abs=1e-12)
    # isolated node scores 0 on both axes
    assert out[4]["hub"] == 0.0 and out[4]["authority"] == 0.0


def test_hits_empty_edges_all_zero(spark):
    from minimel_spark.operators.graph import hits

    edges = spark.createDataFrame([], "src long, dst long")
    nodes = spark.createDataFrame([(0,), (1,)], "node long")
    rows = hits(edges, nodes, 3).collect()
    assert {(r["hub"], r["authority"]) for r in rows} == {(0.0, 0.0)}


# ---------------------------------------------------------------- PQ


def _pq_fixture(spark, n=120, dim=8, seed=3):
    import random

    rng = random.Random(seed)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), rows


def test_pq_refine_recovers_exact_topk(spark):
    """With refine == corpus size the shortlist is the whole corpus, so the
    exact re-rank must equal the exact L2 top-k regardless of codebooks."""
    from minimel_spark.operators.ann import pq_topk

    df, rows = _pq_fixture(spark)
    queries = df.where(F.col("vec_id") < 3)
    out = pq_topk(
        df, queries, dim=8, k=5, m=4, ks=8, refine=120, sample_size=120
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    vecs = {i: [float(x) for x in v] for i, v in rows}
    for qid in range(3):
        d = sorted(
            (sum((a - b) ** 2 for a, b in zip(vecs[qid], vecs[i])), i)
            for i in vecs
        )[:5]
        expect = [i for _, i in d]
        got = [v for _, v in sorted(by_q[qid])]
        assert got == expect


def test_pq_md5_and_np_families_agree_on_shape(spark):
    from minimel_spark.operators.ann import pq_topk

    df, _ = _pq_fixture(spark)
    queries = df.where(F.col("vec_id") < 2)
    for fam in ("np", "md5"):
        out = pq_topk(
            df, queries, dim=8, k=4, m=2, ks=4, sample_size=120, hash_family=fam
        ).collect()
        assert len(out) == 8  # 2 queries x k
        for r in out:
            assert r["dist"] >= 0.0
        ranks = sorted(
            (r["query_id"], r["rank"]) for r in out
        )
        assert ranks == [(q, k) for q in (0, 1) for k in (1, 2, 3, 4)]


def test_pq_md5_parallelism_invariant(spark):
    from minimel_spark.operators.ann import pq_topk

    df, _ = _pq_fixture(spark, n=80)
    queries = df.where(F.col("vec_id") < 2)
    a = pq_topk(
        df.repartition(1), queries, dim=8, k=5, m=4, ks=8, hash_family="md5"
    ).collect()
    b = pq_topk(
        df.repartition(8), queries, dim=8, k=5, m=4, ks=8, hash_family="md5"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pq_validation(spark):
    from minimel_spark.operators.ann import pq_topk

    df, _ = _pq_fixture(spark, n=20)
    q = df.where(F.col("vec_id") < 1)
    with pytest.raises(ValueError):
        pq_topk(df, q, dim=8, m=3)  # m must divide dim
    with pytest.raises(ValueError):
        pq_topk(df, q, dim=8, k=10, m=4, refine=5)  # refine < k
    with pytest.raises(ValueError):
        pq_topk(df, q, dim=8, m=4, hash_family="bogus")


# ---------------------------------------------------------------- KMV Jaccard


def test_kmv_jaccard_exact_when_unsaturated(spark):
    from minimel_spark.operators.sketch import kmv_jaccard

    a = spark.createDataFrame([(f"u{i}",) for i in range(20)], "v string")
    b = spark.createDataFrame([(f"u{i}",) for i in range(10, 30)], "v string")
    row = kmv_jaccard(a, b, "v", k=64).first()
    # 10 shared of 30 union; both sides below k so the sketch is exact
    assert row["n_kept_left"] == 20 and row["n_kept_right"] == 20
    assert row["k_union"] == 30 and row["n_both"] == 10
    assert row["jaccard_kmv"] == pytest.approx(10 / 30, abs=1e-12)
    assert row["jaccard_exact"] == pytest.approx(10 / 30, abs=1e-12)
    assert row["abs_err"] == pytest.approx(0.0, abs=1e-12)


def test_kmv_jaccard_saturated_close_to_truth(spark):
    from minimel_spark.operators.sketch import kmv_jaccard

    a = spark.createDataFrame([(f"u{i}",) for i in range(400)], "v string")
    b = spark.createDataFrame([(f"u{i}",) for i in range(200, 600)], "v string")
    row = kmv_jaccard(a, b, "v", k=128).first()
    truth = 200 / 600
    assert row["jaccard_exact"] == pytest.approx(truth, abs=1e-12)
    # std err ~ sqrt(J(1-J)/k) ~ 0.042; allow 4 sigma
    assert abs(row["jaccard_kmv"] - truth) < 0.17
    assert row["k_union"] == 128


def test_kmv_jaccard_disjoint_and_empty(spark):
    from minimel_spark.operators.sketch import kmv_jaccard

    a = spark.createDataFrame([(f"a{i}",) for i in range(10)], "v string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(10)], "v string")
    row = kmv_jaccard(a, b, "v", k=32).first()
    assert row["n_both"] == 0 and row["jaccard_kmv"] == 0.0
    empty = spark.createDataFrame([], "v string")
    row = kmv_jaccard(empty, empty, "v", k=32).first()
    assert row["k_union"] == 0 and row["jaccard_kmv"] == 0.0


# ---------------------------------------------------------------- PPR


def test_ppr_matches_python_reference(spark):
    from minimel_spark.operators.graph import personalized_pagerank

    edges_py = [(0, 1), (1, 2), (2, 0), (0, 2), (3, 2), (2, 3)]
    nodes_py = [0, 1, 2, 3, 4]
    seeds_py = [0]
    n_iter, d = 5, 0.85
    s = {u: (1.0 / len(seeds_py) if u in seeds_py else 0.0) for u in nodes_py}
    out_deg = {}
    for u, _ in edges_py:
        out_deg[u] = out_deg.get(u, 0) + 1
    r = dict(s)
    for _ in range(n_iter):
        contrib = {u: 0.0 for u in nodes_py}
        for u, v in edges_py:
            contrib[v] += r[u] / out_deg[u]
        dang = sum(r[u] for u in nodes_py if u not in out_deg)
        r = {
            u: (1.0 - d) * s[u] + d * (contrib[u] + dang * s[u])
            for u in nodes_py
        }
    edges = spark.createDataFrame(edges_py, "src long, dst long")
    nodes = spark.createDataFrame([(u,) for u in nodes_py], "node long")
    seeds = spark.createDataFrame([(u,) for u in seeds_py], "node long")
    got = {
        row["node"]: row["rank"]
        for row in personalized_pagerank(edges, nodes, seeds, n_iter).collect()
    }
    for u in nodes_py:
        assert got[u] == pytest.approx(r[u], abs=1e-12)
    # node 4 is isolated and non-seed: exactly zero
    assert got[4] == 0.0


def test_ppr_requires_seeds(spark):
    from minimel_spark.operators.graph import personalized_pagerank

    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    nodes = spark.createDataFrame([(0,), (1,)], "node long")
    with pytest.raises(ValueError):
        personalized_pagerank(edges, nodes, nodes.where("node < 0"))


# ---------------------------------------------------------------- FD audit


def test_fd_audit_hand_example(spark):
    from minimel_spark.operators.profile import fd_audit

    rows = [
        (1, "a", "x"),
        (2, "a", "x"),
        (3, "a", "y"),  # a -> {x,x,y}: keep 2 of 3
        (4, "b", "z"),
        (5, "b", "z"),
    ]
    df = spark.createDataFrame(rows, "id long, k string, v string")
    out = {r["lhs"]: r for r in fd_audit(
        df, [("k", "v"), ("id", "v"), (["k", "v"], "id")]
    ).collect()}
    r = out["k"]
    assert r["n_rows"] == 5 and r["n_groups"] == 2 and r["n_kept"] == 4
    assert r["g3"] == pytest.approx(1 / 5, abs=1e-12) and not r["holds"]
    assert out["id"]["holds"] and out["id"]["g3"] == 0.0
    kv = out["k+v"]
    assert kv["n_groups"] == 3 and not kv["holds"]  # (a,x) has ids {1,2}


def test_fd_audit_nulls_are_values(spark):
    from minimel_spark.operators.profile import fd_audit

    df = spark.createDataFrame(
        [(None, "x"), (None, "x"), (None, "y"), ("a", None), ("a", None)],
        "k string, v string",
    )
    r = fd_audit(df, [("k", "v")]).first()
    # NULL lhs is one group keeping max(2,1)=2; 'a' keeps both NULL rhs rows
    assert r["n_rows"] == 5 and r["n_groups"] == 2 and r["n_kept"] == 4
    assert not r["holds"]


def test_fd_audit_validation(spark):
    from minimel_spark.operators.profile import fd_audit

    df = spark.createDataFrame([("a", "b")], "k string, v string")
    with pytest.raises(ValueError):
        fd_audit(df, [])
    with pytest.raises(ValueError):
        fd_audit(df, [(["k", "v"], "v")])


# ---------------------------------------------------------------- BPE


def _bpe_python(texts, n_merges):
    import collections
    import re

    words = collections.Counter()
    for t in texts:
        for w in re.split(r"\W+", t.lower()):
            if w:
                words[w] += 1
    reprs = {w: " " + " ".join(w) + " " for w in words}
    out = []
    for rnd in range(1, n_merges + 1):
        pc = collections.Counter()
        for w, f in words.items():
            toks = reprs[w].split()
            for i in range(len(toks) - 1):
                pc[toks[i] + " " + toks[i + 1]] += f
        if not pc:
            break
        mx = max(pc.values())
        pair = sorted(p for p, c in pc.items() if c == mx)[0]
        l, r = pair.split(" ", 1)
        out.append((rnd, l, r, l + r, mx))
        for w in reprs:
            reprs[w] = reprs[w].replace(" " + pair + " ", " " + l + r + " ")
    return out


def test_bpe_matches_python_reference(spark):
    from minimel_spark.operators.corpus import bpe_merges

    texts = [
        "the cat sat on the mat",
        "the cats eat the fish",
        "that hat is the best hat",
        "fishing is the best thing",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [tuple(r) for r in bpe_merges(docs, n_merges=8).collect()]
    assert got == _bpe_python(texts, 8)


def test_bpe_stops_when_dry_and_validates(spark):
    from minimel_spark.operators.corpus import bpe_merges

    docs = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    got = [tuple(r) for r in bpe_merges(docs, n_merges=5).collect()]
    # one word 'ab': single merge (a,b) then no pairs remain
    assert got == [(1, "a", "b", "ab", 2)]
    with pytest.raises(ValueError):
        bpe_merges(docs, n_merges=0)


def test_bpe_parallelism_invariant(spark):
    from minimel_spark.operators.corpus import bpe_merges

    texts = [f"token{i % 7} shared prefix word{i % 5}" for i in range(40)]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    a = [tuple(r) for r in bpe_merges(docs.repartition(1), n_merges=6).collect()]
    b = [tuple(r) for r in bpe_merges(docs.repartition(8), n_merges=6).collect()]
    assert a == b == _bpe_python(texts, 6)


def _bpe_encode_python(texts, n_merges):
    import collections
    import re

    merges = _bpe_python(texts, n_merges)
    vocab = set()
    docs_words = []
    for t in texts:
        ws = [w for w in re.split(r"\W+", t.lower()) if w]
        docs_words.append(ws)
        vocab.update(ws)
    reprs = {w: " " + " ".join(w) + " " for w in vocab}
    for _, l, r, m, _c in merges:
        for w in reprs:
            reprs[w] = reprs[w].replace(f" {l} {r} ", f" {m} ")
    nsym = {w: len(reprs[w].split()) for w in vocab}
    out = {}
    for i, ws in enumerate(docs_words):
        if not ws:
            continue
        n_tokens = sum(nsym[w] for w in ws)
        n_chars = sum(len(w) for w in ws)
        out[i] = (len(ws), n_tokens, n_chars, n_chars / n_tokens)
    return out


def test_bpe_encode_matches_python(spark):
    from minimel_spark.operators.corpus import bpe_encode, bpe_merges

    texts = [
        "the cat sat on the mat",
        "the cats eat the fish",
        "that hat is the best hat",
        "fishing is the best thing",
        "",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = bpe_merges(docs, n_merges=8)
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"], r["n_chars"], r["compression"])
        for r in bpe_encode(docs, merges).collect()
    }
    want = _bpe_encode_python(texts, 8)
    assert got == want
    assert 4 not in got          # empty doc has no row
    # compression strictly improves over char-split for every doc
    for _, n_tokens, n_chars, _c in got.values():
        assert n_tokens < n_chars


def test_bpe_encode_bounded_plan_500_merges(spark):
    """The merge-replay loop must not nest an unbounded projection chain:
    a real tokenizer's merge list is 10k+ entries, and the pre-r6 replay
    built one replace() per merge with no plan cut (the doc_vocab
    task-binary failure mode). 500 synthetic merges must complete — the
    periodic localCheckpoint bounds lineage depth — and the counts must
    match the same replay done in Python."""
    from minimel_spark.operators.corpus import bpe_encode

    docs = spark.createDataFrame(
        [(0, "ab ab cd"), (1, "ab xyz")], "doc_id long, text string"
    )
    rows = [(1, "a", "b", "ab", 2)] + [
        (i, f"s{i}", f"t{i}", f"s{i}t{i}", 1) for i in range(2, 501)
    ]
    merges = spark.createDataFrame(
        rows, "round long, left string, right string, merged string, count long"
    )
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"], r["n_chars"])
        for r in bpe_encode(docs, merges).collect()
    }
    # 'ab' -> 1 symbol after merge 1; 'cd' -> 2 chars; 'xyz' -> 3 chars
    assert got == {0: (3, 1 + 1 + 2, 6), 1: (2, 1 + 3, 5)}


def test_bpe_encode_partition_invariant(spark):
    from minimel_spark.operators.corpus import bpe_encode, bpe_merges

    docs = spark.createDataFrame(
        [(i, "repeat repeat token stream alpha beta " * 2) for i in range(12)],
        "doc_id long, text string",
    )
    merges = bpe_merges(docs, n_merges=5)
    a = sorted(map(tuple, bpe_encode(docs.coalesce(1), merges).collect()))
    b = sorted(map(tuple, bpe_encode(docs.repartition(8), merges).collect()))
    assert a == b and len(a) == 12
