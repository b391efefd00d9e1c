"""Tests for the bigram-LM perplexity filter (operators/lm.py) and the
deterministic HyperLogLog sketch (operators/sketch.py): pure-Python parity,
edge cases, parallelism invariance, and accuracy bounds."""

import math
import re
from collections import Counter

import pyspark.sql.functions as F
import pytest

from minimel_spark.operators.lm import lm_perplexity
from minimel_spark.operators.sketch import hll_distinct, hll_reference

from conftest import pinned_rdd_ids


def _pywords(t):
    return [w for w in re.split(r"\W+", t.lower()) if w]


def _py_lm(rows, alpha=0.5, train_rows=None):
    """Brute-force reference of lm_perplexity over (doc_id, text) tuples."""
    train_rows = rows if train_rows is None else train_rows
    uni, bi = Counter(), Counter()
    for _, t in train_rows:
        ws = _pywords(t)
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    v = len(uni)
    out = {}
    for d, t in rows:
        ws = _pywords(t)
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            out[d] = (0, None, None)
            continue
        lps = [
            math.log((bi[pr] + alpha) / (uni[pr[0]] + alpha * v)) for pr in pairs
        ]
        ce = -sum(lps) / len(lps)
        out[d] = (len(pairs), ce, math.exp(ce))
    return out


ROWS = [
    (1, "the cat sat on the mat"),
    (2, "the cat sat on the cat"),
    (3, "dogs bark loudly at night dogs bark"),
    (4, "the the the the"),
    (5, "single"),
    (6, ""),
    (7, "zebra quantum flux"),
]


def test_lm_perplexity_matches_python(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["cross_entropy"], r["perplexity"])
        for r in lm_perplexity(df).collect()
    }
    want = _py_lm(ROWS)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0], d
        for i in (1, 2):
            if want[d][i] is None:
                assert got[d][i] is None, d
            else:
                assert got[d][i] == pytest.approx(want[d][i], rel=1e-12), d


def test_lm_perplexity_separate_train(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    train = spark.createDataFrame(ROWS[:3], "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["cross_entropy"])
        for r in lm_perplexity(df, train=train).collect()
    }
    want = _py_lm(ROWS, train_rows=ROWS[:3])
    for d in want:
        assert got[d][0] == want[d][0]
        if want[d][1] is not None:
            assert got[d][1] == pytest.approx(want[d][1], rel=1e-12)
    # fully-unseen doc scores strictly worse than an in-train doc
    assert got[7][1] > got[1][1]


def test_lm_perplexity_ranking_and_repetition(spark):
    # a pathological repeated doc must be MORE predictable (lower ppl)
    # than a typical one under self-scoring
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    ppl = {r["doc_id"]: r["perplexity"] for r in lm_perplexity(df).collect()}
    assert ppl[4] < ppl[3]


def test_lm_perplexity_persisted_out_identical(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    ids_before = pinned_rdd_ids(spark)
    caches = []
    a = sorted(
        (r["doc_id"], r["n_bigrams"], r["cross_entropy"])
        for r in lm_perplexity(df, persisted_out=caches).collect()
    )
    assert len(caches) == 2  # tokenized corpus + unigram table
    for c in caches:
        c.unpersist()
    b = sorted(
        (r["doc_id"], r["n_bigrams"], r["cross_entropy"])
        for r in lm_perplexity(df).collect()
    )
    for (da, na, ca), (db, nb, cb) in zip(a, b):
        assert (da, na) == (db, nb)
        if ca is None:
            assert cb is None
        else:
            # plan shape (cached vs not) may change partial-sum order;
            # the gate rounds to 6 decimals, assert well inside that
            assert ca == pytest.approx(cb, abs=1e-9)
    # the no-receiver call must not have pinned anything new
    assert pinned_rdd_ids(spark) - ids_before == set()


def test_lm_perplexity_rejects_bad_alpha(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    with pytest.raises(ValueError):
        lm_perplexity(df, alpha=0.0)


def test_lm_perplexity_parallelism_invariant(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    a = sorted(
        (r["doc_id"], r["n_bigrams"], r["cross_entropy"])
        for r in lm_perplexity(df.coalesce(1)).collect()
    )
    b = sorted(
        (r["doc_id"], r["n_bigrams"], r["cross_entropy"])
        for r in lm_perplexity(df.repartition(16, "doc_id")).collect()
    )
    for (da, na, ca), (db, nb, cb) in zip(a, b):
        assert (da, na) == (db, nb)
        if ca is None:
            assert cb is None
        else:
            # partial-sum order may differ across partitionings; the gate
            # rounds to 6 decimals, assert well inside that
            assert ca == pytest.approx(cb, abs=1e-9)


def test_hll_matches_python_reference(spark):
    vals = [f"url-{i % 211}" for i in range(1000)]  # 211 distinct
    df = spark.createDataFrame([(v,) for v in vals], "v string").withColumn(
        "g", F.lit("all")
    )
    for p in (6, 8):
        row = hll_distinct(df, ["g"], "v", p=p).collect()[0]
        want = hll_reference(vals, p=p)
        assert row["hll_estimate"] == pytest.approx(want, rel=1e-12), p
        assert row["n_exact"] == 211


def test_hll_accuracy_and_correction_branches(spark):
    # small group (linear-counting branch) and large group (raw branch)
    rows = [("small", f"s{i}") for i in range(30)] + [
        ("large", f"l{i}") for i in range(5000)
    ]
    df = spark.createDataFrame(rows, "g string, v string")
    got = {r["g"]: r for r in hll_distinct(df, ["g"], "v", p=8).collect()}
    # sigma ~ 1.04/sqrt(256) = 6.5%; allow 4 sigma
    assert abs(got["large"]["rel_err"]) < 0.26
    assert abs(got["small"]["rel_err"]) < 0.26
    # branch check: the small group genuinely used linear counting
    m, v0 = 256, 256 - got["small"]["n_registers"]
    assert got["small"]["hll_estimate"] == pytest.approx(
        m * math.log(m / v0), rel=1e-12
    )


def test_hll_duplicate_and_parallelism_invariant(spark):
    base = [("g1", f"x{i}") for i in range(400)]
    df1 = spark.createDataFrame(base, "g string, v string")
    # triplicate every value: HLL must be EXACTLY unchanged
    df3 = spark.createDataFrame(base * 3, "g string, v string")
    e1 = hll_distinct(df1, ["g"], "v").collect()[0]
    e3 = hll_distinct(df3.repartition(16, "v"), ["g"], "v").collect()[0]
    assert e1["hll_estimate"] == e3["hll_estimate"]
    assert e1["n_registers"] == e3["n_registers"]


def test_hll_rejects_bad_p(spark):
    df = spark.createDataFrame([("g", "v")], "g string, v string")
    with pytest.raises(ValueError):
        hll_distinct(df, ["g"], "v", p=3)


def _py_bloom_words(keys, n_bits, k):
    """Reference packing of bloom_build's (word_idx, word) table."""
    import hashlib

    words = {}
    for key in keys:
        for j in range(1, k + 1):
            h = int(hashlib.md5(f"b{j}:{key}".encode()).hexdigest()[:15], 16)
            pos = h % n_bits
            words[pos // 63] = words.get(pos // 63, 0) | (1 << (pos % 63))
    return words


def test_bloom_build_matches_python(spark):
    from minimel_spark.operators.sketch import bloom_build

    keys = [f"k{i}" for i in range(200)]
    dim = spark.createDataFrame([(key,) for key in keys], "key string")
    got = {
        r["word_idx"]: r["word"]
        for r in bloom_build(dim, "key", n_bits=1 << 10, k=3).collect()
    }
    assert got == _py_bloom_words(keys, 1 << 10, 3)


def test_bloom_semi_join_no_false_negatives(spark):
    from minimel_spark.operators.sketch import bloom_build, bloom_semi_join

    members = [f"m{i}" for i in range(300)]
    dim = spark.createDataFrame([(m,) for m in members], "key string")
    fact = spark.createDataFrame(
        [(i, members[i % 300] if i % 2 == 0 else f"out{i}") for i in range(2000)],
        "row_id long, key string",
    )
    bloom = bloom_build(dim, "key", n_bits=1 << 14, k=3)
    out = bloom_semi_join(fact, "key", bloom, n_bits=1 << 14, k=3).collect()
    member_set = set(members)
    fp = fn = 0
    for r in out:
        if r["key"] in member_set:
            fn += not r["bloom_pass"]
        else:
            fp += r["bloom_pass"]
    assert fn == 0  # the Bloom guarantee
    # 300 keys * 3 hashes in 16384 bits -> fp ~ (1-e^-0.055)^3 ~ 1.5e-4;
    # 1000 non-member probes -> expect ~0, allow a generous margin
    assert fp <= 5


def test_bloom_probe_plan_has_no_fact_shuffle(spark):
    from minimel_spark.operators.sketch import bloom_build, bloom_semi_join

    dim = spark.createDataFrame([(f"m{i}",) for i in range(50)], "key string")
    fact = spark.createDataFrame(
        [(i, f"k{i}") for i in range(100)], "row_id long, key string"
    )
    bloom = bloom_build(dim, "key", n_bits=1 << 12, k=3)
    out = bloom_semi_join(fact, "key", bloom, n_bits=1 << 12, k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the fact side must reach the probe joins without an exchange:
    # every join is a BroadcastHashJoin, never a shuffle join
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") == 3, plan


def _py_cms(values, d, w):
    import hashlib
    from collections import Counter

    cells = Counter()
    for v in values:
        for j in range(1, d + 1):
            h = int(hashlib.md5(f"c{j}:{v}".encode()).hexdigest()[:15], 16)
            cells[(j, h % w)] += 1
    return dict(cells)


def test_cms_build_matches_python(spark):
    from minimel_spark.operators.sketch import cms_build

    vals = [f"v{i % 37}" for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {
        (r["row_j"], r["bucket"]): r["cnt"]
        for r in cms_build(df, "v", d=3, w=64).collect()
    }
    assert got == _py_cms(vals, 3, 64)


def test_cms_query_guarantee_and_exactness(spark):
    from collections import Counter

    from minimel_spark.operators.sketch import cms_build, cms_query

    vals = [f"v{i % 101}" for i in range(2000)] + ["rare"] * 3
    truth = Counter(vals)
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    qdf = spark.createDataFrame(
        [(v,) for v in list(truth) + ["absent1", "absent2"]], "v string"
    )
    # tight sketch: collisions certain -> min over rows still never undercounts
    tight = cms_query(qdf, "v", cms_build(df, "v", d=4, w=32), d=4, w=32)
    for r in tight.collect():
        assert r["cnt_est"] >= truth.get(r["v"], 0), r
    # roomy sketch: 103 distinct values in 4x65536 cells -> exact w.h.p.
    roomy = cms_query(qdf, "v", cms_build(df, "v", d=4, w=1 << 16), d=4, w=1 << 16)
    for r in roomy.collect():
        assert r["cnt_est"] == truth.get(r["v"], 0), r


def test_cms_composes_under_addition(spark):
    from minimel_spark.operators.sketch import cms_build

    vals = [f"v{i % 11}" for i in range(300)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    half1 = spark.createDataFrame([(v,) for v in vals[:150]], "v string")
    half2 = spark.createDataFrame([(v,) for v in vals[150:]], "v string")
    whole = {
        (r["row_j"], r["bucket"]): r["cnt"]
        for r in cms_build(df, "v", d=2, w=128).collect()
    }
    summed = {}
    for h in (half1, half2):
        for r in cms_build(h, "v", d=2, w=128).collect():
            k = (r["row_j"], r["bucket"])
            summed[k] = summed.get(k, 0) + r["cnt"]
    assert whole == summed


def test_bloom_rejects_bad_params(spark):
    from minimel_spark.operators.sketch import bloom_build, bloom_semi_join

    df = spark.createDataFrame([("k",)], "key string")
    with pytest.raises(ValueError):
        bloom_build(df, "key", n_bits=10)
    with pytest.raises(ValueError):
        bloom_semi_join(df, "key", df, k=0)


def test_cms_excludes_nulls_on_both_sides(spark):
    """NULL values are excluded from build AND probe — the never-undercount
    guarantee holds for every non-NULL value, and a NULL probe row simply
    returns no row instead of a silent 0-undercount."""
    from minimel_spark.operators.sketch import cms_build, cms_query

    df = spark.createDataFrame(
        [("x",), (None,), ("x",), (None,), ("y",)], "v string"
    )
    cells = cms_build(df, "v", d=2, w=32)
    assert cells.agg({"cnt": "sum"}).first()[0] == 2 * 3  # d * non-null rows
    qdf = spark.createDataFrame([("x",), (None,), ("z",)], "v string")
    got = {r["v"]: r["cnt_est"] for r in cms_query(qdf, "v", cells, d=2, w=32).collect()}
    assert None not in got
    assert got["x"] >= 2 and got["z"] >= 0


def test_qdigest_no_compression_is_exact_histogram(spark):
    from minimel_spark.operators.sketch import qdigest_build

    # thr = n // k = 0 -> nothing compresses: digest == leaf histogram
    df = spark.createDataFrame([(i % 5,) for i in range(20)], "v long")
    nodes = {(r["lv"], r["idx"]): r["cnt"]
             for r in qdigest_build(df, "v", bits=4, k=1000).collect()}
    assert nodes == {(4, i): 4 for i in range(5)}


def test_qdigest_uniform_compression_levels(spark):
    from minimel_spark.operators.sketch import qdigest_build

    # 16 uniform values, k=4 -> thr=4: leaf sibling pairs (1+1=2 < 4) merge
    # to level 3; level-3 pairs (2+2=4 >= 4) stay. 8 nodes at level 3.
    df = spark.createDataFrame([(i,) for i in range(16)], "v long")
    nodes = {(r["lv"], r["idx"]): r["cnt"]
             for r in qdigest_build(df, "v", bits=4, k=4).collect()}
    assert nodes == {(3, i): 2 for i in range(8)}


def test_qdigest_quantiles_rank_guarantee_skewed(spark):
    from minimel_spark.operators.sketch import qdigest_quantiles

    # zipf-ish skew: heavy mass at 0, long tail; coarse sketch (k=16,
    # eps=0.5) must still satisfy its own bound; fine sketch (k=256,
    # eps=1/32) too
    rows = [(0.0,)] * 300 + [(float(i % 97) + 1.0,) for i in range(400)]
    df = spark.createDataFrame(rows, "v double")
    for k in (16, 256):
        out = qdigest_quantiles(
            df, "v", scale=1.0, qs=[0.1, 0.5, 0.9, 0.99], bits=8, k=k
        ).collect()
        assert len(out) == 4
        assert all(r["within_bound"] for r in out), [tuple(r) for r in out]
    # the fine sketch must place the median inside the heavy zero bucket
    fine = {r["q"]: r for r in out}
    assert fine[0.1]["est_idx"] == 0 and fine[0.5]["est_idx"] <= 10


def test_qdigest_partition_invariant_and_validation(spark):
    import pytest as _pt

    from minimel_spark.operators.sketch import qdigest_build

    df = spark.createDataFrame([((i * 7) % 50,) for i in range(500)], "v long")
    a = sorted(map(tuple, qdigest_build(df.coalesce(1), "v", bits=6, k=8).collect()))
    b = sorted(map(tuple, qdigest_build(df.repartition(16), "v", bits=6, k=8).collect()))
    assert a == b and len(a) > 0
    with _pt.raises(ValueError, match="bits"):
        qdigest_build(df, "v", bits=0)
    with _pt.raises(ValueError, match="k must"):
        qdigest_build(df, "v", k=0)


def test_qdigest_merge_keeps_rank_guarantee(spark):
    from pyspark.sql import Window

    import pyspark.sql.functions as F

    from minimel_spark.operators.sketch import qdigest_build, qdigest_merge

    bits, k = 6, 8
    h1 = spark.createDataFrame([((i * 3) % 64,) for i in range(300)], "v long")
    h2 = spark.createDataFrame([((i * 5 + 1) % 64,) for i in range(200)], "v long")
    m = qdigest_merge(
        qdigest_build(h1, "v", bits=bits, k=k),
        qdigest_build(h2, "v", bits=bits, k=k),
        bits=bits, n_total=500, k=k,
    )
    # total mass preserved
    assert m.agg(F.sum("cnt")).first()[0] == 500
    # every internal node respects the combined threshold
    bad = m.where((F.col("lv") < bits) & (F.col("cnt") >= 500 // k)).count()
    assert bad == 0
    # rank guarantee of the merged digest at q=0.5: walk by (ub, lb)
    width = lambda lv: 1 << (bits - lv)
    rows = sorted(
        ((r["idx"] + 1) * width(r["lv"]) - 1, r["idx"] * width(r["lv"]), r["cnt"])
        for r in m.collect()
    )
    target, cum, est = 250, 0, None
    for ub, lb, cnt in rows:
        cum += cnt
        if cum >= target:
            est = ub
            break
    exact = sorted([(i * 3) % 64 for i in range(300)] + [(i * 5 + 1) % 64 for i in range(200)])
    true_rank = sum(1 for v in exact if v <= est)
    eps_n = (bits / k) * 500
    assert target <= true_rank <= target + eps_n


def test_cms_join_size_exact_when_no_collisions(spark):
    from minimel_spark.operators.sketch import cms_build, cms_join_size

    # tiny key domains in a wide sketch: no collisions -> estimate exact
    a = spark.createDataFrame([(i % 3,) for i in range(30)], "k long")
    b = spark.createDataFrame([(i % 3,) for i in range(12)], "k long")
    ca, cb = cms_build(a, "k", d=3, w=4096), cms_build(b, "k", d=3, w=4096)
    est = cms_join_size(ca, cb, d=3).collect()[0]["est_join_size"]
    assert est == 3 * (10 * 4)  # each of 3 keys: 10 x 4 pairings


def test_cms_join_size_never_undercounts(spark):
    import pytest as _pt

    from minimel_spark.operators.sketch import cms_build, cms_join_size

    # narrow sketch forces collisions: estimate must stay >= truth
    a = spark.createDataFrame([((i * 7) % 50,) for i in range(400)], "k long")
    b = spark.createDataFrame([((i * 11) % 50,) for i in range(300)], "k long")
    truth_df = (
        a.groupBy("k").count().withColumnRenamed("count", "ca")
        .join(b.groupBy("k").count().withColumnRenamed("count", "cb"), "k")
    )
    truth = truth_df.selectExpr("sum(ca * cb) s").collect()[0]["s"]
    for w in (8, 64, 4096):
        est = cms_join_size(
            cms_build(a, "k", d=4, w=w), cms_build(b, "k", d=4, w=w), d=4
        ).collect()[0]["est_join_size"]
        assert est >= truth, (w, est, truth)
    # wide sketch: exact
    assert est == truth
    with _pt.raises(ValueError):
        cms_join_size(cms_build(a, "k"), cms_build(b, "k"), d=0)
