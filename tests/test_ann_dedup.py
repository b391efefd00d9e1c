"""ANN (brute-force / LSH / IVF) + dedup operator tests."""

import pyspark.sql.functions as F
import pytest

from minimel_spark.operators.ann import brute_force_topk, ivf_topk, lsh_topk
from minimel_spark.operators.dedup import (
    exact_dedup,
    minhash_dups,
    ngram_jaccard_dups,
    simhash_dups,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def test_hyperplane_buckets_md5_matches_python_reference(spark, emb):
    """The md5 plane family (the DuckDB-oracle mode) must reproduce a pure
    Python strict-left-fold recomputation of every bucket code exactly —
    coefficient derivation, fold order, and sign decisions all pinned."""
    from minimel_spark.operators.ann import hyperplane_buckets, md5_plane_coeff

    sub = emb.where(F.col("vec_id") < 64)
    got = sorted(
        (r["id"], r["bucket"])
        for r in hyperplane_buckets(
            sub, dim=64, num_planes=5, num_tables=3, hash_family="md5"
        ).collect()
    )
    want = []
    for r in sub.collect():
        v = [float(x) for x in r["embedding"]]
        for t in range(3):
            code = 0
            for p in range(5):
                acc = 0.0
                for i in range(64):
                    acc = acc + v[i] * md5_plane_coeff(42, t, p, i)
                if acc > 0:
                    code += 1 << p
            want.append((r["vec_id"], f"{t}:{code}"))
    assert got == sorted(want)

    with pytest.raises(ValueError, match="hash_family"):
        hyperplane_buckets(sub, dim=64, hash_family="sha1")
    with pytest.raises(ValueError, match="hash_family"):
        ivf_topk(emb, emb.limit(1), dim=64, hash_family="crc")


def test_brute_force_topk_exact_and_self_first(spark, emb):
    q = emb.where(F.col("vec_id") < 8)
    got = brute_force_topk(emb, q, k=5)
    top1 = {r["query_id"]: r["vec_id"] for r in got.where(F.col("rank") == 1).collect()}
    assert top1 == {i: i for i in range(8)}, "each vector's nearest neighbor is itself"
    assert got.groupBy("query_id").count().where(F.col("count") != 5).count() == 0


def test_ivf_recall_vs_brute_force(spark, emb):
    q = emb.where(F.col("vec_id") < 16)
    exact = _topk_sets(brute_force_topk(emb, q, k=10))
    approx = _topk_sets(ivf_topk(emb, q, dim=64, k=10, n_cells=8, n_probe=4))
    recall = sum(len(exact[i] & approx.get(i, set())) for i in exact) / sum(
        len(v) for v in exact.values()
    )
    assert recall >= 0.6, f"IVF recall {recall} too low for n_probe=4/8 cells"


def test_ivf_partition_invariant(spark, emb):
    q = emb.where(F.col("vec_id") < 4)
    a = ivf_topk(emb.repartition(2), q, dim=64, k=5, n_cells=8, n_probe=2)
    b = ivf_topk(emb.repartition(13), q, dim=64, k=5, n_cells=8, n_probe=2)
    ra = sorted((r["query_id"], r["vec_id"], r["rank"]) for r in a.collect())
    rb = sorted((r["query_id"], r["vec_id"], r["rank"]) for r in b.collect())
    assert ra == rb


def test_lsh_topk_subset_of_corpus(spark, emb):
    q = emb.where(F.col("vec_id") < 4)
    got = lsh_topk(emb, q, dim=64, k=5)
    assert got.where(F.col("rank") > 5).count() == 0
    assert got.count() > 0


def test_exact_dedup_flags_identical_texts(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "x y z")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: (r["canonical_id"], r["is_duplicate"]) for r in exact_dedup(docs).collect()}
    assert rows == {1: (1, False), 2: (1, True), 3: (3, False)}


def test_ngram_jaccard_blocking_is_lossless(spark):
    """Shared-shingle blocking must equal brute force for threshold > 0."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "the quick brown fox leaps"),
            (3, "lorem ipsum dolor sit amet"),
            (4, "the quick brown fox jumps"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 6)
        for r in ngram_jaccard_dups(docs, threshold=0.3, n=2, max_docs_per_shingle=None).collect()
    }
    # brute force by hand: docs 1,4 identical (J=1); 1-2 and 2-4 share 3 of 5
    # distinct 2-grams each side -> J = 3/5
    assert got[(1, 4)] == 1.0
    assert got[(1, 2)] == got[(2, 4)] == round(3 / 5, 6)
    assert (1, 3) not in got and (2, 3) not in got


def test_minhash_verify_never_false_positive(spark, documents):
    d = minhash_dups(documents, threshold=0.8, n=1)
    assert d.where(F.col("jaccard") < 0.8).count() == 0


def test_minhash_md5_family_matches_python_reference(spark, documents):
    """The md5 hash family (the DuckDB-oracle mode) must reproduce a pure
    Python recomputation of the signature pipeline exactly — signature
    values, band keys, and the verified pair set."""
    import hashlib
    import re

    docs = documents.limit(40)
    d = minhash_dups(docs, threshold=0.8, n=1, num_hashes=8, bands=4,
                     hash_family="md5")
    got = {(r["id_a"], r["id_b"]): round(r["jaccard"], 6) for r in d.collect()}

    rows = docs.select("doc_id", "text").collect()
    sh = {
        r["doc_id"]: set(w for w in re.split(r"\W+", (r["text"] or "").lower()) if w)
        for r in rows
    }
    sh = {k: v for k, v in sh.items() if v}

    def sig(words):
        return [
            min(
                int(hashlib.md5(f"{i}:{w}".encode()).hexdigest()[:15], 16)
                for w in words
            )
            for i in range(8)
        ]

    def bandkeys(s):
        return {
            f"{b}:" + hashlib.md5(",".join(str(v) for v in s[b*2:b*2+2]).encode()).hexdigest()
            for b in range(4)
        }

    bk = {k: bandkeys(sig(v)) for k, v in sh.items()}
    want = {}
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if not (bk[a] & bk[b]):
                continue
            na, nb = len(sh[a]), len(sh[b])
            if min(na, nb) < 0.8 * max(na, nb):
                continue
            j = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
            if j >= 0.8:
                want[(a, b)] = round(j, 6)
    assert got == want and want  # non-vacuous: fixture has real dup pairs


def test_simhash_banding_complete_vs_bruteforce(spark, documents):
    """(k+1)-band blocking must equal the brute-force hamming join — the old
    4x16 layout silently missed pairs with 4-8 differing bits spread across
    all four bands."""
    from minimel_spark.operators.dedup import simhash

    docs = documents.limit(80)
    fps = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    ids = sorted(fps)
    for k in (3, 8):
        want = {
            (a, b)
            for i, a in enumerate(ids)
            for b in ids[i + 1 :]
            if bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1") <= k
        }
        got = {
            (r["id_a"], r["id_b"])
            for r in simhash_dups(docs, max_hamming=k).collect()
        }
        assert got == want, f"banding incomplete at max_hamming={k}"


def test_simhash_rejects_incomplete_banding(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    # fewer bands than max_hamming+1 must be an error, not silent recall loss
    with pytest.raises(ValueError):
        simhash_dups(docs, max_hamming=8, n_bands=4)


def test_simhash_identical_texts_distance_zero(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_dups(docs, max_hamming=64).collect()}
    assert pairs.get((1, 2)) == 0


def test_embed_hashed_unit_norm_and_determinism(spark, documents):
    from minimel_spark.operators.embed import embed_hashed

    emb = embed_hashed(documents.limit(50), dim=16)
    rows = emb.collect()
    assert all(len(r["embedding"]) == 16 for r in rows)
    for r in rows:
        n = sum(x * x for x in r["embedding"]) ** 0.5
        assert n == pytest.approx(1.0, abs=1e-9) or n == 0.0
    # partition-invariant (pure expressions)
    again = {
        r["doc_id"]: tuple(r["embedding"])
        for r in embed_hashed(documents.limit(50).repartition(7), dim=16).collect()
    }
    assert {r["doc_id"]: tuple(r["embedding"]) for r in rows} == again


def test_embed_hashed_feeds_ann(spark, documents):
    """Text -> embedding -> exact cosine top-k end to end: a doc's nearest
    neighbour under hashed-BoW cosine is itself-like content (sanity)."""
    from minimel_spark.operators.embed import embed_hashed

    emb = embed_hashed(documents.limit(100), dim=32).withColumnRenamed(
        "doc_id", "vec_id"
    )
    out = brute_force_topk(emb, emb.limit(5), k=3)
    top1 = {r["query_id"]: r["vec_id"] for r in out.where("rank = 1").collect()}
    assert all(q == v for q, v in top1.items())  # self-similarity = 1


def test_embed_gated_backends_raise(spark, documents):
    from minimel_spark.operators.embed import embed_with_fasttext, embed_with_vectorizer

    for fn, pkg in ((embed_with_fasttext, "fasttext"), (embed_with_vectorizer, "scikit-learn")):
        try:
            __import__(pkg.replace("scikit-learn", "sklearn"))
        except ImportError:
            with pytest.raises(ImportError, match=pkg):
                fn(documents, "/nonexistent/model")


def test_embed_hashed_empty_doc_zero_vector(spark):
    from minimel_spark.operators.embed import embed_hashed

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "...")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r["embedding"] for r in embed_hashed(docs, dim=8).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2] == [0.0] * 8 and rows[3] == [0.0] * 8
    assert sum(x * x for x in rows[1]) == pytest.approx(1.0)


def test_ensure_min_parallelism_spreads_narrow_input(spark, documents):
    """A 1-split input is hash-spread to the session's slots (row-identical);
    an already-wide input passes through untouched (identity, no exchange)."""
    from minimel_spark.operators.util import ensure_min_parallelism

    narrow = documents.coalesce(1)
    assert narrow.rdd.getNumPartitions() == 1
    spread = ensure_min_parallelism(narrow, "doc_id")
    assert spread.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert sorted(r["doc_id"] for r in spread.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in documents.select("doc_id").collect()
    )

    wide = documents.repartition(spark.sparkContext.defaultParallelism + 4, "doc_id")
    assert ensure_min_parallelism(wide, "doc_id") is wide


def test_minhash_dups_persisted_out_same_rows(spark, documents):
    """persisted_out only changes the cache lifecycle, never the pair set."""
    plain = sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in minhash_dups(documents, threshold=0.9, n=1).collect()
    )
    caches = []
    cached = sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in minhash_dups(
            documents, threshold=0.9, n=1, persisted_out=caches
        ).collect()
    )
    assert caches and plain == cached
    for c in caches:
        c.unpersist()


def test_fold_cosine_bitwise_matches_duckdb(spark):
    """The md5 ANN oracle contract (r5): ann.fold_cosine must agree with the
    DuckDB list_reduce left-fold cosine BIT FOR BIT (no rounding) on float32
    vectors, so rank/threshold decisions hashed by the ANN value oracles can
    never flip on summation-order float noise between the two engines."""
    import random

    import duckdb
    import numpy as np

    from minimel_spark.operators.ann import fold_cosine

    rng = random.Random(7)
    dim = 9  # odd + small: summation-order differences would show if present
    vecs = [
        [float(np.float32(rng.uniform(-2, 2))) for _ in range(dim)]
        for _ in range(20)
    ]
    pairs = [(i, j) for i in range(20) for j in range(20) if i < j]
    df = spark.createDataFrame(
        [(i, j, vecs[i], vecs[j]) for i, j in pairs],
        "i long, j long, _va array<float>, _vb array<float>",
    )
    got = {
        (r["i"], r["j"]): r["sim"]
        for r in df.withColumn("sim", fold_cosine("_va", "_vb")).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE v (id BIGINT, e FLOAT[])")
    con.executemany("INSERT INTO v VALUES (?, ?)", list(enumerate(vecs)))
    fold = (
        "list_reduce(list_transform(range(1, {d} + 1), "
        "k -> a.e[k::INT]::DOUBLE * b.e[k::INT]::DOUBLE), (x, y) -> x + y)"
        " / (sqrt(list_reduce(list_transform(range(1, {d} + 1), "
        "k -> a.e[k::INT]::DOUBLE * a.e[k::INT]::DOUBLE), (x, y) -> x + y))"
        " * sqrt(list_reduce(list_transform(range(1, {d} + 1), "
        "k -> b.e[k::INT]::DOUBLE * b.e[k::INT]::DOUBLE), (x, y) -> x + y)))"
    ).format(d=dim)
    want = {
        (i, j): s
        for i, j, s in con.execute(
            f"SELECT a.id, b.id, {fold} FROM v a JOIN v b ON a.id < b.id"
        ).fetchall()
    }
    assert set(got) == set(want)
    for k in got:
        # bitwise: compare the exact double payloads, not approximate
        assert got[k].hex() == want[k].hex(), (k, got[k], want[k])


def test_incremental_minhash_equals_batch_cross_pairs(spark, documents):
    """incremental_minhash_dups(new, index(corpus), corpus) must equal the
    full-batch minhash_dups restricted to new-x-corpus pairs: same LSH
    family, same banding, same verify — the incremental path may not lose
    or invent a pair."""
    import pyspark.sql.functions as F

    from minimel_spark.operators.dedup import (
        incremental_minhash_dups,
        minhash_dups,
        minhash_index,
    )

    docs = documents.where(F.col("doc_id") < 400)
    is_new = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(5)) == 0
    corpus, new = docs.where(~is_new), docs.where(is_new)
    params = dict(threshold=0.9, n=1, num_hashes=16, bands=8)
    idx = minhash_index(corpus, **{k: v for k, v in params.items() if k != "threshold"})
    inc = {
        (r["id_new"], r["id_old"], round(r["jaccard"], 9))
        for r in incremental_minhash_dups(new, idx, corpus, **params).collect()
    }
    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    batch = set()
    for r in minhash_dups(docs, **params).collect():
        a, b = r["id_a"], r["id_b"]
        if (a in new_ids) != (b in new_ids):  # cross pairs only
            n, o = (a, b) if a in new_ids else (b, a)
            batch.add((n, o, round(r["jaccard"], 9)))
    assert inc == batch and inc  # equal AND non-trivial


def test_minhash_survives_short_docs(spark):
    """Docs shorter than n words must shingle to [] (skipped), not crash the
    job: F.sequence(1, size-n+1) descends to [1, 0] without the guard and
    slice(words, 0, n) throws (r5 review finding, reproduced)."""
    from minimel_spark.operators.dedup import (
        incremental_minhash_dups,
        minhash_dups,
        minhash_index,
        shingle_docs,
    )

    docs = spark.createDataFrame(
        [
            (0, "hello world"),                      # 2 words < n=3
            (1, ""),                                  # empty
            (2, "..."),                               # punctuation only
            (3, "a proper document with many words"),
            (4, "a proper document with many words"),  # exact dup of 3
        ],
        "doc_id long, text string",
    )
    sh = {r["doc_id"]: r["shingles"] for r in shingle_docs(docs, n=3).collect()}
    assert sh[0] == [] and sh[1] == [] and sh[2] == []
    assert len(sh[3]) == 4  # 6 words -> 4 tri-grams
    pairs = minhash_dups(docs, threshold=0.9, n=3).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(3, 4)}
    idx = minhash_index(docs.where("doc_id >= 3"), n=3)
    inc = incremental_minhash_dups(
        docs.where("doc_id < 3"), idx, docs.where("doc_id >= 3"), threshold=0.9, n=3
    )
    assert inc.count() == 0  # short docs probe nothing, and nothing crashes


def test_winnowing_detects_copied_passage(spark):
    """A paragraph copied between otherwise-different documents must share
    winnowed fingerprints (guarantee: any shared run >= window+k-1 words
    shares a selected fingerprint); unrelated docs share none."""
    from minimel_spark.operators.dedup import passage_overlap_pairs, winnow_fingerprints

    passage = "the quick brown fox jumps over the lazy dog near the river bank today"
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma " + passage + " delta epsilon zeta"),
            (1, "one two three four five six " + passage),
            (2, "completely different text about spark catalyst optimizer plans"),
            (3, "tiny"),  # shorter than k: no fingerprints, no crash
        ],
        "doc_id long, text string",
    )
    pairs = passage_overlap_pairs(
        docs, k=4, window=5, min_shared=2, max_docs_per_fp=None
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(0, 1)}
    fps = winnow_fingerprints(docs, k=4, window=5)
    assert fps.where(F.col("doc_id") == 3).count() == 0


def test_winnowing_shift_invariant_guarantee(spark):
    """The winnowing guarantee holds under arbitrary prefix shifts: the
    shared 14-word passage (>= window+k-1 = 8) produces >= 1 common
    fingerprint for every prefix length."""
    from minimel_spark.operators.dedup import winnow_fingerprints

    passage = "aa bb cc dd ee ff gg hh ii jj kk ll mm nn"
    rows = [(i, ("x%d " % i) * i + passage) for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    by_doc: dict[int, set] = {}
    for r in winnow_fingerprints(docs, k=4, window=5).collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    base = by_doc[0]
    for i in range(1, 6):
        assert base & by_doc[i], f"doc {i} shares no fingerprint with doc 0"


# --------------------------------------------------------------------------
# prefix_jaccard_dups (prefix-filtered exact set-similarity join)
# --------------------------------------------------------------------------

from minimel_spark.operators.dedup import prefix_jaccard_dups  # noqa: E402


def _brute_jaccard(texts, threshold, n):
    import re

    def grams(t):
        ws = [w for w in re.split(r"\W+", t.lower()) if w]
        return set(" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1))

    sets = {i: grams(t) for i, t in texts}
    out = {}
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            if not sets[a] or not sets[b]:
                continue
            j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
            if j >= threshold:
                out[(a, b)] = j
    return out


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8])
def test_prefix_jaccard_lossless_vs_brute_force(spark, threshold):
    """Randomized losslessness check at LOW thresholds too — the regime
    where a naive prefix length would first go unsound."""
    import random

    rng = random.Random(threshold)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        (i, " ".join(rng.choices(vocab, k=rng.randrange(3, 14))))
        for i in range(80)
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in prefix_jaccard_dups(df, threshold=threshold, n=1).collect()
    }
    want = _brute_jaccard(texts, threshold, 1)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_prefix_jaccard_bigrams_and_short_docs(spark):
    texts = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma epsilon"),
        (3, "zeta"),  # shorter than n -> no shingles, never crashes
        (4, "alpha beta gamma delta"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in prefix_jaccard_dups(df, threshold=0.4, n=2).collect()
    }
    assert got == pytest.approx(_brute_jaccard(texts, 0.4, 2))


def test_prefix_jaccard_candidate_stream_smaller_than_any_shingle(spark):
    """The point of the operator: one hot token shared by every doc must
    not explode the candidate join. With t=0.9 and 20-token docs the
    prefix keeps ~3 tokens, so the hot token (max df) is excluded from
    every prefix."""
    rows = [
        (i, "hot " + " ".join(f"u{i}_{j}" for j in range(19))) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = prefix_jaccard_dups(df, threshold=0.9, n=1)
    assert out.count() == 0  # no real dups...
    # ...and the brute-force agrees there are none
    assert _brute_jaccard(rows, 0.9, 1) == {}


def test_prefix_jaccard_partitioning_invariant_and_guards(spark):
    rows = [(i, f"a b c d{i % 5} e{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(
        (r["id_a"], r["id_b"]) for r in prefix_jaccard_dups(df, 0.5).collect()
    )
    b = sorted(
        (r["id_a"], r["id_b"])
        for r in prefix_jaccard_dups(df.repartition(11, "text"), 0.5).collect()
    )
    assert a == b and len(a) > 0
    with pytest.raises(ValueError):
        prefix_jaccard_dups(df, threshold=0.0)
    with pytest.raises(ValueError):
        prefix_jaccard_dups(df, threshold=1.5)


# --------------------------------------------------------------------------
# LSH tuning curve
# --------------------------------------------------------------------------

from minimel_spark.operators.dedup import lsh_tuning_curve


def _curve_docs(spark):
    # identical pair (J=1), heavy-overlap pair, light-overlap pair
    return spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "alpha beta gamma delta epsilon eta"),
            (4, "alpha omega psi chi phi upsilon"),
            (5, "lorem ipsum dolor sit amet foo"),
        ],
        "doc_id long, text string",
    )


def test_lsh_curve_identical_pair_always_collides(spark):
    rows = lsh_tuning_curve(
        _curve_docs(spark), n=1, num_hashes=16, bands=8, n_bins=10
    ).collect()
    by_bin = {r["bin"]: r for r in rows}
    # J=1 pair lands in the top bin; identical shingle sets => identical
    # signatures => every band collides, and the analytic rate at s=1 is 1
    top = by_bin[9]
    assert top["n_collide"] == top["n_pairs"] >= 1
    assert top["measured_rate"] == 1.0
    assert top["analytic_rate"] == pytest.approx(1.0)
    # all rates are probabilities; bins are within range, sim_lo consistent
    for r in rows:
        assert 0 <= r["bin"] <= 9
        assert r["sim_lo"] == pytest.approx(r["bin"] / 10)
        assert 0.0 <= r["measured_rate"] <= 1.0
        assert 0.0 <= r["analytic_rate"] <= 1.0
        assert r["n_collide"] <= r["n_pairs"]


def test_lsh_curve_collision_matches_direct_banding(spark, documents):
    """arrays_overlap on per-doc band keys must agree pairwise with the
    band-join candidate set of minhash_dups (same params, md5 family)."""
    docs = documents.limit(40)
    caches: list = []
    curve_pairs = lsh_tuning_curve(
        docs, n=1, num_hashes=12, bands=6, n_bins=5,
        max_docs_per_shingle=None, persisted_out=caches,
    )
    total = curve_pairs.agg(
        F.sum("n_collide").alias("nc"), F.sum("n_pairs").alias("np")
    ).first()
    # candidate set from the real LSH join at threshold 0 (no size filter
    # drops at t=0; verify keeps all since J >= 0 always)
    cand = minhash_dups(
        docs, threshold=0.0, n=1, num_hashes=12, bands=6, hash_family="md5"
    ).count()
    for c in caches:
        c.unpersist()
    assert total["nc"] == cand
    assert total["np"] >= total["nc"]


def test_lsh_curve_guards(spark):
    with pytest.raises(ValueError):
        lsh_tuning_curve(_curve_docs(spark), n_bins=0)
    with pytest.raises(ValueError):
        lsh_tuning_curve(_curve_docs(spark), num_hashes=16, bands=5)


def test_lsh_curve_partitioning_invariant(spark, documents):
    # counts are exactly invariant; the float rates are averages whose
    # summation ORDER shifts with partitioning — compare at the 6-decimal
    # precision the gates pin (ulp-level drift only)
    def canon(df):
        return sorted(
            (
                r["bin"],
                r["sim_lo"],
                r["n_pairs"],
                r["n_collide"],
                round(r["measured_rate"], 6),
                round(r["analytic_rate"], 6),
            )
            for r in df.collect()
        )

    docs = documents.limit(30)
    a = canon(lsh_tuning_curve(docs, n=1, num_hashes=8, bands=4))
    b = canon(lsh_tuning_curve(docs.repartition(17), n=1, num_hashes=8, bands=4))
    assert a == b and len(a) > 0


# --------------------------------------------------------------------------
# substring_dup_spans (exact shared-substring spans)
# --------------------------------------------------------------------------


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_substring_spans_exact_positions(spark):
    from minimel_spark.operators.dedup import substring_dup_spans

    shared = "the quick brown fox jumps over the lazy dog again"  # 50 chars
    docs = _docs_df(
        spark,
        ["AAAA " + shared + " BBBB", "xxxxxxxxxx " + shared + " yy"],
    )
    rows = substring_dup_spans(docs, min_len=30).collect()
    # one maximal span; positions are the 0-based starts of the shared run
    assert len(rows) == 1
    (r,) = rows
    assert r["id_a"] == 0 and r["id_b"] == 1
    # " " + shared + " " is also common (both docs wrap it in spaces)
    assert r["pos_a"] == 4 and r["pos_b"] == 10
    assert r["span_len"] == len(shared) + 2


def test_substring_spans_two_separate_spans(spark):
    from minimel_spark.operators.dedup import substring_dup_spans

    s1 = "abcdefghijklmnopqrstuvwxyz0123456789ABCD"  # 40 chars
    s2 = "ZYXWVUTSRQPONMLKJIHGFEDCBA9876543210zyxw"  # 40 chars
    docs = _docs_df(spark, [s1 + "-----" + s2, s2 + "_____________" + s1])
    rows = {
        (r["pos_a"], r["pos_b"]): r["span_len"]
        for r in substring_dup_spans(docs, min_len=30).collect()
    }
    assert rows == {(0, 53): 40, (45, 0): 40}


def test_substring_spans_below_min_len_not_reported(spark):
    from minimel_spark.operators.dedup import substring_dup_spans

    docs = _docs_df(
        spark, ["shared-prefix-0123456789" + "q" * 30, "shared-prefix-0123456789" + "w" * 30]
    )
    # common prefix is 24 chars < 30
    assert substring_dup_spans(docs, min_len=30).count() == 0
    # ... and exactly at the boundary it appears
    assert substring_dup_spans(docs, min_len=24).count() == 1


def test_substring_spans_periodic_text_multiple_diagonals(spark):
    from minimel_spark.operators.dedup import substring_dup_spans

    unit = "0123456789"
    docs = _docs_df(spark, [unit * 4, "##" + unit * 3])
    rows = substring_dup_spans(docs, min_len=10).collect()
    # every alignment offset of the periodic run is its own maximal span
    diags = {(r["pos_a"] - r["pos_b"]) for r in rows}
    assert len(rows) == len(diags) >= 3
    # the main diagonal carries the longest overlap: 30 shared chars
    assert max(r["span_len"] for r in rows) == 30


def test_substring_spans_cap_and_partitioning_invariance(spark, documents):
    from minimel_spark.operators.dedup import substring_dup_spans

    def spans(df, **kw):
        return sorted(tuple(r) for r in substring_dup_spans(df, **kw).collect())

    docs = documents.limit(40)
    caches: list = []
    one = spans(docs, min_len=25, max_docs_per_gram=None)
    two = spans(docs.repartition(13), min_len=25, max_docs_per_gram=None)
    assert one == two
    # the cap only ever removes or splits spans, never invents matches:
    # every capped seed position lies inside some uncapped span
    capped = spans(docs, min_len=25, max_docs_per_gram=2, persisted_out=caches)
    full = {(ia, ib) for ia, ib, *_ in one}
    assert {(ia, ib) for ia, ib, *_ in capped} <= full
    for c in caches:
        c.unpersist()


# --------------------------------------------------------------------------
# tfidf_cosine_dups (exact weighted all-pairs similarity join)
# --------------------------------------------------------------------------


def test_tfidf_cosine_identical_docs_score_one(spark):
    from minimel_spark.operators.dedup import tfidf_cosine_dups

    docs = _docs_df(
        spark,
        [
            "alpha beta gamma delta",
            "alpha beta gamma delta",
            "completely different words here",
        ],
    )
    rows = tfidf_cosine_dups(docs, threshold=0.5).collect()
    assert len(rows) == 1
    (r,) = rows
    assert (r["id_a"], r["id_b"]) == (0, 1)
    assert r["cosine"] == pytest.approx(1.0)


def test_tfidf_cosine_disjoint_and_stopword_only_docs(spark):
    from minimel_spark.operators.dedup import tfidf_cosine_dups

    # 'the' appears in every doc -> idf 0 -> dropped; the remaining tokens
    # are disjoint, so no pair clears any positive threshold
    docs = _docs_df(spark, ["the aa bb", "the cc dd", "the ee ff"])
    assert tfidf_cosine_dups(docs, threshold=0.1).count() == 0


def test_tfidf_cosine_validates_threshold(spark):
    from minimel_spark.operators.dedup import tfidf_cosine_dups

    docs = _docs_df(spark, ["a b"])
    with pytest.raises(ValueError, match="threshold"):
        tfidf_cosine_dups(docs, threshold=0.0)
    with pytest.raises(ValueError, match="threshold"):
        tfidf_cosine_dups(docs, threshold=1.5)


def test_tfidf_cosine_matches_bruteforce_and_partitioning(spark, documents):
    """Losslessness: the prefix-filtered join equals a pure-Python brute
    force over the same idf/normalization arithmetic, and the result is
    partitioning-invariant."""
    import math
    import re
    from collections import Counter

    from minimel_spark.operators.dedup import tfidf_cosine_dups

    docs = documents.limit(40).select("doc_id", "text")
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    n = len(rows)
    toks = {
        i: Counter(w for w in re.split(r"\W+", t.lower()) if w)
        for i, t in rows.items()
    }
    df = Counter()
    for c in toks.values():
        df.update(set(c))
    vecs = {}
    for i, c in toks.items():
        w = {t: tf * math.log(n / df[t]) for t, tf in c.items() if df[t] < n}
        nm = math.sqrt(sum(x * x for x in w.values()))
        if nm > 0:
            vecs[i] = {t: x / nm for t, x in w.items()}
    want = {}
    ids = sorted(vecs)
    for x in ids:
        for y in ids:
            if x < y:
                dot = sum(
                    vx * vecs[y][t] for t, vx in vecs[x].items() if t in vecs[y]
                )
                if dot >= 0.5:
                    want[(x, y)] = round(dot, 6)
    caches: list = []
    got = {
        (r["id_a"], r["id_b"]): round(r["cosine"], 6)
        for r in tfidf_cosine_dups(
            docs, threshold=0.5, persisted_out=caches
        ).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-6)
    got2 = {
        (r["id_a"], r["id_b"]): round(r["cosine"], 6)
        for r in tfidf_cosine_dups(docs.repartition(13), threshold=0.5).collect()
    }
    assert got == got2
    for c in caches:
        c.unpersist()


def _py_cdc(text, k, divisor):
    import hashlib

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    n = len(text)
    ends = sorted(
        {i for i in range(k, n + 1) if h60(text[i - k : i]) % divisor == 0}
        | {n}
    )
    out, start = [], 1
    for idx, e in enumerate(ends, 1):
        chunk = text[start - 1 : e]
        out.append((idx, start, len(chunk), h60(chunk)))
        start = e + 1
    return out


def test_cdc_chunks_match_pure_python_and_tile(spark):
    from minimel_spark.operators.dedup import cdc_chunks

    texts = [
        (1, "The quick brown fox jumps over the lazy dog." * 6),
        (2, "short"),
        (3, "abcdefghij" * 20),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {}
    for r in cdc_chunks(docs, k=8, divisor=16).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["cstart"], r["clen"], r["chunk_hash"])
        )
    for did, text in texts:
        want = _py_cdc(text, 8, 16)
        assert sorted(got[did]) == want, did
        # chunks tile the document exactly
        assert sum(c[2] for c in want) == len(text)


def test_cdc_realignment_after_edit(spark):
    """The CDC property: an insertion shifts only the chunk it lands in;
    all later cut points re-align, so most chunks stay shared."""
    from minimel_spark.operators.dedup import cdc_dedup_stats

    body = "Entity resolution pipelines chunk content for dedup. " * 10
    docs = spark.createDataFrame(
        [(1, body), (2, "INSERTED PREFIX >> " + body)],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in cdc_dedup_stats(docs, k=8, divisor=16).collect()
    }
    # the bulk of both docs' mass is in shared chunks despite the prefix edit
    assert rows[1]["dup_frac"] > 0.7 and rows[2]["dup_frac"] > 0.7


def test_cdc_stats_partition_invariant(spark):
    from minimel_spark.operators.dedup import cdc_chunks, cdc_dedup_stats

    docs = spark.createDataFrame(
        [(i, f"block {i % 3} " * 30) for i in range(24)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, cdc_dedup_stats(docs.coalesce(1)).collect()))
    b = sorted(map(tuple, cdc_dedup_stats(docs.repartition(16)).collect()))
    assert a == b and len(a) == 24
    import pytest as _pytest

    with _pytest.raises(ValueError):
        cdc_chunks(docs, k=0)


def test_spectral_word_embedding_two_cliques(spark):
    import numpy as np

    from minimel_spark.operators.embed import spectral_word_embedding

    # two disjoint word communities; the dominant eigenvector concentrates
    # on the more strongly connected one, coordinates nonnegative
    docs = spark.createDataFrame(
        [(i, "aa bb aa bb aa bb aa bb") for i in range(6)]
        + [(100 + i, "xx yy xx yy") for i in range(2)],
        "doc_id long, text string",
    )
    got = {r["w"]: r["x"] for r in spectral_word_embedding(docs, n_iter=12).collect()}
    assert set(got) == {"aa", "bb", "xx", "yy"}
    assert all(v >= 0 for v in got.values())
    # unit norm
    assert abs(sum(v * v for v in got.values()) - 1.0) < 1e-9
    # PPMI emphasizes the RARE association (ppmi = ln(T/n) for a closed
    # 2-word clique): the xx-yy pair carries the higher weight
    assert got["xx"] > got["aa"]
    # power iteration agrees with numpy on the same PPMI matrix
    words = ["aa", "bb", "xx", "yy"]
    n_ab = {("aa", "bb"): 42, ("bb", "aa"): 42, ("xx", "yy"): 6, ("yy", "xx"): 6}
    T = sum(n_ab.values())
    r = {w: sum(v for (a, _), v in n_ab.items() if a == w) for w in words}
    M = np.zeros((4, 4))
    for (a, b), v in n_ab.items():
        M[words.index(a), words.index(b)] = max(0.0, np.log(v * T / (r[a] * r[b])))
    x = np.full(4, 0.5)
    for _ in range(12):
        y = M @ x
        n = np.linalg.norm(y)
        x = y / n if n > 0 else y
    for i, w in enumerate(words):
        assert abs(got[w] - x[i]) < 1e-9, (w, got[w], x[i])


def test_spectral_word_embedding_partition_invariant_and_validation(spark):
    import pytest as _pt

    from minimel_spark.operators.embed import spectral_word_embedding

    docs = spark.createDataFrame(
        [(i, f"w{i % 7} w{(i * 3) % 7} w{(i * 5 + 1) % 7}") for i in range(40)],
        "doc_id long, text string",
    )
    a = sorted(
        (r["w"], round(r["x"], 12))
        for r in spectral_word_embedding(docs.coalesce(1), n_iter=6).collect()
    )
    b = sorted(
        (r["w"], round(r["x"], 12))
        for r in spectral_word_embedding(docs.repartition(16), n_iter=6).collect()
    )
    assert a == b and len(a) == 7
    with _pt.raises(ValueError, match="n_iter"):
        spectral_word_embedding(docs, n_iter=0)


def _py_wjac(a, b):
    import re
    from collections import Counter

    ca = Counter(w for w in re.split(r"\W+", a.lower()) if w)
    cb = Counter(w for w in re.split(r"\W+", b.lower()) if w)
    smin = sum((ca & cb).values())
    smax = sum((ca | cb).values())
    return smin / smax if smax else 0.0


def test_weighted_jaccard_matches_python_and_bounds(spark):
    import itertools

    import pytest as _pytest

    from minimel_spark.operators.dedup import ngram_jaccard_dups, weighted_jaccard_dups

    rows = [
        (1, "spam spam spam spam eggs"),
        (2, "spam eggs"),
        (3, "spam spam spam spam eggs ham"),
        (4, "totally different content here"),
        (5, "totally different content here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["wjaccard"]
        for r in weighted_jaccard_dups(docs, threshold=0.01, n=1).collect()
    }
    texts = dict(rows)
    for ia, ib in itertools.combinations(sorted(texts), 2):
        want = _py_wjac(texts[ia], texts[ib])
        if want >= 0.01:
            assert abs(got[(ia, ib)] - want) < 1e-12, (ia, ib)
        else:
            assert (ia, ib) not in got
    # repetition-awareness: set Jaccard calls (1,2) identical, weighted doesn't
    sj = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_dups(docs, threshold=0.01, n=1).collect()
    }
    assert sj[(1, 2)] == 1.0 and got[(1, 2)] == 2 / 5
    # ...and rewards SHARED repetition: (1,3) share the spam run, so the
    # weighted score RISES above the set score there
    assert got[(1, 3)] == 5 / 6 > sj[(1, 3)]
    # exact copies score 1.0 in both
    assert got[(4, 5)] == 1.0 and sj[(4, 5)] == 1.0
    a = sorted(map(tuple, weighted_jaccard_dups(docs.coalesce(1), threshold=0.3).collect()))
    b = sorted(map(tuple, weighted_jaccard_dups(docs.repartition(8), threshold=0.3).collect()))
    assert a == b
    with _pytest.raises(ValueError):
        weighted_jaccard_dups(docs, threshold=0.0)


def test_jl_project_md5_matches_python_and_distortion(spark):
    import hashlib
    import math
    import random

    import pytest as _pytest

    from minimel_spark.operators.embed import jl_distortion, jl_project

    rng = random.Random(31)
    in_dim, out_dim = 12, 4
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(in_dim)]) for i in range(20)
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["vec_id"]: list(r["proj"])
        for r in jl_project(df, in_dim, out_dim, seed=7, hash_family="md5").collect()
    }

    def sign(j, i):
        h = int(hashlib.md5(f"jl:7:{j}:{i}".encode()).hexdigest()[:15], 16)
        return 1.0 if h % 2 == 1 else -1.0

    import numpy as np

    scale = 1.0 / math.sqrt(out_dim)
    for i, v in rows:
        v32 = [float(np.float32(x)) for x in v]
        for j in range(out_dim):
            acc = 0.0
            for k in range(in_dim):
                acc = acc + v32[k] * sign(j, k)
            assert abs(got[i][j] - acc * scale) < 1e-12, (i, j)
    # distortion panel: ratios concentrate near 1 (JL lemma, loose bound for
    # tiny k — just pin positivity and a wide sane band + exact ratio algebra)
    proj = jl_project(df, in_dim, out_dim, seed=7, hash_family="md5")
    aud = jl_distortion(df, proj)
    rowsd = aud.collect()
    assert len(rowsd) == 19
    for r in rowsd:
        assert r["d2_orig"] > 0 and r["d2_proj"] >= 0
        assert abs(r["ratio"] - r["d2_proj"] / r["d2_orig"]) < 1e-12
    # np family: correct shape + invariance across partitioning
    a = {
        r["vec_id"]: list(r["proj"])
        for r in jl_project(df.coalesce(1), in_dim, out_dim, hash_family="np").collect()
    }
    b = {
        r["vec_id"]: list(r["proj"])
        for r in jl_project(df.repartition(8), in_dim, out_dim, hash_family="np").collect()
    }
    assert set(a) == set(b) and all(len(v) == out_dim for v in a.values())
    for k in a:
        assert all(abs(x - y) < 1e-12 for x, y in zip(a[k], b[k]))
    with _pytest.raises(ValueError):
        jl_project(df, in_dim, 0)
    with _pytest.raises(ValueError):
        jl_project(df, in_dim, out_dim, hash_family="nope")
