"""Suffix-array prefix doubling + LCP lifting (operators/suffix.py)."""

import random
import re

import pytest

from minimel_spark.operators.suffix import (
    global_dense_rank,
    longest_repeated_substrings,
    token_suffix_ranks,
)


def _toks(t):
    return [w for w in re.split(r"\W+", t.lower()) if w]


def _py_lrs(rows, top_n):
    """Brute-force replay: materialize every suffix, sort by
    (tokens, doc, pos) — python tuple comparison has the same
    shorter-prefix-first semantics as the shared-sentinel ranks — and
    take adjacent-pair LCPs."""
    sufs = []
    for d, t in rows:
        ws = _toks(t)
        for p in range(len(ws)):
            sufs.append((tuple(ws[p:]), d, p + 1))
    sufs.sort()
    out = []
    # pair orientation: (da, pa) = the order-PREDECESSOR, (db, pb) = its
    # successor (the operator's b-side carries idx-1, so the a-side row it
    # meets is one position earlier in the order)
    for (sa, da, pa), (sb, db, pb) in zip(sufs, sufs[1:]):
        i = 0
        while i < min(len(sa), len(sb)) and sa[i] == sb[i]:
            i += 1
        out.append((da, pa, db, pb, i, " ".join(sa[:i])))
    out.sort(key=lambda r: (-r[4], r[0], r[1]))
    return out[:top_n]


def test_lrs_matches_bruteforce_suffix_sort(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "a lazy dog sleeps while the quick brown fox runs"),
        (3, "completely unrelated words appear here only once"),
        (4, "the quick brown fox jumps again today"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["da"], r["pa"], r["db"], r["pb"], r["lcp"], r["repeat"])
        for r in longest_repeated_substrings(docs, top_n=8, rounds=5).collect()
    )
    want = sorted(_py_lrs(rows, 8))
    assert got == want
    # the longest repeat is the 5-token shared opening
    assert max(g[4] for g in got) == 5


def test_lrs_random_corpus_and_identical_docs(spark):
    rng = random.Random(17)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(3, 12))))
        for i in range(12)
    ]
    rows.append((100, rows[0][1]))  # exact duplicate document
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["da"], r["pa"], r["db"], r["pb"], r["lcp"], r["repeat"])
        for r in longest_repeated_substrings(docs, top_n=25, rounds=5).collect()
    )
    want = sorted(_py_lrs(rows, 25))
    assert got == want
    # the duplicated doc produces an adjacent pair with lcp == its length
    full = len(_toks(rows[0][1]))
    assert any(g[4] == full for g in got)


def test_lrs_partition_invariance_and_validation(spark):
    rows = [(i, f"common prefix words here tail{i}") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(
        map(tuple, longest_repeated_substrings(docs.coalesce(1), top_n=6, rounds=4).collect())
    )
    b = sorted(
        map(tuple, longest_repeated_substrings(docs.repartition(8), top_n=6, rounds=4).collect())
    )
    assert a == b and len(a) == 6
    with pytest.raises(ValueError):
        longest_repeated_substrings(docs, top_n=0)
    with pytest.raises(ValueError):
        token_suffix_ranks(docs, rounds=0)


def test_global_dense_rank_is_sorted_position(spark):
    rng = random.Random(3)
    vals = [(rng.randrange(50), rng.randrange(50)) for _ in range(300)]
    df = spark.createDataFrame(vals, "a long, b long")
    got = {
        (r["a"], r["b"]): r["rank"]
        for r in global_dense_rank(df, ["a", "b"], "rank").collect()
    }
    want = {kv: i + 1 for i, kv in enumerate(sorted(set(vals)))}
    assert got == want
    # invariant under input partitioning
    got2 = {
        (r["a"], r["b"]): r["rank"]
        for r in global_dense_rank(df.repartition(16), ["a", "b"], "rank").collect()
    }
    assert got2 == want


def test_suffix_rank_equality_iff_identical_suffix(spark):
    rows = [(1, "x y z x y"), (2, "x y z w")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    final = token_suffix_ranks(docs, rounds=4)[-1]
    ranks = {
        (r["_d"], r["pos"]): r["rank"] for r in final.collect()
    }
    sufs = {}
    for d, t in rows:
        ws = _toks(t)
        for p in range(len(ws)):
            sufs[(d, p + 1)] = tuple(ws[p:])
    for ka, sa in sufs.items():
        for kb, sb in sufs.items():
            if ka < kb:
                assert (ranks[ka] == ranks[kb]) == (sa == sb), (ka, kb)
    # order agreement: rank order == suffix tuple order wherever distinct
    for ka, sa in sufs.items():
        for kb, sb in sufs.items():
            if sa != sb:
                assert (ranks[ka] < ranks[kb]) == (sa < sb), (ka, kb)
