"""BM25 ranking tests: parity with an independent Python implementation and
determinism of the rank cut."""

import math

import pyspark.sql.functions as F

from minimel_spark.operators.retrieval import bm25_topk, top_df_terms


def _py_bm25(docs, terms, k1=1.2, b=0.75):
    import re

    toks = {d: [w for w in re.split(r"\W+", t.lower()) if w] for d, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for term in terms:
        df = sum(1 for v in toks.values() if term in v)
        if df == 0:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for d, v in toks.items():
            tf = v.count(term)
            if tf:
                dl = len(v)
                out[(term, d)] = idf * (
                    tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))
                )
    return out


def test_bm25_matches_python_reference(spark):
    rows = [
        (0, "spark shuffles data between stages and spark caches hot data"),
        (1, "catalyst optimizes spark plans before execution"),
        (2, "data pipelines move data between systems moving data constantly"),
        (3, "a short note"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    terms = spark.createDataFrame([("spark",), ("data",)], "term string")
    got = {
        (r["term"], r["doc_id"]): r["score"]
        for r in bm25_topk(docs, terms, k=10).collect()
    }
    want = _py_bm25(rows, ["spark", "data"])
    assert set(got) == set(want)
    for key in want:
        assert abs(got[key] - want[key]) < 1e-12, key
    # higher tf on same-length docs ranks first
    assert got[("data", 2)] > got[("data", 0)]


def test_top_df_terms_total_order(spark, documents):
    terms = [r["term"] for r in top_df_terms(documents, m=8, min_len=4).collect()]
    assert len(terms) == 8 == len(set(terms))
    t2 = [
        r["term"]
        for r in top_df_terms(documents.repartition(13), m=8, min_len=4).collect()
    ]
    assert terms == t2  # deterministic under repartition
