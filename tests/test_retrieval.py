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


def test_rank_fusion_hand_example(spark):
    import pytest

    from minimel_spark.operators.retrieval import rank_fusion

    scored = spark.createDataFrame(
        [
            ("q", "a", 0.9, 1.0),
            ("q", "b", 0.8, 3.0),
            ("q", "c", 0.7, 2.0),
        ],
        "query_id string, cand_id string, s1 double, s2 double",
    )
    out = {r["cand_id"]: r for r in rank_fusion(scored, ["s1", "s2"], k=60).collect()}
    assert out["a"]["rank_s1"] == 1 and out["a"]["rank_s2"] == 3
    assert out["b"]["rank_s1"] == 2 and out["b"]["rank_s2"] == 1
    assert abs(out["a"]["rrf"] - (1 / 61 + 1 / 63)) < 1e-12
    assert abs(out["b"]["rrf"] - (1 / 62 + 1 / 61)) < 1e-12
    # b's strong second ranking lifts it above a on the fused score
    assert out["b"]["rrf"] > out["a"]["rrf"]
    with pytest.raises(ValueError):
        rank_fusion(scored, [])
    with pytest.raises(ValueError):
        rank_fusion(scored, ["s1"], k=0)


def test_rank_fusion_tie_break_and_query_isolation(spark):
    from minimel_spark.operators.retrieval import rank_fusion

    scored = spark.createDataFrame(
        [("q1", "z", 0.5, 0.5), ("q1", "y", 0.5, 0.5), ("q2", "z", 0.1, 0.1)],
        "query_id string, cand_id string, s1 double, s2 double",
    )
    out = {(r["query_id"], r["cand_id"]): r for r in rank_fusion(scored, ["s1", "s2"]).collect()}
    # score ties break by candidate id ascending
    assert out[("q1", "y")]["rank_s1"] == 1 and out[("q1", "z")]["rank_s1"] == 2
    # rankings are per query: q2's lone candidate ranks first
    assert out[("q2", "z")]["rank_s1"] == 1


def test_rank_agreement_tau_extremes(spark):
    from minimel_spark.operators.retrieval import rank_agreement

    rows = [
        # q1: identical rankings -> tau 1
        ("q1", "a", 1, 1), ("q1", "b", 2, 2), ("q1", "c", 3, 3),
        # q2: fully reversed -> tau -1
        ("q2", "a", 1, 3), ("q2", "b", 2, 2), ("q2", "c", 3, 1),
        # q3: single candidate -> tau NULL
        ("q3", "a", 1, 1),
    ]
    df = spark.createDataFrame(rows, "query_id string, cand_id string, ra long, rb long")
    out = {r["query_id"]: r for r in rank_agreement(df, "ra", "rb").collect()}
    assert out["q1"]["tau"] == 1.0 and out["q1"]["concordant"] == 3
    assert out["q2"]["tau"] == -1.0 and out["q2"]["discordant"] == 3
    assert out["q3"]["tau"] is None and out["q3"]["n_cands"] == 1


def test_rank_agreement_partial(spark):
    from minimel_spark.operators.retrieval import rank_agreement

    # one inversion among three candidates: tau = (2-1)/3
    rows = [("q", "a", 1, 1), ("q", "b", 2, 3), ("q", "c", 3, 2)]
    df = spark.createDataFrame(rows, "query_id string, cand_id string, ra long, rb long")
    r = rank_agreement(df, "ra", "rb").collect()[0]
    assert abs(r["tau"] - 1 / 3) < 1e-12
    assert r["concordant"] == 2 and r["discordant"] == 1


def _py_rm3(docs, terms, fb_docs=3, fb_terms=8, alpha=0.6):
    import re

    scores = _py_bm25(docs, terms)
    doc_s = {}
    for (t, d), s in scores.items():
        doc_s[d] = doc_s.get(d, 0.0) + s
    fb = sorted(doc_s.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:fb_docs]
    den = sum(s for _, s in fb)
    toks = {d: [w for w in re.split(r"\W+", t.lower()) if w] for d, t in docs}
    num = {}
    for d, s in fb:
        dl = len(toks[d])
        for w in toks[d]:
            num[w] = num.get(w, 0.0) + s / dl
    qset = set(terms)
    cand = set(num) | qset
    wgt = {
        w: round(
            (1.0 - alpha) * (1.0 if w in qset else 0.0) / len(qset)
            + alpha * (num.get(w, 0.0) / den),
            6,
        )
        for w in cand
    }
    top = sorted(wgt.items(), key=lambda kv: (-kv[1], kv[0]))[:fb_terms]
    return [(w, v, i + 1) for i, (w, v) in enumerate(top)]


def test_rm3_expansion_matches_python_reference(spark):
    from minimel_spark.operators.retrieval import rm3_expansion

    docs = [
        (1, "apple banana cherry apple fruit salad recipe"),
        (2, "apple pie recipe with cinnamon and sugar crust"),
        (3, "banana bread recipe using ripe banana and flour"),
        (4, "astronomy telescope star chart observation guide"),
        (5, "apple orchard harvest season fruit picking"),
    ]
    terms = ["apple", "banana", "quasar"]
    tdf = spark.createDataFrame([(t,) for t in terms], "term string")
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    got = [
        (r["term"], r["weight"], r["rnk"])
        for r in rm3_expansion(ddf, tdf, fb_docs=3, fb_terms=8, alpha=0.6)
        .orderBy("rnk")
        .collect()
    ]
    want = _py_rm3(docs, terms, fb_docs=3, fb_terms=8, alpha=0.6)
    assert got == want
    # "quasar" matches no document: it still keeps its (1-a)/|Q| prior mass
    wq = dict((t, w) for t, w, _ in got)
    assert abs(wq["quasar"] - round(0.4 / 3, 6)) < 1e-9


def test_rm3_expansion_invariance_and_validation(spark):
    import pytest as _pytest

    from minimel_spark.operators.retrieval import rm3_expansion

    rows = [(i, f"common words here plus w{i % 7} and w{i % 3}") for i in range(40)]
    ddf = spark.createDataFrame(rows, "doc_id long, text string")
    tdf = spark.createDataFrame([("common",), ("words",)], "term string")
    a = [
        tuple(r)
        for r in rm3_expansion(ddf.coalesce(1), tdf, fb_docs=5, fb_terms=6)
        .orderBy("rnk")
        .collect()
    ]
    b = [
        tuple(r)
        for r in rm3_expansion(ddf.repartition(8), tdf, fb_docs=5, fb_terms=6)
        .orderBy("rnk")
        .collect()
    ]
    assert a == b and len(a) == 6
    # alpha=0 degenerates to the uniform query prior
    q0 = {
        r["term"]: r["weight"]
        for r in rm3_expansion(ddf, tdf, fb_docs=5, fb_terms=2, alpha=0.0).collect()
    }
    assert q0 == {"common": 0.5, "words": 0.5}
    with _pytest.raises(ValueError):
        rm3_expansion(ddf, tdf, fb_docs=0)
    with _pytest.raises(ValueError):
        rm3_expansion(ddf, tdf, alpha=1.5)
