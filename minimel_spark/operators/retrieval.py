"""BM25 term-document ranking (SURVEY §4 LLM-pipeline family, round 5):
the standard lexical retrieval score, used in training-data pipelines for
query-targeted corpus selection (e.g. pulling domain-relevant documents for
a fine-tuning mix) and as the quality baseline next to embedding ANN
(`ann.py`). No counterpart in the reference; Spark-first new work.

Scale design — three narrow aggregations, no windows over the corpus:
- term frequencies: one (doc, term) shuffle with map-side partial counts;
- document frequencies: one distinct-(doc, term) -> per-term count (the
  (doc, term) table is reused for both, so the explode runs once);
- document lengths + the global (N, avgdl) scalars: per-doc map-side sizes
  and a broadcast 1-row aggregate — never a driver collect, never a
  single-partition exchange.
The per-(query-term, doc) score is a codegen'd expression over those joined
longs; top-k per term is a rank window partitioned by term.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .util import words_lower


def _words(text_col: str) -> F.Column:
    # the shared segmentation contract (util.words_lower == the oracles')
    return words_lower(F.col(text_col))


def bm25_topk(
    docs: DataFrame,
    terms: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents per query term by BM25 (Robertson/Lucene form):

        score(t, d) = ln(1 + (N - df + 0.5)/(df + 0.5))
                      * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    ``terms``: a (term) DataFrame of query terms (small — broadcast-joined
    onto the term-frequency table, so only matching postings survive the
    first join). Returns (term, doc_id, score, rnk) with rnk 1..k ordered by
    (score desc, doc_id asc) — the doc_id tie-break makes the cut total and
    parallelism-invariant.
    """
    base = docs.select(id_col, F.explode(_words(text_col)).alias("term")).join(
        F.broadcast(terms.select("term").distinct()), "term"
    )
    tf = base.groupBy("term", id_col).agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dl = docs.select(id_col, F.size(_words(text_col)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    score = idf * (
        F.col("tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    w = Window.partitionBy("term").orderBy(F.desc("score"), F.asc(id_col))
    return (
        tf.join(df_, "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select("term", id_col, score.alias("score"))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
    )


def top_df_terms(docs: DataFrame, m: int = 8, min_len: int = 4,
                 text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The ``m`` highest-document-frequency terms of length >= ``min_len`` —
    a deterministic query-term fixture generator (total order by
    (df desc, term asc); TakeOrderedAndProject, no global sort)."""
    dt = (
        docs.select(id_col, F.explode(_words(text_col)).alias("term"))
        .where(F.length("term") >= min_len)
        .distinct()
    )
    return (
        dt.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(m)
        .select("term")
    )


def rank_fusion(
    scored: DataFrame,
    score_cols: list[str],
    query_col: str = "query_id",
    cand_col: str = "cand_id",
    k: int = 60,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009)
    over a multi-scored candidate table: each score column induces a
    per-query ranking (score descending, candidate-id tie-break), and the
    fused score is ``Σ_i 1 / (k + rank_i)`` — the standard way to combine
    a lexical ranker with a similarity ranker in HYBRID candidate
    generation, robust to incomparable score scales precisely because it
    consumes only ranks. ``k`` damps the head (60 is the paper's
    default).

    Ranks are integers, so the fusion is engine-exact: the only floats
    are the final reciprocals, summed in ``score_cols`` order. A
    candidate missing from one ranker's view simply isn't in this table —
    RRF over an outer union (with absent ranks contributing 0) is the
    caller's composition: union the per-ranker candidate sets first.

    Scale: one bounded window per ranker, each partitioned by query (a
    query's candidate list, never global); the fused projection is
    row-local. Output: input columns plus ``rank_<col>`` per ranker and
    ``rrf`` (the fused score).
    """
    if not score_cols:
        raise ValueError("score_cols must be non-empty")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    out = scored
    for c in score_cols:
        w = Window.partitionBy(query_col).orderBy(F.desc(c), F.asc(cand_col))
        out = out.withColumn(f"rank_{c}", F.row_number().over(w).cast("long"))
    fused = None
    for c in score_cols:
        term = F.lit(1.0) / (F.lit(float(k)) + F.col(f"rank_{c}"))
        fused = term if fused is None else fused + term
    return out.withColumn("rrf", fused)


def rank_agreement(
    ranked: DataFrame,
    rank_a_col: str,
    rank_b_col: str,
    query_col: str = "query_id",
    cand_col: str = "cand_id",
) -> DataFrame:
    """Per-query Kendall tau between two candidate rankings — the
    diagnostic that decides whether :func:`rank_fusion` is worth its
    second ranker: tau ≈ 1 means the rankers are redundant (fusion buys
    nothing), tau ≈ 0 means they see DIFFERENT evidence (fusion's sweet
    spot), tau < 0 on some query slice means one ranker is actively
    wrong there and the slice deserves a look. Computed as tau-a over
    permutation ranks (row_number ranks are tie-free by construction;
    feed dense ranks at your own risk — tied pairs count as discordant
    under the strict inequality, the conservative read):

        tau = (concordant − discordant) / C(n, 2)

    Scale: one within-query candidate self-join (C(n,2) per query —
    candidate lists are top-k-truncated upstream, so this is k², not
    corpus-shaped) and one rollup. Queries with a single candidate emit
    NULL tau (undefined, not 0 — "no evidence" must not read as "no
    correlation").

    Output: ``(query_id, n_cands, concordant, discordant, tau)``.
    """
    r = ranked.select(
        F.col(query_col).alias("_q"),
        F.col(cand_col).alias("_c"),
        F.col(rank_a_col).cast("long").alias("_ra"),
        F.col(rank_b_col).cast("long").alias("_rb"),
    )
    a = r.select("_q", F.col("_c").alias("_c1"), F.col("_ra").alias("_ra1"), F.col("_rb").alias("_rb1"))
    b = r.select("_q", F.col("_c").alias("_c2"), F.col("_ra").alias("_ra2"), F.col("_rb").alias("_rb2"))
    pairs = a.join(b, "_q").where(F.col("_c1") < F.col("_c2"))
    conc = (
        (F.col("_ra1") < F.col("_ra2")) & (F.col("_rb1") < F.col("_rb2"))
    ) | ((F.col("_ra1") > F.col("_ra2")) & (F.col("_rb1") > F.col("_rb2")))
    per_pair = pairs.groupBy("_q").agg(
        F.sum(F.when(conc, 1).otherwise(0)).cast("long").alias("concordant"),
        F.sum(F.when(conc, 0).otherwise(1)).cast("long").alias("discordant"),
    )
    sizes = r.groupBy("_q").agg(F.count(F.lit(1)).cast("long").alias("n_cands"))
    return (
        sizes.join(per_pair, "_q", "left")
        .select(
            F.col("_q").alias(query_col),
            "n_cands",
            F.coalesce("concordant", F.lit(0)).cast("long").alias("concordant"),
            F.coalesce("discordant", F.lit(0)).cast("long").alias("discordant"),
            F.when(
                F.col("n_cands") >= 2,
                (F.coalesce("concordant", F.lit(0)) - F.coalesce("discordant", F.lit(0)))
                / (F.col("n_cands") * (F.col("n_cands") - 1) / 2),
            ).alias("tau"),
        )
    )


def rm3_expansion(
    docs: DataFrame,
    query_terms: DataFrame,
    fb_docs: int = 10,
    fb_terms: int = 10,
    alpha: float = 0.6,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """RM3 pseudo-relevance feedback query expansion (Lavrenko & Croft,
    SIGIR 2001; the Anserini/Pyserini default expansion model) — in a
    training-data pipeline this is how a small seed query grows into a
    domain vocabulary for corpus selection: retrieve, assume the top
    ``fb_docs`` are relevant, and re-estimate the query language model
    from them.

    - document relevance weight s(d) = Σ_q BM25(q, d) over the query terms
      (the BM25-weighted relevance-model variant); the feedback cut is by
      (round(s, 6) desc, id asc) — rounding first makes the cut a total
      order both engines reproduce even at float-noise boundaries;
    - RM1(w) = Σ_d P(w|d)·s(d) / Σ_d s(d) with MLE P(w|d) = tf(w,d)/|d|
      (Σ_w RM1 = 1 by construction);
    - RM3(w) = (1-α)·[w ∈ Q]/|Q| + α·RM1(w) — query terms keep mass even
      when absent from the feedback docs (full outer join, not left);
    - output: top ``fb_terms`` rows (term, weight, rnk) by
      (round(weight, 6) desc, term asc).

    Scale: the posting scan touches only query-term postings (broadcast
    semi-join), feedback statistics touch only the fb_docs documents, and
    the final rank window runs AFTER the top-m cut, over ≤ fb_terms rows.
    """
    if fb_docs < 1:
        raise ValueError(f"fb_docs must be >= 1, got {fb_docs}")
    if fb_terms < 1:
        raise ValueError(f"fb_terms must be >= 1, got {fb_terms}")
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    qt = query_terms.select("term").distinct()
    base = docs.select(id_col, F.explode(_words(text_col)).alias("term")).join(
        F.broadcast(qt), "term"
    )
    tf = base.groupBy("term", id_col).agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dl = docs.select(id_col, F.size(_words(text_col)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    score = idf * (
        F.col("tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    doc_s = (
        tf.join(df_, "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(id_col, score.alias("score"))
        .groupBy(id_col)
        .agg(F.sum("score").alias("s"))
    )
    fb = (
        doc_s.orderBy(F.desc(F.round("s", 6)), F.asc(id_col))
        .limit(fb_docs)
        .localCheckpoint(eager=True)  # 3 consumers: denom, tf join, dl join
    )
    den = fb.agg(F.sum("s").alias("den"))
    ftf = (
        docs.join(fb.select(id_col), id_col)
        .select(id_col, F.explode(_words(text_col)).alias("term"))
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tfw"))
    )
    rm1 = (
        ftf.join(dl, id_col)
        .join(fb, id_col)
        .groupBy("term")
        .agg(F.sum(F.col("tfw") / F.col("dl") * F.col("s")).alias("num"))
    )
    cand = rm1.join(qt.withColumn("inq", F.lit(1.0)), "term", "full_outer")
    nq = qt.agg(F.count(F.lit(1)).cast("double").alias("nq"))
    wgt = (
        cand.crossJoin(F.broadcast(nq))
        .crossJoin(F.broadcast(den))
        .select(
            "term",
            F.round(
                F.lit(1.0 - alpha) * F.coalesce("inq", F.lit(0.0)) / F.col("nq")
                + F.lit(alpha) * (F.coalesce("num", F.lit(0.0)) / F.col("den")),
                6,
            ).alias("weight"),
        )
    )
    top = wgt.orderBy(F.desc("weight"), F.asc("term")).limit(fb_terms)
    w = Window.orderBy(F.desc("weight"), F.asc("term"))
    return top.withColumn("rnk", F.row_number().over(w).cast("long"))
