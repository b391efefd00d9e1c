"""Multinomial Naive Bayes text classification as pure aggregations — the
classic fast document classifier (language/domain/quality routing in
crawl-curation pipelines) trained and applied entirely with groupBy/join,
no ML library, no driver-side model object. Sits next to `lm.py` (n-gram
LM scoring) and `scoring.py` (the gradient-trained LR matcher) as the
third from-scratch model family: closed-form counts, so both training and
inference are DuckDB-replayable bit-for-bit modulo the repo's round-6
summation-order contract (see lm.py's note). The reference (minimEL) has
no document classifier; this is Spark-first new work.

Model: P(label | doc) ∝ P(label) · Π_tok P(tok | label)^tf with add-alpha
smoothing, i.e. in log space

    score(d, y) = ln(n_docs_y / n_docs)
                + Σ_tok tf(tok, d) · ln((c(tok, y) + α) / (N_y + α·V))

where c(tok, y) = count of tok in label-y training docs, N_y = total label-y
tokens, V = training vocabulary size. A token unseen with label y (but in
vocabulary) falls back to the smoothed default ln(α / (N_y + α·V)); tokens
outside the training vocabulary entirely use the same default (the standard
"smooth everything" convention — deterministic, no special casing).

Scale design:
- training is two count aggregations (per-(label, token), per-label) plus a
  1-row vocabulary count — all shuffles move the 60-bit md5 of the token
  (`util.md5_long60`), never token strings;
- the per-label stats table (prior, denominator, default) has one row per
  CLASS — broadcast by construction;
- inference is one explode + tf groupBy over the test side, a broadcast
  cross join with the label stats, one keyed left join against the
  likelihood table (vocabulary×classes-sized — left to AQE to broadcast
  when it fits), one per-(doc, label) sum, and a min-struct argmax; no
  windows, no sorts, no driver state.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .util import ensure_min_parallelism, md5_long60, words_lower


def nb_classify(
    train: DataFrame,
    test: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    persisted_out: list | None = None,
) -> DataFrame:
    """Train multinomial NB on ``train`` (``label_col``, ``text_col``) and
    score every ``test`` row, returning one row per test document:

        (id_col, pred, score)

    — ``pred`` the argmax label (ties broken by smallest label,
    deterministically), ``score`` its log-posterior up to the shared
    evidence constant. Documents with no tokens score on priors alone.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    tr = train.select(
        F.col(label_col).alias("_y"),
        F.explode(words_lower(F.col(text_col))).alias("_tok"),
    ).withColumn("_k", md5_long60(F.col("_tok")))
    if persisted_out is not None:
        tr = tr.persist()
        persisted_out.append(tr)
    ctk = tr.groupBy("_y", "_k").agg(F.count(F.lit(1)).alias("_c"))
    ntok = tr.groupBy("_y").agg(F.count(F.lit(1)).alias("_n"))
    vocab = tr.agg(F.countDistinct("_k").alias("_v"))
    docs_per = train.groupBy(F.col(label_col).alias("_y")).agg(
        F.count(F.lit(1)).alias("_nd")
    )
    n_docs = train.agg(F.count(F.lit(1)).alias("_ndall"))
    label_stats = (
        docs_per.join(ntok, "_y", "left")
        .na.fill({"_n": 0})
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "_y",
            F.log(F.col("_nd") / F.col("_ndall")).alias("_prior"),
            F.log(F.lit(alpha) / (F.col("_n") + alpha * F.col("_v"))).alias(
                "_default"
            ),
            (F.col("_n") + alpha * F.col("_v")).alias("_denom"),
        )
    )
    ll = ctk.join(
        label_stats.select("_y", "_denom"), "_y"
    ).select(
        "_y", "_k", F.log((F.col("_c") + alpha) / F.col("_denom")).alias("_ll")
    )
    te = (
        ensure_min_parallelism(test, id_col)
        .select(
            F.col(id_col).alias("_id"),
            F.explode(words_lower(F.col(text_col))).alias("_tok"),
        )
        .withColumn("_k", md5_long60(F.col("_tok")))
        .groupBy("_id", "_k")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    per_label = (
        te.crossJoin(F.broadcast(label_stats.select("_y", "_default")))
        .join(ll, ["_y", "_k"], "left")
        .groupBy("_id", "_y")
        .agg(
            F.sum(
                F.col("_tf") * F.coalesce(F.col("_ll"), F.col("_default"))
            ).alias("_s")
        )
    )
    scored = (
        test.select(F.col(id_col).alias("_id"))
        .crossJoin(F.broadcast(label_stats.select("_y", "_prior")))
        .join(per_label, ["_id", "_y"], "left")
        .select(
            "_id",
            "_y",
            (F.col("_prior") + F.coalesce("_s", F.lit(0.0))).alias("_score"),
        )
    )
    return scored.groupBy("_id").agg(
        F.min(F.struct((-F.col("_score")).alias("_ns"), F.col("_y")))["_y"].alias(
            "pred"
        ),
        F.max("_score").alias("score"),
    ).select(F.col("_id").alias(id_col), "pred", "score")
