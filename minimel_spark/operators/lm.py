"""Bigram language-model quality scoring (the CCNet-style perplexity filter).

Web-scale pretraining pipelines (CCNet, RefinedWeb, Dolma) bucket crawl text
by language-model perplexity: a smoothed n-gram LM is trained on a trusted
corpus and every candidate document is scored by its per-token cross-entropy —
low-perplexity text is "clean", the high tail is boilerplate/noise. The
reference (minimEL) stops at entity linking and has no counterpart; this sits
next to `text.quality_scores` (surface heuristics) as the model-based quality
signal the north rule's Common-Crawl input shape implies.

Everything is built-in Spark expressions (JVM, whole-stage codegen) and fully
deterministic, so a DuckDB oracle can recompute the trained counts AND every
document score bit-for-bit (summation-order noise is below the repo's
round-6 contract). The model here is an add-alpha-smoothed word bigram LM —
deliberately closed-form (no iterative EM / backoff estimation), because the
published pipelines' filtering behavior comes from the *ranking* the LM
induces, which a smoothed bigram model already yields deterministically.

Scale: two count aggregations over the train side (unigram, bigram), then
one explode + two keyed joins + one per-doc aggregation over the scored side.
All join/group exchanges move 8-byte md5-60 keys (`util.md5_long60`), never
n-gram strings. The unigram/bigram count tables are vocabulary-sized —
orders of magnitude smaller than a 100-TB corpus — and are left to AQE to
broadcast when they fit; nothing is collected on the driver. The vocabulary
size (one row) attaches via a broadcast cross join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .corpus import _word_ngrams
from .util import ensure_min_parallelism, md5_long60, words_lower


def lm_perplexity(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    train: DataFrame | None = None,
    persisted_out: list | None = None,
) -> DataFrame:
    """Score every document by add-alpha bigram cross-entropy / perplexity.

    Model (trained on ``train``, defaulting to ``docs`` itself — the
    self-scoring mode ranks documents by in-corpus typicality, the CCNet
    bucketing shape):

        P(w2 | w1) = (C(w1 w2) + alpha) / (C(w1) + alpha * V)

    with C(.) the train counts under the repo-wide word segmentation
    (`util.words_lower`) and V the train vocabulary size. Per document:

        cross_entropy = -mean(ln P(w2|w1)) over its bigrams
        perplexity    = exp(cross_entropy)

    Returns (id_col, n_bigrams, cross_entropy, perplexity); documents with
    fewer than two words keep a row with n_bigrams=0 and NULL scores.
    Unseen bigrams/contexts degrade smoothly via the smoothing (C=0).

    The tokenized corpus feeds up to four plan branches (unigram counts,
    bigram counts, the scored explode, and the vocabulary-size aggregate);
    pass ``persisted_out`` (a list the caller unpersists) to tokenize and
    scan once instead of per branch.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    docs = ensure_min_parallelism(docs, id_col)

    toks = docs.select(F.col(id_col), words_lower(F.col(text_col)).alias("_ws"))
    if persisted_out is not None:
        toks = toks.persist()
        persisted_out.append(toks)
    if train is None:
        t_toks = toks.select("_ws")
    else:
        t_toks = train.select(words_lower(F.col(text_col)).alias("_ws"))

    t_words = t_toks.select(F.explode("_ws").alias("w"))
    # Unigram counts keyed by md5-60 of the word (8-byte exchange).
    uni = t_words.groupBy(md5_long60(F.col("w")).alias("gk1")).agg(
        F.count("*").alias("c1")
    )
    if persisted_out is not None:
        # the unigram table feeds both the context join and the vocab-size
        # aggregate; persist so the train side is aggregated once
        uni = uni.persist()
        persisted_out.append(uni)
    vocab = uni.agg(F.count("*").cast("double").alias("v"))

    bi = (
        t_toks.select(F.explode(_word_ngrams(F.col("_ws"), 2)).alias("ng"))
        .groupBy(md5_long60(F.col("ng")).alias("gk2"))
        .agg(F.count("*").alias("c2"))
    )

    scored = toks.select(
        F.col(id_col),
        F.explode_outer(_word_ngrams(F.col("_ws"), 2)).alias("ng"),
    ).select(
        id_col,
        "ng",
        md5_long60(F.col("ng")).alias("gk2"),
        # words contain no whitespace by construction (split on \W+), so the
        # bigram's context word is exactly the prefix before the space
        md5_long60(F.split(F.col("ng"), " ").getItem(0)).alias("gk1"),
    )
    logp = F.when(
        F.col("ng").isNotNull(),
        F.log(
            (F.coalesce("c2", F.lit(0)) + F.lit(float(alpha)))
            / (F.coalesce("c1", F.lit(0)) + F.lit(float(alpha)) * F.col("v"))
        ),
    )
    return (
        scored.join(bi, "gk2", "left")
        .join(uni, "gk1", "left")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count("ng").alias("n_bigrams"),
            (-F.avg(logp)).alias("cross_entropy"),
        )
        .withColumn("perplexity", F.exp("cross_entropy"))
    )
