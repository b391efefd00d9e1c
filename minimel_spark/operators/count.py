"""Anchor-statistics stage: paragraph_links -> anchor_counts (SURVEY §2 A1-A3,
P2, P10, X5).

Reference: minimel/count.py:15-98. The reference hand-codes a per-partition
Counter partial aggregation then a dask groupby-sum with ``split_out=32``; in
Spark the single declarative ``groupBy('anchor','qid').count()`` compiles to
partial+final hash aggregation automatically (map-side combine before the
shuffle), and AQE picks the post-shuffle partition count — do NOT hand-schedule.

Fold selection (X5): the reference skips rows by *positional* index per partition
(``i % split == fold``, count.py:20-21) which is partition-layout dependent; we
use a deterministic content hash ``pmod(xxhash64(url, par_id), split)`` so folds
are invariant to parallelism (required for the N vs 4N equivalence check).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.udfs import normalize_lang_udf


def fold_filter(df: DataFrame, keys, split: int | None, fold: int | None, keep: bool = False) -> DataFrame:
    """Deterministic k-fold selector: drop (or keep, for eval) the given fold."""
    if not split:
        return df
    assert fold is not None and split > fold
    bucket = F.pmod(F.xxhash64(*keys), F.lit(split))
    return df.where(bucket == fold if keep else bucket != fold)


def explode_anchors(paragraph_links: DataFrame, language: str | None = None) -> DataFrame:
    """(url, par_id, links, text) -> (url, par_id, anchor, qid) with normalized
    anchors; dropped anchors (normalize -> null) are filtered out.

    The UDF is marked nondeterministic ONLY to stop Catalyst pushing the
    isNotNull filter into a second ArrowEvalPython node (it duplicated the
    normalize call per row); the function itself is pure, so task re-execution
    is safe. One UDF evaluation per anchor, verified via .explain.
    """
    norm = normalize_lang_udf(language).asNondeterministic()
    return (
        paragraph_links.select(
            "url", "par_id", F.explode("links").alias("anchor_raw", "qid")
        )
        .withColumn("anchor", norm("anchor_raw"))
        .where(F.col("anchor").isNotNull())
        .drop("anchor_raw")
    )


def anchor_counts(
    paragraph_links: DataFrame,
    language: str | None = None,
    min_count: int = 2,
    split: int | None = None,
    fold: int | None = None,
) -> DataFrame:
    """-> (anchor, qid, cnt) with cnt >= min_count (A1 + P10).

    One shuffle total (the groupBy); normalization and explode are map-side.
    """
    df = fold_filter(paragraph_links, ["url", "par_id"], split, fold)
    return (
        explode_anchors(df, language)
        .groupBy("anchor", "qid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= min_count)
    )


def counts_to_map(counts: DataFrame) -> DataFrame:
    """A3 rollup (minimel/count.py:84-87): (anchor, qid, cnt) ->
    (anchor, map{'Q<qid>': cnt}) — export form only; keep long form in the
    pipeline."""
    return counts.groupBy("anchor").agg(
        F.map_from_entries(
            F.array_sort(
                F.collect_list(
                    F.struct(F.concat(F.lit("Q"), F.col("qid")).alias("k"), F.col("cnt").alias("v"))
                )
            )
        ).alias("qid_counts")
    )
