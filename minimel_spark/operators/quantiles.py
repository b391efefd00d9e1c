"""Exact distributed order statistics (SURVEY §4 LLM-pipeline family,
round 5): the q-quantile VALUES of a column, exactly, without ever holding
the column in one place.

Why it exists next to `F.expr("percentile(...)")` (used on the 30-row brand
table in the rel_percentile gate) and `percentile_approx`: Spark's exact
``percentile`` aggregate buffers every value in a single aggregation buffer
— O(n) driver/executor memory, a non-starter for a 10^12-row column — and
``percentile_approx`` is approximate, so it can never match a value oracle.
This operator is the scale path for EXACT quantiles: a range-partitioned
sort (Spark's distributed sort — every partition holds a contiguous value
range) plus the same subtotal-collect/broadcast-offset prefix-sum pattern as
`multimodal.byte_pack_buckets`, then a bounded per-partition window to pick
the rows at the target global ranks.

The reference (bennokr/minimEL) has no quantile machinery; this is
Spark-first new work.

Scale design:
- ONE distributed sort (Exchange rangepartitioning + sortWithinPartitions)
  over an 8-byte projection — never a single-partition window.
- per-partition counts: one tiny aggregate (#partitions rows) collected to
  the driver; offsets broadcast back. Identical pattern (and rationale) to
  byte_pack_buckets' distributed prefix sum.
- rank selection: the driver knows from the subtotal pass WHICH partitions
  contain a target rank, so only those <= |qs| partitions' rows (each one
  shuffle-partition-sized, independent of n) enter the row_number window's
  hashpartitioning exchange; every other partition is pruned at the cache
  scan. Only rows AT the target ranks survive the final joins.
- ties are harmless: equal values may straddle partition boundaries and get
  arbitrary relative ranks, but every rank inside a tie run maps to the
  same VALUE, so the (q, rank, value) output is a pure function of the
  multiset.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    qs: list[float],
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact q-quantiles of ``df[value_col]`` (NULLs dropped) for every q in
    ``qs``: returns (q, rank, value) with rank = 1 + floor(q * (n - 1)) —
    the 1-indexed lower order statistic, so q=0 is the minimum and q=1 the
    maximum. Empty input returns an empty frame.

    The result is materialized internally (it is |qs| rows) so the
    range-partitioned sort cache never leaks past the call.
    """
    if not qs:
        raise ValueError("qs must be non-empty")
    for q in qs:
        if not (isinstance(q, (int, float)) and 0.0 <= float(q) <= 1.0):
            raise ValueError(f"every q must be in [0, 1], got {q!r}")
    spark = df.sparkSession
    vals = df.select(F.col(value_col).cast("double").alias("value")).where(
        F.col("value").isNotNull()
    )
    if num_partitions:
        ranged = vals.repartitionByRange(num_partitions, F.col("value"))
    else:
        ranged = vals.repartitionByRange(F.col("value"))
    # persist: the partition-count pass and the selection pass must see the
    # SAME range boundaries (the range partitioner samples its bounds, so an
    # unpersisted plan could legally re-sample between the two jobs)
    ranged = ranged.withColumn("_pid", F.spark_partition_id()).persist()
    try:
        sizes = {
            r["_pid"]: r["cnt"]
            for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
        }
        n = sum(sizes.values())
        out_schema = "q double, rank long, value double"
        if n == 0:
            return spark.createDataFrame([], out_schema)
        offsets, acc = {}, 0
        for pid in sorted(sizes):
            offsets[pid] = acc
            acc += sizes[pid]
        # rank semantics shared verbatim with the SQL oracle:
        # 1 + floor(q * (n-1)) in IEEE double
        targets = sorted({(float(q), 1 + int(math.floor(float(q) * (n - 1)))) for q in qs})
        # only partitions that CONTAIN a target rank participate in the
        # selection — the rank window below needs a hashpartitioning(_pid)
        # exchange (the cached RangePartitioning does not satisfy it), and
        # filtering first bounds that second exchange to <= |qs| partitions'
        # rows (each one shuffle-partition-sized), independent of n. Without
        # the filter the whole dataset would shuffle and sort twice.
        target_pids = set()
        for _, rank in targets:
            for pid in sorted(sizes):
                if offsets[pid] < rank <= offsets[pid] + sizes[pid]:
                    target_pids.add(pid)
                    break
        off_df = F.broadcast(
            spark.createDataFrame(
                [(pid, offsets[pid]) for pid in sorted(target_pids)],
                "_pid int, _off long",
            )
        )
        t_df = F.broadcast(
            spark.createDataFrame(targets, "q double, rank long")
        )
        w = Window.partitionBy("_pid").orderBy(F.asc("value"))
        picked = (
            ranged.where(F.col("_pid").isin([int(p) for p in target_pids]))
            .withColumn("_rn", F.row_number().over(w))
            .join(off_df, "_pid")
            .select("value", (F.col("_off") + F.col("_rn")).alias("rank"))
            .join(t_df, "rank")
            .select("q", "rank", "value")
        )
        rows = picked.collect()
        return spark.createDataFrame(rows, out_schema) if rows else spark.createDataFrame([], out_schema)
    finally:
        ranged.unpersist()
