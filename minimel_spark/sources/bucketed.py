"""Bucketed table layout for shuffle-free co-located joins (SURVEY §7
scale plan; no reference counterpart — minimEL's joins are driver-local
dict lookups, bennokr/minimEL minimel/clean.py:60-85).

THE 100-TB join play: a fact table bucketed by its join key at write time
is already hash-clustered on disk, so every later join or aggregation on
that key reads each bucket as a pre-partitioned input — no Exchange in the
plan, ever again. Writing 100 TB once with ``bucketBy(4096, key)`` amortizes
the one shuffle you would otherwise pay on EVERY downstream join of the two
biggest tables (broadcast only rescues joins where one side is small;
bucket co-location is the only shuffle-free strategy when BOTH sides are
huge). ``sortBy`` within buckets additionally lets SortMergeJoin skip its
per-task sort.

Bucket-count discipline: both sides must agree (Spark joins b and k·b
bucket layouts shuffle-free only for equal counts pre-3.1; keep them
equal), and each bucket should land near the 128-MB scan-split sweet spot:
buckets ≈ table_bytes / 128 MB, rounded to a power of two so a future 2×
re-bucket can reuse half the files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    path: str | None = None,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed parquet table (external at ``path`` when
    given, else in the session warehouse). Idempotent under ``overwrite``."""
    if num_buckets <= 0:
        raise ValueError(f"num_buckets must be > 0, got {num_buckets}")
    if not bucket_cols:
        raise ValueError("bucket_cols must be non-empty")
    w = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def plan_exchanges(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the final executed plan —
    the property bucketing exists to zero out. AQE may not have finalized
    yet, so this counts on the full formatted plan text."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")


def assert_colocated_join(
    spark: SparkSession, left: str, right: str, on: list[str]
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key and FAIL (raise)
    if the physical plan contains any Exchange — the gate-checkable form of
    'this join is shuffle-free'. Broadcast is disabled for the check, since
    a broadcast join would hide a missing co-location until the day the
    small side grows past the threshold."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = spark.table(left).join(spark.table(right), on)
        n = plan_exchanges(out)
        if n:
            raise AssertionError(
                f"bucketed join of {left} ⋈ {right} on {on} still plans "
                f"{n} Exchange(s) — bucket layouts disagree"
            )
        return out
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
