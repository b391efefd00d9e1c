"""Column-level data profiling (a deequ-lite): one row of exact statistics
per profiled column — the intake step a 100-TB curation pipeline runs
before trusting a new table (schema drift, null explosions, cardinality
collapse, truncated strings all show up here first).

Stats per column: row count, null count, exact distinct count, min/max
(as strings, so one output schema covers every column type), and average
string length (NULL for non-string columns).

Scale design: ALL columns profile in ONE pass over the data — the n /
nulls / min / max / avg_len aggregates for every column are computed in a
single groupBy-less aggregation (map-side combinable, one job, no
shuffle), not per-column scans. Exact distinct counts are per-column
count_distinct expressions in that same aggregation; Spark expands
multiple DISTINCT aggregates with one `expand` + shuffle, so the whole
profile is one pass + one bounded exchange. (At extreme column counts,
profile in column groups or swap `approx_count_distinct` — exact is the
default because the oracle pins exactness.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def profile_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df``. Returns one row per
    column: (column, n_rows, n_null, n_distinct, min_value, max_value,
    avg_len) ordered by column name. min/max/avg ignore NULLs; n_distinct
    counts distinct non-null values; avg_len is NULL for non-strings."""
    cols = sorted(columns if columns is not None else df.columns)
    if not cols:
        raise ValueError("no columns to profile")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in df: {missing}")
    str_cols = {f.name for f in df.schema.fields if f.dataType.simpleString() == "string"}
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}"),
            F.count_distinct(F.col(c)).alias(f"_dist_{c}"),
            # min/max on the NATIVE type, cast after — casting first would
            # silently turn numeric extrema lexicographic
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
            (
                F.avg(F.length(F.col(c))) if c in str_cols else F.lit(None).cast("double")
            ).alias(f"_len_{c}"),
        ]
    one = df.agg(*aggs)
    # pivot the single stats row into one row per column with a literal
    # explode — |cols| structs built from the one aggregated row, no
    # second scan
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_null_{c}").alias("n_null"),
                F.col(f"_dist_{c}").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_value"),
                F.col(f"_max_{c}").alias("max_value"),
                F.col(f"_len_{c}").alias("avg_len"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(per_col).alias("s")).select("s.*")
