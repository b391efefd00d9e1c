"""Z-order (Morton) data layout for multi-column data skipping (SURVEY §7
scale plan; no reference counterpart — minimEL has no storage layout
layer). Spark-first new work.

THE PROBLEM AT 100 TB: parquet scans prune files/row-groups on min-max
stats, but a table sorted on one column has useless stats on every other
column — a filter on the second dimension reads everything. Interleaving
the bits of rank-bucketed columns into one Morton key and range-
partitioning on it gives every output file a TIGHT min-max range on ALL
interleaved columns at once, so selective filters on any of them skip most
files (the Delta/Iceberg `ZORDER BY` play, built here from Spark
primitives).

Determinism discipline: the per-column bucket boundaries are EXACT
quantiles (operators/quantiles.py — rank = 1 + floor(q·(n−1)), the same
definition the rel_exact_quantiles gate pins against DuckDB), not
percentile_approx, so the bucketing — and therefore the whole layout — is
a pure function of the data at any parallelism, and an oracle can
recompute it bit for bit. The boundary collect is |cols|·(2^bits − 1)
rows — constant, never data-sized.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def interleave_bits(bucket_cols: list[Column], bits: int) -> Column:
    """Morton key of already-bucketed non-negative ints, each in
    [0, 2^bits): bit j of column i lands at position j·n + i (column 0 in
    the LOW lanes). Pure JVM integer expression — 2·bits·n shifts and one
    add chain, all inside whole-stage codegen."""
    n = len(bucket_cols)
    terms = []
    for i, c in enumerate(bucket_cols):
        cl = c.cast("long")
        for j in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(cl, j).bitwiseAND(F.lit(1)), j * n + i)
            )
    return reduce(lambda a, b: a + b, terms)


def rank_bucket(col: Column, boundaries: list[float]) -> Column:
    """Bucket id = number of boundaries <= value (0 .. len(boundaries)).
    Boundaries are a broadcast literal array; the scan is O(len) per row,
    JVM-side."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    return F.size(F.filter(arr, lambda b: b <= col))


def zorder_keys(
    df: DataFrame,
    cols: list[str],
    bits: int = 4,
    key_name: str = "zkey",
) -> tuple[DataFrame, dict[str, list[float]]]:
    """Append bucket columns ``_zb_<col>`` and the Morton ``key_name`` to
    ``df``. Returns (df_with_key, per-column exact boundary lists). The
    2^bits − 1 boundaries per column are exact quantiles of the column —
    one bounded-selection pass each (see operators/quantiles.py)."""
    from .quantiles import exact_quantiles

    if not cols:
        raise ValueError("cols must be non-empty")
    if not (1 <= bits <= 16):
        raise ValueError(f"bits must be in [1, 16], got {bits}")
    nb = (1 << bits) - 1
    qs = [i / (1 << bits) for i in range(1, nb + 1)]
    bounds: dict[str, list[float]] = {}
    for c in cols:
        rows = exact_quantiles(df, c, qs).collect()
        bounds[c] = [r["value"] for r in sorted(rows, key=lambda r: r["q"])]
    out = df
    for c in cols:
        out = out.withColumn(f"_zb_{c}", rank_bucket(F.col(c).cast("double"), bounds[c]))
    out = out.withColumn(
        key_name, interleave_bits([F.col(f"_zb_{c}") for c in cols], bits)
    )
    return out, bounds


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int,
    bits: int = 4,
) -> dict[str, list[float]]:
    """Write ``df`` as ``n_files`` parquet range-partitions of the Morton
    key: contiguous z-ranges per file, so every file carries tight min-max
    stats on ALL of ``cols`` (the data-skipping property the pytest
    measures). Returns the boundary map for audit."""
    keyed, bounds = zorder_keys(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, F.col("zkey"))
        .sortWithinPartitions("zkey")
        .drop("zkey", *[f"_zb_{c}" for c in cols])
        .write.mode("overwrite")
        .parquet(path)
    )
    return bounds
