"""Shared operator plumbing: the input-parallelism guard and the repo's
canonical 60-bit md5 key (one definition — five call sites previously
hand-rolled the same expression, a silent-divergence hazard for the
cross-engine oracles).

The dedup / embedding / fingerprint operators do their heaviest work
(shingling, per-token hashing, signature folds, per-batch matmuls) in the map
stage directly over the input scan, so their parallelism equals the SCAN's
split count. A small parquet file arrives as a single split, and a 32-core
session then runs the entire map stage on one core — the classic
small-input / big-compute pathology (measured: ``minhash_dups`` at sf0.1 is
3.2× faster once the 5k-doc single-split input is spread across the cores).

At production scale the input has far more splits than the cluster has slots
(100 TB / 128 MiB ≈ 800k splits), so the guard below is an identity — it only
inserts an exchange when the scan is narrower than the session, where the
extra shuffle is cheap by construction (the input is small).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def words_lower(col: Column) -> Column:
    r"""The repo-wide word segmentation contract (and the DuckDB oracles'):
    lowercase, split on \W+, empties dropped. One definition — corpus,
    retrieval, and the winnowing path all build on it, so the segmentation
    can never silently drift between operators or engines."""
    return F.filter(F.split(F.lower(col), r"\W+"), lambda w: w != "")


def md5_long60(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative BIGINT — the deterministic,
    parallelism-invariant key/rank this repo standardizes on, because DuckDB
    recomputes it bit-for-bit as ``('0x' || substr(md5(x), 1, 15))::UBIGINT``
    (same family as the md5 minhash signatures). 60 bits keeps the value
    positive in a signed 64-bit column with ~n²/2⁶¹ collision odds."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def ensure_min_parallelism(df: DataFrame, *key_cols: str) -> DataFrame:
    """Hash-repartition ``df`` across the session's cores when the plan gives
    fewer partitions than the session has slots; identity otherwise.

    Keyed by ``key_cols`` (hash partitioning) rather than round-robin:
    round-robin repartition inserts a local sort on every row to stay
    deterministic under task retries (wide text rows make that sort a new
    bottleneck), while hash placement depends only on row content — outputs
    stay parallelism-invariant and nothing is sorted.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *key_cols)
