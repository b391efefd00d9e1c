"""Checkpoint/resume + per-partition lineage/metrics (SURVEY §2 X3/X4; north
rule: "resumable with per-partition lineage/metrics").

Reference: minimel/experiment.py:172-240 + prepare.py:45-75 — every stage checks
its output file before computing; resume = rerun the harness. Here each stage
lands a parquet table under ``<base>/<stage>/``; Spark's parquet committer gives
the atomic ``_SUCCESS`` marker, so a stage is either fully committed or rerun —
a crash mid-write never yields a half-read checkpoint. (On a real deployment the
same API targets Iceberg tables — ``writeTo(...).createOrReplace()`` — with
snapshot ids in place of _SUCCESS files; parquet keeps the sandbox dependency-
free.)

Per-stage metrics land in ``<base>/_metrics/`` as one parquet row per
(stage, partition_id): rows per partition (the lineage of which partition
contributed what) plus stage wall time and total rows. ``spark_partition_id()``
is evaluated inside the same job that writes the checkpoint, so the metrics
describe the exact committed layout.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


class Checkpointer:
    def __init__(self, spark: SparkSession, base_dir: str, enabled: bool = True):
        self.spark = spark
        self.base = base_dir
        self.enabled = enabled
        os.makedirs(base_dir, exist_ok=True)

    def _path(self, stage: str) -> str:
        return os.path.join(self.base, stage)

    def has(self, stage: str) -> bool:
        return os.path.exists(os.path.join(self._path(stage), "_SUCCESS"))

    def stage(self, name: str, build: Callable[[], DataFrame]) -> DataFrame:
        """Return the committed table for ``name``; build+commit it if absent.

        X3 skip-if-exists semantics: an already-committed stage is read back,
        never recomputed — the resume contract.
        """
        if not self.enabled:
            return build()
        path = self._path(name)
        if self.has(name):
            return self.spark.read.parquet(path)
        t0 = time.time()
        df = build()
        df.write.mode("overwrite").parquet(path)
        wall = time.time() - t0
        out = self.spark.read.parquet(path)
        self._write_metrics(name, out, wall)
        return out

    def _write_metrics(self, stage: str, df: DataFrame, wall_secs: float) -> None:
        """X4: one row per (stage, partition) with row counts, plus the stage
        total and wall time."""
        per_part = (
            df.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("rows"))
            .withColumn("stage", F.lit(stage))
            .withColumn("wall_secs", F.lit(float(wall_secs)))
            .withColumn("committed_at", F.current_timestamp())
        )
        per_part.write.mode("append").parquet(os.path.join(self.base, "_metrics"))

    def metrics(self) -> DataFrame | None:
        p = os.path.join(self.base, "_metrics")
        if not os.path.exists(p):
            return None
        return self.spark.read.parquet(p)

    def write_manifest(self, params: dict) -> None:
        """X2 analogue: machine-readable run parameters instead of the
        reference's params-in-dirname encoding (experiment.py:47-69)."""
        with open(os.path.join(self.base, "manifest.json"), "w") as f:
            json.dump(params, f, indent=2, sort_keys=True, default=str)


def logical_lineage(
    df: DataFrame,
    key_cols: list[str],
    n_buckets: int = 64,
) -> DataFrame:
    """Parallelism-INVARIANT lineage digest: rows are assigned to
    ``n_buckets`` deterministic LOGICAL buckets by an md5-derived key
    hash, and each bucket reports its row count and an order-insensitive
    XOR checksum of per-row key digests. Where ``Checkpointer``'s
    metrics describe the PHYSICAL committed layout (spark_partition_id —
    true for one run, meaningless across cluster sizes), this digest is
    a pure function of the DATA: two runs of the same stage — different
    executor counts, different AQE decisions, resumed from different
    checkpoints — must produce byte-identical digests, which is exactly
    the cheap equality witness the north rule's resume semantics need
    ("did the rerun produce the same stage output?") without comparing
    full tables.

    XOR is commutative/associative, so the checksum needs no ordering
    and combines map-side; the whole digest is one groupBy over
    ``n_buckets`` groups. The md5-60 digest (util.md5_long60's trick)
    keeps every value non-negative in a signed long and bit-for-bit
    reproducible in ANSI SQL.

    Output: ``(bucket, n_rows, xor_digest)`` — n_buckets rows (empty
    buckets absent; a missing bucket row IS part of the digest).
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])
    digest = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    return (
        df.select(
            F.pmod(digest, F.lit(n_buckets)).cast("long").alias("bucket"),
            digest.alias("_d"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.bit_xor("_d").cast("long").alias("xor_digest"),
        )
    )
