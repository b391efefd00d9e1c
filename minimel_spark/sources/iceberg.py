"""Iceberg table source/sink plumbing (north rule: pages live in an Iceberg
table; per-stage lineage/metrics commit to Iceberg).

The iceberg-spark-runtime jar is not shipped in this environment (and there
is no package network), so everything here is REAL plumbing behind an
explicit capability check: `has_iceberg` probes the classpath, the
session-conf helper emits the standard catalog configuration, and the
read/write helpers use the DataFrameV2 `writeTo` / time-travel APIs that are
exactly what runs when the jar is present. Where Iceberg is absent the
checkpointing layer (sources/checkpoint.py) provides the same
atomic-committed-stage semantics over parquet directories — same API shape,
documented there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

RUNTIME_HINT = (
    "Iceberg support needs the iceberg-spark-runtime jar on the classpath "
    "(e.g. spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-"
    "3.5_2.12:<version>) plus the catalog conf from iceberg_session_conf()"
)


def iceberg_session_conf(
    catalog: str = "local", warehouse: str = "file:///tmp/iceberg_warehouse"
) -> dict[str, str]:
    """The standard Hadoop-catalog session configuration; pass these to
    SparkSession.builder.config(...) before getOrCreate()."""
    return {
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
    }


def has_iceberg(spark: SparkSession) -> bool:
    """True when the Iceberg runtime classes are loadable in this JVM."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def write_iceberg(df: DataFrame, table: str, mode: str = "createOrReplace") -> None:
    """Commit a DataFrame to an Iceberg table (atomic snapshot commit — the
    production form of the checkpointer's temp-dir + rename protocol)."""
    if not has_iceberg(df.sparkSession):
        raise RuntimeError(f"cannot write {table!r}: {RUNTIME_HINT}")
    writer = df.writeTo(table)
    if mode == "createOrReplace":
        writer.createOrReplace()
    elif mode == "append":
        writer.append()
    elif mode == "overwritePartitions":
        writer.overwritePartitions()
    else:
        raise ValueError(f"unknown mode {mode!r}")


def read_iceberg(
    spark: SparkSession,
    table: str,
    snapshot_id: int | None = None,
    as_of_timestamp: int | None = None,
) -> DataFrame:
    """Read an Iceberg table, optionally time-traveling to a snapshot — the
    resume-from-checkpoint read path at production scale."""
    if not has_iceberg(spark):
        raise RuntimeError(f"cannot read {table!r}: {RUNTIME_HINT}")
    reader = spark.read
    if snapshot_id is not None:
        reader = reader.option("snapshot-id", snapshot_id)
    if as_of_timestamp is not None:
        reader = reader.option("as-of-timestamp", as_of_timestamp)
    return reader.table(table)
