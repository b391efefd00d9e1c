"""minimel_spark — a from-scratch PySpark-native record-linkage / entity-resolution
engine with the query and data-processing capabilities of bennokr/minimEL.

Architecture (Spark-first, NOT a port):

- All row-level logic lives in vectorized pandas/Arrow UDFs (scalar, iterator, or
  ``applyInPandas``) — never row-at-a-time ``udf()``.
- All relational logic (joins, aggregations, windows, set ops) is plain DataFrame API
  so Catalyst plans partial aggregation, broadcast joins, predicate pushdown and AQE
  skew handling automatically.
- The pipeline is a DAG of ``DataFrame -> DataFrame`` stage functions, each of which
  can be checkpointed to parquet with per-partition lineage + metrics
  (``minimel_spark.sources.checkpoint``), so a run resumes from the last committed
  stage.

Reference capability map: see SURVEY.md §2 in the repo root; each operator module
cites the reference file:line it covers.
"""

__version__ = "0.1.0"
