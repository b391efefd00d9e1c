"""Sources & sinks: synthetic fixture generators, parquet table IO, and the
checkpoint/resume + lineage/metrics layer."""
