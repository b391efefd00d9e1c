"""Pure row-level functions (the bodies that go inside pandas/Arrow UDFs).

Everything in this package is plain Python/numpy over builtin types — no Spark
imports — so the same code is unit-testable without a SparkSession and runs
identically inside executors.
"""
