"""Physical-plan inspection helpers.

The engine's performance contract is encoded as plan assertions, not hopes:
column pruning reaches the parquet scan, Python UDFs are evaluated once, small
dimensions broadcast. Tests use these to fail loudly when a refactor degrades
the plan (e.g. Catalyst duplicating an ArrowEvalPython node into a pushed
filter — the regression fixed in operators/count.py).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The executed (post-AQE-planning) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def count_plan_nodes(df: DataFrame, node_name: str) -> int:
    """How many times a physical operator appears (e.g. 'ArrowEvalPython',
    'BroadcastHashJoin', 'Exchange', 'CartesianProduct')."""
    return physical_plan(df).count(node_name)


def scan_read_schemas(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each FileScan (parquet pruning result)."""
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", physical_plan(df)):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def assert_scan_columns(df: DataFrame, allowed: set[str]) -> None:
    """Fail if any file scan reads a column outside ``allowed`` — i.e. column
    pruning did not reach the source."""
    for cols in scan_read_schemas(df):
        extra = set(cols) - allowed
        assert not extra, f"scan reads unpruned columns {extra} (allowed {allowed})"
