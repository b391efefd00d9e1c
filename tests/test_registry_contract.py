"""Driver-contract meta-tests over the __spark_entry__ registry: the shape
invariants the correctness gate relies on, checked without running Spark —
so a broken oracle or a query/oracle drift fails in seconds in pytest
instead of mid-sweep."""

import os

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def test_every_query_has_a_value_oracle():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    # r5 closed the last rows-only gates: the two key sets must be EQUAL —
    # a new query without an oracle (or a stale oracle for a removed query)
    # is a registry bug, not a soft degradation
    assert set(oracles) == set(qs), (
        sorted(set(qs) - set(oracles)),
        sorted(set(oracles) - set(qs)),
    )
    assert all(callable(fn) for fn in qs.values())


def test_window_shape_and_uniqueness():
    names = entry._WINDOW + entry._TAIL
    assert len(entry._WINDOW) == 50          # driver sampling cap
    assert len(names) == len(set(names))     # no duplicate registrations
    assert set(names) == set(entry.queries())


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata absent")
def test_every_oracle_parses_and_binds_in_duckdb():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    bad = []
    for name, sql in entry.oracle_sql().items():
        try:
            con.sql(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001 — collecting all failures
            bad.append((name, str(e).splitlines()[0]))
    assert not bad, bad
