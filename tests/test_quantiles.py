"""exact_quantiles: numpy/sorted-list parity, rank semantics at the
endpoints, NULL handling, tie robustness, parallelism invariance, and the
no-cache-leak guarantee."""

import hashlib
import math

import pytest

from minimel_spark.operators.quantiles import exact_quantiles

from conftest import pinned_rdd_ids

QS = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]


def _want(values, qs):
    s = sorted(values)
    n = len(s)
    return {float(q): (1 + int(math.floor(float(q) * (n - 1))), s[int(math.floor(float(q) * (n - 1)))]) for q in qs}


def _got(df_out):
    return {r["q"]: (r["rank"], r["value"]) for r in df_out.collect()}


def test_exact_quantiles_matches_sorted_list(spark):
    vals = [
        (int(hashlib.md5(f"q{i}".encode()).hexdigest()[:8], 16) % 10_000) / 7.0
        for i in range(5_000)
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = _got(exact_quantiles(df, "x", QS))
    assert got == _want(vals, QS)


def test_exact_quantiles_endpoints_nulls_ties(spark):
    vals = [5.0] * 100 + [1.0, 9.0] + [5.0] * 50
    rows = [(v,) for v in vals] + [(None,), (None,)]
    df = spark.createDataFrame(rows, "x double")
    got = _got(exact_quantiles(df, "x", [0.0, 0.5, 1.0]))
    assert got[0.0] == (1, 1.0)
    assert got[0.5] == (1 + (len(vals) - 1) // 2, 5.0)
    assert got[1.0] == (len(vals), 9.0)


def test_exact_quantiles_parallelism_invariant_and_no_leak(spark):
    vals = [float((i * 37) % 501) for i in range(3_000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    ids_before = pinned_rdd_ids(spark)
    a = _got(exact_quantiles(df, "x", QS, num_partitions=3))
    b = _got(exact_quantiles(df.repartition(41), "x", QS, num_partitions=17))
    assert a == b == _want(vals, QS)
    assert pinned_rdd_ids(spark) - ids_before == set()


def test_exact_quantiles_empty_and_validation(spark):
    df = spark.createDataFrame([(None,)], "x double")
    assert exact_quantiles(df, "x", [0.5]).count() == 0
    with pytest.raises(ValueError):
        exact_quantiles(df, "x", [])
    with pytest.raises(ValueError):
        exact_quantiles(df, "x", [1.5])
