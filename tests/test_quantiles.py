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


def test_column_value_overlap_hand_example(spark):
    from minimel_spark.operators.profile import column_value_overlap

    left = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "b"), (3, None)], "k long, s string"
    )
    right = spark.createDataFrame(
        [(2, "b"), (3, "z"), (4, "b")], "k long, t string"
    )
    rows = {
        (r["col_left"], r["col_right"]): r
        for r in column_value_overlap(left, right).collect()
    }
    assert len(rows) == 4  # full 2x2 matrix, zero-overlap rows included
    kk = rows[("k", "k")]
    # {1,2,3} vs {2,3,4}: common {2,3}
    assert (kk["n_left"], kk["n_right"], kk["n_common"]) == (3, 3, 2)
    assert abs(kk["jaccard"] - 0.5) < 1e-12
    st = rows[("s", "t")]
    # {a,b} vs {b,z}: common {b}; NULL excluded on the left
    assert (st["n_left"], st["n_right"], st["n_common"]) == (2, 2, 1)
    assert abs(st["contain_left"] - 0.5) < 1e-12
    # cross-typed pair k vs t: string-cast values don't collide
    assert rows[("k", "t")]["n_common"] == 0
    assert rows[("k", "t")]["jaccard"] == 0.0


def test_column_value_overlap_guard(spark):
    import pytest as _pytest

    from minimel_spark.operators.profile import column_value_overlap

    df = spark.createDataFrame([(1,)], "k long")
    with _pytest.raises(ValueError):
        column_value_overlap(df, df, left_cols=[])
