"""Bucketed co-located joins: Exchange-free plan pin, value parity with a
plain join, and the mismatch detector actually firing."""

import pytest

from minimel_spark.sources.bucketed import (
    assert_colocated_join,
    plan_exchanges,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bkt")
    left = spark.createDataFrame(
        [(i % 50, i, float(i)) for i in range(500)], "k long, id long, v double"
    )
    right = spark.createDataFrame(
        [(i, f"n{i}") for i in range(50)], "k long, name string"
    )
    write_bucketed(left, "t_bkt_left", ["k"], 4, path=str(base / "l"),
                   sort_cols=["k"])
    write_bucketed(right, "t_bkt_right", ["k"], 4, path=str(base / "r"),
                   sort_cols=["k"])
    write_bucketed(right, "t_bkt_right8", ["k"], 8, path=str(base / "r8"))
    yield left, right
    for t in ("t_bkt_left", "t_bkt_right", "t_bkt_right8"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_colocated_join_no_exchange_and_values(spark, bucketed_pair):
    left, right = bucketed_pair
    out = assert_colocated_join(spark, "t_bkt_left", "t_bkt_right", ["k"])
    assert plan_exchanges(out) == 0
    got = sorted((r["id"], r["name"]) for r in out.collect())
    want = sorted((r["id"], r["name"]) for r in left.join(right, "k").collect())
    assert got == want and len(got) == 500


def test_mismatched_buckets_detected(spark, bucketed_pair):
    with pytest.raises(AssertionError, match="Exchange"):
        assert_colocated_join(spark, "t_bkt_left", "t_bkt_right8", ["k"])
    # and the broadcast threshold is restored after the failed check
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1"


def test_write_bucketed_validation(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        write_bucketed(df, "t_x", [], 4)
    with pytest.raises(ValueError):
        write_bucketed(df, "t_x", ["k"], 0)
