"""asof_join / range_join / scd2_build: brute-force Python parity on
randomized inputs, tie/tolerance/duplicate semantics, bucket-width
invariance, span-guard validation, composition (scd2 + asof round-trip)."""

import datetime as dt
import random

import pytest

from minimel_spark.operators.temporal import asof_join, range_join, scd2_build


def _ts(s):
    return dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s)


def test_asof_backward_inclusive_and_nulls(spark):
    facts = spark.createDataFrame(
        [(1, 1, _ts(5)), (2, 1, _ts(10)), (3, 1, _ts(2)), (4, 2, _ts(50))],
        "fid long, k long, ts timestamp",
    )
    snaps = spark.createDataFrame(
        [(1, _ts(5), 100.0), (1, _ts(9), 200.0), (2, _ts(60), 9.0)],
        "k long, ts timestamp, v double",
    )
    out = {
        r["fid"]: (r["asof_ts"], r["asof_v"])
        for r in asof_join(facts, snaps, ["k"], ["v"]).collect()
    }
    assert out[1] == (_ts(5), 100.0)       # equal ts matches (inclusive)
    assert out[2] == (_ts(9), 200.0)       # latest <=, not just any
    assert out[3] == (None, None)          # nothing at or before
    assert out[4] == (None, None)          # snapshot only in the future


def test_asof_tolerance_and_same_instant_dedupe(spark):
    facts = spark.createDataFrame(
        [(1, 1, _ts(100))], "fid long, k long, ts timestamp"
    )
    snaps = spark.createDataFrame(
        [(1, _ts(10), 1.0), (1, _ts(10), 7.0)],
        "k long, ts timestamp, v double",
    )
    # duplicate same-instant snapshots collapse to the lexicographic max
    row = asof_join(facts, snaps, ["k"], ["v"]).collect()[0]
    assert row["asof_v"] == 7.0
    # a 90-second-old match dies under a 60-second tolerance
    row = asof_join(
        facts, snaps, ["k"], ["v"], tolerance_seconds=60
    ).collect()[0]
    assert row["asof_v"] is None and row["asof_ts"] is None


def test_asof_randomized_vs_bruteforce(spark):
    rng = random.Random(11)
    snaps = [
        (k, _ts(rng.randrange(1000)), float(i))
        for i, k in enumerate(rng.choices(range(5), k=60))
    ]
    facts = [
        (i, k, _ts(rng.randrange(1000)))
        for i, k in enumerate(rng.choices(range(6), k=80))
    ]
    sdf = spark.createDataFrame(snaps, "k long, ts timestamp, v double")
    fdf = spark.createDataFrame(facts, "fid long, k long, ts timestamp")
    got = {
        r["fid"]: r["asof_v"]
        for r in asof_join(fdf, sdf, ["k"], ["v"]).collect()
    }
    for fid, k, ts in facts:
        elig = [(sts, v) for sk, sts, v in snaps if sk == k and sts <= ts]
        want = max(elig)[1] if elig else None
        assert got[fid] == want, fid


def test_asof_validation(spark):
    df = spark.createDataFrame([(1, _ts(0), 1.0)], "k long, ts timestamp, v double")
    with pytest.raises(ValueError, match="on must"):
        asof_join(df, df, [], ["v"])
    with pytest.raises(ValueError, match="tolerance"):
        asof_join(df, df, ["k"], ["v"], tolerance_seconds=0)
    with pytest.raises(ValueError, match="already exists"):
        asof_join(df.withColumnRenamed("v", "asof_v"), df, ["k"], ["v"])


def _brute_range(points, intervals):
    return sorted(
        (pid, iid)
        for pid, p in points
        for iid, s, e in intervals
        if s <= p <= e
    )


def test_range_join_vs_bruteforce_and_width_invariance(spark):
    rng = random.Random(7)
    points = [(i, float(rng.randrange(0, 500))) for i in range(120)]
    intervals = []
    for i in range(40):
        s = float(rng.randrange(0, 480))
        intervals.append((i, s, s + rng.randrange(0, 60)))
    pdf = spark.createDataFrame(points, "pid long, p double")
    idf = spark.createDataFrame(intervals, "iid long, s double, e double")
    want = _brute_range(points, intervals)
    for width in (7.0, 64.0, 1000.0):
        got = sorted(
            (r["pid"], r["iid"])
            for r in range_join(
                pdf, idf, "p", "s", "e", bucket_seconds=width
            ).collect()
        )
        assert got == want, width


def test_range_join_keys_boundaries_and_guard(spark):
    pdf = spark.createDataFrame(
        [(1, 1, 10.0), (2, 2, 10.0), (3, 1, 20.0001)],
        "pid long, k long, p double",
    )
    idf = spark.createDataFrame(
        [(7, 1, 10.0, 20.0)], "iid long, k long, s double, e double"
    )
    got = sorted(
        r["pid"]
        for r in range_join(
            pdf, idf, "p", "s", "e", on=["k"], bucket_seconds=5.0
        ).collect()
    )
    assert got == [1]  # key 2 filtered, 20.0001 outside the closed range
    # span guard fires lazily at execution
    with pytest.raises(Exception, match="max_span_seconds"):
        range_join(
            pdf, idf, "p", "s", "e", on=["k"], bucket_seconds=0.001,
            max_span_seconds=1.0,
        ).collect()
    with pytest.raises(ValueError, match="ambiguous"):
        range_join(pdf, idf.withColumnRenamed("iid", "pid"), "p", "s", "e")


def test_scd2_collapse_and_asof_composition(spark):
    snaps = spark.createDataFrame(
        [
            (1, _ts(0), "bronze"), (1, _ts(10), "bronze"),  # no change
            (1, _ts(20), "gold"), (1, _ts(30), "gold"),
            (1, _ts(40), "bronze"),                          # re-change
            (2, _ts(5), "silver"),
        ],
        "k long, ts timestamp, tier string",
    )
    dim = scd2_build(snaps, ["k"], "ts", ["tier"])
    rows = sorted(
        (r["k"], r["valid_from"], r["valid_to"], r["tier"])
        for r in dim.collect()
    )
    assert rows == [
        (1, _ts(0), _ts(20), "bronze"),
        (1, _ts(20), _ts(40), "gold"),
        (1, _ts(40), None, "bronze"),
        (2, _ts(5), None, "silver"),
    ]
    # composition: asof over the raw snapshots == interval lookup in the dim
    facts = spark.createDataFrame(
        [(i, 1, _ts(t)) for i, t in enumerate([0, 15, 25, 39, 40, 99])],
        "fid long, k long, ts timestamp",
    )
    via_asof = {
        r["fid"]: r["asof_tier"]
        for r in asof_join(facts, snaps, ["k"], ["tier"]).collect()
    }
    # close the dimension's open intervals at the query horizon — an
    # unbounded interval must NOT be fed to the bucketizer (that lookup is
    # asof_join's job); the half-open convention becomes [vf, vt - eps]
    horizon = _ts(1000).timestamp()
    via_dim = {
        r["fid"]: r["tier"]
        for r in range_join(
            facts.withColumn("tsd", facts["ts"].cast("double")),
            dim.select(
                "k",
                "tier",
                dim["valid_from"].cast("double").alias("vf"),
                (dim["valid_to"].cast("double") - 1e-6).alias("vt"),
            ).fillna({"vt": horizon}),
            "tsd", "vf", "vt", on=["k"], bucket_seconds=50.0,
        ).collect()
    }
    assert via_dim == via_asof


def test_scd2_validation(spark):
    df = spark.createDataFrame([(1, _ts(0), "x")], "k long, ts timestamp, a string")
    with pytest.raises(ValueError):
        scd2_build(df, [], "ts", ["a"])
    with pytest.raises(ValueError):
        scd2_build(df, ["k"], "ts", [])


def test_stream_asof_enrich_equals_batch(spark, tmp_path):
    """Two micro-batches of facts against a static dim == one batch run,
    with tolerance applied inside each micro-batch identically."""
    snaps = spark.createDataFrame(
        [(1, _ts(10), 1.0), (1, _ts(50), 2.0), (2, _ts(5), 9.0)],
        "k long, ts timestamp, v double",
    )
    facts = spark.createDataFrame(
        [(i, k, _ts(t)) for i, (k, t) in enumerate(
            [(1, 9), (1, 10), (1, 49), (1, 300), (2, 6), (3, 7)]
        )],
        "fid long, k long, ts timestamp",
    )
    src = str(tmp_path / "src")
    facts.where(facts["fid"] % 2 == 0).coalesce(1).write.mode("append").parquet(src)
    facts.where(facts["fid"] % 2 == 1).coalesce(1).write.mode("append").parquet(src)

    from minimel_spark.streaming.ingest import stream_asof_enrich

    stream = (
        spark.readStream.schema("fid long, k long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = stream_asof_enrich(
        stream, snaps, ["k"], ["v"], out_dir, ckpt,
        tolerance_seconds=100,
    )
    try:
        assert q.awaitTermination(120)
    finally:
        q.stop()
    got = sorted(
        (r["fid"], r["asof_ts"], r["asof_v"])
        for r in spark.read.parquet(out_dir + "/batch=*").collect()
    )
    want = sorted(
        (r["fid"], r["asof_ts"], r["asof_v"])
        for r in asof_join(
            facts, snaps, ["k"], ["v"], tolerance_seconds=100
        ).collect()
    )
    assert got == want and len(got) == 6


def test_allen_classify_all_thirteen_relations(spark):
    from minimel_spark.operators.temporal import ALLEN_RELATIONS, allen_classify

    # canonical exemplars: a = [10, 20] against a crafted b per relation
    cases = [
        (10, 20, 25, 30, "precedes"),
        (10, 20, 20, 30, "meets"),
        (10, 20, 15, 30, "overlaps"),
        (10, 20, 15, 20, "finished_by"),
        (10, 20, 12, 18, "contains"),
        (10, 20, 10, 30, "starts"),
        (10, 20, 10, 20, "equals"),
        (10, 20, 10, 15, "started_by"),
        (10, 20, 5, 30, "during"),
        (10, 20, 5, 20, "finishes"),
        (10, 20, 5, 15, "overlapped_by"),
        (10, 20, 5, 10, "met_by"),
        (10, 20, 2, 5, "preceded_by"),
    ]
    df = spark.createDataFrame(
        [(i, a, b, c, d) for i, (a, b, c, d, _) in enumerate(cases)],
        "i long, a_start long, a_end long, b_start long, b_end long",
    )
    got = {r["i"]: r["allen"] for r in allen_classify(df).collect()}
    for i, (_, _, _, _, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)
    assert sorted(set(got.values())) == sorted(ALLEN_RELATIONS)


def test_allen_classify_degenerate_instants(spark):
    from minimel_spark.operators.temporal import allen_classify

    df = spark.createDataFrame(
        [(0, 5, 5, 5, 5), (1, 5, 5, 3, 7), (2, 5, 5, 5, 9)],
        "i long, a_start long, a_end long, b_start long, b_end long",
    )
    got = {r["i"]: r["allen"] for r in allen_classify(df).collect()}
    assert got[0] == "equals"
    assert got[1] == "during"
    # an instant at b's start satisfies both 'meets' and 'starts';
    # the chain's documented convention resolves to the earlier branch
    assert got[2] == "meets"


def test_cdc_compact_upsert_delete_semantics(spark):
    import pytest

    from minimel_spark.operators.temporal import cdc_compact

    changes = spark.createDataFrame(
        [
            # key 1: insert then update -> survives with the update value
            (1, 10, "I", 100),
            (1, 20, "U", 150),
            # key 2: insert then delete -> gone
            (2, 11, "I", 200),
            (2, 21, "D", None),
            # key 3: delete then REINSERT at higher seq -> back alive
            (3, 12, "D", None),
            (3, 22, "I", 300),
            # key 4: lone insert
            (4, 13, "I", 400),
        ],
        "key long, seq long, op string, value long",
    )
    out = {r["key"]: r for r in cdc_compact(changes, ["key"]).collect()}
    assert set(out) == {1, 3, 4}
    assert out[1]["value"] == 150 and out[1]["seq"] == 20
    assert out[3]["value"] == 300
    with pytest.raises(ValueError):
        cdc_compact(changes, [])


def test_cdc_compact_same_seq_tie_keeps_data(spark):
    from minimel_spark.operators.temporal import cdc_compact

    # a same-sequence U and D (a broken source): the documented
    # conservative tie-break keeps the upsert
    changes = spark.createDataFrame(
        [(7, 5, "U", 70), (7, 5, "D", None)],
        "key long, seq long, op string, value long",
    )
    out = cdc_compact(changes, ["key"]).collect()
    assert len(out) == 1 and out[0]["value"] == 70
