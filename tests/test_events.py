"""funnel_steps / event_transitions: Python parity on hand-built logs,
ordering semantics, within-window filtering, cache hand-off, validation."""

import datetime as dt

import pytest

from minimel_spark.operators.events import event_transitions, funnel_steps

from conftest import pinned_rdd_ids


def _ts(minute):
    return dt.datetime(2026, 1, 1, 0, minute)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, u, t, _ts(m)) for i, (u, t, m) in enumerate(rows)],
        "event_id long, user_id long, event_type string, ts timestamp",
    )


def test_funnel_order_matters(spark):
    rows = [
        (1, "a", 0), (1, "b", 1), (1, "c", 2),   # completes in order
        (2, "b", 0), (2, "a", 1), (2, "c", 2),   # b BEFORE a: stops at a
        (3, "c", 0), (3, "b", 1), (3, "a", 2),   # reversed: stops at a
        (4, "a", 0), (4, "c", 1),                # skips b: stops at a
        (5, "a", 0), (5, "b", 1), (5, "b", 2),   # reaches b, no c
    ]
    out = {
        (r["step_idx"], r["step"]): r["n_users"]
        for r in funnel_steps(_ev(spark, rows), ["a", "b", "c"]).collect()
    }
    assert out == {(1, "a"): 5, (2, "b"): 2, (3, "c"): 1}


def test_funnel_within_window_and_caches(spark):
    rows = [
        (1, "a", 0), (1, "b", 1), (1, "c", 2),    # span 2 min
        (2, "a", 0), (2, "b", 1), (2, "c", 30),   # span 30 min
    ]
    ev = _ev(spark, rows)
    ids_before = pinned_rdd_ids(spark)
    caches = []
    out = {
        r["step_idx"]: r["n_users"]
        for r in funnel_steps(
            ev, ["a", "b", "c"], within_seconds=600, persisted_out=caches
        ).collect()
    }
    assert out == {1: 2, 2: 2, 3: 1}
    assert len(caches) == 3
    for c in caches:
        c.unpersist()
    assert pinned_rdd_ids(spark) - ids_before == set()
    with pytest.raises(ValueError):
        funnel_steps(ev, [])
    with pytest.raises(ValueError):
        funnel_steps(ev, ["a"], within_seconds=0)


def test_funnel_greedy_earliest_semantics(spark):
    # a@0, b@1 ... but ALSO a@5: greedy matches earliest a, so b@1 counts.
    rows = [(1, "a", 0), (1, "b", 1), (1, "a", 5)]
    out = {
        r["step_idx"]: r["n_users"]
        for r in funnel_steps(_ev(spark, rows), ["a", "b"]).collect()
    }
    assert out == {1: 1, 2: 1}


def test_transitions_match_python_and_tiebreak(spark):
    rows = [
        (1, "a", 0), (1, "b", 1), (1, "a", 2),
        (2, "b", 0), (2, "b", 1),
        # user 3: two events at the SAME minute -> tiebreak (type, id):
        # 'a' orders before 'z', so a->z, then z->c
        (3, "a", 0), (3, "z", 0), (3, "c", 1),
        (4, "solo", 0),
    ]
    got = {
        (r["from_type"], r["to_type"]): r["cnt"]
        for r in event_transitions(_ev(spark, rows)).collect()
    }
    assert got == {
        ("a", "b"): 1, ("b", "a"): 1, ("b", "b"): 1,
        ("a", "z"): 1, ("z", "c"): 1,
    }


def test_transitions_parallelism_invariant(spark):
    rows = [(u, f"t{(u * 3 + m) % 4}", m) for u in range(20) for m in range(15)]
    ev = _ev(spark, rows)
    a = sorted(map(tuple, event_transitions(ev).collect()))
    b = sorted(map(tuple, event_transitions(ev.repartition(17)).collect()))
    assert a == b


def test_event_gaps_finds_silent_hours(spark):
    from datetime import datetime

    from minimel_spark.operators.events import event_gaps

    rows = [
        # type A logs at 00, 02; silent at 01 and 03
        (datetime(2024, 1, 1, 0, 10), "A"),
        (datetime(2024, 1, 1, 2, 20), "A"),
        # type B logs 00-03 (sets the global max at hour 03)
        (datetime(2024, 1, 1, 0, 5), "B"),
        (datetime(2024, 1, 1, 1, 5), "B"),
        (datetime(2024, 1, 1, 2, 5), "B"),
        (datetime(2024, 1, 1, 3, 5), "B"),
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string")
    gaps = {
        (r["event_type"], r["gap_hour"].hour)
        for r in event_gaps(ev).collect()
    }
    # A's silent hours inside the GLOBAL spine, including the trailing one
    assert gaps == {("A", 1), ("A", 3)}


def test_touch_attribution_models(spark):
    from datetime import datetime

    import pytest

    from minimel_spark.operators.events import touch_attribution

    def at(m):
        return datetime(2024, 1, 1, 0, m)

    ev = spark.createDataFrame(
        [
            (1, at(0), 7, "view", None),
            (2, at(10), 7, "click", None),
            (3, at(20), 7, "purchase", None),   # conv w/ 2 touches
            (4, at(50), 7, "view", None),
            (5, at(55), 7, "purchase", None),   # conv w/ 1 in-window touch
            (6, at(0), 8, "purchase", None),    # conv w/ NO touch -> absent
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    out = touch_attribution(ev, "purchase", ["view", "click"], 60 * 30)
    rows = {(r["conv_id"], r["touch_id"]): r for r in out.collect()}
    # conversion 3: first credit to view(1), last to click(2), linear 0.5
    assert rows[(3, 1)]["credit_first"] == 1.0
    assert rows[(3, 1)]["credit_last"] == 0.0
    assert rows[(3, 2)]["credit_last"] == 1.0
    assert rows[(3, 2)]["credit_linear"] == 0.5
    # conversion 5: only touch 4 is within the 30-min lookback (1,2 too old)
    conv5 = [k for k in rows if k[0] == 5]
    assert conv5 == [(5, 4)]
    assert rows[(5, 4)]["credit_first"] == rows[(5, 4)]["credit_last"] == 1.0
    # organic conversion 6 emits nothing
    assert not [k for k in rows if k[0] == 6]
    with pytest.raises(ValueError):
        touch_attribution(ev, "purchase", [], 60)
    with pytest.raises(ValueError):
        touch_attribution(ev, "purchase", ["view"], 0)


def test_burst_hours_flags_spike(spark):
    import pyspark.sql.functions as F
    import pytest as _pytest

    from minimel_spark.operators.events import burst_hours

    # type A: 20 quiet hours of 10 events + one spike hour (a single
    # outlier among n points caps at z = sqrt(n-1), so n must exceed 10
    # for a 3-sigma flag to be reachable at all)
    rows = []
    eid = 0
    for h in range(20):
        for _ in range(10):
            rows.append((eid, f"2024-01-01 {h:02d}:15:00", "A")); eid += 1
    for _ in range(200):
        rows.append((eid, "2024-01-01 21:30:00", "A")); eid += 1
    # type B: flat -> sigma 0, nothing flagged
    for h in range(5):
        for _ in range(7):
            rows.append((eid, f"2024-01-02 {h:02d}:00:00", "B")); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts_s string, event_type string"
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type")
    got = {
        (r["event_type"], r["hour"]): r for r in burst_hours(ev).collect()
    }
    bursts = {k for k, r in got.items() if r["is_burst"]}
    assert bursts == {("A", "2024-01-01 21:00:00")}
    assert got[("A", "2024-01-01 21:00:00")]["n"] == 200
    assert all(r["sigma"] == 0.0 for k, r in got.items() if k[0] == "B")
    # python cross-check of mu/sigma for A
    import math

    xs = [10] * 20 + [200]
    mu = sum(xs) / len(xs)
    sig = math.sqrt(sum(x * x for x in xs) / len(xs) - mu * mu)
    a = got[("A", "2024-01-01 21:00:00")]
    assert a["mu"] == round(mu, 6) and a["sigma"] == round(sig, 6)
    with _pytest.raises(ValueError):
        burst_hours(ev, z=0)


def test_decayed_counts_fold_equals_direct(spark):
    import math

    from minimel_spark.operators.events import decayed_counts

    # events for two keys over 4 hours; halflife 1h; boundaries at h2, h4
    rows = [
        ("a", "2024-01-01 00:00:00"), ("a", "2024-01-01 00:30:00"),
        ("a", "2024-01-01 01:30:00"), ("b", "2024-01-01 01:00:00"),
        ("a", "2024-01-01 02:30:00"), ("b", "2024-01-01 03:00:00"),
        ("b", "2024-01-01 03:59:00"),
        ("b", "2024-01-01 04:30:00"),  # past final boundary: ignored
    ]
    df = spark.createDataFrame(rows, "event_type string, ts string")
    base = 1704067200 * 1_000_000  # 2024-01-01 00:00:00 UTC epoch us
    b2 = base + 2 * 3600 * 1_000_000
    b4 = base + 4 * 3600 * 1_000_000
    got = {r["event_type"]: (r["decayed"], r["n_events"])
           for r in decayed_counts(df, [b2, b4], 3600.0).collect()}
    import datetime

    def direct(key):
        tot = 0.0
        n = 0
        for k, t in rows:
            if k != key:
                continue
            ts = datetime.datetime.fromisoformat(t).replace(
                tzinfo=datetime.timezone.utc).timestamp() * 1e6
            if ts >= b4:
                continue
            tot += 0.5 ** ((b4 - ts) / (3600 * 1e6))
            n += 1
        return round(tot, 6), n

    for k in ("a", "b"):
        want = direct(k)
        assert got[k][1] == want[1]
        assert abs(got[k][0] - want[0]) < 1e-6, (k, got[k], want)


def test_decayed_counts_validation_and_partition_invariance(spark):
    import pytest as _pt

    from minimel_spark.operators.events import decayed_counts

    rows = [(f"k{i % 3}", f"2024-01-01 {i % 24:02d}:00:00") for i in range(200)]
    df = spark.createDataFrame(rows, "event_type string, ts string")
    base = 1704067200 * 1_000_000
    bs = [base + h * 3600 * 1_000_000 for h in (8, 16, 24)]
    a = sorted(map(tuple, decayed_counts(df.coalesce(1), bs, 7200.0).collect()))
    b = sorted(map(tuple, decayed_counts(df.repartition(16), bs, 7200.0).collect()))
    assert a == b and len(a) == 3
    with _pt.raises(ValueError, match="ascending"):
        decayed_counts(df, [2, 1], 60.0)
    with _pt.raises(ValueError, match="halflife"):
        decayed_counts(df, [1], 0.0)


def test_ewma_forecast_matches_python_and_flags_spike(spark):
    import datetime

    import pytest as _pt

    from minimel_spark.operators.events import ewma_forecast

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    counts = [10, 10, 10, 10, 60, 10, 10, 10, 10, 10, 10, 10]
    eid = 0
    for h, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, base + datetime.timedelta(hours=h), "click"))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    got = {
        r["hour"]: (r["y"], r["fcast"], r["resid"], r["is_anomaly"])
        for r in ewma_forecast(ev, alpha=0.3, z=3.0).collect()
    }
    # python replay
    a = 0.3
    s = None
    want = []
    for h, y in enumerate(counts):
        f = y if s is None else s
        s = float(y) if s is None else a * y + (1.0 - a) * s
        want.append((h, y, f))
    resids = [y - f for _, y, f in want]
    k = len(resids)
    mu2 = sum(r * r for r in resids) / k - (sum(resids) / k) ** 2
    sig = max(mu2, 0.0) ** 0.5
    for h, y, f in want:
        hour = (base + datetime.timedelta(hours=h)).strftime("%Y-%m-%d %H:%M:%S")
        gy, gf, gr, ga = got[hour]
        assert gy == y and abs(gf - f) < 1e-6
        assert ga == (round(abs(y - f), 6) > round(3.0 * sig, 6)), hour
    # exactly the spike hour (and possibly its recovery) flags; hour 0 never
    spike_hour = (base + datetime.timedelta(hours=4)).strftime("%Y-%m-%d %H:%M:%S")
    assert got[spike_hour][3] is True
    first_hour = base.strftime("%Y-%m-%d %H:%M:%S")
    assert got[first_hour][3] is False and got[first_hour][2] == 0.0
    a2 = sorted(map(tuple, ewma_forecast(ev.coalesce(1)).collect()))
    b2 = sorted(map(tuple, ewma_forecast(ev.repartition(8)).collect()))
    assert a2 == b2
    with _pt.raises(ValueError):
        ewma_forecast(ev, alpha=0.0)
    with _pt.raises(ValueError):
        ewma_forecast(ev, z=0.0)


def test_lateness_audit_matches_python(spark):
    import datetime

    from minimel_spark.operators.events import lateness_audit

    base = datetime.datetime(2024, 1, 1)

    def ts(sec):
        return base + datetime.timedelta(seconds=sec)

    # arrival order = event_id; event-times arrive shuffled
    rows = [
        (1, ts(0), "a"),      # hwm 0, late 0
        (2, ts(100), "a"),    # hwm 100, late 0
        (3, ts(99.5), "a"),   # late 0.5s  -> n_1s
        (4, ts(95), "a"),     # late 5s    -> n_10s
        (5, ts(30), "a"),     # late 70s   -> n_gt60s
        (6, ts(100), "a"),    # late 0     -> in order (ties count as 0)
        (7, ts(0), "b"),      # independent per-type hwm
        (8, ts(50), "b"),
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    got = {r["event_type"]: r.asDict() for r in lateness_audit(ev).collect()}
    a = got["a"]
    assert (a["n_events"], a["n_inorder"], a["n_1s"], a["n_10s"], a["n_60s"], a["n_gt60s"]) == (6, 3, 1, 1, 0, 1)
    assert abs(a["max_late_s"] - 70.0) < 1e-9
    b = got["b"]
    assert b["n_inorder"] == 2 and b["max_late_s"] == 0.0
    x = sorted(map(tuple, lateness_audit(ev.coalesce(1)).collect()))
    y = sorted(map(tuple, lateness_audit(ev.repartition(8)).collect()))
    assert x == y
