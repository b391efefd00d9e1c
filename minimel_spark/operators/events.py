"""Event-sequence analytics (SURVEY §4 LLM-pipeline family, round 5):
ordered-funnel conversion and first-order transition (Markov) counts over
an event log — the behavioral-analytics pair every clickstream/crawl-log
pipeline runs next to sessionization (`rel_sessionize` /
`stream_sessionize`). The reference (bennokr/minimEL) has no event layer;
Spark-first new work.

Scale design:
- ``funnel_steps``: one filtered min-aggregate per step, each keyed by the
  user — k-1 user-keyed shuffles over (user, timestamp) pairs, never a
  per-user collect_list (a hot user with 10^7 events contributes one row
  per step, not a 10^7-element array on one executor). Step k's aggregate
  joins step k-1's per-user completion time, so "strictly after the
  previous step" is an equi-join + filter, all JVM.
- ``event_transitions``: lead() over (user ORDER BY ts, tiebreak) — the
  state is per-user-partition and bounded by that user's events — then ONE
  partial-aggregated pair count. Deterministic under timestamp ties via a
  total tiebreak order (ts, event_type, event_id).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_seconds: int | None = None,
    persisted_out: list | None = None,
) -> DataFrame:
    """Ordered-funnel analysis: for each prefix of ``steps``, how many users
    completed it IN ORDER (each step strictly after the previous one's
    earliest completion; greedy earliest-first matching, the standard
    funnel semantics). ``within_seconds`` additionally requires the last
    step to land within that span of the FIRST step's completion.

    Returns (step_idx, step, n_users) with step_idx 1-based; n_users is
    non-increasing in step_idx by construction.

    Step k's per-user table chains on step k-1's, so without caching the
    lazy plan re-derives the whole prefix per step (O(k^2) scans) — pass
    ``persisted_out`` (a list the caller unpersists) to make it O(k).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    if within_seconds is not None and within_seconds <= 0:
        raise ValueError(f"within_seconds must be > 0, got {within_seconds}")
    u, t = F.col(user_col), F.col(ts_col)
    # per-user earliest completion time of each prefix, chained
    prev: DataFrame | None = None  # (user, t_k, t_1)
    counts = []
    for i, step in enumerate(steps, 1):
        hits = events.where(F.col(type_col) == step).select(
            u.alias("_u"), t.alias("_ts")
        )
        if prev is None:
            cur = hits.groupBy("_u").agg(F.min("_ts").alias("_tk"))
            cur = cur.select("_u", "_tk", F.col("_tk").alias("_t1"))
        else:
            cur = (
                hits.join(prev, "_u")
                .where(F.col("_ts") > F.col("_tk"))
                .groupBy("_u", "_t1")
                .agg(F.min("_ts").alias("_tk"))
                .select("_u", "_tk", "_t1")
            )
        if persisted_out is not None:
            cur = cur.persist()
            persisted_out.append(cur)
        done = cur
        if within_seconds is not None:
            done = cur.where(
                F.unix_micros(F.col("_tk")) - F.unix_micros(F.col("_t1"))
                <= int(within_seconds) * 1_000_000
            )
        counts.append(
            done.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i).alias("step_idx"), F.lit(step).alias("step"), "n_users"
            )
        )
        prev = cur
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order transition counts: for every consecutive pair of events
    of the same user (ordered by timestamp, tie-broken by (type, id) so the
    sequence — and therefore the counts — is a total order, deterministic
    at any parallelism), count (from_type, to_type) occurrences.

    Returns (from_type, to_type, cnt) — the empirical Markov transition
    table behavioral models and bot-detection heuristics start from.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.asc(ts_col), F.asc(type_col), F.asc(id_col)
    )
    nxt = events.select(
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(w).alias("to_type"),
    )
    return (
        nxt.where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def event_gaps(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
) -> DataFrame:
    """Missing-data audit over a dense time spine: for every group
    (event type, source feed, sensor), every HOUR between the stream's
    global first and last event in which that group logged NOTHING — the
    ops check that catches a dead producer, a dropped kafka partition,
    or a crawler that silently stopped, which per-hour COUNTS
    (:func:`hourly rollups <funnel_steps>` and friends) never surface
    because absent rows don't aggregate. The spine is generated, not
    assumed: ``sequence(min_hour, max_hour)`` exploded once, cross-
    joined with the (tiny) group dimension, anti-joined against observed
    (group, hour) pairs.

    Scale: the spine is hours × groups — thousands of rows for years of
    data — so the cross join is trivial; the observed side reduces to
    the same grain map-side before the anti-join. One shuffle.

    Output: ``(group_col, gap_hour)`` — one row per silent group-hour.
    """
    e = events.select(
        F.col(ts_col).cast("timestamp").alias("_ts"),
        F.col(group_col).alias("_g"),
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("_ts")).alias("_lo"),
        F.date_trunc("hour", F.max("_ts")).alias("_hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("_lo", "_hi", F.expr("interval 1 hour"))
        ).alias("gap_hour")
    )
    groups = e.select("_g").distinct()
    observed = e.select(
        "_g", F.date_trunc("hour", F.col("_ts")).alias("gap_hour")
    ).distinct()
    return (
        spine.crossJoin(groups)
        .join(observed, ["_g", "gap_hour"], "left_anti")
        .select(F.col("_g").alias(group_col), "gap_hour")
    )


def touch_attribution(
    events: DataFrame,
    conversion_type: str,
    touch_types: list[str],
    lookback_seconds: float,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Multi-touch conversion attribution — first-touch, last-touch, and
    linear credit computed side by side (the three standard models; one
    pass, so the analyst compares them instead of re-running the
    pipeline per model): every conversion event is joined to the SAME
    user's touch events inside the lookback window (touch at or before
    the conversion, within ``lookback_seconds``), and each touch row
    carries its credit under all three models. Conversions with no
    in-window touch simply emit nothing — "organic" volume is the
    count difference the caller already has.

    Determinism: touch order is (ts, event_id) — simultaneous touches
    tie-break on the id, so first/last credit never depends on
    partitioning.

    Scale: one equi-join on the user key with the window predicate
    refined after (per-user cardinality is session-scale; a true
    power-user skew is AQE's skew-join case), then two per-conversion
    window ranks and one count — all bounded by that conversion's touch
    count.

    Output: ``(conv_id, conv_ts, touch_id, touch_type, touch_ts,
    credit_first, credit_last, credit_linear)``.
    """
    if not touch_types:
        raise ValueError("touch_types must be non-empty")
    if lookback_seconds <= 0:
        raise ValueError(
            f"lookback_seconds must be > 0, got {lookback_seconds}"
        )
    conv = events.where(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("_u"),
        F.col(id_col).alias("conv_id"),
        F.col(ts_col).cast("timestamp").alias("conv_ts"),
    )
    touch = events.where(F.col(type_col).isin(list(touch_types))).select(
        F.col(user_col).alias("_u"),
        F.col(id_col).alias("touch_id"),
        F.col(type_col).alias("touch_type"),
        F.col(ts_col).cast("timestamp").alias("touch_ts"),
    )
    joined = conv.join(touch, "_u").where(
        (F.col("touch_ts") <= F.col("conv_ts"))
        & (
            F.col("conv_ts").cast("double") - F.col("touch_ts").cast("double")
            <= F.lit(float(lookback_seconds))
        )
    )
    w_first = Window.partitionBy("conv_id").orderBy(
        F.asc("touch_ts"), F.asc("touch_id")
    )
    w_last = Window.partitionBy("conv_id").orderBy(
        F.desc("touch_ts"), F.desc("touch_id")
    )
    w_all = Window.partitionBy("conv_id")
    return (
        joined.withColumn("_rf", F.row_number().over(w_first))
        .withColumn("_rl", F.row_number().over(w_last))
        .withColumn("_n", F.count(F.lit(1)).over(w_all))
        .select(
            "conv_id",
            "conv_ts",
            "touch_id",
            "touch_type",
            "touch_ts",
            F.when(F.col("_rf") == 1, 1.0).otherwise(0.0).alias("credit_first"),
            F.when(F.col("_rl") == 1, 1.0).otherwise(0.0).alias("credit_last"),
            (F.lit(1.0) / F.col("_n")).alias("credit_linear"),
        )
    )


def burst_hours(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    z: float = 3.0,
) -> DataFrame:
    """Volume-burst detection per event type — the 3σ hourly anomaly
    sweep a pipeline runs over its ingest stream (the thresholded
    population-z relaxation of Kleinberg's burst automaton): per
    (event type, hour) count, flag hours whose count exceeds the type's
    mean + z·σ over ALL its hours (population σ via the exact-moment
    identity σ² = Σx²/n − μ²). Counts are exact integers; μ and σ are
    single fixed IEEE sequences over them (sqrt is correctly rounded by
    IEEE 754), so even the boolean flag is engine-exact.

    One hourly count, one per-type moment aggregate, one broadcast-sized
    join back. Output: ``(event_type, hour, n, mu, sigma, is_burst)``
    with mu/sigma rounded 6 for display (the flag uses the unrounded
    values).
    """
    if z <= 0:
        raise ValueError(f"z must be > 0, got {z}")
    hourly = events.groupBy(
        F.col(type_col).alias("event_type"),
        F.date_format(F.date_trunc("hour", ts_col), "yyyy-MM-dd HH:mm:ss").alias(
            "hour"
        ),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    mom = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("_k"),
        F.sum("n").alias("_s"),
        F.sum(F.col("n") * F.col("n")).alias("_s2"),
    )
    mu = F.col("_s") / F.col("_k")
    sigma = F.sqrt(F.col("_s2") / F.col("_k") - mu * mu)
    return (
        hourly.join(F.broadcast(mom), "event_type")
        .select(
            "event_type",
            "hour",
            "n",
            F.round(mu, 6).alias("mu"),
            F.round(sigma, 6).alias("sigma"),
            (F.col("n") > mu + F.lit(float(z)) * sigma).alias("is_burst"),
        )
    )


def decayed_counts(
    events: DataFrame,
    boundaries_us: list[int],
    halflife_s: float,
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Exponentially-decayed event counters folded INCREMENTALLY across
    chronological checkpoints — the state law behind every streaming
    decayed top-k (e.g. Cormode et al.'s time-decayed sketches): at each
    boundary b_i the carried state scales by one factor
    0.5^((b_i − b_{i−1})/h) while the window's events contribute
    0.5^((b_i − ts)/h), so the final state is reachable from EITHER the
    incremental fold (what a restarting streaming job does) or the direct
    whole-corpus formula. The gate's oracle computes the direct form;
    agreement at 6 decimals is the decay identity
    0.5^(a+b) = 0.5^a · 0.5^b holding across the fold (exact up to
    ~1e-13 relative IEEE drift, far below the rounding).

    ``boundaries_us`` are epoch-microsecond cutoffs, ascending; events at
    or past the last boundary are ignored (they haven't happened yet from
    the final checkpoint's perspective). Each fold step is one windowed
    aggregation + one full-outer merge on the key — state size is
    |keys|, never |events|, which is the whole point of decayed counters
    at stream scale. Returns ``(key, decayed, n_events)``.
    """
    if not boundaries_us or sorted(boundaries_us) != list(boundaries_us):
        raise ValueError("boundaries_us must be a non-empty ascending list")
    if halflife_s <= 0:
        raise ValueError(f"halflife_s must be > 0, got {halflife_s}")
    h_us = float(halflife_s) * 1e6
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    key = F.col(key_col).alias("key")
    state = None
    prev_b = None
    for b in boundaries_us:
        w = events.where(
            ts_us < F.lit(b) if prev_b is None
            else (ts_us >= F.lit(prev_b)) & (ts_us < F.lit(b))
        )
        part = w.groupBy(key).agg(
            F.sum(
                F.pow(F.lit(0.5), (F.lit(b) - ts_us).cast("double") / F.lit(h_us))
            ).alias("_add"),
            F.count(F.lit(1)).alias("_n"),
        )
        if state is None:
            state = part.select("key", F.col("_add").alias("decayed"),
                                F.col("_n").alias("n_events"))
        else:
            carry = 0.5 ** ((b - prev_b) / h_us)
            scaled = state.select(
                "key",
                (F.col("decayed") * F.lit(carry)).alias("_prev"),
                F.col("n_events").alias("_pn"),
            )
            state = scaled.join(part, "key", "full_outer").select(
                "key",
                (
                    F.coalesce("_prev", F.lit(0.0))
                    + F.coalesce("_add", F.lit(0.0))
                ).alias("decayed"),
                (
                    F.coalesce("_pn", F.lit(0))
                    + F.coalesce("_n", F.lit(0))
                ).cast("long").alias("n_events"),
            )
        prev_b = b
    return state.select(
        F.col("key").alias(key_col),
        F.round("decayed", 6).alias("decayed"),
        "n_events",
    )


def ewma_forecast(
    events: DataFrame,
    alpha: float = 0.3,
    z: float = 3.0,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """One-step-ahead EWMA control chart per event type (Roberts 1959 —
    Holt's level-only smoothing): over the type's hourly counts,

        f_t = s_{t-1},   s_t = α·y_t + (1−α)·s_{t-1},   s_1 = f_1 = y_1

    and hour t is anomalous when |y_t − f_t| exceeds z·σ of the type's
    residuals. vs :func:`burst_hours` (mean + 3σ): the static sweep asks
    "is this hour extreme for the type overall"; the EWMA chart asks "is
    it extreme given the level the series had just reached" —
    trend-following, so it catches level shifts and local spikes the
    global mean hides (and forgives hours that are merely on a new
    plateau).

    Scale: the sequential fold runs over the HOURLY aggregate, never the
    event stream — per-type state is hours-sized, folded inside one JVM
    ``F.aggregate`` (no UDF, no window over the corpus), and types fan
    out in parallel. σ comes from the exact-moment identity over the
    residuals (clamped at 0 against float underflow); the anomaly flag
    compares ROUNDED-6 values so both engines decide identically even at
    knife-edge residuals. Output:
    ``(event_type, hour, y, fcast, resid, sigma, is_anomaly)``.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if z <= 0:
        raise ValueError(f"z must be > 0, got {z}")
    hourly = events.groupBy(
        F.col(type_col).alias("event_type"),
        F.date_format(F.date_trunc("hour", ts_col), "yyyy-MM-dd HH:mm:ss").alias(
            "hour"
        ),
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    series = hourly.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("hour", "y"))).alias("_hs")
    )
    out_t = "array<struct<hour:string,y:bigint,f:double>>"
    init = F.struct(
        F.lit(0.0).alias("s"), F.array().cast(out_t).alias("out")
    )

    def step(acc, x):
        first = F.size(acc["out"]) == 0
        fcast = F.when(first, x["y"].cast("double")).otherwise(acc["s"])
        new_s = F.when(first, x["y"].cast("double")).otherwise(
            F.lit(alpha) * x["y"] + F.lit(1.0 - alpha) * acc["s"]
        )
        row = F.struct(
            x["hour"].alias("hour"), x["y"].alias("y"), fcast.alias("f")
        )
        return F.struct(
            new_s.alias("s"), F.concat(acc["out"], F.array(row)).alias("out")
        )

    rows = (
        series.select(
            "event_type", F.explode(F.aggregate("_hs", init, step)["out"]).alias("_r")
        )
        .select(
            "event_type",
            F.col("_r.hour").alias("hour"),
            F.col("_r.y").alias("y"),
            F.col("_r.f").alias("_f"),
        )
        .withColumn("_resid", F.col("y") - F.col("_f"))
    )
    mom = rows.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("_k"),
        F.sum("_resid").alias("_sr"),
        F.sum(F.col("_resid") * F.col("_resid")).alias("_sr2"),
    )
    sigma = F.sqrt(
        F.greatest(
            F.col("_sr2") / F.col("_k")
            - (F.col("_sr") / F.col("_k")) * (F.col("_sr") / F.col("_k")),
            F.lit(0.0),
        )
    )
    return (
        rows.join(mom, "event_type")
        .withColumn("_sigma", sigma)
        .select(
            "event_type",
            "hour",
            "y",
            F.round("_f", 6).alias("fcast"),
            F.round("_resid", 6).alias("resid"),
            F.round("_sigma", 6).alias("sigma"),
            (
                F.round(F.abs("_resid"), 6) > F.round(F.lit(z) * F.col("_sigma"), 6)
            ).alias("is_anomaly"),
        )
    )


def lateness_audit(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """Out-of-orderness audit for watermark sizing — THE question a
    Structured Streaming job must answer before picking
    ``withWatermark``: when events are replayed in arrival order
    (``order_col``), how far behind the running event-time high-water
    mark do they arrive?

        lateness(e) = max(event_time of all earlier arrivals) − event_time(e)

    A watermark of W seconds drops exactly the events with lateness > W,
    so the bucketed histogram below IS the loss curve: per type,
    ``n_events``, ``n_inorder`` (lateness 0), the (0,1s] / (1s,10s] /
    (10s,60s] / >60s bucket counts, and the max lateness. All exact
    integer microsecond arithmetic.

    The running max is a cumulative window PARTITIONED BY type ordered
    by arrival — per-type state, never a global sort; at scale this is
    the same shape as sessionization.
    """
    w = (
        Window.partitionBy(type_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    us = F.unix_micros(F.col(ts_col))
    late = (
        events.select(type_col, order_col, us.alias("_us"))
        .withColumn("_hwm", F.max("_us").over(w))
        .withColumn("_late", F.col("_hwm") - F.col("_us"))
    )
    s = 1_000_000
    return late.groupBy(F.col(type_col).alias("event_type")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("_late") == 0, 1).otherwise(0)).cast("long").alias("n_inorder"),
        F.sum(
            F.when((F.col("_late") > 0) & (F.col("_late") <= 1 * s), 1).otherwise(0)
        ).cast("long").alias("n_1s"),
        F.sum(
            F.when((F.col("_late") > 1 * s) & (F.col("_late") <= 10 * s), 1).otherwise(0)
        ).cast("long").alias("n_10s"),
        F.sum(
            F.when((F.col("_late") > 10 * s) & (F.col("_late") <= 60 * s), 1).otherwise(0)
        ).cast("long").alias("n_60s"),
        F.sum(F.when(F.col("_late") > 60 * s, 1).otherwise(0)).cast("long").alias("n_gt60s"),
        (F.max("_late") / F.lit(1_000_000.0)).alias("max_late_s"),
    )
