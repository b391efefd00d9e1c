"""Temporal relational operators (SURVEY §4 LLM-pipeline family, round 5):
as-of (point-in-time) join, interval/range join, and SCD type-2 dimension
build — the three temporal primitives a 100-TB event/feature pipeline needs
that Spark's join menu lacks (its only native answers are an O(n·m)
BroadcastNestedLoopJoin for inequality predicates, or nothing at all for
as-of). The reference (bennokr/minimEL) has no temporal layer; Spark-first
new work. DuckDB's native ``ASOF JOIN`` (an independent algorithm) is the
oracle for the first; plain inequality SQL for the other two.

Scale design:
- ``asof_join`` is NOT a join at all: both sides are unioned into one
  stream and hash-partitioned by key ONCE, then a per-key ordered window
  carries the last-seen snapshot forward (``last(..., ignorenulls=True)``
  over rows-unbounded-preceding — an O(1)-state running value, never a
  per-key collect). One shuffle total, no build side, no probe side; a
  fact side 1000× the dimension side costs the same one exchange it would
  for a plain groupBy. Hot keys land one partition each — the same skew
  profile as any per-key window; ``key_skew_profile`` is the pre-flight.
- ``range_join`` turns interval containment into an equi-join: each
  interval explodes into the fixed-width buckets it covers (bounded by
  ``max_span`` — validation, not hope), each point maps to exactly ONE
  bucket, and the bucket ids equi-join with an exact refine predicate
  after. Shuffle volume is |points| + Σ ceil(span/width) instead of the
  |points|·|intervals| nested loop; no dedupe pass is needed because a
  point belongs to a single bucket.
- ``scd2_build`` is one per-key window pass: ``lag`` over the attribute
  struct finds change points, ``lead`` closes each validity interval.
  Consecutive-duplicate collapse happens BEFORE the output, so the
  dimension stores O(#changes) rows, not O(#snapshots).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    facts: DataFrame,
    snapshots: DataFrame,
    on: list[str],
    value_cols: list[str],
    fact_ts: str = "ts",
    snap_ts: str = "ts",
    tolerance_seconds: float | None = None,
    out_prefix: str = "asof_",
) -> DataFrame:
    """Backward-inclusive point-in-time join: every fact row gains the
    ``value_cols`` of the single snapshot row sharing its ``on`` keys with
    the greatest ``snap_ts`` <= ``fact_ts`` (NULLs when none exists, or
    when the match is older than ``tolerance_seconds``). Exactly DuckDB's
    ``ASOF LEFT JOIN ... ON fact.ts >= snap.ts`` semantics.

    Snapshots sharing an exact (key, ts) are collapsed deterministically to
    the lexicographic max of ``struct(value_cols)`` first, so the result is
    a pure function of row content (parallelism/retry invariant) even on a
    dimension with same-instant writes.

    Output: all fact columns + ``{out_prefix}ts`` + ``{out_prefix}{v}`` for
    each value column.
    """
    if not on:
        raise ValueError("on must be non-empty")
    if tolerance_seconds is not None and tolerance_seconds <= 0:
        raise ValueError(
            f"tolerance_seconds must be > 0, got {tolerance_seconds}"
        )
    fact_cols = facts.columns
    for c in (f"{out_prefix}ts", *(f"{out_prefix}{v}" for v in value_cols)):
        if c in fact_cols:
            raise ValueError(f"output column {c!r} already exists on facts")
    # deterministic per-(key, ts) snapshot: lexicographic max over values
    snap = (
        snapshots.groupBy(*on, F.col(snap_ts).alias("_ts"))
        .agg(F.max(F.struct(*[F.col(v) for v in value_cols])).alias("_vals"))
        .select(
            *on,
            "_ts",
            F.lit(0).alias("_side"),
            F.struct(F.col("_ts").alias("_sts"), F.col("_vals")).alias("_snap"),
        )
    )
    evt = facts.select(
        *on,
        F.col(fact_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in fact_cols]).alias("_evt"),
    )
    # Shared union layout: keys, ts, side, snapshot payload (typed-null on
    # facts), fact payload (typed-null on snapshots). Explicit casts — a
    # bare NullType union is coercion-fragile across Spark versions.
    snap_t = snap.schema["_snap"].dataType.simpleString()
    evt_t = evt.schema["_evt"].dataType.simpleString()
    both = snap.withColumn("_evt", F.lit(None).cast(evt_t)).unionByName(
        evt.withColumn("_snap", F.lit(None).cast(snap_t)).select(
            *on, "_ts", "_side", "_snap", "_evt"
        )
    )
    # snapshots (side 0) sort before facts (side 1) at equal ts => inclusive
    w = (
        Window.partitionBy(*[F.col(k) for k in on])
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        both.withColumn("_m", F.last("_snap", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    if tolerance_seconds is not None:
        in_tol = (
            F.col("_ts").cast("double") - F.col("_m._sts").cast("double")
        ) <= F.lit(float(tolerance_seconds))
        matched = matched.withColumn(
            "_m", F.when(in_tol, F.col("_m"))
        )
    return matched.select(
        *[F.col(f"_evt.{c}").alias(c) for c in fact_cols],
        F.col("_m._sts").alias(f"{out_prefix}ts"),
        *[
            F.col(f"_m._vals.{v}").alias(f"{out_prefix}{v}")
            for v in value_cols
        ],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    on: list[str] | None = None,
    bucket_seconds: float = 3600.0,
    max_span_seconds: float | None = None,
) -> DataFrame:
    """Inner join of point rows to every interval row whose closed range
    ``[start_col, end_col]`` contains the point (timestamps or numerics),
    optionally also matching equi-keys ``on``.

    Implementation is a bucketized equi-join (see module docstring): with
    bucket width w, an interval of span s explodes into floor(s/w)+1 bucket
    rows, a point maps to exactly one bucket, and the exact containment
    predicate refines after the equi-join. Pick ``bucket_seconds`` near the
    TYPICAL interval span: shuffle volume is |points| + Σ(span_i/w + 1).

    ``max_span_seconds`` (default 10_000 buckets' worth) bounds the per-row
    explosion: an interval longer than it raises at execution time rather
    than silently materializing millions of bucket rows (the guard a
    100-TB run wants — one corrupt open-ended interval otherwise OOMs the
    stage). Intervals with end < start are dropped (empty ranges).
    """
    if bucket_seconds <= 0:
        raise ValueError(f"bucket_seconds must be > 0, got {bucket_seconds}")
    if max_span_seconds is None:
        max_span_seconds = 10_000 * bucket_seconds
    on = on or []
    overlap = set(points.columns) & set(intervals.columns) - set(on)
    if overlap:
        raise ValueError(
            f"ambiguous columns on both sides (rename first): {sorted(overlap)}"
        )
    p = F.col(point_col).cast("double")
    s = F.col(start_col).cast("double")
    e = F.col(end_col).cast("double")
    w = float(bucket_seconds)
    span_guard = F.when(
        e - s <= F.lit(float(max_span_seconds)), e
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"range_join: interval span exceeds max_span_seconds="
                    f"{max_span_seconds}; widen the cap or pre-split: "
                ),
                F.col(start_col).cast("string"),
            )
        )
    )
    ib = intervals.where(e >= s).withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(s / F.lit(w)).cast("long"),
                F.floor(span_guard / F.lit(w)).cast("long"),
            )
        ),
    )
    pb = points.withColumn("_b", F.floor(p / F.lit(w)).cast("long"))
    cond = [pb["_b"] == ib["_b"]] + [pb[k] == ib[k] for k in on]
    joined = pb.join(ib, cond).where((p >= s) & (p <= e))
    return joined.select(
        *[pb[c] for c in points.columns],
        *[ib[c] for c in intervals.columns if c not in on],
    )


def scd2_build(
    snapshots: DataFrame,
    on: list[str],
    ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Collapse a per-key snapshot stream into a type-2 slowly-changing
    dimension: one row per (key, distinct consecutive attribute version)
    with ``valid_from`` = first snapshot carrying it and ``valid_to`` = the
    next version's ``valid_from`` (NULL on the current version — the
    half-open [valid_from, valid_to) convention, which composes with
    ``asof_join``/``range_join`` for point-in-time attribute lookup).

    Same-instant duplicate snapshots collapse deterministically to the
    lexicographic max attribute struct first (as in :func:`asof_join`).
    One per-key window pass; output size is O(#changes).
    """
    if not on or not attr_cols:
        raise ValueError("on and attr_cols must be non-empty")
    snap = (
        snapshots.groupBy(*on, F.col(ts_col).alias("valid_from"))
        .agg(F.max(F.struct(*[F.col(a) for a in attr_cols])).alias("_a"))
    )
    w = Window.partitionBy(*[F.col(k) for k in on]).orderBy("valid_from")
    changed = snap.withColumn("_prev", F.lag("_a").over(w)).where(
        F.col("_prev").isNull() | (F.col("_prev") != F.col("_a"))
    )
    w2 = Window.partitionBy(*[F.col(k) for k in on]).orderBy("valid_from")
    return (
        changed.withColumn("valid_to", F.lead("valid_from").over(w2))
        .select(
            *on,
            *[F.col(f"_a.{a}").alias(a) for a in attr_cols],
            "valid_from",
            "valid_to",
        )
    )


ALLEN_RELATIONS = [
    "precedes", "meets", "overlaps", "finished_by", "contains", "starts",
    "equals", "started_by", "during", "finishes", "overlapped_by", "met_by",
    "preceded_by",
]


def allen_classify(
    pairs: DataFrame,
    a_start: str = "a_start",
    a_end: str = "a_end",
    b_start: str = "b_start",
    b_end: str = "b_end",
    out_col: str = "allen",
) -> DataFrame:
    """Classify each interval pair by its Allen relation (Allen, CACM
    1983 — the 13 mutually-exclusive, jointly-exhaustive ways two
    intervals can relate). Temporal record linkage needs more than
    "do the validity windows overlap": CONTAINS is a snapshot inside a
    master record (merge candidate), MEETS/MET_BY is a clean succession
    (SCD2 handoff — see :func:`scd2_build`), OVERLAPS between two
    supposedly-authoritative records is a data-quality conflict, EQUALS
    is a duplicate. One CASE chain over boundary comparisons — row-local,
    engine-exact for timestamps and integers alike (intervals are
    treated as closed-start/closed-end with start ≤ end; degenerate
    instants participate normally — two equal instants are EQUALS, and
    where an instant makes several relations simultaneously true, which
    only happens for degenerate intervals, the earlier branch in the
    chain wins: equals, then meets/met_by, then the rest).

    The operator classifies an ALREADY-JOINED pair table; producing the
    pairs is the upstream join's job (equi-key + coarse time-bucket, the
    :func:`range_join` discipline, so no quadratic blowup happens here).
    """
    s1, e1 = F.col(a_start), F.col(a_end)
    s2, e2 = F.col(b_start), F.col(b_end)
    expr = (
        F.when(e1 < s2, F.lit("precedes"))
        .when(e2 < s1, F.lit("preceded_by"))
        .when((s1 == s2) & (e1 == e2), F.lit("equals"))
        .when(e1 == s2, F.lit("meets"))
        .when(e2 == s1, F.lit("met_by"))
        .when((s1 == s2) & (e1 < e2), F.lit("starts"))
        .when((s1 == s2) & (e1 > e2), F.lit("started_by"))
        .when((e1 == e2) & (s1 > s2), F.lit("finishes"))
        .when((e1 == e2) & (s1 < s2), F.lit("finished_by"))
        .when((s1 > s2) & (e1 < e2), F.lit("during"))
        .when((s1 < s2) & (e1 > e2), F.lit("contains"))
        .when((s1 < s2) & (e1 < e2), F.lit("overlaps"))
        .otherwise(F.lit("overlapped_by"))
    )
    return pairs.withColumn(out_col, expr)


def cdc_compact(
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Changelog compaction — the CDC MERGE every lakehouse ingest runs:
    a stream of keyed (I)nsert/(U)pdate/(D)elete operations reduces to
    the final table state by taking each key's HIGHEST-sequence
    operation and dropping the key entirely when that operation is a
    delete. This is the batch equivalent of ``MERGE INTO`` /
    Debezium-style snapshot reconstruction; treat an existing base table
    as inserts at sequence 0 and union it in.

    Contract: ``(key, seq)`` identifies one operation — CDC sources
    (binlog positions, Kafka offsets, commit LSNs) guarantee that, so
    the operator assumes rather than re-validates it; if duplicates
    sneak in, the deterministic tie-break (op descending: U > I > D,
    so a same-sequence delete LOSES to a same-sequence upsert — the
    conservative choice for data retention) keeps the result stable and
    parallelism-invariant anyway.

    One per-key window (score = (seq, op), bounded by the key's change
    count) and one filter — the same top-1 shape as
    :func:`latest snapshots <minimel_spark.operators.web.latest_snapshots>`,
    shuffling once on the key the table is usually already bucketed by.

    Output: the surviving rows (all input columns), one per live key.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc(seq_col), F.desc(op_col)
    )
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") == 1) & (F.col(op_col) != F.lit("D")))
        .drop("_rn")
    )
