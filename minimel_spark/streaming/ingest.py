"""Structured Streaming ingest for the pages table.

The reference is batch-only (SURVEY §2.10: no streaming operators exist in
minimEL; resumability there is file-checkpoint based, reimplemented in
sources/checkpoint.py). This module is the engine's forward-looking ingest
path for the same data model: a Common-Crawl-style crawl lands page files
continuously, and the anchor statistics / mention volumes update incrementally
instead of re-scanning the corpus.

Design:
- the SAME extraction + normalization operators run on the stream —
  ``extract_paragraphs``'s mapInPandas and the anchor explode are
  streaming-compatible by construction (stateless per page);
- aggregations are streaming state: ``stream_anchor_counts`` in update mode,
  ``windowed_mention_volume`` with an event-time watermark on ``warc_ts`` so
  late crawl records are folded in up to the allowed lateness and state is
  evicted after it;
- checkpointLocation gives exactly-once sink semantics — the streaming twin of
  the batch Checkpointer's committed stages.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.count import explode_anchors
from ..operators.extract import extract_paragraphs

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def stream_pages(
    spark: SparkSession, path: str, max_files_per_trigger: int = 16
) -> DataFrame:
    """File-source stream over a directory of pages parquet files. New files
    = new crawl batches; maxFilesPerTrigger bounds per-micro-batch work."""
    return (
        spark.readStream.schema(PAGES_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_anchor_counts(
    pages: DataFrame, title_index: DataFrame, language: str | None = None
) -> DataFrame:
    """Streaming twin of operators.count.anchor_counts: incremental
    (anchor, qid) counts over arriving pages. Use outputMode('update') —
    counts are monotone state, no watermark needed (keys are the anchor
    dictionary, bounded). NOTE: as an unwatermarked aggregation this stream
    cannot go to a parquet sink in append mode; ``run_to_sink`` routes
    update/complete modes through a foreachBatch snapshot writer instead."""
    pars = extract_paragraphs(pages, title_index)
    return (
        explode_anchors(pars, language)
        .groupBy("anchor", "qid")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def windowed_mention_volume(
    pages: DataFrame,
    title_index: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    language: str | None = None,
) -> DataFrame:
    """Event-time windowed anchor volume with late-data handling: counts per
    (warc_ts window, anchor), watermarked so state for closed windows is
    dropped after ``watermark`` of event time."""
    from ..functions.udfs import normalize_lang_udf

    pars = extract_paragraphs(pages, title_index, carry_cols=("warc_ts",))
    norm = normalize_lang_udf(language).asNondeterministic()
    anchors = (
        pars.select("warc_ts", F.explode("links").alias("anchor_raw", "qid"))
        .withColumn("anchor", norm("anchor_raw"))
        .where(F.col("anchor").isNotNull())
    )
    return (
        anchors.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "anchor")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "anchor",
            "cnt",
        )
    )


EVENTS_DDL = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def stream_events(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """File-source stream over events parquet. ``glob`` narrows the listing
    (e.g. ``events.parquet`` when the directory holds many tables)."""
    reader = spark.readStream.schema(EVENTS_DDL)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.parquet(path)


def stream_hourly_event_stats(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch hourly rollup (rel_hourly_events): counts
    and value sums per (hour, event_type). Run in complete mode — drained with
    availableNow the final state equals the batch aggregation exactly, which
    is what the stream_hourly_events gate pins against the DuckDB oracle."""
    return (
        events.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


SESSION_OUT_DDL = (
    "user_id long, session_idx long, n_events long, session_start_rel_us long"
)
_SESSION_STATE_DDL = (
    "last_us long, session_idx long, n_events long, "
    "session_start_us long, first_us long"
)


def stream_sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """O7's streaming twin as a CUSTOM STATEFUL operator
    (``applyInPandasWithState``): per-user session assignment with a
    ``gap_minutes`` inactivity cut, continuously updated as micro-batches
    arrive. State per user = (last event time, open session index/stats,
    first-ever event time); each batch emits the final stats of every session
    it CLOSED plus the running stats of the still-open one (update mode —
    downstream keeps the latest row per (user_id, session_idx)).

    Semantics match the batch sessionize window query exactly when each
    user's events arrive time-ordered ACROSS micro-batches (the log-rotation
    pattern: files cut by time range); within a batch any order is fine (the
    operator sorts). tests pin stream==batch on a 3-file, one-file-per-trigger
    drain.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs, state):
        (user_id,) = key
        if state.exists:
            last_us, sidx, n_ev, sess_start, first_us = state.get
        else:
            last_us, sidx, n_ev, sess_start, first_us = None, 0, 0, None, None
        ev = pd.concat(list(pdfs))
        ev = ev.sort_values(["us", "event_id"])
        out = []
        for us in ev["us"]:
            us = int(us)
            if first_us is None:
                first_us = us
            if last_us is None or us - last_us > gap_us:
                if sess_start is not None:
                    # previous session just closed: emit its final stats
                    out.append((user_id, sidx, n_ev, sess_start - first_us))
                sidx += 1
                n_ev = 1
                sess_start = us
            else:
                n_ev += 1
            last_us = us
        state.update((int(last_us), int(sidx), int(n_ev), int(sess_start), int(first_us)))
        out.append((user_id, sidx, n_ev, sess_start - first_us))
        yield pd.DataFrame(
            out,
            columns=["user_id", "session_idx", "n_events", "session_start_rel_us"],
        )

    import pyspark.sql.functions as F  # noqa: F811 (local alias for clarity)

    with_us = events.withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    ).select("user_id", "event_id", "us")
    return with_us.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUT_DDL,
        stateStructType=_SESSION_STATE_DDL,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_sink(
    stream: DataFrame,
    checkpoint_dir: str,
    out_path: str | None = None,
    output_mode: str = "update",
    available_now: bool = True,
    query_name: str = "minimel_stream",
):
    """Start the query; ``available_now`` drains all currently-available files
    then stops — the batch-like backfill trigger.

    Sink routing honors ``output_mode``:
    - ``out_path`` + ``append``: direct parquet sink (stateless streams, or
      watermarked aggregates whose windows finalize).
    - ``out_path`` + ``update``/``complete``: unwatermarked aggregates (e.g.
      ``stream_anchor_counts``) cannot use the parquet sink directly (Spark
      raises at query start), so each micro-batch snapshot is written via
      ``foreachBatch`` with mode=overwrite — the committed parquet is always
      the latest full/updated state.
    - no ``out_path``: in-memory table ``query_name`` for tests.
    """
    writer = stream.writeStream.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    if out_path:
        if output_mode == "append":
            return writer.outputMode("append").format("parquet").option(
                "path", out_path
            ).start()

        def _snapshot(batch_df: DataFrame, _batch_id: int) -> None:
            batch_df.write.mode("overwrite").parquet(out_path)

        return writer.outputMode(output_mode).foreachBatch(_snapshot).start()
    return writer.outputMode(output_mode).format("memory").queryName(
        query_name
    ).start()


def stream_latest_snapshot(
    pages: DataFrame, url_col: str = "url", ts_col: str = "warc_ts"
) -> DataFrame:
    """Streaming newest-version-wins crawl dedup — the unbounded-ingest twin
    of ``operators/web.latest_snapshots``: as crawl batches arrive, keep one
    row per canonical URL carrying the latest snapshot's payload (ties
    broken by the raw URL, so the winner is total-ordered across
    micro-batches too). Same ONE-hash-aggregation shape as the batch
    operator, running as a stateful streaming agg: each micro-batch merges
    its per-key max_by struct into state, so re-crawled URLs replace their
    state row instead of appending.

    State holds one struct per canonical URL — inherent for newest-wins
    (every key may be re-crawled later), same unbounded-state contract as
    ``stream_anchor_counts``; update/complete output mode with the
    foreachBatch snapshot sink (``run_to_sink``), the committed parquet is
    always the current deduped corpus.

    DELEGATES to the batch operator: ``latest_snapshots`` is a pure
    groupBy/agg/select, which Structured Streaming runs as a stateful agg on
    a streaming input unchanged — one definition, so the stream==batch gate
    contract (same DuckDB oracle) can never silently diverge (r5 review)."""
    from ..operators.web import latest_snapshots

    return latest_snapshots(pages, url_col=url_col, ts_col=ts_col)


def stream_incremental_minhash(
    docs_stream: DataFrame,
    state_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_family: str = "xx64",
    available_now: bool = True,
):
    """Streaming near-dup dedup for a GROWING corpus: each arriving crawl
    batch is deduped (a) within itself via ``minhash_dups`` and (b) against
    everything previously ingested via ``incremental_minhash_dups`` over the
    accumulated LSH index, then its own index rows and shingle sets are
    appended to the state. The state is two append-only parquet tables under
    ``state_dir`` (``index/`` — the per-(doc, band) LSH rows; ``docs/`` —
    (id, shingles) for the exact verify), committed by foreachBatch in
    micro-batch order, so a restart resumes from the streaming checkpoint
    with the state it had committed.

    INVARIANT (the gate pins it): the union of per-batch pair outputs equals
    the whole-corpus batch ``minhash_dups`` run, no matter how the stream is
    split into micro-batches — within-batch pairs come from (a), cross-batch
    pairs from (b), and no pair is produced twice because (b) only pairs the
    new batch against STRICTLY EARLIER documents.

    Scale: per micro-batch cost is O(batch + matched buckets) — the corpus
    is never rescanned (the verify reads only the matched docs' shingle rows
    from the state); the state grows by ~``bands`` skinny rows per ingested
    doc. Returns the started StreamingQuery.
    """
    from ..operators.dedup import (
        _shingled,
        incremental_minhash_dups,
        minhash_dups,
        minhash_index,
    )

    def _step(batch_df: DataFrame, batch_id: int) -> None:
        # Every write lands in a batch=<id> subdirectory with mode=overwrite:
        # foreachBatch is at-least-once, so a crash-replayed batch OVERWRITES
        # its own previous (possibly partial) output instead of appending a
        # second copy — this, not the write order, is what makes the
        # pairs/state commits idempotent (r5 review). Readers see the union
        # of batch dirs via partition discovery.
        from pyspark.errors import AnalysisException

        spark = batch_df.sparkSession
        shingled = _shingled(batch_df, text_col, id_col, n).persist()
        try:
            within = minhash_dups(
                batch_df, threshold, n, num_hashes, bands, text_col, id_col,
                hash_family, shingled=shingled,
            ).select(
                F.col("id_a").alias("id_new"),
                F.col("id_b").alias("id_old"),
                "jaccard",
            )
            try:
                index = spark.read.parquet(f"{state_dir}/index")
                seen = spark.read.parquet(f"{state_dir}/docs")
            except AnalysisException:
                # ONLY path-not-found-shaped analysis errors mean "first
                # batch"; transient FS/read failures propagate and fail the
                # batch so the checkpoint retries it instead of silently
                # skipping cross-batch dedup (r5 review)
                index, seen = None, None
            if index is not None:
                # the state's (id, shingles) rows ARE the corpus for the
                # verify join — corpus text is never needed after ingest
                cross = incremental_minhash_dups(
                    batch_df, index, seen, threshold, n, num_hashes, bands,
                    text_col, id_col, hash_family, pre_shingled=True,
                    shingled=shingled,
                )
                pairs = within.unionByName(cross)
            else:
                pairs = within
            pairs.write.mode("overwrite").parquet(f"{pairs_dir}/batch={batch_id}")
            shingled.select(id_col, "shingles").write.mode("overwrite").parquet(
                f"{state_dir}/docs/batch={batch_id}"
            )
            minhash_index(
                batch_df, n, num_hashes, bands, text_col, id_col, hash_family,
                shingled=shingled,
            ).write.mode("overwrite").parquet(f"{state_dir}/index/batch={batch_id}")
        finally:
            shingled.unpersist()

    writer = docs_stream.writeStream.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.outputMode("update").foreachBatch(_step).start()


def stream_incremental_components(
    edges_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Continuous cluster maintenance: every arriving edge micro-batch is
    folded into the persisted membership with
    ``operators.cluster.incremental_components`` — untouched components are
    carried over by its anti-join passthrough, only components touched by a
    new edge re-enter the iterative loop. The streaming twin of the
    cc_incremental gate, for the crawl that never stops.

    State = one full membership snapshot per micro-batch under
    ``state_dir/v=<batch_id>`` (membership changes WHOLESALE when
    components merge, so snapshots, not appends). Each step reads the
    newest COMMITTED snapshot with version < batch_id — so an
    at-least-once replay of batch k recomputes from the same predecessor
    state and overwrites its own v=k output, making the commit idempotent;
    a snapshot counts as committed only once its _SUCCESS marker exists.
    Returns the started StreamingQuery; read ``state_dir/v=<max>`` after
    the drain for the final membership.
    """
    import os

    from ..operators.cluster import connected_components, incremental_components

    def _latest_before(batch_id: int) -> str | None:
        if not os.path.isdir(state_dir):
            return None
        best = None
        for d in os.listdir(state_dir):
            if not d.startswith("v="):
                continue
            v = int(d.split("=", 1)[1])
            if v < batch_id and os.path.exists(
                os.path.join(state_dir, d, "_SUCCESS")
            ):
                best = v if best is None or v > best else best
        return None if best is None else os.path.join(state_dir, f"v={best}")

    def _step(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        edges = batch_df.select("src", "dst")
        prev_path = _latest_before(batch_id)
        if prev_path is None:
            new = connected_components(edges)
        else:
            new = incremental_components(spark.read.parquet(prev_path), edges)
        new.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"v={batch_id}")
        )

    writer = edges_stream.writeStream.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.outputMode("update").foreachBatch(_step).start()


def latest_membership(spark: SparkSession, state_dir: str) -> DataFrame:
    """Newest committed membership snapshot written by
    ``stream_incremental_components``."""
    import os

    vs = [
        int(d.split("=", 1)[1])
        for d in os.listdir(state_dir)
        if d.startswith("v=")
        and os.path.exists(os.path.join(state_dir, d, "_SUCCESS"))
    ]
    if not vs:
        raise FileNotFoundError(f"no committed membership under {state_dir}")
    return spark.read.parquet(os.path.join(state_dir, f"v={max(vs)}"))


def stream_exact_dedup(
    events: DataFrame, key_cols: tuple = ("event_id",), delay: str = "2 hours"
) -> DataFrame:
    """Streaming exact dedup — the unbounded-ingest twin of the batch dedup
    family (`operators/dedup.py` exact_dups): drop records whose key was
    already seen, keeping per-key state only until the watermark passes the
    key's event time + ``delay`` (``dropDuplicatesWithinWatermark``), so
    state is bounded by the lateness budget instead of the corpus size — a
    plain streaming ``dropDuplicates`` would hold every key ever seen.

    A record arriving after its duplicate's state was evicted is itself
    below the watermark and dropped as late, so each key still emits at most
    once; the trade is that a LEGITIMATE record delayed past ``delay`` is
    dropped too — size the watermark to the ingest pipeline's real lateness.
    Append-mode compatible: rows emit as they arrive (no window to finalize),
    so this goes straight to a parquet sink.

    Watermarks require a zoned TIMESTAMP; the parquet ``ts`` is
    TIMESTAMP_NTZ, so it is cast first (stable: the session timezone is
    pinned UTC in `minimel_spark.session`).
    """
    return (
        events.withColumn("_wm_ts", F.col("ts").cast("timestamp"))
        .withWatermark("_wm_ts", delay)
        .dropDuplicatesWithinWatermark(list(key_cols))
        .drop("_wm_ts")
    )


def stream_asof_enrich(
    facts_stream: DataFrame,
    snapshots: DataFrame,
    on: list,
    value_cols: list,
    out_dir: str,
    checkpoint_dir: str,
    fact_ts: str = "ts",
    snap_ts: str = "ts",
    tolerance_seconds: float | None = None,
    available_now: bool = True,
):
    """Streaming point-in-time enrichment: each arriving micro-batch of
    facts is as-of joined (`operators/temporal.py asof_join`) against a
    STATIC, already-compacted snapshot dimension — the production shape
    where the dim is a published table (feature store, SCD2 dimension) and
    the facts are the unbounded side. Because each fact's match depends
    only on the dim, the result is batch-split invariant: the union of
    per-batch outputs equals one batch run over all facts (the gate pins
    this against the same DuckDB ASOF JOIN oracle as `rel_asof_join`).

    Crash-replay idempotent via the repo's batch=<id> overwrite convention:
    a replayed micro-batch rewrites its own partition, never duplicates.

    Scale: per-batch cost is O(|batch| + |compacted dim|) — the dim's
    per-(key, ts) dedupe re-runs per batch, so pre-compact (or persist) a
    large dim before passing it here; for a dim that itself updates,
    re-plan per epoch or move the state into applyInPandasWithState.
    Returns the started StreamingQuery.
    """
    from ..operators.temporal import asof_join

    def _enrich(batch_df: DataFrame, batch_id: int) -> None:
        out = asof_join(
            batch_df,
            snapshots,
            on,
            value_cols,
            fact_ts=fact_ts,
            snap_ts=snap_ts,
            tolerance_seconds=tolerance_seconds,
        )
        out.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    writer = facts_stream.writeStream.foreachBatch(_enrich).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_interval_join(
    left_stream: DataFrame,
    right_stream: DataFrame,
    key: str,
    within_seconds: int,
    delay: str = "40 days",
    left_ts: str = "ts",
    right_ts: str = "ts",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """True STREAM-STREAM inner join with an event-time interval condition —
    the attribution shape (click→purchase, impression→conversion): a right
    event matches a left event with the same ``key`` when it lands inside
    ``[left_ts, left_ts + within_seconds]``. Both sides are unbounded, so
    Spark buffers each in join state; the time bound in the condition PLUS
    the two watermarks let it evict state once the other side's watermark
    passes the last instant a match could still arrive — the state bound is
    the watermark ``delay`` + ``within_seconds``, independent of stream
    length. Inner join emits in append mode, so the result goes straight
    to a parquet sink.

    ``delay`` is the lateness budget: events later than it are dropped and
    buffered partners evicted, trading completeness for bounded state —
    size it to real pipeline lateness (the gate sizes it past its replay's
    whole time range, making the drained output provably equal to the
    batch join, which is what the DuckDB oracle pins). Output columns are
    the key plus both sides' columns under ``left_prefix``/``right_prefix``
    and ``lag_seconds`` (right minus left event time).

    Scale: stream-stream join state shuffles on ``key`` exactly like the
    batch equi join; skewed keys behave like any skewed shuffle join (salt
    upstream if one key dominates). Watermarks require zoned timestamps —
    TIMESTAMP_NTZ inputs are cast (session tz pinned UTC).
    """
    lt, rt = left_prefix + "ts", right_prefix + "ts"
    left = left_stream.select(
        F.col(key).alias("_lk"),
        F.col(left_ts).cast("timestamp").alias(lt),
        *[
            F.col(c).alias(left_prefix + c)
            for c in left_stream.columns
            if c not in (key, left_ts)
        ],
    ).withWatermark(lt, delay)
    right = right_stream.select(
        F.col(key).alias("_rk"),
        F.col(right_ts).cast("timestamp").alias(rt),
        *[
            F.col(c).alias(right_prefix + c)
            for c in right_stream.columns
            if c not in (key, right_ts)
        ],
    ).withWatermark(rt, delay)
    cond = (
        (F.col("_lk") == F.col("_rk"))
        & (F.col(rt) >= F.col(lt))
        & (F.col(rt) <= F.col(lt) + F.expr(f"INTERVAL {int(within_seconds)} SECOND"))
    )
    carried = [
        left_prefix + c for c in left_stream.columns if c not in (key, left_ts)
    ] + [right_prefix + c for c in right_stream.columns if c not in (key, right_ts)]
    return (
        left.join(right, cond, "inner")
        .withColumn(
            "lag_seconds",
            (F.unix_micros(F.col(rt)) - F.unix_micros(F.col(lt))) / 1_000_000.0,
        )
        .select(F.col("_lk").alias(key), lt, rt, "lag_seconds", *carried)
    )


def stream_hourly_user_counts(events: DataFrame) -> DataFrame:
    """Streaming per-(hour, user) event counters — the state a windowed
    heavy-hitter report reads: complete-mode counts per hour bucket and
    user, maintained incrementally across micro-batches. Pure streaming
    aggregation (no window functions, which Structured Streaming forbids
    mid-stream); the top-k SELECTION runs on the drained snapshot via
    :func:`topk_per_hour` — maintain cheap additive state in the stream,
    rank at read time."""
    return events.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "hour"
        ),
        "user_id",
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))


def topk_per_hour(snapshot: DataFrame, k: int = 3) -> DataFrame:
    """Heavy hitters per hour over a drained counter snapshot: rank by
    (count desc, user_id asc) — a total order, so the report is
    deterministic — and keep the top ``k``. Output: (hour, rank,
    user_id, n)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    w = Window.partitionBy("hour").orderBy(F.desc("n"), F.asc("user_id"))
    return (
        snapshot.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("hour", F.col("rank").cast("long").alias("rank"), "user_id", "n")
    )
