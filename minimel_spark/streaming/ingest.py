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
