"""Reference-compatible TSV sources/sinks (SURVEY §2 S3, S8, K1, K6; data
shapes D2, D11, D12).

A user of the reference has corpora in its line formats; these readers land
them as proper DataFrames so every operator here runs on them unchanged:

- D2 paragraph-links TSV: ``pagetitle \\t {"anchor": qid, ...} \\t text``
  (written by minimel/get_paragraphs.py:96,127-129).
- D11 run/eval TSV with ARITY SNIFFING (minimel/run.py:256-279): 1 column =
  text, 2 = (id, text), 3 = (id, gold-json, text) — detected from the first
  line, exactly like the reference's peek.
- D12 predictions TSV sink (minimel/run.py:291-300).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession


def read_paragraph_links_tsv(spark: SparkSession, path: str) -> DataFrame:
    """D2: TSV -> (url, par_id, links map<string,long>, text). The reference
    keys rows by pagetitle; we surface it as the url column (and par_id by
    line position within the title group is not recoverable from TSV — the
    reference never uses it downstream of this format either, so 0)."""
    raw = spark.read.option("sep", "\t").csv(
        path, schema="page string, links_json string, text string"
    )
    return raw.select(
        F.col("page").alias("url"),
        F.lit(0).alias("par_id"),
        F.from_json("links_json", T.MapType(T.StringType(), T.LongType())).alias("links"),
        "text",
    )


def sniff_run_tsv_arity(spark: SparkSession, path: str) -> int:
    """S8 peek: number of tab-separated columns on the first line."""
    first = spark.read.text(path).limit(1).collect()
    if not first:
        return 1
    return first[0]["value"].count("\t") + 1


def read_run_tsv(spark: SparkSession, path: str) -> DataFrame:
    """S8/D11: -> (doc_id, gold map<string,long> | null, text), arity-sniffed.

    1 col: text only (doc_id = stable row hash of the text);
    2 cols: (doc_id, text); 3 cols: (doc_id, gold-json, text).
    """
    arity = sniff_run_tsv_arity(spark, path)
    gold_t = T.MapType(T.StringType(), T.LongType())
    if arity == 1:
        raw = spark.read.option("sep", "\t").csv(path, schema="text string")
        return raw.select(
            F.xxhash64("text").cast("string").alias("doc_id"),
            F.lit(None).cast(gold_t).alias("gold"),
            "text",
        )
    if arity == 2:
        raw = spark.read.option("sep", "\t").csv(path, schema="doc_id string, text string")
        return raw.select("doc_id", F.lit(None).cast(gold_t).alias("gold"), "text")
    raw = spark.read.option("sep", "\t").csv(
        path, schema="doc_id string, gold_json string, text string"
    )
    return raw.select("doc_id", F.from_json("gold_json", gold_t).alias("gold"), "text")


def write_predictions_tsv(
    preds: DataFrame, path: str, all_doc_ids: DataFrame | None = None
) -> None:
    """K6/D12: (doc_id, name, pred_qid) -> TSV lines
    ``doc_id \\t {"name": qid, ...}`` (one row per doc, like run.py:291-300).

    Written with the TEXT writer, not the CSV writer: Spark's CSV sink quotes
    and backslash-escapes the JSON field (``"{\\"a\\":1}"``), which breaks any
    reference-format consumer doing ``json.loads(line.split('\\t')[1])``.

    ``all_doc_ids`` (any DataFrame with a doc_id column) pins the reference's
    one-line-per-input contract (run.py:291-300 emits ``id\\t{}`` even when
    nothing resolved): docs absent from ``preds`` get an empty-dict line, so
    line counts equal input counts and coverage math stays honest."""
    rows = preds.groupBy("doc_id").agg(
        F.to_json(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("name", "pred_qid")))
            )
        ).alias("pred_json")
    )
    if all_doc_ids is not None:
        rows = (
            all_doc_ids.select("doc_id")
            .distinct()
            .join(rows, "doc_id", "left")
            .withColumn("pred_json", F.coalesce("pred_json", F.lit("{}")))
        )
    rows.select(
        F.concat_ws("\t", "doc_id", "pred_json").alias("value")
    ).write.mode("overwrite").text(path)
