"""Mention detection stage: paragraphs + anchor dictionary -> mentions
(SURVEY §2 M1, A2, M3).

Reference: minimel/mentions.py:16-60 and app/app.py:58-63. The automaton is
built once per executor from the broadcast anchor list (iterator-form pandas
UDF = the heavy-init executor-singleton pattern), scans lowercased text, and
emits (start, surface) spans; matching is leftmost-longest with word-boundary
filtering.

Scale notes: no shuffle — scan + mapInPandas. The anchor dictionary is a
broadcast list (reference anchor dicts are ~10⁶ names ≈ tens of MB; fine).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

from ..functions.matcher import build_matcher

MENTION_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("par_id", T.IntegerType()),
    T.StructField("start", T.IntegerType()),
    T.StructField("surface", T.StringType()),
])


def detect_mentions(paragraphs: DataFrame, anchor_names: DataFrame) -> DataFrame:
    """(url, par_id, .., text) x names(anchor) -> (url, par_id, start, surface).

    Matches run over ``text.lower()`` (reference count_name_lines,
    mentions.py:59), so surfaces come out lowercased like the dictionary.
    """
    spark = paragraphs.sparkSession
    names = [r["anchor"] for r in anchor_names.select("anchor").distinct().collect()]
    bc = spark.sparkContext.broadcast(names)

    def gen(batches):
        matcher = build_matcher(bc.value)  # once per task
        for pdf in batches:
            url_o, pid_o, start_o, surf_o = [], [], [], []
            for url, pid, text in zip(pdf["url"], pdf["par_id"], pdf["text"]):
                for start, surface in matcher.find_matches(text.lower()):
                    url_o.append(url)
                    pid_o.append(pid)
                    start_o.append(start)
                    surf_o.append(surface)
            yield pd.DataFrame(
                {"url": url_o, "par_id": pid_o, "start": start_o, "surface": surf_o}
            )

    return paragraphs.select("url", "par_id", "text").mapInPandas(gen, MENTION_SCHEMA)


def count_names(paragraphs: DataFrame, anchor_names: DataFrame) -> DataFrame:
    """A2 (minimel/mentions.py:54-60, 91-98): global occurrence counts of
    dictionary names in paragraph text. Catalyst plans the partial+final agg;
    no hand-rolled per-partition Counter needed."""
    return (
        detect_mentions(paragraphs, anchor_names)
        .groupBy(F.col("surface").alias("name"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def nil_mentions(mentions: DataFrame, paragraph_links: DataFrame) -> DataFrame:
    """M3 (minimel/vectorize.py:71-78,124-138): dictionary matches NOT covered by
    a gold link on the same paragraph — the NIL negatives. The reference scans a
    CompletionDAWG per token; the relational form is a left_anti join on
    (url, par_id, surface-in-links)."""
    gold = paragraph_links.select(
        "url", "par_id", F.explode(F.map_keys("links")).alias("gold_name")
    ).withColumn("gold_name", F.lower("gold_name"))
    return mentions.join(
        gold.withColumnRenamed("gold_name", "surface"),
        ["url", "par_id", "surface"],
        "left_anti",
    )
