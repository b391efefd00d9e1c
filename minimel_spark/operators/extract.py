"""Extraction stage: pages -> paragraph_links (SURVEY §2 P6-P9, J1).

Reference: minimel/get_paragraphs.py:57-97 (process_line / get_anchor_paragraphs).
The reference streams XML byte-ranges through per-partition trie lookups; here the
input is already a pages table ``(url, warc_ts, html, text, lang)`` and the
title->qid index is a broadcast dict consumed inside an Arrow-batched
``mapInPandas`` (the reference's per-partition IntDAWG load,
get_paragraphs.py:88-89, is exactly Spark's broadcast-variable pattern).

Why a broadcast dict and not a broadcast hash join: the link-extraction rule is
"look up each canonicalized wikilink title while parsing" (J1) — the lookup
happens *inside* the parse of each page, interleaved with the stateful self-link
enrichment sweep (P9), so the byte-identity contract requires the dict form.
The join-shaped variants (J2 etc.) stay relational joins downstream.

Scale notes:
- one input row per page; the UDF never sees partial pages, so output is invariant
  to partitioning (required for local[8] == local[32] equivalence);
- no shuffle in this stage at all: scan -> mapInPandas -> (optional) write;
- the title index is the only driver-side structure (a dimension, ~millions of
  entries at web scale — within broadcast budget; beyond that, switch to a
  left-semi pre-join marking linkable titles, keeping the UDF dict per-partition).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

from ..functions.wikitext import extract_page

PARAGRAPH_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("par_id", T.IntegerType()),
    T.StructField("links", T.MapType(T.StringType(), T.LongType())),
    T.StructField("text", T.StringType()),
])


def page_title(url_col):
    """Page-name surrogate from the url (the reference's ``pagetitle``):
    the last path segment, query string stripped."""
    return F.regexp_extract(url_col, r"([^/?]+)(?:\?[^/]*)?$", 1)


def extract_paragraphs(
    pages: DataFrame,
    title_index: DataFrame,
    skip: tuple[str, ...] = (),
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) -> (url, par_id, links, text
    [, carry_cols...]).

    ``title_index`` must be a small dimension DataFrame[title string, qid long];
    it is collected once and broadcast to executors. ``carry_cols`` are page
    columns replicated onto every output paragraph (e.g. ``warc_ts`` for
    event-time streaming aggregations) — carried through the UDF so the stage
    stays a single scan -> mapInPandas with no join back to pages.
    """
    spark = pages.sparkSession
    index = {r["title"]: int(r["qid"]) for r in title_index.collect()}
    bc = spark.sparkContext.broadcast(index)
    skip = tuple(skip)
    carry_cols = tuple(carry_cols)
    in_fields = {f.name: f for f in pages.schema.fields}
    schema = T.StructType(
        list(PARAGRAPH_SCHEMA.fields) + [in_fields[c] for c in carry_cols]
    )

    def gen(batches):
        idx = bc.value
        for pdf in batches:
            out = {"url": [], "par_id": [], "links": [], "text": []}
            carry = {c: [] for c in carry_cols}
            for row_i, (url, mwcode) in enumerate(zip(pdf["url"], pdf["text"])):
                name = url.rsplit("/", 1)[-1].split("?")[0]
                for i, (links, text) in enumerate(extract_page(name, mwcode, idx, skip)):
                    out["url"].append(url)
                    out["par_id"].append(i)
                    out["links"].append(links)
                    out["text"].append(text)
                    for c in carry_cols:
                        carry[c].append(pdf[c].iloc[row_i])
            out.update(carry)
            yield pd.DataFrame(out)

    cols = ["url", "text", *carry_cols]
    return pages.select(*cols).mapInPandas(gen, schema=schema)
