"""P11: disambiguation pages -> (title, qid) dimension (SURVEY §2 P11).

Reference: minimel/get_disambig.py:65-111 — walks each disambiguation page's
parsed wikitext taking the wikilinks of list items (nodes after ``li`` tags),
resolves them against the title DAWG, and emits (page, qid) rows that
clean()'s disambiguation boost consumes. Round 1 only accepted a PRE-BUILT
disambig dimension; this operator builds it from raw pages, so a user with
wikitext disambiguation dumps gets the reference behavior end to end.

Plan shape: one scan -> mapInPandas (the parser is the same from-scratch
wikitext module extraction uses; the title index is the same broadcast dict,
with the documented joined-path alternative in operators/extract.py when it
outgrows broadcast budget). Output feeds ``clean(..., disambig=...)``.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame

from ..functions.wikitext import canonical_title, get_list_links

DISAMBIG_SCHEMA = T.StructType([
    T.StructField("title", T.StringType()),
    T.StructField("qid", T.LongType()),
])


def disambig_from_pages(
    pages: DataFrame,
    title_index: DataFrame,
    disambig_template: str | None = None,
) -> DataFrame:
    """pages(url, .., text) -> (title, qid): one row per resolvable list link
    per disambiguation page; ``title`` is the disambiguation PAGE's name (the
    reference keys its output by page), ``qid`` the linked entity."""
    spark = pages.sparkSession
    index = {r["title"]: int(r["qid"]) for r in title_index.collect()}
    bc = spark.sparkContext.broadcast(index)

    def gen(batches):
        idx = bc.value
        for pdf in batches:
            t_o, q_o = [], []
            for url, mwcode in zip(pdf["url"], pdf["text"]):
                page = url.rsplit("/", 1)[-1].split("?")[0]
                for t in get_list_links(mwcode, disambig_template):
                    c = canonical_title(t)
                    if c is not None and c in idx:
                        t_o.append(page)
                        q_o.append(idx[c])
            yield pd.DataFrame({"title": t_o, "qid": q_o})

    return pages.select("url", "text").mapInPandas(gen, DISAMBIG_SCHEMA)
