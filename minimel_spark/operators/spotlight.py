"""L5: external DBpedia-Spotlight baseline client (reference
evaluation/run_spotlight.py:16-77).

The reference script boots the Spotlight Java REST jar as a subprocess and
POSTs one annotation-XML document at a time from the driver. Re-expressed as
a distributed operator: the endpoint is caller-provided (the Java service —
or a pool of them behind a load balancer at scale — is infrastructure, not
engine code), each executor task POSTs its Arrow batch's documents and maps
the returned DBpedia resource URIs to qids through the broadcast title index,
exactly like the reference's IntDAWG lookup. Plain-stdlib HTTP (urllib), so
nothing is gated; per-document timeouts degrade to empty predictions the way
the reference's ReadTimeout handler does (run_spotlight.py:75-77).
"""

from __future__ import annotations

import html
import json
import re
import urllib.parse
import urllib.request

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame

_URI_RE = re.compile(r"http://.*dbpedia\.org/resource/")

SPOTLIGHT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("name", T.StringType()),
    T.StructField("pred_qid", T.LongType()),
])


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


def spotlight_predict(
    docs: DataFrame,
    endpoint: str,
    title_index: DataFrame,
    doc_id_col: str = "doc_id",
    names_col: str = "names",
    text_col: str = "text",
    timeout: float = 5.0,
) -> DataFrame:
    """(doc_id, names array<string>, text) -> (doc_id, name, pred_qid): the
    external baseline's predictions, one row per resolved surface form.
    ``title_index`` maps DBpedia resource names (title) -> qid."""
    spark = docs.sparkSession
    index = {r["title"]: int(r["qid"]) for r in title_index.collect()}
    bc = spark.sparkContext.broadcast(index)

    def gen(batches):
        idx = bc.value
        for pdf in batches:
            d_o, n_o, q_o = [], [], []
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
                    uri = rec.get("@URI", "")
                    sf = rec.get("@surfaceForm", "")
                    qid = idx.get(_URI_RE.sub("", uri))
                    if qid is not None:
                        d_o.append(doc_id)
                        n_o.append(sf)
                        q_o.append(qid)
            yield pd.DataFrame({"doc_id": d_o, "name": n_o, "pred_qid": q_o})

    return docs.select(doc_id_col, names_col, text_col).mapInPandas(
        gen, SPOTLIGHT_SCHEMA
    )
