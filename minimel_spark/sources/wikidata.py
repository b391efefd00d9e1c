"""Disambiguation/list-page source (SURVEY §2 S7; data shape D5).

Reference: minimel/get_disambig.py:19-62 issues a SPARQL query to the Wikidata
endpoint for pages that are instances of disambiguation/list classes, then
dumps the QID list to JSON. In the graft the external HTTP dependency is
replaced by (a) a deterministic fixture, or (b) a pre-landed parquet/JSON
table — a live endpoint call is gated behind an import-try so the engine has
no hard network/requests dependency.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

# The reference's SPARQL (get_disambig.py:40-48) selects items that are
# instance-of (P31) Q4167410 (disambiguation page) or Q13406463 (list page),
# optionally restricted to those with a sitelink in the target language.
DISAMBIG_CLASSES = (4167410, 13406463)


def disambig_from_table(spark: SparkSession, path: str) -> DataFrame:
    """(title, qid) disambiguation dimension from a landed parquet table."""
    return spark.read.parquet(path).select("title", F.col("qid").cast("long"))


def disambig_fixture(spark: SparkSession, rows: list[tuple[str, int]]) -> DataFrame:
    """Deterministic in-memory fixture (tests / sandbox)."""
    return spark.createDataFrame(rows, schema="title string, qid long")


def query_disambig_pages(
    spark: SparkSession, langcode: str, endpoint: str = "https://query.wikidata.org/sparql"
) -> DataFrame:
    """Live SPARQL fetch -> (title, qid). Driver-side HTTP (the result is a
    dimension table); requires ``requests`` at call time."""
    try:
        import requests  # noqa: F401
    except ImportError as e:  # pragma: no cover - sandbox has no requests use
        raise ImportError(
            "query_disambig_pages needs the 'requests' package; in offline "
            "environments use disambig_from_table/disambig_fixture instead"
        ) from e
    values = " ".join(f"wd:Q{q}" for q in DISAMBIG_CLASSES)
    query = (
        "SELECT ?page ?item WHERE { VALUES ?cls { " + values + " } "
        "?item wdt:P31 ?cls . "
        f'?page schema:about ?item ; schema:isPartOf <https://{langcode}.wikipedia.org/> .'
        "}"
    )
    resp = requests.get(  # pragma: no cover
        endpoint, params={"query": query, "format": "json"}, timeout=120
    )
    resp.raise_for_status()  # pragma: no cover
    rows = [  # pragma: no cover
        (
            b["page"]["value"].rsplit("/", 1)[-1],
            int(b["item"]["value"].rsplit("/Q", 1)[-1]),
        )
        for b in resp.json()["results"]["bindings"]
    ]
    return spark.createDataFrame(rows, schema="title string, qid long")  # pragma: no cover
