"""Mention detection stage: paragraphs + anchor dictionary -> mentions
(SURVEY §2 M1, A2, M3).

Reference: minimel/mentions.py:16-60 and app/app.py:58-63. The automaton is
built once per executor from the broadcast anchor list (iterator-form pandas
UDF = the heavy-init executor-singleton pattern), scans lowercased text, and
emits (start, surface) spans; matching is leftmost-longest with word-boundary
filtering.

Scale notes: the default path is shuffle-free — scan + mapInPandas with the
anchor dictionary as one broadcast list (reference anchor dicts are ~10⁶
names ≈ tens of MB; fine). Beyond broadcast budget (wiki-scale dictionaries,
10⁷-10⁸ names), ``detect_mentions_chunked`` splits the DICTIONARY into
deterministic chunks and runs one bounded-memory scan pass per chunk — each
pass broadcasts only its chunk — emitting every longest-match-per-start span;
spans are then max-merged relationally and a final per-paragraph sweep
reproduces the single-automaton leftmost-longest consumption EXACTLY (the
union trie's longest match at position i is the max over chunks of each
chunk's longest match at i). Cost: C text passes + one span shuffle — the
price of an unbounded dictionary.
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


def detect_mentions(
    paragraphs: DataFrame,
    anchor_names: DataFrame,
    max_broadcast_names: int | None = None,
) -> DataFrame:
    """(url, par_id, .., text) x names(anchor) -> (url, par_id, start, surface).

    Matches run over ``text.lower()`` (reference count_name_lines,
    mentions.py:59), so surfaces come out lowercased like the dictionary.
    When ``max_broadcast_names`` is set and the dictionary exceeds it, the
    bounded-memory chunked path runs instead (contract-identical, see
    ``detect_mentions_chunked``).
    """
    spark = paragraphs.sparkSession
    names = [r["anchor"] for r in anchor_names.select("anchor").distinct().collect()]
    if max_broadcast_names is not None and len(names) > max_broadcast_names:
        n_chunks = -(-len(names) // max_broadcast_names)
        return detect_mentions_chunked(paragraphs, anchor_names, n_chunks)
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


_SPAN_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("par_id", T.IntegerType()),
    T.StructField("start", T.IntegerType()),
    T.StructField("end", T.IntegerType()),
])


def _scan_all_longest(paragraphs: DataFrame, chunk_names: list[str]) -> DataFrame:
    """One bounded pass: every (start, longest end) span this CHUNK's
    dictionary can produce, at every position (no consumption yet — the
    greedy jump must happen after merging across chunks)."""
    import re

    from ..functions.matcher import _trie_regex

    spark = paragraphs.sparkSession
    bc = spark.sparkContext.broadcast(chunk_names)

    def gen(batches):
        root: dict = {}
        for name in bc.value:
            if not name:
                continue
            node = root
            for ch in name:
                node = node.setdefault(ch, {})
            node[""] = True
        # lookahead wrapper: a zero-width match at EVERY position where some
        # chunk name starts; group(1) is the greedy (longest) match there
        look = re.compile("(?=(" + _trie_regex(root) + "))") if root else None
        for pdf in batches:
            url_o, pid_o, s_o, e_o = [], [], [], []
            if look is not None:
                for url, pid, text in zip(pdf["url"], pdf["par_id"], pdf["text"]):
                    low = text.lower()
                    for m in look.finditer(low):
                        if m.end(1) > m.start(1):
                            url_o.append(url)
                            pid_o.append(pid)
                            s_o.append(m.start(1))
                            e_o.append(m.end(1))
            yield pd.DataFrame(
                {"url": url_o, "par_id": pid_o, "start": s_o, "end": e_o}
            )

    return paragraphs.select("url", "par_id", "text").mapInPandas(gen, _SPAN_SCHEMA)


def detect_mentions_chunked(
    paragraphs: DataFrame, anchor_names: DataFrame, n_chunks: int
) -> DataFrame:
    """Contract-identical to ``detect_mentions`` for dictionaries beyond
    broadcast budget: deterministic name chunks (sorted, striped), one scan
    pass per chunk, relational max-merge of spans, then the exact greedy
    leftmost-longest sweep + word-boundary filter per paragraph."""
    names = sorted(r["anchor"] for r in anchor_names.select("anchor").distinct().collect())
    chunks = [names[i::n_chunks] for i in range(n_chunks)]
    spans = None
    for c in chunks:
        if not c:
            continue
        s = _scan_all_longest(paragraphs, c)
        spans = s if spans is None else spans.unionByName(s)
    if spans is None:
        return paragraphs.sparkSession.createDataFrame([], MENTION_SCHEMA)
    merged = (
        spans.groupBy("url", "par_id", "start")
        .agg(F.max("end").alias("end"))
        .groupBy("url", "par_id")
        .agg(F.collect_list(F.struct("start", "end")).alias("_spans"))
    )
    with_text = paragraphs.select("url", "par_id", "text").join(
        merged, ["url", "par_id"]
    )

    def sweep(batches):
        for pdf in batches:
            url_o, pid_o, s_o, surf_o = [], [], [], []
            for url, pid, text, sp in zip(
                pdf["url"], pdf["par_id"], pdf["text"], pdf["_spans"]
            ):
                low = text.lower()
                n = len(low)
                ends = {s["start"]: s["end"] for s in sp}
                i = 0
                while i < n:
                    e = ends.get(i)
                    if e is not None and e > i:
                        ok = not (i != 0 and low[i - 1].isalnum())
                        if ok and e != n and low[e].isalnum():
                            ok = False
                        if ok:
                            url_o.append(url)
                            pid_o.append(pid)
                            s_o.append(i)
                            surf_o.append(low[i:e])
                        i = e
                    else:
                        i += 1
            yield pd.DataFrame(
                {"url": url_o, "par_id": pid_o, "start": s_o, "surface": surf_o}
            )

    return with_text.mapInPandas(sweep, MENTION_SCHEMA)


def detect_mentions_ner(paragraphs: DataFrame, model: str = "en_core_web_sm") -> DataFrame:
    """M2 (reference mentions.py:28-31, 48-51): spacy NER entities as the
    alternative mention source — (start_char, ent.text) spans, same output
    schema as ``detect_mentions`` so everything downstream is source-agnostic.
    Gated behind the optional spacy dependency; the model loads once per
    executor task (iterator-form pandas UDF singleton)."""
    try:  # pragma: no cover - optional dependency
        import spacy  # type: ignore # noqa: F401
    except ImportError as e:
        raise ImportError(
            "detect_mentions_ner requires the optional spacy package "
            f"(and the {model!r} model); use detect_mentions for the "
            "gazetteer source"
        ) from e

    def gen(batches):  # pragma: no cover - needs spacy
        import spacy as sp

        nlp = sp.load(model)
        for pdf in batches:
            url_o, pid_o, start_o, surf_o = [], [], [], []
            for url, pid, text in zip(pdf["url"], pdf["par_id"], pdf["text"]):
                for e in nlp(text).ents:
                    url_o.append(url)
                    pid_o.append(pid)
                    start_o.append(e.start_char)
                    surf_o.append(e.text)
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
