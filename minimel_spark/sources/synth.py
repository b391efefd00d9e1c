"""Deterministic synthetic fixtures (FIXTURES.md F1/F2) — no external data.

Two generators:

- ``synth_title_index`` / ``synth_pages``: a fully synthetic Common-Crawl-style
  world with planted entity families, Zipfian anchor ambiguity (hot blocks for
  skew tests), byte-identity traps (``&nbsp;``, curly quotes, ``_(qualifier)``
  suffixes, pure-number anchors) and min_count boundary cases. Pages are generated
  DISTRIBUTED via ``mapInPandas`` over ``spark.range``; every page's content is a
  pure function of its page id (seeded ``random.Random(seed*page_id)``), so output
  is identical at any partition count — required for the local[8] vs local[32]
  equivalence check.

- ``pages_from_documents``: derives a pages table of the north-rule shape
  ``(url, warc_ts, html, text, lang)`` deterministically from the driver-provided
  ``documents.parquet`` testdata, wrapping vocabulary words in wikilink markup.
  Used by ``__spark_entry__`` so DuckDB oracles can recompute expected anchor
  statistics straight from ``documents`` with plain SQL.
"""

from __future__ import annotations

import datetime
import random

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

# --- fully synthetic world -------------------------------------------------

_SYLLABLES = [
    "ac", "bel", "cor", "dan", "el", "far", "gol", "hul", "in", "jor",
    "kel", "lum", "mar", "nor", "os", "pel", "quil", "ros", "sol", "tor",
]

# Byte-identity traps planted into some anchor surface forms
# (reference normalize semantics, minimel/normalize.py:6-20).
_TRAP_DECOR = [
    ("", ""),
    ("“", "”"),          # curly quotes -> BADCHARS, stripped
    ("", "&nbsp;"),       # html nbsp -> space, stripped
    ("", " (company)"),   # NOT stripped by normalize (only "_(" splits)
]

VARIANT_SUFFIXES = ["", " corp", " corporation", " co", " inc", " group"]


def base_name(b: int) -> str:
    """Deterministic pseudo-word for base-family ``b``."""
    s = _SYLLABLES[b % len(_SYLLABLES)] + _SYLLABLES[(b // len(_SYLLABLES)) % len(_SYLLABLES)]
    if b >= len(_SYLLABLES) ** 2:
        s += _SYLLABLES[b % 7]
    return s


def entity_qid(b: int, k: int) -> int:
    """qid for the k-th homonym entity of base family b."""
    return 100000 + b * 100 + k


def entity_title(b: int, k: int) -> str:
    """Wikipedia-style underscored title, unique per entity."""
    name = base_name(b).capitalize()
    return f"{name}_({k})" if k else name


def world(n_bases: int = 40, homonyms: int = 3, hot_base: int = 0, hot_homonyms: int = 12):
    """Enumerate (base, k, qid, title). Base ``hot_base`` is the planted skew
    family with ``hot_homonyms`` entities (a 'john smith' block)."""
    out = []
    for b in range(n_bases):
        h = hot_homonyms if b == hot_base else homonyms
        for k in range(h):
            out.append((b, k, entity_qid(b, k), entity_title(b, k)))
    return out


def synth_title_index(
    spark: SparkSession, n_bases: int = 40, homonyms: int = 3
) -> DataFrame:
    """F2 fixture: title -> qid dimension (reference D3, minimel/index.py:11-27)."""
    rows = [(t, q) for _, _, q, t in world(n_bases, homonyms)]
    return spark.createDataFrame(rows, schema="title string, qid long")


def _gen_page(pid: int, seed: int, n_bases: int, homonyms: int) -> tuple:
    rng = random.Random(seed * 1_000_003 + pid)
    ents = world(n_bases, homonyms)
    # page subject: cycle through entities so every entity has pages
    b, k, qid, title = ents[pid % len(ents)]
    name = base_name(b)
    paragraphs = []
    n_par = rng.randint(2, 5)
    for _ in range(n_par):
        words = []
        n_links = rng.randint(1, 4)
        for _ in range(n_links):
            # mostly link to own-family entities (ambiguity), sometimes others
            if rng.random() < 0.7:
                ob, ok = b, rng.randrange(homonyms if b else 12)
            else:
                o = ents[rng.randrange(len(ents))]
                ob, ok = o[0], o[1]
            surface = base_name(ob) + VARIANT_SUFFIXES[rng.randrange(len(VARIANT_SUFFIXES))]
            pre, post = _TRAP_DECOR[rng.randrange(len(_TRAP_DECOR))] if rng.random() < 0.15 else ("", "")
            ot = entity_title(ob, ok)
            words.append(f"[[{ot}|{pre}{surface}{post}]]")
            words.extend(rng.choice(_SYLLABLES) for _ in range(rng.randint(2, 6)))
        if rng.random() < 0.1:
            words.append("[[1984]]")  # pure-number anchor: normalize must drop it
        paragraphs.append(" ".join(words))
    if rng.random() < 0.2:
        paragraphs.insert(rng.randrange(len(paragraphs)), "{{infobox | junk=1}}")
    if rng.random() < 0.1:
        paragraphs.append("| table row junk")
    text = "\n\n".join(paragraphs)
    url = f"https://example.org/wiki/{title}?p={pid}"
    ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=pid % 86400)
    lang = ["en", "en", "en", "nl", "es"][pid % 5]
    return (url, ts, text.encode("utf-8"), text, lang)


_PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
])


def synth_pages(
    spark: SparkSession,
    n_pages: int = 2000,
    seed: int = 42,
    n_bases: int = 40,
    homonyms: int = 3,
    partitions: int | None = None,
) -> DataFrame:
    """F1 fixture: Common-Crawl-style pages table, generated distributed."""

    def gen(batches):
        for pdf in batches:
            rows = [_gen_page(int(pid), seed, n_bases, homonyms) for pid in pdf["id"]]
            yield pd.DataFrame(rows, columns=[f.name for f in _PAGES_SCHEMA.fields])

    rng = spark.range(n_pages, numPartitions=partitions)
    return rng.mapInPandas(gen, schema=_PAGES_SCHEMA)


# --- documents-derived pages (for DuckDB-oracle parity) ----------------------

DOC_PAGES_NOTE = """Construction contract used by the DuckDB oracles:
every whitespace word of documents.text whose length > 3 becomes a wikilink
[[<Capitalized word>_<qid>|<word>]] with qid = 2*rank + (doc_id % 3 == 0),
rank = dense alphabetical rank of the word within the document corpus vocabulary.
Words of length <= 3 stay plain text. One paragraph per document."""


def doc_vocab(docs: DataFrame, truncate: bool = True) -> DataFrame:
    """Vocabulary dimension: word -> base qid (dense alphabetical rank).

    The rank is computed as a two-level distributed sort (VERDICT r4 #6, same
    shape as ``byte_pack_buckets``): per-first-letter dense_rank plus a
    broadcast-joined cumulative-prefix-count offset — no global unpartitioned
    window, so fixture generation stays WARN-free while the rank keeps the
    exact dense-alphabetical semantics the DuckDB oracles recompute (binary
    string order is bytewise, so first-codepoint grouping preserves the
    global order). Fully lazy: the prefix cumsum is a broadcast triangle
    join over the ~|alphabet|-row prefix aggregate (off(p) = sum of counts
    of strictly-smaller prefixes — bounded |alphabet|^2 work on an already
    tiny frame, never a single-partition window or an eager
    plan-construction collect), so building the fixture plan costs no Spark
    jobs (ADVICE-shaped fix, r5 review).

    The result is handed back through a LAZY ``localCheckpoint``: the logical
    plan becomes a single LogicalRDD leaf immediately (still zero jobs at
    build time) and the vocab computes once on first use. Without this, every
    consumer inlines the explode+distinct+window+triangle-join subtree at its
    leaves, and the pipeline's self-joins (blocking, pair features, CC
    symmetrize) DOUBLE that subtree per level — the mega-block pipeline test
    hit ~100 MB task binaries whose deserialization alone took minutes
    (r5 fix: plan-size blowup, found via a hung pytest + jstack)."""
    from pyspark.sql import Window

    words = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .where(F.length("word") > 3)
        .distinct()
    )
    pref = F.substring(F.col("word"), 1, 1)
    counts = words.groupBy(pref.alias("_p")).agg(F.count(F.lit(1)).alias("_n"))
    lower = counts.select(F.col("_p").alias("_q"), F.col("_n").alias("_m"))
    offsets = (
        counts.join(F.broadcast(lower), F.col("_q") < F.col("_p"), "left")
        .groupBy("_p")
        .agg(F.coalesce(F.sum("_m"), F.lit(0)).cast("long").alias("_off"))
    )
    w = Window.partitionBy("_p").orderBy("word")
    ranked = (
        words.withColumn("_p", pref)
        .join(F.broadcast(offsets), "_p")
        .withColumn("base_qid", (F.dense_rank().over(w) + F.col("_off")).cast("long"))
        .drop("_p", "_off")
    )
    # truncate=False exposes the raw plan (used by the plan-shape pytest,
    # which asserts no SinglePartition exchange INSIDE the vocab computation
    # — the outer LogicalRDD leaf would hide it)
    return ranked.localCheckpoint(eager=False) if truncate else ranked


def pages_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic pages table from the driver's documents.parquet (see
    DOC_PAGES_NOTE). Pure Spark built-ins, no UDF: the markup is assembled with
    transform/concat over the word array, so Catalyst keeps it whole-stage.

    The input scan is spread across the session's cores first: the explode +
    markup assembly and everything downstream until the first shuffle
    (including the paragraph-parse UDF) otherwise inherit the small file's
    single split."""
    from ..operators.util import ensure_min_parallelism

    docs = ensure_min_parallelism(docs, "doc_id")
    vocab = doc_vocab(docs)
    toks = docs.select(
        "doc_id",
        "lang",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "word"),
    )
    linked = (
        toks.join(F.broadcast(vocab), "word", "left")
        .withColumn(
            "qid",
            F.col("base_qid") * 2 + (F.col("doc_id") % 3 == 0).cast("long"),
        )
        .withColumn(
            "out",
            F.when(
                F.col("base_qid").isNotNull(),
                F.concat(
                    F.lit("[["),
                    F.initcap("word"),
                    F.lit("_"),
                    F.col("qid").cast("string"),
                    F.lit("|"),
                    F.col("word"),
                    F.lit("]]"),
                ),
            ).otherwise(F.col("word")),
        )
    )
    pages = (
        linked.groupBy("doc_id", "lang")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "out"))).alias("toks"))
        .select(
            F.concat(F.lit("https://example.org/doc/"), F.col("doc_id")).alias("url"),
            F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
            F.encode(F.concat_ws(" ", F.transform("toks", lambda t: t["out"])), "utf-8").alias("html"),
            F.concat_ws(" ", F.transform("toks", lambda t: t["out"])).alias("text"),
            F.col("lang"),
        )
    )
    return pages


SNAPSHOT_PAGES_NOTE = """Construction contract for the crawl-snapshot fixture
(web_* gates): every documents.parquet row spawns up to two crawl snapshots
(s in {0, 1}) of one logical page, with md5-derived noise so URL
canonicalization has real work to do. Per doc: u = md5-60('w:' || doc_id)
(page-stable), v = md5-60(doc_id || ':s' || s) (snapshot-level noise).
host = 'h' || (u % 37) || '.example.org'; raw url =
scheme(v%2: http/https) :// [www. if v%3=0] host [default port if v%5=0]
/doc/<doc_id> [trailing / if v%7=0] ? query(v%2 picks param order +
utm_/ref tracking params) [#sec<v%4> if v%11=0]. All snapshots of a doc
canonicalize to 'h<u%37>.example.org/doc/<doc_id>?id=<doc_id>'. Presence:
s=0 exists unless u%11=0 ('added' in the diff), s=1 unless u%13=0
('removed'). warc_ts = DATE 2024-01-01 + (u%28 + s*45) days (s=1 strictly
newer). text: s=0 verbatim; s=1 appends ' updated' when u%4=0 ('changed').
Every branch is md5 arithmetic + string concat, so DuckDB rebuilds the raw
URLs bit-for-bit and the oracles canonicalize them independently."""


def snapshot_pages(docs: DataFrame) -> DataFrame:
    """(doc_id, snapshot, url, warc_ts, text, lang) per SNAPSHOT_PAGES_NOTE —
    a deterministic multi-snapshot crawl slice of the north-rule page shape.
    Pure built-in expressions (md5/conv/concat/date_add), no UDF; input scan
    spread across cores like pages_from_documents."""
    from ..operators.util import ensure_min_parallelism, md5_long60

    docs = ensure_min_parallelism(docs, "doc_id")
    u = md5_long60(F.concat(F.lit("w:"), F.col("doc_id")))
    rows = (
        docs.withColumn("_u", u)
        .select(
            "doc_id", "text", "lang", "_u",
            F.explode(F.array(F.lit(0), F.lit(1))).alias("snapshot"),
        )
        .where(
            ((F.col("snapshot") == 0) & (F.col("_u") % 11 != 0))
            | ((F.col("snapshot") == 1) & (F.col("_u") % 13 != 0))
        )
    )
    v = md5_long60(F.concat(F.col("doc_id"), F.lit(":s"), F.col("snapshot")))
    rows = rows.withColumn("_v", v)
    scheme = F.when(F.col("_v") % 2 == 0, F.lit("http")).otherwise(F.lit("https"))
    www = F.when(F.col("_v") % 3 == 0, F.lit("www.")).otherwise(F.lit(""))
    host = F.concat(F.lit("h"), (F.col("_u") % 37), F.lit(".example.org"))
    port = F.when(
        F.col("_v") % 5 == 0,
        F.when(F.col("_v") % 2 == 0, F.lit(":80")).otherwise(F.lit(":443")),
    ).otherwise(F.lit(""))
    path = F.concat(
        F.lit("/doc/"),
        F.col("doc_id"),
        F.when(F.col("_v") % 7 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    query = F.when(
        F.col("_v") % 2 == 0,
        F.concat(F.lit("?id="), F.col("doc_id"), F.lit("&utm_source=feed")),
    ).otherwise(
        F.concat(F.lit("?utm_campaign=x&ref=rss&id="), F.col("doc_id"))
    )
    frag = F.when(
        F.col("_v") % 11 == 0, F.concat(F.lit("#sec"), (F.col("_v") % 4))
    ).otherwise(F.lit(""))
    return rows.select(
        "doc_id",
        F.col("snapshot").cast("long").alias("snapshot"),
        F.concat(scheme, F.lit("://"), www, host, port, path, query, frag).alias("url"),
        F.to_timestamp(
            F.date_add(
                F.lit("2024-01-01").cast("date"),
                ((F.col("_u") % 28) + F.col("snapshot") * 45).cast("int"),
            )
        ).alias("warc_ts"),
        F.when(
            (F.col("snapshot") == 1) & (F.col("_u") % 4 == 0),
            F.concat(F.col("text"), F.lit(" updated")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
        "lang",
    )


STRICT_WORLD_NOTE = """Construction contract for the STRICT clean() oracle
(er_clean_strict): anchors and candidate titles DIVERGE so the
entropy/countratio/tokenscore filters actually fire (on the plain
documents-derived world tokenscore=1 by construction and they provably never
do). counts: every word occurrence (length > 3) contributes to
(anchor=word, qid = base_qid*8 + doc_id%8) — up to 8 near-uniform candidates
per anchor, so entropy can exceed 1. titles: one per (word, d in 0..7) with
qid = base_qid*8 + d; the title word is ROT13-scrambled when
length(word) % 2 == 0 (shares no char-3gram with the anchor), verbatim
otherwise — so tokenscore is 1 for odd-length anchors and ~0 for even-length
ones. Additionally, every doc_id % 5 == 0 plants a rare anchor 'qq<doc_id>'
with three candidates (cnt 1,1,2; qids 10M+doc_id*4+{0,1,2}, no titles):
freqnorm weights come out (1,1,3), so entropy = 0.950 <= 1 and
countratio = 0.6 > 0.5 with tokenscore 0 — the countratio branch of the
bad-name rule, unreachable on the frequent vocabulary, fires on these.
Every step is plain SQL, so DuckDB recomputes the full
ambiguity -> freqnorm-weight -> entropy/countratio/tokenscore -> rank chain."""

_ROT13 = "translate(word, 'abcdefghijklmnopqrstuvwxyz', 'nopqrstuvwxyzabcdefghijklm')"


def strict_clean_world(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(counts, title_index) per STRICT_WORLD_NOTE — the adversarial fixture
    for the non-degenerate clean() gate (reference minimel/clean.py:130-262)."""
    vocab = doc_vocab(docs)
    words = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    ).where(F.length("word") > 3)
    counts = (
        words.join(F.broadcast(vocab), "word")
        .select(
            F.col("word").alias("anchor"),
            (F.col("base_qid") * 8 + F.col("doc_id") % 8).cast("long").alias("qid"),
        )
        .groupBy("anchor", "qid")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    planted = (
        docs.where(F.col("doc_id") % 5 == 0)
        .select(
            F.concat(F.lit("qq"), F.col("doc_id").cast("string")).alias("anchor"),
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(2))).alias("d"),
        )
        .select(
            "anchor",
            (F.lit(10_000_000) + F.col("doc_id") * 4 + F.col("d"))
            .cast("long")
            .alias("qid"),
            F.when(F.col("d") == 2, F.lit(2)).otherwise(F.lit(1))
            .cast("long")
            .alias("cnt"),
        )
    )
    counts = counts.unionByName(planted)
    titles = (
        vocab.select(
            "word", "base_qid", F.explode(F.sequence(F.lit(0), F.lit(7))).alias("d")
        )
        .withColumn(
            "tw",
            F.when(F.length("word") % 2 == 0, F.expr(_ROT13)).otherwise(
                F.col("word")
            ),
        )
        .select(
            F.concat(
                F.initcap("tw"),
                F.lit("_"),
                (F.col("base_qid") * 8 + F.col("d")).cast("string"),
            ).alias("title"),
            (F.col("base_qid") * 8 + F.col("d")).cast("long").alias("qid"),
        )
    )
    return counts, titles


VARIANT_WORLD_NOTE = """Construction contract for the matcher-proving gate
(er_matcher_planted): a surface-form-VARIANT-rich corpus where the LR matcher
has real work to do (the documents world has no variants, so its weak labels
are degenerate and LBFGS converges at iteration 0). Per entity i in
0..n_entities-1 (qid = 1000+i):

- base word w_i: 8 pseudo-random letters (digits of (i*2654435761) % 1e8
  mapped 0-9 -> a-j) + a unique 3-letter suffix from i — 11 letters, unique
  across entities, pure SQL expressions (no UDF, partition-invariant);
- four surface variants: v0 = w; v1 = w||'inc' (alias suffix); v2 = w minus
  its 3rd char (typo/deletion); v3 = w with chars 5,6 swapped
  (transposition). Edits never touch the last-3-char suffix, so no variant
  ever collides ACROSS entities;
- per (variant, copy c in 0..copies-1) one page linking [[<Initcap(w)>_<qid>|v]]
  followed by the entity's 4 context words (all 'z'-prefixed, unique per
  entity -> cos_bow is high within an entity, ~0 across);
- per variant one extra page linking the shared decoy title [[Zzdecoy_9999|v]]
  (same context) so every anchor has TWO candidate qids — surviving clean()'s
  ambiguity filter — with argmax = the true entity (cnt copies vs 1), which is
  what makes the pipeline's weak labels discriminative: same-argmax pairs
  (within entity) are positives, cross-entity blocked pairs negatives.

Records per entity = 4*copies + 4 pages, one mention each. Full recovery =
one cluster per entity containing exactly its 4*(copies+1) records — true only
if the trained matcher separates variant pairs from cross-entity pairs, so the
gate FAILS under a constant scorer (all-high merges entities via LSH-blocked
cross pairs; all-low splits every record)."""

_L = "'abcdefghij'"


def _letters(col: str, width: int) -> str:
    """SQL: digits of <col> lpad'ed to <width>, mapped 0-9 -> a-j."""
    return f"translate(lpad(({col})::string, {width}, '0'), '0123456789', {_L})"


def variant_world(
    spark: SparkSession, n_entities: int = 40, copies: int = 2
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(pages, title_index, variant_dim) per VARIANT_WORLD_NOTE.

    variant_dim = (name, entity_id) distinct — the gold mapping used by the
    gate to score recovery (names are unique across entities by construction).
    """
    base = spark.range(n_entities).select(
        F.col("id").alias("i"),
        F.expr(
            f"{_letters('id * 2654435761 % 100000000', 8)} || {_letters('id', 3)}"
        ).alias("w"),
        F.expr(
            " || ' ' || ".join(
                f"('z' || {_letters(f'(id * 31 + {j}) * 2654435761 % 1000000', 6)})"
                for j in range(4)
            )
        ).alias("ctx"),
    )
    variants = base.select(
        "i",
        "w",
        "ctx",
        F.posexplode(
            F.array(
                F.col("w"),
                F.concat(F.col("w"), F.lit("inc")),
                F.concat(F.expr("substring(w, 1, 2)"), F.expr("substring(w, 4)")),
                F.expr(
                    "substring(w, 1, 4) || substring(w, 6, 1) || "
                    "substring(w, 5, 1) || substring(w, 7)"
                ),
            )
        ).alias("k", "name"),
    )
    title = F.concat(F.initcap("w"), F.lit("_"), (F.col("i") + 1000).cast("string"))
    entity_pages = variants.select(
        "i", "k", "name", "ctx", title.alias("t"),
        F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("c"),
    ).select(
        F.concat(
            F.lit("https://synth.local/e"), F.col("i").cast("string"),
            F.lit("/v"), F.col("k").cast("string"),
            F.lit("/c"), F.col("c").cast("string"),
        ).alias("url"),
        F.concat(F.lit("[["), F.col("t"), F.lit("|"), F.col("name"), F.lit("]] "),
                 F.col("ctx")).alias("text"),
        "i",
    )
    decoy_pages = variants.select(
        F.concat(
            F.lit("https://synth.local/e"), F.col("i").cast("string"),
            F.lit("/v"), F.col("k").cast("string"), F.lit("/d"),
        ).alias("url"),
        F.concat(F.lit("[[Zzdecoy_9999|"), F.col("name"), F.lit("]] "),
                 F.col("ctx")).alias("text"),
        "i",
    )
    pages = (
        entity_pages.unionByName(decoy_pages)
        .select(
            "url",
            F.to_timestamp(F.lit("2024-06-01 00:00:00")).alias("warc_ts"),
            F.encode("text", "utf-8").alias("html"),
            "text",
            F.lit("en").alias("lang"),
        )
    )
    title_index = base.select(
        title.alias("title"), (F.col("i") + 1000).cast("long").alias("qid")
    ).unionByName(
        spark.range(1).select(
            F.lit("Zzdecoy_9999").alias("title"), F.lit(9999).cast("long").alias("qid")
        )
    )
    variant_dim = variants.select(
        "name", F.col("i").cast("long").alias("entity_id")
    ).distinct()
    return pages, title_index, variant_dim


def doc_title_index(docs: DataFrame) -> DataFrame:
    """title -> qid index matching pages_from_documents' link titles."""
    vocab = doc_vocab(docs)
    both = vocab.select(
        F.explode(
            F.array(
                F.struct((F.col("base_qid") * 2).alias("qid")),
                F.struct((F.col("base_qid") * 2 + 1).alias("qid")),
            )
        ).alias("s"),
        "word",
    )
    return both.select(
        F.concat(F.initcap("word"), F.lit("_"), F.col("s.qid").cast("string")).alias("title"),
        F.col("s.qid").alias("qid"),
    )


def lined_pages(docs: DataFrame) -> DataFrame:
    """(doc_id, domain, text) with MULTI-LINE text — the line-structured
    crawl fixture for boilerplate-removal operators. Deterministic pure
    expressions over the documents table (replayed bit-for-bit by the
    DuckDB oracles):

    - ``domain`` = doc_id % 25 (25 synthetic hosts);
    - line 1: a corpus-wide nav bar (identical on every page);
    - line 2: a per-domain banner (identical across the domain's docs);
    - body: the document's words re-wrapped 8 per line;
    - last line: a per-domain copyright footer.

    The nav/banner/footer lines are exactly what line-level dedup
    (CCNet-style) must strip; the body lines are document content it must
    keep (near-duplicate docs share body lines — whether those cross a
    doc-frequency threshold is the operator's call, not the fixture's).
    """
    from ..operators.util import ensure_min_parallelism

    docs = ensure_min_parallelism(docs, "doc_id")
    domain = (F.col("doc_id") % 25).cast("long")
    words = F.split(F.col("text"), " ")
    n_body = F.greatest(
        F.ceil(F.size(words) / F.lit(8.0)).cast("int"), F.lit(1)
    )
    body = F.transform(
        F.sequence(F.lit(0), n_body - 1),
        lambda i: F.array_join(F.slice(words, i * 8 + 1, 8), " "),
    )
    lines = F.concat(
        F.array(
            F.lit("Home | About | Contact"),
            F.concat(F.lit("Site news — domain "), domain),
        ),
        body,
        F.array(
            F.concat(
                F.lit("(c) 2024 example"), domain, F.lit(".org — all rights reserved")
            )
        ),
    )
    return docs.select(
        "doc_id",
        domain.alias("domain"),
        F.array_join(lines, "\n").alias("text"),
    )
