"""Text-analysis operators over the documents table: token counting, quality
scoring, language-ID, fingerprinting. Everything that ANSI SQL can express is
built-in Spark expressions (JVM, whole-stage codegen, DuckDB-oracle-checkable);
only language-ID and the rolling fingerprint are pandas UDFs.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

from ..functions.textstats import detect_lang, rolling_fingerprint
from .util import ensure_min_parallelism

# BPE-ish word/number/punct segmentation (GPT-2-style coarse classes).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace and BPE-ish token counts + char count (all built-ins)."""
    return docs.select(
        id_col,
        F.length(text_col).alias("n_chars"),
        F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0)).alias("bpe_tokens"),
    )


def quality_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: tuple[str, ...] = ("the", "a", "of", "and", "to", "in", "is"),
) -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio / mean-word-length quality
    features with a composite score in [0,1] (all built-in expressions)."""
    words = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w)))
    n_punct = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[^\w\s]"), 0))
    df = docs.select(
        id_col,
        F.length(text_col).alias("n_chars"),
        n_words.alias("n_words"),
        (n_stop / F.greatest(n_words, F.lit(1))).alias("stopword_ratio"),
        (n_punct / F.greatest(F.length(text_col), F.lit(1))).alias("punct_ratio"),
        (
            (F.length(text_col) - F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"\s"), 0)))
            / F.greatest(n_words, F.lit(1))
        ).alias("mean_word_len"),
    )
    # composite: favor some stopwords, low punctuation, sane word lengths
    return df.withColumn(
        "quality",
        F.round(
            F.least(F.col("stopword_ratio") * 4, F.lit(1.0)) * 0.4
            + (1 - F.least(F.col("punct_ratio") * 5, F.lit(1.0))) * 0.3
            + F.when((F.col("mean_word_len") >= 3) & (F.col("mean_word_len") <= 10), 0.3).otherwise(0.0),
            6,
        ),
    )


_LANG_SCHEMA = T.StructType([
    T.StructField("lang_pred", T.StringType()),
    T.StructField("lang_conf", T.DoubleType()),
])


@F.pandas_udf(_LANG_SCHEMA)
def detect_lang_udf(texts: pd.Series) -> pd.DataFrame:
    rows = [detect_lang(t) for t in texts]
    return pd.DataFrame(rows, columns=["lang_pred", "lang_conf"])


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    docs = ensure_min_parallelism(docs, id_col)
    out = docs.select(id_col, detect_lang_udf(F.col(text_col)).alias("_l"))
    return out.select(id_col, "_l.lang_pred", "_l.lang_conf")


@F.pandas_udf(T.LongType())
def fingerprint_udf(texts: pd.Series) -> pd.Series:
    return pd.Series([rolling_fingerprint(t) for t in texts])


def fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    docs = ensure_min_parallelism(docs, id_col)
    return docs.select(id_col, fingerprint_udf(F.col(text_col)).alias("fingerprint"))


def script_profile(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Character-class/script profile per document — the routing gate
    BEFORE language ID: n-gram language models (functions/textstats.py
    language_id) assume the text is mostly alphabetic in one script, so
    a web pipeline first measures what the bytes actually are — a page
    that is 60% digits is a table dump, 40% 'other' is binary spill or
    emoji soup, Cyrillic-dominant text must not enter a Latin-trained
    classifier. Counts per class (latin, cyrillic, digit, whitespace,
    other) are computed as length deltas under class-targeted
    ``regexp_replace`` — pure JVM, no UDF, exact, and byte-identical in
    the SQL oracle (both engines count CODEPOINTS via unicode-aware
    length()).

    The dominant script is the argmax over (latin, cyrillic, digit):
    cyrillic or digit win only when STRICTLY greater than both rivals,
    every tie resolves to 'latin', and 'none' means all three are zero —
    a fixed precedence, so the label is engine-exact.

    Output: ``(id_col, n_chars, n_latin, n_cyrillic, n_digit, n_space,
    n_other, dominant)``.
    """
    t = F.col(text_col)
    total = F.length(t)

    def n_of(pattern):
        return total - F.length(F.regexp_replace(t, pattern, ""))

    lat = n_of("[A-Za-z]")
    cyr = n_of("[Ѐ-ӿ]")
    dig = n_of("[0-9]")
    spc = n_of(r"\s")
    dominant = (
        F.when((lat == 0) & (cyr == 0) & (dig == 0), F.lit("none"))
        .when((cyr > lat) & (cyr > dig), F.lit("cyrillic"))
        .when((dig > lat) & (dig > cyr), F.lit("digit"))
        .otherwise(F.lit("latin"))
    )
    return docs.select(
        F.col(id_col),
        total.cast("long").alias("n_chars"),
        lat.cast("long").alias("n_latin"),
        cyr.cast("long").alias("n_cyrillic"),
        dig.cast("long").alias("n_digit"),
        spc.cast("long").alias("n_space"),
        (total - lat - cyr - dig - spc).cast("long").alias("n_other"),
        dominant.alias("dominant"),
    )


# RAKE stopword list — deliberately SMALL and embedded verbatim in the DuckDB
# oracle (the abbreviation-table convention): phrase boundaries must be a
# shared literal, not a library lookup.
RAKE_STOPWORDS = [
    "a", "an", "and", "are", "as", "at", "be", "been", "but", "by", "for",
    "from", "he", "i", "in", "is", "it", "not", "of", "on", "or", "she",
    "so", "that", "the", "they", "this", "to", "was", "we", "were", "with",
    "you",
]


def rake_keywords(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 3,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """RAKE keyword extraction (Rose, Engel, Cramer & Cowley 2010): candidate
    phrases are the maximal token runs containing neither a stopword nor a
    phrase delimiter (any non-alphanumeric, non-whitespace character run —
    punctuation ends a phrase in RAKE, whitespace only separates words); each
    word scores deg/freq over the whole corpus (deg = Σ length of the
    phrases it appears in, freq = its occurrence count — both exact
    integers); a phrase scores the sum of its words' scores; the top
    ``top_n`` distinct phrases per document come back. The zero-model
    keyphrase baseline a curation pipeline runs before anything learned —
    and the per-document summary strings ER blocking can key on.

    Determinism across engines (the ranking hazard is FLOAT SUM ORDER):
    word scores are single integer/integer divides (bit-identical), and the
    phrase sum is a LEFT FOLD over the phrase's scores in word-position
    order — collect_list(struct(pos, score)) → array_sort → F.aggregate,
    the fold_cosine contract — so DuckDB's list_reduce over the same sorted
    list reproduces every phrase score bit-for-bit and the (score desc,
    phrase asc) rank cannot flip on an ulp.

    Scale: phrase segmentation is narrow JVM array work (mark stopwords →
    join → split on the marker run); word stats are one map-side-combinable
    groupBy over phrase-word occurrences; the scored join is words-sized;
    the only windows are per-document top-n. No Python anywhere.

    Output: ``(id_col, rank, phrase, score)``, rank 1-based per document.
    """
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    sw = RAKE_STOPWORDS if stopwords is None else stopwords
    sw_arr = F.array(*[F.lit(w) for w in sw])
    # punctuation runs become explicit "|" boundary tokens BEFORE the
    # whitespace split (splitting on [^a-z0-9]+ directly would silently eat
    # the phrase boundary: "red car! red car" must be two phrases)
    cleaned = F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]+", " | ")
    toks = F.split(cleaned, r"\s+")
    marked = F.transform(
        toks,
        lambda t: F.when(
            (t == "") | F.array_contains(sw_arr, t), F.lit("|")
        ).otherwise(t),
    )
    phrases = F.split(F.concat_ws(" ", marked), r"(\s*\|\s*)+")
    ph = (
        docs.select(F.col(id_col).alias("_id"), phrases.alias("_phs"))
        .select("_id", F.posexplode("_phs").alias("_pidx", "phrase"))
        .where(F.col("phrase") != "")
    )
    pw = ph.select(
        "_id",
        "_pidx",
        "phrase",
        F.size(F.split(F.col("phrase"), " ")).alias("_plen"),
        F.posexplode(F.split(F.col("phrase"), " ")).alias("_wpos", "word"),
    )
    stats = pw.groupBy("word").agg(
        F.count(F.lit(1)).alias("_freq"),
        F.sum("_plen").alias("_deg"),
    )
    scored_words = pw.join(stats, "word").select(
        "_id",
        "_pidx",
        "phrase",
        "_wpos",
        (F.col("_deg") / F.col("_freq")).alias("_ws"),
    )
    phrase_scores = (
        scored_words.groupBy("_id", "_pidx", "phrase")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_wpos").alias("p"), F.col("_ws").alias("s")))
            ).alias("_arr")
        )
        .select(
            "_id",
            "phrase",
            F.aggregate(
                F.transform("_arr", lambda x: x["s"]),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("score"),
        )
        .groupBy("_id", "phrase")
        .agg(F.max("score").alias("score"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("_id").orderBy(F.desc("score"), F.asc("phrase"))
    return (
        phrase_scores.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_n)
        .select(
            F.col("_id").alias(id_col),
            F.col("rank").cast("long").alias("rank"),
            "phrase",
            "score",
        )
    )


def _md5_60(col) -> "F.Column":
    """60-bit md5-derived hash (first 15 hex chars) — non-negative in a
    signed long and bit-for-bit reproducible in ANSI SQL as
    ('0x' || substr(md5(x), 1, 15))::UBIGINT (the simhash/minhash oracle
    convention). JVM-side: md5 + conv are codegen expressions."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def char_winnow_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """CHARACTER-level winnowing fingerprints (Schleimer, Wilkerson &
    Aiken, SIGMOD 2003 — the MOSS local fingerprinting algorithm), the
    paper-exact variant with positions and the rightmost-min tie rule;
    the WORD-level, position-free sibling used for passage overlap lives
    in operators/dedup.py (``winnow_fingerprints``) — char granularity
    survives word-boundary edits (despacing, hyphenation, OCR noise)
    that break word k-grams. Normalize the
    text to its [a-z0-9] skeleton, hash every char k-gram, slide a window
    of ``w`` consecutive k-gram hashes, and in each window select the
    minimum hash (ties to the RIGHTMOST occurrence, the paper's rule).
    The selected (position, hash) pairs, deduplicated, are the document's
    fingerprints — with the paper's guarantee that any shared substring of
    at least w + k - 1 normalized characters yields a shared fingerprint,
    while storing only ~2/(w+1) of all k-gram hashes. Documents with fewer
    than ``w`` k-grams contribute their single global minimum (the one
    partial window ending at the last k-gram).

    Determinism across engines: the hash is the md5-derived 60-bit value
    (exact in DuckDB), and the window argmin compares (hash, -pos) structs
    — a total order, so selection is identical at any parallelism.

    Scale: k-gram expansion is a narrow JVM transform+posexplode (~len
    rows per doc); the only shuffle is the per-document window, which
    parallelizes across documents and is bounded by the longest document
    — the per-doc-bounded cost model of every text gate here.

    Output: distinct ``(id_col, pos, fp)`` — pos is the 1-based k-gram
    position of the selected hash in the normalized text.
    """
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k}, w={w}")
    norm = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "")
    base = (
        docs.select(F.col(id_col).alias("_id"), norm.alias("_s"))
        .withColumn("_nk", (F.length("_s") - k + 1).cast("long"))
        .where(F.col("_nk") >= 1)
    )
    kg = base.select(
        "_id",
        "_nk",
        F.posexplode(
            F.expr(f"transform(sequence(1, _nk), i -> substring(_s, i, {int(k)}))")
        ).alias("_i0", "_kg"),
    ).select(
        "_id",
        "_nk",
        (F.col("_i0") + 1).alias("_pos"),
        _md5_60(F.col("_kg")).alias("_h"),
    )
    from pyspark.sql import Window

    wspec = Window.partitionBy("_id").orderBy("_pos").rowsBetween(-(w - 1), 0)
    return (
        kg.withColumn(
            "_m",
            F.min(F.struct(F.col("_h"), (-F.col("_pos")).alias("_np"))).over(wspec),
        )
        .where(F.col("_pos") >= F.least(F.lit(w), F.col("_nk")))
        .select(
            F.col("_id").alias(id_col),
            (-F.col("_m._np")).cast("long").alias("pos"),
            F.col("_m._h").alias("fp"),
        )
        .distinct()
    )


def char_winnow_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    max_df: int | None = None,
) -> DataFrame:
    """Near-duplicate / plagiarism candidate pairs from shared winnowing
    fingerprints — the MOSS pairing step: two documents pair iff they
    share at least one selected fingerprint HASH, scored by how many
    distinct hashes they share and the Jaccard of their fingerprint sets.

    ``max_df`` drops fingerprints selected by more than ``max_df``
    documents BEFORE any pair forms (the stop-shingle guard every
    shared-key pair generator here uses — boilerplate k-grams sit in
    thousands of web documents and would otherwise quadratic the join);
    per-document fingerprint counts are taken over the SURVIVING space, so
    ``similarity`` stays a true Jaccard of the pruned sets and the whole
    operator remains deterministic and oracle-recomputable.

    Output: ``(doc_id_a, doc_id_b, n_shared, n_a, n_b, similarity)`` with
    doc_id_a < doc_id_b.
    """
    fp = char_winnow_fingerprints(docs, text_col=text_col, id_col=id_col, k=k, w=w)
    dfp = fp.select(F.col(id_col).alias("_d"), "fp").distinct()
    if max_df is not None:
        dfc = dfp.groupBy("fp").agg(F.count(F.lit(1)).alias("_df"))
        dfp = dfp.join(dfc.where(F.col("_df") <= max_df), "fp").drop("_df")
    sizes = dfp.groupBy("_d").agg(F.count(F.lit(1)).alias("_n"))
    a = dfp.select(F.col("_d").alias("doc_id_a"), "fp")
    b = dfp.select(F.col("_d").alias("doc_id_b"), "fp")
    pairs = (
        a.join(b, "fp")
        .where(F.col("doc_id_a") < F.col("doc_id_b"))
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        pairs.join(
            sizes.select(F.col("_d").alias("doc_id_a"), F.col("_n").alias("n_a")),
            "doc_id_a",
        )
        .join(
            sizes.select(F.col("_d").alias("doc_id_b"), F.col("_n").alias("n_b")),
            "doc_id_b",
        )
        .select(
            "doc_id_a",
            "doc_id_b",
            "n_shared",
            "n_a",
            "n_b",
            (
                F.col("n_shared")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
            ).alias("similarity"),
        )
    )


def textrank_keywords(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 3,
    top_n: int = 5,
    n_iter: int = 10,
    damping: float = 0.85,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004): per
    document, vertices are the distinct non-stopword tokens, an undirected
    unweighted edge links two words that co-occur within ``window``
    positions of the FILTERED token sequence, and words are scored by
    ``n_iter`` fixed rounds of PageRank on that graph:

        s'(v) = (1 - d) + d * Σ_{u ∈ N(v)} s(u) / deg(u),   s_0 = 1

    (the paper's formulation — note (1-d), not (1-d)/N). The graph-based
    counterpart to :func:`rake_keywords`: RAKE scores phrases by degree
    statistics in one pass, TextRank lets support propagate, surfacing
    words central to the document's co-occurrence structure.

    Determinism: every quantity except the contribution sums is exact;
    the sums are IEEE doubles whose partition order can vary, so the
    returned ``score`` is rounded to 6 decimals and the per-document
    ranking orders by (rounded score desc, word asc) — the
    graph_pagerank/PPR gate convention (10 rounds on a bounded-degree
    graph keep float spread orders of magnitude under the rounding
    grain). Isolated words (a document with one filtered token) settle at
    exactly 1 - d.

    Scale: ALL documents iterate simultaneously — state is one
    (doc, word, score) table, each round is one edge join + grouped sum,
    lineage truncated per round; edge generation is lead()-based over the
    per-document sequence (narrow window functions, no self-join).

    Output: ``(id_col, rank, word, score)``, rank 1-based per document,
    at most ``top_n`` rows per document.
    """
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    if top_n < 1 or n_iter < 1:
        raise ValueError(f"top_n and n_iter must be >= 1, got {top_n}, {n_iter}")
    sw = RAKE_STOPWORDS if stopwords is None else stopwords
    sw_arr = F.array(*[F.lit(w) for w in sw])
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+")).alias(
            "_pos", "_w"
        ),
    ).where((F.col("_w") != "") & ~F.array_contains(sw_arr, F.col("_w")))
    order = Window.partitionBy("_id").orderBy("_pos")
    with_leads = toks.select(
        "_id",
        "_w",
        *[F.lead("_w", i).over(order).alias(f"_l{i}") for i in range(1, window)],
    )
    edges = (
        with_leads.withColumn(
            "_nb", F.explode(F.array(*[F.col(f"_l{i}") for i in range(1, window)]))
        )
        .where(F.col("_nb").isNotNull() & (F.col("_nb") != F.col("_w")))
        .select(
            "_id",
            F.least("_w", "_nb").alias("_wa"),
            F.greatest("_w", "_nb").alias("_wb"),
        )
        .distinct()
    )
    sym = edges.unionByName(
        edges.select("_id", F.col("_wb").alias("_wa"), F.col("_wa").alias("_wb"))
    ).localCheckpoint(eager=True)
    deg = sym.groupBy("_id", F.col("_wa").alias("_w")).agg(
        F.count(F.lit(1)).alias("_deg")
    ).localCheckpoint(eager=True)
    nodes = toks.select("_id", "_w").distinct().localCheckpoint(eager=True)
    ranks = nodes.withColumn("_r", F.lit(1.0))
    for _ in range(n_iter):
        rd = ranks.join(deg, ["_id", "_w"]).select(
            "_id",
            F.col("_w").alias("_wa"),
            (F.col("_r") / F.col("_deg")).alias("_rc"),
        )
        contrib = (
            sym.join(rd, ["_id", "_wa"])
            .groupBy("_id", F.col("_wb").alias("_w"))
            .agg(F.sum("_rc").alias("_c"))
        )
        ranks = (
            nodes.join(contrib, ["_id", "_w"], "left")
            .select(
                "_id",
                "_w",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce("_c", F.lit(0.0))
                ).alias("_r"),
            )
            .localCheckpoint(eager=True)
        )
    rw = Window.partitionBy("_id").orderBy(
        F.desc(F.round("_r", 6)), F.asc("_w")
    )
    return (
        ranks.withColumn("rank", F.row_number().over(rw))
        .where(F.col("rank") <= top_n)
        .select(
            F.col("_id").alias(id_col),
            F.col("rank").cast("long").alias("rank"),
            F.col("_w").alias("word"),
            F.round("_r", 6).alias("score"),
        )
    )


def textrank_sentences(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 2,
    n_iter: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Extractive summarization via sentence-level TextRank (Mihalcea &
    Tarau, EMNLP 2004 §4): per document, vertices are the sentences
    (split on ``[.!?]+`` runs, whitespace-trimmed, kept iff they contain
    an alphanumeric), an edge links two sentences sharing >= 1 distinct
    word, weighted by

        w(a, b) = |words(a) ∩ words(b)| / (|words(a)| + |words(b)|)

    (distinct lowercased [a-z0-9]+ tokens; the paper's log-length
    normalization is replaced by the linear one — a documented common
    variant — because ln() is not correctly-rounded identically across
    engines while this ratio is an exact rational), and sentences are
    scored by ``n_iter`` rounds of weighted PageRank:

        WS(v) = (1 - d) + d * Σ_{u ∈ N(v)} w(u, v) / outw(u) * WS(u)

    with outw(u) = Σ_{x ∈ N(u)} w(u, x) and WS_0 = 1. The top ``top_n``
    sentences per document come back — the zero-model summary a curation
    pipeline extracts before anything learned, and the text ER blocking
    and dedup gates can key on.

    Determinism: scores are rounded to 6 decimals at the boundary and the
    ranking orders by (rounded score desc, sentence position asc) — the
    graph-gate float-sum convention (bounded graphs, 10 rounds, spread
    orders of magnitude under the grain). Isolated sentences settle at
    exactly 1 - d.

    Scale: ALL documents iterate together in one (doc, sentence) state
    table; edge generation is a word-exploded equi-join (never sentence
    pairs across documents); per-round cost is one edge join + grouped
    sum. Sentence count per doc bounds the per-doc work.

    Output: ``(id_col, rank, sent_idx, sentence, score)`` — sent_idx is
    the 1-based position in the original split, so callers can restore
    document order for the final summary.
    """
    if top_n < 1 or n_iter < 1:
        raise ValueError(f"top_n and n_iter must be >= 1, got {top_n}, {n_iter}")
    from pyspark.sql import Window

    sents = (
        docs.select(
            F.col(id_col).alias("_id"),
            F.posexplode(F.split(F.col(text_col), r"[.!?]+")).alias("_i0", "_raw"),
        )
        .select(
            "_id",
            (F.col("_i0") + 1).cast("long").alias("_sidx"),
            F.regexp_replace("_raw", r"^\s+|\s+$", "").alias("_sent"),
        )
        .where(F.col("_sent").rlike("[A-Za-z0-9]"))
        .withColumn(
            "_words",
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col("_sent")), r"[^a-z0-9]+"),
                    lambda w: w != "",
                )
            ),
        )
        .withColumn("_nw", F.size("_words").cast("long"))
        .localCheckpoint(eager=True)
    )
    wt = sents.select("_id", "_sidx", F.explode("_words").alias("_w"))
    shared = (
        wt.alias("a")
        .join(wt.alias("b"), ["_id", "_w"])
        .where(F.col("a._sidx") != F.col("b._sidx"))
        .groupBy("_id", F.col("a._sidx").alias("_src"), F.col("b._sidx").alias("_dst"))
        .agg(F.count(F.lit(1)).alias("_shared"))
    )
    na = sents.select("_id", F.col("_sidx").alias("_src"), F.col("_nw").alias("_na"))
    nb = sents.select("_id", F.col("_sidx").alias("_dst"), F.col("_nw").alias("_nb"))
    edges = (
        shared.join(na, ["_id", "_src"])
        .join(nb, ["_id", "_dst"])
        .select(
            "_id",
            "_src",
            "_dst",
            (F.col("_shared") / (F.col("_na") + F.col("_nb"))).alias("_wt"),
        )
        .localCheckpoint(eager=True)
    )
    outw = edges.groupBy("_id", "_src").agg(F.sum("_wt").alias("_ow"))
    ew = edges.join(outw, ["_id", "_src"]).select(
        "_id", "_src", "_dst", (F.col("_wt") / F.col("_ow")).alias("_frac")
    ).localCheckpoint(eager=True)
    nodes = sents.select("_id", "_sidx").localCheckpoint(eager=True)
    ranks = nodes.withColumn("_r", F.lit(1.0))
    for _ in range(n_iter):
        rsrc = ranks.select("_id", F.col("_sidx").alias("_src"), "_r")
        contrib = (
            ew.join(rsrc, ["_id", "_src"])
            .groupBy("_id", F.col("_dst").alias("_sidx"))
            .agg(F.sum(F.col("_frac") * F.col("_r")).alias("_c"))
        )
        ranks = (
            nodes.join(contrib, ["_id", "_sidx"], "left")
            .select(
                "_id",
                "_sidx",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce("_c", F.lit(0.0))
                ).alias("_r"),
            )
            .localCheckpoint(eager=True)
        )
    rw = Window.partitionBy("_id").orderBy(F.desc(F.round("_r", 6)), F.asc("_sidx"))
    return (
        ranks.join(sents.select("_id", "_sidx", "_sent"), ["_id", "_sidx"])
        .withColumn("rank", F.row_number().over(rw))
        .where(F.col("rank") <= top_n)
        .select(
            F.col("_id").alias(id_col),
            F.col("rank").cast("long").alias("rank"),
            F.col("_sidx").alias("sent_idx"),
            F.col("_sent").alias("sentence"),
            F.round("_r", 6).alias("score"),
        )
    )


def phrase_search(
    docs: DataFrame,
    phrases: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact multi-word PHRASE query over a positional inverted index —
    the distributed form of the classic IR phrase-match: tokenize every
    document once into ``(doc, position, word)`` postings (positions over
    the filtered lowercased [^\\W]+ sequence), join the (tiny, broadcast)
    phrase-token table on the word, and a position anchor = pos − j
    groups the postings so that an occurrence exists iff ALL m of a
    phrase's token slots are present at one anchor (count-distinct-j ==
    m, which stays correct when a phrase repeats a word: each posting can
    fill several slots but at different anchors). No scan ever runs per
    phrase — one pass builds the postings, one broadcast join matches
    every phrase simultaneously.

    Output: ``(phrase, id_col, n_hits)`` — one row per (phrase, document)
    with at least one occurrence; n_hits counts occurrences (overlapping
    ones included, per the positional-index semantics).
    """
    if not phrases:
        raise ValueError("phrases must be non-empty")
    import re as _re

    rows = []
    for ph in phrases:
        toks = [w for w in _re.split(r"\W+", ph.lower()) if w]
        if not toks:
            raise ValueError(f"phrase has no tokens: {ph!r}")
        rows.extend((ph, j, w, len(toks)) for j, w in enumerate(toks, 1))
    spark = docs.sparkSession
    ptoks = spark.createDataFrame(
        rows, "phrase string, j int, _w string, plen int"
    )
    idx = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\W+"), lambda w: w != ""
            )
        ).alias("_p0", "_w"),
    ).select("_id", (F.col("_p0") + 1).alias("_p"), "_w")
    anchored = idx.join(F.broadcast(ptoks), "_w").select(
        "_id", "phrase", "plen", (F.col("_p") - F.col("j")).alias("_anchor"), "j"
    )
    occ = (
        anchored.groupBy("_id", "phrase", "plen", "_anchor")
        .agg(F.countDistinct("j").alias("_found"))
        .where(F.col("_found") == F.col("plen"))
    )
    return occ.groupBy("phrase", F.col("_id").alias(id_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n_hits")
    )


def char_entropy(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Character-distribution Shannon entropy per document — the
    gibberish/byte-spill detector that complements :func:`script_profile`
    (which classes characters) and :func:`quality_scores` (which counts
    words): natural text sits in a narrow bits-per-char band (~3.5-4.5
    for English); random bytes push toward log2 of the alphabet, and
    boilerplate/repetition collapses toward 0 — both tails are filter
    candidates. Exact codepoint counts, entropy = −Σ p·ln p rounded to 6
    (the entropy-gate ln convention), bits = entropy/ln 2.

    One explode + one (doc, char) groupBy (bounded by alphabet size per
    doc). Output: ``(id_col, n_chars, n_distinct, entropy_nats,
    bits_per_char)``; empty documents report zeros.
    """
    chars = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.col(text_col), "")).alias("_c"),
    ).where(F.col("_c") != "")
    per = chars.groupBy("_id", "_c").agg(F.count(F.lit(1)).alias("_n"))
    agg = per.groupBy("_id").agg(
        F.sum("_n").alias("_t"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("_n") * F.log("_n")).alias("_snln"),
    )
    # -Σ (n/t) ln(n/t) = ln t − (Σ n ln n)/t  — one log per distinct char,
    # assembled from exact counts
    ent = F.log("_t") - F.col("_snln") / F.col("_t")
    out = agg.select(
        F.col("_id").alias(id_col),
        F.col("_t").cast("long").alias("n_chars"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.round(ent, 6).alias("entropy_nats"),
        F.round(ent / F.log(F.lit(2.0)), 6).alias("bits_per_char"),
    )
    empties = (
        docs.where(F.length(text_col) == 0)
        .select(
            F.col(id_col),
            F.lit(0).cast("long").alias("n_chars"),
            F.lit(0).cast("long").alias("n_distinct"),
            F.lit(0.0).alias("entropy_nats"),
            F.lit(0.0).alias("bits_per_char"),
        )
    )
    return out.unionByName(empties)


def readability_scores(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Flesch reading-ease per document (Flesch 1948; the
    Kincaid-family quality signal corpus pipelines bucket web text by —
    very low scores flag legalese/boilerplate, impossibly high ones flag
    word-salad):

        flesch = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)

    with the DETERMINISTIC counting convention both engines reproduce
    exactly: sentences = regexp count of '[.!?]+' runs (floored at 1),
    words = the shared tokenization contract, syllables = count of
    '[aeiouy]+' vowel-group runs over the lowercased text (a vowel group
    never spans whitespace, so whole-text counting equals per-word
    summation). Heuristic by nature — the counting rules ARE the
    definition here, stated so an independent reimplementation agrees
    integer-for-integer. Documents with no words are excluded.

    Output: (id_col, n_sentences, n_words, n_syllables, flesch).
    """
    from .util import words_lower

    low = F.lower(F.col(text_col))
    n_sent = F.greatest(F.regexp_count(F.col(text_col), F.lit(r"[.!?]+")), F.lit(1))
    n_words = F.size(words_lower(F.col(text_col)))
    n_syll = F.regexp_count(low, F.lit(r"[aeiouy]+"))
    return (
        docs.select(
            id_col,
            n_sent.cast("long").alias("n_sentences"),
            n_words.cast("long").alias("n_words"),
            n_syll.cast("long").alias("n_syllables"),
        )
        .where(F.col("n_words") > 0)
        .withColumn(
            "flesch",
            F.lit(206.835)
            - F.lit(1.015) * (F.col("n_words") / F.col("n_sentences"))
            - F.lit(84.6) * (F.col("n_syllables") / F.col("n_words")),
        )
    )
