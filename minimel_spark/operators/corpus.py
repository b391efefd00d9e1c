"""Corpus-curation operators for LLM training-data pipelines: benchmark
decontamination, repetition-based quality filtering, duplicate-cluster
canonicalization, deterministic stratified sampling, and corpus-wide n-gram
heavy hitters.

These have no counterpart in the reference (minimEL stops at entity linking);
they are the operations a 100-TB pretraining-data pipeline runs next to the
dedup/ANN family (`dedup.py`, `ann.py`). Everything here is built-in Spark
expressions (JVM, whole-stage codegen) — no Python in any hot path — and every
operator is deterministic and DuckDB-oracle-checkable, using the same
md5-derived hash trick the dedup family uses (`dedup.py:126-151`): md5 is the
one hash both engines can recompute bit-for-bit.

Scale notes are inline per operator; the common theme is that each one is a
single shuffle (or none) over keys that are either already 64-bit or hashed
down to 64-bit before the exchange, so payload width — not row count — is
what the plan optimizes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .cluster import connected_components
from .util import ensure_min_parallelism, words_lower

# Word segmentation shared by every operator here (and by the DuckDB oracles:
# regexp_split_to_array(lower(text), '\\W+') with empties filtered).
_WORD_SPLIT = r"\W+"


def _words(text_col: str) -> F.Column:
    return words_lower(F.col(text_col))


def _word_ngrams(words: F.Column, n: int) -> F.Column:
    """All word n-grams (space-joined), [] when the doc is shorter than n.

    The guard matters: ``F.sequence(1, size - n + 1)`` DESCENDS when
    size < n (Spark sequences run backwards for start > stop), which would
    fabricate out-of-range slices instead of yielding no n-grams.
    """
    if n == 1:
        return words
    count = F.size(words) - (n - 1)
    return F.when(
        count >= 1,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


# canonical definition lives in util.py; re-exported here because the
# corpus operators and their tests address it as corpus.md5_long60
from .util import md5_long60  # noqa: E402,F401


def ngram_decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flag training documents sharing any word n-gram with a benchmark set
    (the GPT-3/Llama-style exact n-gram decontamination filter; n=13 is the
    published default).

    Returns one row per train document: (doc_id, n_ngrams, n_contaminated,
    contaminated) — n_contaminated counts the document's DISTINCT n-grams
    that appear anywhere in the benchmark.

    Scale: the join runs on the 60-bit md5 of each n-gram, not the n-gram
    string, so the exchange moves 8-byte keys instead of ~100-byte texts
    (the distinct-per-doc dedup happens BEFORE the explode-join, bounding
    fan-out at words-per-doc per row). The benchmark side is distinct-ed to
    one row per n-gram and left to AQE: benchmarks are small (MBs) next to
    a 100-TB train side, so AQE plans the broadcast at runtime without the
    driver having to collect or size anything. Train docs with no hits are
    preserved by aggregating the left join, never re-scanning the corpus.
    The train side gets the shared input-parallelism guard (`util.py`): the
    n-gram/md5 map stage is the CPU cost here, and a small test file would
    otherwise run it on one core.
    """
    train = ensure_min_parallelism(train, id_col)
    tg = train.select(
        id_col, F.array_distinct(_word_ngrams(_words(text_col), n)).alias("ngrams")
    ).select(
        id_col,
        F.size("ngrams").alias("n_ngrams"),
        F.explode_outer(F.transform(F.col("ngrams"), md5_long60)).alias("gk"),
    )
    bg = (
        benchmark.select(F.explode(_word_ngrams(_words(text_col), n)).alias("ng"))
        .select(md5_long60(F.col("ng")).alias("gk"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        tg.join(bg, "gk", "left")
        .groupBy(id_col)
        .agg(
            F.first("n_ngrams").alias("n_ngrams"),
            F.sum(F.coalesce("hit", F.lit(0))).alias("n_contaminated"),
        )
        .withColumn("contaminated", F.col("n_contaminated") > 0)
    )


def repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dup_2gram_frac: float = 0.4,
    max_top_word_share: float = 0.3,
) -> DataFrame:
    """Gopher-style within-document repetition signals + a `repetitive` flag.

    Per doc: n_words, dup_word_frac / dup_2gram_frac / dup_3gram_frac
    (fraction of n-gram OCCURRENCES that are repeats of an earlier one,
    i.e. 1 − distinct/total), and top_word_share (most frequent word's share
    of all words). `repetitive` fires on the two published-style thresholds.

    Scale: the n-gram fractions are a pure map over each row (no shuffle);
    top_word_share is the one aggregation — explode → per-(doc, word) count
    → per-doc max/sum, a single partial-agg-friendly shuffle keyed by
    (doc_id, word). No arrays are carried through the exchange. The input
    is guarded once (`util.ensure_min_parallelism`) so both the map and the
    agg branch inherit full-width parallelism on narrow test scans.
    """
    docs = ensure_min_parallelism(docs, id_col)
    words = _words(text_col)
    frac = {}
    for n in (1, 2, 3):
        ng = _word_ngrams(words, n)
        total = F.size(ng)
        frac[n] = F.when(
            total > 0, 1.0 - F.size(F.array_distinct(ng)) / total
        ).otherwise(F.lit(0.0))
    base = docs.select(
        id_col,
        F.size(words).alias("n_words"),
        frac[1].alias("dup_word_frac"),
        frac[2].alias("dup_2gram_frac"),
        frac[3].alias("dup_3gram_frac"),
    )
    per_word = (
        docs.select(id_col, F.explode(words).alias("w"))
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg((F.max("c") / F.sum("c")).alias("top_word_share"))
    )
    return (
        base.join(per_word, id_col, "left")
        .withColumn("top_word_share", F.coalesce("top_word_share", F.lit(0.0)))
        .withColumn(
            "repetitive",
            (F.col("dup_2gram_frac") > max_dup_2gram_frac)
            | (F.col("top_word_share") > max_top_word_share),
        )
    )


def canonicalize_duplicates(
    docs: DataFrame,
    dup_pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Collapse a near-duplicate pair graph into a kept corpus: connected
    components over (id_a, id_b) edges, canonical = min id per component,
    every document mapped to its canonical (singletons to themselves).

    This is the step after any of the dedup operators (`dedup.py`,
    `ann.py:261`): they emit verified duplicate PAIRS; training-data curation
    needs the transitive closure and one kept representative per group.
    Returns (doc_id, canonical_id, is_duplicate); the deduplicated corpus is
    the `~is_duplicate` slice.

    Scale: `connected_components` pre-contracts locally-known connectivity
    (`cluster.py:123`) so dup cliques — the common shape, since near-dup
    groups are usually mutually similar — collapse before the iterative
    loop; the final mapping is one left join keyed by doc id.
    """
    edges = dup_pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    cc = connected_components(edges)
    return (
        docs.select(id_col)
        .join(cc.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("canonical_id"),
        )
        .withColumn("is_duplicate", F.col(id_col) != F.col("canonical_id"))
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float] | float,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "s0",
) -> DataFrame:
    """Deterministic hash-based stratified sampling: keep a row iff its
    md5-uniform u(id, salt) < fraction(stratum).

    Unlike ``df.sample`` (RNG per task, changes with partitioning and
    retries), membership here depends only on row CONTENT — the sample is
    identical at any parallelism, resumable, and reproducible in SQL
    (u = ('0x' || substr(md5(id || ':' || salt), 1, 8))::UBIGINT / 2^32).
    A float applies one rate to every stratum; a dict gives per-stratum
    rates, unlisted strata dropped — the per-lang rebalance a multilingual
    pretraining mix needs.

    Scale: pure map + one broadcast-sized join against the |strata|-row rate
    table; no shuffle of the corpus, filter runs inside the scan's codegen
    stage.
    """
    u = (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt))), 1, 8),
            16,
            10,
        ).cast("long")
        / F.lit(float(2**32))
    )
    out = df.withColumn("u", u)
    if isinstance(fractions, dict):
        rates = df.sparkSession.createDataFrame(
            [(k, float(v)) for k, v in sorted(fractions.items())],
            f"{strata_col} string, _rate double",
        )
        out = out.join(F.broadcast(rates), strata_col)
    else:
        out = out.withColumn("_rate", F.lit(float(fractions)))
    return out.where(F.col("u") < F.col("_rate")).drop("_rate")


def top_ngrams(
    docs: DataFrame,
    n: int = 2,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide top-k word n-grams by occurrence count (heavy hitters),
    ties broken by n-gram text so the result is a total order.

    The exact corpus-frequency profile quality pipelines cut boilerplate
    with (and the denominator for stop-n-gram lists like the blocking
    caps in `blocking.py`).

    Scale: explode → groupBy(ngram-key) is ONE shuffle with map-side partial
    aggregation (counts combine before the exchange); the final top-k is
    Spark's TakeOrderedAndProject — per-partition heaps of size k merged on
    the driver, never a global sort. The group key is the md5-60 of the
    n-gram with the text carried via max() (single-valued per key), so the
    exchange moves 8-byte keys.
    """
    ng = (
        ensure_min_parallelism(docs, id_col)
        .select(F.explode(_word_ngrams(_words(text_col), n)).alias("ngram"))
        .select(md5_long60(F.col("ngram")).alias("gk"), "ngram")
    )
    counts = ng.groupBy("gk").agg(
        F.max("ngram").alias("ngram"), F.count(F.lit(1)).alias("cnt")
    )
    return (
        counts.orderBy(F.desc("cnt"), F.asc("ngram"))
        .limit(k)
        .select("ngram", "cnt")
    )


def dup_ngram_coverage(
    docs: DataFrame,
    n: int = 5,
    min_docs: int = 2,
    heavy_frac: float = 0.5,
    max_docs_per_ngram: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document coverage by word n-grams that repeat across documents —
    the repeated-substring signal of Lee et al. 2022 ("Deduplicating
    Training Data Makes Language Models Better"), at n-gram rather than
    suffix-array granularity.

    For each document: n_words, covered_words (distinct word positions
    lying inside at least one n-gram that occurs in >= min_docs distinct
    documents), covered_frac, and a `dup_heavy` flag at `heavy_frac`. The
    curation action is to drop or trim dup-heavy documents; unlike the
    pairwise dedup family this measures HOW MUCH of each document is
    boilerplate, not just whether a similar document exists.

    Scale: three shuffles, all on narrow keys — (1) distinct (doc, gram-md5)
    then count by 8-byte gram key to find the repeated grams; (2) the
    occurrence table semi-joins that key set (AQE broadcasts it when small);
    (3) distinct (doc, position) after exploding each hit into its n covered
    positions, bounding that stage at n x hits rows of 16 bytes. Nothing
    carries the gram STRING past the first md5 map. `max_docs_per_ngram`
    optionally drops grams above a document-frequency ceiling (the
    stop-shingle cap of `dedup.py`) — at web scale a handful of universal
    boilerplate grams would otherwise dominate stage (3); capping them
    UNDERCOUNTS coverage for exactly the documents the flag would already
    catch, and the default (None) keeps exact semantics.
    """
    docs = ensure_min_parallelism(docs, id_col)
    base = docs.select(
        id_col, F.size(_words(text_col)).alias("n_words")
    )
    occ = docs.select(
        id_col, F.posexplode(_word_ngrams(_words(text_col), n)).alias("pos", "ngram")
    ).select(
        id_col,
        (F.col("pos") + 1).alias("start"),
        md5_long60(F.col("ngram")).alias("gk"),
    )
    df_counts = (
        occ.select(id_col, "gk")
        .distinct()
        .groupBy("gk")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    dup = df_counts.where(F.col("df") >= min_docs)
    if max_docs_per_ngram is not None:
        dup = dup.where(F.col("df") <= max_docs_per_ngram)
    covered = (
        occ.join(dup.select("gk"), "gk", "semi")
        .select(
            id_col,
            F.explode(F.sequence(F.col("start"), F.col("start") + (n - 1))).alias(
                "wpos"
            ),
        )
        .distinct()
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("covered_words"))
    )
    frac = F.when(
        F.col("n_words") > 0, F.col("covered_words") / F.col("n_words")
    ).otherwise(F.lit(0.0))
    return (
        base.join(covered, id_col, "left")
        .withColumn("covered_words", F.coalesce("covered_words", F.lit(0)))
        .withColumn("covered_frac", frac)
        .withColumn("dup_heavy", F.col("covered_frac") >= heavy_frac)
    )


def vocab_oov(
    docs: DataFrame,
    vocab_size: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-frequency vocabulary construction + per-document OOV stats —
    the tokenizer-prep step: build the top-`vocab_size` word vocabulary by
    corpus occurrence count (ties broken by word, a total order) and score
    every document by how much of it falls outside that vocabulary.

    Returns (doc_id, n_words, n_oov, oov_frac) with OOV counted WITH
    multiplicity. High-OOV documents are the ones a fixed tokenizer would
    shred into bytes — the standard pre-tokenizer corpus health check.

    Scale: two partial-agg shuffles — corpus word counts keyed by the word
    string (short keys, map-side combine collapses to |vocab| rows per
    partition), and per-(doc, word) counts so the vocab join input is
    distinct words per doc, not every token. The top-V cut is
    TakeOrderedAndProject (per-partition heaps of size V, no global sort)
    and the V-row vocabulary broadcasts exactly.
    """
    docs = ensure_min_parallelism(docs, id_col)
    words = _words(text_col)
    corpus_counts = (
        docs.select(F.explode(words).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    vocab = (
        corpus_counts.orderBy(F.desc("cnt"), F.asc("w"))
        .limit(vocab_size)
        .select("w", F.lit(1).alias("_in_vocab"))
    )
    per_doc_word = (
        docs.select(id_col, F.explode(words).alias("w"))
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    stats = (
        per_doc_word.join(F.broadcast(vocab), "w", "left")
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_words"),
            F.sum(F.when(F.col("_in_vocab").isNull(), F.col("c")).otherwise(0)).alias(
                "n_oov"
            ),
        )
    )
    frac = F.when(
        F.col("n_words") > 0, F.col("n_oov") / F.col("n_words")
    ).otherwise(F.lit(0.0))
    return (
        docs.select(id_col)
        .join(stats, id_col, "left")
        .withColumn("n_words", F.coalesce("n_words", F.lit(0)))
        .withColumn("n_oov", F.coalesce("n_oov", F.lit(0)))
        .withColumn("oov_frac", frac)
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 1024,
    n_ranges: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk sequence packing — the step between dedup and the
    trainer in every pretraining pipeline (T5/GPT-style): documents are laid
    end-to-end in a deterministic order and the token stream is cut into
    fixed-``budget`` sequences. Returns, per document: n_tokens, the global
    start offset in the concatenated stream (start_tok), the sequence it
    starts in (start_seq = start_tok // budget), its offset inside that
    sequence (start_off), and how many sequences it spans (n_seqs — 1 for
    everything shorter than a budget remainder, 0 for empty docs).

    The order is (md5_long60(doc_id), doc_id) — content-independent, total,
    and recomputable bit-for-bit by the DuckDB oracle (unlike xxhash64, see
    `byte_pack_buckets` which stays on the cheaper JVM hash for the
    perf path). The global token prefix sum is DISTRIBUTED with the same
    two-level shape as `byte_pack_buckets`/`quantile_top_shadowed`: the
    uniform 60-bit hash space splits into ``n_ranges`` fixed bit-shift
    ranges, the within-range cumsum runs under a PARTITIONED window, and the
    <= n_ranges-row per-range subtotal table supplies cross-range offsets
    via a broadcast triangle join — no collect, no single-partition
    exchange, fully lazy. Size ``n_ranges`` so n_docs/n_ranges rows of
    ~24 B fit one task at the target scale.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    k = max(1, (n_ranges - 1).bit_length())
    docs = ensure_min_parallelism(docs, id_col)
    t = docs.select(
        id_col,
        F.size(_words(text_col)).cast("long").alias("n_tokens"),
        md5_long60(F.col(id_col).cast("string")).alias("_h"),
    ).withColumn("_rg", F.shiftright("_h", 60 - k))
    rsub = t.groupBy("_rg").agg(F.sum("n_tokens").alias("_rn"))
    offs = (
        rsub.alias("a")
        .join(rsub.alias("b"), F.col("b._rg") < F.col("a._rg"), "left")
        .groupBy(F.col("a._rg").alias("_rg"))
        .agg(F.coalesce(F.sum("b._rn"), F.lit(0)).alias("_off"))
    )
    w = Window.partitionBy("_rg").orderBy("_h", id_col)
    start = (
        F.coalesce(
            F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        + F.col("_off")
    ).alias("start_tok")
    out = t.join(F.broadcast(offs), "_rg").select(id_col, "n_tokens", start)
    b = F.lit(int(budget))
    return out.select(
        id_col,
        "n_tokens",
        "start_tok",
        # integer division (DIV), not floor(double /): long/long in Spark is
        # IEEE-double division, which silently mis-places sequence boundaries
        # once start_tok exceeds 2^53 — the DuckDB oracle's // is exact, and
        # at 10^12-doc token streams 2^53 is reachable
        F.expr(f"start_tok DIV {int(budget)}").cast("long").alias("start_seq"),
        (F.col("start_tok") % b).alias("start_off"),
        F.when(F.col("n_tokens") == 0, F.lit(0))
        .otherwise(
            F.expr(f"(start_tok + n_tokens - 1) DIV {int(budget)}")
            - F.expr(f"start_tok DIV {int(budget)}")
            + 1
        )
        .cast("long")
        .alias("n_seqs"),
    )


def _md5_u01(id_col: str, salt: str) -> F.Column:
    """md5-derived uniform in the OPEN interval (0,1): (v + 0.5) / 2^32 with
    v the first 32 md5 bits of 'id:salt' — strictly inside, so ln(u) is
    finite and nonzero on both engines. SQL twin:
    ((('0x'||substr(md5(id||':'||salt),1,8))::UBIGINT + 0.5) / 4294967296.0)."""
    v = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return (v + F.lit(0.5)) / F.lit(float(2**32))


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    strata_col: str | None = None,
    id_col: str = "doc_id",
    salt: str = "w0",
    buckets: int = 32,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — k rows total
    (or k per stratum), each row's inclusion probability proportional to
    ``weight_col`` — via the Efraimidis–Spirakis A-ES scheme: rank every row
    by key = -ln(u)/w ascending (u the content-derived md5 uniform) and keep
    the k smallest. E[u^(1/w)] ordering == weighted sampling, exactly.

    This is "sample TOKENS, not documents": weighting by token count makes
    the expected token mass of the sample match the corpus mix, the knob
    pretraining-data ablations actually want. Rows with weight <= 0 or NULL
    are never selected. Like stratified_sample, membership depends only on
    row content — identical at any parallelism, resumable, SQL-reproducible.

    Scale: the selection is a two-level top-k, never a global sort. Level 1
    computes a per-(stratum, md5-bucket) top-k over ``buckets`` salted
    buckets (window over at most strata*buckets bounded partitions after ONE
    shuffle of 16-byte rows); level 2 re-ranks the <= strata*buckets*k
    survivors. A stratum with 10^10 rows therefore sorts buckets of
    ~10^10/32 rows for a size-k heap each — bounded, parallel, skew-free —
    instead of one 10^10-row sorted partition.
    """
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    if buckets < 1:
        raise ValueError(f"need buckets >= 1, got {buckets}")
    strata = [strata_col] if strata_col else []
    key = -F.log(_md5_u01(id_col, salt)) / F.col(weight_col)
    cand = (
        df.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("_key", key)
        .withColumn("_bkt", md5_long60(F.concat_ws(":", F.lit("b"), F.col(id_col).cast("string"))) % buckets)
    )
    w1 = Window.partitionBy(*strata, "_bkt").orderBy(F.asc("_key"), F.asc(id_col))
    local = (
        cand.withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= k)
        .drop("_rn", "_bkt")
    )
    w2 = Window.partitionBy(*strata).orderBy(F.asc("_key"), F.asc(id_col))
    return (
        local.withColumn("_rn", F.row_number().over(w2))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def pmi_collocations(
    docs: DataFrame,
    min_count: int = 5,
    k: int = 25,
    text_col: str = "text",
    id_col: str = "doc_id",
    persisted_out: list | None = None,
) -> DataFrame:
    """Top-k word-bigram collocations by pointwise mutual information:
    PMI(w1,w2) = ln( P(w1,w2) / (P(w1) P(w2)) ) with bigram probability over
    the bigram total and unigram probabilities over the token total,
    restricted to bigrams seen >= min_count times (the standard guard — PMI
    is maximized by hapaxes otherwise).

    The collocation profile ("new york", "los angeles") drives tokenizer
    vocab audits and boilerplate detection; PMI is also the building block
    of word-association features. Computed as ONE double expression tree
    ln(((c12*Nu)*Nu) / ((Nb*c1)*c2)) evaluated identically by Spark and the
    DuckDB oracle — exact same IEEE ops in the same order.

    Scale: two count aggregations (unigram, bigram) with map-side partials
    over md5-60 keys; the bigram->unigram joins are vocab-sized x 2 (left to
    AQE to broadcast); the two corpus totals ride in as 1-row broadcast
    crossJoins; final top-k is per-partition heaps (TakeOrderedAndProject),
    never a global sort. The tokenized corpus feeds three consumers — pass
    ``persisted_out`` (a list the caller unpersists) to tokenize once;
    without a receiver the plan is fully lazy and re-tokenizes per branch.
    """
    if min_count < 1 or k < 1:
        raise ValueError(f"need min_count >= 1 and k >= 1, got {min_count}, {k}")
    toks = ensure_min_parallelism(docs, id_col).select(
        F.col(id_col), _words(text_col).alias("_ws")
    )
    # the tokenized corpus feeds three consumers (unigram counts, the
    # bigram-total aggregate, bigram counts); a persisted_out receiver makes
    # that one tokenization pass instead of three
    if persisted_out is not None:
        toks = toks.persist()
        persisted_out.append(toks)
    uni = (
        toks.select(F.explode("_ws").alias("w"))
        .groupBy(md5_long60(F.col("w")).alias("gk"))
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    n_uni = uni.agg(F.sum("c1").cast("double").alias("_nu"))
    # the bigram total is over ALL bigram tokens — the min_count guard only
    # gates which bigrams are CANDIDATES, not the probability denominator.
    # Sum max(len-1, 0) per doc instead of re-aggregating the bigram table:
    # same exact count, one narrow scan instead of a second shuffle.
    n_bi = toks.agg(
        F.coalesce(
            F.sum(F.greatest(F.size("_ws") - 1, F.lit(0))), F.lit(0)
        )
        .cast("double")
        .alias("_nb")
    )
    bi = (
        toks.select(F.explode(_word_ngrams(F.col("_ws"), 2)).alias("ng"))
        .groupBy(md5_long60(F.col("ng")).alias("gk2"))
        .agg(F.max("ng").alias("ngram"), F.count(F.lit(1)).alias("c12"))
        .where(F.col("c12") >= min_count)
    )
    parts = F.split(F.col("ngram"), " ", 2)
    scored = (
        bi.withColumn("gk_a", md5_long60(parts.getItem(0)))
        .withColumn("gk_b", md5_long60(parts.getItem(1)))
        .join(uni.select(F.col("gk").alias("gk_a"), F.col("c1").alias("ca")), "gk_a")
        .join(uni.select(F.col("gk").alias("gk_b"), F.col("c1").alias("cb")), "gk_b")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .select(
            "ngram",
            F.col("c12").alias("cnt"),
            F.log(
                (F.col("c12").cast("double") * F.col("_nu") * F.col("_nu"))
                / (F.col("_nb") * F.col("ca").cast("double") * F.col("cb"))
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), F.asc("ngram")).limit(k)


def mixture_sample(
    docs: DataFrame,
    weights: dict[str, float],
    total_tokens: int,
    stratum_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_ranges: int = 256,
) -> DataFrame:
    """Token-budget corpus mixing — the data-mixing step between curation
    and training: select a deterministic subset whose per-stratum token
    mass hits the target mixture ``weights`` (normalized) of
    ``total_tokens``. Selection within a stratum is the greedy prefix of
    the (md5_long60(id), id) order — content-addressed, so membership is a
    pure function of row content (parallelism / retry / re-run invariant),
    and the LAST selected document may overshoot its stratum budget by a
    fraction of one document (the standard greedy-prefix convention; the
    alternative — undershoot — drops the boundary doc, pick by filtering
    ``tok_before + n_tokens <= budget`` downstream if preferred).

    Strata absent from ``weights`` are excluded entirely. Returns
    (stratum, doc_id, n_tokens, tok_before) for selected docs, where
    ``tok_before`` is the stratum-local token prefix sum before this doc.

    Scale: the per-stratum prefix sum is the same two-level distributed
    shape as `pack_sequences` — fixed bit-shift hash ranges, per-(stratum,
    range) subtotals, broadcast triangle-join offsets, PARTITIONED
    windows — no collect, no single-partition exchange; budgets ride a
    literal map column, so nothing here is data-size-dependent except the
    one scan + one bounded window pass.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w <= 0 for w in weights.values()):
        raise ValueError(f"weights must be positive, got {weights}")
    if total_tokens <= 0:
        raise ValueError(f"total_tokens must be positive, got {total_tokens}")
    wsum = float(sum(weights.values()))
    budgets = {s: int(round(w / wsum * total_tokens)) for s, w in weights.items()}
    k = max(1, (n_ranges - 1).bit_length())
    t = (
        ensure_min_parallelism(docs, id_col)
        .where(F.col(stratum_col).isin(list(weights)))
        .select(
            F.col(stratum_col).alias("stratum"),
            id_col,
            F.size(_words(text_col)).cast("long").alias("n_tokens"),
            md5_long60(F.col(id_col).cast("string")).alias("_h"),
        )
        .withColumn("_rg", F.shiftright("_h", 60 - k))
    )
    rsub = t.groupBy("stratum", "_rg").agg(F.sum("n_tokens").alias("_rn"))
    offs = (
        rsub.alias("a")
        .join(
            rsub.alias("b"),
            (F.col("b.stratum") == F.col("a.stratum"))
            & (F.col("b._rg") < F.col("a._rg")),
            "left",
        )
        .groupBy(F.col("a.stratum").alias("stratum"), F.col("a._rg").alias("_rg"))
        .agg(F.coalesce(F.sum("b._rn"), F.lit(0)).alias("_off"))
    )
    w = Window.partitionBy("stratum", "_rg").orderBy("_h", id_col)
    budget_map = F.create_map(
        *[F.lit(x) for s, b in sorted(budgets.items()) for x in (s, b)]
    )
    return (
        t.join(F.broadcast(offs), ["stratum", "_rg"])
        .select(
            "stratum",
            id_col,
            "n_tokens",
            (
                F.coalesce(
                    F.sum("n_tokens").over(
                        w.rowsBetween(Window.unboundedPreceding, -1)
                    ),
                    F.lit(0),
                )
                + F.col("_off")
            ).alias("tok_before"),
        )
        .where(F.col("tok_before") < budget_map[F.col("stratum")])
    )


def dsir_importance(
    raw: DataFrame,
    target: DataFrame,
    num_buckets: int = 4096,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    persisted_out: list | None = None,
) -> DataFrame:
    """DSIR importance weights (Xie et al., "Data Selection for Language
    Models via Importance Resampling", NeurIPS 2023): score every raw-corpus
    document by how much more likely its hashed n-gram profile is under a
    TARGET distribution than under the raw one — the standard recipe for
    steering a web-scale pretraining mix toward a quality/domain target
    without training a classifier.

    Features are the paper's: unigrams + bigrams hashed into ``num_buckets``
    buckets (here via the repo-canonical md5_long60 so the DuckDB oracle
    recomputes every bucket bit-for-bit). Both corpora fit add-``alpha``
    smoothed categorical distributions over the buckets; each raw doc's
    importance log-weight is

        log w(d) = Σ_b count_d[b] · (log p_target[b] − log p_raw[b]).

    Output: ``(doc_id, n_feats, logweight)`` per raw doc (``n_feats`` = its
    total hashed-gram count; empty docs score 0 with 0 feats). Feed
    ``exp(logweight)`` (or a shifted/clamped version) to
    :func:`weighted_sample` for the paper's Gumbel-top-k resampling step.

    Scale: the two distribution fits are one groupBy each, ``num_buckets``
    rows out — a fixed-size dimension joined (broadcast by AQE) onto the
    per-(doc, bucket) count stream; one final groupBy sums per doc. No
    driver state, no UDF, no global sort.
    """
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0 (smoothing), got {alpha}")
    from .util import md5_long60

    def doc_buckets(df: DataFrame) -> DataFrame:
        ws = _words(text_col)
        grams = F.concat(_word_ngrams(ws, 1), _word_ngrams(ws, 2))
        out = (
            df.select(F.col(id_col), F.explode(grams).alias("_g"))
            .select(id_col, (md5_long60(F.col("_g")) % num_buckets).alias("_b"))
            .groupBy(id_col, "_b")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        # 2-3 consumers each (dist fit, total, and the raw scoring pass):
        # persist when the caller manages lifecycle, else rely on recompute
        if persisted_out is not None:
            out = out.persist()
            persisted_out.append(out)
        return out

    db_raw = doc_buckets(raw)
    db_tgt = doc_buckets(target)

    def dist(db: DataFrame, prob_col: str) -> DataFrame:
        return db.groupBy("_b").agg(
            F.sum("_c").cast("double").alias(prob_col)
        )

    # unseen buckets fall back to the smoothed floor log(alpha / (T + aB));
    # the two 1-row corpus totals crossJoin onto the bucket dimension (at
    # most num_buckets rows after the full outer), so coalesce() fills the
    # floors without materializing unseen buckets or a global window
    aB = F.lit(float(alpha * num_buckets))
    ratio = (
        dist(db_tgt, "_nt")
        .join(dist(db_raw, "_nr"), "_b", "full_outer")
        # coalesce: an EMPTY corpus must hit the smoothed floor (total 0),
        # not propagate NULL through every log-ratio (the oracle coalesces)
        .crossJoin(
            db_tgt.agg(
                F.coalesce(F.sum("_c"), F.lit(0)).cast("double").alias("_tt")
            )
        )
        .crossJoin(
            db_raw.agg(
                F.coalesce(F.sum("_c"), F.lit(0)).cast("double").alias("_tr")
            )
        )
        .select(
            "_b",
            (
                F.log(
                    (F.coalesce("_nt", F.lit(0.0)) + F.lit(float(alpha)))
                    / (F.col("_tt") + aB)
                )
                - F.log(
                    (F.coalesce("_nr", F.lit(0.0)) + F.lit(float(alpha)))
                    / (F.col("_tr") + aB)
                )
            ).alias("_lr"),
        )
    )
    scored = (
        db_raw.join(ratio, "_b")
        .groupBy(id_col)
        .agg(
            F.sum("_c").alias("n_feats"),
            F.sum(F.col("_c") * F.col("_lr")).alias("logweight"),
        )
    )
    return (
        raw.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce("logweight", F.lit(0.0)).alias("logweight"),
        )
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: list[tuple[str, float]] | None = None,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/valid/test assignment by keyed hash — the
    split a TRAINING pipeline must use instead of ``randomSplit``:
    membership is a pure function of (id, salt), so a document keeps its
    split when the corpus grows, shrinks, repartitions, or reruns —
    the property that prevents silent train/test contamination across
    corpus versions (decontamination's sibling gate: ``corpus_
    decontaminate`` removes eval text, this keeps eval MEMBERSHIP
    stable). ``weights`` is an ordered list of (name, fraction) summing
    to 1; the md5-derived u ∈ [0,1) walks the cumulative thresholds.

    Row-local (one md5 + one CASE), shuffle-free, whole-stage-codegen'd;
    mirrors exactly into SQL for oracle checking.
    """
    weights = weights or [("train", 0.8), ("valid", 0.1), ("test", 0.1)]
    if not weights or abs(sum(w for _, w in weights) - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {weights}")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.col(id_col).cast("string"), F.lit(f":{salt}"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    expr = None
    cum = 0.0
    for name, w in weights[:-1]:
        cum += w
        cond = u < F.lit(cum)
        branch = F.lit(name)
        expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    last = F.lit(weights[-1][0])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def good_turing(
    counts: DataFrame,
    count_col: str = "cnt",
) -> DataFrame:
    """Good-Turing frequency-of-frequencies table with the classic
    re-estimates (Good 1953): from an (item, count) table, N_r = how
    many items occurred exactly r times, the adjusted count
    r* = (r+1)·N_{r+1}/N_r, and the unseen-mass estimate p0 = N_1/N —
    the question a corpus pipeline keeps asking in different clothes:
    how much vocabulary / how many entities / how many dup clusters have
    we NOT seen yet, and how hard are the singleton counts lying. The
    raw estimator is emitted un-smoothed (r* is NULL where N_{r+1} = 0,
    the well-known high-r sparsity; smoothing the N_r curve first is the
    caller's choice) — honest gaps beat silently interpolated ones.

    Scale: one groupBy to the count grain, one groupBy to the
    frequency-of-frequency grain (at most max-count rows), one
    self-join on r+1 — everything after the first aggregate is
    tiny-by-construction.

    Output: ``(r, n_r, r_star, unseen_mass)`` — unseen_mass constant
    across rows (N_1/N), exact rationals until the final division.
    """
    c = counts.select(F.col(count_col).cast("long").alias("_r")).where(
        F.col("_r") > 0
    )
    ff = c.groupBy("_r").agg(F.count(F.lit(1)).cast("long").alias("n_r"))
    nxt = ff.select((F.col("_r") - 1).alias("_r"), F.col("n_r").alias("_n_next"))
    tot = ff.agg(
        F.sum(F.col("_r") * F.col("n_r")).alias("_n_tot"),
        # an aggregate (not a filter) so a corpus with NO singletons still
        # yields its one row — unseen_mass is then exactly 0
        F.coalesce(
            F.sum(F.when(F.col("_r") == 1, F.col("n_r"))), F.lit(0)
        ).alias("_n1"),
    )
    return (
        ff.join(nxt, "_r", "left")
        .crossJoin(tot)
        .select(
            F.col("_r").alias("r"),
            "n_r",
            ((F.col("_r") + 1) * F.col("_n_next") / F.col("n_r")).alias(
                "r_star"
            ),
            (F.col("_n1") / F.col("_n_tot")).alias("unseen_mass"),
        )
    )


def bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 12,
) -> DataFrame:
    """Byte-pair-encoding merge learning (Sennrich, Haddow & Birch, ACL
    2016) — the tokenizer-training loop itself, run distributed: the single
    most load-bearing preprocessing artifact of an LLM pipeline is learned
    with exactly this greedy recurrence, and at 100 TB the word-frequency
    table it runs on is itself a distributed frame.

    Standard BPE training shape: the corpus reduces ONCE to the distinct
    (word, freq) table (training never rescans documents); every word is
    initialized as its space-joined character sequence; then ``n_merges``
    rounds of: count adjacent symbol pairs weighted by word freq -> take
    the argmax (ties: lexicographically smallest pair, so the result is a
    pure function of the corpus) -> replace every non-overlapping
    occurrence left-to-right (both engines' literal ``replace`` semantics,
    which IS the greedy leftmost merge order of the reference
    implementation).

    Output: one row per learned merge, ``(round, left, right, merged,
    pair_count)`` — rounds are 1-based and stop early if no pair remains.

    Scale: per round one map-side-combinable pair count over the VOCAB
    (not the corpus), one 1-row argmax collect (TakeOrderedAndProject),
    one narrow string rewrite, lineage truncated per round via eager
    localCheckpoint (each round's vocab is materialized once and freed
    with the session, the connected-components loop cost model) with a
    driver scalar per round instead of a convergence signature.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    words = (
        docs.select(F.explode(_words(text_col)).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            "freq",
            F.concat(
                F.lit(" "), F.regexp_replace(F.col("word"), "(.)", "$1 ")
            ).alias("repr"),
        )
    )
    cur = words.localCheckpoint(eager=True)
    spark = docs.sparkSession
    merges = []
    for rnd in range(1, n_merges + 1):
        # filter BEFORE the transform: sequence(0, -1) DESCENDS in Spark
        # (module docstring note), so 1-symbol words must never reach it
        pairs = (
            cur.where(F.size(F.split(F.trim(F.col("repr")), " ")) >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(split(trim(repr), ' ')) - 2), "
                        "i -> concat(split(trim(repr), ' ')[i], ' ', "
                        "split(trim(repr), ' ')[i + 1]))"
                    )
                ).alias("pair"),
            )
            .groupBy("pair")
            .agg(F.sum("freq").alias("c"))
        )
        best = pairs.orderBy(F.desc("c"), F.asc("pair")).limit(1).collect()
        if not best:
            break
        pair, cnt = best[0]["pair"], int(best[0]["c"])
        left, right = pair.split(" ", 1)
        merges.append((rnd, left, right, left + right, cnt))
        cur = cur.select(
            "freq",
            F.expr(
                "replace(repr, ' ' || '{p}' || ' ', ' ' || '{m}' || ' ')".format(
                    p=pair.replace("'", "\\'"), m=(left + right).replace("'", "\\'")
                )
            ).alias("repr"),
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "round long, left string, right string, merged string, pair_count long"
    )


def shard_assign(
    docs: DataFrame,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Balanced training-shard assignment — the deterministic LPT
    relaxation: documents are globally ranked by (token count desc, id
    asc) and dealt round-robin, shard = (rank − 1) mod ``n_shards``, so
    every shard receives one document from each consecutive size band
    (longest-processing-time-first's sortedness without its sequential
    argmin loop). For Zipf-ish document lengths this bounds the shard
    token spread by roughly one max-document per shard, which is what a
    trainer's data loader needs from its shards (hash_split gives UNBIASED
    shards; this gives SIZE-BALANCED ones — different contract).

    The global rank never materializes a single-partition sort: per
    distinct token count, a partitioned window ranks ids locally, and the
    cross-value offsets come from a triangle join over the (tiny) distinct
    token-count table — the quantile_top_shadowed / byte_pack_buckets
    two-level shape. Skew caveat: a corpus where a large fraction of
    documents share ONE exact token count funnels that value's tie-break
    window into few partitions; shard semantics are value-based, so such a
    spike can be pre-split by any deterministic id-hash sub-rank if it
    ever dominates (same remedy as byte_pack_buckets, documented not
    implemented — exact-equal-length spikes are rare in real text).

    Output: ``(id_col, n_tokens, rank, shard)`` — rank 1-based global,
    shard in [0, n_shards).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    t = docs.select(
        F.col(id_col),
        F.size(_words(text_col)).cast("long").alias("n_tokens"),
    )
    vc = t.groupBy("n_tokens").agg(F.count(F.lit(1)).alias("_cnt"))
    offs = (
        vc.alias("a")
        .join(vc.alias("b"), F.col("b.n_tokens") > F.col("a.n_tokens"), "left")
        .groupBy(F.col("a.n_tokens").alias("n_tokens"))
        .agg(F.coalesce(F.sum("b._cnt"), F.lit(0)).alias("_off"))
    )
    w = Window.partitionBy("n_tokens").orderBy(id_col)
    return (
        t.join(F.broadcast(offs), "n_tokens")
        .withColumn("rank", (F.col("_off") + F.row_number().over(w)).cast("long"))
        .select(
            id_col,
            "n_tokens",
            "rank",
            F.pmod(F.col("rank") - 1, F.lit(n_shards)).cast("long").alias("shard"),
        )
    )


def shard_balance(
    docs: DataFrame,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-shard accounting over :func:`shard_assign`: one row per shard
    with document count, token mass, and the min/max document sizes it
    received — the table a capacity planner reads before launching a
    training job. All exact integers."""
    a = shard_assign(docs, n_shards=n_shards, text_col=text_col, id_col=id_col)
    return a.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.min("n_tokens").cast("long").alias("min_tokens"),
        F.max("n_tokens").cast("long").alias("max_tokens"),
    )


def source_divergence(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between the unigram
    distributions of every source pair — the mixture-drift audit a
    multi-source corpus runs before training: two crawls feeding the
    same pipeline should show near-zero JSD; a source whose JSD against
    every sibling spikes changed its content mix (or its boilerplate).
    JSD(p, q) = ½·KL(p‖m) + ½·KL(q‖m) with m = (p+q)/2 and natural log —
    symmetric, bounded by ln 2, zero iff identical.

    Distributed shape: one token count per (source, word), one tiny
    source-pair self-join (S² pairs, S = #sources), two word-level joins
    fanning each pair over the UNION of its two vocabularies (absent
    words contribute their half-KL term with the other side's mass —
    never a full corpus-vocab cross product), one grouped sum. The float
    sum is rounded to 6 decimals at the boundary (the entropy-gate ln
    convention). Zero-mass terms contribute exactly 0 by construction.

    Output: ``(source_a, source_b, n_words_a, n_words_b, n_shared,
    jsd)``, source_a < source_b.
    """
    toks = docs.select(
        F.col(source_col).alias("_src"),
        F.explode(_words(text_col)).alias("_w"),
    )
    wc = toks.groupBy("_src", "_w").agg(F.count(F.lit(1)).alias("_c"))
    tot = wc.groupBy("_src").agg(F.sum("_c").alias("_t"))
    p = wc.join(tot, "_src").select(
        "_src", "_w", (F.col("_c") / F.col("_t")).alias("_p")
    )
    srcs = tot.select("_src")
    # S x S source pairs — S is the source COUNT (tens), so this cross
    # join is a deliberate tiny-dimension product, not a pair-space blowup
    pairs = (
        srcs.select(F.col("_src").alias("source_a"))
        .crossJoin(srcs.select(F.col("_src").alias("source_b")))
        .where(F.col("source_a") < F.col("source_b"))
    )
    a = pairs.join(
        p.select(F.col("_src").alias("source_a"), "_w", F.col("_p").alias("_pa")),
        "source_a",
    )
    b = pairs.join(
        p.select(F.col("_src").alias("source_b"), "_w", F.col("_p").alias("_pb")),
        "source_b",
    )
    merged = a.join(b, ["source_a", "source_b", "_w"], "full_outer").select(
        "source_a",
        "source_b",
        "_w",
        F.coalesce("_pa", F.lit(0.0)).alias("_pa"),
        F.coalesce("_pb", F.lit(0.0)).alias("_pb"),
    )
    m = (F.col("_pa") + F.col("_pb")) / 2
    term = (
        F.when(F.col("_pa") > 0, 0.5 * F.col("_pa") * F.log(F.col("_pa") / m)).otherwise(0.0)
        + F.when(F.col("_pb") > 0, 0.5 * F.col("_pb") * F.log(F.col("_pb") / m)).otherwise(0.0)
    )
    return (
        merged.groupBy("source_a", "source_b")
        .agg(
            F.sum((F.col("_pa") > 0).cast("long")).cast("long").alias("n_words_a"),
            F.sum((F.col("_pb") > 0).cast("long")).cast("long").alias("n_words_b"),
            F.sum(((F.col("_pa") > 0) & (F.col("_pb") > 0)).cast("long"))
            .cast("long")
            .alias("n_shared"),
            F.round(F.sum(term), 6).alias("jsd"),
        )
    )


def source_terms(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    top_n: int = 5,
    min_count: int = 5,
) -> DataFrame:
    """Distinctive vocabulary per source — the labeling companion to
    :func:`source_divergence`: for every source, the ``top_n`` words
    whose in-source rate most exceeds their rest-of-corpus rate,

        score(w, s) = (c_s / n_s) / ((c_rest + 1) / n_rest)

    (add-one on the rest count so source-exclusive words score finite and
    rank by how often the source actually uses them). ``min_count``
    drops noise words. The score is a FIXED three-operation IEEE sequence
    over exact integers — both engines execute the same divides on the
    same inputs, so ranking needs no rounding; ties break (word asc).

    One token count, one per-source total, one corpus total join, one
    bounded per-source top-n window. Output: ``(source, rank, word,
    n_in_source, score)``.
    """
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    toks = docs.select(
        F.col(source_col).alias("_src"), F.explode(_words(text_col)).alias("_w")
    )
    wc = toks.groupBy("_src", "_w").agg(F.count(F.lit(1)).alias("_c"))
    ns = wc.groupBy("_src").agg(F.sum("_c").alias("_ns"))
    ct = wc.groupBy("_w").agg(F.sum("_c").alias("_ct"))
    nt = ns.agg(F.sum("_ns").alias("_nt"))
    scored = (
        wc.join(ns, "_src")
        .join(ct, "_w")
        .crossJoin(F.broadcast(nt))
        .where(F.col("_c") >= min_count)
        .select(
            "_src",
            "_w",
            "_c",
            (
                (F.col("_c") / F.col("_ns"))
                / ((F.col("_ct") - F.col("_c") + 1) / (F.col("_nt") - F.col("_ns")))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("_src").orderBy(F.desc("score"), F.asc("_w"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_n)
        .select(
            F.col("_src").alias("source"),
            F.col("rank").cast("long").alias("rank"),
            F.col("_w").alias("word"),
            F.col("_c").cast("long").alias("n_in_source"),
            "score",
        )
    )


def bpe_encode(
    docs: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply learned BPE merges (the output of :func:`bpe_merges`) to the
    corpus and account tokens per document — the other half of the
    tokenizer story: training learns the merge list, the pipeline then
    needs tokens-per-doc for budgeting, packing, and the compression
    ratio the tokenizer actually achieves on ITS OWN corpus.

    Encoding replays the merges IN ROUND ORDER over the distinct-word
    vocabulary (never per occurrence: each word is encoded once, then
    documents join the word->symbol-count table), using the same literal
    space-delimited ``replace`` that training used — so a word's final
    symbol count is exactly what the learned tokenizer produces. The
    merge list is a driver-side collect of n_merges rows (tiny by
    construction — it IS the model).

    Output, one row per document with >= 1 word: ``(id_col, n_words,
    n_tokens, n_chars, compression)`` — compression = n_chars/n_tokens,
    an exact integer division.
    """
    mlist = [
        (r["left"], r["right"], r["merged"])
        for r in merges.orderBy("round").collect()
    ]
    vocab = (
        docs.select(F.explode(_words(text_col)).alias("word"))
        .where(F.col("word") != "")
        .distinct()
        .select(
            "word",
            F.concat(
                F.lit(" "), F.regexp_replace(F.col("word"), "(.)", "$1 ")
            ).alias("repr"),
        )
    )
    for i, (left, right, merged) in enumerate(mlist, 1):
        pair = f"{left} {right}"
        vocab = vocab.select(
            "word",
            F.expr(
                "replace(repr, ' ' || '{p}' || ' ', ' ' || '{m}' || ' ')".format(
                    p=pair.replace("'", "\\'"), m=merged.replace("'", "\\'")
                )
            ).alias("repr"),
        )
        if i % 64 == 0:
            # bound the replay plan (VERDICT r5 #2): the chained replace
            # projections nest n_merges deep — fine at gate-sized merge
            # lists, an analysis/codegen blowup at a real tokenizer's 10k+
            # merges (the doc_vocab task-binary failure mode). A lazy local
            # checkpoint every 64 merges truncates lineage to a bounded
            # depth; the vocab is distinct-words-sized, so the extra
            # materializations are cheap relative to any corpus join.
            vocab = vocab.localCheckpoint(eager=False)
    tok = vocab.select(
        "word",
        F.size(F.split(F.trim(F.col("repr")), " ")).cast("long").alias("_nsym"),
        F.length("word").cast("long").alias("_nch"),
    )
    dw = docs.select(F.col(id_col), F.explode(_words(text_col)).alias("word")).where(
        F.col("word") != ""
    )
    return (
        dw.join(tok, "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("_nsym").cast("long").alias("n_tokens"),
            F.sum("_nch").cast("long").alias("n_chars"),
        )
        .withColumn("compression", F.col("n_chars") / F.col("n_tokens"))
    )


def kn_bigram_probs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 50,
    discount: float = 0.75,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities (Kneser & Ney 1995;
    Chen & Goodman 1998's benchmark winner) — the smoothing a count-based
    corpus LM actually ships with, and the quantity behind KN-perplexity
    quality filters:

        P(w|v) = max(c(v,w) − d, 0) / c(v·)
                 + d · N1+(v·) / c(v·) · N1+(·w) / N1+(··)

    where c(v·) is v's total bigram count, N1+(v·) the distinct
    continuations of v, N1+(·w) the distinct histories of w (the
    "novel-continuation" unigram that makes KN famous), and N1+(··) the
    total bigram-type count. Every ingredient is an exact integer; the
    probability is a short fixed IEEE sequence rounded to 6 at the
    boundary.

    Returns the ``top_n`` corpus bigrams by (count desc, v asc, w asc)
    with their KN probability — deterministic selection, oracle-exact.
    Distributed shape: one lead-window bigram extraction, three
    map-side-combinable aggregations, two joins; the top-n is a bounded
    TakeOrdered, never a global sort.
    """
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    if not 0.0 < discount < 1.0:
        raise ValueError(f"discount must be in (0,1), got {discount}")
    d = float(discount)
    return (
        _kn_prob_full(docs, text_col, id_col, d)
        .select(
            "v",
            "w",
            F.col("c_vw").cast("long").alias("c_vw"),
            F.round("p_raw", 6).alias("p_kn"),
        )
        .orderBy(F.desc("c_vw"), F.asc("v"), F.asc("w"))
        .limit(top_n)
    )


def _kn_prob_full(docs, text_col, id_col, d):
    """Full (v, w, c_vw, p_raw) interpolated-KN table — the unrounded
    probability surface shared by the top-n report and greedy decoding."""
    seq = docs.select(
        F.col(id_col).alias("_r"),
        F.posexplode(_words(text_col)).alias("_pos", "_w"),
    )
    nxt = Window.partitionBy("_r").orderBy("_pos")
    bg = (
        seq.withColumn("_nx", F.lead("_w").over(nxt))
        .where(F.col("_nx").isNotNull())
        .groupBy(F.col("_w").alias("v"), F.col("_nx").alias("w"))
        .agg(F.count(F.lit(1)).alias("c_vw"))
    )
    hist = bg.groupBy("v").agg(
        F.sum("c_vw").alias("_cv"), F.count(F.lit(1)).alias("_n1v")
    )
    cont = bg.groupBy("w").agg(F.count(F.lit(1)).alias("_n1w"))
    nbt = bg.agg(F.count(F.lit(1)).alias("_nbt"))
    return (
        bg.join(hist, "v")
        .join(cont, "w")
        .crossJoin(F.broadcast(nbt))
        .select(
            "v",
            "w",
            "c_vw",
            (
                F.greatest(F.col("c_vw") - F.lit(d), F.lit(0.0)) / F.col("_cv")
                + F.lit(d) * F.col("_n1v") / F.col("_cv")
                * F.col("_n1w") / F.col("_nbt")
            ).alias("p_raw"),
        )
    )


def kn_greedy_decode(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_seeds: int = 5,
    steps: int = 6,
    discount: float = 0.75,
) -> DataFrame:
    """Greedy (argmax) decoding over the interpolated-KN bigram model —
    the deterministic decoding loop of count-based LM generation: seeds
    are the ``n_seeds`` most frequent corpus words (count desc, word asc)
    and each step moves to argmax_w P(w|cur), ties to the LEXICALLY
    SMALLEST w — both choices total orders, so the generated sequences
    are a pure function of the corpus that a SQL replay reproduces
    word-for-word (the decoding twin of the md5-seeded walk corpus; here
    the "sampler" is argmax, so no seeds are needed at all). A sequence
    ends early only if the current word was never a bigram history.

    Each step is one join of the |seeds|-row frontier against the KN
    surface + one grouped struct-argmax — frontier never grows. Output
    ``(seed, step, word, p_kn)`` with step 0 = the seed (p_kn 0.0 — a
    value no real transition can take, every KN probability is > 0).
    """
    if n_seeds < 1:
        raise ValueError(f"n_seeds must be >= 1, got {n_seeds}")
    if steps < 1:
        raise ValueError(f"steps must be >= 1, got {steps}")
    probs = _kn_prob_full(docs, text_col, id_col, float(discount)).localCheckpoint(
        eager=True
    )  # joined once per step
    wc = (
        docs.select(F.explode(_words(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    seeds = (
        wc.orderBy(F.desc("c"), F.asc("w"))
        .limit(n_seeds)
        .select(F.col("w").alias("seed"))
    )
    frontier = seeds.select("seed", F.col("seed").alias("word"))
    out = frontier.select(
        "seed",
        F.lit(0).cast("long").alias("step"),
        "word",
        F.lit(0.0).alias("p_kn"),
    )
    for t in range(1, steps + 1):
        # single-pass argmax: min over struct(-p, w) = highest p, ties to the
        # lexically SMALLEST w (IEEE negation is exact, so the -p order is the
        # exact reverse of the p order — no epsilon, no second aggregation)
        best = (
            frontier.join(probs, frontier["word"] == probs["v"])
            .groupBy("seed")
            .agg(F.min(F.struct((-F.col("p_raw")).alias("np"), F.col("w"))).alias("_m"))
            .select("seed", F.col("_m.w").alias("word"), (-F.col("_m.np")).alias("_p"))
        )
        frontier = best.select("seed", "word")
        out = out.unionByName(
            best.select(
                "seed",
                F.lit(t).cast("long").alias("step"),
                "word",
                F.round("_p", 6).alias("p_kn"),
            )
        )
    return out


def c4_line_filter(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 5,
    min_kept_lines: int = 3,
    min_kept_words: int = 50,
) -> DataFrame:
    """C4-style rule cleaning (Raffel et al., JMLR 2020 §2.2 — the
    published heuristics behind the C4 corpus, parameterized): per line
    (split on newlines), keep iff it ends with terminal punctuation
    (``.!?"'``) and carries at least ``min_words_per_line`` words; per
    document, keep iff at least ``min_kept_lines`` lines survive, the
    surviving mass is at least ``min_kept_words`` words, the text has no
    curly brace (code spill), and no "lorem ipsum" (placeholder spill) —
    each rule surfaced as its own column so the audit table shows WHY a
    document fell, which is what a curation dashboard needs.

    Pure JVM array expressions (split / filter / aggregate), one row in,
    one row out, no shuffle at all; every count is exact.

    Output: ``(id_col, n_lines, n_kept_lines, n_kept_words, has_brace,
    has_lorem, kept)``.
    """
    t = F.col(text_col)
    lines = F.split(t, r"\n")
    line_words = lambda ln: F.size(  # noqa: E731
        F.filter(F.split(ln, r"\s+"), lambda w: w != "")
    )
    is_kept = lambda ln: ln.rlike("[.!?\"']\\s*$") & (  # noqa: E731
        line_words(ln) >= min_words_per_line
    )
    kept_lines = F.filter(lines, is_kept)
    n_kept_words = F.aggregate(
        kept_lines, F.lit(0), lambda acc, ln: acc + line_words(ln)
    )
    has_brace = t.contains("{") | t.contains("}")
    has_lorem = F.lower(t).contains("lorem ipsum")
    return docs.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept_lines).cast("long").alias("n_kept_lines"),
        n_kept_words.cast("long").alias("n_kept_words"),
        has_brace.alias("has_brace"),
        has_lorem.alias("has_lorem"),
        (
            (F.size(kept_lines) >= min_kept_lines)
            & (n_kept_words >= min_kept_words)
            & ~has_brace
            & ~has_lorem
        ).alias("kept"),
    )


def heaps_curve(
    docs: DataFrame,
    ladder: list[int] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_ranges: int = 256,
) -> DataFrame:
    """Heaps'-law vocabulary-growth curve (Heaps 1978): vocabulary size
    and token mass after the first k documents of a DETERMINISTIC
    content-independent corpus order (md5(doc id), doc id — the
    pack_sequences order), for k on a power-of-two ladder. The curve's
    log-log slope is the β of V ≈ K·nᵝ — the corpus-health indicator
    that flags both boilerplate floods (β collapses) and OCR/garbage
    floods (β → 1).

    Distributed shape: the global doc rank uses the fixed bit-shift
    hash-range two-level pattern (per-range counts + broadcast offsets +
    partitioned windows — no single-partition sort, the
    byte_pack_buckets shape); each word's FIRST rank is one grouped min;
    ladder evaluation joins the tiny ladder table (broadcast) so every
    prefix point is one aggregation, never a rescan per k. All exact
    integers.

    Output: ``(k_docs, n_docs, n_tokens, vocab_size)`` — one row per
    ladder point k (n_docs = min(k, corpus size) actually included).
    """
    if ladder is not None and any(k < 1 for k in ladder):
        raise ValueError("ladder entries must be >= 1")
    k_bits = max(1, (n_ranges - 1).bit_length())
    t = docs.select(
        F.col(id_col).alias("_id"),
        _words(text_col).alias("_ws"),
        md5_long60(F.col(id_col).cast("string")).alias("_h"),
    ).withColumn("_rg", F.shiftright("_h", 60 - k_bits))
    rsub = t.groupBy("_rg").agg(F.count(F.lit(1)).alias("_rn"))
    offs = (
        rsub.alias("a")
        .join(rsub.alias("b"), F.col("b._rg") < F.col("a._rg"), "left")
        .groupBy(F.col("a._rg").alias("_rg"))
        .agg(F.coalesce(F.sum("b._rn"), F.lit(0)).alias("_off"))
    )
    w = Window.partitionBy("_rg").orderBy("_h", "_id")
    ranked = (
        t.join(F.broadcast(offs), "_rg")
        .withColumn("_rank", (F.col("_off") + F.row_number().over(w)).cast("long"))
        .select("_id", "_rank", "_ws")
        .localCheckpoint(eager=True)
    )
    if ladder is None:
        n = ranked.count()
        ladder, kk = [], 1
        while kk < n:
            ladder.append(kk)
            kk *= 2
        ladder.append(n)
    lad = F.broadcast(
        docs.sparkSession.createDataFrame([(int(k),) for k in sorted(set(ladder))], "k_docs long")
    )
    toks = ranked.select("_rank", F.size("_ws").cast("long").alias("_nt"))
    per_k_tokens = (
        lad.join(toks, toks["_rank"] <= lad["k_docs"])
        .groupBy("k_docs")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_nt").cast("long").alias("n_tokens"),
        )
    )
    first = (
        ranked.select("_rank", F.explode(F.array_distinct("_ws")).alias("_w"))
        .groupBy("_w")
        .agg(F.min("_rank").alias("_fr"))
    )
    per_k_vocab = (
        lad.join(first, first["_fr"] <= lad["k_docs"])
        .groupBy("k_docs")
        .agg(F.count(F.lit(1)).cast("long").alias("vocab_size"))
    )
    return (
        per_k_tokens.join(per_k_vocab, "k_docs", "left")
        .select(
            "k_docs",
            "n_docs",
            "n_tokens",
            F.coalesce("vocab_size", F.lit(0)).cast("long").alias("vocab_size"),
        )
    )


def coverage_select(
    docs: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 1,
) -> DataFrame:
    """Greedy maximum-coverage document selection (the classic (1−1/e)
    submodular baseline — Nemhauser/Wolsey/Fisher 1978 — applied to
    vocabulary coverage, the simplest instance of coverage-driven
    training-data selection): ``k`` rounds of picking the document that
    adds the most NOT-YET-COVERED distinct words (ties to the smallest
    id), accumulating the covered set. Deterministic: (gain desc, id
    asc) is a total order and the covered set is a pure function of the
    prefix.

    Per round: one anti-join of the (doc, word) postings against the
    covered vocabulary, one map-side-combinable gain count, one 1-row
    TakeOrdered argmax, one covered-set union — the BPE-loop cost model
    (driver holds one row per round, never data). Stops early when no
    document adds anything.

    Output: ``(round, doc_id, new_words, covered_total)``, 1-based
    rounds.
    """
    if k < 1 or ngram < 1:
        raise ValueError(f"k and ngram must be >= 1, got {k}, {ngram}")
    spark = docs.sparkSession
    units = _word_ngrams(_words(text_col), ngram)
    dw = (
        docs.select(F.col(id_col).alias("_d"), F.explode(units).alias("_w"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    covered = None
    rows = []
    total = 0
    for rnd in range(1, k + 1):
        remaining = dw if covered is None else dw.join(covered, "_w", "left_anti")
        best = (
            remaining.groupBy("_d")
            .agg(F.count(F.lit(1)).alias("_c"))
            .orderBy(F.desc("_c"), F.asc("_d"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        did, gain = best[0]["_d"], int(best[0]["_c"])
        total += gain
        rows.append((rnd, did, gain, total))
        picked = dw.where(F.col("_d") == did).select("_w")
        covered = (
            picked if covered is None else covered.union(picked).distinct()
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        rows, f"round long, {id_col} long, new_words long, covered_total long"
    )


def minhash_decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_family: str = "xx64",
) -> DataFrame:
    """Fuzzy benchmark decontamination — the MinHash-LSH companion of
    :func:`ngram_decontaminate`: flag training documents whose shingle-set
    Jaccard with ANY benchmark document reaches ``threshold``. Exact n-gram
    matching misses paraphrased/reformatted benchmark leakage; document-
    level near-duplicate matching (the Llama-2 / GPT-4-report style fuzzy
    pass) catches it.

    Cross-corpus LSH: both sides shingle once, MinHash-sign once, and meet
    ONLY inside shared band buckets — never train × benchmark all-pairs.
    The lossless size-ratio prefilter (J ≥ t ⇒ t ≤ |A|/|B| ≤ 1/t) runs on
    two longs per candidate before the exact shingle-array verify. With
    ``hash_family="md5"`` the entire candidate set is reproducible in ANSI
    SQL (the dedup_minhash oracle contract).

    Returns one row per CONTAMINATED train document:
    ``(id_col, n_matches, best_bench, best_jaccard)`` where best is the
    (jaccard, bench-id)-max match — highest Jaccard, ties to the larger
    benchmark id (a total order, so the row is parallelism-invariant).
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    from .blocking import minhash_signature
    from .dedup import _band_keys, _shingled

    sht = _shingled(train, text_col, id_col, n)
    shb = _shingled(benchmark, text_col, id_col, n)

    def blocked(sh, out_id, out_n):
        sig = sh.withColumn(
            "sig", minhash_signature(F.col("shingles"), num_hashes, hash_family)
        )
        return sig.select(
            F.col(id_col).alias(out_id),
            F.col("n_sh").alias(out_n),
            F.explode(_band_keys(num_hashes, bands, hash_family)).alias("bk"),
        )

    cand = (
        blocked(sht, "t_id", "n_t")
        .join(blocked(shb, "b_id", "n_b"), "bk")
        .where(F.least("n_t", "n_b") >= threshold * F.greatest("n_t", "n_b"))
        .select("t_id", "b_id")
        .distinct()
    )
    sa = sht.select(F.col(id_col).alias("t_id"), F.col("shingles").alias("sh_t"))
    sb = shb.select(F.col(id_col).alias("b_id"), F.col("shingles").alias("sh_b"))
    ver = (
        cand.join(sa, "t_id")
        .join(sb, "b_id")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_t", "sh_b"))
            / F.size(F.array_union("sh_t", "sh_b")),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return (
        ver.groupBy(F.col("t_id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.max(F.struct(F.col("jaccard").alias("j"), F.col("b_id").alias("b"))).alias("_m"),
        )
        .select(
            id_col,
            "n_matches",
            F.col("_m.b").alias("best_bench"),
            F.col("_m.j").alias("best_jaccard"),
        )
    )


def frequent_pairs(
    docs: DataFrame,
    min_support: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """A-priori level-2 frequent-pair mining over per-document word SETS
    (Agrawal & Srikant, VLDB 1994 — market-basket co-occurrence, the
    support-thresholded complement of PMI collocations: PMI surfaces
    surprising pairs, support mining surfaces RELIABLE ones):

        L1 = {w : docfreq(w) ≥ s};  pairs only within L1 (the A-priori
        monotonicity prune — support(a,b) ≤ min(support(a), support(b)),
        so no pair outside L1 × L1 can qualify)

    and support(a,b) = #docs containing both. The prune IS the scale
    story: the pair join runs over frequent-item postings only, so a
    long-tail vocabulary contributes nothing to the quadratic step, and
    within each doc the fan-out is C(|L1 ∩ doc|, 2), not C(|doc|, 2).

    Output: (item_a, item_b, support, supp_a, supp_b, lift) with
    item_a < item_b and lift = n·supp_ab/(supp_a·supp_b) — exact
    integers into one division.
    """
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1, got {min_support}")
    dt = (
        ensure_min_parallelism(docs, id_col)
        .select(id_col, F.explode(F.array_distinct(_words(text_col))).alias("w"))
    )
    s1 = dt.groupBy("w").agg(F.count(F.lit(1)).alias("supp"))
    l1 = s1.where(F.col("supp") >= min_support)
    pruned = dt.join(F.broadcast(l1.select("w")), "w")
    a = pruned.select(id_col, F.col("w").alias("item_a"))
    b = pruned.select(id_col, F.col("w").alias("item_b"))
    pairs = (
        a.join(b, id_col)
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= min_support)
    )
    nrow = docs.select(id_col).distinct().agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    return (
        pairs.join(l1.select(F.col("w").alias("item_a"), F.col("supp").alias("supp_a")), "item_a")
        .join(l1.select(F.col("w").alias("item_b"), F.col("supp").alias("supp_b")), "item_b")
        .crossJoin(F.broadcast(nrow))
        .select(
            "item_a",
            "item_b",
            "support",
            "supp_a",
            "supp_b",
            (
                F.col("_n") * F.col("support") / (F.col("supp_a") * F.col("supp_b"))
            ).alias("lift"),
        )
    )


def sinkhorn_drift(
    docs: DataFrame,
    n_iter: int = 10,
    reg: float = 0.5,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Entropic optimal-transport drift between CONSECUTIVE sources
    (Cuturi, NeurIPS 2013 "Sinkhorn Distances") under a levenshtein
    ground metric — the principled companion of the JS/PSI/KS drift
    audits: those compare probabilities token-by-token and read a
    renamed vocabulary as maximal drift; OT charges mass-movement by
    WORD distance (cost = levenshtein/maxlen), so typo- or
    inflection-level shifts cost little and true topic shifts cost a
    lot.

    Per source pair (consecutive in sorted source order — a
    deterministic panel, ranks via the window-free global_dense_rank):
    unigram distributions a, b over each side's support, Gibbs kernel
    K = exp(−C/reg), and ``n_iter`` synchronous Sinkhorn updates

        u ← a ⊘ (K v),   v ← b ⊘ (Kᵀ u),   v₀ = 1

    — every update one equi-join + one grouped sum over the (pair, w1,
    w2) kernel frame, ALL pairs advancing together (k pairs cost one
    scan per update, not k). Entropic OT is biased — OT_ε(a, a) > 0
    because the regularizer blurs the identity plan — so the output
    carries BOTH the raw transport cost Σ uᵢKᵢⱼvⱼCᵢⱼ and the debiased
    Sinkhorn divergence S = OT(a,b) − ½OT(a,a) − ½OT(b,b) (Genevay et
    al. 2018; ~0 for identical distributions, restoring metric sense;
    the self-pairs ride the same kernel frame and iterations). Also
    reported: the row-marginal L1 error Σ|u(Kv) − a| — the convergence
    certificate, not hidden. Fixed iteration count, identical IEEE
    expression trees in both engines (the pagerank contract;
    exp/levenshtein agree to the ulp).
    """
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if reg <= 0:
        raise ValueError(f"reg must be > 0, got {reg}")
    from .suffix import global_dense_rank

    wc = (
        docs.select(F.col(source_col).alias("src"), F.explode(_words(text_col)).alias("w"))
        .groupBy("src", "w")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    tot = wc.groupBy("src").agg(F.sum("_c").alias("_t"))
    dist = wc.join(tot, "src").select(
        "src", "w", (F.col("_c") / F.col("_t")).alias("p")
    )
    rk = global_dense_rank(docs.select(F.col(source_col).alias("src")), ["src"], "_rk")
    consec = (
        rk.select(F.col("src").alias("src_a"), "_rk")
        .join(
            rk.select(F.col("src").alias("src_b"), (F.col("_rk") - 1).alias("_rk")),
            "_rk",
        )
        .select("src_a", "src_b")
    )
    selfp = rk.select(
        F.col("src").alias("src_a"), F.col("src").alias("src_b")
    )
    pairs = consec.unionByName(selfp)
    A = pairs.join(
        dist.select(F.col("src").alias("src_a"), F.col("w").alias("w1"), F.col("p").alias("a")),
        "src_a",
    )
    B = pairs.join(
        dist.select(F.col("src").alias("src_b"), F.col("w").alias("w2"), F.col("p").alias("b")),
        "src_b",
    )
    cost = F.levenshtein("w1", "w2") / F.greatest(F.length("w1"), F.length("w2"))
    K = (
        A.join(B, ["src_a", "src_b"])
        .select(
            "src_a", "src_b", "w1", "w2", "a", "b",
            cost.alias("c"),
            F.exp(-cost / F.lit(reg)).alias("k"),
        )
        .localCheckpoint(eager=True)  # joined twice per update + twice at the end
    )
    akey = ["src_a", "src_b", "w1"]
    bkey = ["src_a", "src_b", "w2"]
    adist = K.select(*akey, "a").distinct().localCheckpoint(eager=True)
    bdist = K.select(*bkey, "b").distinct().localCheckpoint(eager=True)
    v = bdist.select(*bkey, F.lit(1.0).alias("v")).localCheckpoint(eager=True)
    u = None
    for _ in range(n_iter):
        kv = (
            K.join(v, bkey)
            .groupBy(*akey)
            .agg(F.sum(F.col("k") * F.col("v")).alias("_kv"))
        )
        u = (
            adist.join(kv, akey)
            .select(*akey, (F.col("a") / F.col("_kv")).alias("u"))
            .localCheckpoint(eager=True)
        )
        ku = (
            K.join(u, akey)
            .groupBy(*bkey)
            .agg(F.sum(F.col("k") * F.col("u")).alias("_ku"))
        )
        v = (
            bdist.join(ku, bkey)
            .select(*bkey, (F.col("b") / F.col("_ku")).alias("v"))
            .localCheckpoint(eager=True)
        )
    full = K.join(u, akey).join(v, bkey)
    costs = full.groupBy("src_a", "src_b").agg(
        F.sum(F.col("u") * F.col("k") * F.col("v") * F.col("c")).alias("ot_cost")
    )
    marg = (
        full.groupBy(*akey)
        .agg(F.sum(F.col("u") * F.col("k") * F.col("v")).alias("_row"))
        .join(adist, akey)
        .groupBy("src_a", "src_b")
        .agg(F.sum(F.abs(F.col("_row") - F.col("a"))).alias("marg_err"))
    )
    self_c = costs.where(F.col("src_a") == F.col("src_b")).select(
        F.col("src_a").alias("_s"), F.col("ot_cost").alias("_sc")
    )
    return (
        costs.where(F.col("src_a") != F.col("src_b"))
        .join(self_c.select(F.col("_s").alias("src_a"), F.col("_sc").alias("_ca")), "src_a")
        .join(self_c.select(F.col("_s").alias("src_b"), F.col("_sc").alias("_cb")), "src_b")
        .join(marg, ["src_a", "src_b"])
        .select(
            "src_a",
            "src_b",
            "ot_cost",
            (
                F.col("ot_cost") - F.lit(0.5) * F.col("_ca") - F.lit(0.5) * F.col("_cb")
            ).alias("sink_div"),
            "marg_err",
        )
    )


def mink_prob(
    docs: DataFrame,
    k_num: int = 1,
    k_den: int = 5,
    discount: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Min-K% prob membership signal (Shi et al., ICLR 2024 — the
    membership-inference detector behind benchmark-contamination audits):
    score a document by the MEAN of its bottom k fraction of bigram
    log-probabilities under the corpus-trained interpolated-KN model. A
    memorized/duplicated document has no surprising transitions, so even
    its WORST bigrams score high; fresh text always contains a low tail.
    Beside lm_perplexity (which averages everything and lets one rare
    word drown the signal), min-k% is the outlier-focused variant the
    contamination literature standardized on.

    The k fraction is a RATIONAL (k_num/k_den) and the cut
    b = ceil(m·k_num/k_den) is exact integer arithmetic — a float 0.2·m
    would round 7.000…01 up to 8 (the kind of knife-edge both engines
    must agree on). Per doc: sort the bigram log-probs (multiplicity
    kept — the token-stream convention), strict-left-fold the bottom b,
    divide. Docs with no bigrams are excluded. Output:
    (id_col, n_bigrams, mink_logp).

    Scale: one join of the exploded bigram stream against the KN surface
    (both corpus-sized), one per-doc sort of a doc-length array — never a
    corpus-wide window.
    """
    if k_num < 1 or k_den < k_num:
        raise ValueError(f"need 1 <= k_num <= k_den, got {k_num}/{k_den}")
    probs = _kn_prob_full(docs, text_col, id_col, float(discount))
    seq = docs.select(
        F.col(id_col).alias("_r"),
        F.posexplode(_words(text_col)).alias("_pos", "_w"),
    )
    nxt = Window.partitionBy("_r").orderBy("_pos")
    dbg = (
        seq.withColumn("_nx", F.lead("_w").over(nxt))
        .where(F.col("_nx").isNotNull())
        .select("_r", F.col("_w").alias("v"), F.col("_nx").alias("w"))
    )
    sc = dbg.join(probs.select("v", "w", "p_raw"), ["v", "w"]).select(
        "_r", F.log("p_raw").alias("_lp")
    )
    arr = sc.groupBy("_r").agg(
        F.array_sort(F.collect_list("_lp")).alias("_a"),
        F.count(F.lit(1)).alias("n_bigrams"),
    )
    b = F.floor(
        (F.col("n_bigrams") * k_num + (k_den - 1)) / k_den
    ).cast("int")
    bot = F.slice("_a", F.lit(1), b)
    return arr.select(
        F.col("_r").alias(id_col),
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        (
            F.aggregate(bot, F.lit(0.0), lambda acc, x: acc + x) / b
        ).alias("mink_logp"),
    )


def curation_funnel(
    docs: DataFrame,
    benchmark: DataFrame,
    min_tokens: int = 25,
    keep_lang: str = "en",
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    hash_family: str = "xx64",
) -> DataFrame:
    """The end-to-end curation funnel a pretraining corpus actually runs,
    as ONE composed plan with per-stage attrition accounting:

        input → exact dedup (keep min-id per byte-identical text)
              → benchmark decontamination (drop MinHash-LSH matches vs
                ``benchmark``, :func:`minhash_decontaminate` —
                post-dedup, the order that avoids re-flagging copies)
              → length floor (≥ ``min_tokens`` words)
              → language keep (``keep_lang``)

    Returns the FUNNEL, not the documents: one row per stage
    ``(stage_idx, stage, n_in, n_out, n_dropped)`` — the attrition table
    every curation report leads with, and the contract a pipeline can
    regress against (a silent dedup regression shows up as a changed
    row, not a vibe). Each stage is a pure DataFrame transform; the
    four 1-row counts assemble via union + a 5-row lag window.
    """
    if min_tokens < 0:
        raise ValueError(f"min_tokens must be >= 0, got {min_tokens}")
    canon = (
        docs.groupBy(text_col)
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    s1 = docs.join(canon, id_col)
    flagged = minhash_decontaminate(
        s1, benchmark, threshold=threshold, n=1,
        text_col=text_col, id_col=id_col, hash_family=hash_family,
    ).select(id_col)
    s2 = s1.join(flagged, id_col, "left_anti")
    s3 = s2.where(F.size(_words(text_col)) >= min_tokens)
    s4 = s3.where(F.col(lang_col) == keep_lang)

    def cnt(df, idx, name):
        return df.agg(
            F.lit(idx).alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).cast("long").alias("n_out"),
        )

    counts = (
        cnt(docs, 0, "input")
        .unionByName(cnt(s1, 1, "exact_dedup"))
        .unionByName(cnt(s2, 2, "decontaminate"))
        .unionByName(cnt(s3, 3, "length_floor"))
        .unionByName(cnt(s4, 4, "language"))
    )
    w = Window.orderBy("stage_idx")  # 5 rows — trivially single-partition
    return (
        counts.withColumn("n_in", F.lag("n_out").over(w))
        .where(F.col("stage_idx") > 0)
        .select(
            "stage_idx",
            "stage",
            F.col("n_in").cast("long").alias("n_in"),
            "n_out",
            (F.col("n_in") - F.col("n_out")).cast("long").alias("n_dropped"),
        )
    )
