"""Distributed suffix-array construction by prefix doubling + LCP by binary
lifting — the exact-substring layer of training-data dedup (Lee et al., ACL
2022 "Deduplicating Training Data Makes Language Models Better" builds a
suffix array to find verbatim repeats of unknown length; Flick & Aluru,
SC'15, is the distributed prefix-doubling formulation this follows).

Window-hash dedup (`dedup.passage_overlap`, `corpus.dup_ngram_coverage`)
needs the repeat length L chosen in advance; the suffix order finds MAXIMAL
repeats of any length in O(log maxlen) rounds, each round one equi-join +
one global dense rank. Nothing here materializes a suffix's token list —
suffixes exist only as (doc, pos, rank) triples, which is what makes the
construction linear in corpus size instead of quadratic.

Scale notes:
- `global_dense_rank` is the one primitive everything rides on: an
  order-preserving dense rank of distinct key tuples with NO
  single-partition window — range-repartition, per-partition local rank,
  and a P-row offset collect (the `multimodal.byte_pack_buckets`
  distributed-prefix-sum pattern generalized to arbitrary keys).
- rank tables are localCheckpointed once per round and re-joined, so the
  doubling loop is rounds × O(n) join work; the LCP lifting re-joins each
  of the rounds+1 tables twice against the adjacent-pair frame.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .util import words_lower


def _global_dense_rank_with_total(
    df: DataFrame, key_cols: list[str], out_col: str = "rank"
) -> tuple[DataFrame, int]:
    """``global_dense_rank`` plus the total distinct-key count (already
    computed for the prefix-sum offsets — returning it is free, and the
    doubling loop uses it to stop as soon as ranks stabilize)."""
    cols = [F.col(c) for c in key_cols]
    spark = df.sparkSession
    p = spark.sparkContext.defaultParallelism
    d = (
        df.select(*key_cols)
        .distinct()
        .repartitionByRange(p, *cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin sampled boundaries for both passes
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    ranked = d.withColumn("_lr", F.row_number().over(w).cast("long"))
    cnts = {
        r["_pid"]: r["c"]
        for r in d.groupBy("_pid").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    off, acc = [], 0
    for pid in sorted(cnts):
        off.append((pid, acc))
        acc += cnts[pid]
    offdf = spark.createDataFrame(off or [(0, 0)], "_pid int, _off long")
    out = ranked.join(F.broadcast(offdf), "_pid").select(
        *key_cols, (F.col("_off") + F.col("_lr")).alias(out_col)
    )
    return out, acc


def global_dense_rank(
    df: DataFrame, key_cols: list[str], out_col: str = "rank"
) -> DataFrame:
    """1-based, order-preserving dense rank of the DISTINCT ``key_cols``
    tuples of ``df`` — without an unpartitioned window.

    Range-repartition the distinct keys (equal keys colocate; partition i
    holds a contiguous key range below partition i+1), rank locally per
    partition (window partitioned by spark_partition_id), then shift each
    partition by the total distinct count of the partitions before it — a
    P-row collect + broadcast, the distributed prefix sum. The sampled
    range boundaries are pinned by an eager localCheckpoint so the count
    pass and the final plan see the SAME placement; the resulting rank
    (offset + local position) is the key's position in the sorted distinct
    order — deterministic regardless of where the sampled boundaries fell.

    Returns the distinct keys + ``out_col``. NULL keys are not supported
    (range partitioning and the local order would disagree on placement).
    """
    return _global_dense_rank_with_total(df, key_cols, out_col)[0]


def token_suffix_ranks(
    docs: DataFrame,
    rounds: int = 7,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> list[DataFrame]:
    """Prefix-doubling rank tables r_0 .. r_rounds over every token suffix
    of every document; each table is (id_col, pos, rank) with 1-based pos.

    r_k ranks suffixes by their first 2^k tokens under the convention that
    positions past the document end carry the shared sentinel rank −1
    (smaller than every real rank, so a proper-prefix suffix sorts before
    its extensions — list semantics). Because the sentinel is SHARED,
    identical suffixes (same content, same length, any document) keep
    identical final ranks — by design: rank equality at round k certifies
    the suffixes agree on their first 2^k tokens, which is exactly what
    the LCP lifting consumes. ``2^rounds`` must reach the longest
    document; an under-budget table under-distinguishes deep suffixes (the
    gate's oracle, which sorts true suffixes, would catch it as a hash
    mismatch).

    Each round: one self-join to fetch the rank 2^k ahead, one
    global_dense_rank of the (r1, r2) pairs, one join back — all ranks
    stay (doc, pos, long) triples; no suffix text is ever materialized.
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    base = docs.select(
        F.col(id_col).alias("_d"),
        F.posexplode(words_lower(F.col(text_col))).alias("_p0", "_tok"),
    ).select("_d", (F.col("_p0") + 1).alias("pos"), "_tok")
    r0 = (
        base.join(global_dense_rank(base, ["_tok"], "rank"), "_tok")
        .select("_d", "pos", "rank")
        .localCheckpoint(eager=True)
    )
    n_suffixes = r0.count()  # cheap count on the checkpointed table
    tables = [r0]
    prev_total: int | None = None
    for k in range(rounds):
        step = 2**k
        cur = tables[-1]
        ahead = cur.select(
            "_d", (F.col("pos") - step).alias("pos"), F.col("rank").alias("_r2")
        )
        pairkeys = (
            cur.join(ahead, ["_d", "pos"], "left")
            .select(
                "_d",
                "pos",
                F.col("rank").alias("_r1"),
                F.coalesce("_r2", F.lit(-1)).alias("_r2"),
            )
        )
        ranks, total = _global_dense_rank_with_total(pairkeys, ["_r1", "_r2"], "rank")
        tables.append(
            pairkeys.join(ranks, ["_r1", "_r2"])
            .select("_d", "pos", "rank")
            .localCheckpoint(eager=True)
        )
        # early termination (r6, bit-exact): each round REFINES the previous
        # partition (its key embeds the previous rank), so an unchanged
        # class count means an identical partition — and a stable partition
        # is a fixed point of doubling, making every further table row-for-
        # row identical to this one. Likewise once every suffix is alone in
        # its class (total == n_suffixes) no round can split further. The
        # LCP lifting consumes whatever prefix of the table list exists:
        # with all ranks distinct at level k, no adjacent pair agrees on
        # 2^k tokens, so the dropped higher levels could never advance the
        # lifted LCP (their equality test would always fail) — downstream
        # output is unchanged, the corpus just stops paying for doubling
        # rounds past its repeat structure (guide §1.2: don't compute what
        # you throw away).
        if total == n_suffixes or (prev_total is not None and total == prev_total):
            break
        prev_total = total
    return tables


def longest_repeated_substrings(
    docs: DataFrame,
    top_n: int = 10,
    rounds: int = 7,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``top_n`` adjacent suffix-array pairs by longest common prefix —
    the maximal verbatim repeats of the corpus, at ANY length (the longest
    repeated substring is row 1; every repeat of length ≥ L appears as
    some adjacent pair with lcp ≥ L, the standard SA/LCP property).

    Suffix order = (final rank, doc, pos) — the shared-sentinel rank
    already orders by content with shorter-prefix-first, and the explicit
    (doc, pos) tie-break makes equal-content suffixes a total order both
    engines reproduce. Adjacency comes from a global dense rank of the
    order triple (each suffix meets only its successor — never a pairwise
    blowup); LCP is computed by BINARY LIFTING over the doubling tables:
    descend k = rounds..0, and when both suffixes' rank_k at offset
    +lcp-so-far exist and agree, advance by 2^k — O(log maxlen) joins,
    no token arrays shipped to pairs; the final cap min(remaining
    lengths) settles the shared-sentinel case (identical-to-end
    suffixes). The repeated text itself is reconstructed at the END, for
    the top rows only, by slicing the winning document's token array.

    Output: (da, pa, db, pb, lcp, repeat) ordered by (lcp desc, da, pa).
    """
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    tables = token_suffix_ranks(docs, rounds, text_col, id_col)
    final = tables[-1]
    idx = global_dense_rank(final, ["rank", "_d", "pos"], "idx")
    a = idx.select(
        F.col("_d").alias("da"), F.col("pos").alias("pa"), "idx"
    )
    b = idx.select(
        F.col("_d").alias("db"), F.col("pos").alias("pb"), (F.col("idx") - 1).alias("idx")
    )
    pairs = a.join(b, "idx").select("da", "pa", "db", "pb").withColumn(
        "lcp", F.lit(0).cast("long")
    )
    for k in range(len(tables) - 1, -1, -1):
        step = 2**k
        rk = tables[k]
        ra = rk.select(
            F.col("_d").alias("da"), F.col("pos").alias("_qa"), F.col("rank").alias("_ra")
        )
        rb = rk.select(
            F.col("_d").alias("db"), F.col("pos").alias("_qb"), F.col("rank").alias("_rb")
        )
        pairs = (
            pairs.withColumn("_qa", F.col("pa") + F.col("lcp"))
            .withColumn("_qb", F.col("pb") + F.col("lcp"))
            .join(ra, ["da", "_qa"], "left")
            .join(rb, ["db", "_qb"], "left")
            .withColumn(
                "lcp",
                F.when(
                    F.col("_ra").isNotNull()
                    & F.col("_rb").isNotNull()
                    & (F.col("_ra") == F.col("_rb")),
                    F.col("lcp") + step,
                ).otherwise(F.col("lcp")),
            )
            .drop("_qa", "_qb", "_ra", "_rb")
        )
    dl = docs.select(
        F.col(id_col).alias("_d"), F.size(words_lower(F.col(text_col))).alias("_dl")
    )
    pairs = (
        pairs.join(dl.select(F.col("_d").alias("da"), F.col("_dl").alias("_la")), "da")
        .join(dl.select(F.col("_d").alias("db"), F.col("_dl").alias("_lb")), "db")
        .withColumn(
            "lcp",
            F.least(
                "lcp",
                F.col("_la") - F.col("pa") + 1,
                F.col("_lb") - F.col("pb") + 1,
            ),
        )
        .select("da", "pa", "db", "pb", "lcp")
    )
    top = pairs.orderBy(F.desc("lcp"), F.asc("da"), F.asc("pa")).limit(top_n)
    toks = docs.select(
        F.col(id_col).alias("da"), words_lower(F.col(text_col)).alias("_ws")
    )
    return top.join(toks, "da").select(
        "da",
        "pa",
        "db",
        "pb",
        "lcp",
        F.concat_ws(
            " ", F.slice("_ws", F.col("pa"), F.greatest("lcp", F.lit(1)))
        ).alias("repeat"),
    ).withColumn(
        "repeat", F.when(F.col("lcp") > 0, F.col("repeat")).otherwise(F.lit(""))
    )
