"""Meta-blocking: prune a redundancy-positive block collection's comparison
graph before any pairwise scoring runs.

The scale problem (Papadakis et al., "Meta-Blocking: Taking Entity Resolution
to the Next Level", TKDE 2014): schema-agnostic blocking (token / phonetic /
shingle keys) is high-recall precisely because every record lands in many
blocks — but the union of within-block pair sets then explodes quadratically
in the frequent keys. Meta-blocking reframes the block collection as a graph
(records = nodes, "co-occur in ≥1 block" = edges), weights each edge by how
strongly the blocking evidence supports it, and prunes low-weight edges —
typically discarding >95% of comparisons while keeping nearly all matches,
BEFORE the expensive feature/scoring stage sees a single pair.

Pipeline (all keyed shuffles, nothing driver-side, no iteration):

1. **Block purging**: drop blocks larger than ``max_block_size`` (stop-word
   keys carry no discriminative signal and dominate the pair count) and
   singleton blocks (no pairs). This bounds the self-join fan-out at
   C(max_block_size, 2) per block — the hard cost cap, same role as
   ``cap_blocks`` on the surface-form path.
2. **Edge building**: within-block self-join (id_a < id_b), then one groupBy
   folds duplicate co-occurrences into the edge weight:
   - ``cbs`` — Common Blocks Scheme: #blocks the pair shares (integer, and
     therefore float-exact in the DuckDB oracle comparison);
   - ``js`` — Jaccard of the two records' retained block-key sets:
     cbs / (|B_a| + |B_b| − cbs).
3. **Weighted Node Pruning (WNP)**: per-node mean edge weight as a LOCAL
   threshold; an edge survives if its weight reaches the mean of EITHER
   endpoint's neighborhood. Node-centric pruning adapts to skew — a hub
   record with thousands of weak edges gets a high bar, a rare record keeps
   its only edge — with no global sort and no global threshold to tune.

At 100 TB: stage 1 is one count + one semi-join; stage 2's fan-out is capped
by purging; stage 3 is two aggregations over the edge list (node dimension ≪
edge dimension). Every step is a Catalyst-planned shuffle on a key — AQE
handles residual skew. The reference has no meta-blocking (its dictionary
blocks are exact-key, redundancy-free); this is the engine's scale path for
the redundancy-positive key families it adds (token/phonetic/LSH).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def meta_blocking_pairs(
    blocked: DataFrame,
    weighting: str = "cbs",
    max_block_size: int | None = None,
    id_col: str = "rec_id",
    persisted_out: list | None = None,
) -> DataFrame:
    """Prune ``(block_key, rec_id)`` assignments into a weighted candidate
    pair list via block purging + edge weighting + weighted node pruning.

    Returns ``(rec_id_a, rec_id_b, weight)`` with ``rec_id_a < rec_id_b`` —
    the surviving comparisons, ready for ``pair_features``.

    ``persisted_out`` receives the persisted edge DataFrame (3 consumers:
    the two node-threshold unions and the final semi-filter); callers
    unpersist after materializing, per the repo-wide cache lifecycle.
    """
    if weighting not in ("cbs", "js"):
        raise ValueError(f"weighting must be 'cbs' or 'js', got {weighting!r}")
    b = blocked.select("block_key", F.col(id_col).alias("rid")).distinct()

    # 1. block purging: singleton blocks emit nothing; oversized blocks are
    # stop-word keys — drop them entirely (the retained-key evidence is what
    # the weights measure, so purged keys also leave the js denominator)
    sizes = b.groupBy("block_key").agg(F.count(F.lit(1)).alias("_bs"))
    keep = sizes.where(F.col("_bs") >= 2)
    if max_block_size is not None:
        keep = keep.where(F.col("_bs") <= int(max_block_size))
    b = b.join(keep.select("block_key"), "block_key")

    # 2. within-block pairs -> one groupBy folds co-occurrences into cbs
    lhs = b.select("block_key", F.col("rid").alias("rec_id_a"))
    rhs = b.select("block_key", F.col("rid").alias("rec_id_b"))
    cooc = lhs.join(rhs, "block_key").where(F.col("rec_id_a") < F.col("rec_id_b"))
    edges = cooc.groupBy("rec_id_a", "rec_id_b").agg(
        F.count(F.lit(1)).alias("cbs")
    )
    if weighting == "js":
        nblocks = b.groupBy("rid").agg(F.count(F.lit(1)).alias("_nb"))
        edges = (
            edges.join(nblocks.withColumnRenamed("rid", "rec_id_a"), "rec_id_a")
            .withColumnRenamed("_nb", "_na")
            .join(nblocks.withColumnRenamed("rid", "rec_id_b"), "rec_id_b")
            .select(
                "rec_id_a",
                "rec_id_b",
                (
                    F.col("cbs")
                    / (F.col("_na") + F.col("_nb") - F.col("cbs"))
                ).alias("weight"),
            )
        )
    else:
        edges = edges.select(
            "rec_id_a", "rec_id_b", F.col("cbs").cast("double").alias("weight")
        )

    # 3 consumers (two node-threshold unions + the final semi-filter):
    # persist only when the caller manages the lifecycle — an unconditional
    # persist would leak the cache for the session on fire-and-forget calls
    if persisted_out is not None:
        edges = edges.persist()
        persisted_out.append(edges)

    # 3. WNP: per-node mean weight; edge survives if weight >= either
    # endpoint's mean. Mean of exact integers (cbs) is reproduced exactly by
    # the oracle; ties at the mean are kept on both sides (>=).
    node_w = (
        edges.select(F.col("rec_id_a").alias("rid"), "weight")
        .unionByName(edges.select(F.col("rec_id_b").alias("rid"), "weight"))
        .groupBy("rid")
        .agg(F.avg("weight").alias("_thr"))
    )
    return (
        edges.join(node_w.withColumnRenamed("rid", "rec_id_a"), "rec_id_a")
        .withColumnRenamed("_thr", "_ta")
        .join(node_w.withColumnRenamed("rid", "rec_id_b"), "rec_id_b")
        .where(
            (F.col("weight") >= F.col("_ta")) | (F.col("weight") >= F.col("_thr"))
        )
        .select("rec_id_a", "rec_id_b", "weight")
    )


def purge_blocks(
    blocked: DataFrame,
    max_total_pairs: int,
    key_col: str = "block_key",
    id_col: str = "rec_id",
) -> DataFrame:
    """BLOCK PURGING (Papadakis et al., "Blocking and Filtering
    Techniques for Entity Resolution", CSUR 2020 §4.1): enforce a GLOBAL
    comparison budget by dropping whole blocks LARGEST-FIRST until the
    surviving C(n,2) total fits — the coarse complement to
    :func:`minimel_spark.operators.blocking.cap_blocks` (which SPLITS
    oversized blocks, preserving some recall at bounded cost) and to
    :func:`meta_blocking_pairs` (which prunes edge-wise). Purging is
    what you run FIRST at web scale: the head of a Zipfian key
    distribution ("john", an empty-string artifact, a boilerplate
    token) carries millions of records and near-zero precision, and no
    per-pair machinery should ever see it.

    Deterministic schedule: blocks sorted by (pairs ASC, key ASC); the
    cumulative pair sum admits blocks until the budget is exhausted —
    so the SMALL, precise blocks always survive and a block is dropped
    only if admitting it would cross the budget (every later, larger
    block is then dropped too, ties by key). The cumulative window runs
    over the block-size AGGREGATE (one row per block) — the
    small-by-construction window exemption, same as pr_curve.

    Output: the surviving ``(block_key, id_col)`` assignments.
    """
    if max_total_pairs < 0:
        raise ValueError(
            f"max_total_pairs must be >= 0, got {max_total_pairs}"
        )
    b = blocked.select(F.col(key_col), F.col(id_col)).distinct()
    sizes = b.groupBy(key_col).agg(F.count(F.lit(1)).alias("_n"))
    sizes = sizes.withColumn("_p", F.expr("_n * (_n - 1) DIV 2"))
    w = Window.orderBy(F.asc("_p"), F.asc(key_col)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    kept = (
        sizes.withColumn("_cum", F.sum("_p").over(w))
        .where(F.col("_cum") <= max_total_pairs)
        .select(key_col)
    )
    return b.join(kept, key_col)
