"""Transitive clustering (SURVEY §2 M4 + §4 custom work): cosine edges over
shared-entity candidate pairs, then iterative large-star/small-star connected
components on DataFrames.

Reference: minimel/clean.py:87-126 (``cluster``) — a sequential dict walk whose
label propagation is iteration-order dependent. The order-independent semantics
is the transitive closure of the thresholded cosine edge set (SURVEY §7 risk
note), which is exactly what connected components computes; the pairwise-F1
acceptance test compares against that closure.

Scale design:
- edge generation is a self-join on ``qid`` (anchors sharing a candidate
  entity). Hot entities (a 'john smith' qid shared by m anchors) create m²
  pair blowup, so ``max_anchors_per_entity`` caps each entity's anchor list to
  its top-K by normalized weight (deterministic order) before the join — the
  per-block pair-cap pattern the north rule names. AQE skew-join splits what
  remains.
- connected components is the Kiveris et al. alternating large-star/small-star
  algorithm: O(log n) rounds, each round two self-aggregating shuffles;
  ``localCheckpoint()`` every round truncates lineage so plans don't grow.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def similarity_edges(
    candidates: DataFrame,
    score_threshold: float = 0.5,
    max_anchors_per_entity: int | None = None,
) -> DataFrame:
    """(anchor, qid, weight) -> (src, dst, score) anchor pairs with cosine
    similarity over log1p/L2-normalized candidate weight vectors above the
    threshold (clean.py:88-113)."""
    w = Window.partitionBy("anchor")
    vec = (
        candidates.withColumn("lw", F.log1p(F.col("weight")))
        .withColumn("norm", F.sqrt(F.sum(F.col("lw") * F.col("lw")).over(w)))
        .withColumn("nw", F.col("lw") / F.col("norm"))
        .select("anchor", "qid", "nw")
    )
    if max_anchors_per_entity:
        we = Window.partitionBy("qid").orderBy(F.desc("nw"), F.asc("anchor"))
        vec = (
            vec.withColumn("r", F.row_number().over(we))
            .where(F.col("r") <= max_anchors_per_entity)
            .drop("r")
        )
    a = vec.alias("a")
    b = vec.alias("b")
    return (
        a.join(b, "qid")
        .where(F.col("a.anchor") < F.col("b.anchor"))
        .groupBy(F.col("a.anchor").alias("src"), F.col("b.anchor").alias("dst"))
        .agg(F.sum(F.col("a.nw") * F.col("b.nw")).alias("score"))
        .where(F.col("score") > score_threshold)
    )


def _symmetrize(edges: DataFrame) -> DataFrame:
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return edges.select("src", "dst").union(rev).where(F.col("src") != F.col("dst")).distinct()


def _large_star(nbrs: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to
    min(N(u) ∪ {u})."""
    m = nbrs.groupBy("src").agg(F.least(F.min("dst"), F.first("src")).alias("m"))
    return (
        nbrs.join(m, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges high->low; for each u: connect all smaller neighbors and u
    itself to min(N⁻(u) ∪ {u})."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).where(F.col("src") != F.col("dst")).distinct()
    m = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    pairs = (
        oriented.join(m, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .union(m.select(F.col("src"), F.col("m").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    return pairs


def connected_components(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """(src, dst) undirected edges -> (node, component) where component is the
    minimum node id (any orderable type) in the node's component.

    Alternating large-star/small-star; converges when the oriented edge set is
    a stable star forest (checked via count + order-insensitive checksum —
    two cheap aggregates per round on a locally-checkpointed frame).
    """
    cur = _symmetrize(edges).localCheckpoint(eager=True)
    prev_sig = None
    for _ in range(max_iter):
        ls = _large_star(cur)
        # _small_star orients high->low itself, so feeding it the raw
        # large-star output is equivalent to symmetrizing first — one fewer
        # union+distinct shuffle per round.
        ss = _small_star(ls)
        cur = _symmetrize(ss).localCheckpoint(eager=True)
        sig_row = cur.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("src", "dst")).alias("h"),
        ).first()
        sig = (sig_row["n"], sig_row["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    # cur is symmetric star edges; component id = min(neighbor, self)
    comp = cur.groupBy("src").agg(F.least(F.min("dst"), F.first("src")).alias("component"))
    return comp.select(F.col("src").alias("node"), "component")


def cluster_candidates(
    candidates: DataFrame,
    score_threshold: float = 0.5,
    max_anchors_per_entity: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Full M4 stage (clean.py:87-126): returns (membership, cluster_scores).

    membership: (anchor, cluster_id) — cluster_id = min anchor in the component;
    singleton anchors are their own cluster.
    cluster_scores: (cluster_id, qid, weight) — per-cluster sum of the
    log1p/L2-normalized member weights (the reference's Counter-sum of
    normalized scores, clean.py:121-125), long-form instead of the reference's
    two-space-joined dict key.
    """
    w = Window.partitionBy("anchor")
    vec = (
        candidates.withColumn("lw", F.log1p(F.col("weight")))
        .withColumn("nw", F.col("lw") / F.sqrt(F.sum(F.col("lw") * F.col("lw")).over(w)))
        .select("anchor", "qid", "nw")
    )
    edges = similarity_edges(candidates, score_threshold, max_anchors_per_entity)
    cc = connected_components(edges)
    membership = (
        candidates.select("anchor").distinct()
        .join(cc.withColumnRenamed("node", "anchor"), "anchor", "left")
        .select(
            "anchor", F.coalesce("component", "anchor").alias("cluster_id")
        )
    )
    cluster_scores = (
        vec.join(membership, "anchor")
        .groupBy("cluster_id", "qid")
        .agg(F.sum("nw").alias("weight"))
    )
    return membership, cluster_scores
