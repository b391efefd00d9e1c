"""Link-graph centrality (SURVEY §4 LLM-pipeline family, round 5): PageRank
over a directed edge table — the page-importance signal crawl-curation
pipelines mix into quality scoring, and the second iterative-algorithm
workload in this repo next to large/small-star connected components
(`cluster.py`). The reference (bennokr/minimEL) has no graph layer; this is
Spark-first new work.

Scale design:
- synchronous power iteration: each round is ONE shuffle (contributions
  grouped by destination) plus a 1-row dangling-mass aggregate that joins
  back via broadcast — no global sort, no driver-side state beyond the two
  scalars (N, dangling sum shape).
- ``localCheckpoint(eager=True)`` per round truncates lineage exactly like
  the CC loop, so plans don't grow with iteration count.
- dangling nodes (out-degree 0) redistribute their mass uniformly — the
  standard formulation, so the operator is correct on arbitrary graphs, not
  just fixtures with guaranteed out-edges.
- ranks are exact IEEE doubles on both engines; the gate rounds to 6
  decimals, far above the ~1e-13 accumulation-order noise of a 10-iteration
  power series.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """(src, dst) directed simple edges + (node) vertex table ->
    (node, rank) after exactly ``n_iter`` synchronous iterations from the
    uniform distribution 1/N.

    r_{i+1}(v) = (1-d)/N + d * (Σ_{u→v} r_i(u)/outdeg(u) + dangling_i/N)

    where ``dangling_i`` is the total rank mass sitting on out-degree-0
    nodes at iteration i. ``nodes`` must contain every node id (isolated
    nodes included); ``edges`` should be deduplicated (parallel edges count
    multiple times otherwise). Fixed iteration count, not a convergence
    test: the result is a pure function of (edges, nodes, n_iter, damping),
    which is what lets DuckDB recompute it bit-close for the oracle.
    """
    edges = edges.select("src", "dst")
    n = nodes.count()
    # out-degrees are nodes-sized: NEVER broadcast-hinted (AQE may still pick
    # broadcast from runtime stats on small graphs); checkpointed once so the
    # two consumers per round (contrib + dangling) and all n_iter rounds read
    # one materialized table instead of re-running the groupBy 2*n_iter times.
    # Callers should persist ``edges`` — it is scanned once per iteration.
    deg = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(n_iter):
        with_deg = ranks.join(deg, "node", "left")
        contrib = (
            with_deg.where(F.col("deg").isNotNull())
            .join(edges, F.col("node") == F.col("src"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("contrib"))
        )
        dangling = with_deg.where(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang")
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce("contrib", F.lit(0.0)) + F.col("_dang") / n)
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
