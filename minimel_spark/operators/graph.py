"""Link-graph analytics (SURVEY §4 LLM-pipeline family, round 5): PageRank
over a directed edge table — the page-importance signal crawl-curation
pipelines mix into quality scoring, and the second iterative-algorithm
workload in this repo next to large/small-star connected components
(`cluster.py`) — plus degree-ordered triangle counting / local clustering
coefficients (link-farm and spam-cluster detection run on exactly this
signal). The reference (bennokr/minimEL) has no graph layer; this is
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


def triangle_counts(
    edges: DataFrame, nodes: DataFrame, persisted_out: list | None = None
) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over the
    UNDIRECTED simple graph induced by ``edges`` (direction and parallel
    edges are erased; self-loops dropped).

    Returns (node, deg, n_tri, lcc) for every row of ``nodes`` —
    ``deg`` the undirected degree, ``n_tri`` the number of triangles the
    node belongs to, ``lcc = 2*n_tri / (deg*(deg-1))`` (0.0 when deg < 2).

    Scale design — the degree-ordered node-iterator (the standard
    MapReduce formulation, e.g. Suri & Vassilvitskii WWW'11):
    every wedge is enumerated ONLY at its lowest-(degree, node) apex, by
    orienting each undirected edge from the (deg, node)-smaller endpoint to
    the larger and self-joining on the apex. A celebrity node with 10^7
    neighbors therefore never enumerates its neighbor pairs — wedge count is
    bounded by sum(min-degree-endpoint deg) ~ m^1.5 instead of sum(deg^2),
    which is the difference between feasible and not on a power-law web
    graph. The plan is three shuffles total (degree agg, apex self-join,
    closing-edge join) + one explode/agg for per-node attribution; no global
    sort, no driver state, no iteration.

    ``und`` feeds two consumers, ``deg`` four and the oriented edge set
    three — pass ``persisted_out`` (a list the caller unpersists) so each is
    computed once instead of per branch; without a receiver the plan is
    fully lazy (correct, but re-derives those subtrees per consumer).
    """

    def _pin(df):
        if persisted_out is not None:
            df = df.persist()
            persisted_out.append(df)
        return df

    und = _pin(
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    deg = _pin(
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient a->b by the total order (deg, node); carried degrees make the
    # orientation a projection, not another join downstream
    ranked = (
        und.join(deg.withColumnRenamed("node", "a"), "a")
        .withColumnRenamed("deg", "deg_a")
        .join(deg.withColumnRenamed("node", "b"), "b")
        .withColumnRenamed("deg", "deg_b")
    )
    lo_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = _pin(
        ranked.select(
            F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
            F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
        )
    )
    # wedges at the apex: (lo -> v, lo -> w), v before w in the SAME total
    # order the orientation used, so each wedge appears exactly once and its
    # candidate closing edge (v -> w) is already in oriented form
    e1 = oriented.select(F.col("lo").alias("apex"), F.col("hi").alias("v"))
    e2 = oriented.select(F.col("lo").alias("apex"), F.col("hi").alias("w"))
    dv = deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "deg_v")
    dw = deg.withColumnRenamed("node", "w").withColumnRenamed("deg", "deg_w")
    wedges = (
        e1.join(e2, "apex")
        .join(dv, "v")
        .join(dw, "w")
        .where(
            (F.col("deg_v") < F.col("deg_w"))
            | ((F.col("deg_v") == F.col("deg_w")) & (F.col("v") < F.col("w")))
        )
        .select("apex", "v", "w")
    )
    tris = wedges.join(
        oriented.select(F.col("lo").alias("v"), F.col("hi").alias("w")),
        ["v", "w"],
    )
    per_node = (
        tris.select(
            F.explode(F.array(F.col("apex"), F.col("v"), F.col("w"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    return (
        nodes.select("node")
        .join(deg, "node", "left")
        .join(per_node, "node", "left")
        .select(
            "node",
            F.coalesce("deg", F.lit(0)).alias("deg"),
            F.coalesce("n_tri", F.lit(0)).alias("n_tri"),
            F.when(
                F.coalesce("deg", F.lit(0)) >= 2,
                2.0
                * F.coalesce("n_tri", F.lit(0))
                / (F.col("deg") * (F.col("deg") - F.lit(1))),
            )
            .otherwise(F.lit(0.0))
            .alias("lcc"),
        )
    )


def _symmetrized(edges: DataFrame) -> DataFrame:
    """Undirected simple-graph adjacency as a directed both-ways edge list:
    self-loops dropped, direction erased, parallel edges collapsed."""
    und = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    return und.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionAll(und.select(F.col("b").alias("src"), F.col("a").alias("dst")))


def lpa_communities(
    edges: DataFrame, nodes: DataFrame, n_iter: int = 5
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan, Albert
    & Kumara 2007, the deterministic synchronous variant) over the
    undirected simple graph induced by ``edges``: every node starts with
    its own id as label, and each round simultaneously adopts the most
    frequent label among its neighbors, ties broken by SMALLEST label —
    both choices deterministic, so the result is a pure function of
    (edges, nodes, n_iter), which is what lets DuckDB replay it exactly
    (the classic asynchronous/random-order variant is neither
    reproducible nor oracle-able). Isolated nodes keep their own label.
    Returns (node, community) after exactly ``n_iter`` rounds.

    Scale design: one shuffle per round (neighbor-label count grouped by
    (node, label), reduced by the min-struct argmax to one row per node)
    plus the nodes-side left join; ``localCheckpoint(eager=True)`` per
    round truncates lineage exactly like the CC and PageRank loops.
    Synchronous LPA can oscillate on bipartite structures — the fixed
    round count bounds that by construction (callers wanting a fixpoint
    check compare rounds n and n+1).
    """
    sym = _symmetrized(edges).localCheckpoint(eager=True)
    labels = nodes.select("node", F.col("node").alias("lbl"))
    for _ in range(n_iter):
        counted = (
            sym.join(
                labels.select(F.col("node").alias("src"), "lbl"), "src"
            )
            .groupBy(F.col("dst").alias("node"), "lbl")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        best = counted.groupBy("node").agg(
            F.min(F.struct((-F.col("_c")).alias("_nc"), F.col("lbl")))[
                "lbl"
            ].alias("_new")
        )
        labels = (
            labels.join(best, "node", "left")
            .select("node", F.coalesce("_new", "lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
    return labels.select("node", F.col("lbl").alias("community"))


def k_core(
    edges: DataFrame, nodes: DataFrame, k: int = 3, n_iter: int = 10
) -> DataFrame:
    """k-core decomposition by synchronous peeling over the undirected
    simple graph induced by ``edges``: each round simultaneously removes
    every node whose degree WITHIN the surviving subgraph is < ``k``.
    Returns (node, in_core) for every row of ``nodes`` after exactly
    ``n_iter`` rounds — the fixed round count (not a convergence test)
    keeps the result a pure function of the inputs for the DuckDB replay;
    peeling is monotone, so once a round removes nothing the remaining
    set IS the k-core, and callers can verify fixpoint by comparing
    ``n_iter`` and ``n_iter + 1`` (the graph gate's pytest does).

    Scale design: one shuffle per round — the active edge set is the
    both-ways list semi-joined to the active nodes on BOTH endpoints, and
    the per-src count feeds the >= k filter directly; no windows, no
    driver state beyond the loop counter. ``localCheckpoint(eager=True)``
    per round truncates lineage. Rounds-to-fixpoint is bounded by the
    peeling depth (the graph's degeneracy ordering), typically tiny even
    on web graphs; a celebrity node costs nothing special — counting is
    a grouped aggregate, never a neighbor-list materialization.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    sym = _symmetrized(edges).localCheckpoint(eager=True)
    active = nodes.select("node")
    for _ in range(n_iter):
        active = (
            sym.join(active.withColumnRenamed("node", "src"), "src")
            .join(active.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.count(F.lit(1)).alias("_deg"))
            .where(F.col("_deg") >= k)
            .select("node")
            .localCheckpoint(eager=True)
        )
    return nodes.select("node").join(
        active.withColumn("in_core", F.lit(True)), "node", "left"
    ).select("node", F.coalesce("in_core", F.lit(False)).alias("in_core"))


def neighborhood_evidence(
    pairs: DataFrame,
    links: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    rec_col: str = "rec_id",
    nbr_col: str = "nbr_id",
) -> DataFrame:
    """One-step collective-ER evidence (Bhattacharya & Getoor's relational
    signal; also the classic link-prediction feature set): for each
    candidate record pair, how much NEIGHBORHOOD the two records share in
    a bipartite link table (customer→supplier, author→venue, page→host…).

    Output: ``pairs`` keys + ``n_a``/``n_b`` (distinct neighbor degrees),
    ``n_shared`` (common neighbors), ``jacc_nbr`` (|∩|/|∪|, 0.0 when both
    neighborhoods are empty) and ``adamic_adar``
    (Σ_{z∈∩} 1/ln(deg(z)) — rare shared neighbors weigh more; a shared
    neighbor always has degree ≥ 2 in the deduplicated link table, so the
    log never vanishes). Pairs with no shared neighbor get zeros, not
    dropped — the evidence column composes with the string-similarity
    features in pairs.py by a plain join.

    Scale: ``links`` is deduplicated once, degrees are two small
    aggregations, shared neighbors come from two id-equi joins
    (pairs⋈links on a, then on (b, neighbor)) and ONE groupBy on the pair
    key — the same blocked-pair discipline as every comparison operator
    here; nothing is all-pairs and the fan-out is bounded by true degree."""
    l = links.select(
        F.col(rec_col).alias("_rec"), F.col(nbr_col).alias("_nbr")
    ).distinct()
    deg_rec = l.groupBy("_rec").agg(F.count(F.lit(1)).alias("_deg"))
    deg_nbr = l.groupBy("_nbr").agg(F.count(F.lit(1)).alias("_dz"))
    base = pairs.select(id_a, id_b)
    shared = (
        base.join(
            l.select(F.col("_rec").alias(id_a), F.col("_nbr").alias("_z")), id_a
        )
        .join(
            l.select(F.col("_rec").alias(id_b), F.col("_nbr").alias("_z")),
            [id_b, "_z"],
        )
        .join(deg_nbr.withColumnRenamed("_nbr", "_z"), "_z")
        .groupBy(id_a, id_b)
        .agg(
            F.count(F.lit(1)).alias("_n_shared"),
            F.sum(1.0 / F.log("_dz")).alias("_aa"),
        )
    )
    out = (
        base.join(
            deg_rec.select(F.col("_rec").alias(id_a), F.col("_deg").alias("_na")),
            id_a,
            "left",
        )
        .join(
            deg_rec.select(F.col("_rec").alias(id_b), F.col("_deg").alias("_nb")),
            id_b,
            "left",
        )
        .join(shared, [id_a, id_b], "left")
    )
    na = F.coalesce(F.col("_na"), F.lit(0))
    nb = F.coalesce(F.col("_nb"), F.lit(0))
    ns = F.coalesce(F.col("_n_shared"), F.lit(0))
    union = na + nb - ns
    return out.select(
        id_a,
        id_b,
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        ns.cast("long").alias("n_shared"),
        F.when(union > 0, ns.cast("double") / union)
        .otherwise(F.lit(0.0))
        .alias("jacc_nbr"),
        F.coalesce(F.col("_aa"), F.lit(0.0)).alias("adamic_adar"),
    )


def transitivity_audit(edges: DataFrame) -> DataFrame:
    """Global transitivity audit of a match-decision edge set — the ER
    consistency check that motivates correlation clustering: a pairwise
    matcher that says a~b and b~c but NOT a~c produces an open wedge, and
    every open wedge is a decision some clustering step must overrule.
    One row: ``(n_nodes, n_edges, n_wedges, n_closed, n_open,
    transitivity)`` where ``n_wedges = Σ_v C(deg(v), 2)`` (all 2-paths),
    ``n_closed = 3·triangles`` (wedge instances whose closing edge
    exists), ``n_open`` their difference, and ``transitivity`` the global
    clustering coefficient ``n_closed / n_wedges`` (0.0 on a wedge-free
    graph).

    Scale: the wedge count comes from the DEGREE DISTRIBUTION alone (one
    aggregate — no wedge is enumerated), and the triangle total reuses
    ``triangle_counts``' degree-ordered enumeration (m^1.5-bounded, the
    Suri-Vassilvitskii bound) — so the audit never materializes the
    quadratic neighbor pairs of a hub node."""
    caches: list = []
    try:
        und = (
            edges.select("src", "dst")
            .where(F.col("src") != F.col("dst"))
            .select(
                F.least("src", "dst").alias("a"),
                F.greatest("src", "dst").alias("b"),
            )
            .distinct()
            .persist()
        )
        caches.append(und)
        deg = (
            und.select(F.col("a").alias("node"))
            .unionAll(und.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        base = deg.agg(
            F.count(F.lit(1)).alias("n_nodes"),
            (F.sum(F.col("deg") * (F.col("deg") - 1)) / 2)
            .cast("long")
            .alias("n_wedges"),
        )
        m = und.agg(F.count(F.lit(1)).alias("n_edges"))
        nodes = deg.select("node")
        tri = triangle_counts(
            und.select(F.col("a").alias("src"), F.col("b").alias("dst")),
            nodes,
            persisted_out=caches,
        ).agg(F.sum("n_tri").cast("long").alias("_tri3"))
        out = (
            base.crossJoin(F.broadcast(m))
            .crossJoin(F.broadcast(tri))
            .select(
                "n_nodes",
                F.col("n_edges").cast("long").alias("n_edges"),
                "n_wedges",
                F.col("_tri3").alias("n_closed"),
                (F.col("n_wedges") - F.col("_tri3")).alias("n_open"),
                F.when(
                    F.col("n_wedges") > 0,
                    F.col("_tri3").cast("double") / F.col("n_wedges"),
                )
                .otherwise(F.lit(0.0))
                .alias("transitivity"),
            )
        )
        rows = out.collect()
        return edges.sparkSession.createDataFrame(rows, out.schema)
    finally:
        for c in caches:
            c.unpersist()


def knn_sparsify(
    edges: DataFrame,
    k: int,
    mutual: bool = True,
    src_col: str = "src",
    dst_col: str = "dst",
    score_col: str = "score",
) -> DataFrame:
    """k-nearest-neighbor sparsification of a similarity graph — the
    hub-degree control that belongs BETWEEN pair scoring and transitive
    clustering: a generic surface ("john smith", a boilerplate footer)
    accrues thousands of above-threshold edges, and connected components
    will happily weld everything it touches into one mega-entity. Keeping
    each node's top-k edges (score descending, neighbor-id tie-break)
    bounds every degree by k; ``mutual=True`` keeps a pair only when BOTH
    endpoints rank each other (the mutual-kNN graph — the standard
    de-hubbing construction, e.g. Maier et al., NeurIPS 2009 on kNN-graph
    cluster identification), which provably cannot create a hub and is
    the right default feeding :func:`minimel_spark.operators.cluster.
    connected_components`. ``mutual=False`` keeps the union instead
    (higher recall, degree bound 2k).

    Scale: one symmetrize, one per-node window (partitioned by node,
    bounded by its degree — the same shape as every blocker here), one
    self-join of the kept directed edges on the reversed pair for the
    mutual test. No global ordering anywhere.

    Output: ``(src, dst, score)`` with src < dst, each surviving pair
    once.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    e = edges.select(
        F.col(src_col).alias("_a"),
        F.col(dst_col).alias("_b"),
        F.col(score_col).cast("double").alias("_s"),
    )
    sym = e.unionByName(
        e.select(F.col("_b").alias("_a"), F.col("_a").alias("_b"), "_s")
    )
    w = Window.partitionBy("_a").orderBy(F.desc("_s"), F.asc("_b"))
    kept = (
        sym.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("_a", "_b", "_s")
    )
    fwd = kept.where(F.col("_a") < F.col("_b"))
    rev = kept.where(F.col("_a") > F.col("_b")).select(
        F.col("_b").alias("_a"), F.col("_a").alias("_b")
    )
    if mutual:
        pairs = fwd.join(rev, ["_a", "_b"])
    else:
        keys = fwd.select("_a", "_b").unionByName(rev).distinct()
        canon = e.select(
            F.least("_a", "_b").alias("_a"),
            F.greatest("_a", "_b").alias("_b"),
            "_s",
        )
        pairs = keys.join(canon, ["_a", "_b"])
    return pairs.select(
        F.col("_a").alias(src_col),
        F.col("_b").alias(dst_col),
        F.col("_s").alias(score_col),
    )


def hits(
    edges: DataFrame,
    nodes: DataFrame,
    n_iter: int = 10,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg, JACM 1999) over a directed simple
    edge table — the query-independent counterpart signal to
    :func:`pagerank`: a page is a good AUTHORITY when good hubs point at it,
    a good HUB when it points at good authorities; crawl curation mixes both
    (directory/index pages score as hubs, canonical content as authorities —
    PageRank alone cannot tell them apart, it has one score).

    Exactly ``n_iter`` synchronous rounds from the uniform L1 vector 1/N:

        a'_{i+1}(v) = Σ_{u→v} h_i(u)     then a_{i+1} = a' / Σ a'
        h'_{i+1}(u) = Σ_{u→v} a_{i+1}(v) then h_{i+1} = h' / Σ h'

    L1 normalization (sum, not the textbook L2) is deliberate: the scores
    stay a probability-like distribution, the fixed point is the same up to
    scale (normalization choice never changes the ORDER or the ratio
    structure of either eigenvector), and the oracle replays it with plain
    sums — no sqrt of a sum whose accumulation order differs between
    engines. Fixed iteration count, not a convergence test: the result is a
    pure function of (edges, nodes, n_iter), the pagerank determinism
    contract. Nodes with no in-edges get authority 0, no out-edges hub 0;
    if the graph has NO edges at all every score is 0 (both normalizers
    vanish — guarded division, not NaN).

    Scale: per round two grouped-sum shuffles (one per direction) + two
    1-row normalizer aggregates joined back via broadcast crossJoin;
    ``localCheckpoint(eager=True)`` per round truncates lineage like the CC
    and pagerank loops. Callers should persist ``edges`` — scanned twice
    per iteration.
    """
    edges = edges.select("src", "dst")
    n = nodes.count()
    hubs = nodes.select("node", F.lit(1.0 / n).alias("h"))
    auths = None
    for _ in range(n_iter):
        a_raw = (
            hubs.join(edges, hubs["node"] == edges["src"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("h").alias("a_raw"))
        )
        a_norm = a_raw.agg(F.coalesce(F.sum("a_raw"), F.lit(0.0)).alias("_za"))
        auths = (
            nodes.join(a_raw, "node", "left")
            .crossJoin(F.broadcast(a_norm))
            .select(
                "node",
                F.when(
                    F.col("_za") > 0,
                    F.coalesce("a_raw", F.lit(0.0)) / F.col("_za"),
                )
                .otherwise(F.lit(0.0))
                .alias("a"),
            )
            .localCheckpoint(eager=True)
        )
        h_raw = (
            auths.join(edges, auths["node"] == edges["dst"])
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("a").alias("h_raw"))
        )
        h_norm = h_raw.agg(F.coalesce(F.sum("h_raw"), F.lit(0.0)).alias("_zh"))
        hubs = (
            nodes.join(h_raw, "node", "left")
            .crossJoin(F.broadcast(h_norm))
            .select(
                "node",
                F.when(
                    F.col("_zh") > 0,
                    F.coalesce("h_raw", F.lit(0.0)) / F.col("_zh"),
                )
                .otherwise(F.lit(0.0))
                .alias("h"),
            )
            .localCheckpoint(eager=True)
        )
    return hubs.join(auths, "node").select(
        "node", F.col("h").alias("hub"), F.col("a").alias("authority")
    )


def personalized_pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    seeds: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Personalized PageRank (the topic-sensitive variant, Haveliwala WWW
    2002): identical power iteration to :func:`pagerank` except BOTH the
    teleport mass and the dangling mass return to the SEED distribution
    (uniform over ``seeds``) instead of uniform-over-all — so rank measures
    proximity to the seed set. This is the crawl-frontier / seed-expansion
    scorer: given a vetted seed list (quality domains, known-entity pages),
    PPR ranks every page by how reachable it is from the seeds, which is
    exactly the expansion order a focused crawl wants (and, in the ER
    graph, ranks records by linkage proximity to a labeled cluster).

        r_{i+1}(v) = (1−d)·s(v) + d·(Σ_{u→v} r_i(u)/outdeg(u)
                                      + dangling_i·s(v))

    with s(v) = 1/|S| on seeds, 0 elsewhere; r_0 = s. Fixed iteration
    count, pure function of the inputs (the pagerank determinism
    contract); non-seed nodes unreachable from any seed stay exactly 0.
    ``seeds`` is one ``node`` column and must be a subset of ``nodes``.

    Scale: same per-round cost as pagerank — one contribution shuffle, one
    1-row dangling aggregate broadcast back, lineage truncated per round;
    the seed indicator joins once (left join, null -> 0 mass) and is
    nodes-sized at most. Callers should persist ``edges``.
    """
    edges = edges.select("src", "dst")
    ns = seeds.count()
    if ns == 0:
        raise ValueError("seeds must be non-empty")
    deg = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    svec = nodes.join(
        seeds.select("node").withColumn("_s0", F.lit(1.0 / ns)), "node", "left"
    ).select("node", F.coalesce("_s0", F.lit(0.0)).alias("_s"))
    svec = svec.localCheckpoint(eager=True)  # read every round
    ranks = svec.select("node", F.col("_s").alias("rank"))
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
            svec.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(1.0 - damping) * F.col("_s")
                    + F.lit(damping)
                    * (
                        F.coalesce("contrib", F.lit(0.0))
                        + F.col("_dang") * F.col("_s")
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def cocitation_coupling(
    edges: DataFrame, min_shared: int = 1
) -> DataFrame:
    """Second-order link similarity on a directed graph (Small 1973 /
    Kessler 1963, the bibliometric pair): two nodes are related when the
    GRAPH agrees even though no direct edge exists —

    - ``coupling``:   |out(a) ∩ out(b)| — pages citing the same targets
      (bibliographic coupling; near-mirror detection in a crawl graph);
    - ``cocitation``: |in(a) ∩ in(b)| — pages the web cites together
      (topical siblinghood; the hub evidence HITS aggregates, kept
      pairwise here).

    Both are one self-join on the shared endpoint + a grouped count —
    per shared endpoint of degree d the join emits C(d, 2) pairs, so the
    cost is Σ C(deg, 2), the same skew profile as every shared-key pair
    generator here (cap upstream via degree filters when a supernode
    appears; the operator itself stays exact). Parallel duplicate edges
    are collapsed first so counts are DISTINCT shared neighbors.

    Output: ``(kind, node_a, node_b, n_shared)`` with node_a < node_b,
    kind ∈ {'coupling', 'cocitation'}, n_shared >= ``min_shared``.
    """
    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")
    e = edges.select("src", "dst").distinct()

    def _pairs(key: str, other: str, kind: str) -> DataFrame:
        a = e.select(F.col(key).alias("_k"), F.col(other).alias("node_a"))
        b = e.select(F.col(key).alias("_k"), F.col(other).alias("node_b"))
        return (
            a.join(b, "_k")
            .where(F.col("node_a") < F.col("node_b"))
            .groupBy("node_a", "node_b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
            .where(F.col("n_shared") >= min_shared)
            .select(F.lit(kind).alias("kind"), "node_a", "node_b", "n_shared")
        )

    return _pairs("dst", "src", "coupling").unionByName(
        _pairs("src", "dst", "cocitation")
    )


def bowtie_regions(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_rounds: int = 40,
) -> DataFrame:
    """Bowtie decomposition of a directed graph (Broder et al., WWW 2000
    — THE structural census of the web graph): pick a deterministic seed
    (max total degree, ties to the smallest node id — a heuristic member
    of the giant SCC on web-like graphs), compute its forward and
    backward reachable sets by bounded BFS, and classify every node:

      core          — reachable both ways (the seed's SCC);
      in            — reaches the core but is not reached by it;
      out           — reached by the core but cannot reach it;
      tendril       — connected to the bowtie only when directions are
                      ignored (hangs off IN/OUT);
      disconnected  — in another weak component entirely.

    Each BFS round is one frontier join + one anti-join on a
    locally-checkpointed frontier (the connected-components loop cost
    model); rounds are bounded by the graph's diameter and hard-capped
    at ``max_rounds``. Deterministic: the seed is a total-order argmax
    and BFS reachability is order-free.

    Output: ``(node, region)``, one row per node of ``edges``' endpoint
    set union the optional ``nodes`` frame.
    """
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    e = e.localCheckpoint(eager=True)
    ends = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    )
    if nodes is not None:
        ends = ends.union(nodes.select("node"))
    allnodes = ends.distinct().localCheckpoint(eager=True)
    deg = (
        ends.groupBy("node")
        .agg(F.count(F.lit(1)).alias("_d"))
        .agg(F.min(F.struct((-F.col("_d")).alias("_nd"), F.col("node").alias("_n"))).alias("_m"))
        .select(F.col("_m._n").alias("node"))
    )
    seed = deg.localCheckpoint(eager=True)

    def _reach(edgeset: DataFrame) -> DataFrame:
        seen = seed
        frontier = seed
        for _ in range(max_rounds):
            nxt = (
                frontier.join(edgeset, frontier["node"] == edgeset["src"])
                .select(F.col("dst").alias("node"))
                .distinct()
                .join(seen, "node", "left_anti")
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                break
            seen = seen.union(nxt).localCheckpoint(eager=True)
            frontier = nxt
        return seen

    fw = _reach(e)
    bw = _reach(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    core = fw.join(bw, "node", "left_semi").localCheckpoint(eager=True)
    # undirected reachability from the bowtie (core ∪ in ∪ out = fw ∪ bw)
    und = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    und = und.localCheckpoint(eager=True)
    bowtie = fw.union(bw).distinct().localCheckpoint(eager=True)
    attached = bowtie
    frontier = bowtie
    for _ in range(max_rounds):
        nxt = (
            frontier.join(und, frontier["node"] == und["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(attached, "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        attached = attached.union(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return (
        allnodes.join(core.withColumn("_core", F.lit(1)), "node", "left")
        .join(fw.withColumn("_fw", F.lit(1)), "node", "left")
        .join(bw.withColumn("_bw", F.lit(1)), "node", "left")
        .join(attached.withColumn("_att", F.lit(1)), "node", "left")
        .select(
            "node",
            F.when(F.col("_core").isNotNull(), F.lit("core"))
            .when(F.col("_bw").isNotNull(), F.lit("in"))
            .when(F.col("_fw").isNotNull(), F.lit("out"))
            .when(F.col("_att").isNotNull(), F.lit("tendril"))
            .otherwise(F.lit("disconnected"))
            .alias("region"),
        )
    )


def distance_census(
    edges: DataFrame,
    n_seeds: int = 4,
    max_dist: int = 12,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """Shortest-path distance census from deterministic seeds — the
    sampled distance distribution behind effective-diameter estimates
    (the ANF/HyperANF question asked exactly, for a seed panel): from
    the ``n_seeds`` smallest node ids, BFS out to ``max_dist`` hops and
    histogram the first-visit distances; nodes a seed cannot reach
    within the bound report as distance −1 (the bound is part of the
    semantics, so the result is a pure function of the graph).

    Each BFS round is one frontier join + one anti-join per the
    connected-components cost model, all seeds advancing TOGETHER in one
    (seed, node) state table — k seeds cost one scan per round, not k.

    Output: ``(seed, dist, n_nodes)`` — dist in [0, max_dist] ∪ {−1}.
    """
    if n_seeds < 1 or max_dist < 1:
        raise ValueError(
            f"n_seeds and max_dist must be >= 1, got {n_seeds}, {max_dist}"
        )
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    e = e.localCheckpoint(eager=True)
    ends = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    )
    if nodes is not None:
        ends = ends.union(nodes.select("node"))
    allnodes = ends.distinct().localCheckpoint(eager=True)
    seeds = (
        allnodes.orderBy("node").limit(n_seeds).select(F.col("node").alias("seed"))
    ).localCheckpoint(eager=True)
    state = seeds.select("seed", F.col("seed").alias("node"), F.lit(0).alias("dist"))
    state = state.localCheckpoint(eager=True)
    frontier = state
    for d in range(1, max_dist + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .select("seed", F.col("dst").alias("node"))
            .distinct()
            .join(state.select("seed", "node"), ["seed", "node"], "left_anti")
            .withColumn("dist", F.lit(d))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        state = state.union(nxt).localCheckpoint(eager=True)
        frontier = nxt
    reached = state.groupBy("seed", "dist").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )
    n_all = allnodes.count()
    unreached = (
        state.groupBy("seed")
        .agg((F.lit(n_all) - F.count(F.lit(1))).cast("long").alias("n_nodes"))
        .where(F.col("n_nodes") > 0)
        .select("seed", F.lit(-1).alias("dist"), "n_nodes")
    )
    return reached.unionByName(unreached).select(
        "seed", F.col("dist").cast("long").alias("dist"), "n_nodes"
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity coefficient (Newman, PRL 2002): the Pearson
    correlation of endpoint TOTAL degrees over the undirected edge list —
    positive on social graphs (hubs befriend hubs), negative on the web
    and most crawl graphs (hubs link to leaves), so a sign flip between
    crawls is a structural drift alarm no volume metric catches.

    Computed on the symmetrized edge multiset (each undirected edge
    contributes both orientations — the standard estimator): with
    x = deg(src), y = deg(dst) over that multiset,

        r = (Σxy/m − (Σx/m)·(Σy/m)) / sqrt((Σx²/m − (Σx/m)²) ·
                                           (Σy²/m − (Σy/m)²))

    All Σ are exact integers; r is one fixed IEEE sequence, rounded 6.
    Degenerate graphs (all degrees equal — zero variance) report NULL.

    One degree aggregate + two joins + one moment aggregate. Output one
    row: ``(n_nodes, n_edges, assortativity)``.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sym = und.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    j = (
        sym.join(deg.select(F.col("node").alias("u"), F.col("deg").alias("_x")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("deg").alias("_y")), "v")
    )
    m = j.agg(
        F.count(F.lit(1)).alias("_m"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sx2"),
        F.sum(F.col("_y") * F.col("_y")).alias("_sy2"),
    )
    cov = F.col("_sxy") / F.col("_m") - (F.col("_sx") / F.col("_m")) * (
        F.col("_sy") / F.col("_m")
    )
    vx = F.col("_sx2") / F.col("_m") - (F.col("_sx") / F.col("_m")) * (
        F.col("_sx") / F.col("_m")
    )
    vy = F.col("_sy2") / F.col("_m") - (F.col("_sy") / F.col("_m")) * (
        F.col("_sy") / F.col("_m")
    )
    n_nodes = deg.count()
    n_edges_row = und.count()
    return m.select(
        F.lit(n_nodes).cast("long").alias("n_nodes"),
        F.lit(n_edges_row).cast("long").alias("n_edges"),
        F.round(
            F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy)), 6
        ).alias("assortativity"),
    )


def ktruss_peel(edges: DataFrame, k: int = 4, rounds: int = 4) -> DataFrame:
    """Fixed-round k-truss peeling audit (Cohen 2008): each round computes
    per-edge triangle SUPPORT on the current undirected simple edge set and
    drops every edge whose support is below ``k - 2``; the fixpoint of this
    peel is the (unique, maximal) k-truss — the densest cohesion core
    standard community pipelines extract above k-core. The round count is
    FIXED, not run-to-convergence, so the output is a pure function of
    (edges, k, rounds) that an unrolled SQL replay can recompute exactly;
    the ``converged`` flag on the last row says whether the fixpoint was
    reached within the budget.

    Returns one audit row per round:
    ``(round, n_edges, n_dropped, n_remaining, converged)`` where
    ``n_edges`` is the edge count entering the round and
    ``converged = (n_dropped == 0)``.

    Scale design: support comes from degree-ordered triangle enumeration
    (Suri & Vassilvitskii WWW'11) — every triangle is found ONLY at its
    lowest-(degree, node) apex by orienting edges small→large, so a hub
    with 10^7 neighbors never enumerates its neighbor pairs and wedge work
    is m^1.5-bounded. Each round is three shuffles (degree agg, apex
    self-join, closing-edge join) + one explode/agg + one anti-peel join;
    ``localCheckpoint(eager=True)`` per round truncates lineage exactly
    like the CC loop. Per-round edge counts ride along as side outputs of
    the checkpoint action — no extra jobs beyond one count per round.
    """
    if k < 3:
        raise ValueError(f"k must be >= 3, got {k}")
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    spark = edges.sparkSession
    min_sup = k - 2
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    audit = []
    n_before = und.count()
    for rnd in range(1, rounds + 1):
        deg = (
            und.select(F.col("a").alias("node"))
            .unionAll(und.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        # orient each edge from the (deg, node)-smaller endpoint to the
        # larger; wedges enumerate only at the oriented apex
        oriented = (
            und.join(deg.select(F.col("node").alias("a"), F.col("deg").alias("da")), "a")
            .join(deg.select(F.col("node").alias("b"), F.col("deg").alias("db")), "b")
            .select(
                F.when(
                    (F.col("da") < F.col("db"))
                    | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                    F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
                )
                .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
                .alias("e")
            )
            .select("e.u", "e.v")
        )
        w1 = oriented.select(F.col("u").alias("apex"), F.col("v").alias("x"))
        w2 = oriented.select(F.col("u").alias("apex"), F.col("v").alias("y"))
        tri = (
            w1.join(w2, "apex")
            .where(F.col("x") < F.col("y"))
            .join(
                und.select(
                    F.col("a").alias("x"), F.col("b").alias("y")
                ),
                ["x", "y"],
                "leftsemi",
            )
        )
        # attribute each triangle to its 3 canonical edges
        tri_edges = tri.select(
            F.explode(
                F.array(
                    F.struct(
                        F.least("apex", "x").alias("a"),
                        F.greatest("apex", "x").alias("b"),
                    ),
                    F.struct(
                        F.least("apex", "y").alias("a"),
                        F.greatest("apex", "y").alias("b"),
                    ),
                    F.struct(F.col("x").alias("a"), F.col("y").alias("b")),
                )
            ).alias("e")
        ).select("e.a", "e.b")
        sup = tri_edges.groupBy("a", "b").agg(F.count(F.lit(1)).alias("sup"))
        survivors = (
            und.join(sup, ["a", "b"], "left")
            .where(F.coalesce(F.col("sup"), F.lit(0)) >= min_sup)
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        n_after = survivors.count()
        audit.append((rnd, n_before, n_before - n_after, n_after))
        und, n_before = survivors, n_after
    return spark.createDataFrame(
        [
            (rnd, ne, nd, nr, nd == 0)
            for rnd, ne, nd, nr in audit
        ],
        "round long, n_edges long, n_dropped long, n_remaining long, converged boolean",
    ).repartition(1)


def rich_club(edges: DataFrame, max_k: int = 10) -> DataFrame:
    """Rich-club coefficient curve (Zhou & Mondragón 2004) over the
    undirected simple graph: for each degree threshold k in 1..max_k,
    φ(k) = 2·E_k / (N_k·(N_k−1)) where N_k counts nodes of degree > k and
    E_k counts edges with BOTH endpoints of degree > k — the density of
    the subgraph induced by the hubs. Rising φ(k) means hubs
    preferentially interconnect (a "rich club", typical of citation and
    social graphs); flat-or-falling is typical of the web. Together with
    assortativity this is the standard two-number structural fingerprint
    a crawl-drift monitor tracks.

    Scale design: the whole curve derives from TWO tiny histograms — the
    node-degree histogram and the per-edge min-endpoint-degree histogram
    (both ≤ max-degree rows after one aggregate each) — joined to the
    max_k-row threshold panel with range predicates. No per-k scan of the
    graph, no collect; the only full-data work is one degree aggregate and
    one edge-degree join, shared by every k. Output rows
    ``(k, n_rich_nodes, n_rich_edges, phi)``; φ is NULL when N_k < 2.
    """
    if max_k < 1:
        raise ValueError(f"max_k must be >= 1, got {max_k}")
    spark = edges.sparkSession
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)  # feeds the degree agg AND the edge join
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    deg_hist = deg.groupBy("deg").agg(F.count(F.lit(1)).alias("n_nodes"))
    edge_min = (
        und.join(deg.select(F.col("node").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("deg").alias("db")), "b")
        .select(F.least("da", "db").alias("mdeg"))
        .groupBy("mdeg")
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )
    ks = spark.range(1, max_k + 1).select(F.col("id").alias("k"))
    nk = (
        ks.join(deg_hist, deg_hist["deg"] > ks["k"], "left")
        .groupBy("k")
        .agg(F.coalesce(F.sum("n_nodes"), F.lit(0)).alias("n_rich_nodes"))
    )
    ek = (
        ks.join(edge_min, edge_min["mdeg"] > ks["k"], "left")
        .groupBy("k")
        .agg(F.coalesce(F.sum("n_edges"), F.lit(0)).alias("n_rich_edges"))
    )
    return (
        nk.join(ek, "k")
        .select(
            F.col("k").cast("long").alias("k"),
            F.col("n_rich_nodes").cast("long").alias("n_rich_nodes"),
            F.col("n_rich_edges").cast("long").alias("n_rich_edges"),
            F.round(
                F.when(
                    F.col("n_rich_nodes") >= 2,
                    2.0
                    * F.col("n_rich_edges")
                    / (F.col("n_rich_nodes") * (F.col("n_rich_nodes") - 1)),
                ),
                6,
            ).alias("phi"),
        )
    )


def pagerank_weighted(
    edges: DataFrame,
    nodes: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    weight_col: str = "w",
) -> DataFrame:
    """Weighted PageRank over ``(src, dst, w)`` edges — the host-graph
    ranking step of a web pipeline, where page-level links are first
    COARSENED to host->host edges carrying link counts (a 100-1000x graph
    reduction that is the difference between ranking 10^12 pages and
    ranking 10^8 hosts) and each node then splits its rank proportionally
    to edge weight instead of uniformly:

        r_{i+1}(v) = (1-d)/N + d·(Σ_{u→v} r_i(u)·w(u,v)/W(u) + dang_i/N)

    with ``W(u) = Σ w`` out of u and ``dang_i`` the rank mass on
    zero-out-weight nodes. Same synchronous fixed-iteration contract and
    shuffle shape as :func:`pagerank` (one grouped contribution shuffle +
    one broadcast dangling scalar per round, lineage cut per round);
    weights must be positive. Returns ``(node, rank)``.
    """
    edges = edges.select("src", "dst", F.col(weight_col).alias("_w"))
    n = nodes.count()
    wsum = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.sum("_w").alias("wsum"))
        .localCheckpoint(eager=True)
    )
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(n_iter):
        with_w = ranks.join(wsum, "node", "left")
        contrib = (
            with_w.where(F.col("wsum").isNotNull())
            .join(edges, F.col("node") == F.col("src"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("_w") / F.col("wsum")).alias("contrib"))
        )
        dangling = with_w.where(F.col("wsum").isNull()).agg(
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


def pointer_doubling_roots(parents: DataFrame, rounds: int = 5) -> DataFrame:
    """Root + depth resolution over a parent-pointer forest by POINTER
    DOUBLING (path halving — Wyllie 1979's list-ranking idea): each round
    every unresolved node jumps to its ancestor's ancestor, adding the
    ancestor's accumulated distance, so a depth-d chain resolves in
    ⌈log₂ d⌉ rounds of ONE self-equi-join each — the distributed answer to
    `WITH RECURSIVE` hierarchy walks (BOM explosions, category trees,
    manager chains), whose sequential depth-d iteration is exactly what
    doesn't scale on a 10^12-row hierarchy.

    ``parents`` is ``(node, parent)`` with NULL parent marking roots;
    every non-NULL parent must itself appear as a node (the forest is
    closed). Output ``(node, root, depth, resolved)`` — ``resolved`` is
    False for nodes deeper than 2^rounds − 1 (the done certificate
    propagates from the root one join behind the pointer jump), making
    the fixed round budget self-auditing rather than silently wrong: a
    gate pins resolved=true over the whole table. Each round localCheckpoints to cut lineage;
    total work O(N · rounds), the classic depth-for-log trade.
    """
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    state = parents.select(
        "node",
        F.coalesce("parent", F.col("node")).alias("anc"),
        F.when(F.col("parent").isNull(), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("depth"),
        F.col("parent").isNull().alias("done"),
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        a = state.select(
            F.col("node").alias("anc"),
            F.col("anc").alias("_anc2"),
            F.col("depth").alias("_d2"),
            F.col("done").alias("_done2"),
        )
        state = (
            state.join(a, "anc", "left")
            .select(
                "node",
                F.when(F.col("done"), F.col("anc")).otherwise(F.col("_anc2")).alias("anc"),
                F.when(F.col("done"), F.col("depth"))
                .otherwise(F.col("depth") + F.col("_d2"))
                .alias("depth"),
                F.when(F.col("done"), F.lit(True)).otherwise(F.col("_done2")).alias("done"),
            )
            .localCheckpoint(eager=True)
        )
    return state.select(
        "node",
        F.col("anc").alias("root"),
        "depth",
        F.col("done").alias("resolved"),
    )


def boruvka_mst(
    edges: DataFrame,
    rounds: int = 10,
    weight_col: str = "w",
) -> DataFrame:
    """Minimum spanning forest by Borůvka's algorithm (1926; the textbook
    DISTRIBUTED MST — Kruskal/Prim are sequential union-find walks) — in
    ER terms, the scale path to single-link hierarchical clustering:
    cutting the MST at threshold θ IS single-link clustering at θ, so one
    forest materializes every flat clustering at once.

    Each round, every component selects its minimum outgoing edge
    (ties broken lexicographically by ``(w, a, b)`` so the forest is a
    pure function of the input even with duplicate weights), the selected
    edges join the forest, and components contract by EXACT connected
    components over the selection graph (``cluster.connected_components``
    — the selection graph is #components-sized, tiny next to the data).
    Components at least halve per round, so ``rounds`` = ⌈log₂ N⌉
    suffices; the loop exits early the first round no crossing edge
    remains. Per round: two label joins + one grouped min + CC on the
    contracted graph — no global sort, no driver state beyond the
    early-exit count.

    Input ``(src, dst, w)``; parallel edges collapse to their minimum
    weight, self-loops drop. Output: the forest edge set ``(a, b, w)``
    with ``a < b`` — exactly ``N − #components`` rows.
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    und = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.col(weight_col).alias("w"),
        )
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
        .localCheckpoint(eager=True)  # scanned every round
    )
    from .cluster import connected_components

    comp = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    parts = []
    for _ in range(rounds):
        cross = (
            und.join(
                comp.select(F.col("node").alias("a"), F.col("label").alias("ca")), "a"
            )
            .join(
                comp.select(F.col("node").alias("b"), F.col("label").alias("cb")), "b"
            )
            .where(F.col("ca") != F.col("cb"))
            .localCheckpoint(eager=True)  # feeds both orientations + count
        )
        if cross.count() == 0:
            break
        ori = cross.select(
            F.col("ca").alias("c"), "w", "a", "b", "ca", "cb"
        ).unionByName(cross.select(F.col("cb").alias("c"), "w", "a", "b", "ca", "cb"))
        sel = (
            ori.groupBy("c")
            .agg(F.min(F.struct("w", "a", "b", "ca", "cb")).alias("_s"))
            .select("_s.w", "_s.a", "_s.b", "_s.ca", "_s.cb")
            .distinct()
            .localCheckpoint(eager=True)  # forest part + contraction input
        )
        parts.append(sel.select("a", "b", "w"))
        mapping = connected_components(
            sel.select(F.col("ca").alias("src"), F.col("cb").alias("dst"))
        ).select(F.col("node").alias("label"), F.col("component").alias("_new"))
        comp = (
            comp.join(mapping, "label", "left")
            .select("node", F.coalesce("_new", F.col("label")).alias("label"))
            .localCheckpoint(eager=True)
        )
    if not parts:
        return und.where(F.lit(False)).select("a", "b", "w")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def hyperball_anf(edges: DataFrame, rounds: int = 5) -> DataFrame:
    """Approximate neighborhood function by HyperBall (Boldi & Vigna,
    2013; ANF: Palmer, Gibbons & Faloutsos, KDD 2002) — the sketch×graph
    hybrid that measures how fast balls grow: every node carries a tiny
    HyperLogLog (p=4, 16 registers, the same md5 bit layout as
    ``sketch.hll_distinct``) of its radius-r ball, and each round every
    node's registers take the element-wise max with its neighbors' — HLL
    union IS register max, which is the entire trick: a ball union costs
    one grouped max instead of a set union. F(r) = Σ_v |ball_r(v)| is the
    neighborhood function whose knee is the graph's effective diameter —
    on a 10^11-edge crawl this runs in rounds·O(m) register shuffles
    where exact BFS from every node is O(n·m) and flatly impossible.

    Deterministic end to end: registers come from md5, union is max, and
    the estimator (linear-counting small-range correction included, the
    ``hll_distinct`` formula with exact integer register sums) is one
    fixed IEEE expression — so an unrolled SQL replay hash-matches.
    Returns one row per radius: ``(r, nf)`` for r = 0..rounds, nf
    rounded 6.
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    from .util import md5_long60

    p = 4
    m = 1 << p
    rem_bits = 60 - p
    rho_max = rem_bits + 1
    alpha_m = 0.673
    scale = alpha_m * m * m * float(1 << rho_max)
    spark = edges.sparkSession

    sym = _symmetrized(edges).localCheckpoint(eager=True)
    nodes = sym.select(F.col("src").alias("node")).distinct()
    h = md5_long60(F.concat(F.lit("anf:"), F.col("node").cast("string")))
    rem = F.expr(f"_h & {(1 << rem_bits) - 1}")
    state = (
        nodes.select("node", h.alias("_h"))
        .select(
            "node",
            F.shiftright(F.col("_h"), rem_bits).alias("idx"),
            F.when(rem == 0, F.lit(rho_max))
            .otherwise(F.lit(rho_max) - F.length(F.bin(rem)))
            .alias("rho"),
        )
        .localCheckpoint(eager=True)
    )

    def _nf(st):
        agg = st.groupBy("node").agg(
            F.count(F.lit(1)).alias("nr"),
            F.sum(F.expr(f"CAST(1 AS BIGINT) << ({rho_max} - rho)")).alias("s"),
        )
        v0 = F.lit(m) - F.col("nr")
        s_total = F.col("s") + v0 * F.lit(1 << rho_max)
        raw = F.lit(scale) / s_total.cast("double")
        est = F.when(
            (raw <= F.lit(2.5 * m)) & (v0 > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / v0.cast("double")),
        ).otherwise(raw)
        return agg.agg(F.sum(est)).first()[0]

    out = [(0, round(_nf(state), 6))]
    for r in range(1, rounds + 1):
        nbr = sym.join(state, state["node"] == sym["src"]).select(
            F.col("dst").alias("node"), "idx", "rho"
        )
        state = (
            state.unionByName(nbr)
            .groupBy("node", "idx")
            .agg(F.max("rho").alias("rho"))
            .localCheckpoint(eager=True)
        )
        out.append((r, round(_nf(state), 6)))
    return spark.createDataFrame(out, "r long, nf double").repartition(1)


def link_prediction_scores(
    edges: DataFrame, min_common: int = 2
) -> DataFrame:
    """Classical link-prediction feature block (Liben-Nowell & Kleinberg,
    CIKM 2003) for non-adjacent node pairs at distance 2 on the
    undirected simple graph: common neighbors, Jaccard of neighborhoods,
    Adamic-Adar (Σ 1/ln deg z over shared neighbors — rare shared
    neighbors count more), resource allocation (Σ 1/deg z), and
    preferential attachment (deg a · deg b). In a crawl pipeline these
    score missing-link candidates (mirror detection, citation gap
    filling); in ER they are edge-evidence features for borderline pairs.

    Enumeration is wedge-based — each candidate pair materializes once
    per shared neighbor z via the z-apex self-join, then aggregates — so
    the cost is Σ_z C(deg z, 2): hub-quadratic like every
    shared-neighbor method. ``min_common`` (applied AFTER aggregation,
    the cocitation_coupling convention) bounds the OUTPUT; for
    hub-skewed graphs cap or sample hub adjacency upstream (the
    documented knn_sparsify path). Existing edges are anti-joined out.
    All counts exact; the three float scores are fixed IEEE sums over
    per-pair shared neighbors, rounded 6.

    Output: ``(node_a, node_b, cn, jaccard, adamic_adar,
    resource_alloc, pref_attach)`` with ``node_a < node_b``.
    """
    if min_common < 1:
        raise ValueError(f"min_common must be >= 1, got {min_common}")
    und = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)  # feeds sym, deg, and the anti-join
    )
    sym = und.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    # wedges at apex z: neighbors (x, y) with x < y
    n1 = sym.select(F.col("u").alias("z"), F.col("v").alias("x"))
    n2 = sym.select(F.col("u").alias("z"), F.col("v").alias("y"))
    wedges = (
        n1.join(n2, "z")
        .where(F.col("x") < F.col("y"))
        .join(deg.select(F.col("node").alias("z"), F.col("deg").alias("dz")), "z")
    )
    pairs = (
        wedges.groupBy(F.col("x").alias("node_a"), F.col("y").alias("node_b"))
        .agg(
            F.count(F.lit(1)).alias("cn"),
            F.sum(1.0 / F.log("dz")).alias("_aa"),
            F.sum(1.0 / F.col("dz")).alias("_ra"),
        )
        .where(F.col("cn") >= min_common)
        .join(
            und.select(F.col("a").alias("node_a"), F.col("b").alias("node_b")),
            ["node_a", "node_b"],
            "left_anti",
        )
    )
    da = deg.select(F.col("node").alias("node_a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("node_b"), F.col("deg").alias("db"))
    return (
        pairs.join(da, "node_a")
        .join(db, "node_b")
        .select(
            "node_a",
            "node_b",
            F.col("cn").cast("long").alias("cn"),
            F.round(
                F.col("cn") / (F.col("da") + F.col("db") - F.col("cn")), 6
            ).alias("jaccard"),
            F.round("_aa", 6).alias("adamic_adar"),
            F.round("_ra", 6).alias("resource_alloc"),
            (F.col("da") * F.col("db")).cast("long").alias("pref_attach"),
        )
    )


def reciprocity(edges: DataFrame) -> DataFrame:
    """Directed reciprocity (Garlaschelli & Loffredo, PRL 2004): the
    fraction r = L↔/L of directed simple edges whose reverse also exists,
    plus the density-corrected ρ = (r − ā)/(1 − ā) with
    ā = L/(N(N−1)) — the correction that makes reciprocity comparable
    across graphs of different density (raw r is inflated on dense
    graphs by chance alone). The web's link graph is weakly reciprocal
    (ρ small and positive); a jump in ρ between crawls flags mirror
    rings and link farms — the third leg of the structural fingerprint
    next to assortativity and the rich club.

    One self-semi-join on the reversed edge + two counts; all exact
    integers into two fixed divisions, rounded 6. One row:
    ``(n_nodes, n_edges, n_mutual, r, rho)``; ρ is NULL when ā = 1
    (complete graph) and r is NULL when L = 0.
    """
    simple = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)  # 3 consumers: count, semi-join, nodes
    )
    mutual = simple.join(
        simple.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        ["src", "dst"],
        "leftsemi",
    )
    n_nodes = (
        simple.select(F.col("src").alias("n"))
        .unionAll(simple.select(F.col("dst").alias("n")))
        .distinct()
        .count()
    )
    l_total = simple.count()
    l_mutual = mutual.count()
    spark = edges.sparkSession
    r = (l_mutual / l_total) if l_total else None
    a_bar = l_total / (n_nodes * (n_nodes - 1)) if n_nodes > 1 else None
    rho = (
        (r - a_bar) / (1.0 - a_bar)
        if r is not None and a_bar is not None and a_bar != 1.0
        else None
    )
    raw = spark.createDataFrame(
        [(n_nodes, l_total, l_mutual, r, rho)],
        "n_nodes long, n_edges long, n_mutual long, r double, rho double",
    )
    # F.round (half-up, matching SQL ROUND) — python round() is banker's
    return raw.select(
        "n_nodes", "n_edges", "n_mutual",
        F.round("r", 6).alias("r"), F.round("rho", 6).alias("rho"),
    )


def deterministic_walks(
    edges: DataFrame, n_walks: int = 2, walk_len: int = 4
) -> DataFrame:
    """Random-walk corpus generation (the sampling layer of DeepWalk,
    KDD 2014 / node2vec) with md5-seeded step choices: from every node,
    ``n_walks`` walks of ``walk_len`` steps over the undirected simple
    graph, step t of walk (start, w) moving to the neighbor of the
    current node ranked ``md5('walk:start:w:t') mod deg(cur)`` in the
    sorted adjacency — pre-drawn per-step randomness, so the whole corpus
    is a pure function of the graph and replays exactly in SQL (what a
    seeded PRNG cannot promise across engines). The output rows ARE the
    training corpus a skip-gram embedding consumes.

    Scale design: adjacency is ranked ONCE (row_number per source over
    the sorted neighbor list — partitioned by node, never global) and
    each step is one equi-join of the |starts|·n_walks frontier against
    it on (node, rank): walk extension is embarrassingly parallel and
    the frontier never grows. Output ``(start, walk_id, step, node)``
    with step 0 = start; walk_len·O(frontier) join work total.
    """
    if n_walks < 1:
        raise ValueError(f"n_walks must be >= 1, got {n_walks}")
    if walk_len < 1:
        raise ValueError(f"walk_len must be >= 1, got {walk_len}")
    from pyspark.sql import Window

    from .util import md5_long60

    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    sym = und.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    adj = (
        sym.withColumn(
            "rank", F.row_number().over(Window.partitionBy("u").orderBy("v"))
        )
        .withColumn("deg", F.count(F.lit(1)).over(Window.partitionBy("u")))
        .localCheckpoint(eager=True)  # joined once per step
    )
    starts = adj.select(F.col("u").alias("start")).distinct()
    frontier = starts.select(
        "start",
        F.explode(F.sequence(F.lit(0), F.lit(n_walks - 1))).alias("walk_id"),
    ).select("start", "walk_id", F.col("start").alias("node"))
    out = frontier.select(
        "start", "walk_id", F.lit(0).cast("long").alias("step"), "node"
    )
    for t in range(1, walk_len + 1):
        h = md5_long60(
            F.concat(
                F.lit("walk:"),
                F.col("start").cast("string"),
                F.lit(":"),
                F.col("walk_id").cast("string"),
                F.lit(":"),
                F.lit(str(t)),
            )
        )
        frontier = (
            frontier.join(adj, frontier["node"] == adj["u"])
            .where((h % F.col("deg")) + 1 == F.col("rank"))
            .select("start", "walk_id", F.col("v").alias("node"))
        )
        out = out.unionByName(
            frontier.select(
                "start", "walk_id", F.lit(t).cast("long").alias("step"), "node"
            )
        )
    return out


def luby_mis(
    edges: DataFrame, nodes: DataFrame | None = None, rounds: int = 12
) -> DataFrame:
    """Luby's distributed Maximal Independent Set (Luby, SIAM J. Comput.
    1986) with md5-derived per-round priorities — the classic symmetry
    breaker behind conflict-free parallel scheduling: in ER, an MIS over
    a "cannot-merge-together" conflict graph is a maximal set of merges
    that can commit in one wave.

    Round r draws every ACTIVE node the priority
    ``(md5_long60('mis:r:' || node), node)`` — a fresh, collision-proof
    total order per round, exactly replayable in SQL (what Luby's coin
    flips cannot promise across engines). A node wins if its priority is
    strictly below every active neighbor's; winners enter the MIS, their
    neighbors become dominated, both leave the active set. Two adjacent
    winners are impossible (one of them beats the other), so
    independence is structural; when the active set empties, every node
    is mis-or-dominated and every dominated node has an MIS neighbor —
    maximality. Luby's theorem kills half the active edges per round in
    expectation, so ``rounds`` ~ 2·log(m) suffices; leftovers surface as
    ``status='unresolved', round=-1`` rows — a visible certificate, never
    silent truncation.

    Scale design: one localCheckpointed symmetric edge table joined per
    round, per-round work O(active edges), priorities never materialized
    beyond the round. Output ``(node, status, round)`` with status in
    {'mis', 'dominated', 'unresolved'} and round = the deciding round.
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    from .util import md5_long60

    sym = _symmetrized(edges).localCheckpoint(eager=True)  # joined every round
    if nodes is None:
        nodes = sym.select(F.col("src").alias("node")).distinct()
    active = nodes.select("node").distinct().localCheckpoint(eager=True)
    spark = active.sparkSession
    schema = "node long, status string, round long"
    decided = spark.createDataFrame([], schema)
    for r in range(1, rounds + 1):
        pri = md5_long60(F.concat(F.lit(f"mis:{r}:"), F.col("node").cast("string")))
        ap = active.select("node", pri.alias("p"))
        ed = (
            sym.join(
                ap.select(F.col("node").alias("src"), F.col("p").alias("sp")), "src"
            ).join(
                ap.select(F.col("node").alias("dst"), F.col("p").alias("dp")), "dst"
            )
        )
        nbrmin = ed.groupBy(F.col("src").alias("node")).agg(
            F.min(F.struct("dp", "dst")).alias("_nm")
        )
        win = (
            ap.join(nbrmin, "node", "left")
            .where(
                F.col("_nm").isNull()
                | (F.col("p") < F.col("_nm.dp"))
                | ((F.col("p") == F.col("_nm.dp")) & (F.col("node") < F.col("_nm.dst")))
            )
            .select("node")
            .localCheckpoint(eager=True)  # consumed by mis rows, dom, and active
        )
        dom = (
            ed.join(win.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        decided = decided.unionByName(
            win.select("node", F.lit("mis").alias("status"), F.lit(r).cast("long").alias("round"))
        ).unionByName(
            dom.select("node", F.lit("dominated").alias("status"), F.lit(r).cast("long").alias("round"))
        )
        active = (
            active.join(win, "node", "left_anti")
            .join(dom, "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        if active.count() == 0:
            break
    leftover = active.select(
        "node", F.lit("unresolved").alias("status"), F.lit(-1).cast("long").alias("round")
    )
    return decided.unionByName(leftover)


def katz_centrality(
    edges: DataFrame,
    nodes: DataFrame,
    n_iter: int = 8,
    alpha: float = 0.1,
) -> DataFrame:
    """Katz centrality after exactly ``n_iter`` synchronous rounds:

        x_{t+1}(v) = α · Σ_{u→v} (x_t(u) + 1),   x_0 = 0

    so x_T(v) = Σ_{k=1..T} α^k · (#directed paths of length k ending at v)
    — the attenuated path-count centrality (Katz 1953), the classic
    complement of PageRank: it rewards being reachable by MANY short
    paths rather than by rank-concentrated ones, and it needs no degree
    normalization, so link farms that split mass fool it differently
    than they fool PageRank (which is why rank-fingerprint audits read
    both). Truncation at T is part of the definition here (pure function
    of (edges, nodes, n_iter, alpha) — the pagerank determinism
    contract), not a convergence test; α must simply be positive, though
    values above 1/λ_max make the untruncated series diverge.

    One edges join + one aggregation per round; edges should be simple
    (parallel edges count multiple paths otherwise). Isolated/unreached
    nodes report 0.
    """
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if not alpha > 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    edges = edges.select("src", "dst")
    x = nodes.select("node", F.lit(0.0).alias("x"))
    for _ in range(n_iter):
        agg = (
            x.join(edges, x["node"] == edges["src"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("x") + F.lit(1.0)).alias("_s"))
        )
        x = (
            nodes.join(agg, "node", "left")
            .select(
                "node",
                (F.lit(alpha) * F.coalesce("_s", F.lit(0.0))).alias("x"),
            )
            .localCheckpoint(eager=True)
        )
    return x.select("node", F.col("x").alias("katz"))


def betweenness_panel(
    edges: DataFrame,
    n_seeds: int = 4,
    max_dist: int = 6,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """Source-sampled betweenness centrality (Brandes 2001, restricted to
    a deterministic seed panel — the standard estimator at scale, where
    all-sources Brandes is O(n·m)): for each of the ``n_seeds`` smallest
    node ids, a level-synchronous BFS over the UNDIRECTED simple graph
    accumulates shortest-path counts σ, then the dependency recurrence

        δ(u) = Σ_{v: u ∈ pred(v)} (σ(u)/σ(v)) · (1 + δ(v))

    runs levels-descending; btw(v) = Σ_seeds δ_seed(v), v excluded when
    it is the seed. No halving is applied (the panel sums over its
    sources only); ``max_dist`` bounds the BFS and is part of the
    semantics (pure function of the graph — paths longer than the bound
    do not contribute).

    All seeds advance TOGETHER in one (seed, node) state table: k seeds
    cost one frontier join per level, not k (the distance_census cost
    model); σ is the integer path-count sum folded into the frontier
    aggregation; the predecessor-DAG table is materialized once and the
    backward pass re-joins it per level. δ is IEEE double; σ stays exact
    integer throughout.

    Output: (node, btw) for every node (0.0 when untouched).
    """
    if n_seeds < 1 or max_dist < 1:
        raise ValueError(
            f"n_seeds and max_dist must be >= 1, got {n_seeds}, {max_dist}"
        )
    sym = _symmetrized(edges).localCheckpoint(eager=True)
    ends = sym.select(F.col("src").alias("node"))
    if nodes is not None:
        ends = ends.union(nodes.select("node"))
    allnodes = ends.distinct().localCheckpoint(eager=True)
    seeds = (
        allnodes.orderBy("node").limit(n_seeds).select(F.col("node").alias("seed"))
    )
    state = seeds.select(
        "seed",
        F.col("seed").alias("node"),
        F.lit(0).alias("dist"),
        F.lit(1).cast("long").alias("sig"),
    ).localCheckpoint(eager=True)
    frontier = state
    for d in range(1, max_dist + 1):
        nxt = (
            frontier.join(sym, frontier["node"] == sym["src"])
            .select("seed", F.col("dst").alias("node"), "sig")
            .join(state.select("seed", "node"), ["seed", "node"], "left_anti")
            .groupBy("seed", "node")
            .agg(F.sum("sig").alias("sig"))
            .withColumn("dist", F.lit(d))
            .select("seed", "node", "dist", "sig")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        state = state.union(nxt).localCheckpoint(eager=True)
        frontier = nxt
    su = state.select(
        F.col("seed"), F.col("node").alias("_u"), F.col("dist").alias("_du"),
        F.col("sig").alias("_su"),
    )
    sv = state.select(
        F.col("seed"), F.col("node").alias("_v"), F.col("dist").alias("_dv"),
        F.col("sig").alias("_sv"),
    )
    pe = (
        su.join(sym, F.col("_u") == sym["src"])
        .select("seed", "_u", "_du", "_su", F.col("dst").alias("_v"))
        .join(sv, ["seed", "_v"])
        .where(F.col("_dv") == F.col("_du") + 1)
        .select("seed", "_u", "_du", "_su", "_v", "_dv", "_sv")
        .localCheckpoint(eager=True)  # re-joined once per backward level
    )
    spark = state.sparkSession
    deltas = spark.createDataFrame([], "seed long, node long, delta double")
    top = max_dist
    for l in range(top, 0, -1):
        dv = deltas.select(
            "seed", F.col("node").alias("_v"), F.col("delta").alias("_dd")
        )
        lvl = (
            pe.where(F.col("_dv") == l)
            .join(dv, ["seed", "_v"], "left")
            .groupBy("seed", F.col("_u").alias("node"))
            .agg(
                F.sum(
                    F.col("_su")
                    / F.col("_sv")
                    * (F.lit(1.0) + F.coalesce("_dd", F.lit(0.0)))
                ).alias("delta")
            )
            .localCheckpoint(eager=True)
        )
        deltas = deltas.unionByName(lvl).localCheckpoint(eager=True)
    btw = (
        deltas.where(F.col("node") != F.col("seed"))
        .groupBy("node")
        .agg(F.sum("delta").alias("btw"))
    )
    return allnodes.join(btw, "node", "left").select(
        "node", F.coalesce("btw", F.lit(0.0)).alias("btw")
    )


def modularity(edges: DataFrame, partition: DataFrame) -> DataFrame:
    """Newman modularity of a node partition over the undirected simple
    graph (Newman & Girvan 2004):

        Q = Σ_c [ e_c/m − (deg_c/(2m))² ]

    with m the undirected edge count, e_c the intra-community edge count
    and deg_c the community's degree mass — the objective LPA/Louvain
    style community detection climbs, reported as the audit of a
    partition someone else produced (in ER: are the entity clusters
    denser than the degree null model predicts?).

    ``partition``: (node, community). Every ingredient is an exact
    integer; Q is two divisions per community at the boundary. Nodes
    missing from ``partition`` contribute degree to nothing (their edges
    still count in m). Output one row per community —
    (community, n_nodes, e_in, deg_sum, q_contrib) — plus the overall
    ``q`` repeated on each row (the relational 1-row-stat shape).
    """
    und = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)  # 3 consumers: m, deg, e_in
    )
    mrow = und.agg(F.count(F.lit(1)).cast("long").alias("_m"))
    sym = und.select(F.col("a").alias("node")).unionAll(
        und.select(F.col("b").alias("node"))
    )
    deg = sym.groupBy("node").agg(F.count(F.lit(1)).alias("_deg"))
    part = partition.select("node", "community")
    degc = (
        part.join(deg, "node", "left")
        .groupBy("community")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum(F.coalesce("_deg", F.lit(0))).cast("long").alias("deg_sum"),
        )
    )
    ein = (
        und.join(part.select(F.col("node").alias("a"), F.col("community").alias("_ca")), "a")
        .join(part.select(F.col("node").alias("b"), F.col("community").alias("_cb")), "b")
        .where(F.col("_ca") == F.col("_cb"))
        .groupBy(F.col("_ca").alias("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("e_in"))
    )
    rows = (
        degc.join(ein, "community", "left")
        .withColumn("e_in", F.coalesce("e_in", F.lit(0)))
        .crossJoin(F.broadcast(mrow))
        .select(
            "community",
            "n_nodes",
            "e_in",
            "deg_sum",
            (
                F.col("e_in") / F.col("_m")
                - (F.col("deg_sum") / (F.lit(2.0) * F.col("_m")))
                * (F.col("deg_sum") / (F.lit(2.0) * F.col("_m")))
            ).alias("q_contrib"),
        )
    )
    q = rows.agg(F.sum("q_contrib").alias("q"))
    return rows.crossJoin(F.broadcast(q))


def mis_coloring(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_colors: int = 6,
    mis_rounds: int = 6,
) -> DataFrame:
    """Distributed greedy graph coloring by ITERATED Luby MIS (the
    classic reduction — each color class is a maximal independent set of
    the residual graph, so the coloring is proper by construction and
    uses ≤ Δ+1 colors when run to completion). In ER this schedules
    merge waves over a cannot-merge conflict graph: all nodes of one
    color commit concurrently, colors run in sequence.

    Color wave c runs :func:`luby_mis` (same md5 priorities — the
    residual graph changes, the priority stream need not) on the
    remaining nodes and the edges induced on them; MIS members take
    color c and leave. Nodes still uncolored after ``max_colors`` waves
    report ``color = -1`` — the budget certificate, never silent. Output
    ``(node, color)``.
    """
    if max_colors < 1:
        raise ValueError(f"max_colors must be >= 1, got {max_colors}")
    sym = _symmetrized(edges).localCheckpoint(eager=True)
    if nodes is None:
        nodes = sym.select(F.col("src").alias("node")).distinct()
    remaining = nodes.select("node").distinct().localCheckpoint(eager=True)
    spark = remaining.sparkSession
    colored = spark.createDataFrame([], "node long, color long")
    residual = sym
    for c in range(1, max_colors + 1):
        mis = (
            luby_mis(residual, nodes=remaining, rounds=mis_rounds)
            .where(F.col("status") == "mis")
            .select("node")
            .localCheckpoint(eager=True)
        )
        colored = colored.unionByName(
            mis.select("node", F.lit(c).cast("long").alias("color"))
        )
        remaining = remaining.join(mis, "node", "left_anti").localCheckpoint(
            eager=True
        )
        if remaining.count() == 0:
            break
        residual = (
            residual.join(remaining.withColumnRenamed("node", "src"), "src")
            .join(remaining.withColumnRenamed("node", "dst"), "dst")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
    leftover = remaining.select("node", F.lit(-1).cast("long").alias("color"))
    return colored.unionByName(leftover)


def harmonic_panel(
    edges: DataFrame,
    n_seeds: int = 4,
    max_dist: int = 12,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """Harmonic + closeness centrality for the deterministic seed panel
    (Boldi & Vigna, "Axioms for Centrality" 2014 — harmonic is the
    closeness variant that stays meaningful on DISCONNECTED graphs,
    where classic closeness degenerates): a thin aggregation over the
    :func:`distance_census` BFS state,

        harmonic(s)  = Σ_{v ≠ s reached} 1/d(s, v)
        closeness(s) = (n_reached − 1) / Σ d(s, v)

    with unreached nodes contributing 0 to harmonic (their 1/∞) and
    excluded from closeness — exactly why the two numbers diverge on
    fragmented graphs and why audits read both. ``max_dist`` bounds the
    census and is part of the semantics. Output one row per seed:
    (seed, n_reached, sum_dist, harmonic, closeness).
    """
    census = distance_census(edges, n_seeds=n_seeds, max_dist=max_dist, nodes=nodes)
    reached = census.where(F.col("dist") > 0)
    agg = reached.groupBy("seed").agg(
        F.sum("n_nodes").cast("long").alias("_nr"),
        F.sum(F.col("n_nodes") * F.col("dist")).cast("long").alias("sum_dist"),
        F.sum(F.col("n_nodes") / F.col("dist")).alias("harmonic"),
    )
    # every seed has a dist-0 census row — the anchor that keeps SINK seeds
    # (which reach nothing and have no dist>0 rows) in the output with zeros
    anchors = census.where(F.col("dist") == 0).select("seed")
    return (
        anchors.join(agg, "seed", "left")
        .select(
            "seed",
            (F.coalesce("_nr", F.lit(0)) + 1).alias("n_reached"),
            F.coalesce("sum_dist", F.lit(0)).alias("sum_dist"),
            F.coalesce("harmonic", F.lit(0.0)).alias("harmonic"),
            F.when(
                F.coalesce("sum_dist", F.lit(0)) > 0,
                F.col("_nr") / F.col("sum_dist"),
            )
            .otherwise(F.lit(0.0))
            .alias("closeness"),
        )
    )
