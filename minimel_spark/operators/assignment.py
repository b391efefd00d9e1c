"""Globally-optimized 1:1 linkage: distributed auction assignment.

``reciprocal_match`` (scoring.py arc) resolves 1:1 conflicts greedily —
each side keeps its best partner, which can leave easy wins on the table
(bidder 1 takes its favorite even when giving it up raises TOTAL match
quality). The auction algorithm (Bertsekas 1979/1988) fixes that with a
market: unassigned bidders bid ``best value − second-best value + ε`` on
their best item, items go to the highest bidder and their price rises, so
contested items get expensive and bidders spill to their next choice.
With small ε the fixed point is within n·ε of the optimal assignment —
the classic distributed substitute for the (inherently sequential)
Hungarian algorithm, and the standard way to do optimized bipartite
matching on a cluster.

This implementation is the synchronous (Jacobi) auction with a FIXED
round count and deterministic tie-breaks (best item by max value then
min item id; item winner by max bid then min bidder id), so the result
is a pure function of the edge list — parallelism-invariant and
SQL-unrollable round by round for oracle checking (the same unrolled-
iteration technique as the Fellegi-Sunter EM oracle).

Scale design: one round = one anti-join (who is unassigned), one
broadcast-or-shuffle join onto the price table, two bounded windows
(top-2 values per bidder, top-1 bid per item — both reduce before
anything global), and two small upserts. State (assignment, prices) is
``localCheckpoint``-ed per round exactly like the connected-components
loop, so plans don't grow with the round count.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def auction_assignment(
    edges: DataFrame,
    n_rounds: int = 8,
    eps: float = 0.01,
    bidder_col: str = "bidder",
    item_col: str = "item",
    score_col: str = "score",
) -> DataFrame:
    """Run ``n_rounds`` of synchronous auction over a scored bipartite
    edge list and return the standing assignment:
    ``(bidder, item, score, price)`` — one row per matched pair, bidders
    the rounds could not place are absent (report them with an anti-join
    if needed; a bidder with no edges never bids).

    Fixed rounds keep the operator deterministic and oracle-checkable;
    pick ``n_rounds`` ≥ the length of the longest displacement chain you
    care about (each round lets one eviction cascade one step). Prices
    start at 0 and only rise; ``eps`` > 0 guarantees progress on ties.
    """
    if n_rounds < 1:
        raise ValueError(f"n_rounds must be >= 1, got {n_rounds}")
    if eps <= 0:
        raise ValueError(f"eps must be > 0, got {eps}")
    spark = edges.sparkSession
    e = edges.select(
        F.col(bidder_col).alias("bidder"),
        F.col(item_col).alias("item"),
        F.col(score_col).cast("double").alias("score"),
    )
    assign = spark.createDataFrame([], "bidder long, item long").select(
        F.col("bidder").cast(e.schema["bidder"].dataType),
        F.col("item").cast(e.schema["item"].dataType),
    )
    prices = spark.createDataFrame([], "item long, price double").select(
        F.col("item").cast(e.schema["item"].dataType), "price"
    )
    w_bidder = Window.partitionBy("bidder").orderBy(
        F.desc("_v"), F.asc("item")
    )
    w_item = Window.partitionBy("item").orderBy(F.desc("_bid"), F.asc("bidder"))
    for _ in range(n_rounds):
        unassigned = e.join(assign.select("bidder"), "bidder", "left_anti")
        vals = (
            unassigned.join(prices, "item", "left")
            .withColumn(
                "_v", F.col("score") - F.coalesce(F.col("price"), F.lit(0.0))
            )
            .withColumn("_rn", F.row_number().over(w_bidder))
        )
        best = vals.where(F.col("_rn") == 1).select(
            "bidder",
            "item",
            F.col("_v").alias("_v1"),
            F.coalesce(F.col("price"), F.lit(0.0)).alias("_p1"),
        )
        second = vals.where(F.col("_rn") == 2).select(
            "bidder", F.col("_v").alias("_v2")
        )
        bids = (
            best.join(second, "bidder", "left")
            .withColumn(
                "_bid",
                F.col("_p1")
                + F.col("_v1")
                - F.coalesce(F.col("_v2"), F.col("_v1"))
                + F.lit(eps),
            )
            .select("bidder", "item", "_bid")
        )
        winners = (
            bids.withColumn("_wrn", F.row_number().over(w_item))
            .where(F.col("_wrn") == 1)
            .select("bidder", "item", "_bid")
        )
        prices = (
            prices.join(winners.select("item"), "item", "left_anti")
            .unionByName(winners.select("item", F.col("_bid").alias("price")))
            .localCheckpoint(eager=True)
        )
        assign = (
            assign.join(winners.select("item"), "item", "left_anti")
            .unionByName(winners.select("bidder", "item"))
            .localCheckpoint(eager=True)
        )
    return (
        assign.join(e, ["bidder", "item"])
        .join(prices, "item", "left")
        .select(
            "bidder",
            "item",
            "score",
            F.coalesce(F.col("price"), F.lit(0.0)).alias("price"),
        )
    )


def stable_marriage(
    edges: DataFrame,
    n_rounds: int = 8,
    proposer_col: str = "proposer",
    acceptor_col: str = "acceptor",
    score_col: str = "score",
) -> DataFrame:
    """Proposer-optimal stable matching by synchronous Gale-Shapley
    deferred acceptance (Gale & Shapley 1962) over a scored bipartite
    edge list: each round, every free proposer proposes to its
    best-scoring acceptor it has not yet been rejected by; each acceptor
    keeps the best of (current fiancé ∪ new proposals) and rejects the
    rest, freeing any evicted fiancé. Unlike the auction (which optimizes
    TOTAL value within n·ε) the fixed point here is a STABLE matching —
    no unmatched (proposer, acceptor) pair prefers each other over their
    assigned partners — the guarantee record-linkage wants when a
    crosswalk must be defensible pair-by-pair rather than only in
    aggregate. Complements ``auction_assignment`` (welfare-optimal) and
    ``scoring.reciprocal_best_pairs`` (single-round mutual-best).

    Preferences on both sides derive from ``score_col`` with
    deterministic tie-breaks (proposer prefers higher score then smaller
    acceptor id; acceptor prefers higher score then smaller proposer id),
    so with a FIXED round count the result is a pure function of the edge
    list — parallelism-invariant and SQL-unrollable round by round for
    oracle checking (the same technique as the auction / FS-EM oracles).
    GS terminates after at most |edges| proposals; at fixed ``n_rounds``
    the standing engagement after the last round is returned, which
    equals the true fixed point whenever the longest rejection chain fits
    in the budget.

    Scale design: one round = one anti-join (who is free), one anti-join
    against the rejection log, one top-1-per-proposer window and one
    top-1-per-acceptor window (both reduce before anything global), and
    two bounded upserts. The rejection log grows monotonically but is
    bounded by |edges|; engagement state is bounded by the smaller side.
    Both states are ``localCheckpoint``-ed per round exactly like the
    connected-components loop, so plans don't grow with the round count.

    Returns one row per engaged pair: ``(proposer, acceptor, score)``.
    """
    if n_rounds < 1:
        raise ValueError(f"n_rounds must be >= 1, got {n_rounds}")
    spark = edges.sparkSession
    e = edges.select(
        F.col(proposer_col).alias("proposer"),
        F.col(acceptor_col).alias("acceptor"),
        F.col(score_col).cast("double").alias("score"),
    )
    p_t = e.schema["proposer"].dataType
    a_t = e.schema["acceptor"].dataType
    empty_pairs = spark.createDataFrame(
        [], "proposer long, acceptor long, score double"
    ).select(
        F.col("proposer").cast(p_t),
        F.col("acceptor").cast(a_t),
        "score",
    )
    engaged = empty_pairs
    rejected = empty_pairs.select("proposer", "acceptor")
    w_prop = Window.partitionBy("proposer").orderBy(
        F.desc("score"), F.asc("acceptor")
    )
    w_acc = Window.partitionBy("acceptor").orderBy(
        F.desc("score"), F.asc("proposer")
    )
    for _ in range(n_rounds):
        free = e.join(engaged.select("proposer"), "proposer", "left_anti")
        viable = free.join(rejected, ["proposer", "acceptor"], "left_anti")
        proposals = (
            viable.withColumn("_rn", F.row_number().over(w_prop))
            .where(F.col("_rn") == 1)
            .select("proposer", "acceptor", "score")
        )
        pool = engaged.unionByName(proposals)
        ranked = pool.withColumn("_wrn", F.row_number().over(w_acc))
        winners = ranked.where(F.col("_wrn") == 1).select(
            "proposer", "acceptor", "score"
        )
        losers = ranked.where(F.col("_wrn") > 1).select("proposer", "acceptor")
        engaged = winners.localCheckpoint(eager=True)
        rejected = rejected.unionByName(losers).localCheckpoint(eager=True)
    return engaged
