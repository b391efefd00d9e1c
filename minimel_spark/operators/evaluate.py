"""Evaluation stage (SURVEY §2 A10, J7, U2, X6 + the north-rule pairwise-F1).

Reference: minimel/run.py:34-65 (get_scores): gold and prediction maps are
aligned on the union of their keys per document (J7 full-outer join), missing
sides become -1, then micro/macro precision/recall/F1.

``pairwise_f1`` is the north-rule acceptance metric, computed DISTRIBUTED
(never materializing the O(n²) pair sets): for cluster assignments P and G over
the same records,
  TP = Σ_{(p,g) cells} C(n_pg, 2);  P-pairs = Σ_p C(n_p, 2);  G-pairs = Σ_g C(n_g, 2)
— three aggregations, no joins beyond the assignment join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def align_gold_pred(gold: DataFrame, pred: DataFrame) -> DataFrame:
    """J7/U2 (run.py:52-57): full-outer join on (doc_id, name); missing -> -1.

    gold: (doc_id, name, gold_qid); pred: (doc_id, name, pred_qid).
    """
    return (
        gold.join(pred, ["doc_id", "name"], "full_outer")
        .select(
            "doc_id",
            "name",
            F.coalesce("gold_qid", F.lit(-1)).alias("gold_qid"),
            F.coalesce("pred_qid", F.lit(-1)).alias("pred_qid"),
        )
    )


def micro_scores(aligned: DataFrame) -> DataFrame:
    """Micro-averaged P/R/F1 in the multiclass alignment convention the
    reference inherits from sklearn (run.py:41-47): with every (doc, name) slot
    labeled on both sides, micro P = R = F1 = accuracy over slots."""
    return aligned.agg(
        F.count(F.lit(1)).alias("support"),
        F.avg((F.col("gold_qid") == F.col("pred_qid")).cast("double")).alias("micro_f1"),
    )


def macro_scores(aligned: DataFrame) -> DataFrame:
    """Macro-averaged P/R/F1 over classes (qids), sklearn ``average='macro'``
    semantics: per-class P/R/F1 with zero_division=0, unweighted mean over the
    set of classes present in gold ∪ pred."""
    classes = (
        aligned.select(F.col("gold_qid").alias("qid"))
        .union(aligned.select(F.col("pred_qid").alias("qid")))
        .distinct()
    )
    tp = aligned.where(F.col("gold_qid") == F.col("pred_qid")).groupBy(
        F.col("gold_qid").alias("qid")
    ).agg(F.count(F.lit(1)).alias("tp"))
    gold_n = aligned.groupBy(F.col("gold_qid").alias("qid")).agg(
        F.count(F.lit(1)).alias("n_gold")
    )
    pred_n = aligned.groupBy(F.col("pred_qid").alias("qid")).agg(
        F.count(F.lit(1)).alias("n_pred")
    )
    per_class = (
        classes.join(tp, "qid", "left")
        .join(gold_n, "qid", "left")
        .join(pred_n, "qid", "left")
        .select(
            "qid",
            # zero_division=0: absent class on either side scores 0, not error
            F.coalesce(
                F.try_divide(F.coalesce("tp", F.lit(0)), F.col("n_pred")), F.lit(0.0)
            ).alias("p"),
            F.coalesce(
                F.try_divide(F.coalesce("tp", F.lit(0)), F.col("n_gold")), F.lit(0.0)
            ).alias("r"),
        )
        .withColumn(
            "f1",
            F.when(
                (F.col("p") + F.col("r")) > 0,
                2 * F.col("p") * F.col("r") / (F.col("p") + F.col("r")),
            ).otherwise(F.lit(0.0)),
        )
    )
    return per_class.agg(
        F.avg("p").alias("macro_precision"),
        F.avg("r").alias("macro_recall"),
        F.avg("f1").alias("macro_f1"),
    )


def gold_distribution(aligned: DataFrame) -> DataFrame:
    """A11 (reference run.py audit path): per-gold-entity support counts —
    how often each gold qid occurs in the aligned evaluation set."""
    return aligned.groupBy("gold_qid").agg(F.count(F.lit(1)).alias("support"))


def per_name_scores(aligned: DataFrame) -> DataFrame:
    """X6 (run.py:59-63): per-name accuracy restricted to names with >1 distinct
    gold label, sorted by support."""
    multi = (
        aligned.groupBy("name")
        .agg(
            F.count(F.lit(1)).alias("support"),
            F.countDistinct("gold_qid").alias("n_gold"),
            F.avg((F.col("gold_qid") == F.col("pred_qid")).cast("double")).alias("accuracy"),
        )
        .where(F.col("n_gold") > 1)
        .drop("n_gold")
    )
    return multi.orderBy(F.desc("support"))


def _pair_count(col):
    return F.sum(col * (col - 1) / 2)


def pairwise_f1(pred: DataFrame, gold: DataFrame) -> dict:
    """North-rule metric: pairwise F1 between two clusterings of the same
    records. pred: (rec_id, cluster_id); gold: (rec_id, cluster_id).
    Distributed — O(n) aggregations, never enumerates pairs."""
    both = pred.withColumnRenamed("cluster_id", "p").join(
        gold.withColumnRenamed("cluster_id", "g"), "rec_id"
    )
    # single action (VERDICT r4 #5): tp/pp/gp all derive from the (p, g) cell
    # counts — pp and gp re-aggregate the cells, not the alignment join, so the
    # join+shuffle runs once and the three 1-row stats assemble via crossJoin
    # (same shape as the q_er_pipeline_clusters gate).
    cell = both.groupBy("p", "g").agg(F.count(F.lit(1)).alias("n"))
    tp_df = cell.agg(_pair_count(F.col("n")).alias("tp"))
    pp_df = (
        cell.groupBy("p").agg(F.sum("n").alias("n")).agg(_pair_count(F.col("n")).alias("pp"))
    )
    gp_df = (
        cell.groupBy("g").agg(F.sum("n").alias("n")).agg(_pair_count(F.col("n")).alias("gp"))
    )
    row = tp_df.crossJoin(pp_df).crossJoin(gp_df).first()
    tp = row["tp"] or 0.0
    pp = row["pp"] or 0.0
    gp = row["gp"] or 0.0
    precision = tp / pp if pp else 1.0
    recall = tp / gp if gp else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"precision": precision, "recall": recall, "f1": f1, "tp_pairs": tp}


def cluster_quality(
    pred: DataFrame,
    gold: DataFrame,
    id_col: str = "rec_id",
    pred_col: str = "cluster_id",
    gold_col: str = "cluster_id",
) -> DataFrame:
    """B-cubed precision/recall/F1 + Adjusted Rand Index between two
    clusterings of the same records — the standard ER cluster-evaluation
    pair alongside :func:`pairwise_f1` (B-cubed: Bagga & Baldwin 1998, the
    metric of record for coreference/ER since Amigó et al. 2009 showed it
    satisfies all four clustering-metric constraints that pairwise F1 does
    not; ARI: Hubert & Arabie 1985).

    One row out: ``(n_records, bcubed_p, bcubed_r, bcubed_f1, ari)``.

    Distributed: everything derives from the (pred, gold) contingency cells —
    one alignment join + one groupBy, then three tiny aggregates assembled
    with crossJoins in a single plan (the ``pairwise_f1`` shape). The cell
    table is #pred-clusters × #gold-clusters at most, never the pair space.
    All sums feeding the ratios are exact integer sums (counts, n², C(n,2)),
    so the oracle reproduces them bit-for-bit; only the final few-term
    divisions are floating point.

    Degenerate guard: when both clusterings are trivial (ARI's max == its
    expectation), ARI is defined as 1.0 if the index also equals the
    expectation (identical trivial clusterings) else 0.0.
    """
    both = pred.select(F.col(id_col).alias("rec_id"), F.col(pred_col).alias("p")).join(
        gold.select(F.col(id_col).alias("rec_id"), F.col(gold_col).alias("g")),
        "rec_id",
    )
    cell = both.groupBy("p", "g").agg(F.count(F.lit(1)).alias("n"))
    psz = cell.groupBy("p").agg(F.sum("n").alias("np"))
    gsz = cell.groupBy("g").agg(F.sum("n").alias("ng"))
    # per-cell n²/np and n²/ng: each division is exact-integer-over-exact-
    # integer, summed per pred/gold cluster
    core = (
        cell.join(psz, "p")
        .join(gsz, "g")
        .agg(
            F.sum("n").alias("n_records"),
            F.sum(F.col("n") * F.col("n") / F.col("np")).alias("_sp"),
            F.sum(F.col("n") * F.col("n") / F.col("ng")).alias("_sr"),
            F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("_idx"),
        )
    )
    a_df = psz.agg(_pair_count(F.col("np")).alias("_a"))
    b_df = gsz.agg(_pair_count(F.col("ng")).alias("_b"))
    bp = F.col("_sp") / F.col("n_records")
    br = F.col("_sr") / F.col("n_records")
    tot = F.col("n_records") * (F.col("n_records") - 1) / 2
    exp = F.col("_a") * F.col("_b") / tot
    mx = (F.col("_a") + F.col("_b")) / 2
    return (
        core.crossJoin(a_df)
        .crossJoin(b_df)
        .select(
            F.col("n_records").cast("long").alias("n_records"),
            bp.alias("bcubed_p"),
            br.alias("bcubed_r"),
            (2 * bp * br / (bp + br)).alias("bcubed_f1"),
            F.when(
                mx != exp, (F.col("_idx") - exp) / (mx - exp)
            )
            .otherwise(F.when(F.col("_idx") == exp, F.lit(1.0)).otherwise(F.lit(0.0)))
            .alias("ari"),
        )
    )


def clustering_information(
    pred: DataFrame,
    gold: DataFrame,
    id_col: str = "rec_id",
    pred_col: str = "cluster_id",
    gold_col: str = "cluster_id",
) -> DataFrame:
    """Information-theoretic clustering comparison: Normalized Mutual
    Information (Strehl & Ghosh 2002, sqrt normalization) and Variation of
    Information (Meilă 2007) between two clusterings of the same records —
    the complement to :func:`cluster_quality`'s B-cubed/ARI (set-overlap
    metrics) and :func:`pairwise_f1` (the north-rule pair metric). VI is a
    true metric on clusterings (triangle inequality), which makes it the
    right distance for monitoring drift between e.g. the pipeline's
    ``transitive`` and ``pivot`` cluster_method outputs.

    One row out:
    ``(n_records, h_pred, h_gold, mi, nmi, vi)`` — entropies in nats.

    Distributed: everything reduces to four scalar sums over the (pred,
    gold) contingency — N, Σ n·ln n over cells, Σ a·ln a over pred sizes,
    Σ b·ln b over gold sizes — via the decomposition
    ``MI = ln N + (Σ n ln n − Σ a ln a − Σ b ln b) / N`` and
    ``H = ln N − Σ s ln s / N``. One alignment join + one groupBy; the cell
    table is #pred × #gold clusters at most, never the pair space; the three
    tiny aggregates assemble in a single plan (the ``pairwise_f1`` shape).

    Degenerate guard — STRUCTURAL, not float: a clustering's entropy is
    exactly 0 iff it has one cluster (or ≤ 1 records); that integer fact is
    what gates the special cases, because the float expression
    ``ln N − (Σ s ln s)/N`` does NOT cancel to exactly 0 for many N (e.g.
    N=6 leaves ±2e-16, enough to flip an exact ``== 0`` test or push the
    sqrt negative into NaN). When a side is trivial, its entropy and the MI
    are pinned to exact 0.0; NMI is 1.0 when BOTH are trivial (identical
    information: none) else 0.0 when exactly one is. Non-degenerate
    entropies/MI/VI are clamped at 0 (they are mathematically ≥ 0; floats
    can undershoot by an ulp).
    """
    both = pred.select(F.col(id_col).alias("rec_id"), F.col(pred_col).alias("p")).join(
        gold.select(F.col(id_col).alias("rec_id"), F.col(gold_col).alias("g")),
        "rec_id",
    )
    cell = both.groupBy("p", "g").agg(F.count(F.lit(1)).alias("n"))
    psz = cell.groupBy("p").agg(F.sum("n").alias("np"))
    gsz = cell.groupBy("g").agg(F.sum("n").alias("ng"))
    core = cell.agg(
        F.sum("n").alias("n_records"),
        F.sum(F.col("n") * F.log(F.col("n"))).alias("_sc"),
    )
    a_df = psz.agg(
        F.sum(F.col("np") * F.log(F.col("np"))).alias("_sa"),
        F.count(F.lit(1)).alias("_kp"),
    )
    b_df = gsz.agg(
        F.sum(F.col("ng") * F.log(F.col("ng"))).alias("_sb"),
        F.count(F.lit(1)).alias("_kg"),
    )
    n = F.col("n_records")
    triv_p = (F.col("_kp") == 1) | (n <= 1)
    triv_g = (F.col("_kg") == 1) | (n <= 1)
    h_pred = F.when(triv_p, F.lit(0.0)).otherwise(
        F.greatest(F.log(n) - F.col("_sa") / n, F.lit(0.0))
    )
    h_gold = F.when(triv_g, F.lit(0.0)).otherwise(
        F.greatest(F.log(n) - F.col("_sb") / n, F.lit(0.0))
    )
    mi = F.when(triv_p | triv_g, F.lit(0.0)).otherwise(
        F.greatest(
            F.log(n) + (F.col("_sc") - F.col("_sa") - F.col("_sb")) / n, F.lit(0.0)
        )
    )
    denom = F.sqrt(h_pred * h_gold)
    return (
        core.crossJoin(a_df)
        .crossJoin(b_df)
        .select(
            n.cast("long").alias("n_records"),
            h_pred.alias("h_pred"),
            h_gold.alias("h_gold"),
            mi.alias("mi"),
            F.when(triv_p & triv_g, F.lit(1.0))
            .otherwise(
                F.when(triv_p | triv_g, F.lit(0.0)).otherwise(
                    F.when(denom > 0, mi / denom).otherwise(F.lit(0.0))
                )
            )
            .alias("nmi"),
            F.greatest(h_pred + h_gold - 2 * mi, F.lit(0.0)).alias("vi"),
        )
    )


def score_calibration(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram + Expected Calibration Error (Naeini et al.
    AAAI 2015) for a matcher's scores against binary labels — the check
    that decides whether a score of 0.9 may be READ as "90% match
    probability" (it usually may not; LR matchers over-separate), which
    matters the moment scores feed review-queue prioritization or
    cost-based clerical thresholds instead of a single cut.

    Output: one row per occupied equal-width score bin —
    ``(bin, n_pairs, mean_score, match_rate, abs_gap, ece)`` where
    ``abs_gap = |match_rate − mean_score|`` and ``ece`` (constant across
    rows) is the n-weighted mean gap Σ (n_b/N)·gap_b.

    Distributed: one groupBy on the bin id (≤ n_bins rows out of any pair
    count), then a 1-row weighted aggregate crossJoined back as the
    constant — the score stream is reduced before anything global happens.
    Scores are expected in [0, 1]; values outside clamp into the edge bins
    (score == 1.0 and above land in the top bin, negatives in bin 0), so a
    not-yet-squashed scorer cannot silently emit out-of-range bin ids.
    """
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    b = scored.select(
        F.least(
            F.greatest(F.floor(F.col(score_col) * n_bins), F.lit(0)),
            F.lit(n_bins - 1),
        )
        .cast("int")
        .alias("bin"),
        F.col(score_col).alias("_s"),
        F.col(label_col).cast("double").alias("_l"),
    )
    per = (
        b.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.avg("_s").alias("mean_score"),
            F.avg("_l").alias("match_rate"),
        )
        .withColumn("abs_gap", F.abs(F.col("match_rate") - F.col("mean_score")))
    )
    ece = per.agg(
        (F.sum(F.col("n_pairs") * F.col("abs_gap")) / F.sum("n_pairs")).alias("ece")
    )
    return per.crossJoin(F.broadcast(ece)).select(
        "bin", "n_pairs", "mean_score", "match_rate", "abs_gap", "ece"
    )


def blocking_metrics(
    candidates: DataFrame, gold: DataFrame, n_records: int
) -> DataFrame:
    """Standard blocking-quality triple for an ER candidate-pair set:

    - reduction_ratio: 1 - |candidates| / C(n_records, 2) — how much of the
      quadratic pair space the blocker prunes;
    - pairs_completeness: |candidates ∩ gold| / |gold| — recall of true
      matched pairs (the blocker's ceiling on downstream recall);
    - pairs_quality: |candidates ∩ gold| / |candidates| — precision of the
      candidate stream.

    Both inputs are (rec_id_a, rec_id_b) with rec_id_a < rec_id_b (callers
    normalize orientation first). One row out. Distributed: an inner join
    for the intersection and three counts assembled in a single plan — the
    pair sets are never collected. Empty gold -> completeness 1.0; empty
    candidates -> quality 1.0 (vacuous truth, matching the convention of
    pairwise_f1's empty-side handling).
    """
    if n_records < 2:
        raise ValueError(f"n_records must be >= 2, got {n_records}")
    cand = candidates.select("rec_id_a", "rec_id_b")
    g = gold.select("rec_id_a", "rec_id_b")
    hit = cand.join(g, ["rec_id_a", "rec_id_b"], "left_semi")
    n_cand = cand.agg(F.count(F.lit(1)).alias("n_cand"))
    n_gold = g.agg(F.count(F.lit(1)).alias("n_gold"))
    n_hit = hit.agg(F.count(F.lit(1)).alias("n_hit"))
    total = float(n_records * (n_records - 1) / 2)
    return (
        n_cand.crossJoin(n_gold)
        .crossJoin(n_hit)
        .select(
            "n_cand",
            "n_gold",
            "n_hit",
            (1.0 - F.col("n_cand") / F.lit(total)).alias("reduction_ratio"),
            F.when(F.col("n_gold") > 0, F.col("n_hit") / F.col("n_gold"))
            .otherwise(F.lit(1.0))
            .alias("pairs_completeness"),
            F.when(F.col("n_cand") > 0, F.col("n_hit") / F.col("n_cand"))
            .otherwise(F.lit(1.0))
            .alias("pairs_quality"),
        )
    )


def blocking_attribution(
    blocked: DataFrame,
    gold: DataFrame,
    key_col: str = "block_key",
    id_col: str = "rec_id",
    generator_col: str | None = None,
) -> DataFrame:
    """Per-GENERATOR blocking attribution — which key generator in a
    redundancy-positive union (dictionary ∪ LSH bands ∪ phonetic ∪ prefix …)
    is actually earning its pair cost: :func:`blocking_metrics` scores the
    union as a whole; this splits recall and cost by generator so a blocker
    that proposes millions of pairs while every gold pair it finds is ALSO
    found elsewhere can be dropped with zero recall loss.

    ``blocked`` is (block_key, rec_id); the generator is ``generator_col``
    when given, else the key's prefix before the first ':' (the repo-wide
    key convention: 'd:', 'm:<band>:', 'p:', 'pre:' …). ``gold`` is
    (rec_id_a, rec_id_b), a < b. Per generator:

    - n_pairs       — distinct candidate pairs the generator proposes;
    - n_gold_hit    — gold pairs among them (the generator's own recall);
    - n_unique_hits — gold pairs found by NO other generator (its
                      irreplaceable contribution: what recall would be
                      lost by removing it);
    - completeness  — n_gold_hit / |gold|.

    Distributed: one block-key self-join per the union stream (keys of
    different generators never collide thanks to the prefix, so one join
    covers all generators), a distinct on (generator, pair), one semi-ish
    gold join, one per-pair generator-count aggregate for uniqueness, and
    a broadcastable |gold| count. Never the record cross product.
    """
    gen = (
        F.col(generator_col)
        if generator_col
        else F.split(F.col(key_col), ":").getItem(0)
    )
    bl = blocked.select(gen.alias("_g"), F.col(key_col).alias("_k"), F.col(id_col).alias("_r"))
    a = bl.select("_g", "_k", F.col("_r").alias("rec_id_a"))
    b = bl.select("_k", F.col("_r").alias("rec_id_b"))
    pairs = (
        a.join(b, "_k")
        .where(F.col("rec_id_a") < F.col("rec_id_b"))
        .select("_g", "rec_id_a", "rec_id_b")
        .distinct()
    )
    g = gold.select("rec_id_a", "rec_id_b")
    hits = pairs.join(g, ["rec_id_a", "rec_id_b"], "left_semi")
    # uniqueness: per covered gold pair, how many generators found it
    fanout = hits.groupBy("rec_id_a", "rec_id_b").agg(
        F.count(F.lit(1)).alias("_ng")
    )
    per_gen = (
        pairs.groupBy("_g")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .join(
            hits.groupBy("_g").agg(F.count(F.lit(1)).alias("n_gold_hit")),
            "_g",
            "left",
        )
        .join(
            hits.join(fanout.where(F.col("_ng") == 1), ["rec_id_a", "rec_id_b"])
            .groupBy("_g")
            .agg(F.count(F.lit(1)).alias("n_unique_hits")),
            "_g",
            "left",
        )
    )
    n_gold = g.agg(F.count(F.lit(1)).alias("_tot"))
    return per_gen.crossJoin(F.broadcast(n_gold)).select(
        F.col("_g").alias("generator"),
        "n_pairs",
        F.coalesce("n_gold_hit", F.lit(0)).cast("long").alias("n_gold_hit"),
        F.coalesce("n_unique_hits", F.lit(0)).cast("long").alias("n_unique_hits"),
        F.when(
            F.col("_tot") > 0,
            F.coalesce("n_gold_hit", F.lit(0)) / F.col("_tot"),
        )
        .otherwise(F.lit(1.0))
        .alias("completeness"),
    )


def pr_curve(
    scored: DataFrame,
    label_col: str = "is_match",
    score_col: str = "score",
    bins: int = 100,
) -> DataFrame:
    """Precision/recall operating curve for a scored pair stream against
    boolean gold labels: one row per occupied score bin, with the counts a
    classifier thresholding AT that bin's lower edge would see.

    Scores are binned to ``floor(score * bins) / bins`` (fixed resolution,
    so the cumulative pass runs over at most ``bins + 1`` rows — bounded by
    construction, the same small-by-construction window exemption as the
    per-distinct-weight cumsum in clean.py; the billions-of-pairs input is
    reduced by ONE groupBy before any ordering happens). Output columns:
    ``threshold, tp, fp, fn, precision, recall`` — exact integer counts,
    divisions only at the end.

    Rows with a NULL score or NULL label are EXCLUDED (an unlabeled pair
    must not silently count as a false positive); callers evaluating a
    left-joined gold column decide the NULL semantics explicitly first.
    """
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    binned = scored.select(
        (F.floor(F.col(score_col) * bins) / bins).alias("threshold"),
        F.col(label_col).cast("boolean").alias("_y"),
    ).where(F.col("threshold").isNotNull() & F.col("_y").isNotNull())
    per_bin = binned.groupBy("threshold").agg(
        F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("_pos"),
        F.sum(F.when(F.col("_y"), 0).otherwise(1)).alias("_neg"),
    )
    total_pos = per_bin.agg(F.sum("_pos").alias("_tp_all"))
    w = Window.orderBy(F.desc("threshold")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per_bin.crossJoin(total_pos)
        .withColumn("tp", F.sum("_pos").over(w).cast("long"))
        .withColumn("fp", F.sum("_neg").over(w).cast("long"))
        .select(
            "threshold",
            "tp",
            "fp",
            (F.col("_tp_all") - F.col("tp")).cast("long").alias("fn"),
            (F.col("tp") / (F.col("tp") + F.col("fp"))).alias("precision"),
            F.when(F.col("_tp_all") > 0, F.col("tp") / F.col("_tp_all"))
            .otherwise(F.lit(1.0))
            .alias("recall"),
        )
    )


def roc_auc(
    scored: DataFrame,
    label_col: str = "is_match",
    score_col: str = "score",
    order_partitions: int = 256,
) -> DataFrame:
    """Exact ROC-AUC for a scored pair stream against boolean gold labels,
    via the Mann-Whitney rank-sum identity with midrank tie correction:

        AUC = (Σ_{positives} midrank − P(P+1)/2) / (P·N)

    which equals P(score⁺ > score⁻) + ½·P(score⁺ = score⁻) — the
    threshold-free companion number to ``pr_curve`` (AUC summarizes ranking
    quality; the curve shows the operating points). Output: ONE row
    ``(n_pos, n_neg, auc, gini)`` with ``gini = 2·AUC − 1``; ``auc`` is
    NULL when either class is empty (undefined, never silently 0.5).

    Distributed exactly like ``byte_pack_buckets``' prefix sum
    (multimodal.py): the pair stream is first reduced by ONE groupBy to at
    most one row per DISTINCT score (n_pos, n_neg per score); the midrank
    cumsum over those rows then runs as parallel per-range windows — scores
    are cut into ``order_partitions`` FIXED equal-width ranges of [0, 1]
    (out-of-range scores clamp into the edge ranges, which preserves global
    score order since the range id is monotone in the score), per-range
    count subtotals are one tiny collect (≤ ``order_partitions`` rows), and
    each range's window gets its global prefix offset broadcast-joined on.
    No global sort, no single-partition window, no O(P·N) pair comparison.
    DETERMINISM REQUIREMENT: the per-score aggregate is evaluated by both
    the subtotal job and the final plan — the upstream ``scored`` plan must
    be re-execution-deterministic in (score, label); persist it first if
    not. Rows with a NULL score or label are EXCLUDED (same contract as
    ``pr_curve``)."""
    k = max(1, (order_partitions - 1).bit_length())
    nranges = 1 << k
    per = (
        scored.select(
            F.col(score_col).cast("double").alias("_s"),
            F.col(label_col).cast("boolean").alias("_y"),
        )
        .where(F.col("_s").isNotNull() & F.col("_y").isNotNull())
        .groupBy("_s")
        .agg(
            F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("_np"),
            F.count(F.lit(1)).alias("_n"),
        )
        .withColumn(
            "_rg",
            F.least(
                F.greatest(F.floor(F.col("_s") * nranges), F.lit(0)),
                F.lit(nranges - 1),
            ).cast("long"),
        )
    )
    sub = {
        r["_rg"]: r["_n"]
        for r in per.groupBy("_rg").agg(F.sum("_n").alias("_n")).collect()
    }
    run, offsets = 0, []
    for rg in range(nranges):
        if rg in sub:
            offsets.append((rg, run))
            run += int(sub[rg])
    spark = scored.sparkSession
    off = F.broadcast(
        spark.createDataFrame(offsets or [(0, 0)], "_rg long, _off long")
    )
    w = Window.partitionBy("_rg").orderBy("_s")
    ranked = (
        per.join(off, "_rg")
        .withColumn("_cum", F.col("_off") + F.sum("_n").over(w))
        .select(
            "_np",
            "_n",
            # midrank of the tied group ending at _cum: mean of ranks
            # (_cum - _n + 1) .. _cum
            (F.col("_cum") - (F.col("_n") - 1) / F.lit(2.0)).alias("_midrank"),
        )
    )
    agg = ranked.agg(
        F.sum("_np").cast("long").alias("n_pos"),
        (F.sum("_n") - F.sum("_np")).cast("long").alias("n_neg"),
        F.sum(F.col("_np") * F.col("_midrank")).alias("_rank_pos"),
    )
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        (F.col("_rank_pos") - F.col("n_pos") * (F.col("n_pos") + 1) / F.lit(2.0))
        / (F.col("n_pos") * F.col("n_neg")),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        auc.alias("auc"),
        (2 * auc - 1).alias("gini"),
    )


def brier_decomposition(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Brier score with the Murphy (1973) decomposition — the
    proper-scoring-rule companion to ``score_calibration``'s ECE and
    ``roc_auc``'s ranking number: one row
    ``(n, base_rate, brier, reliability, resolution, uncertainty,
    within_bin)`` where, over the same clamped equal-width score bins as
    ``score_calibration``,

    - ``brier``       = mean (score − label)²   (exact, unbinned)
    - ``reliability`` = Σ n_b·(p̄_b − ȳ_b)² / N  (calibration error — lower better)
    - ``resolution``  = Σ n_b·(ȳ_b − ȳ)² / N    (discrimination — higher better)
    - ``uncertainty`` = ȳ·(1 − ȳ)               (irreducible base-rate variance)
    - ``within_bin``  = brier − (reliability − resolution + uncertainty),
      the within-bin forecast-variance residual — exactly 0 when scores
      are constant per bin, so the Murphy identity is emitted as data,
      not assumed.

    Distributed: ONE groupBy on the bin id (≤ n_bins rows) plus ONE global
    1-row aggregate, crossJoined — same reduction discipline as
    ``score_calibration``. Rows with NULL score or label are excluded."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    b = scored.select(
        F.least(
            F.greatest(F.floor(F.col(score_col) * n_bins), F.lit(0)),
            F.lit(n_bins - 1),
        )
        .cast("int")
        .alias("_bin"),
        F.col(score_col).cast("double").alias("_s"),
        F.col(label_col).cast("double").alias("_l"),
    ).where(F.col("_s").isNotNull() & F.col("_l").isNotNull())
    glob = b.agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg("_l").alias("_ybar"),
        F.avg((F.col("_s") - F.col("_l")) * (F.col("_s") - F.col("_l"))).alias(
            "_brier"
        ),
    )
    per = b.groupBy("_bin").agg(
        F.count(F.lit(1)).alias("_nb"),
        F.avg("_s").alias("_pb"),
        F.avg("_l").alias("_yb"),
    )
    parts = per.crossJoin(F.broadcast(glob)).agg(
        (
            F.sum(
                F.col("_nb") * (F.col("_pb") - F.col("_yb")) * (F.col("_pb") - F.col("_yb"))
            )
            / F.first("_n")
        ).alias("_rel"),
        (
            F.sum(
                F.col("_nb") * (F.col("_yb") - F.col("_ybar")) * (F.col("_yb") - F.col("_ybar"))
            )
            / F.first("_n")
        ).alias("_res"),
    )
    unc = F.col("_ybar") * (1.0 - F.col("_ybar"))
    return glob.crossJoin(F.broadcast(parts)).select(
        F.col("_n").cast("long").alias("n"),
        F.col("_ybar").alias("base_rate"),
        F.col("_brier").alias("brier"),
        F.col("_rel").alias("reliability"),
        F.col("_res").alias("resolution"),
        unc.alias("uncertainty"),
        (F.col("_brier") - (F.col("_rel") - F.col("_res") + unc)).alias(
            "within_bin"
        ),
    )


def best_threshold(
    curve: DataFrame,
    precision_col: str = "precision",
    recall_col: str = "recall",
    threshold_col: str = "threshold",
) -> DataFrame:
    """F1-optimal operating point from a ``pr_curve`` output: ONE row —
    the curve row maximizing F1 = 2PR/(P+R), ties broken toward the
    HIGHER threshold (prefer precision when F1 is equal) — the number a
    pipeline actually deploys after staring at the curve. Composes with
    ``pr_curve``: callers control rounding/binning there; this is a
    bounded argmax over the (≤ bins+1)-row curve via one struct-max
    aggregate, no sort, no window."""
    p, r = F.col(precision_col), F.col(recall_col)
    c = curve.withColumn(
        "f1", F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0))
    )
    rest = [
        col
        for col in c.columns
        if col not in ("f1", threshold_col)
    ]
    s = c.agg(F.max(F.struct("f1", threshold_col, *rest)).alias("_s"))
    return s.select("_s.*")


def learn_blocking_rules(
    pairs: DataFrame,
    rule_cols: list[str],
    label_col: str = "is_match",
    n_rules: int = 3,
) -> DataFrame:
    """Greedy disjunctive blocking-scheme learning (the Dedupe.io /
    BSL-style recipe): given LABELED candidate pairs and boolean rule
    columns ("same soundex", "same 4-prefix", …), pick ``n_rules`` rules
    one at a time, each maximizing the number of NOT-YET-COVERED match
    pairs it blocks (ties → lexicographically smaller rule name), and
    report the marginal and cumulative coverage/cost of each pick:

    ``(round, rule, new_matches, new_pairs, cum_matches, cum_pairs,
    total_matches)`` — ``new_pairs`` is the comparison budget the rule
    adds (its not-yet-covered pairs, match or not), so the output is the
    coverage/cost frontier a pipeline reads to decide where to stop.

    Distributed: each greedy round is ONE aggregation pass over the pair
    stream (a conditional sum per remaining rule — f columns, not f
    jobs) collected as a single row; the coverage predicate grows by one
    OR-term per pick. Driver state is O(n_rules); determinism comes from
    the fixed tie-break, so the greedy trace is SQL-replayable round by
    round."""
    if not rule_cols:
        raise ValueError("rule_cols must be non-empty")
    if len(set(rule_cols)) != len(rule_cols):
        raise ValueError(f"duplicate rule columns: {rule_cols}")
    if not 1 <= n_rules <= len(rule_cols):
        raise ValueError(
            f"n_rules must be in [1, {len(rule_cols)}], got {n_rules}"
        )
    lab = F.coalesce(F.col(label_col).cast("boolean"), F.lit(False))
    flags = {r: F.coalesce(F.col(r).cast("boolean"), F.lit(False)) for r in rule_cols}
    selected: list[str] = []
    covered = F.lit(False)
    rows = []
    cum_m = cum_p = 0
    total_matches: int | None = None
    for t in range(1, n_rules + 1):
        remaining = [r for r in rule_cols if r not in selected]
        aggs = [
            F.sum(F.when(flags[r] & lab & ~covered, 1).otherwise(0)).alias(f"_m_{r}")
            for r in remaining
        ] + [
            F.sum(F.when(flags[r] & ~covered, 1).otherwise(0)).alias(f"_p_{r}")
            for r in remaining
        ]
        if total_matches is None:
            aggs.append(F.sum(F.when(lab, 1).otherwise(0)).alias("_tot"))
        stat = pairs.agg(*aggs).collect()[0]
        if total_matches is None:
            total_matches = int(stat["_tot"] or 0)
        pick = sorted(remaining, key=lambda r: (-int(stat[f"_m_{r}"] or 0), r))[0]
        new_m = int(stat[f"_m_{pick}"] or 0)
        new_p = int(stat[f"_p_{pick}"] or 0)
        cum_m += new_m
        cum_p += new_p
        rows.append((t, pick, new_m, new_p, cum_m, cum_p, total_matches))
        selected.append(pick)
        covered = covered | flags[pick]
    return pairs.sparkSession.createDataFrame(
        rows,
        "round long, rule string, new_matches long, new_pairs long, "
        "cum_matches long, cum_pairs long, total_matches long",
    )


def progressive_size_curve(
    blocked: DataFrame,
    gold: DataFrame,
    key_col: str = "block_key",
    id_col: str = "rec_id",
    entity_col: str = "entity_id",
) -> DataFrame:
    """Progressive (pay-as-you-go) ER schedule audit — Whang et al., "Pay-
    As-You-Go Entity Resolution" (TKDE 2013) / Papenbrock et al.'s
    progressive dedup: process blocks SMALLEST FIRST (small blocks are the
    cheap, match-dense ones under Zipfian keys) and report how much recall
    each block-size tier buys per comparison, so a budgeted run knows where
    to stop. One output row per DISTINCT BLOCK SIZE, in schedule order:

    ``block_size, n_blocks, new_pairs, new_matches, cum_pairs,
    cum_matches, cum_recall``

    where ``new_pairs`` is the comparison cost added by that tier
    (sum of C(n,2) over its blocks — re-comparisons across blocks are
    charged again, the real cost model), ``new_matches`` counts DISTINCT
    gold pairs first reachable at that tier (a pair co-blocked at several
    sizes is credited only to its smallest — min-size attribution, so the
    cumulative never double counts), and ``cum_recall`` divides by ALL
    gold pairs (sum of C(m,2) over entities), so unblocked matches
    depress the asymptote exactly as :func:`blocking_metrics` would.

    Scale: the only pair-shaped intermediate is the within-block
    same-entity self-join — the same shape (and the same cap_blocks
    guard applies upstream) as candidate generation itself; everything
    else is groupBy-reduced before the single cumulative window, which
    runs over at most max-block-size rows (the small-by-construction
    window exemption, as in :func:`pr_curve`).
    """
    b = blocked.select(F.col(key_col).alias("_k"), F.col(id_col).alias("_id")).distinct()
    sizes = b.groupBy("_k").agg(F.count(F.lit(1)).alias("_n"))
    per_size = sizes.groupBy(F.col("_n").alias("block_size")).agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum(F.expr("_n * (_n - 1) DIV 2")).cast("long").alias("new_pairs"),
    )
    g = gold.select(F.col(id_col).alias("_id"), F.col(entity_col).alias("_e"))
    lab = b.join(g, "_id")
    left = lab.select("_k", F.col("_id").alias("_a"), F.col("_e").alias("_ea"))
    right = lab.select("_k", F.col("_id").alias("_b"), F.col("_e").alias("_eb"))
    first_size = (
        left.join(right, "_k")
        .where((F.col("_a") < F.col("_b")) & (F.col("_ea") == F.col("_eb")))
        .join(sizes, "_k")
        .groupBy("_a", "_b")
        .agg(F.min("_n").alias("block_size"))
    )
    per_first = first_size.groupBy("block_size").agg(
        F.count(F.lit(1)).cast("long").alias("new_matches")
    )
    total = g.groupBy("_e").agg(F.count(F.lit(1)).alias("_m")).agg(
        F.sum(F.expr("_m * (_m - 1) DIV 2")).cast("long").alias("_total_matches")
    )
    curve = (
        per_size.join(per_first, "block_size", "full_outer")
        .na.fill(0, ["n_blocks", "new_pairs", "new_matches"])
    )
    w = Window.orderBy("block_size").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        curve.crossJoin(total)
        .withColumn("cum_pairs", F.sum("new_pairs").over(w).cast("long"))
        .withColumn("cum_matches", F.sum("new_matches").over(w).cast("long"))
        .select(
            "block_size",
            "n_blocks",
            "new_pairs",
            "new_matches",
            "cum_pairs",
            "cum_matches",
            F.when(
                F.col("_total_matches") > 0,
                F.round(F.col("cum_matches") / F.col("_total_matches"), 6),
            )
            .otherwise(F.lit(1.0))
            .alias("cum_recall"),
        )
    )


def recall_at_k(
    ranked: DataFrame,
    gold: DataFrame,
    ks: list[int],
    query_col: str = "query_id",
    cand_col: str = "cand_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Candidate-generation quality curve: recall@k and query coverage@k
    of a ranked candidate list against gold matches — THE acceptance
    metric for a blocker+ranker stack (a matcher can never recover a
    pair candidate generation dropped, so this curve upper-bounds
    end-to-end recall exactly like ``upperbound_predict`` does for the
    disambiguation side). A gold pair absent from ``ranked`` (blocked
    away, or ranked below the list cutoff) counts as missed at every k —
    blocker misses are charged honestly, not silently excluded.

    Per k: ``n_hit`` gold pairs with rank ≤ k, ``recall`` their share of
    ALL gold pairs, ``n_queries_hit``/``coverage`` the share of queries
    (with ≥1 gold pair) that got at least one hit in the top k — the
    user-facing "did anything useful surface" number.

    Scale: one left join of gold onto the ranked list (gold-sized), one
    explode over |ks| (a handful), two bounded rollups. The ranked input
    usually comes pre-truncated per query; nothing here is ever
    corpus-sized.

    Output: ``(k, n_gold, n_hit, recall, n_queries, n_queries_hit,
    coverage)`` — one row per k.
    """
    if not ks or any(k < 1 for k in ks):
        raise ValueError(f"ks must be non-empty positive ints, got {ks}")
    g = gold.select(F.col(query_col).alias("_q"), F.col(cand_col).alias("_c"))
    r = ranked.select(
        F.col(query_col).alias("_q"),
        F.col(cand_col).alias("_c"),
        F.col(rank_col).cast("long").alias("_r"),
    )
    hits = g.join(r, ["_q", "_c"], "left")
    ks_lit = F.array(*[F.lit(int(k)) for k in sorted(set(ks))])
    per = (
        hits.select("_q", "_r", F.explode(ks_lit).alias("k"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gold"),
            F.sum(
                F.when(
                    F.col("_r").isNotNull() & (F.col("_r") <= F.col("k")), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_hit"),
            F.countDistinct("_q").cast("long").alias("n_queries"),
            F.countDistinct(
                F.when(
                    F.col("_r").isNotNull() & (F.col("_r") <= F.col("k")),
                    F.col("_q"),
                )
            )
            .cast("long")
            .alias("n_queries_hit"),
        )
    )
    return per.select(
        F.col("k").cast("long").alias("k"),
        "n_gold",
        "n_hit",
        F.round(F.col("n_hit") / F.col("n_gold"), 6).alias("recall"),
        "n_queries",
        "n_queries_hit",
        F.round(F.col("n_queries_hit") / F.col("n_queries"), 6).alias(
            "coverage"
        ),
    )


def blocker_venn(
    blocked_by: list[tuple[str, DataFrame]],
    id_col: str = "rec_id",
    key_col: str = "block_key",
    gold: DataFrame | None = None,
    entity_col: str = "entity_id",
) -> DataFrame:
    """Venn / UpSet audit of candidate-pair sets across blocking
    GENERATORS: each generator's blocks induce a pair set; every pair
    observed by at least one generator gets the sorted combination of
    generators that proposed it, and the audit reports pair counts per
    combination — the overlap structure :func:`blocking_attribution`
    (per-generator marginals) cannot show. The decision it feeds: a
    generator whose pairs are ~all shared with a cheaper one is pure
    cost; a small exclusive region dense in GOLD matches is the blocker
    earning its keep. With ``gold`` provided, each combination also
    reports its match count.

    Scale: per-generator pair sets come from the usual capped block
    self-joins; the combination label is one groupBy over the unioned
    pair stream (collect_set over generator names — bounded by the
    generator count, a handful); the rollup is tiny. Nothing driver-side.

    Output: ``(combo, n_pairs[, n_matches])`` — combo like "lsh+token".
    """
    if not blocked_by:
        raise ValueError("blocked_by must be non-empty")
    streams = []
    for name, blocked in blocked_by:
        b = blocked.select(F.col(key_col).alias("_k"), F.col(id_col).alias("_r"))
        a = b.select("_k", F.col("_r").alias("_a"))
        c = b.select("_k", F.col("_r").alias("_b"))
        pairs = (
            a.join(c, "_k")
            .where(F.col("_a") < F.col("_b"))
            .select("_a", "_b")
            .distinct()
            .withColumn("_gen", F.lit(name))
        )
        streams.append(pairs)
    allp = streams[0]
    for s in streams[1:]:
        allp = allp.unionByName(s)
    combos = allp.groupBy("_a", "_b").agg(
        F.array_join(F.array_sort(F.collect_set("_gen")), "+").alias("combo")
    )
    if gold is not None:
        g = gold.select(F.col(id_col).alias("_r"), F.col(entity_col).alias("_e"))
        combos = (
            combos.join(g.select(F.col("_r").alias("_a"), F.col("_e").alias("_ea")), "_a", "left")
            .join(g.select(F.col("_r").alias("_b"), F.col("_e").alias("_eb")), "_b", "left")
            .withColumn(
                "_is_match",
                F.coalesce(F.col("_ea") == F.col("_eb"), F.lit(False)),
            )
        )
        return combos.groupBy("combo").agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.when(F.col("_is_match"), 1).otherwise(0))
            .cast("long")
            .alias("n_matches"),
        )
    return combos.groupBy("combo").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )


def cohen_kappa(
    rater_a: DataFrame,
    rater_b: DataFrame,
    id_col: str = "rec_id",
    label_col_a: str = "label",
    label_col_b: str = "label",
) -> DataFrame:
    """Cohen's kappa (Cohen 1960) between two labelings of the same items —
    chance-corrected agreement, the number that separates "the two matchers
    agree on 95% of pairs" from "they agree 95% of the time *because 95% of
    pairs are trivial non-matches*". In the review loop this is the
    committee-health metric next to :func:`blocker_venn` (which audits the
    PAIR sets): run it between two matcher variants, between a matcher and
    the reviewer labels, or between two reviewers to calibrate the label
    stream itself. Multi-class (labels are any equatable type); items
    present in only one labeling are dropped by the alignment join.

    One row out: ``(n_items, po, pe, kappa)`` — observed agreement,
    expected-by-chance agreement (product of marginals), and

        kappa = (po − pe) / (1 − pe)
              = (N·Σ_c n_cc − Σ_c a_c·b_c) / (N² − Σ_c a_c·b_c)

    where the second form is how it is computed: every sum is an exact
    integer (diagonal counts, marginal products), so both engines reach the
    final value through ONE identical float divide — bit-deterministic, the
    cluster_quality/ARI exactness contract. Degenerate guard: when pe == 1
    (both raters constant with the same label), kappa is 1.0 if po == 1
    else 0.0 (structural integer comparison, no float equality).

    Distributed: one alignment join, one groupBy to the (label_a, label_b)
    contingency cells, marginal rollups over the CELLS — never the item
    stream twice, no windows, no iteration.
    """
    a = rater_a.select(
        F.col(id_col).alias("_id"), F.col(label_col_a).alias("_la")
    )
    b = rater_b.select(
        F.col(id_col).alias("_id"), F.col(label_col_b).alias("_lb")
    )
    cell = a.join(b, "_id").groupBy("_la", "_lb").agg(
        F.count(F.lit(1)).alias("_n")
    )
    core = cell.agg(
        F.sum("_n").alias("n_items"),
        F.sum(F.when(F.col("_la") == F.col("_lb"), F.col("_n")).otherwise(0)).alias(
            "_agree"
        ),
    )
    ma = cell.groupBy("_la").agg(F.sum("_n").alias("_ca"))
    mb = cell.groupBy("_lb").agg(F.sum("_n").alias("_cb"))
    prod = (
        ma.join(mb, ma["_la"] == mb["_lb"])
        .agg(F.coalesce(F.sum(F.col("_ca") * F.col("_cb")), F.lit(0)).alias("_pe_num"))
    )
    n = F.col("n_items")
    po = F.col("_agree") / n
    pe = F.col("_pe_num") / (n * n)
    denom = n * n - F.col("_pe_num")
    kappa = F.when(
        denom != 0,
        (n * F.col("_agree") - F.col("_pe_num")) / denom,
    ).otherwise(
        F.when(F.col("_agree") == n, F.lit(1.0)).otherwise(F.lit(0.0))
    )
    return core.crossJoin(prod).select(
        n.cast("long").alias("n_items"),
        po.alias("po"),
        pe.alias("pe"),
        kappa.alias("kappa"),
    )


def feature_iv(
    pairs: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    id_cols: tuple[str, str] = ("id_a", "id_b"),
    n_bins: int = 5,
) -> DataFrame:
    """Weight-of-Evidence / Information-Value scorecard audit of matcher
    features (the credit-scoring feature-screening classic, standard in
    record-linkage model QA): per feature, rows are quantile-binned and

        WoE_b = ln(((pos_b + 0.5)/pos_tot) / ((neg_b + 0.5)/neg_tot))
        IV    = Σ_b (pos_b/pos_tot − neg_b/neg_tot) · WoE_b

    (half-count smoothing inside the log keeps empty cells finite; the IV
    shares stay unsmoothed). Rule-of-thumb reading: IV < 0.02 useless,
    0.1–0.3 medium, > 0.3 strong — a feature whose IV collapses between
    rounds is the early-warning signal for feature drift in a deployed
    matcher.

    Binning is rank-based and WINDOW-FREE: one `suffix.global_dense_rank`
    over (feature, value, id...) — rows are unique by the id columns, the
    leading feature key keeps features contiguous, and per-feature rank =
    global rank − (feature's min rank − 1). bin = floor((rank−1)·B / N_f):
    exact integer arithmetic, ties resolved by id order, deterministic at
    any parallelism. Output one row per (feature, bin):
    (feature, bin, n_pos, n_neg, woe, iv) with the feature's total IV
    repeated on each of its rows.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    if not feature_cols:
        raise ValueError("feature_cols must be non-empty")
    from .suffix import global_dense_rank

    ia, ib = id_cols
    stack = F.expr(
        "stack({}, {})".format(
            len(feature_cols),
            ", ".join(f"'{c}', {c}" for c in feature_cols),
        )
    ).alias("feature", "value")
    melted = pairs.select(ia, ib, label_col, stack)
    ranked = melted.join(
        global_dense_rank(melted, ["feature", "value", ia, ib], "_r"),
        ["feature", "value", ia, ib],
    )
    base = ranked.groupBy("feature").agg(
        F.min("_r").alias("_r0"), F.count(F.lit(1)).alias("_nf")
    )
    binned = ranked.join(base, "feature").select(
        "feature",
        label_col,
        F.floor(
            (F.col("_r") - F.col("_r0")) * n_bins / F.col("_nf")
        ).cast("long").alias("bin"),
    )
    cell = binned.groupBy("feature", "bin").agg(
        F.sum(F.when(F.col(label_col) == 1, 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(F.col(label_col) == 1, 0).otherwise(1)).alias("n_neg"),
    )
    tots = cell.groupBy("feature").agg(
        F.sum("n_pos").alias("_pt"), F.sum("n_neg").alias("_nt")
    )
    ok = (F.col("_pt") > 0) & (F.col("_nt") > 0)
    woe = F.when(
        ok,
        F.log(
            ((F.col("n_pos") + F.lit(0.5)) / F.col("_pt"))
            / ((F.col("n_neg") + F.lit(0.5)) / F.col("_nt"))
        ),
    ).otherwise(F.lit(0.0))  # single-class labels: IV is undefined, report 0
    contrib = F.when(
        ok,
        (F.col("n_pos") / F.col("_pt") - F.col("n_neg") / F.col("_nt")) * woe,
    ).otherwise(F.lit(0.0))
    scored = cell.join(tots, "feature").select(
        "feature", "bin", "n_pos", "n_neg", woe.alias("woe"), contrib.alias("_c")
    )
    iv = scored.groupBy("feature").agg(F.sum("_c").alias("iv"))
    return scored.join(iv, "feature").select(
        "feature", "bin", "n_pos", "n_neg", "woe", "iv"
    )


def dup_completeness(
    clusters: DataFrame, cluster_col: str = "cluster_id"
) -> DataFrame:
    """Species-richness estimate of deduplication completeness (Chao,
    Scand. J. Stat. 1984; the mark-recapture view progressive-ER uses to
    decide when to STOP looking for duplicates): each record is a capture
    of its entity, and the cluster-size frequency-of-frequencies f_k
    projects what the sample has not yet captured:

        Chao1    = S_obs + f1·(f1−1) / (2·(f2+1))   (bias-corrected,
                                                     defined when f2 = 0)
        coverage = 1 − f1/n                          (Good–Turing)

    — when the clustered table is a sample of a larger stream, Chao1
    estimates the true entity count and ``coverage`` is the probability
    the NEXT record belongs to an already-seen entity. A dedup run whose
    Chao1 ≫ S_obs is telling you its blocking is still missing mass.

    Two tiny aggregations (cluster sizes → one conditional-sum row);
    exact integers into two divisions. Output one row:
    (n_records, s_obs, f1, f2, chao1, coverage).
    """
    sizes = clusters.groupBy(cluster_col).agg(F.count(F.lit(1)).alias("_sz"))
    return sizes.agg(
        F.sum("_sz").cast("long").alias("n_records"),
        F.count(F.lit(1)).cast("long").alias("s_obs"),
        F.sum(F.when(F.col("_sz") == 1, 1).otherwise(0)).cast("long").alias("f1"),
        F.sum(F.when(F.col("_sz") == 2, 1).otherwise(0)).cast("long").alias("f2"),
    ).select(
        "n_records",
        "s_obs",
        "f1",
        "f2",
        (
            F.col("s_obs")
            + F.col("f1") * (F.col("f1") - 1) / (F.lit(2.0) * (F.col("f2") + 1))
        ).alias("chao1"),
        (F.lit(1.0) - F.col("f1") / F.col("n_records")).alias("coverage"),
    )
