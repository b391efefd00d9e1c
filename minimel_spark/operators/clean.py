"""Candidate cleaning stage: anchor_counts -> candidates (SURVEY §2 A4-A7, J8, J9,
O1-O3, P10).

Reference: minimel/clean.py:130-262 — which is entirely DRIVER-LOCAL dict/Counter
code in the reference (its single-node scalability cliff). Here every step is a
DataFrame op, so the whole stage shuffles on ``anchor``/``qid`` keys and scales
horizontally:

1. total entity counts (A4)                  — groupBy(qid).sum
2. ambiguity filter (P10: len(ec)>1)         — agg + left-semi join (no per-row window)
3. disambiguation-page boosts (J2-adjacent)  — normalized union + full-outer sum
4. bad-entity removal (J8)                   — left_anti broadcast join
5. min_count + (optional) freqnorm weighting — filter + window max
6. entropy / countratio / tokenscore filters (A5-A7, J9) — window-normalized aggs
   + a shingle equi-join for the asymmetric Jaccard tokenscore
7. per-anchor rank (O1) and the optional quantile_top_shadowed selection (O2/O3)
   — rank window + per-weight cumulative threshold (no global sort+limit)

Determinism deltas vs the reference (documented, required for the N vs 4N
equivalence): ties in per-anchor candidate order are broken by ``qid`` ascending
(the reference inherits JSON insertion order); the global shadowed-count sort uses
the reference's own tuple order ``(cnt, anchor, qid)`` descending
(clean.py:258-259), which is already total.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions.udfs import normalize_lang_udf, shingles_udf


def total_entity_counts(counts: DataFrame) -> DataFrame:
    """A4 (clean.py:175-182): global per-entity frequency."""
    return counts.groupBy("qid").agg(F.sum("cnt").alias("total_cnt"))


def ambiguous_only(counts: DataFrame) -> DataFrame:
    """P10 (clean.py:183-186): keep anchors with >1 candidate entity.

    Shaped as an aggregate + left-semi join rather than a per-row window
    ``collect_set`` (which materializes the distinct-qid set for EVERY row of
    an anchor — memory-hostile on a skewed anchor with 10^7 rows). The agg is
    partial+final (map-side combine), the ambiguous-anchor list streams into a
    semi join, and no per-row set is ever built.
    """
    multi = (
        counts.groupBy("anchor")
        .agg(F.count_distinct("qid").alias("n_cand"))
        .where(F.col("n_cand") > 1)
        .select("anchor")
    )
    return counts.join(multi, "anchor", "left_semi")


def add_disambig(
    counts: DataFrame, disambig: DataFrame | None, language: str | None = None
) -> tuple[DataFrame, DataFrame | None]:
    """clean.py:188-193: disambiguation pages contribute +1 per (title, qid) after
    title normalization; returns (combined counts, disambig_names df)."""
    if disambig is None:
        return counts, None
    norm = normalize_lang_udf(language)
    d = (
        disambig.withColumn("anchor", norm("title"))
        .where(F.col("anchor").isNotNull())
        .groupBy("anchor", "qid")
        .agg(F.count(F.lit(1)).alias("d_cnt"))
    )
    combined = (
        counts.join(d, ["anchor", "qid"], "full_outer")
        .select(
            "anchor",
            "qid",
            (F.coalesce(F.col("cnt"), F.lit(0)) + F.coalesce(F.col("d_cnt"), F.lit(0))).alias("cnt"),
        )
    )
    return combined, d.select("anchor").distinct()


def normalized_title_dim(
    title_index: DataFrame, badents: DataFrame | None = None, language: str | None = None
) -> DataFrame:
    """J9 (clean.py:11-27, get_titles): normalized title -> qid dimension."""
    norm = normalize_lang_udf(language)
    t = (
        title_index.withColumn("norm_title", norm("title"))
        .where(F.col("norm_title").isNotNull())
        .select("norm_title", "qid")
        .distinct()
    )
    if badents is not None:
        t = t.join(F.broadcast(badents), "qid", "left_anti")
    return t


def weighted_candidates(
    counts: DataFrame,
    all_counts: DataFrame,
    badents: DataFrame | None = None,
    min_count: int = 2,
    freqnorm: bool = False,
) -> DataFrame:
    """clean.py:196-211: drop bad entities, apply min_count on raw counts, then
    weight = int(cnt * freqnorm_factor) + 1 (factor 1 when freqnorm off).

    ``all_counts`` is the pre-ambiguity-filter count table: the reference's
    ``ents`` set (clean.py:196) is built from ALL link counts, so candidate qids
    that only ever appear on disambiguation pages are dropped here, and freqnorm
    totals are global, not ambiguous-only.
    """
    df = counts
    if badents is not None:
        df = df.join(F.broadcast(badents), "qid", "left_anti")  # J8
    # e in ents: qid must occur in the full link-count table
    df = df.join(all_counts.select("qid").distinct(), "qid", "left_semi")
    df = df.where(F.col("cnt") >= min_count)
    if freqnorm:
        totals = total_entity_counts(all_counts)
        w = Window.partitionBy("anchor")
        df = (
            df.join(totals, "qid")
            .withColumn("max_tot", F.max("total_cnt").over(w))
            .withColumn(
                "weight",
                (F.floor(F.col("cnt") * F.col("total_cnt") / F.col("max_tot")) + 1).cast("long"),
            )
            .drop("total_cnt", "max_tot")
        )
    else:
        df = df.withColumn("weight", (F.col("cnt") + F.lit(1)).cast("long"))
    return df


def anchor_stats(cands: DataFrame) -> DataFrame:
    """A5/A6 (clean.py:54-59) over the weighted candidate distribution:
    entropy = -sum(p ln p), countratio = n_candidates / sum(weights)."""
    w = Window.partitionBy("anchor")
    t = cands.withColumn("t", F.sum("weight").over(w))
    p = F.col("weight") / F.col("t")
    return t.groupBy("anchor").agg(
        F.sum(-p * F.log(p)).alias("entropy"),
        (F.count(F.lit(1)) / F.first("t")).alias("countratio"),
        F.count(F.lit(1)).alias("n_cand"),
    )


def tokenscores(cands: DataFrame, title_dim: DataFrame) -> DataFrame:
    """A7/J9 (clean.py:75-85): mean asymmetric Jaccard between the anchor's char
    shingles and the union of shingles over each candidate's normalized titles.

    Shuffle plan: one explode-join on the 3-char shingle key (bounded domain),
    then two hash aggregations; the title dimension side is small and could be
    broadcast, but the shingle join is an equi-join Catalyst handles either way.
    """
    anchors = cands.select("anchor").distinct()
    a_sh = anchors.select(
        "anchor", F.explode(shingles_udf("anchor")).alias("sh")
    )
    a_size = a_sh.groupBy("anchor").agg(F.count(F.lit(1)).alias("n_sh"))
    t_sh = (
        title_dim.select("qid", F.explode(shingles_udf("norm_title")).alias("sh"))
        .distinct()
    )
    # matched shingles per (anchor, candidate qid)
    matched = (
        cands.select("anchor", "qid")
        .join(a_sh, "anchor")
        .join(t_sh, ["qid", "sh"])
        .groupBy("anchor", "qid")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    per_cand = (
        cands.select("anchor", "qid")
        .join(matched, ["anchor", "qid"], "left")
        .join(a_size, "anchor", "left")
        .withColumn(
            "leftjacc",
            F.when(
                F.col("n_sh").isNotNull() & (F.col("n_sh") > 0),
                F.coalesce(F.col("m"), F.lit(0)) / F.col("n_sh"),
            ).otherwise(F.lit(0.0)),
        )
    )
    return per_cand.groupBy("anchor").agg(F.avg("leftjacc").alias("tokenscore"))


def bad_names(
    cands: DataFrame,
    title_dim: DataFrame,
    disambig_names: DataFrame | None,
    tokenscore_threshold: float = 0.1,
    entropy_threshold: float = 1.0,
    countratio_threshold: float = 0.5,
) -> DataFrame:
    """clean.py:218-239: names to drop (U3 union of three flag sets)."""
    stats = anchor_stats(cands).join(tokenscores(cands, title_dim), "anchor")
    is_title = title_dim.select(F.col("norm_title").alias("anchor")).distinct()
    flagged = (
        stats.join(is_title.withColumn("is_title", F.lit(True)), "anchor", "left")
        .withColumn(
            "bad",
            F.when(
                F.col("tokenscore") < tokenscore_threshold,
                (F.col("entropy") > entropy_threshold)
                | (
                    (F.col("entropy") <= entropy_threshold)
                    & (F.col("countratio") > countratio_threshold)
                ),
            ).otherwise(
                (F.col("tokenscore") == 0) & F.col("is_title").isNull()
            ),
        )
        .where(F.col("bad"))
        .select("anchor")
    )
    if disambig_names is not None:
        flagged = flagged.join(disambig_names, "anchor", "left_anti")
    return flagged


def log_gap_steps(
    counts: DataFrame, cutoff: float = 0.7, count_col: str = "cnt"
) -> DataFrame:
    """O5 (reference clean.py:31-49, ``steps``/``filter_steps`` — dead code
    there, ported for completeness): per anchor, walk candidates in count
    order and CUT the list at the first large relative log-gap — keep the
    prefix before the first i where (log(c_i)+1 - log(c_i+1)-1) / (log(c_i)+1)
    exceeds ``cutoff``; the gap row itself and everything after it drop.

    Relational form: one lag window for the gap, one running-max window for
    the break flag — both on the same (anchor, cnt desc, qid asc) ordering,
    so a single shuffle. Determinism delta (documented, same as rank):
    count ties break by qid ascending, where the reference inherits Counter
    insertion order. (The reference body also references an undefined
    ``count`` variable — this implements the evident intent.)"""
    w = Window.partitionBy("anchor").orderBy(F.col(count_col).desc(), F.col("qid").asc())
    lg = F.log(F.col(count_col)) + 1
    plg = F.lag(lg).over(w)
    step = F.when(plg.isNull(), F.lit(0.0)).otherwise((plg - lg) / plg)
    return (
        counts.withColumn("_brk", (step > cutoff).cast("int"))
        .withColumn(
            "_cut",
            F.max("_brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
        .where(F.col("_cut") == 0)
        .drop("_brk", "_cut")
    )


def rank_candidates(cands: DataFrame) -> DataFrame:
    """O1 (clean.py:242-246): per-anchor rank desc by weight, ties by qid asc."""
    w = Window.partitionBy("anchor").orderBy(F.desc("weight"), F.asc("qid"))
    return cands.withColumn("rank", F.row_number().over(w))


def quantile_top_shadowed(cands_ranked: DataFrame, quantile: float) -> DataFrame:
    """O2/O3 (clean.py:249-262): keep only the anchors whose shadowed (non-top)
    candidate counts are in the global top quantile; each kept anchor retains its
    top candidate plus the qualifying shadowed candidates.

    The kept set is EXACTLY the top ``floor(quantile * n_shadowed)`` rows under
    the reference's total order ``(weight, anchor, qid)`` descending
    (clean.py:258-259), but computed scale-safely: a global
    ``orderBy().limit(quantile*n)`` funnels billions of rows through one task at
    web scale (TakeOrderedAndProject), so instead

    1. aggregate shadowed rows per distinct weight (small table: one row per
       distinct count value) and prefix-sum it to find the boundary weight —
       every weight strictly above it is kept whole;
    2. only rows AT the boundary weight are ranked (by ``anchor desc, qid
       desc``) and cut to the remainder — a single-weight slice, not the
       global table.

    ``n_shadowed`` is folded into the same aggregation (no mid-plan driver
    ``count()`` action recomputing the upstream plan).

    The per-distinct-weight prefix sum itself is DISTRIBUTED (same two-level
    shape as ``byte_pack_buckets``/``doc_vocab``): weights bucket by
    ``floor(log2(weight))`` — order-preserving because weight is the
    reference's ``int(cnt * factor) + 1`` >= 1 (clean.py:205-211) — the
    within-bucket cumsum runs under a PARTITIONED window, and the <= 64-row
    per-bucket subtotal table supplies cross-bucket offsets via a broadcast
    triangle join and the global total via a broadcast 1-row aggregate. The
    old global ``Window.orderBy(desc(weight))`` funneled every distinct
    weight through one task (and WARNed on every run).
    """
    shadowed = cands_ranked.where(F.col("rank") > 1)
    wn = shadowed.groupBy("weight").agg(F.count(F.lit(1)).alias("_wn"))
    wn = wn.withColumn("_b", F.floor(F.log2("weight")).cast("long"))
    bsub = wn.groupBy("_b").agg(F.sum("_wn").alias("_bn"))
    offs = (
        bsub.alias("a")
        .join(bsub.alias("b"), F.col("b._b") > F.col("a._b"), "left")
        .groupBy(F.col("a._b").alias("_b"))
        .agg(F.coalesce(F.sum("b._bn"), F.lit(0)).alias("_off"))
    )
    tot = bsub.agg(F.sum("_bn").alias("_n"))
    w_desc = Window.partitionBy("_b").orderBy(F.desc("weight"))
    stats = (
        wn.join(F.broadcast(offs), "_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "weight",
            "_wn",
            (
                F.coalesce(
                    F.sum("_wn").over(
                        w_desc.rowsBetween(Window.unboundedPreceding, -1)
                    ),
                    F.lit(0),
                )
                + F.col("_off")
            ).alias("_cum_gt"),
            "_n",
        )
        .withColumn("_keep_n", F.floor(F.lit(float(quantile)) * F.col("_n")))
    )
    full_weights = stats.where(
        F.col("_cum_gt") + F.col("_wn") <= F.col("_keep_n")
    ).select("weight")
    boundary = stats.where(
        (F.col("_cum_gt") < F.col("_keep_n"))
        & (F.col("_cum_gt") + F.col("_wn") > F.col("_keep_n"))
    ).select("weight", (F.col("_keep_n") - F.col("_cum_gt")).alias("_take"))
    kept_full = shadowed.join(F.broadcast(full_weights), "weight", "left_semi")
    w_bnd = Window.partitionBy("weight").orderBy(F.desc("anchor"), F.desc("qid"))
    kept_bnd = (
        shadowed.join(F.broadcast(boundary), "weight")
        .withColumn("_rn", F.row_number().over(w_bnd))
        .where(F.col("_rn") <= F.col("_take"))
        .drop("_rn", "_take")
    )
    kept_shadow = kept_full.unionByName(kept_bnd).select(*shadowed.columns)
    tops = cands_ranked.where(F.col("rank") == 1).join(
        kept_shadow.select("anchor").distinct(), "anchor", "left_semi"
    )
    return tops.unionByName(kept_shadow)


def clean(
    counts: DataFrame,
    title_index: DataFrame,
    disambig: DataFrame | None = None,
    badents: DataFrame | None = None,
    language: str | None = None,
    min_count: int = 2,
    freqnorm: bool = False,
    tokenscore_threshold: float = 0.1,
    entropy_threshold: float = 1.0,
    countratio_threshold: float = 0.5,
    quantile_top_shadowed_q: float | None = None,
) -> DataFrame:
    """Full cleaning stage: (anchor, qid, cnt) -> (anchor, qid, weight, rank)."""
    ambig = ambiguous_only(counts)
    combined, disambig_names = add_disambig(ambig, disambig, language)
    cands = weighted_candidates(combined, counts, badents, min_count, freqnorm)
    title_dim = normalized_title_dim(title_index, badents, language)
    bad = bad_names(
        cands,
        title_dim,
        disambig_names,
        tokenscore_threshold,
        entropy_threshold,
        countratio_threshold,
    )
    good = cands.join(bad, "anchor", "left_anti")
    ranked = rank_candidates(good.select("anchor", "qid", "weight"))
    if quantile_top_shadowed_q:
        ranked = quantile_top_shadowed(ranked, quantile_top_shadowed_q)
    return ranked


def smoothed_priors(
    counts: DataFrame,
    alpha: float = 10.0,
    anchor_col: str = "anchor",
    qid_col: str = "qid",
    count_col: str = "cnt",
) -> DataFrame:
    """Dirichlet-smoothed mention→entity priors with popularity backoff —
    the Bayesian upgrade of the reference's raw count ratios
    (clean.py:196-211 semantics live in :func:`weighted_candidates`;
    this is the variant a ranker actually wants as a FEATURE): an anchor
    seen 3 times gives a brittle 3/3 = 1.0 maximum-likelihood prior,
    while the smoothed estimate

        p(e|m) = (c(m,e) + α·P(e)) / (c(m) + α),  P(e) = c(e)/N

    shrinks low-evidence anchors toward each entity's GLOBAL popularity
    (the Spitkovsky-Chang-style backoff), with α the pseudo-count budget.
    Per anchor the seen-candidate mass sums to < 1 — the residue is the
    honest probability reserved for entities never linked from this
    anchor.

    Scale: two map-side-combinable aggregations (per-entity totals and
    per-anchor totals — the entity table broadcasts, the anchor total
    joins back on the anchor key the counts already shuffle on) and a
    row-local formula. Exact rationals of integers until the final
    division, so the SQL oracle reproduces values bit-for-bit.

    Output: ``(anchor, qid, cnt, prior, ml_prior)`` — smoothed next to
    maximum-likelihood, so the shrinkage is inspectable per row.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    c = counts.select(
        F.col(anchor_col).alias("anchor"),
        F.col(qid_col).alias("qid"),
        F.col(count_col).cast("long").alias("cnt"),
    )
    ent = c.groupBy("qid").agg(F.sum("cnt").alias("_ce"))
    total = ent.agg(F.sum("_ce").alias("_n"))
    anc = c.groupBy("anchor").agg(F.sum("cnt").alias("_cm"))
    return (
        c.join(F.broadcast(ent), "qid")
        .join(anc, "anchor")
        .crossJoin(F.broadcast(total))
        .select(
            "anchor",
            "qid",
            "cnt",
            (
                (F.col("cnt") + F.lit(alpha) * F.col("_ce") / F.col("_n"))
                / (F.col("_cm") + F.lit(alpha))
            ).alias("prior"),
            (F.col("cnt") / F.col("_cm")).alias("ml_prior"),
        )
    )
