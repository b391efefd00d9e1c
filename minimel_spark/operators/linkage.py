"""Fellegi-Sunter probabilistic record linkage: EM-estimated m/u
probabilities over comparison-vector agreement patterns, and per-pair match
weights (the classic probabilistic-ER model; the modern at-scale
incarnation is Splink, which runs the same pattern-count EM on Spark).

This complements the trained LR matcher (scoring.py L1, the reference's
supervised path, minimel/train.py): Fellegi-Sunter is the UNSUPERVISED
path — no labeled pairs needed, the EM separates the match/unmatch mixture
from the pattern frequencies alone.

Scale design (the whole point of the pattern formulation):
- the comparison vector is binarized per feature (agree/disagree at a
  threshold), so the state space is 2^f patterns for f features — the
  distributed work is ONE groupBy("pattern").count() over the pair stream,
  reducing 10^9+ pairs to at most 2^f rows (f <= 16 enforced).
- EM then iterates driver-side over that tiny table: O(2^f * f * n_iter)
  floating-point work, independent of data size — the same
  collect-the-subtotals pattern as the distributed prefix sums
  (multimodal.byte_pack_buckets), not a driver-side loop over data.
- scoring joins the (pattern -> weight) table back by an integer key; the
  table is at most 2^f rows, so the join is a forced broadcast.

Everything is deterministic: fixed initialization, fixed iteration count,
float64 throughout — so results are parallelism-invariant and
oracle-checkable (the EM unrolls into SQL aggregations over the pattern
table; see __spark_entry__.q_er_fs_em).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# probabilities are clamped away from {0, 1} so log-weights stay finite and
# a feature that happens to always (dis)agree cannot freeze the EM
_P_FLOOR = 1e-6


def comparison_patterns(
    features: DataFrame, thresholds: dict[str, float]
) -> DataFrame:
    """Binarize similarity feature columns into agreement indicators and an
    integer ``pattern`` key (bit i = agreement on the i-th feature, features
    ordered by sorted(thresholds)). NULL features count as disagreement
    (the Fellegi-Sunter missing-value convention for absent comparisons).

    Adds columns ``g_<feature>`` (0/1 int) and ``pattern`` (long); all
    JVM expressions, no shuffle.
    """
    if not thresholds:
        raise ValueError("thresholds must be non-empty")
    if len(thresholds) > 16:
        raise ValueError(
            f"at most 16 features supported (2^f pattern state space), "
            f"got {len(thresholds)}"
        )
    cols = sorted(thresholds)
    out = features
    pattern = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        g = F.when(F.col(c) >= F.lit(float(thresholds[c])), F.lit(1)).otherwise(
            F.lit(0)
        )
        out = out.withColumn(f"g_{c}", g.cast("int"))
        pattern = pattern + (F.col(f"g_{c}").cast("long") * F.lit(1 << i))
    return out.withColumn("pattern", pattern)


def _em(counts, f, n_iter, init_lambda, init_m, init_u):
    """Driver-side EM over (pattern -> n_pairs) counts. Returns
    (lam, m[f], u[f]) after exactly ``n_iter`` iterations. Deterministic:
    patterns are iterated in sorted order, accumulation order is fixed."""
    lam = float(init_lambda)
    m = [float(init_m)] * f
    u = [float(init_u)] * f
    total = float(sum(counts.values()))
    pats = sorted(counts)
    for _ in range(n_iter):
        sum_rn = 0.0
        sum_rng = [0.0] * f
        sum_vng = [0.0] * f
        sum_vn = 0.0
        for p in pats:
            n = float(counts[p])
            w = lam
            v = 1.0 - lam
            for i in range(f):
                g = (p >> i) & 1
                w *= m[i] if g else (1.0 - m[i])
                v *= u[i] if g else (1.0 - u[i])
            r = w / (w + v)
            sum_rn += r * n
            sum_vn += (1.0 - r) * n
            for i in range(f):
                if (p >> i) & 1:
                    sum_rng[i] += r * n
                    sum_vng[i] += (1.0 - r) * n
        lam = min(max(sum_rn / total, _P_FLOOR), 1.0 - _P_FLOOR)
        for i in range(f):
            m[i] = min(max(sum_rng[i] / sum_rn, _P_FLOOR), 1.0 - _P_FLOOR)
            u[i] = min(max(sum_vng[i] / sum_vn, _P_FLOOR), 1.0 - _P_FLOOR)
    return lam, m, u


def _fit(features, thresholds, n_iter, init_lambda, init_m, init_u):
    """Shared fit path for fellegi_sunter_em / fs_waterfall: one distributed
    pattern-count aggregation, then the driver-side EM over ≤ 2^f rows."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    cols = sorted(thresholds)
    pat = comparison_patterns(features, thresholds)
    rows = pat.groupBy("pattern").agg(F.count(F.lit(1)).alias("n_pairs")).collect()
    counts = {int(r["pattern"]): int(r["n_pairs"]) for r in rows}
    if not counts:
        raise ValueError("features is empty — nothing to fit")
    lam, m, u = _em(counts, len(cols), n_iter, init_lambda, init_m, init_u)
    return cols, counts, lam, m, u


def fellegi_sunter_em(
    features: DataFrame,
    thresholds: dict[str, float],
    n_iter: int = 3,
    init_lambda: float = 0.5,
    init_m: float = 0.9,
    init_u: float = 0.1,
) -> DataFrame:
    """Fit the Fellegi-Sunter two-class mixture by EM and return the
    per-pattern parameter table:

    (pattern, n_pairs, p_match, log2_bf) where ``p_match`` is the posterior
    P(match | pattern) under the fitted model and ``log2_bf`` the log-2
    Bayes factor sum_i log2(P(g_i|M) / P(g_i|U)) — the classic FS match
    weight, monotone in p_match.

    One distributed aggregation (groupBy pattern) feeds a driver-side EM
    over at most 2^f rows; fixed ``n_iter`` iterations from fixed inits, so
    the output is a pure function of the pattern counts (deterministic,
    parallelism-invariant, SQL-unrollable for oracle checking).
    """
    cols, counts, lam, m, u = _fit(
        features, thresholds, n_iter, init_lambda, init_m, init_u
    )
    f = len(cols)
    out = []
    for p in sorted(counts):
        w = lam
        v = 1.0 - lam
        bf = 0.0
        for i in range(f):
            g = (p >> i) & 1
            mi = m[i] if g else (1.0 - m[i])
            ui = u[i] if g else (1.0 - u[i])
            w *= mi
            v *= ui
            bf += math.log2(mi / ui)
        out.append((p, counts[p], w / (w + v), bf))
    spark = features.sparkSession
    return spark.createDataFrame(
        out, "pattern long, n_pairs long, p_match double, log2_bf double"
    )


def fs_score_pairs(
    features: DataFrame,
    thresholds: dict[str, float],
    n_iter: int = 3,
    init_lambda: float = 0.5,
    init_m: float = 0.9,
    init_u: float = 0.1,
) -> DataFrame:
    """Attach the fitted FS posterior and match weight to every pair:
    input feature columns + (pattern, p_match, log2_bf). The per-pattern
    table is at most 2^f rows, so the join back is a forced broadcast —
    the pair stream is never re-shuffled."""
    params = fellegi_sunter_em(
        features, thresholds, n_iter, init_lambda, init_m, init_u
    )
    pat = comparison_patterns(features, thresholds)
    return pat.join(
        F.broadcast(params.drop("n_pairs")), "pattern"
    )


def fs_waterfall(
    features: DataFrame,
    thresholds: dict[str, float],
    n_iter: int = 3,
    init_lambda: float = 0.5,
    init_m: float = 0.9,
    init_u: float = 0.1,
) -> DataFrame:
    """Per-feature signed match-weight contributions for every observed
    comparison pattern — the data behind Splink's "waterfall chart"
    explanations, and the artifact a clerical reviewer reads to see WHY a
    pair scored high ("surname agreed: +6.1 bits; city disagreed: −1.8").

    Output: one row per (pattern, feature) —
    ``(pattern, feature, agree, contribution, log2_bf)`` with
    ``contribution = log2(P(g_i|M) / P(g_i|U))`` under the same EM fit as
    :func:`fellegi_sunter_em`, and ``log2_bf`` the pattern's total weight
    (Σ contributions over its features, identical to the EM table's
    column — pytest pins the equality).

    Scale: shares `_fit`'s one distributed pattern-count aggregation; the
    expansion is driver-side over ≤ 2^f × f rows (f ≤ 16), the same bounded
    collect-the-subtotals pattern as the EM itself. To explain the full
    pair stream, join this ≤ 2^f·f-row table to ``comparison_patterns`` on
    pattern — a forced-broadcast-sized dimension.
    """
    cols, counts, lam, m, u = _fit(
        features, thresholds, n_iter, init_lambda, init_m, init_u
    )
    out = []
    for p in sorted(counts):
        contribs = []
        for i, c in enumerate(cols):
            g = (p >> i) & 1
            mi = m[i] if g else (1.0 - m[i])
            ui = u[i] if g else (1.0 - u[i])
            contribs.append((c, bool(g), math.log2(mi / ui)))
        total = sum(cv for _, _, cv in contribs)
        for feat, agree, cv in contribs:
            out.append((p, feat, agree, cv, total))
    spark = features.sparkSession
    return spark.createDataFrame(
        out,
        "pattern long, feature string, agree boolean, "
        "contribution double, log2_bf double",
    )


def tf_adjusted_exact_weight(
    pairs: DataFrame,
    records: DataFrame,
    value_col: str,
    m_exact: float = 0.95,
    rec_id_col: str = "rec_id",
    rec_a: str = "rec_id_a",
    rec_b: str = "rec_id_b",
) -> DataFrame:
    """Term-frequency-adjusted match weight for an EXACT-match comparison
    (Winkler 1988's value-specific outcome rates; the feature Splink ships
    as "term frequency adjustments"): agreeing on a RARE value is far
    stronger match evidence than agreeing on a common one, so the
    agreement u-probability is replaced per pair by the term frequency of
    the shared value:

      agree on v:  log2(m / tf(v)),          tf(v) = n_v / N
      disagree:    log2((1 − m) / (1 − ū)),  ū = Σ_v tf(v)²   (chance
                   agreement rate of two random records)

    with ``m = m_exact`` the assumed P(agree | match). Add the result to a
    base Fellegi-Sunter weight (``fs_score_pairs``) built WITHOUT this
    comparison, or use standalone as a frequency-aware exact-match scorer.

    Output: ``pairs`` + (agree, tf, tf_weight) — EVERY input pair survives
    (record attachment is a left join). NULL values never agree (two NULLs
    disagree), and a pair whose rec id has no ``records`` row behaves
    exactly like a NULL value: agree false, disagreement weight. tf is
    NULL on disagreeing pairs; tf_weight is NULL if every record shares
    one value (ū = 1 — disagreement impossible, the comparison carries no
    signal).

    Scale: the tf table lives on the value dimension (≪ records) and joins
    the pair stream by equality; N and ū are 1-row aggregates crossJoined
    as constants; two record-value attach joins on the rec ids. No windows,
    no collects, nothing pair-quadratic beyond the input pair stream.
    """
    if not (0.0 < m_exact < 1.0):
        raise ValueError(f"m_exact must be in (0, 1), got {m_exact}")
    rec = records.select(
        F.col(rec_id_col).alias("_rid"), F.col(value_col).alias("_v")
    )
    tfv = (
        rec.where(F.col("_v").isNotNull())
        .groupBy("_v")
        .agg(F.count(F.lit(1)).alias("_nv"))
    )
    scal = (
        tfv.agg(
            F.sum("_nv").alias("_n"),
            F.sum(F.col("_nv") * F.col("_nv")).alias("_s2"),
        )
        .select("_n", (F.col("_s2") / (F.col("_n") * F.col("_n"))).alias("_ubar"))
    )
    va = rec.select(F.col("_rid").alias(rec_a), F.col("_v").alias("_va"))
    vb = rec.select(F.col("_rid").alias(rec_b), F.col("_v").alias("_vb"))
    agree = F.col("_va").isNotNull() & (F.col("_va") == F.col("_vb"))
    out = (
        pairs.join(va, rec_a, "left")
        .join(vb, rec_b, "left")
        .withColumn("agree", F.coalesce(agree, F.lit(False)))
        .join(
            tfv.select(F.col("_v").alias("_va"), "_nv"),
            "_va",
            "left",
        )
        .crossJoin(F.broadcast(scal))
    )
    tf = F.col("_nv") / F.col("_n")
    m = F.lit(float(m_exact))
    w = F.when(F.col("agree"), F.log2(m / tf)).otherwise(
        F.when(F.col("_ubar") < 1.0, F.log2((1.0 - m) / (1.0 - F.col("_ubar"))))
    )
    return out.select(
        *[c for c in pairs.columns],
        "agree",
        F.when(F.col("agree"), tf).alias("tf"),
        w.alias("tf_weight"),
    )


def group_linkage(
    scored_pairs: DataFrame,
    assignments: DataFrame,
    threshold: float,
    rec_a: str = "rec_id_a",
    rec_b: str = "rec_id_b",
    score_col: str = "score",
) -> DataFrame:
    """Group linkage (On, Koudas, Lee & Srivastava, "Group Linkage",
    ICDE 2007): entities that are GROUPS of records (a brand's product
    names, an author's paper bylines, a household's members) are compared
    by matching their member records and normalizing:

        sim(G, H) = Σ_{(u,v) ∈ M} score(u, v) / (|G| + |H| - |M|)

    — the paper's BM_sim, a Jaccard-style normalization over a bipartite
    matching M of cross-group record pairs with score >= ``threshold``.
    The paper's M is the maximum-weight bipartite matching; the
    distributable surrogate here is RECIPROCAL BEST matching (each side
    the other's argmax, ties by smallest partner id — the same
    deterministic rule as scoring.reciprocal_best_pairs), which is a
    subset of some maximum matching on strict-inequality scores and
    needs only two grouped argmax passes instead of augmenting paths.

    Inputs: ``scored_pairs`` (rec_a, rec_b, score) in either orientation,
    each unordered record pair at most once; ``assignments``
    (rec_id, group_id) total over the records. Intra-group and
    below-threshold pairs are ignored. Returns one row per group pair
    with at least one matched record pair:

        (group_a, group_b, n_matched, sim)   with group_a < group_b.

    Scale design: two assignment joins attach group ids to the pair
    stream; everything after is grouped aggregation keyed by the group
    pair (two argmax passes, one mutual-check join, one final agg) plus a
    broadcast-friendly group-size join — never a window, never the
    record-pair cross product (the input IS the blocked pair stream).
    """
    sizes = assignments.groupBy(F.col("group_id")).agg(
        F.count(F.lit(1)).alias("_sz")
    )
    e = (
        scored_pairs.select(
            F.col(rec_a).alias("_ra"),
            F.col(rec_b).alias("_rb"),
            F.col(score_col).alias("_s"),
        )
        .where(F.col("_s") >= threshold)
        .join(
            assignments.select(
                F.col("rec_id").alias("_ra"), F.col("group_id").alias("_ga")
            ),
            "_ra",
        )
        .join(
            assignments.select(
                F.col("rec_id").alias("_rb"), F.col("group_id").alias("_gb")
            ),
            "_rb",
        )
        .where(F.col("_ga") != F.col("_gb"))
    )
    # orient so _u belongs to the smaller group id: the group pair is then
    # canonical and each record side has a fixed role in the two argmaxes
    lo_first = F.col("_ga") < F.col("_gb")
    e = e.select(
        F.least("_ga", "_gb").alias("_g1"),
        F.greatest("_ga", "_gb").alias("_g2"),
        F.when(lo_first, F.col("_ra")).otherwise(F.col("_rb")).alias("_u"),
        F.when(lo_first, F.col("_rb")).otherwise(F.col("_ra")).alias("_v"),
        "_s",
    )
    best_u = e.groupBy("_g1", "_g2", "_u").agg(
        F.min(F.struct((-F.col("_s")).alias("_ns"), F.col("_v")))["_v"].alias(
            "_bv"
        )
    )
    best_v = e.groupBy("_g1", "_g2", "_v").agg(
        F.min(F.struct((-F.col("_s")).alias("_ns"), F.col("_u")))["_u"].alias(
            "_bu"
        )
    )
    matched = (
        e.join(best_u, ["_g1", "_g2", "_u"])
        .where(F.col("_v") == F.col("_bv"))
        .join(best_v, ["_g1", "_g2", "_v"])
        .where(F.col("_u") == F.col("_bu"))
    )
    agg = matched.groupBy("_g1", "_g2").agg(
        F.count(F.lit(1)).alias("n_matched"), F.sum("_s").alias("_msum")
    )
    return (
        agg.join(
            sizes.select(F.col("group_id").alias("_g1"), F.col("_sz").alias("_s1")),
            "_g1",
        )
        .join(
            sizes.select(F.col("group_id").alias("_g2"), F.col("_sz").alias("_s2")),
            "_g2",
        )
        .select(
            F.col("_g1").alias("group_a"),
            F.col("_g2").alias("group_b"),
            "n_matched",
            (
                F.col("_msum")
                / (F.col("_s1") + F.col("_s2") - F.col("n_matched"))
            ).alias("sim"),
        )
    )


def match_passes(
    pairs: DataFrame,
    rules: list[tuple[str, object]],
    idx_col: str = "pass_idx",
    rule_col: str = "matched_rule",
) -> DataFrame:
    """Deterministic multi-pass linkage cascade — the classic
    rule-waterfall front end of FEBRL / fastLink / production MDM systems:
    an ORDERED list of ``(rule_name, boolean condition)`` passes where the
    FIRST matching rule claims the pair (a pair matched by pass 1 is never
    re-litigated by pass 2), and pairs matching no rule stay unclaimed.

    ``rules`` conditions are SQL-expression strings (or Columns) over the
    pair frame's own columns. Output: ``pairs`` plus ``idx_col`` (1-based
    index of the claiming pass, NULL if none) and ``rule_col`` (its name,
    NULL if none).

    This is the deterministic complement to the probabilistic scorers
    (``fellegi_sunter_em`` / the LR matcher): production linkage runs the
    cheap certain rules first and sends only the residue to the expensive
    model — the pass index IS that routing decision.

    Scale: a pure projection — each condition is evaluated exactly once
    per row inside one whole-stage-codegen ``CASE`` chain (the rule name
    is attached by indexing a literal array with the pass index, not by a
    second chain), no shuffle, no UDF, nothing beyond the input pair
    stream."""
    if not rules:
        raise ValueError("match_passes needs at least one rule")
    names = [n for n, _ in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {names}")
    idx = F.lit(None).cast("int")
    for i in range(len(rules) - 1, -1, -1):
        cond = rules[i][1]
        c = F.expr(cond) if isinstance(cond, str) else cond
        idx = F.when(c, F.lit(i + 1)).otherwise(idx)
    return pairs.withColumn(idx_col, idx).withColumn(
        rule_col,
        F.when(
            F.col(idx_col).isNotNull(),
            F.element_at(F.array(*[F.lit(n) for n in names]), F.col(idx_col)),
        ),
    )


def estimate_u(
    records: DataFrame,
    features: list[tuple[str, str]],
    id_col: str = "rec_id",
    salt: str = ":u",
    n_buckets: int = 256,
) -> DataFrame:
    """u-probability estimation from random record pairs — Splink's
    ``estimate_u_using_random_sampling``: because true matches are
    vanishingly rare among uniformly random pairs, the per-feature
    agreement rate on random pairs IS the Fellegi-Sunter u probability
    (P(agree | non-match)), the denominator of every match weight. This is
    the standard way to pin u without labels; ``fellegi_sunter_em`` then
    only has to learn m and λ.

    ``features`` is a list of ``(feature_name, column_name)`` equality
    comparisons over ``records``' own columns (derive banded/normalized
    columns upstream). NULL never agrees (same rule as
    ``tf_adjusted_exact_weight``). Output: one row per feature —
    ``(feature, n_pairs, n_agree, u)``.

    Deterministic LINEAR pairing, not a sampled cartesian join: each
    record gets an md5 rank key, records are cut into ``n_buckets`` hash
    buckets, and within a bucket consecutive rank neighbours are paired
    (odd leftovers dropped). Adjacent records in a cryptographic-hash
    order are uniformly random pairs, each record is used at most once
    (independent pairs, n/2 of them), and the whole thing is one
    partitioned window + one aggregation — no quadratic sample blow-up,
    no global sort, parallelism-invariant, and replayable in SQL (the
    oracle recomputes the same pairing)."""
    if not features:
        raise ValueError("estimate_u needs at least one feature")
    names = [n for n, _ in features]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate feature names: {names}")
    keyed = records.select(
        *[F.col(c).alias(f"_f{i}") for i, (_, c) in enumerate(features)],
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))).alias("_rk"),
        F.col(id_col).alias("_id"),
    ).withColumn("_bk", F.substring("_rk", 1, _bucket_hex_len(n_buckets)))
    from pyspark.sql import Window

    w = Window.partitionBy("_bk").orderBy("_rk", "_id")
    paired = (
        keyed.select(
            "*",
            F.row_number().over(w).alias("_rn"),
            *[
                F.lead(f"_f{i}", 1).over(w).alias(f"_g{i}")
                for i in range(len(features))
            ],
            F.lead("_id", 1).over(w).alias("_id2"),
        )
        .where((F.col("_rn") % 2 == 1) & F.col("_id2").isNotNull())
    )
    agg = paired.agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(
                F.when(F.col(f"_f{i}") == F.col(f"_g{i}"), 1).otherwise(0)
            ).alias(f"_a{i}")
            for i in range(len(features))
        ],
    )
    kv = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(n).alias("feature"), F.col(f"_a{i}").alias("n_agree")
                )
                for i, n in enumerate(names)
            ]
        )
    )
    return agg.select(kv.alias("_kv"), F.col("_n")).select(
        F.col("_kv.feature").alias("feature"),
        F.col("_n").cast("long").alias("n_pairs"),
        F.col("_kv.n_agree").cast("long").alias("n_agree"),
        (F.col("_kv.n_agree") / F.col("_n")).alias("u"),
    )


def _bucket_hex_len(n_buckets: int) -> int:
    """Hex-prefix length whose bucket count is closest-above n_buckets
    (16^k buckets); pairing stays uniform for any choice, this only sizes
    the window partitions."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    k = 1
    while 16**k < n_buckets:
        k += 1
    return k


def fs_fit_audit(
    features: DataFrame,
    thresholds: dict[str, float],
    n_iter: int = 3,
    init_lambda: float = 0.5,
    init_m: float = 0.9,
    init_u: float = 0.1,
) -> DataFrame:
    """Goodness-of-fit audit for the Fellegi-Sunter EM — the standard
    check on FS's conditional-independence assumption (features
    independent given match status): per OBSERVED comparison pattern, the
    observed pair count against the fitted mixture's expected count
    ``N·(λ·Π P(gᵢ|M) + (1−λ)·Π P(gᵢ|U))``, the Pearson residual
    ``(obs − exp)/√exp``, and the total chi-square (constant column).
    Large residuals flag correlated features (e.g. two string metrics on
    the same field), the classic reason FS weights mis-rank pairs even
    when the EM converged. Unobserved patterns are collapsed into one
    ``pattern = -1`` row (obs 0, the remaining expected mass) so the
    chi-square covers all 2^f cells.

    Same fit path as ``fellegi_sunter_em`` / ``fs_waterfall`` (shared
    ``_fit``): one distributed pattern-count aggregation, then O(2^f)
    driver-side arithmetic — deterministic and SQL-unrollable."""
    cols, counts, lam, m, u = _fit(
        features, thresholds, n_iter, init_lambda, init_m, init_u
    )
    f = len(cols)
    total = float(sum(counts.values()))
    rows = []
    psum = 0.0
    chi2 = 0.0
    for p in sorted(counts):
        w = lam
        v = 1.0 - lam
        for i in range(f):
            g = (p >> i) & 1
            w *= m[i] if g else (1.0 - m[i])
            v *= u[i] if g else (1.0 - u[i])
        pp = w + v
        e = total * pp
        chi2 += (counts[p] - e) ** 2 / e
        psum += pp
        rows.append([p, counts[p], e, (counts[p] - e) / math.sqrt(e)])
    if len(counts) < (1 << f):
        e = max(total * (1.0 - psum), 0.0)
        chi2 += e  # (0 - e)^2 / e
        rows.append([-1, 0, e, -math.sqrt(e) if e > 0 else 0.0])
    spark = features.sparkSession
    return spark.createDataFrame(
        [r + [chi2] for r in rows],
        "pattern long, n_pairs long, expected double, "
        "pearson_resid double, chi2 double",
    )


def name_order_audit(
    records: DataFrame,
    name_col: str = "name",
    id_col: str = "rec_id",
) -> DataFrame:
    """Name-order (given/family swap) audit — the classic silent killer of
    exact-name blocking (Christen, *Data Matching* §3: "John Smith" and
    "Smith John" block apart forever): over the corpus of TWO-token
    names, learn each token's slot statistics — how often it appears in
    the first vs second position — and flag records whose observed order
    is strictly less supported than the swapped order:

        swap_likely  ⇔  first2(b) · second1(a)  >  first1(a) · second2(b)

    for name "a b", where first(x)/second(x) are exact corpus counts
    (cross-multiplied likelihood-ratio comparison — no division, no
    smoothing needed for the >, and a token never seen in a slot simply
    contributes 0). Names with ≠ 2 tokens pass through unflagged with
    ``n_tokens`` reported, so the audit covers the whole table.

    Two slot-count aggregates over the token stream + two broadcast-ish
    joins back. Output: ``(id_col, name, n_tokens, first_support,
    swap_support, swap_likely)`` — supports are the two products above
    (0 for non-2-token names).
    """
    toks = F.filter(
        F.split(F.lower(F.col(name_col)), r"[^a-z0-9]+"), lambda t: t != ""
    )
    base = records.select(
        F.col(id_col).alias("_id"),
        F.col(name_col).alias("name"),
        toks.alias("_ts"),
    ).withColumn("_n", F.size("_ts"))
    two = base.where(F.col("_n") == 2).select(
        "_id", "name",
        F.element_at("_ts", 1).alias("_a"),
        F.element_at("_ts", 2).alias("_b"),
    )
    slot = two.select(F.col("_a").alias("_t"), F.lit(1).alias("_s")).unionAll(
        two.select(F.col("_b").alias("_t"), F.lit(2).alias("_s"))
    )
    counts = slot.groupBy("_t").agg(
        F.sum((F.col("_s") == 1).cast("long")).alias("_c1"),
        F.sum((F.col("_s") == 2).cast("long")).alias("_c2"),
    )
    scored = (
        two.join(counts.select(F.col("_t").alias("_a"), F.col("_c1").alias("_a1"), F.col("_c2").alias("_a2")), "_a")
        .join(counts.select(F.col("_t").alias("_b"), F.col("_c1").alias("_b1"), F.col("_c2").alias("_b2")), "_b")
        .select(
            "_id", "name",
            F.lit(2).cast("long").alias("n_tokens"),
            (F.col("_a1") * F.col("_b2")).cast("long").alias("first_support"),
            (F.col("_b1") * F.col("_a2")).cast("long").alias("swap_support"),
            (F.col("_b1") * F.col("_a2") > F.col("_a1") * F.col("_b2")).alias(
                "swap_likely"
            ),
        )
    )
    rest = base.where(F.col("_n") != 2).select(
        "_id", "name",
        F.col("_n").cast("long").alias("n_tokens"),
        F.lit(0).cast("long").alias("first_support"),
        F.lit(0).cast("long").alias("swap_support"),
        F.lit(False).alias("swap_likely"),
    )
    return scored.unionByName(rest).withColumnRenamed("_id", id_col)
