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
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    cols = sorted(thresholds)
    f = len(cols)
    pat = comparison_patterns(features, thresholds)
    rows = pat.groupBy("pattern").agg(F.count(F.lit(1)).alias("n_pairs")).collect()
    counts = {int(r["pattern"]): int(r["n_pairs"]) for r in rows}
    if not counts:
        raise ValueError("features is empty — nothing to fit")
    lam, m, u = _em(counts, f, n_iter, init_lambda, init_m, init_u)
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
