"""Weak-supervision label model (Snorkel-style) for pair labeling.

Modern training-data curation rarely has gold labels: instead a handful of
LABELING FUNCTIONS (LFs) — cheap heuristics like "Jaro-Winkler ≥ 0.85 →
match", "length ratio < 0.3 → non-match" — each vote +1 / −1 / abstain on
every candidate pair, and a generative label model learns how much to
trust each LF from their agreement structure alone (Ratner et al.,
Snorkel VLDB'18; the data-programming EM). The model's per-pair posterior
becomes the probabilistic training label for the downstream matcher — the
unsupervised sibling of the Fellegi-Sunter EM one module over
(linkage.py), generalized from binary agreement bits to three-valued
votes.

Model (the standard conditionally-independent form):
- λ = P(match); per-LF propensity p_i = P(vote ≠ abstain) (class-free,
  closed form — estimated directly, not EM'd); accuracy a_i =
  P(vote correct | vote ≠ abstain).
- P(v_i | y): abstain → 1−p_i; agreeing vote → p_i·a_i; opposing vote →
  p_i·(1−a_i).
- EM iterates over TRIT-PATTERN counts: each pair reduces to
  pattern = Σ t_i·3^i with t_i ∈ {0: abstain, 1: +1, 2: −1}, so the
  distributed work is ONE groupBy("pattern").count() and the EM is
  O(3^f · f · n_iter) driver-side arithmetic — the exact scale shape of
  linkage._em, state space 3^f instead of 2^f (f ≤ 8 enforced).

Deterministic: fixed inits (λ₀ = 0.5, a₀ = 0.7), fixed iteration count,
sorted-pattern accumulation, 1e-6 clamps — parallelism-invariant and
SQL-unrollable for oracle checking (__spark_entry__.q_er_weak_labels).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_P_FLOOR = 1e-6


def _clamp(x: float) -> float:
    return min(max(x, _P_FLOOR), 1.0 - _P_FLOOR)


def vote_patterns(pairs: DataFrame, vote_cols: list[str]) -> DataFrame:
    """Encode three-valued LF vote columns (+1 / −1 / 0 or NULL = abstain)
    into the integer trit ``pattern`` key (LF i contributes
    ``t_i · 3^i`` with t = 0 abstain / 1 positive / 2 negative). Raises on
    vote values outside {−1, 0, 1}. Pure projection, no shuffle."""
    if not vote_cols:
        raise ValueError("vote_cols must be non-empty")
    if len(vote_cols) > 8:
        raise ValueError(
            f"at most 8 labeling functions supported (3^f patterns), "
            f"got {len(vote_cols)}"
        )
    pattern = F.lit(0).cast("long")
    out = pairs
    for i, c in enumerate(vote_cols):
        v = F.coalesce(F.col(c).cast("int"), F.lit(0))
        t = (
            F.when(v == 0, F.lit(0))
            .when(v == 1, F.lit(1))
            .when(v == -1, F.lit(2))
            .otherwise(F.raise_error(f"vote column {c!r} outside {{-1,0,1}}"))
        )
        out = out.withColumn(f"t_{c}", t.cast("int"))
        pattern = pattern + (F.col(f"t_{c}").cast("long") * F.lit(3**i))
    return out.withColumn("pattern", pattern)


def _em(counts: dict[int, int], f: int, n_iter: int, init_lambda: float,
        init_acc: float):
    """Driver-side EM over (trit pattern -> n_pairs). Propensities are
    closed-form; λ and accuracies iterate. Returns (lam, acc[f], prop[f]).
    Deterministic: sorted patterns, fixed accumulation order."""
    total = float(sum(counts.values()))
    pats = sorted(counts)
    trits = {p: [(p // 3**i) % 3 for i in range(f)] for p in pats}
    prop = []
    for i in range(f):
        nz = sum(counts[p] for p in pats if trits[p][i] != 0)
        prop.append(_clamp(nz / total))
    lam = float(init_lambda)
    acc = [float(init_acc)] * f
    for _ in range(n_iter):
        sum_rn = 0.0
        num = [0.0] * f
        den = [0.0] * f
        for p in pats:
            n = float(counts[p])
            w = lam
            v = 1.0 - lam
            for i in range(f):
                t = trits[p][i]
                if t == 0:
                    w *= 1.0 - prop[i]
                    v *= 1.0 - prop[i]
                elif t == 1:
                    w *= prop[i] * acc[i]
                    v *= prop[i] * (1.0 - acc[i])
                else:
                    w *= prop[i] * (1.0 - acc[i])
                    v *= prop[i] * acc[i]
            r = w / (w + v)
            sum_rn += r * n
            for i in range(f):
                t = trits[p][i]
                if t == 1:
                    num[i] += r * n
                    den[i] += n
                elif t == 2:
                    num[i] += (1.0 - r) * n
                    den[i] += n
        lam = _clamp(sum_rn / total)
        acc = [
            _clamp(num[i] / den[i]) if den[i] > 0 else acc[i] for i in range(f)
        ]
    return lam, acc, prop


def _fit(pairs, vote_cols, n_iter, init_lambda, init_acc):
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    pat = vote_patterns(pairs, vote_cols)
    rows = pat.groupBy("pattern").agg(F.count(F.lit(1)).alias("n_pairs")).collect()
    counts = {int(r["pattern"]): int(r["n_pairs"]) for r in rows}
    if not counts:
        raise ValueError("pairs is empty — nothing to fit")
    lam, acc, prop = _em(counts, len(vote_cols), n_iter, init_lambda, init_acc)
    return counts, lam, acc, prop


def weak_label_model(
    pairs: DataFrame,
    vote_cols: list[str],
    n_iter: int = 5,
    init_lambda: float = 0.5,
    init_acc: float = 0.7,
) -> DataFrame:
    """Fit the label model and return the per-pattern posterior table:
    ``(pattern, n_pairs, p_match)`` — ``p_match`` is the probabilistic
    training label every pair with that vote pattern receives (join back
    by the integer key; the table is ≤ 3^f rows, a forced broadcast)."""
    counts, lam, acc, prop = _fit(pairs, vote_cols, n_iter, init_lambda, init_acc)
    f = len(vote_cols)
    out = []
    for p in sorted(counts):
        w = lam
        v = 1.0 - lam
        for i in range(f):
            t = (p // 3**i) % 3
            if t == 0:
                w *= 1.0 - prop[i]
                v *= 1.0 - prop[i]
            elif t == 1:
                w *= prop[i] * acc[i]
                v *= prop[i] * (1.0 - acc[i])
            else:
                w *= prop[i] * (1.0 - acc[i])
                v *= prop[i] * acc[i]
        out.append((p, counts[p], w / (w + v)))
    return pairs.sparkSession.createDataFrame(
        out, "pattern long, n_pairs long, p_match double"
    )


def weak_lf_stats(
    pairs: DataFrame,
    vote_cols: list[str],
    n_iter: int = 5,
    init_lambda: float = 0.5,
    init_acc: float = 0.7,
) -> DataFrame:
    """Per-LF diagnostics under the SAME fit as ``weak_label_model``
    (shared ``_fit`` — the two cannot drift): ``(lf, propensity,
    accuracy, lam)`` — the learned trust the model assigned each
    heuristic, read to retire LFs the agreement structure contradicts."""
    _, lam, acc, prop = _fit(pairs, vote_cols, n_iter, init_lambda, init_acc)
    rows = [
        (c, prop[i], acc[i], lam) for i, c in enumerate(vote_cols)
    ]
    return pairs.sparkSession.createDataFrame(
        rows, "lf string, propensity double, accuracy double, lam double"
    )
