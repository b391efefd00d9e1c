"""Truth discovery / data fusion: resolve conflicting attribute claims from
sources of UNKNOWN reliability by iterating source trust against value
confidence (TruthFinder, Yin-Han-Yu TKDE 2008, in its simplified
probabilistic form) — the ER pipeline stage after clustering and
survivorship. Where ``golden_records`` (operators/golden.py) picks values by
frequency/length rules that treat every source as equally credible, truth
discovery LEARNS per-source trust from cross-source agreement, so one
reliable crawl outvotes three mirrors of the same spam farm.

Fixed-point recurrence (``n_rounds`` iterations, each = one confidence
update then one trust update):

  conf(o, v) = 1 − Π_{s asserts (o,v)} (1 − trust(s))   (independent-source
               noisy-or, computed as 1 − exp(Σ ln(1 − t)) so the product is
               a plain distributed SUM)
  trust(s)   = mean of conf(o, v) over the claims s asserts

Determinism / oracle-compatibility: no RNG anywhere; trusts are clamped to
≤ 1−eps before the log so the noisy-or is always finite; the final
per-object argmax rounds confidence to 9 decimals BEFORE ranking and breaks
ties by ascending value, so engines that differ at the last ULP still pick
the same winner. The whole recurrence is expressible as unrolled SQL CTEs
(one conf + one trust CTE per round), which is exactly how the gate oracle
recomputes it.

Scale design: the trust table is |sources|-sized (crawls / feeds /
extractors — dozens, not millions) and joins back to the claim stream as a
broadcast; each round costs two shuffles of the claim stream (groupBy
(object, value), then groupBy source) with ``n_rounds`` small and fixed.
The deduplicated claim stream is consumed twice per round, so it is
persisted once (caller releases via ``persisted_out``). Nothing is ever
collected; confidence lives on the (object, value) grain — bounded by the
claim count, never the object × value cross space.

No counterpart in the reference (minimEL resolves mentions, not conflicting
attribute values); this is the fusion stage a production linkage pipeline
needs downstream of minimEL-style clustering.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def truth_discovery(
    claims: DataFrame,
    n_rounds: int = 3,
    init_trust: float = 0.8,
    eps: float = 1e-9,
    source_col: str = "source_id",
    object_col: str = "object_id",
    value_col: str = "value",
    persisted_out: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Run ``n_rounds`` of the trust/confidence recurrence over a claim
    stream and return ``(facts, trusts)``:

    - facts:  (object_id, value, confidence, n_sources) — per object the
      highest-confidence value after the final round (confidence rounded to
      9 decimals for ranking; ties -> smallest value), with the number of
      sources asserting it;
    - trusts: (source_id, trust, n_claims) — final per-source trust and the
      source's deduplicated claim count.

    A source asserting the same (object, value) repeatedly counts once
    (claims are deduplicated on the triple). NULL-valued claims are
    non-claims and are dropped up front — they can neither corroborate
    anything nor earn trust (without this, a NULL claim would form a
    confidence group but silently vanish from the trust update's equi-join,
    skewing n_claims and erasing all-NULL sources from later rounds).
    """
    if n_rounds < 1:
        raise ValueError(f"n_rounds must be >= 1, got {n_rounds}")
    if not (0.0 < init_trust < 1.0):
        raise ValueError(f"init_trust must be in (0, 1), got {init_trust}")
    c = (
        claims.select(
            F.col(source_col).alias("source_id"),
            F.col(object_col).alias("object_id"),
            F.col(value_col).alias("value"),
        )
        .where(F.col("value").isNotNull())
        .distinct()
        .persist()
    )
    if persisted_out is not None:
        persisted_out.append(c)
    trust = c.select("source_id").distinct().select(
        "source_id", F.lit(float(init_trust)).alias("trust")
    )
    conf = None
    for _ in range(n_rounds):
        clamped = F.least(F.col("trust"), F.lit(1.0 - eps))
        conf = (
            c.join(F.broadcast(trust), "source_id")
            .groupBy("object_id", "value")
            .agg(
                F.count(F.lit(1)).alias("n_sources"),
                (1.0 - F.exp(F.sum(F.log(1.0 - clamped)))).alias("confidence"),
            )
        )
        trust = (
            c.join(conf.select("object_id", "value", "confidence"), ["object_id", "value"])
            .groupBy("source_id")
            .agg(F.avg("confidence").alias("trust"), F.count(F.lit(1)).alias("n_claims"))
        )
    sel = F.min(
        F.struct(
            (-F.round(F.col("confidence"), 9)).alias("_nc"),
            F.col("value").alias("_v"),
            F.col("confidence").alias("_c"),
            F.col("n_sources").alias("_n"),
        )
    )
    facts = conf.groupBy("object_id").agg(sel.alias("_w")).select(
        "object_id",
        F.col("_w._v").alias("value"),
        F.col("_w._c").alias("confidence"),
        F.col("_w._n").alias("n_sources"),
    )
    return facts, trust.select("source_id", "trust", "n_claims")


def dempster_shafer_fusion(
    pairs: DataFrame,
    sources: list[tuple[str, str]],
) -> DataFrame:
    """Combine per-comparator match evidence on each candidate pair by
    Dempster's rule of combination (Shafer 1976) — the evidential
    complement to Fellegi-Sunter: where FS multiplies likelihood ratios
    under a two-class model, Dempster-Shafer lets every comparator keep
    an explicit UNCERTAINTY reserve, so a weak comparator abstains
    instead of voting, and disagreement shows up as a measurable
    CONFLICT instead of silently cancelling.

    Each source ``(mass_match_col, mass_nonmatch_col)`` carries a basic
    probability assignment over the frame {match, nonmatch}: mass on
    {match}, mass on {nonmatch}, and the remainder ``1 - m - n`` on the
    whole frame Θ (ignorance). Because every focal element is a singleton
    or Θ, the k-source combination has the closed form

        m(M) ∝ Π(mᵢ + θᵢ) − Π θᵢ      m(N) ∝ Π(nᵢ + θᵢ) − Π θᵢ
        m(Θ) ∝ Π θᵢ                   K (conflict) = 1 − Z

    with Z the unnormalized total — so the fold is pure column
    arithmetic, no per-row UDF and no iteration, and the SQL oracle can
    mirror it term by term. Appends:

    - ``bel_match``: normalized belief in {match} (lower bound),
    - ``pl_match``: plausibility of {match} (upper bound, bel + m(Θ)),
    - ``m_theta``: normalized residual ignorance,
    - ``conflict``: the mass the sources burned disagreeing.

    Scale: embarrassingly parallel row-local arithmetic over the scored
    pair stream — whole-stage-codegen'd, shuffle-free, safe at any pair
    count. Masses must satisfy m, n ≥ 0 and m + n ≤ 1 per source; the
    caller owns that contract (CASE-mapped literals in practice).
    """
    if not sources:
        raise ValueError("sources must be a non-empty list")
    pm, pn, pt = F.lit(1.0), F.lit(1.0), F.lit(1.0)
    for mcol, ncol in sources:
        m, n = F.col(mcol), F.col(ncol)
        t = F.lit(1.0) - m - n
        pm = pm * (m + t)
        pn = pn * (n + t)
        pt = pt * t
    m_match = pm - pt
    m_non = pn - pt
    z = m_match + m_non + pt
    return (
        pairs.withColumn("bel_match", m_match / z)
        .withColumn("pl_match", (m_match + pt) / z)
        .withColumn("m_theta", pt / z)
        .withColumn("conflict", F.lit(1.0) - z)
    )
