"""Key-skew profiling — the pre-flight a 100-TB join or groupBy runs BEFORE
choosing a physical strategy. The blocking layer in this repo handles skew
reactively (salted keys, exact per-block pair caps, AQE skew-join:
`operators/blocking.py`); this operator is the measuring side of that
story: which keys are heavy, how heavy relative to the mean, and what share
of all rows the head of the distribution owns — the numbers that decide
whether to salt, broadcast, or isolate a key before the expensive job runs.

The reference (bennokr/minimEL) has no diagnostics layer; Spark-first new
work (SURVEY §2.10 notes the reference handles skew implicitly by hashing
anchors — at web scale that is not enough).

Scale design: ONE partial-aggregated groupBy on the key (the same shuffle
the profiled job would run, over an 8-byte count payload instead of the
real rows), one tiny summary aggregate over the counts table, a
TakeOrderedAndProject top-N (per-partition heaps, no global sort), and a
window over the <= top_n-row result to attach ranks/cumulative share —
bounded by construction, the clean.py:283 precedent. The counts table
feeds both consumers; pass ``persisted_out`` to aggregate once.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def key_skew_profile(
    df: DataFrame,
    key_cols: list[str] | str,
    top_n: int = 10,
    persisted_out: list | None = None,
) -> DataFrame:
    """Profile the distribution of ``key_cols`` in ``df``: the ``top_n``
    heaviest keys with exact counts, their share of all rows, their ratio
    to the mean key load, and the cumulative head share.

    Returns (rank, key, cnt, share, x_mean, cum_share):
    - ``key``: the key rendered as a string ('\\x1f'-joined for composite
      keys; NULL components rendered as the empty string)
    - ``share``  = cnt / n_rows          (this key's fraction of all rows)
    - ``x_mean`` = cnt * n_keys / n_rows (how many mean-loads this key is —
      the salting-decision number: x_mean >> 1 means one reducer drags)
    - ``cum_share``: running share of ranks 1..rank (head concentration)

    Ordering is total (cnt desc, key asc), so the profile is deterministic
    under ties at any parallelism.
    """
    if top_n < 1:
        raise ValueError(f"need top_n >= 1, got {top_n}")
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    key = F.concat_ws(
        "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in key_cols]
    )
    counts = df.select(key.alias("key")).groupBy("key").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    if persisted_out is not None:
        counts = counts.persist()
        persisted_out.append(counts)
    totals = counts.agg(
        F.sum("cnt").cast("double").alias("_n_rows"),
        F.count(F.lit(1)).cast("double").alias("_n_keys"),
    )
    top = counts.orderBy(F.desc("cnt"), F.asc("key")).limit(top_n)
    # the rank/cumulative window runs over <= top_n rows — bounded by
    # construction, never a data-sized single partition
    w = Window.orderBy(F.desc("cnt"), F.asc("key"))
    cum = Window.orderBy(F.desc("cnt"), F.asc("key")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        top.crossJoin(F.broadcast(totals))
        .withColumn("rank", F.row_number().over(w))
        .select(
            "rank",
            "key",
            F.col("cnt").cast("long").alias("cnt"),
            (F.col("cnt") / F.col("_n_rows")).alias("share"),
            (F.col("cnt") * F.col("_n_keys") / F.col("_n_rows")).alias("x_mean"),
            (F.sum("cnt").over(cum) / F.col("_n_rows")).alias("cum_share"),
        )
    )


def distribution_drift(
    current: DataFrame,
    reference: DataFrame,
    value_col: str,
    n_bins: int = 10,
    eps: float = 1e-4,
) -> DataFrame:
    """Population Stability Index + KL drift between a CURRENT numeric
    distribution and a REFERENCE one (the credit-scoring PSI, the standard
    production monitor for "did my matcher-score / feature distribution
    move since the model was fit" — PSI < 0.1 stable, 0.1-0.25 drifting,
    > 0.25 retrain). The monitoring sibling of ``cluster_churn`` (which
    tracks assignment drift): this tracks the SCORE distribution feeding
    the thresholds.

    Bins are equal-width over the REFERENCE min/max (the fit-time frame);
    current values outside that range clamp into the edge bins — exactly
    the "new data walked off the training support" signal PSI is meant to
    catch. A degenerate reference (min == max) puts everything in bin 0.
    Empty-bin proportions are floored at ``eps`` (the standard PSI
    continuity correction) before the log terms. If EITHER side has no
    non-null values at all, ``psi_term``/``psi`` (and the p of that side)
    come back NULL rather than a fabricated drift number — a monitoring
    consumer must read NULL psi as "no data", not "retrain".

    Output: one row per bin (ALL ``n_bins`` bins, occupied or not):
    ``(bin, lo, hi, n_cur, n_ref, p_cur, p_ref, psi_term, psi)`` with
    ``psi_term = (p'_cur − p'_ref)·ln(p'_cur/p'_ref)`` and ``psi`` its sum,
    constant across rows.

    Distributed: the reference range is one 2-value aggregate crossJoined
    as a constant; each side reduces to ≤ n_bins rows via one groupBy
    before the tiny bins-frame joins; nothing global touches the row
    streams. Deterministic: identical IEEE bin arithmetic on both engines,
    no sampling.
    """
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    spark = current.sparkSession
    rng = reference.agg(
        F.min(F.col(value_col)).alias("_lo"), F.max(F.col(value_col)).alias("_hi")
    )
    width = (F.col("_hi") - F.col("_lo")) / n_bins

    def _binned(df, name):
        b = F.when(F.col("_hi") > F.col("_lo"),
                   F.least(
                       F.greatest(
                           F.floor((F.col(value_col) - F.col("_lo")) / width),
                           F.lit(0),
                       ),
                       F.lit(n_bins - 1),
                   )).otherwise(F.lit(0)).cast("int")
        return (
            df.where(F.col(value_col).isNotNull())
            .crossJoin(F.broadcast(rng))
            .select(b.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(name))
        )

    bins = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    cur = _binned(current, "n_cur")
    ref = _binned(reference, "n_ref")
    j = (
        bins.join(cur, "bin", "left")
        .join(ref, "bin", "left")
        .select(
            "bin",
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        )
    )
    tot = j.agg(F.sum("n_cur").alias("_tc"), F.sum("n_ref").alias("_tr"))
    e = F.lit(float(eps))
    p_cur = F.greatest(F.col("n_cur") / F.col("_tc"), e)
    p_ref = F.greatest(F.col("n_ref") / F.col("_tr"), e)
    both_sides = (F.col("_tc") > 0) & (F.col("_tr") > 0)
    out = (
        j.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(rng))
        .select(
            "bin",
            (F.col("_lo") + F.col("bin") * width).alias("lo"),
            (F.col("_lo") + (F.col("bin") + 1) * width).alias("hi"),
            "n_cur",
            "n_ref",
            F.when(F.col("_tc") > 0, F.col("n_cur") / F.col("_tc")).alias("p_cur"),
            F.when(F.col("_tr") > 0, F.col("n_ref") / F.col("_tr")).alias("p_ref"),
            F.when(both_sides, (p_cur - p_ref) * F.log(p_cur / p_ref)).alias(
                "psi_term"
            ),
        )
    )
    psi = out.agg(F.sum("psi_term").alias("psi"))
    return out.crossJoin(F.broadcast(psi))


def powerlaw_alpha(
    counts: DataFrame, count_col: str = "cnt", xmin: int = 1
) -> DataFrame:
    """Discrete power-law exponent fit (Clauset-Shalizi-Newman 2009 MLE
    approximation) over a frequency table — the blocking-feasibility
    pre-flight: key frequencies with α near 2 have a heavy head (salting /
    per-block caps mandatory, see blocking.py), α well above 3 means the
    head is tame. One row:

    ``(n_values, xmin, alpha, se)`` with
    ``alpha = 1 + n / Σ ln(x_i / (xmin − 0.5))`` over values ``x_i ≥
    xmin`` and ``se = (alpha − 1)/√n`` (the CSN standard error).

    Scale: one filtered aggregate over the counts table — which is itself
    already the reduced output of a groupBy; nothing touches row-level
    data. Raises if no value reaches ``xmin`` (a fit over nothing is a
    bug, not a number)."""
    if xmin < 1:
        raise ValueError(f"xmin must be >= 1, got {xmin}")
    x = F.col(count_col).cast("double")
    agg = counts.where(x >= float(xmin)).agg(
        F.count(F.lit(1)).alias("n_values"),
        F.sum(F.log(x / (xmin - 0.5))).alias("_lsum"),
    )
    row = agg.collect()[0]
    n = int(row["n_values"] or 0)
    if n == 0:
        raise ValueError(f"no frequencies >= xmin={xmin} to fit")
    lsum = float(row["_lsum"])
    ratio = n / lsum  # α − 1, kept as one expression for SQL replayability
    spark = counts.sparkSession
    return spark.createDataFrame(
        [(n, xmin, 1.0 + ratio, ratio / n**0.5)],
        "n_values long, xmin long, alpha double, se double",
    )


# Benford first-digit probabilities log10(1 + 1/d), fixed to 12 decimals as
# LITERALS so the Spark plan and the SQL oracle share bit-identical
# constants (JVM log10 and libm log10 may differ in the last ulp).
BENFORD_P = {
    1: 0.301029995664, 2: 0.176091259056, 3: 0.124938736608,
    4: 0.096910013008, 5: 0.079181246048, 6: 0.066946789631,
    7: 0.057991946978, 8: 0.051152522447, 9: 0.045757490561,
}


def benford_audit(df: DataFrame, value_col: str) -> DataFrame:
    """First-digit (Benford) distribution audit over a positive integer
    column — the forensic screen record-linkage pipelines run on
    amount-bearing sources: naturally-occurring multiplicative data
    (payments, populations, trade volumes) follows log10(1 + 1/d), and a
    source that deviates wildly is synthetic, truncated, unit-corrupted,
    or fabricated (Nigrini's forensic-accounting standard). The audit
    reports, per leading digit, the observed count, the Benford-expected
    count, and the chi-square component; the caller compares the summed
    statistic against the chi2(8) tail it cares about. Note the inverse
    use here is also legitimate: TPC-H-style UNIFORM synthetics fail
    Benford loudly — a generator fingerprint.

    Non-positive values are excluded (Benford is undefined there);
    digits never observed still emit a row (their expected mass is the
    deviation). One map-side-combinable count over 9 groups, then
    row-local arithmetic against literal constants — engine-exact.

    Output: ``(digit, n, expected_p, expected_n, chi2_component)``.
    """
    pos = df.select(F.col(value_col).cast("long").alias("_v")).where(
        F.col("_v") > 0
    )
    digits = pos.select(
        F.substring(F.col("_v").cast("string"), 1, 1).cast("int").alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("_tot"))
    spark = df.sparkSession
    expected = spark.createDataFrame(
        [(d, p) for d, p in BENFORD_P.items()], "digit int, expected_p double"
    )
    return (
        expected.join(counts, "digit", "left")
        .crossJoin(total)
        .select(
            F.col("digit").cast("long").alias("digit"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            "expected_p",
            (F.col("expected_p") * F.col("_tot")).alias("expected_n"),
            (
                (F.coalesce("n", F.lit(0)) - F.col("expected_p") * F.col("_tot"))
                * (F.coalesce("n", F.lit(0)) - F.col("expected_p") * F.col("_tot"))
                / (F.col("expected_p") * F.col("_tot"))
            ).alias("chi2_component"),
        )
    )


def ks_two_sample(
    current: DataFrame,
    reference: DataFrame,
    value_col: str,
    order_partitions: int = 256,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between a CURRENT and a
    REFERENCE numeric column — the binning-free companion to
    :func:`distribution_drift`: PSI answers "how much mass moved between
    fixed bins", KS answers "what is the largest gap between the two
    empirical CDFs, and where" — sensitive to shifts PSI's bin edges can
    straddle, with a distribution-free significance scale.

        D = max over observed values v of |F_cur(v) − F_ref(v)|

    Output, ONE row: ``(n_cur, n_ref, d_stat, d_location, p_approx)`` —
    ``d_location`` is the SMALLEST value attaining the max (deterministic
    argmax: the comparison runs on exact integers, see below), ``p_approx``
    the standard two-sided asymptotic tail 2·Σ_{j≥1}(−1)^{j−1}e^{−2j²λ²}
    (λ = (√nₑ + 0.12 + 0.11/√nₑ)·D, nₑ = n·m/(n+m); series truncated at
    j = 5, which is < 1e-16 off for any λ where the tail matters). NULL
    d_stat/d_location/p_approx when either side is empty.

    Exactness: both CDFs reduce to integer cumulative counts over the
    distinct-value frame, and the max runs on the INTEGER cross-multiplied
    gap |cum_cur·n_ref − cum_ref·n_cur| — no float comparison decides the
    argmax, so the location is bit-deterministic on both engines (requires
    n_cur·n_ref < 2⁶³; at larger scale pre-aggregate or sample sides).
    The final divide and the p series are single float expressions over
    those exact integers.

    Distributed exactly like ``roc_auc``'s midrank pass: one groupBy to one
    row per distinct value, fixed equal-width hash ranges over the observed
    [min, max] (one 2-scalar eager aggregate), per-range count subtotals
    (one ≤ ``order_partitions``-row collect), broadcast prefix offsets,
    per-range windows — no global sort, no single-partition window.
    DETERMINISM REQUIREMENT: the per-value aggregate is evaluated by both
    the subtotal job and the final plan — persist upstream plans that are
    not re-execution-deterministic. NULL values are excluded.
    """
    k = max(1, (order_partitions - 1).bit_length())
    nranges = 1 << k
    cur = current.select(F.col(value_col).cast("double").alias("_v")).where(
        F.col("_v").isNotNull()
    )
    ref = reference.select(F.col(value_col).cast("double").alias("_v")).where(
        F.col("_v").isNotNull()
    )
    per = (
        cur.withColumn("_c", F.lit(1))
        .unionByName(ref.withColumn("_c", F.lit(0)))
        .groupBy("_v")
        .agg(
            F.sum("_c").alias("_na"),
            F.sum(F.lit(1) - F.col("_c")).alias("_nb"),
        )
    )
    rng = per.agg(F.min("_v").alias("_lo"), F.max("_v").alias("_hi")).first()
    spark = current.sparkSession
    if rng["_lo"] is None:
        # both sides empty: the documented all-NULL row
        return spark.createDataFrame(
            [(0, 0, None, None, None)],
            "n_cur long, n_ref long, d_stat double, d_location double, "
            "p_approx double",
        )
    lo, hi = float(rng["_lo"]), float(rng["_hi"])
    width = (hi - lo) / nranges if hi > lo else 1.0
    per = per.withColumn(
        "_rg",
        F.least(
            F.greatest(F.floor((F.col("_v") - F.lit(lo)) / F.lit(width)), F.lit(0)),
            F.lit(nranges - 1),
        ).cast("long"),
    )
    sub = {
        r["_rg"]: (r["_sa"], r["_sb"])
        for r in per.groupBy("_rg")
        .agg(F.sum("_na").alias("_sa"), F.sum("_nb").alias("_sb"))
        .collect()
    }
    runa = runb = 0
    offsets = []
    for rg in range(nranges):
        if rg in sub:
            offsets.append((rg, runa, runb))
            runa += int(sub[rg][0])
            runb += int(sub[rg][1])
    n_a, n_b = runa, runb
    if n_a == 0 or n_b == 0:
        return spark.createDataFrame(
            [(n_a, n_b, None, None, None)],
            "n_cur long, n_ref long, d_stat double, d_location double, "
            "p_approx double",
        )
    off = F.broadcast(
        spark.createDataFrame(offsets, "_rg long, _offa long, _offb long")
    )
    w = Window.partitionBy("_rg").orderBy("_v")
    gaps = (
        per.join(off, "_rg")
        .withColumn("_ca", F.col("_offa") + F.sum("_na").over(w))
        .withColumn("_cb", F.col("_offb") + F.sum("_nb").over(w))
        .select(
            "_v",
            F.abs(
                F.col("_ca") * F.lit(n_b) - F.col("_cb") * F.lit(n_a)
            ).alias("_num"),
        )
    )
    top = gaps.agg(
        F.min(F.struct((-F.col("_num")).alias("_neg"), F.col("_v"))).alias("_m")
    )
    d = (-F.col("_m._neg")).cast("double") / F.lit(float(n_a) * float(n_b))
    n_e = float(n_a) * float(n_b) / float(n_a + n_b)
    lam = (math.sqrt(n_e) + 0.12 + 0.11 / math.sqrt(n_e)) * d
    series = None
    for j in range(1, 6):
        term = F.lit(2.0 * (1 if j % 2 == 1 else -1)) * F.exp(
            F.lit(-2.0 * j * j) * lam * lam
        )
        series = term if series is None else series + term
    return top.select(
        F.lit(n_a).cast("long").alias("n_cur"),
        F.lit(n_b).cast("long").alias("n_ref"),
        d.alias("d_stat"),
        F.col("_m._v").alias("d_location"),
        F.least(F.greatest(series, F.lit(0.0)), F.lit(1.0)).alias("p_approx"),
    )


def bootstrap_mean_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_boot: int = 200,
    alpha_num: int = 25,
    alpha_den: int = 1000,
) -> DataFrame:
    """Percentile-bootstrap confidence interval for the mean of
    ``value_col`` (Efron 1979) with md5-PRE-DRAWN resampling — the error
    bar every corpus statistic should ship with, made deterministic and
    engine-replayable: resample b draws its i-th row as the value ranked
    ``md5('bs:b:i') mod n + 1`` in (value, id) order (the
    graph_walk_corpus trick: pre-drawn randomness is a pure function of
    the data, which a seeded PRNG cannot promise across engines).

    The percentile cut is EXACT integer arithmetic on the sorted
    resample means: lo = the (floor(B·α)+1)-th smallest, hi = the
    (B−floor(B·α))-th (ties broken by resample id — a total order). One
    B×n draw table, one join against the ranked values, one grouped
    mean per resample; selection by orderBy+limit over the B-row means,
    never a corpus window.

    Output one row: (n, n_boot, mean, ci_lo, ci_hi).
    """
    if n_boot < 2:
        raise ValueError(f"n_boot must be >= 2, got {n_boot}")
    if not 0 < alpha_num * 2 < alpha_den:
        raise ValueError("need 0 < 2*alpha < 1")
    from .suffix import global_dense_rank
    from .util import md5_long60

    vals = df.select(F.col(value_col).alias("_v"), F.col(id_col).alias("_id"))
    ranked = vals.join(
        global_dense_rank(vals, ["_v", "_id"], "_idx"), ["_v", "_id"]
    ).localCheckpoint(eager=True)
    n = ranked.count()
    spark = df.sparkSession
    draws = (
        spark.range(n_boot)
        .select(F.col("id").alias("_b"))
        .select(
            "_b",
            F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("_i"),
        )
        .select(
            "_b",
            (
                md5_long60(
                    F.concat(
                        F.lit("bs:"),
                        F.col("_b").cast("string"),
                        F.lit(":"),
                        F.col("_i").cast("string"),
                    )
                )
                % n
                + 1
            ).alias("_idx"),
        )
    )
    means = (
        draws.join(ranked.select("_idx", "_v"), "_idx")
        .groupBy("_b")
        .agg((F.sum("_v") / n).alias("_m"))
    )
    k = (n_boot * alpha_num) // alpha_den
    lo = (
        means.orderBy(F.asc("_m"), F.asc("_b"))
        .limit(k + 1)
        .orderBy(F.desc("_m"), F.desc("_b"))
        .limit(1)
        .select(F.col("_m").alias("ci_lo"))
    )
    hi = (
        means.orderBy(F.asc("_m"), F.asc("_b"))
        .limit(n_boot - k)
        .orderBy(F.desc("_m"), F.desc("_b"))
        .limit(1)
        .select(F.col("_m").alias("ci_hi"))
    )
    point = vals.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.lit(n_boot).cast("long").alias("n_boot"),
        (F.sum("_v") / F.count(F.lit(1))).alias("mean"),
    )
    return point.crossJoin(F.broadcast(lo)).crossJoin(F.broadcast(hi))


def rank_sum_drift(
    a: DataFrame, b: DataFrame, value_col: str
) -> DataFrame:
    """Mann-Whitney U rank-sum test between two samples (Mann & Whitney
    1947) — the NONPARAMETRIC member of the drift family: KS sees shape,
    PSI sees binned mass, the U statistic asks the distribution-free
    question "is a random draw from A stochastically larger than one
    from B?" and is immune to outliers that wreck mean-based checks.

    Computed WITHOUT ranking any rows: group both sides to per-value
    counts and cross the two (small) distinct-value tables —

        2U = 2·Σ_{va > vb} nA(va)·nB(vb) + Σ_{va = vb} nA(va)·nB(vb)

    exact integers end to end (the ½-tie convention scaled by 2). The
    normal approximation uses the tie-corrected variance
    σ² = nA·nB/12 · ((n+1) − Σ(t³−t)/(n(n−1))) over pooled tie groups.
    The cross join is |V_A|×|V_B| DISTINCT VALUES, not rows — bounded by
    value cardinality (bucket continuous data first; documented trade).

    Output one row: (n_a, n_b, u2, z) with z > 0 meaning A draws larger.
    """
    ca = a.groupBy(F.col(value_col).alias("_v")).agg(
        F.count(F.lit(1)).alias("_na")
    )
    cb = b.groupBy(F.col(value_col).alias("_v")).agg(
        F.count(F.lit(1)).alias("_nb")
    )
    cross = ca.select(F.col("_v").alias("_va"), "_na").crossJoin(
        cb.select(F.col("_v").alias("_vb"), "_nb")
    )
    u2row = cross.agg(
        (
            F.lit(2)
            * F.sum(
                F.when(F.col("_va") > F.col("_vb"), F.col("_na") * F.col("_nb")).otherwise(0)
            )
            + F.sum(
                F.when(F.col("_va") == F.col("_vb"), F.col("_na") * F.col("_nb")).otherwise(0)
            )
        ).cast("long").alias("u2")
    )
    na = a.agg(F.count(F.lit(1)).cast("long").alias("n_a"))
    nb = b.agg(F.count(F.lit(1)).cast("long").alias("n_b"))
    ties = (
        ca.select("_v", F.col("_na").alias("_c"))
        .unionByName(cb.select("_v", F.col("_nb").alias("_c")))
        .groupBy("_v")
        .agg(F.sum("_c").alias("_t"))
        .agg(
            F.sum(F.col("_t") * F.col("_t") * F.col("_t") - F.col("_t"))
            .cast("long")
            .alias("_tcorr")
        )
    )
    base = na.crossJoin(F.broadcast(nb)).crossJoin(F.broadcast(u2row)).crossJoin(
        F.broadcast(ties)
    )
    n = F.col("n_a") + F.col("n_b")
    var = (
        F.col("n_a")
        * F.col("n_b")
        / F.lit(12.0)
        * ((n + 1) - F.col("_tcorr") / (n * (n - 1)))
    )
    z = (
        (F.col("u2") / F.lit(2.0) - F.col("n_a") * F.col("n_b") / F.lit(2.0))
        / F.sqrt(var)
    )
    return base.select("n_a", "n_b", "u2", z.alias("z"))
