"""Distributed cardinality sketches: a deterministic HyperLogLog.

At 100-TB scale, exact per-group distinct counts (`count(distinct url)` per
host, per crawl, per day) force a full shuffle of every distinct value; a
HyperLogLog register table is a few hundred bytes per group and composes
under union — the standard tool for crawl-frequency dashboards and join-size
estimation. Spark's own `approx_count_distinct` IS HLL++, but its hash is not
recomputable outside the JVM; this implementation derives the register index
and rank from `util.md5_long60`, so a DuckDB oracle rebuilds every register —
and therefore the exact estimate, bit for bit — from the raw rows (the same
md5 trick the dedup/ANN oracle families use). No counterpart in the
reference (minimEL).

Layout of the 60-bit md5 hash, p index bits + 52 rank bits:

    idx = h >> 52          (top p=8 bits -> register 0..255 when p=8)
    rho = 53 - len(bin(h & (2^52 - 1)))   (leading-zero count + 1; 53 if 0)

The register sum is kept in INTEGER space — sum of 2^(53 - M_j) as BIGINT is
exact (each term <= 2^52, <= 2^p terms < 2^63 total), so both engines derive
the estimate from the *same exact integer* with one identical float divide:
no summation-order noise anywhere.

Scale: one partial-aggregated groupBy on (group, register) — at most
2^p rows per group survive the map side — then a per-group rollup. The
companion exact count (for the gate's accuracy report) is the expensive
half and exists only for verification; production callers take the sketch.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .util import ensure_min_parallelism, md5_long60


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 8,
    exact: bool = True,
) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimate of ``value_col``.

    Returns (group_cols..., n_registers, hll_estimate[, n_exact, rel_err]):
    ``n_registers`` is the number of non-zero registers, ``hll_estimate``
    the Flajolet et al. estimate with the standard small-range (linear
    counting) correction, and — when ``exact`` — the true distinct count
    plus signed relative error, for accuracy gating. Standard error is
    ~1.04/sqrt(2^p) (~6.5% at p=8).
    """
    if not 4 <= p <= 12:
        raise ValueError(f"p must be in [4, 12], got {p}")
    m = 1 << p
    rem_bits = 60 - p
    rho_max = rem_bits + 1
    # alpha_m * m^2 * 2^rho_max as ONE Python float literal, embedded
    # identically in both engines so the single divide is bit-identical
    alpha_m = 0.7213 / (1.0 + 1.079 / m) if m >= 128 else (
        0.673 if m == 16 else 0.697 if m == 32 else 0.709
    )
    scale = alpha_m * m * m * float(1 << rho_max)

    # spread by (group, value), NOT group alone: a constant/low-cardinality
    # group (e.g. a corpus-wide sketch) hash-partitioned by key would land
    # every row in one task; including the value keeps the map stage spread
    # while the (group, register) partial agg still combines map-side
    df = ensure_min_parallelism(df, *group_cols, value_col)
    h = md5_long60(F.col(value_col))
    rem = F.expr(f"_h & {(1 << rem_bits) - 1}")
    rows = df.select(
        *group_cols, h.alias("_h")
    ).select(
        *group_cols,
        F.shiftright(F.col("_h"), rem_bits).alias("_idx"),
        F.when(rem == 0, F.lit(rho_max))
        .otherwise(F.lit(rho_max) - F.length(F.bin(rem)))
        .alias("_rho"),
    )
    regs = rows.groupBy(*group_cols, "_idx").agg(F.max("_rho").alias("_m"))
    agg = regs.groupBy(*group_cols).agg(
        F.count("*").alias("n_registers"),
        F.sum(F.expr(f"CAST(1 AS BIGINT) << ({rho_max} - _m)")).alias("_s"),
    )
    v0 = F.lit(m) - F.col("n_registers")
    s_total = F.col("_s") + v0 * F.lit(1 << rho_max)
    raw = F.lit(scale) / s_total.cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v0 > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v0.cast("double")),
    ).otherwise(raw)
    out = agg.select(*group_cols, "n_registers", est.alias("hll_estimate"))
    if not exact:
        return out
    truth = df.groupBy(*group_cols).agg(
        F.countDistinct(value_col).alias("n_exact")
    )
    return out.join(truth, group_cols).select(
        *group_cols,
        "n_registers",
        "hll_estimate",
        "n_exact",
        ((F.col("hll_estimate") - F.col("n_exact")) / F.col("n_exact")).alias(
            "rel_err"
        ),
    )


def bloom_build(
    dim: DataFrame, key_col: str, n_bits: int = 1 << 17, k: int = 3
) -> DataFrame:
    """Build a Bloom filter over ``dim[key_col]`` as a packed word table
    (word_idx BIGINT, word BIGINT) — the broadcast-able runtime filter for
    `bloom_semi_join`.

    Bit i of word w covers global bit position w*63 + i; words are 63 bits
    so the mask `1 << (pos % 63)` never touches the sign bit (DuckDB raises
    on BIGINT `1 << 63`, and the oracle must pack identically). Hash j of a
    key is `md5_long60('bj:' || key) % n_bits` — deterministic and
    recomputable in SQL. The table has at most ceil(n_bits/63) rows
    (~2 KB per 2^17 bits), built with one partial-aggregated bit_or
    shuffle over the (small) dim side.
    """
    if n_bits < 63 or k < 1:
        raise ValueError(f"need n_bits >= 63 and k >= 1, got {n_bits}, {k}")
    pos = [
        (md5_long60(F.concat(F.lit(f"b{j}:"), F.col(key_col))) % n_bits).alias(
            f"_p{j}"
        )
        for j in range(1, k + 1)
    ]
    positions = dim.select(
        F.explode(F.array(*pos)).alias("pos")
    )
    return (
        positions.select(
            (F.col("pos") / 63).cast("long").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))").alias(
                "_mask"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_mask").alias("word"))
    )


def bloom_semi_join(
    fact: DataFrame,
    key_col: str,
    bloom: DataFrame,
    n_bits: int = 1 << 17,
    k: int = 3,
) -> DataFrame:
    """Flag fact rows whose key *may* be in the Bloom filter (column
    ``bloom_pass``; false = definitely absent, the rows a real pipeline
    drops BEFORE the expensive shuffle join).

    Plan shape — the reason this operator exists at 100 TB: the fact side
    is scanned ONCE and flows through k broadcast hash joins on word_idx
    (the filter table is KBs), entirely map-side: no shuffle, no explode
    fan-out, no group-back. The dim side is touched only by `bloom_build`.
    A plain semi-join would shuffle the full fact side on the key.
    """
    if n_bits < 63 or k < 1:
        raise ValueError(f"need n_bits >= 63 and k >= 1, got {n_bits}, {k}")
    out = fact
    bits = []
    for j in range(1, k + 1):
        pos = md5_long60(F.concat(F.lit(f"b{j}:"), F.col(key_col))) % n_bits
        out = out.withColumn(f"_pos{j}", pos).withColumn(
            f"_wi{j}", (F.col(f"_pos{j}") / 63).cast("long")
        )
        w = bloom.select(
            F.col("word_idx").alias(f"_wi{j}"), F.col("word").alias(f"_w{j}")
        )
        out = out.join(F.broadcast(w), f"_wi{j}", "left")
        bits.append(
            F.coalesce(
                F.expr(
                    f"(_w{j} & shiftleft(CAST(1 AS BIGINT),"
                    f" CAST(_pos{j} % 63 AS INT))) != 0"
                ),
                F.lit(False),
            )
        )
    cond = bits[0]
    for b in bits[1:]:
        cond = cond & b
    return out.select(*fact.columns, cond.alias("bloom_pass"))


def cms_build(
    df: DataFrame, value_col: str, d: int = 4, w: int = 8192
) -> DataFrame:
    """Count-min sketch over ``df[value_col]``: d hash rows × w buckets,
    returned as a (row_j, bucket, cnt) table of at most d*w rows.

    The fixed-size summary for streaming/heavy-hitter frequency questions
    a 100-TB pipeline can't answer with exact group-bys (the distinct-key
    table itself is TBs): counts compose under addition across shards/
    micro-batches, and a point query never *under*-estimates. Hash j of a
    value is `md5_long60('c{j}:' || value) % w` — deterministic and
    recomputable in SQL, like the Bloom/HLL layouts above.

    Scale: one explode (d small constant) + one partial-aggregated groupBy
    whose result is bounded by d*w regardless of input size.

    NULL values are EXCLUDED from the sketch (and from `cms_query` probes):
    NULL concatenates to a NULL hash whose cells an equi-join probe could
    never match (NULL != NULL), which would silently break the
    never-undercount guarantee — so both sides drop NULLs up front and the
    guarantee holds for every non-NULL value.
    """
    if d < 1 or w < 2:
        raise ValueError(f"need d >= 1 and w >= 2, got {d}, {w}")
    df = df.where(F.col(value_col).isNotNull())
    cells = [
        F.struct(
            F.lit(j).alias("row_j"),
            (md5_long60(F.concat(F.lit(f"c{j}:"), F.col(value_col))) % w).alias(
                "bucket"
            ),
        )
        for j in range(1, d + 1)
    ]
    return (
        df.select(F.explode(F.array(*cells)).alias("c"))
        .groupBy(F.col("c.row_j").alias("row_j"), F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_query(
    queries: DataFrame, value_col: str, cms: DataFrame, d: int = 4, w: int = 8192
) -> DataFrame:
    """Point-estimate the frequency of every value in ``queries[value_col]``
    against a `cms_build` sketch: min over the d hashed cells.

    Guarantee: estimate >= true count, always (collisions only inflate) —
    for non-NULL values; NULLs are excluded on both sides (see cms_build).
    Plan: the query side explodes to d rows and broadcast-joins the
    (<= d*w row) sketch — map-side, no shuffle of the query side beyond
    the final per-value min."""
    if d < 1 or w < 2:
        raise ValueError(f"need d >= 1 and w >= 2, got {d}, {w}")
    queries = queries.where(F.col(value_col).isNotNull())
    cells = [
        F.struct(
            F.lit(j).alias("row_j"),
            (md5_long60(F.concat(F.lit(f"c{j}:"), F.col(value_col))) % w).alias(
                "bucket"
            ),
        )
        for j in range(1, d + 1)
    ]
    probe = queries.select(
        F.col(value_col), F.explode(F.array(*cells)).alias("c")
    ).select(value_col, F.col("c.row_j").alias("row_j"), F.col("c.bucket").alias("bucket"))
    return (
        probe.join(F.broadcast(cms), ["row_j", "bucket"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cnt_est"))
    )


def hll_reference(values, p: int = 8) -> float:
    """Pure-Python HLL over md5, mirroring `hll_distinct` register-for-
    register — the pytest cross-check that the Spark bit layout is the
    intended algorithm (not just self-consistent)."""
    import hashlib

    m = 1 << p
    rem_bits = 60 - p
    rho_max = rem_bits + 1
    alpha_m = 0.7213 / (1.0 + 1.079 / m) if m >= 128 else (
        0.673 if m == 16 else 0.697 if m == 32 else 0.709
    )
    regs = [0] * m
    for v in set(values):
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        idx = h >> rem_bits
        rem = h & ((1 << rem_bits) - 1)
        rho = rho_max if rem == 0 else rho_max - rem.bit_length()
        regs[idx] = max(regs[idx], rho)
    s_total = sum(1 << (rho_max - r) for r in regs)
    raw = (alpha_m * m * m * float(1 << rho_max)) / float(s_total)
    v0 = regs.count(0)
    if raw <= 2.5 * m and v0 > 0:
        return m * math.log(m / v0)
    return raw


def _kmin(hashed: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """k smallest ``_h`` per group, losslessly pre-cut through 64 salt
    buckets so no window partition ever holds more than one bucket's
    distinct-hash stream (see kmv_distinct's scale note)."""
    from pyspark.sql import Window

    w1 = Window.partitionBy(*group_cols, "_sb").orderBy("_h")
    pre = (
        hashed.withColumn("_sb", F.pmod(F.col("_h"), F.lit(64)))
        .withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= k)
        .drop("_sb", "_rn")
    )
    w2 = Window.partitionBy(*group_cols).orderBy("_h")
    return pre.withColumn("_rn", F.row_number().over(w2)).where(F.col("_rn") <= k)


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    exact: bool = True,
) -> DataFrame:
    """Per-group K-Minimum-Values distinct-count sketch (Bar-Yossef et al.,
    RANDOM 2002; unbiased estimator per Beyer et al., SIGMOD 2007) — the
    ORDER-STATISTIC companion to :func:`hll_distinct`: instead of register
    maxima it keeps the k smallest distinct 60-bit md5 hashes per group, and
    estimates D ≈ (k−1) / U_(k) where U_(k) is the k-th minimum normalized
    to (0,1]. Two properties HLL lacks make it worth carrying both: the
    kept-hash set composes under ANY set algebra (union = merge + re-top-k,
    and the Jaccard of two groups is estimable from the overlap of their
    k-min sets), and below k distinct values the sketch IS the exact answer
    (n_kept < k ⇒ every distinct hash was kept).

    Returns (group_cols..., n_kept, kth_hash, kmv_estimate[, n_exact,
    rel_err]): ``kth_hash`` is the largest kept hash (NULL only for an
    all-NULL group, which produces no row); ``kmv_estimate`` is
    (k−1)·2⁶⁰/h_k when the sketch saturated (n_kept == k), else exactly
    n_kept. The estimate derives from one float divide over EXACT integers
    — both engines agree bit-for-bit, no summation order anywhere
    (standard error ~1/√(k−2), ~13% at k=64).

    Scale: one (group, hash) distinct-style aggregate (map-side combinable),
    then a TWO-LEVEL top-k: a salt-bucketed pre-cut window (group × 64 hash
    buckets, each keeps its k smallest — the k global minima are each within
    their bucket's k minima, so the pre-cut is lossless) followed by the
    per-group top-k over the ≤ 64·k survivors. A low-cardinality group (the
    corpus-wide sketch) therefore never funnels its full distinct-hash
    stream through one window partition — the byte_pack_buckets lesson
    applied to order statistics. ``exact`` adds the true countDistinct
    (verification only — production callers take the sketch).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    df = ensure_min_parallelism(df, *group_cols, value_col)
    hashed = (
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, md5_long60(F.col(value_col)).alias("_h"))
        .groupBy(*group_cols, "_h")
        .agg(F.lit(1).alias("_one"))
    )
    kept = _kmin(hashed, list(group_cols), k)
    agg = kept.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("_h").alias("kth_hash"),
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float((k - 1) * (1 << 60))) / F.col("kth_hash").cast("double")
    )
    out = agg.select(*group_cols, "n_kept", "kth_hash", est.alias("kmv_estimate"))
    if not exact:
        return out
    truth = df.groupBy(*group_cols).agg(
        F.countDistinct(value_col).alias("n_exact")
    )
    return out.join(truth, group_cols).select(
        *group_cols,
        "n_kept",
        "kth_hash",
        "kmv_estimate",
        "n_exact",
        ((F.col("kmv_estimate") - F.col("n_exact")) / F.col("n_exact")).alias(
            "rel_err"
        ),
    )


def kmv_union(
    sketches: DataFrame,
    group_cols: list[str],
    k: int,
) -> DataFrame:
    """Merge per-source KMV sketches into per-group union sketches — the
    composition property that makes KMV a DISTRIBUTIVE sketch: the k minima
    of a union are a subset of the union of the parts' k minima, so merging
    kept-hash sets and re-taking the k smallest yields EXACTLY the sketch a
    single pass over the union would have built (no approximation is added
    by merging). Input is the long form of kept hashes — (group_cols...,
    _h) rows from any number of sources (e.g. one sketch per day/partition,
    rolled up to per-host) — output matches :func:`kmv_distinct` without
    the ``exact`` columns. Shuffle cost is the kept-hash rows only (≤ k per
    source-group), never the raw values.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    dedup = sketches.groupBy(*group_cols, "_h").agg(F.lit(1).alias("_one"))
    kept = _kmin(dedup, list(group_cols), k)
    agg = kept.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("_h").alias("kth_hash"),
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float((k - 1) * (1 << 60))) / F.col("kth_hash").cast("double")
    )
    return agg.select(*group_cols, "n_kept", "kth_hash", est.alias("kmv_estimate"))


def kmv_jaccard(
    left: DataFrame,
    right: DataFrame,
    value_col: str,
    k: int = 256,
    exact: bool = True,
) -> DataFrame:
    """KMV set-overlap estimate between two value sets — the sketch-algebra
    payoff :func:`kmv_distinct`'s docstring promises: because a KMV sketch
    is the k minima of a uniform hash, the k minima of A ∪ B are a uniform
    sample of the union, and the fraction of them present in BOTH sides'
    kept sets is an unbiased Jaccard estimator (Beyer et al., SIGMOD 2007;
    the Theta-sketch intersection semantics):

        Ĵ = |kmin_k(A ∪ B) ∩ kept(A) ∩ kept(B)| / |kmin_k(A ∪ B)|

    At 100 TB this is how URL-set / shingle-set similarity between two
    crawls is computed WITHOUT joining the raw sets: each side ships k
    hashes. Exact when both sides saturate below k (the kept sets ARE the
    sets). One row out: ``(n_kept_left, n_kept_right, k_union, n_both,
    jaccard_kmv[, jaccard_exact, abs_err])`` — n_both/k_union are exact
    integers, the estimate one float divide (the kmv_distinct exactness
    contract). Std err ~ sqrt(J(1−J)/k).

    Scale: two sketch builds (the salt-pre-cut top-k shape), a ≤ 2k-row
    merge re-top-k, two broadcast membership semi-join flags over ≤ k rows.
    ``exact`` adds the true distinct-value join (verification only).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")

    def side(df):
        return (
            ensure_min_parallelism(df, value_col)
            .where(F.col(value_col).isNotNull())
            .select(md5_long60(F.col(value_col)).alias("_h"))
            .groupBy("_h")
            .agg(F.lit(1).alias("_one"))
        )

    ka = _kmin(side(left).withColumn("_g", F.lit(1)), ["_g"], k).select("_h")
    kb = _kmin(side(right).withColumn("_g", F.lit(1)), ["_g"], k).select("_h")
    merged = ka.unionByName(kb).groupBy("_h").agg(F.lit(1).alias("_one"))
    ku = _kmin(merged.withColumn("_g", F.lit(1)), ["_g"], k).select("_h")
    flagged = (
        ku.join(ka.withColumn("_ina", F.lit(1)), "_h", "left")
        .join(kb.withColumn("_inb", F.lit(1)), "_h", "left")
    )
    core = flagged.agg(
        F.count(F.lit(1)).alias("k_union"),
        F.sum(
            F.when(F.col("_ina").isNotNull() & F.col("_inb").isNotNull(), 1).otherwise(0)
        ).alias("n_both"),
    )
    na = ka.agg(F.count(F.lit(1)).alias("n_kept_left"))
    nb = kb.agg(F.count(F.lit(1)).alias("n_kept_right"))
    out = (
        core.crossJoin(na)
        .crossJoin(nb)
        .select(
            F.col("n_kept_left").cast("long").alias("n_kept_left"),
            F.col("n_kept_right").cast("long").alias("n_kept_right"),
            F.col("k_union").cast("long").alias("k_union"),
            F.col("n_both").cast("long").alias("n_both"),
            F.when(F.col("k_union") > 0, F.col("n_both") / F.col("k_union"))
            .otherwise(F.lit(0.0))
            .alias("jaccard_kmv"),
        )
    )
    if not exact:
        return out
    av = left.where(F.col(value_col).isNotNull()).select(
        F.col(value_col).alias("_v")
    ).distinct()
    bv = right.where(F.col(value_col).isNotNull()).select(
        F.col(value_col).alias("_v")
    ).distinct()
    ex = (
        av.withColumn("_a", F.lit(1))
        .join(bv.withColumn("_b", F.lit(1)), "_v", "full_outer")
        .agg(
            F.count(F.lit(1)).alias("_nu"),
            F.sum(
                F.when(F.col("_a").isNotNull() & F.col("_b").isNotNull(), 1).otherwise(0)
            ).alias("_ni"),
        )
        .select(
            F.when(F.col("_nu") > 0, F.col("_ni") / F.col("_nu"))
            .otherwise(F.lit(0.0))
            .alias("jaccard_exact")
        )
    )
    return out.crossJoin(ex).withColumn(
        "abs_err", F.abs(F.col("jaccard_kmv") - F.col("jaccard_exact"))
    )


def qdigest_build(
    df: DataFrame,
    idx_col: str,
    bits: int = 12,
    k: int = 128,
) -> DataFrame:
    """Q-digest mergeable quantile sketch (Shrivastava, Buragohain,
    Agrawal & Suri, SenSys 2004) over a bounded integer domain
    [0, 2^bits) — the quantile-summary companion to this module's
    HLL/CMS/Bloom/KMV: a set of dyadic-range nodes of the implicit binary
    tree whose counts answer any rank query within ε·n for ε = bits/k,
    in O(k) space, and which MERGES by count addition + one recompress
    (the property plain sorted samples lack).

    Build is the canonical bottom-up single pass, made fully deterministic
    by operating on the exact leaf histogram: at each level, sibling pairs
    whose combined count is below the compression threshold ⌊n/k⌋ move
    their weight to the parent node; pairs at or above it stay put (every
    internal node therefore carries < ⌊n/k⌋, which is what caps the rank
    error of any query at bits·⌊n/k⌋ ≤ ε·n). The result is a pure
    function of the value MULTISET — partitioning-invariant by
    construction, which is what lets a DuckDB replay of the identical
    per-level recurrence hash-match it exactly.

    Scale design: the only full-data work is the one map-side-combinable
    leaf groupBy; the ``bits`` compression rounds run over a frame bounded
    by min(distinct values, 2^bits) rows that only shrinks — the driver
    never sees data rows, and per-group digests (one groupBy key
    prepended to every stage) fall out of the same shape. Returns
    ``(lv, idx, cnt)`` node rows (level 0 = root, level ``bits`` =
    leaves); values outside the domain clamp to its edges. Note: the call
    runs one eager count at plan-construction time (the compression
    threshold ⌊n/k⌋ must be a literal before the per-level rule can be
    planned) plus the leaf-histogram checkpoint.
    """
    from pyspark.sql import Window

    if not (1 <= bits <= 20):
        raise ValueError(f"bits must be in [1, 20], got {bits}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    lo, hi = 0, (1 << bits) - 1
    leaves = (
        df.select(
            F.greatest(
                F.lit(lo), F.least(F.lit(hi), F.col(idx_col).cast("long"))
            ).alias("idx")
        )
        .groupBy("idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("lv", F.lit(bits))
        .select("lv", "idx", "cnt")
    )
    n = df.count()
    return _qdigest_compress(leaves.localCheckpoint(eager=True), bits, n // k)


def _qdigest_compress(nodes: DataFrame, bits: int, thr: int) -> DataFrame:
    """One full bottom-up compression pass over ``(lv, idx, cnt)`` node
    rows: per level, sibling groups whose combined count is below ``thr``
    move their weight to the parent. Shared by build and merge — the
    q-digest merge IS count-addition followed by exactly this pass."""
    from pyspark.sql import Window

    for l in range(bits, 0, -1):
        cur = nodes.where(F.col("lv") == l)
        rest = nodes.where(F.col("lv") != l)
        sib = cur.withColumn("p", (F.col("idx") / 2).cast("long")).withColumn(
            "s", F.sum("cnt").over(Window.partitionBy("p"))
        )
        kept = sib.where(F.col("s") >= thr).select("lv", "idx", "cnt")
        merged = (
            sib.where(F.col("s") < thr)
            .groupBy("p")
            .agg(F.sum("cnt").alias("cnt"))
            .select(F.lit(l - 1).alias("lv"), F.col("p").alias("idx"), "cnt")
        )
        nodes = rest.unionByName(kept).unionByName(merged)
        if l % 4 == 1:  # bound plan depth over the tiny shrinking frame
            nodes = nodes.localCheckpoint(eager=True)
    return nodes


def qdigest_merge(
    a: DataFrame, b: DataFrame, bits: int, n_total: int, k: int = 128
) -> DataFrame:
    """Merge two q-digests built over the same domain (the SenSys 2004
    merge): add the two node multisets' counts per (lv, idx), then run one
    compression pass at the COMBINED threshold ⌊n_total/k⌋. The result is
    a valid ε-digest of the union multiset (ε = bits/k) — not necessarily
    node-identical to a direct build, which is why the pytest property
    check asserts the rank guarantee of the merged digest rather than
    structural equality."""
    summed = (
        a.unionByName(b)
        .groupBy("lv", "idx")
        .agg(F.sum("cnt").alias("cnt"))
        .select("lv", "idx", "cnt")
    )
    return _qdigest_compress(
        summed.localCheckpoint(eager=True), bits, n_total // k
    )


def qdigest_quantiles(
    df: DataFrame,
    value_col: str,
    scale: float,
    qs: list[float],
    bits: int = 12,
    k: int = 128,
) -> DataFrame:
    """Build a q-digest over ``floor(value / scale)`` and answer the given
    quantiles from it, with the paper's rank-error guarantee CHECKED
    against the exact data in the same plan: for each q the estimate is
    the dyadic upper bound of the first node — nodes ordered by
    (upper bound, lower bound) — whose cumulative count reaches
    ⌈q·n⌉. The guarantee, duplicate-safe (the paper assumes distinct
    values; a heavy repeated value legitimately spans many ranks): the
    reported NODE's true rank interval brackets the target within ε·n,
    i.e. count(values ≤ node ub) ≥ target (every value the prefix counted
    is ≤ the bound) and count(values < node lb) ≤ target + ε·n (mass
    below the node's range is either prefix mass < target or sits in the
    ≤ ``bits`` strict ancestors, each carrying < ⌊n/k⌋), with
    ε = bits/k — ``within_bound`` verifies both sides against the exact
    data in the same plan. A self-auditing sketch gate.

    One row per q: ``(q, n_nodes, est_idx, est_value, rank_target,
    rank_at_est, rank_lo_est, within_bound)`` — exact integers except
    q/est_value.
    The rank audit is a conditional aggregation over a broadcast of the
    |qs|-row estimate table — no driver collect, no non-broadcast theta
    join.
    """
    from pyspark.sql import Window

    idxed = df.select(
        F.floor(F.col(value_col) / F.lit(scale)).cast("long").alias("_i")
    ).localCheckpoint(eager=True)  # feeds the digest build AND the rank audit
    nodes = qdigest_build(idxed, "_i", bits=bits, k=k)
    n = idxed.count()
    eps_n = (bits / k) * n
    spark = df.sparkSession
    n_nodes = nodes.count()
    # dyadic range width 2^(bits - lv): exact in double up to 2^20
    width = F.pow(F.lit(2.0), F.lit(bits) - F.col("lv")).cast("long")
    ranked = (
        nodes.select(
            "cnt",
            ((F.col("idx") + 1) * width - 1).alias("ub"),
            (F.col("idx") * width).alias("lb"),
        )
        .withColumn("cum", F.sum("cnt").over(Window.orderBy("ub", "lb")))
        # digest frame: <= 3k rows by the q-digest size bound — the global
        # window is over the sketch, never the data
    )
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double").withColumn(
        "rank_target", F.ceil(F.col("q") * F.lit(n)).cast("long")
    )
    est = (
        qdf.join(F.broadcast(ranked), ranked["cum"] >= qdf["rank_target"], "left")
        .groupBy("q", "rank_target")
        .agg(F.min(F.struct("ub", "lb")).alias("_st"))
        .select(
            "q",
            "rank_target",
            F.col("_st.ub").alias("est_idx"),
            F.col("_st.lb").alias("est_lb"),
        )
    )
    rank_at = (
        idxed.crossJoin(F.broadcast(est))
        .groupBy("q", "rank_target", "est_idx", "est_lb")
        .agg(
            F.sum(
                F.when(F.col("_i") <= F.col("est_idx"), F.lit(1)).otherwise(F.lit(0))
            ).alias("rank_at_est"),
            F.sum(
                F.when(F.col("_i") < F.col("est_lb"), F.lit(1)).otherwise(F.lit(0))
            ).alias("rank_lo_est"),
        )
    )
    return rank_at.select(
        "q",
        F.lit(n_nodes).cast("long").alias("n_nodes"),
        F.col("est_idx").cast("long").alias("est_idx"),
        F.round((F.col("est_idx") + 1) * F.lit(scale), 6).alias("est_value"),
        "rank_target",
        F.col("rank_at_est").cast("long").alias("rank_at_est"),
        F.col("rank_lo_est").cast("long").alias("rank_lo_est"),
        (
            (F.col("rank_at_est") >= F.col("rank_target"))
            & ((F.col("rank_lo_est") - F.col("rank_target")) <= F.lit(eps_n))
        ).alias("within_bound"),
    )


def cms_join_size(cms_a: DataFrame, cms_b: DataFrame, d: int = 4) -> DataFrame:
    """Equi-join cardinality estimation from two count-min sketches
    (Cormode & Muthukrishnan 2005 §4.2, the CM form of the AGMS
    inner-product estimator): |A ⋈ B on k| = Σ_k cnt_A(k)·cnt_B(k) is
    estimated by min over hash rows j of Σ_buckets CMS_A[j]·CMS_B[j] —
    colliding keys only ADD nonnegative cross terms, so every row
    over-estimates and the min is the tightest; the estimate never
    undercounts. This is the pre-flight a planner runs before a
    quadratic-risk join (the self-join-on-hot-key blowup check) from two
    d·w-row summaries, never touching the data again — THE reason to
    keep CMS sketches of join keys at 100 TB.

    Exact integer arithmetic end to end (counts × counts summed), so the
    gate's oracle replays it value-exactly. Input: two ``cms_build``
    outputs built with the same (d, w). One row: ``(est_join_size)``.
    """
    if d < 1:
        raise ValueError(f"d must be >= 1, got {d}")
    prod = (
        cms_a.select("row_j", "bucket", F.col("cnt").alias("_ca"))
        .join(
            cms_b.select("row_j", "bucket", F.col("cnt").alias("_cb")),
            ["row_j", "bucket"],
        )
        .groupBy("row_j")
        .agg(F.sum(F.col("_ca") * F.col("_cb")).alias("_ip"))
    )
    return prod.agg(F.min("_ip").cast("long").alias("est_join_size"))
