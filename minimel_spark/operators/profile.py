"""Column-level data profiling (a deequ-lite): one row of exact statistics
per profiled column — the intake step a 100-TB curation pipeline runs
before trusting a new table (schema drift, null explosions, cardinality
collapse, truncated strings all show up here first).

Stats per column: row count, null count, exact distinct count, min/max
(as strings, so one output schema covers every column type), and average
string length (NULL for non-string columns).

Scale design: ALL columns profile in ONE pass over the data — the n /
nulls / min / max / avg_len aggregates for every column are computed in a
single groupBy-less aggregation (map-side combinable, one job, no
shuffle), not per-column scans. Exact distinct counts are per-column
count_distinct expressions in that same aggregation; Spark expands
multiple DISTINCT aggregates with one `expand` + shuffle, so the whole
profile is one pass + one bounded exchange. (At extreme column counts,
profile in column groups or swap `approx_count_distinct` — exact is the
default because the oracle pins exactness.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def profile_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df``. Returns one row per
    column: (column, n_rows, n_null, n_distinct, min_value, max_value,
    avg_len) ordered by column name. min/max/avg ignore NULLs; n_distinct
    counts distinct non-null values; avg_len is NULL for non-strings."""
    cols = sorted(columns if columns is not None else df.columns)
    if not cols:
        raise ValueError("no columns to profile")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in df: {missing}")
    str_cols = {f.name for f in df.schema.fields if f.dataType.simpleString() == "string"}
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}"),
            F.count_distinct(F.col(c)).alias(f"_dist_{c}"),
            # min/max on the NATIVE type, cast after — casting first would
            # silently turn numeric extrema lexicographic
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
            (
                F.avg(F.length(F.col(c))) if c in str_cols else F.lit(None).cast("double")
            ).alias(f"_len_{c}"),
        ]
    one = df.agg(*aggs)
    # pivot the single stats row into one row per column with a literal
    # explode — |cols| structs built from the one aggregated row, no
    # second scan
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_null_{c}").alias("n_null"),
                F.col(f"_dist_{c}").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_value"),
                F.col(f"_max_{c}").alias("max_value"),
                F.col(f"_len_{c}").alias("avg_len"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(per_col).alias("s")).select("s.*")


def column_value_overlap(
    left: DataFrame,
    right: DataFrame,
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
) -> DataFrame:
    """Instance-based schema matching: for every (left column, right
    column) pair, how much their DISTINCT VALUE sets overlap — the signal
    data-integration systems use to propose join keys and column
    correspondences before any ER runs (a column pair with high
    containment is a candidate foreign key; high Jaccard a candidate
    shared identifier).

    Output: one row per column pair —
    ``(col_left, col_right, n_left, n_right, n_common, jaccard,
    contain_left, contain_right)`` over string-cast distinct non-NULL
    values (``contain_left = |∩|/|left|``, the asymmetric
    subset-of signal). Pairs with no overlap are emitted with zeros, so
    the output is always the full |L|×|R| matrix.

    Scale: each side is unpivoted in ONE scan (explode of a per-row
    struct array), reduced to distinct (column, value) — at most
    n_cols × n_distinct rows; the overlap join fans out at most
    n_cols² per value because values are distinct per column. Two small
    degree aggregates and one groupBy finish it. Cast integer/string
    columns only if results must be engine-portable (float→string
    formatting differs across engines)."""
    if left_cols is None:
        left_cols = list(left.columns)
    if right_cols is None:
        right_cols = list(right.columns)
    if not left_cols or not right_cols:
        raise ValueError("both column lists must be non-empty")

    def _unpivot(df, cols, key):
        return (
            df.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(c).alias(key),
                                F.col(c).cast("string").alias("_v"),
                            )
                            for c in cols
                        ]
                    )
                ).alias("_s")
            )
            .select(f"_s.{key}", "_s._v")
            .where(F.col("_v").isNotNull())
            .distinct()
        )

    lv = _unpivot(left, left_cols, "col_left")
    rv = _unpivot(right, right_cols, "col_right")
    deg_l = lv.groupBy("col_left").agg(F.count(F.lit(1)).alias("n_left"))
    deg_r = rv.groupBy("col_right").agg(F.count(F.lit(1)).alias("n_right"))
    inter = (
        lv.join(rv, "_v")
        .groupBy("col_left", "col_right")
        .agg(F.count(F.lit(1)).alias("_nc"))
    )
    spark = left.sparkSession
    pairs = spark.createDataFrame(
        [(a, b) for a in left_cols for b in right_cols],
        "col_left string, col_right string",
    )
    out = (
        pairs.join(deg_l, "col_left", "left")
        .join(deg_r, "col_right", "left")
        .join(inter, ["col_left", "col_right"], "left")
    )
    nl = F.coalesce(F.col("n_left"), F.lit(0))
    nr = F.coalesce(F.col("n_right"), F.lit(0))
    nc = F.coalesce(F.col("_nc"), F.lit(0))
    union = nl + nr - nc
    return out.select(
        "col_left",
        "col_right",
        nl.cast("long").alias("n_left"),
        nr.cast("long").alias("n_right"),
        nc.cast("long").alias("n_common"),
        F.when(union > 0, nc.cast("double") / union).otherwise(0.0).alias("jaccard"),
        F.when(nl > 0, nc.cast("double") / nl).otherwise(0.0).alias("contain_left"),
        F.when(nr > 0, nc.cast("double") / nr).otherwise(0.0).alias("contain_right"),
    )


def source_overlap(
    docs: DataFrame,
    key_col: str,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-source MIRROR overlap: for every pair of sources, how many
    content keys (exact-text hash, simhash bucket, canonical URL — the
    caller picks the equivalence) appear in BOTH — the audit that finds
    wholesale mirrors and syndication rings between crawl feeds before
    dedup spends pair budget on them, and the evidence base for dropping
    a source that is 95% another one. Diagonal rows (a source with
    itself) report within-source duplicate mass.

    Shape: one distinct on (key, source), one self-join ON THE KEY (cost
    bounded by per-key source-list sizes — the number of sources, not
    the corpus), one rollup. Keys present in s sources contribute
    C(s,2)+s pairs; with dozens of sources this is trivially small.

    Output: ``(source_a, source_b, n_shared_keys)`` with
    source_a <= source_b.
    """
    ks = docs.select(
        F.col(key_col).alias("_k"), F.col(source_col).alias("_s")
    ).distinct()
    a = ks.select("_k", F.col("_s").alias("source_a"))
    b = ks.select("_k", F.col("_s").alias("source_b"))
    return (
        a.join(b, "_k")
        .where(F.col("source_a") <= F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_keys"))
    )


def fd_audit(
    df: DataFrame,
    deps: list[tuple[list[str] | str, str]],
) -> DataFrame:
    """Approximate functional-dependency audit (the g₃ error of
    Kivinen & Mannila 1995, the measure TANE/Metanome-style FD discovery
    ranks by): for each candidate dependency LHS → RHS, the minimum
    fraction of rows that must be removed for the dependency to hold
    exactly:

        g3 = 1 − (Σ_x max_y |{rows: LHS=x, RHS=y}|) / N

    The schema-profiling companion to ``profile_columns`` /
    ``schema_match``: crosswalk curation asks "does source_id determine
    canonical_id", survivorship asks "does cluster_id determine the golden
    attribute", and at ingest "does URL determine content hash" is the
    re-crawl drift number. NULLs are values (a NULL RHS group counts like
    any other — deletions, not exemptions).

    One row per dependency: ``(lhs, rhs, n_rows, n_groups, n_kept, g3,
    holds)`` — lhs is the '+'-joined column list; n_kept the exact integer
    Σ max; g3 one float divide; ``holds`` = (n_kept == n_rows), an integer
    comparison. Rows with every LHS column NULL still form a group.

    Scale: per dependency one map-side-combinable groupBy on (LHS, RHS),
    one grouped max over the cells, one 3-scalar aggregate — cell-space
    cost, never a self-join, no windows. Dependencies are independent
    subplans unioned; callers auditing many deps over one expensive input
    should persist it first.
    """
    if not deps:
        raise ValueError("deps must be non-empty")
    parts = []
    for lhs, rhs in deps:
        lhs_cols = [lhs] if isinstance(lhs, str) else list(lhs)
        if rhs in lhs_cols:
            raise ValueError(f"rhs {rhs!r} may not appear in lhs {lhs_cols}")
        cell = df.groupBy(
            *[F.col(c).alias(f"_l{i}") for i, c in enumerate(lhs_cols)],
            F.col(rhs).alias("_r"),
        ).agg(F.count(F.lit(1)).alias("_n"))
        per = cell.groupBy(*[f"_l{i}" for i in range(len(lhs_cols))]).agg(
            F.max("_n").alias("_mx"), F.sum("_n").alias("_tot")
        )
        parts.append(
            per.agg(
                F.count(F.lit(1)).alias("n_groups"),
                F.coalesce(F.sum("_tot"), F.lit(0)).alias("n_rows"),
                F.coalesce(F.sum("_mx"), F.lit(0)).alias("n_kept"),
            ).select(
                F.lit("+".join(lhs_cols)).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                F.col("n_rows").cast("long").alias("n_rows"),
                F.col("n_groups").cast("long").alias("n_groups"),
                F.col("n_kept").cast("long").alias("n_kept"),
                F.when(
                    F.col("n_rows") > 0,
                    (F.col("n_rows") - F.col("n_kept")) / F.col("n_rows"),
                )
                .otherwise(F.lit(0.0))
                .alias("g3"),
                (F.col("n_kept") == F.col("n_rows")).alias("holds"),
            )
        )
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    return out


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
    l_div: int = 2,
) -> DataFrame:
    """k-anonymity + distinct-ℓ-diversity audit (Sweeney 2002; Machanavajjhala
    et al. 2007) — the privacy gate a record corpus passes before linkage
    output ships: every quasi-identifier equivalence class must hold at
    least ``k`` records (else its members are re-identifiable by the
    quasi-ids alone) and at least ``l_div`` distinct sensitive values
    (else membership leaks the sensitive attribute even at k-anonymity).

    One row per equivalence class: the quasi columns, ``class_size``,
    ``n_sensitive`` (distinct sensitive values), ``k_ok``, ``l_ok`` —
    NULL quasi values are classes of their own (NULL-safe grouping, the
    linkage convention). One map-side-combinable groupBy over the quasi
    key; the count-distinct is per-class bounded.
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if k < 1 or l_div < 1:
        raise ValueError(f"k and l_div must be >= 1, got {k}, {l_div}")
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("class_size"),
            F.countDistinct(sensitive_col).cast("long").alias("n_sensitive"),
        )
        .select(
            *quasi_cols,
            "class_size",
            "n_sensitive",
            (F.col("class_size") >= k).alias("k_ok"),
            (F.col("n_sensitive") >= l_div).alias("l_ok"),
        )
    )


def t_closeness_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t: float = 0.2,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) — the
    third leg of the privacy trio next to :func:`k_anonymity_audit`'s
    k-anonymity and ℓ-diversity: even a k-anonymous, ℓ-diverse class leaks
    if its sensitive-value DISTRIBUTION diverges from the corpus-wide one
    (the attacker's prior). For an ORDERED sensitive attribute the distance
    is the 1-D Earth Mover's Distance with unit ground metric,

        EMD(p, q) = (1/(m−1)) · Σ_{i<m} | Σ_{j≤i} (p_j − q_j) |

    over the m globally-observed sensitive values in order — exact
    class/global count ratios, one fixed IEEE sequence, rounded 6.
    A single-valued domain (m = 1) has EMD 0 by convention.

    One row per equivalence class: the quasi columns, ``class_size``,
    ``emd``, ``t_ok = emd <= t``. Note: the call runs two small eager jobs
    at plan-construction time (total row count, value-domain cardinality)
    — both are scalars the EMD formula needs as literals; cache ``df`` if
    you call this repeatedly on the same input.

    Scale design: the value domain table (m rows: value, ordinal rank,
    global count) is a tiny aggregate that BROADCASTS to a classes × m
    expansion (m is small by construction for a bucketed sensitive column
    — it is the attacker-visible alphabet, not the raw data), so the
    per-class cumulative sum windows partition on the class key — never a
    global window. The only full-data work is two map-side-combinable
    groupBys (class-value counts, class sizes).
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if not (0.0 <= t <= 1.0):
        raise ValueError(f"t must be in [0, 1], got {t}")
    from pyspark.sql import Window

    n_total = df.count()
    values = (
        df.groupBy(F.col(sensitive_col).alias("_v"))
        .agg(F.count(F.lit(1)).alias("_gcnt"))
        .withColumn(
            "_rank", F.row_number().over(Window.orderBy("_v"))
        )  # m-row frame: the single-partition window is over the tiny
        #    value-domain aggregate, not the data
    )
    m_vals = values.count()
    cls = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("class_size"))
    cv = df.groupBy(*quasi_cols, F.col(sensitive_col).alias("_v")).agg(
        F.count(F.lit(1)).alias("_ccnt")
    )
    expanded = (
        cls.crossJoin(F.broadcast(values))
        .join(cv, [*quasi_cols, "_v"], "left")
        .select(
            *quasi_cols,
            "class_size",
            "_rank",
            (
                F.coalesce(F.col("_ccnt"), F.lit(0)) / F.col("class_size")
                - F.col("_gcnt") / F.lit(n_total)
            ).alias("_d"),
        )
    )
    w = Window.partitionBy(*quasi_cols).orderBy("_rank")
    per_class = (
        expanded.withColumn("_cum", F.sum("_d").over(w))
        .where(F.col("_rank") < m_vals)  # the m-th cumulative term is 0
        .groupBy(*quasi_cols, "class_size")
        .agg(F.sum(F.abs(F.col("_cum"))).alias("_emd_sum"))
    )
    if m_vals <= 1:
        return cls.select(
            *quasi_cols,
            F.col("class_size").cast("long").alias("class_size"),
            F.lit(0.0).alias("emd"),
            F.lit(True).alias("t_ok"),
        )
    return per_class.select(
        *quasi_cols,
        F.col("class_size").cast("long").alias("class_size"),
        F.round(F.col("_emd_sum") / F.lit(m_vals - 1), 6).alias("emd"),
        (F.round(F.col("_emd_sum") / F.lit(m_vals - 1), 6) <= t).alias("t_ok"),
    )
