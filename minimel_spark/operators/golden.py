"""Golden-record construction (survivorship): collapse each resolved
entity cluster to ONE canonical record by per-attribute survivorship
rules — the step a record-linkage pipeline runs after transitive
clustering to emit the master table (the MDM 'golden record').

Rules (all deterministic, including ties):
- "mode":    most frequent non-null value; ties -> smallest value
- "longest": longest string value; ties -> smallest value
- "min"/"max": plain extrema
- "first":   value of the member with the smallest rec_id

Scale design: every rule is expressed as a min/max of a sort-struct inside
ONE aggregation per attribute — no windows, no collects. "mode" needs a
per-(cluster, value) pre-count (one extra shuffle on that attribute only);
everything else folds map-side. Attribute results (one row per cluster
each) join back on cluster_id — cluster-cardinality-sized frames, orders
of magnitude below the record stream, so the assembly joins are cheap and
AQE broadcasts them when small.

The descending-by-count-then-ascending-by-value tie order uses the
min(struct(-cnt, value)) trick: struct comparison is lexicographic, and
negating the count turns the one descending key ascending so a single
``min`` realizes the mixed order (same device as clean.py's
per-distinct-weight cumsum ordering).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_RULES = ("mode", "longest", "min", "max", "first")


def golden_records(
    records: DataFrame,
    membership: DataFrame,
    rules: dict[str, str],
    rec_id_col: str = "rec_id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """(records ⋈ membership) -> one row per cluster with each attribute
    survived per ``rules`` (attr -> rule name). Attributes not in ``rules``
    are dropped; NULL values never survive unless a cluster's attribute is
    all-NULL (then NULL). Output: (cluster_id, n_members, <attr>...).
    """
    for a, r in rules.items():
        if r not in _RULES:
            raise ValueError(f"unknown rule {r!r} for {a!r}; valid: {_RULES}")
        if a not in records.columns:
            raise ValueError(f"attribute {a!r} not in records")
    joined = records.join(
        membership.select(rec_id_col, cluster_col), rec_id_col
    )
    out = joined.groupBy(cluster_col).agg(
        F.count(F.lit(1)).alias("n_members")
    )
    for a, r in sorted(rules.items()):
        if r == "mode":
            cnt = (
                joined.where(F.col(a).isNotNull())
                .groupBy(cluster_col, a)
                .agg(F.count(F.lit(1)).alias("_c"))
            )
            won = cnt.groupBy(cluster_col).agg(
                F.min(F.struct((-F.col("_c")).alias("_nc"), F.col(a).alias("_v")))[
                    "_v"
                ].alias(a)
            )
        elif r == "longest":
            won = (
                joined.where(F.col(a).isNotNull())
                .groupBy(cluster_col)
                .agg(
                    F.min(
                        F.struct(
                            (-F.length(F.col(a))).alias("_nl"),
                            F.col(a).alias("_v"),
                        )
                    )["_v"].alias(a)
                )
            )
        elif r == "first":
            won = (
                joined.where(F.col(a).isNotNull())
                .groupBy(cluster_col)
                .agg(
                    F.min(
                        F.struct(F.col(rec_id_col).alias("_r"), F.col(a).alias("_v"))
                    )["_v"].alias(a)
                )
            )
        else:  # min / max
            agg = F.min(a) if r == "min" else F.max(a)
            won = joined.groupBy(cluster_col).agg(agg.alias(a))
        out = out.join(won, cluster_col, "left")
    return out


def crosswalk_audit(
    mapping: DataFrame, src_col: str = "src_id", dst_col: str = "dst_id"
) -> DataFrame:
    """Cardinality audit of an id crosswalk (the mapping table an ER run
    or a vendor feed produces between two id spaces) — the check that runs
    BEFORE anyone joins through it: every distinct link is classified by
    the degrees of its two endpoints into ``1:1`` (safe join key),
    ``1:n`` / ``n:1`` (fan-out in one direction — aggregation needed), or
    ``n:m`` (ambiguous — the links clustering must adjudicate).

    Output: one row per class —
    ``(link_class, n_links, n_src, n_dst, pct_links)`` with ``n_src`` /
    ``n_dst`` the distinct endpoint counts inside the class and
    ``pct_links`` the class share of all links. Classes are always all
    four rows (zero-filled), so downstream checks can key on them.

    Scale: dedup + two degree aggregations + one classify-and-count —
    three shuffles on the link table, nothing else."""
    links = mapping.select(
        F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
    ).distinct()
    deg_s = links.groupBy("_s").agg(F.count(F.lit(1)).alias("_ds"))
    deg_d = links.groupBy("_d").agg(F.count(F.lit(1)).alias("_dd"))
    cls = (
        links.join(deg_s, "_s")
        .join(deg_d, "_d")
        .select(
            "_s",
            "_d",
            F.when((F.col("_ds") == 1) & (F.col("_dd") == 1), "1:1")
            .when((F.col("_ds") > 1) & (F.col("_dd") == 1), "1:n")
            .when((F.col("_ds") == 1) & (F.col("_dd") > 1), "n:1")
            .otherwise("n:m")
            .alias("link_class"),
        )
    )
    # NOTE on degree orientation: _ds counts dst ids per src — a src with
    # _ds > 1 fans OUT, so the class reads src:dst as 1:n.
    per = cls.groupBy("link_class").agg(
        F.count(F.lit(1)).alias("n_links"),
        F.countDistinct("_s").alias("n_src"),
        F.countDistinct("_d").alias("n_dst"),
    )
    spark = mapping.sparkSession
    all_classes = spark.createDataFrame(
        [("1:1",), ("1:n",), ("n:1",), ("n:m",)], "link_class string"
    )
    tot = per.agg(F.sum("n_links").alias("_tot"))
    return (
        all_classes.join(per, "link_class", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "link_class",
            F.coalesce("n_links", F.lit(0)).cast("long").alias("n_links"),
            F.coalesce("n_src", F.lit(0)).cast("long").alias("n_src"),
            F.coalesce("n_dst", F.lit(0)).cast("long").alias("n_dst"),
            F.when(
                F.col("_tot") > 0,
                F.coalesce("n_links", F.lit(0)).cast("double") / F.col("_tot"),
            )
            .otherwise(0.0)
            .alias("pct_links"),
        )
    )


def cluster_medoids(
    assignments: DataFrame,
    id_col: str = "rec_id",
    cluster_col: str = "cluster_id",
    name_col: str = "name",
) -> DataFrame:
    """Medoid canonicalization — the OTHER golden-record strategy: instead
    of assembling a synthetic best-of-fields record (``golden_records``),
    elect the REAL member record minimizing total Levenshtein distance to
    its cluster (ties → smaller record id), so the canonical value is
    guaranteed to exist verbatim in the source data (the usual compliance
    requirement that rules field-wise survivorship out).

    Input: ``(id_col, cluster_col, name_col)`` assignments. Output: one
    row per cluster — ``(cluster_id, medoid_id, medoid_name, sum_dist,
    cluster_size)``; singletons elect themselves with ``sum_dist`` 0.

    Scale: the pairwise pass is a within-cluster self-join — quadratic in
    CLUSTER size only, the same bounded-block discipline as every
    comparison here (resolved entity clusters are small by nature; cap
    upstream via ``max_pairs_per_block`` blocking if a mega-cluster can
    exist). One groupBy sums each member's distances, one struct-min per
    cluster elects the medoid."""
    a = assignments.select(
        F.col(cluster_col).alias("cluster_id"),
        F.col(id_col).alias("_id"),
        F.col(name_col).alias("_nm"),
    )
    b = assignments.select(
        F.col(cluster_col).alias("cluster_id"),
        F.col(id_col).alias("_id2"),
        F.col(name_col).alias("_nm2"),
    )
    sums = (
        a.join(b, "cluster_id")
        .where(F.col("_id") != F.col("_id2"))
        .groupBy("cluster_id", "_id")
        .agg(F.sum(F.levenshtein("_nm", "_nm2")).alias("_sd"))
    )
    per_member = a.join(sums, ["cluster_id", "_id"], "left").select(
        "cluster_id",
        "_id",
        "_nm",
        F.coalesce(F.col("_sd"), F.lit(0)).cast("long").alias("_sd"),
    )
    size = a.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    elected = per_member.groupBy("cluster_id").agg(
        F.min(F.struct("_sd", "_id", "_nm")).alias("_m")
    )
    return elected.join(size, "cluster_id").select(
        "cluster_id",
        F.col("_m._id").alias("medoid_id"),
        F.col("_m._nm").alias("medoid_name"),
        F.col("_m._sd").alias("sum_dist"),
        F.col("cluster_size").cast("long").alias("cluster_size"),
    )


def conflict_report(
    records: DataFrame,
    membership: DataFrame,
    attrs: list[str],
    rec_id_col: str = "rec_id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Survivorship conflict audit — the report an MDM steward reads
    BEFORE trusting ``golden_records``' picks: for every (cluster,
    attribute), how contested the values are. One row per cluster×attr:

    ``(cluster_id, attr, n_members, n_present, n_distinct, majority_value,
    majority_share, is_conflict)`` — ``majority_value`` is the mode with
    the same (count desc, value asc) tie-break golden_records' ``mode``
    rule survives (so the report explains exactly what that rule will
    pick), ``majority_share = mode_count / n_present`` (NULL when no
    value is present), ``is_conflict`` true when ≥ 2 distinct non-NULL
    values exist. NULLs never count as values.

    Scale: one unpivot projection (explode of attr structs — attrs are
    string-cast; keep floats out, same portability contract as
    column_value_overlap), one (cluster, attr, value) count, two bounded
    rollups. Nothing beyond the membership join touches row width."""
    if not attrs:
        raise ValueError("attrs must be non-empty")
    missing = [a for a in attrs if a not in records.columns]
    if missing:
        raise ValueError(f"attributes not in records: {missing}")
    joined = records.join(membership.select(rec_id_col, cluster_col), rec_id_col)
    unp = joined.select(
        F.col(cluster_col).alias("cluster_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(a).alias("attr"),
                        F.col(a).cast("string").alias("_v"),
                    )
                    for a in attrs
                ]
            )
        ).alias("_s"),
    ).select("cluster_id", "_s.attr", "_s._v")
    members = joined.groupBy(cluster_col).agg(
        F.count(F.lit(1)).alias("n_members")
    ).withColumnRenamed(cluster_col, "cluster_id")
    vals = (
        unp.where(F.col("_v").isNotNull())
        .groupBy("cluster_id", "attr", "_v")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    per = vals.groupBy("cluster_id", "attr").agg(
        F.sum("_c").alias("n_present"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.min(F.struct((-F.col("_c")).alias("_nc"), F.col("_v").alias("_v"))).alias(
            "_m"
        ),
    )
    frame = members.crossJoin(
        records.sparkSession.createDataFrame([(a,) for a in attrs], "attr string")
    )
    return frame.join(per, ["cluster_id", "attr"], "left").select(
        "cluster_id",
        "attr",
        F.col("n_members").cast("long").alias("n_members"),
        F.coalesce("n_present", F.lit(0)).cast("long").alias("n_present"),
        F.coalesce("n_distinct", F.lit(0)).cast("long").alias("n_distinct"),
        F.col("_m._v").alias("majority_value"),
        F.when(
            F.col("n_present") > 0,
            (-F.col("_m._nc")).cast("double") / F.col("n_present"),
        ).alias("majority_share"),
        (F.coalesce("n_distinct", F.lit(0)) >= 2).alias("is_conflict"),
    )


def attribute_outliers(
    records: DataFrame,
    k: float = 3.0,
    cluster_col: str = "cluster_id",
    rec_id_col: str = "rec_id",
    value_col: str = "value",
) -> DataFrame:
    """Within-cluster numeric-attribute outlier audit — the
    merge-sanity check survivorship needs BEFORE electing a golden
    value: a record whose amount sits k MADs from its cluster's median
    is either a unit error, a stale snapshot, or evidence the cluster
    glued two entities (Hampel's robust outlier rule; median/MAD rather
    than mean/stddev because a bad merge corrupts the mean first).
    Complements :func:`conflict_report` (which counts categorical
    disagreement) with the numeric analogue.

    Pass integer-scaled values (cents) for engine-exact arithmetic: the
    median of integers interpolates at most one .5 step, deviations and
    the MAD then stay exactly representable, so the ``|dev| > k·MAD``
    cut is reproducible bit-for-bit across engines and parallelism.
    A zero MAD (over half the cluster shares one value) flags every
    deviating record — the strictest, and correct, reading of the rule.

    Scale: two map-side-combinable aggregations (cluster median, then
    MAD of deviations) and one broadcast-or-shuffle join back; no
    windows, no global sort. Exact percentiles shuffle each cluster's
    values to one reducer — bounded by cluster size, which survivorship
    has already capped upstream.

    Output: FLAGGED records only —
    ``(cluster_id, rec_id, value, med, mad, dev)``.
    """
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    recs = records.select(
        F.col(cluster_col).alias("_c"),
        F.col(rec_id_col).alias("_r"),
        F.col(value_col).cast("double").alias("_v"),
    )
    med = recs.groupBy("_c").agg(
        F.expr("percentile(_v, 0.5)").alias("med")
    )
    dev = recs.join(med, "_c").withColumn("dev", F.col("_v") - F.col("med"))
    mad = dev.groupBy("_c").agg(
        F.expr("percentile(abs(dev), 0.5)").alias("mad")
    )
    return (
        dev.join(mad, "_c")
        .where(F.abs(F.col("dev")) > F.lit(k) * F.col("mad"))
        .select(
            F.col("_c").alias(cluster_col),
            F.col("_r").alias(rec_id_col),
            F.col("_v").alias(value_col),
            "med",
            "mad",
            "dev",
        )
    )
