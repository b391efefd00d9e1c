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
