"""Entity-feature construction from KB triples (SURVEY §2 S4, J5, J6, A8, A9).

Reference: minimel/ent_feats.py:26-63 — loads the (s, p, o) triples parquet
into driver pandas, inner-joins candidate entities on subject (J5), counts
(p, o) feature frequencies and keeps the top quantile (A8), then loops over
subjects doing a per-subject merge (J6 — an O(subjects) nested-loop join) and
dedupes "P{p}Q{o}" strings per subject (A9).

Here the whole thing is one DataFrame plan: the per-subject loop becomes a
single join + groupBy/collect_set — the loop disappears (SURVEY §2.3 J6 note).

Determinism delta (documented): the reference emits ``' '.join(set(f))`` whose
order is the per-process string-hash iteration order; we sort the feature set
(``array_sort``) so output is identical at any parallelism.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def frequent_features(spo: DataFrame, part: float = 0.5) -> DataFrame:
    """A8 (ent_feats.py:49-53): (p, o) pairs to keep. ``part < 1`` keeps pairs
    with count >= the (1-part) quantile of counts; ``part >= 1`` is an absolute
    min-count threshold."""
    po = spo.groupBy("p", "o").agg(F.count(F.lit(1)).alias("df"))
    if part < 1:
        thresh = po.agg(F.expr(f"percentile(df, {1 - part})").alias("t"))
        return (
            po.join(F.broadcast(thresh))
            .where(F.col("df") >= F.col("t"))
            .select("p", "o")
        )
    return po.where(F.col("df") >= part).select("p", "o")


def entity_features(
    spo: DataFrame, entities: DataFrame, part: float = 0.5
) -> DataFrame:
    """(s, p, o) x entities(s) -> (s, feats, n_feats): space-joined sorted
    distinct "P{p}Q{o}" feature strings per candidate entity.

    - J5: left-semi join on subject (reference: spo.join(scount, how='inner')).
    - A8: quantile-thresholded (p, o) selection over the joined triples.
    - J6+A9: one join + groupBy/collect_set replaces the reference's
      per-subject loop.
    """
    j = spo.join(entities.select("s").distinct(), "s", "left_semi")
    kept = frequent_features(j, part)
    f = (
        j.join(kept, ["p", "o"], "left_semi")
        .select(
            "s",
            F.concat(
                F.lit("P"), F.col("p").cast("string"), F.lit("Q"), F.col("o").cast("string")
            ).alias("feat"),
        )
        .distinct()
    )
    return f.groupBy("s").agg(
        F.concat_ws(" ", F.array_sort(F.collect_set("feat"))).alias("feats"),
        F.count(F.lit(1)).alias("n_feats"),
    )
