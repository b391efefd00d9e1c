"""Candidate-pair generation + pairwise feature scoring (SURVEY §2.3 note, §7
stage 6; north star: Jaro-Winkler + Levenshtein + hashed-BoW-cosine features).

Pair generation is the within-block self-join the reference never had (its
cluster() walks a dict): ``blocked.a JOIN blocked.b ON block_key WHERE a < b``,
deduplicated across block generators with a groupBy on the pair key. The join
shuffles on ``block_key``; cap_blocks has already bounded per-key fan-out, and
AQE skew-join covers residual imbalance.

Features:
- ``lev_sim``: Spark built-in ``levenshtein`` (JVM, whole-stage codegen);
- ``jacc3``:  char-3gram Jaccard via array_intersect/array_union (JVM);
- ``jw``:     Jaro-Winkler, Arrow-batched pandas UDF;
- ``cos_bow``: hashed bag-of-words cosine over each record's context text,
  Arrow-batched pandas UDF (reference hashvec cousin, vectorize.py:170-181).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

from ..functions.normalize import vw_tok
from ..functions.similarity import hashed_bow, jaro_winkler, sparse_cosine
from ..functions.udfs import shingles_udf


@F.pandas_udf(T.DoubleType())
def jw_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([jaro_winkler(x or "", y or "") for x, y in zip(a, b)])


@F.pandas_udf(T.DoubleType())
def bow_cosine_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [
            sparse_cosine(hashed_bow(vw_tok(x or "")), hashed_bow(vw_tok(y or "")))
            for x, y in zip(a, b)
        ]
    )


def candidate_pairs(blocked: DataFrame, rec_id_col: str = "rec_id") -> DataFrame:
    """(rec_id, block_key, ...) -> distinct (rec_id_a, rec_id_b, n_blocks) with
    rec_id_a < rec_id_b; n_blocks = how many blocks proposed the pair."""
    a = blocked.select(F.col(rec_id_col).alias("rec_id_a"), "block_key")
    b = blocked.select(F.col(rec_id_col).alias("rec_id_b"), "block_key")
    return (
        a.join(b, "block_key")
        .where(F.col("rec_id_a") < F.col("rec_id_b"))
        .groupBy("rec_id_a", "rec_id_b")
        .agg(F.count(F.lit(1)).alias("n_blocks"))
    )


def pair_features(
    pairs: DataFrame,
    records: DataFrame,
    rec_id_col: str = "rec_id",
    name_col: str = "name",
    text_col: str | None = "text",
) -> DataFrame:
    """Attach per-side names/contexts and compute the feature columns."""
    sides = records.select(
        F.col(rec_id_col).alias("_rid"),
        F.col(name_col).alias("_name"),
        *( [F.col(text_col).alias("_text")] if text_col else [] ),
    ).withColumn("_sh", shingles_udf(F.col("_name")))
    a = sides.toDF(*[f"{c}_a" for c in sides.columns])
    b = sides.toDF(*[f"{c}_b" for c in sides.columns])
    df = (
        pairs.join(a, pairs["rec_id_a"] == a["_rid_a"])
        .join(b, pairs["rec_id_b"] == b["_rid_b"])
        .drop("_rid_a", "_rid_b")
    )
    maxlen = F.greatest(F.length("_name_a"), F.length("_name_b"))
    df = (
        df.withColumn(
            "lev_sim",
            F.when(maxlen == 0, F.lit(1.0)).otherwise(
                1.0 - F.levenshtein("_name_a", "_name_b") / maxlen
            ),
        )
        .withColumn(
            "jacc3",
            F.when(
                (F.size("_sh_a") == 0) | (F.size("_sh_b") == 0), F.lit(0.0)
            ).otherwise(
                F.size(F.array_intersect("_sh_a", "_sh_b"))
                / F.size(F.array_union("_sh_a", "_sh_b"))
            ),
        )
        .withColumn("jw", jw_udf("_name_a", "_name_b"))
    )
    if text_col:
        df = df.withColumn("cos_bow", bow_cosine_udf("_text_a", "_text_b"))
    else:
        df = df.withColumn("cos_bow", F.lit(0.0))
    return df.select(
        "rec_id_a",
        "rec_id_b",
        "n_blocks",
        F.col("_name_a").alias("name_a"),
        F.col("_name_b").alias("name_b"),
        "lev_sim",
        "jacc3",
        "jw",
        "cos_bow",
    )
