"""Privacy-preserving record linkage (PPRL): Bloom-filter name encodings.

Cryptographic Long-term Key (CLK) encoding after Schnell, Bachteler &
Reiher, "Privacy-preserving record linkage using Bloom filters" (BMC
Medical Informatics 2009): each quasi-identifier string is reduced to
padded character q-grams, every q-gram sets k hash-derived bit positions
in an m-bit Bloom filter, and two encodings are compared by the Dice
coefficient of their set bits — similar names yield similar filters, but
the raw strings never leave their data custodian. This is the standard
way to run the blocking/comparison half of an ER pipeline when the
parties may not exchange cleartext identifiers.

Representation: the filter is NOT packed into a bitmask — it is the
sorted distinct array of set positions (≤ k·|grams| ints, typically a few
dozen), which keeps every operation a built-in JVM array expression
(array_intersect / size) with no UDF, and makes the encoding replayable
in SQL for oracle checking (md5-derived positions, like every other
seeded operator in this package). Dice needs only set sizes and the
intersection size, so the array form loses nothing.

Scale: encoding is a pure projection (whole-stage codegen, no shuffle);
comparison consumes a BLOCKED candidate-pair stream and attaches the two
encodings with two id-equi joins — nothing is all-pairs, the same shape
as pairs.py / linkage.py comparisons.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def clk_encode(
    records: DataFrame,
    text_col: str,
    id_col: str = "rec_id",
    m: int = 128,
    k: int = 4,
    q: int = 2,
    salt: str = ":clk",
) -> DataFrame:
    """(id_col, clk, n_bits): CLK Bloom-filter encoding of ``text_col``.

    The string is lowercased and padded with '_' sentinels (so boundary
    characters get their own q-grams, per the PPRL literature), cut into
    overlapping character q-grams, and each gram g sets the k positions
    ``md5(j ':' g salt)[:8] mod m`` for j = 1..k. ``clk`` is the sorted
    distinct position array, ``n_bits`` its cardinality (the filter's
    popcount). Deterministic, parallelism-invariant, SQL-replayable.
    """
    if m < 1 or k < 1 or q < 1:
        raise ValueError(f"m, k, q must all be >= 1, got m={m} k={k} q={q}")
    expr = f"""
    array_sort(array_distinct(flatten(transform(
      transform(sequence(1, greatest(length(_clk_s) - {q - 1}, 0)),
                i -> substring(_clk_s, i, {q})),
      g -> transform(sequence(1, {k}),
                     j -> cast(conv(substr(md5(concat(cast(j AS string), ':', g,
                                                      '{salt}')), 1, 8),
                               16, 10) AS bigint) % {m})
    ))))
    """
    return (
        records.withColumn(
            "_clk_s", F.concat(F.lit("_"), F.lower(F.col(text_col)), F.lit("_"))
        )
        .withColumn("clk", F.expr(expr))
        .select(
            id_col,
            "clk",
            F.size("clk").cast("long").alias("n_bits"),
        )
    )


def clk_dice_pairs(
    encoded: DataFrame,
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    threshold: float = 0.0,
) -> DataFrame:
    """Dice-coefficient comparison of CLK encodings over a blocked
    candidate-pair stream: ``dice = 2·|A∩B| / (|A| + |B|)`` on the set-bit
    arrays (0.0 when both filters are empty — two unencodable strings are
    not evidence of a match). Output: ``(id_a, id_b, n_a, n_b, n_common,
    dice)`` filtered to ``dice >= threshold``.

    ``pairs`` must already be blocked (phonetic / sorted-neighborhood /
    LSH — any of this package's blockers); this operator adds two id-equi
    joins and per-row array arithmetic, nothing quadratic."""
    enc_a = encoded.select(
        F.col(encoded.columns[0]).alias(id_a),
        F.col("clk").alias("_clk_a"),
        F.col("n_bits").alias("n_a"),
    )
    enc_b = encoded.select(
        F.col(encoded.columns[0]).alias(id_b),
        F.col("clk").alias("_clk_b"),
        F.col("n_bits").alias("n_b"),
    )
    n_common = F.size(F.array_intersect("_clk_a", "_clk_b"))
    dice = F.when(
        F.col("n_a") + F.col("n_b") > 0,
        2.0 * n_common / (F.col("n_a") + F.col("n_b")),
    ).otherwise(F.lit(0.0))
    return (
        pairs.join(enc_a, id_a)
        .join(enc_b, id_b)
        .select(
            id_a,
            id_b,
            "n_a",
            "n_b",
            n_common.cast("long").alias("n_common"),
            dice.alias("dice"),
        )
        .where(F.col("dice") >= threshold)
    )


def clk_bit_audit(clks: DataFrame, m: int = 128) -> DataFrame:
    """Bit-frequency cryptanalysis audit of a CLK dataset — the
    precondition check of the classic frequency attack on PPRL Bloom
    filters (Christen, Ranbaduge & Schnell's attack family starts by
    mapping the most frequent BIT PATTERNS to the most frequent names):
    per bit position, how often is it set across all records?

    A hardened encoding wants near-uniform bit frequencies; sharp peaks
    are bits driven by frequent q-grams — exactly the attacker's
    foothold — and the χ² statistic against the uniform expectation
    summarizes how much frequency structure the dataset leaks. Never-set
    bits appear with n_set = 0 (the full 0..m−1 grid is emitted, not
    just observed bits).

    Output: one row per bit — (bit, n_set, freq = n_set/n_records,
    lift = n_set/expected) — with the dataset-level χ² repeated on each
    row (the 1-row-stat shape). Exact integers into the three divisions.
    """
    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    n_rec = clks.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    setc = (
        clks.select(F.explode("clk").alias("bit"))
        .groupBy("bit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_set"))
    )
    grid = clks.sparkSession.range(m).select(F.col("id").alias("bit"))
    full = (
        grid.join(setc, "bit", "left")
        .select("bit", F.coalesce("n_set", F.lit(0)).alias("n_set"))
    )
    tot = full.agg(F.sum("n_set").cast("long").alias("_tot"))
    base = (
        full.crossJoin(F.broadcast(n_rec))
        .crossJoin(F.broadcast(tot))
        .select(
            "bit",
            "n_set",
            (F.col("n_set") / F.col("_n")).alias("freq"),
            (F.col("n_set") * m / F.col("_tot")).alias("lift"),
            (
                (F.col("n_set") - F.col("_tot") / m)
                * (F.col("n_set") - F.col("_tot") / m)
                / (F.col("_tot") / m)
            ).alias("_chi"),
        )
    )
    chi = base.agg(F.sum("_chi").alias("chi2"))
    return base.drop("_chi").crossJoin(F.broadcast(chi))
