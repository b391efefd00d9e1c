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
