"""Blocking stage: records -> (record, block_key) pairs (SURVEY §7 stage 5;
north rule: anchor-dictionary blocking ∪ MinHash-LSH shingle keys, salted, with
per-block pair caps).

Two key generators:

- ``dictionary_blocks``: the normalized surface form itself is the block key
  (the reference's anchor-dictionary semantics — mentions sharing a normalized
  anchor are candidates, minimel/vectorize.py:117-122).
- ``minhash_blocks``: MinHash-LSH band keys over char-3gram shingles
  (minimel/clean.py:65-72 shingles). The minhash signature is computed entirely
  JVM-side: ``array_min(transform(shingles, s -> xxhash64(seed_i, s)))`` per
  hash function — no UDF, no shuffle; band key = hash of r consecutive minhashes.

Skew handling (north rule, SURVEY §4):

- ``cap_blocks`` bounds per-block pair counts: block sizes are counted first
  (one cheap agg), and any block whose C(n,2) exceeds ``max_pairs_per_block`` is
  sub-salted into ceil(n/target) deterministic sub-blocks via
  ``pmod(xxhash64(rec_id), n_salts)``. This trades recall inside mega-blocks
  (cross-salt pairs are lost) for a hard cost bound — the cap is deterministic
  and partition-invariant, as the north rule requires. Callers that must not
  lose recall can instead raise the cap and rely on AQE skew-join splitting.

``surface_blocked_pairs`` additionally REPAIRS the connectivity that salting
destroys (the mega-block fragmentation the r3 verdict flagged: cross-salt
pairs are lost, so transitive clustering splits a salted name block into
n_salts pieces): one deterministic representative record per (name, salt)
bucket is star-linked to the lowest bucket's representative, adding
n_salts - 1 extra pairs per mega-block — the C(n,2) -> cap cost bound is
preserved up to that additive sliver, while the downstream transitive
closure (the reference's ``cluster()`` semantics, minimel/clean.py:87-126)
again sees every same-name block as one connected candidate set, at
diameter 2 so connected-components convergence stays shallow.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from ..functions.udfs import shingles_udf


def dictionary_blocks(records: DataFrame, key_col: str = "anchor") -> DataFrame:
    """block_key = the normalized surface form (exact-key blocking)."""
    return records.withColumn("block_key", F.concat(F.lit("d:"), F.col(key_col)))


def token_blocks(
    records: DataFrame, name_col: str = "name", id_col: str = "rec_id"
) -> DataFrame:
    """Schema-agnostic TOKEN blocking (Papadakis et al., "Blocking and
    Filtering Techniques for Entity Resolution", CSUR 2020 §3.1): one block
    per lowercased word token, record ∈ block iff its name contains the
    token. Redundancy-positive — records sharing k tokens co-occur in k
    blocks — which is exactly the signal :func:`meta_blocking_pairs` weights.

    Output: distinct ``(block_key, id_col)``. Pure JVM (split + explode), one
    narrow stage; the distinct is per-record-local cardinality (a name's own
    repeated tokens), folded into the downstream shuffle.
    """
    return (
        records.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(name_col)), r"[^a-z0-9]+")).alias(
                "block_key"
            ),
        )
        .where(F.col("block_key") != "")
        .distinct()
    )


def phonetic_blocks(
    records: DataFrame, name_col: str = "name", id_col: str = "rec_id"
) -> DataFrame:
    """PHONETIC token blocking: one block per Soundex code of each word token
    (functions/phonetic.py — American Soundex as a pure JVM expression chain,
    mirrored verbatim in the DuckDB oracle). Catches spelling variants byte
    normalization can't ("Ashcraft"/"Ashcroft" → A261), at the cost of
    coarser blocks than :func:`token_blocks`; compose both via
    ``union_blocks`` for recall, then prune with ``meta_blocking_pairs``.

    Output: distinct ``(block_key, id_col)`` with key prefix ``p:``.
    """
    from ..functions.phonetic import soundex_col

    toks = records.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(name_col)), r"[^a-z]+")).alias("_tok"),
    ).where(F.col("_tok") != "")
    return (
        toks.select(
            F.col(id_col),
            F.concat(F.lit("p:"), soundex_col(F.col("_tok"))).alias("block_key"),
        )
        .where(F.col("block_key") != "p:")
        .distinct()
    )


def _seeded_hash(i: int, hash_family: str = "xx64"):
    # NB: a plain `lambda s, i=i:` would be mis-read by PySpark as a binary
    # (element, index) lambda — the seed must be closed over, not defaulted.
    if hash_family == "md5":
        # 60-bit md5-derived hash (first 15 hex chars): non-negative in a
        # signed long, and bit-for-bit reproducible in ANSI SQL as
        # ('0x' || substr(md5(i || ':' || s), 1, 15))::UBIGINT — the same
        # trick that made the simhash gate a full DuckDB value oracle
        # (VERDICT r4 #3). Still JVM-side (md5 + conv are codegen exprs).
        return lambda s: F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{i}:"), s)), 1, 15), 16, 10
        ).cast("long")
    if hash_family != "xx64":
        raise ValueError(f"hash_family must be 'xx64' or 'md5', got {hash_family!r}")
    return lambda s: F.xxhash64(F.lit(i), s)


def minhash_signature(
    shingles: Column, num_hashes: int, hash_family: str = "xx64"
) -> Column:
    """array<long> MinHash signature, all JVM-side expressions.

    ``hash_family``: "xx64" (xxhash64, fastest) or "md5" (md5-derived 60-bit
    values — ~same plan shape, DuckDB-recomputable for oracle checking)."""
    return F.array(
        *[
            F.array_min(F.transform(shingles, _seeded_hash(i, hash_family)))
            for i in range(num_hashes)
        ]
    )


def minhash_blocks(
    records: DataFrame,
    key_col: str = "anchor",
    num_hashes: int = 12,
    bands: int = 4,
) -> DataFrame:
    """LSH banding: emits one row per (record, band) with
    block_key = 'm:<band_idx>:<hash of the band's minhash slice>'.
    Records with no shingles (too short) produce no minhash blocks."""
    rows_per_band = num_hashes // bands
    assert bands * rows_per_band == num_hashes
    sh = records.withColumn("_sh", shingles_udf(F.col(key_col)))
    sh = sh.where(F.size("_sh") > 0)
    sig = sh.withColumn("_sig", minhash_signature(F.col("_sh"), num_hashes))
    band_keys = F.array(
        *[
            F.concat(
                F.lit(f"m:{b}:"),
                F.xxhash64(
                    F.slice(F.col("_sig"), b * rows_per_band + 1, rows_per_band)
                ).cast("string"),
            )
            for b in range(bands)
        ]
    )
    return (
        sig.withColumn("block_key", F.explode(band_keys))
        .drop("_sh", "_sig")
    )


def union_blocks(*blocked: DataFrame) -> DataFrame:
    """Union of block-key generators (same schema)."""
    out = blocked[0]
    for df in blocked[1:]:
        out = out.unionByName(df)
    return out


def _maybe_broadcast(df: DataFrame, use_broadcast: bool) -> DataFrame:
    """Forced broadcast hint, or the plain DataFrame (shuffle join; AQE may
    still choose broadcast from runtime stats) when the side is over budget."""
    return F.broadcast(df) if use_broadcast else df


def surface_blocked_pairs(
    records: DataFrame,
    key_col: str = "name",
    rec_id_col: str = "rec_id",
    num_hashes: int = 12,
    bands: int = 6,
    max_pairs_per_block: int = 10_000,
    max_broadcast_names: int | None = 5_000_000,
    persisted_out: list | None = None,
) -> DataFrame:
    """Candidate record pairs when every block key is a function of the
    surface form (true for anchor-dictionary + LSH-on-name blocking).

    Blocking runs at NAME level — the name dictionary is orders of magnitude
    smaller than the record stream (10^6-10^8 names vs 10^12 records at web
    scale), so band generation + the block self-join touch only the
    dictionary. Record pairs are then produced by bounded expansion:

    - SAME-NAME pairs: records salted per name into ceil(n/target) buckets
      (target = largest block size with C(n,2) <= cap) and equi-joined on
      (name, salt) — expansion is bounded BEFORE the join, and pairs are
      produced exactly once (no multi-band duplicate shuffle + dedupe).
      Salt buckets are then re-CONNECTED: one deterministic representative
      per (name, salt) bucket is star-linked to the lowest bucket's
      representative (n_salts - 1 extra pairs per salted name), so per-name
      pair cost stays bounded by ~ceil(n/target) * cap while the pair graph
      keeps every same-name block transitively connected at diameter 2 —
      capping bounds cost without fragmenting clusters or deepening the
      component graph.
    - CROSS-NAME pairs (names sharing an LSH band / dict key): the tiny
      name-pair table joins each side's records. Caps are computed PER NAME
      PAIR from the actual product n_a * n_b: under-cap pairs keep every
      record on both sides (so the produced pair set really is identical to
      the generic capped path on under-cap data), over-cap pairs shrink both
      sides proportionally (cap_side = floor(n_side * sqrt(cap / (n_a*n_b))))
      with a deterministic xxhash64 record ranking.

    Same contract as cap_blocks + candidate_pairs (deterministic,
    partition-invariant, per-block pair counts bounded by the cap); on
    under-cap data the produced pair SET is identical to the generic path.
    ``n_blocks`` = number of name-level keys proposing the pair (cross-name),
    or the number of shared keys for same-name pairs (bands + dictionary).

    The name-dictionary side tables are only broadcast-HINTED while the
    dictionary holds at most ``max_broadcast_names`` entries (one cheap count
    on the persisted name table); past the budget the joins degrade to
    shuffle joins instead of forcing a multi-GB broadcast (pass ``None`` to
    always hint). The name table is persisted either way — it feeds four
    separate subplans (bands, salting, sizes, ranking), so caching it avoids
    re-running the records groupBy per consumer. The cache must outlive the
    returned lazy plan, so it cannot be unpersisted here; pass
    ``persisted_out`` (a list) to receive it and unpersist once the
    downstream job has materialized (ADVICE r3: otherwise caches accumulate
    for the session across repeated pipeline invocations).
    """
    names = records.groupBy(key_col).agg(F.count(F.lit(1)).alias("_n_rec"))
    names = names.withColumn("_n_sh", F.size(shingles_udf(F.col(key_col)))).persist()
    if persisted_out is not None:
        persisted_out.append(names)
    use_bcast = (
        max_broadcast_names is None or names.count() <= max_broadcast_names
    )

    # --- name-level blocks: dictionary for shingle-less names, LSH bands else
    nb = union_blocks(
        dictionary_blocks(names.where(F.col("_n_sh") == 0), key_col=key_col),
        minhash_blocks(names, key_col=key_col, num_hashes=num_hashes, bands=bands),
    ).select(key_col, "_n_rec", "_n_sh", "block_key")

    # --- same-name pairs via per-name salting (bounded pre-join)
    target_n = max(2, int(math.floor((1 + math.isqrt(1 + 8 * max_pairs_per_block)) / 2)))
    multi = names.where(F.col("_n_rec") > 1).withColumn(
        "_nsalt", F.ceil(F.col("_n_rec") / target_n).cast("long")
    )
    # narrow (name, rec_id) base: `salted` is evaluated by three consumers
    # (each side of the self-join + the repair reps agg below); projecting
    # before the join guarantees no consumer ever drags wide record columns
    # (text!) through the probe. The recompute-per-consumer is deliberate —
    # at web scale this frame is records-sized, so caching it would cost
    # more than three narrow columnar scans.
    salted = records.select(key_col, rec_id_col).join(
        _maybe_broadcast(multi.select(key_col, "_nsalt", "_n_sh"), use_bcast), key_col
    ).withColumn("_salt", F.pmod(F.xxhash64(F.col(rec_id_col)), F.col("_nsalt")))
    sa = salted.select(
        F.col(key_col).alias("_k"),
        "_salt",
        "_n_sh",
        F.col(rec_id_col).alias("rec_id_a"),
    )
    sb = salted.select(
        F.col(key_col).alias("_k"), "_salt", F.col(rec_id_col).alias("rec_id_b")
    )
    same_pairs = (
        sa.join(sb, ["_k", "_salt"])
        .where(F.col("rec_id_a") < F.col("rec_id_b"))
        .select(
            "rec_id_a",
            "rec_id_b",
            # identical names share every name-level key: all bands, or the
            # dictionary key when too short to shingle
            F.when(F.col("_n_sh") > 0, F.lit(bands)).otherwise(F.lit(1)).alias("n_blocks"),
            # both surface forms are known at pair production — carrying them
            # saves downstream feature joins back to the record table
            F.col("_k").alias("name_a"),
            F.col("_k").alias("name_b"),
        )
    )

    # --- connectivity repair (VERDICT r3 #1): STAR-link one deterministic
    # representative per (name, salt) bucket to the lowest bucket's
    # representative — the representative is the total-order minimum of
    # (xxhash64(rec_id), rec_id), so it is partition-invariant, and the hub
    # window runs over the tiny (name, salt) table (<= ceil(n/target) rows
    # per name). A star (diameter 2) rather than a salt-order chain
    # (diameter n_salts): connected-components convergence rounds grow with
    # component diameter, so the star costs the same n_salts - 1 extra pairs
    # per mega-block but keeps the repaired graph shallow. Names that fit in
    # one salt bucket produce no repair pairs, so under-cap inputs are
    # byte-identical to the unrepaired output.
    reps = salted.groupBy(key_col, "_salt").agg(
        F.min(
            F.struct(
                F.xxhash64(F.col(rec_id_col)).alias("_h"),
                F.col(rec_id_col).alias("_r"),
            )
        )["_r"].alias("_rep"),
        F.max("_n_sh").alias("_n_sh"),
    )
    w_hub = Window.partitionBy(key_col)
    star_pairs = (
        reps.withColumn("_hub", F.min(F.struct("_salt", "_rep")).over(w_hub)["_rep"])
        .where(F.col("_rep") != F.col("_hub"))
        .select(
            F.least("_hub", "_rep").alias("rec_id_a"),
            F.greatest("_hub", "_rep").alias("rec_id_b"),
            F.when(F.col("_n_sh") > 0, F.lit(bands)).otherwise(F.lit(1)).alias("n_blocks"),
            F.col(key_col).alias("name_a"),
            F.col(key_col).alias("name_b"),
        )
    )
    same_pairs = same_pairs.unionByName(star_pairs)

    # --- cross-name pairs from the (tiny) name-level block self-join
    a = nb.select(F.col(key_col).alias("_na"), "block_key")
    b = nb.select(F.col(key_col).alias("_nb"), "block_key")
    name_pairs = (
        a.join(b, "block_key")
        .where(F.col("_na") < F.col("_nb"))
        .groupBy("_na", "_nb")
        .agg(F.count(F.lit(1)).alias("n_blocks"))
    )
    # per-PAIR caps from the actual block pair count n_a * n_b: under-cap
    # pairs keep all records on both sides; over-cap pairs shrink both sides
    # proportionally so cap_a * cap_b <= max_pairs_per_block
    sizes = names.select(key_col, "_n_rec")
    name_pairs = (
        name_pairs.join(
            _maybe_broadcast(
                sizes.select(F.col(key_col).alias("_na"), F.col("_n_rec").alias("_nra")),
                use_bcast,
            ),
            "_na",
        )
        .join(
            _maybe_broadcast(
                sizes.select(F.col(key_col).alias("_nb"), F.col("_n_rec").alias("_nrb")),
                use_bcast,
            ),
            "_nb",
        )
        .withColumn(
            "_r",
            F.sqrt(F.lit(float(max_pairs_per_block)) / (F.col("_nra") * F.col("_nrb"))),
        )
        # raw proportional caps, clamped to >= 1 so tiny sides survive
        .withColumn(
            "_ca0",
            F.greatest(F.floor(F.col("_nra") * F.col("_r")), F.lit(1)).cast("long"),
        )
        .withColumn(
            "_cb0",
            F.greatest(F.floor(F.col("_nrb") * F.col("_r")), F.lit(1)).cast("long"),
        )
        # the >=1 clamp can break cap_a*cap_b <= max_pairs_per_block on
        # asymmetric pairs (e.g. n_a=120, n_b=1, cap=50: floor(120*r)=77 with
        # the other side clamped to 1 -> 77 pairs). Re-derive each side
        # against the other so the product is bounded by the cap EXACTLY:
        # cap_a = min(ca0, floor(cap/cb0)) (>=1 because cb0 <= cap), then
        # cap_b = min(cb0, floor(cap/cap_a)). cap_a*cap_b <= cap by
        # construction, and under-cap pairs (_r >= 1) still keep every record.
        .withColumn(
            "_cap_a_c",
            F.least(
                F.col("_ca0"),
                F.greatest(
                    F.floor(F.lit(max_pairs_per_block) / F.col("_cb0")), F.lit(1)
                ),
            ).cast("long"),
        )
        .select(
            "_na",
            "_nb",
            "n_blocks",
            F.when(F.col("_r") >= 1, F.col("_nra"))
            .otherwise(F.col("_cap_a_c"))
            .cast("long")
            .alias("_cap_a"),
            F.when(F.col("_r") >= 1, F.col("_nrb"))
            .otherwise(
                F.least(
                    F.col("_cb0"),
                    F.floor(F.lit(max_pairs_per_block) / F.col("_cap_a_c")),
                )
            )
            .cast("long")
            .alias("_cap_b"),
        )
    )
    # each name's records are ranked once (deterministic hash order); the
    # per-pair caps filter at join time. No pre-cut join: computing a
    # per-name max-cap would re-evaluate the whole name-pair subplan (LSH
    # banding included) a second time for marginal probe-side savings —
    # under-cap pairs (the common case) keep every record anyway.
    w = Window.partitionBy(key_col).orderBy(F.xxhash64(F.col(rec_id_col)))
    capped = records.withColumn("_rn", F.row_number().over(w)).select(
        F.col(key_col).alias("_k"), F.col(rec_id_col).alias("_rid"), "_rn"
    )
    cross_pairs = (
        name_pairs.join(
            capped.select(
                F.col("_k").alias("_na"), F.col("_rid").alias("_rid_a"), F.col("_rn").alias("_rn_a")
            ),
            "_na",
        )
        .where(F.col("_rn_a") <= F.col("_cap_a"))
        .join(
            capped.select(
                F.col("_k").alias("_nb"), F.col("_rid").alias("_rid_b"), F.col("_rn").alias("_rn_b")
            ),
            "_nb",
        )
        .where(F.col("_rn_b") <= F.col("_cap_b"))
        .select(
            F.least("_rid_a", "_rid_b").alias("rec_id_a"),
            F.greatest("_rid_a", "_rid_b").alias("rec_id_b"),
            "n_blocks",
            F.when(F.col("_rid_a") <= F.col("_rid_b"), F.col("_na"))
            .otherwise(F.col("_nb"))
            .alias("name_a"),
            F.when(F.col("_rid_a") <= F.col("_rid_b"), F.col("_nb"))
            .otherwise(F.col("_na"))
            .alias("name_b"),
        )
    )
    return same_pairs.unionByName(cross_pairs)


def sorted_neighborhood_pairs(
    records: DataFrame,
    sort_key_col: str,
    window: int = 5,
    rec_id_col: str = "rec_id",
    num_partitions: int | None = None,
    persisted_out: list | None = None,
) -> DataFrame:
    """Sorted-neighborhood blocking (the classic ER alternative to key
    blocking): records are globally ordered by (sort_key, rec_id) and every
    pair within ``window`` positions becomes a candidate — robust to key
    typos that break exact blocking, with a hard O(n * window) pair bound.

    Returns (rec_id_a, rec_id_b, rank_a, rank_b) with rank_a < rank_b and
    rank_b - rank_a < window; rank is the 1-based global order statistic.

    Scale design — no global sort ever materializes on one node:
    - ``repartitionByRange`` on (sort_key, rec_id) gives range-ordered
      partitions; the global rank is local row_number + a broadcast
      per-partition offset (the exact_quantiles two-pass shape — one
      256-ish-row collect, not a SinglePartition exchange).
    - neighbor pairs come from an equi-join on bucket floor((rank-1)/window)
      where the higher-ranked side also probes its predecessor bucket: a
      qualifying pair lands in the same or adjacent buckets, and exactly
      one of the two emits matches, so no post-join dedup is needed.
    - the ranged frame is persisted because the offset table is derived
      from ITS materialized partitioning (a re-evaluation could legally
      re-sample range bounds); pass ``persisted_out`` to unpersist after
      the downstream job materializes (the surface_blocked_pairs contract).
    """
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    base = records.select(sort_key_col, rec_id_col)
    if num_partitions:
        ranged = base.repartitionByRange(
            num_partitions, F.col(sort_key_col), F.col(rec_id_col)
        )
    else:
        ranged = base.repartitionByRange(F.col(sort_key_col), F.col(rec_id_col))
    ranged = ranged.withColumn("_pid", F.spark_partition_id()).persist()
    if persisted_out is not None:
        persisted_out.append(ranged)
    sizes = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    spark = records.sparkSession
    offsets, acc = [], 0
    for pid in sorted(sizes):
        offsets.append((pid, acc))
        acc += sizes[pid]
    off_df = F.broadcast(
        spark.createDataFrame(offsets or [(0, 0)], "_pid int, _off long")
    )
    w_loc = Window.partitionBy("_pid").orderBy(sort_key_col, rec_id_col)
    ranked = (
        ranged.withColumn("_rn", F.row_number().over(w_loc))
        .join(off_df, "_pid")
        .select(
            F.col(rec_id_col).alias("_rid"),
            (F.col("_off") + F.col("_rn")).alias("_rank"),
        )
        .withColumn("_bk", F.floor((F.col("_rank") - 1) / window))
    )
    lo = ranked.select(
        F.col("_rid").alias("rec_id_a"), F.col("_rank").alias("rank_a"), "_bk"
    )
    hi = ranked.select(
        F.col("_rid").alias("rec_id_b"),
        F.col("_rank").alias("rank_b"),
        F.explode(F.array(F.col("_bk"), F.col("_bk") - 1)).alias("_bk"),
    )
    return (
        lo.join(hi, "_bk")
        .where(
            (F.col("rank_a") < F.col("rank_b"))
            & (F.col("rank_b") - F.col("rank_a") < window)
        )
        .select("rec_id_a", "rec_id_b", "rank_a", "rank_b")
    )


def cap_blocks(
    blocked: DataFrame,
    rec_id_col: str = "rec_id",
    max_pairs_per_block: int = 10_000,
) -> DataFrame:
    """Deterministic per-block pair cap via sub-salting (see module doc).

    One aggregation to size blocks, then a broadcast join of the (small)
    oversized-block list back onto the stream; in-cap blocks pass through with
    their key unchanged.
    """
    target_n = max(2, int(math.floor((1 + math.isqrt(1 + 8 * max_pairs_per_block)) / 2)))
    sizes = blocked.groupBy("block_key").agg(F.count(F.lit(1)).alias("_bn"))
    oversized = sizes.where(F.col("_bn") > target_n).withColumn(
        "_nsalt", F.ceil(F.col("_bn") / target_n).cast("long")
    )
    return (
        blocked.join(F.broadcast(oversized), "block_key", "left")
        .withColumn(
            "block_key",
            F.when(
                F.col("_nsalt").isNotNull(),
                F.concat(
                    F.col("block_key"),
                    F.lit("#"),
                    F.pmod(F.xxhash64(F.col(rec_id_col)), F.col("_nsalt")).cast("string"),
                ),
            ).otherwise(F.col("block_key")),
        )
        .drop("_bn", "_nsalt")
    )


def rare_token_canopies(
    records: DataFrame,
    name_col: str = "name",
    id_col: str = "rec_id",
    max_df: int | None = None,
) -> DataFrame:
    """Rare-token CANOPY assignment (the cheap-distance canopy idea of
    McCallum, Nigam & Ungar, KDD 2000, in its deterministic rare-token
    form used for author disambiguation): every record joins exactly ONE
    canopy — that of its globally rarest name token (minimum document
    frequency, ties to the lexicographically smallest token). Where
    :func:`token_blocks` is redundancy-positive (k tokens → k blocks,
    C(df,2) pairs each), the rare-token canopy is a PARTITION of the
    record set whose block sizes are bounded by the rarest-token df —
    the cheapest way to get near-linear comparison counts out of token
    evidence before any pair is scored.

    ``max_df`` drops stop tokens (df > max_df) BEFORE the argmin — the
    head of the Zipf curve never anchors a canopy, and a record whose
    every token is a stop token is excluded entirely (no canopy row).

    Scale: tokenize+explode is narrow; the df count is a map-side
    combinable groupBy over the token vocabulary (Zipf-headed, but the
    aggregate is tiny); the argmin is a bounded per-record window over
    that record's own ≤|tokens| rows. No pair is ever materialized here.
    Deterministic and parallelism-invariant: (df, token) is a total
    order per record.

    Output: one row per assigned record —
    ``(id_col, canopy_token, token_df)``.
    """
    toks = (
        records.select(
            F.col(id_col),
            F.explode(
                F.array_distinct(F.split(F.lower(F.col(name_col)), r"[^a-z0-9]+"))
            ).alias("token"),
        )
        .where(F.col("token") != "")
    )
    dfc = toks.groupBy("token").agg(F.count(F.lit(1)).alias("token_df"))
    if max_df is not None:
        dfc = dfc.where(F.col("token_df") <= max_df)
    w = Window.partitionBy(id_col).orderBy(F.asc("token_df"), F.asc("token"))
    return (
        toks.join(dfc, "token")
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(F.col(id_col), F.col("token").alias("canopy_token"), "token_df")
    )


def suffix_blocks(
    records: DataFrame,
    name_col: str = "name",
    id_col: str = "rec_id",
    min_len: int = 4,
    max_df: int | None = None,
) -> DataFrame:
    """Suffix-array blocking (Aizawa & Oyama 2005): one block per suffix
    of the normalized name with length ≥ ``min_len`` — so "catherine",
    "katherine", and "atherine" all co-occur in block "atherine" even
    though their PREFIXES disagree, the error pattern prefix and
    first-letter blocking are blind to (OCR noise, dropped honorifics,
    truncated first tokens). Redundancy-positive like
    :func:`token_blocks`: a length-L name lands in L − min_len + 1
    blocks.

    ``max_df`` drops suffix keys shared by more than ``max_df`` records
    (the "e"/"son"/"ing" stop-suffix head that would otherwise quadratic
    the pair count — the standard suffix-blocking guard; note a SHORT
    min_len makes that head fat, so the two knobs are tuned together).

    Scale: suffix expansion is a narrow JVM-side ``transform`` over
    ``sequence`` (no UDF) multiplying rows by ≈ avg_len − min_len; the
    df guard is one map-side-combinable groupBy; output feeds the same
    capped pair generator as every other blocker (cap_blocks still
    applies downstream for per-block budgets).

    Output: distinct ``(block_key, id_col)``.
    """
    if min_len < 1:
        raise ValueError(f"min_len must be >= 1, got {min_len}")
    norm = F.lower(F.regexp_replace(F.col(name_col), r"[^A-Za-z0-9]", ""))
    # NB: sequence(1, 0) DESCENDS in Spark, so names shorter than min_len
    # need an explicit empty-array branch, not a greatest() clamp.
    suffixes = F.expr(
        f"CASE WHEN length(_norm) >= {min_len} THEN "
        f"transform(sequence(1, length(_norm) - {min_len} + 1), "
        f"i -> substring(_norm, i)) "
        f"ELSE CAST(array() AS array<string>) END"
    )
    blocked = (
        records.withColumn("_norm", norm)
        .select(F.col(id_col), F.explode(suffixes).alias("block_key"))
        .distinct()
    )
    if max_df is not None:
        dfc = blocked.groupBy("block_key").agg(F.count(F.lit(1)).alias("_df"))
        blocked = (
            blocked.join(dfc.where(F.col("_df") <= max_df), "block_key")
            .drop("_df")
        )
    return blocked.select("block_key", id_col)


def adaptive_blocks(
    records: DataFrame,
    key_cols: list[str],
    max_block: int,
    id_col: str = "rec_id",
) -> DataFrame:
    """Dynamic (adaptive) blocking — the hierarchical key-refinement
    strategy of Bilenko, Kamath & Mooney (ICDM 2006), run in production
    at LinkedIn scale (McNeill/Kardes/Borthwick's "Dynamic Blocking"):
    block on a COARSE key first; any block bigger than ``max_block`` is
    re-keyed by appending the next attribute, recursively, so dense
    regions of the key space get fine keys while sparse regions keep
    cheap coarse ones. The last level emits unconditionally (a hard cap
    beyond the key list is :func:`cap_blocks`' job downstream).

    Deterministic and parallelism-invariant: membership depends only on
    attribute values and block counts. Each level costs one
    map-side-combinable size count plus one broadcast-or-shuffle join of
    the survivors against that (tiny, one-row-per-block) size table —
    with L key columns, at most L passes over a monotonically SHRINKING
    remainder, the scale story that makes this the standard skew answer
    when salting would break semantic key boundaries.

    Output: ``(block_key, id_col, level)`` — ``block_key`` is
    ``"<level>:<v0>|<v1>|..."`` (level-prefixed so keys from different
    refinement depths can never collide), one row per record.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if max_block < 1:
        raise ValueError(f"max_block must be >= 1, got {max_block}")
    remaining = records.select(
        F.col(id_col),
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("<null>")).alias(f"_k{i}")
            for i, c in enumerate(key_cols)
        ],
    )
    emitted = []
    for lvl in range(len(key_cols)):
        keys = [f"_k{i}" for i in range(lvl + 1)]
        key_expr = F.concat_ws("|", *[F.col(k) for k in keys])
        sizes = remaining.groupBy(*keys).agg(F.count(F.lit(1)).alias("_n"))
        tagged = remaining.join(sizes, keys)
        label = F.concat(F.lit(f"{lvl}:"), key_expr).alias("block_key")
        last = lvl == len(key_cols) - 1
        fits = tagged if last else tagged.where(F.col("_n") <= max_block)
        emitted.append(
            fits.select(label, F.col(id_col), F.lit(lvl).alias("level"))
        )
        if last:
            break
        remaining = tagged.where(F.col("_n") > max_block).drop("_n")
    out = emitted[0]
    for e in emitted[1:]:
        out = out.unionByName(e)
    return out
