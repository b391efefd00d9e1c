"""Candidate-pair generation + pairwise feature scoring (SURVEY §2.3 note, §7
stage 6; north star: Jaro-Winkler + Levenshtein + hashed-BoW-cosine features).

Pair generation is the within-block self-join the reference never had (its
cluster() walks a dict): ``blocked.a JOIN blocked.b ON block_key WHERE a < b``,
deduplicated across block generators with a groupBy on the pair key. The join
shuffles on ``block_key``; cap_blocks has already bounded per-key fan-out, and
AQE skew-join covers residual imbalance.

Feature computation is O(records + distinct-name-pairs), not O(pairs):

- name-level features (``lev_sim``, ``jacc3``, ``jw``) are computed ONCE per
  distinct (name_a, name_b) combination and joined back — within-block pairs
  overwhelmingly repeat the same few surface-form combinations, so this turns
  millions of per-pair UDF calls into thousands. ``lev_sim`` is the Spark
  built-in ``levenshtein`` and ``jacc3`` is array_intersect/array_union (both
  JVM whole-stage codegen); only Jaro-Winkler is a (tiny) pandas UDF.
- ``cos_bow`` (hashed bag-of-words cosine over each record's context, the
  reference hashvec cousin, minimel/vectorize.py:170-181) precomputes one
  sparse map<int,double> + L2 norm PER RECORD in an Arrow-batched pandas UDF,
  then evaluates the pair dot product JVM-side with ``aggregate`` over
  ``map_keys`` — zero Python in the per-pair hot path.
"""

from __future__ import annotations

import os
import zlib

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, Window

from ..functions.normalize import vw_tok
from ..functions.similarity import jaro_winkler
from ..functions.udfs import shingles_udf

BOW_DIM = 1 << 18

# cos_bow broadcast budget (r6, guide §8 "decide with small rows"): when the
# per-record vector/bow payload fits this budget, the pair dot product is
# computed by a vectorized Arrow UDF over ONLY the two 8-byte id columns
# against a broadcast numpy table — no join of the (much larger) pair table
# at all. Past the budget (billions of records on a real cluster) the join
# path runs unchanged. Parameterised via env for deployments; 128 MiB is the
# same dimension-table magnitude as the session's autoBroadcastJoinThreshold.
DEFAULT_VEC_BCAST_BYTES = int(
    os.environ.get("MINIMEL_VEC_BCAST_BYTES", str(128 << 20))
)

# dense_bow_dim="auto" knobs: the dense hashed cosine pays off once the
# sparse per-record map payload (~16-20 B per distinct token, shuffled onto
# BOTH sides of every pair) outweighs the constant 8*dim-byte dense array.
# Measured on sf0.1 (r3): dim 64 = 1.7x feature-stage speedup on ~100-token
# contexts, dim 256 = a LOSS (2 KB arrays beat by sparse maps) — so auto
# selects dim 64 with a crossover at ~32 avg tokens/record (~= 512 B sparse
# vs 512 B dense payload, before map overhead tips it).
AUTO_DENSE_DIM = 64
AUTO_DENSE_MIN_TOKENS = 32.0


@F.pandas_udf(T.DoubleType())
def jw_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([jaro_winkler(x or "", y or "") for x, y in zip(a, b)])


@F.pandas_udf(T.MapType(T.IntegerType(), T.DoubleType()))
def bow_udf(texts: pd.Series) -> pd.Series:
    """Hashed bag-of-words (crc32 % 2^18 over vw_tok tokens) as a sparse map."""
    out = []
    for t in texts:
        v: dict[int, float] = {}
        for tok in vw_tok(t or ""):
            h = zlib.crc32(tok.encode("utf-8")) % BOW_DIM
            v[h] = v.get(h, 0.0) + 1.0
        out.append(v)
    return pd.Series(out)


def _dense_bow_udf(dim: int):
    """Dense variant of ``bow_udf``: crc32 % dim counts as a fixed-size
    L2-normalized array. Same tokenization, coarser hash space — the
    100-TB-scale trade: per-record payload is a constant 8*dim bytes
    (vs ~16 B per distinct token) and the pair dot product becomes an O(dim)
    ``zip_with`` instead of O(|a|*|b|) map probing."""

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def dense(texts: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for t in texts:
            v = np.zeros(dim)
            for tok in vw_tok(t or ""):
                v[zlib.crc32(tok.encode("utf-8")) % dim] += 1.0
            n = float(np.sqrt((v * v).sum()))
            out.append((v / n).tolist() if n else v.tolist())
        return pd.Series(out)

    return dense


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


def name_pair_features(name_pairs: DataFrame) -> DataFrame:
    """(name_a, name_b) -> + lev_sim, jacc3, jw. Input should be distinct."""
    df = name_pairs.withColumn("_sh_a", shingles_udf("name_a")).withColumn(
        "_sh_b", shingles_udf("name_b")
    )
    maxlen = F.greatest(F.length("name_a"), F.length("name_b"))
    return (
        df.withColumn(
            "lev_sim",
            F.when(maxlen == 0, F.lit(1.0)).otherwise(
                1.0 - F.levenshtein("name_a", "name_b") / maxlen
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
        .withColumn("jw", jw_udf("name_a", "name_b"))
        .drop("_sh_a", "_sh_b")
    )


def record_bow(
    records: DataFrame, rec_id_col: str = "rec_id", text_col: str = "text"
) -> DataFrame:
    """(rec_id) -> (rec_id, bow map<int,double>, bow_norm): one UDF pass per
    record; norms JVM-side."""
    return records.select(
        F.col(rec_id_col).alias("_rid"), bow_udf(F.col(text_col)).alias("bow")
    ).withColumn(
        "bow_norm",
        F.sqrt(
            F.aggregate(F.map_values("bow"), F.lit(0.0), lambda acc, x: acc + x * x)
        ),
    )


def _pair_cosine(bow_a, bow_b, norm_a, norm_b):
    """JVM sparse-dot (the past-broadcast-budget fallback): left fold over
    side a's entries, look up side b. ``map_entries`` iteration (r6) reads
    each (key, value) of a directly instead of re-probing a's own map per
    key — the old ``element_at(bow_a, k)`` was an O(|a|) linear scan per
    element, making the fold O(|a|² + |a|·|b|); this is O(|a|·|b|) with
    bit-identical values (same keys, same order, same adds)."""
    dot = F.aggregate(
        F.map_entries(bow_a),
        F.lit(0.0),
        lambda acc, e: acc
        + e["value"] * F.coalesce(F.element_at(bow_b, e["key"]), F.lit(0.0)),
    )
    return F.when((norm_a == 0.0) | (norm_b == 0.0), F.lit(0.0)).otherwise(
        dot / (norm_a * norm_b)
    )


def _dense_cos_bcast_udf(spark, ids, rows, mat):
    """cos_bow over a broadcast dense L2-normalized matrix: the Arrow UDF
    sees ONLY the two id columns (guide §4.1/§8 — the heavy per-pair payload
    never enters the pair stream), gathers both rows and accumulates the
    dot with a strict left fold over the dim axis — the same add order as
    the join path's ``aggregate(zip_with(...))``, so the two paths are
    bit-identical. ``rows[i]`` maps ``ids[i]`` to its row of ``mat`` — an
    identity when vectors were built per record, an indirection into the
    (much smaller) distinct-text matrix when texts repeat across records
    (r6: mention-style corpora share one paragraph text across dozens of
    records, so the vector table needs one row per TEXT, not per record).
    The id -> row lookup is a ``pd.Index`` built ONCE per
    Python worker and probed with the vectorized ``get_indexer`` (guide
    §4.5 — heavyweight init amortized across batches; a per-batch
    ``Series.map(dict)`` rebuilds the hashtable every call). Pairs whose id
    is absent from the record table come back NaN and are dropped by the
    caller (inner-join semantics)."""
    import numpy as np

    bc = spark.sparkContext.broadcast((ids, rows, mat))
    state: dict = {}

    @F.pandas_udf(T.DoubleType())
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        if "ix" not in state:
            ids_, rows_, m_ = bc.value
            state["ix"] = pd.Index(ids_)
            state["rows"] = rows_
            state["m"] = m_
        ix, rows_, m = state["ix"], state["rows"], state["m"]
        ia = ix.get_indexer(a)  # -1 = missing
        ib = ix.get_indexer(b)
        ok = (ia >= 0) & (ib >= 0)
        out = np.full(len(ia), np.nan)
        if ok.any():
            prod = m[rows_[ia[ok]]] * m[rows_[ib[ok]]]
            acc = np.zeros(prod.shape[0])
            for j in range(prod.shape[1]):  # strict left fold == JVM order
                acc += prod[:, j]
            out[ok] = acc
        return pd.Series(out)

    return cos


def _sparse_cos_bcast_udf(spark, ids, rows, keys, vals, counts, norms):
    """cos_bow over a broadcast sparse bow table (flattened CSR-style
    arrays, entries in each record's bow insertion order). Per batch: gather
    side a's entry ranges, look up side b via one vectorized searchsorted on
    a (record, key)-combined sorted array, multiply, and reduce per pair.
    Missing b keys contribute exactly 0.0 (as in the JVM fold, where adding
    0.0 to a non-negative running sum is an IEEE no-op), so the sum runs
    over the same effective addend sequence as the JVM path; the per-pair
    reduction is ``np.add.reduceat`` (sequential within a segment). Pairs
    with an id absent from the record table come back NaN and are dropped
    by the caller (inner-join semantics). ``rows[i]`` maps ``ids[i]`` to its
    CSR row — identity for per-record bows, an indirection into the
    distinct-text CSR when texts repeat across records (r6)."""
    import numpy as np

    n = len(counts)
    off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=off[1:])
    seg = np.repeat(np.arange(n, dtype=np.int64), counts)
    combined = (seg << 18) | keys  # keys < BOW_DIM = 2^18
    order = np.argsort(combined, kind="stable")
    sorted_combined = combined[order]
    sorted_vals = vals[order]
    bc = spark.sparkContext.broadcast(
        (ids, rows, keys, vals, off, norms, sorted_combined, sorted_vals)
    )
    state: dict = {}

    @F.pandas_udf(T.DoubleType())
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        if "ix" not in state:  # once per worker (guide §4.5)
            v = bc.value
            state["ix"] = pd.Index(v[0])
            state["rows"] = v[1]
            state["rest"] = v[2:]
        ix = state["ix"]
        rows_ = state["rows"]
        keys, vals, off, norms, s_comb, s_vals = state["rest"]
        ia = ix.get_indexer(a)  # -1 = missing
        ib = ix.get_indexer(b)
        ok = (ia >= 0) & (ib >= 0)
        out = np.full(len(ia), np.nan)
        if not ok.any():
            return pd.Series(out)
        ia_i = rows_[ia[ok]]
        ib_i = rows_[ib[ok]]
        starts = off[ia_i]
        cnts = off[ia_i + 1] - starts
        total = int(cnts.sum())
        dots = np.zeros(len(ia_i))
        if total:
            cum = np.cumsum(cnts) - cnts  # segment starts in the gather
            pos = np.arange(total, dtype=np.int64) + np.repeat(starts - cum, cnts)
            ak = keys[pos]
            av = vals[pos]
            target = (np.repeat(ib_i, cnts) << 18) | ak
            p = np.searchsorted(s_comb, target)
            p_cl = np.minimum(p, len(s_comb) - 1)
            bv = np.where(s_comb[p_cl] == target, s_vals[p_cl], 0.0)
            prod = av * bv
            nz = cnts > 0
            dots[nz] = np.add.reduceat(prod, cum[nz])
        na = norms[ia_i]
        nb = norms[ib_i]
        res = np.where((na == 0.0) | (nb == 0.0), 0.0, dots / np.where(na * nb == 0.0, 1.0, na * nb))
        out[ok] = res
        return pd.Series(out)

    return cos


def resolve_dense_bow_dim(
    records: DataFrame,
    dense_bow_dim: int | str | None,
    text_col: str | None = "text",
) -> int | None:
    """Validate the ``dense_bow_dim`` knob and resolve ``"auto"`` to a
    concrete dim (or None) from the measured avg-tokens crossover. The
    "auto" path runs one eager aggregation over ``records`` — callers that
    score repeatedly over the same records should call this once and pass
    the resolved value to every ``pair_features`` invocation."""
    if not (
        dense_bow_dim is None
        or dense_bow_dim == "auto"
        or (isinstance(dense_bow_dim, int) and not isinstance(dense_bow_dim, bool)
            and dense_bow_dim > 0)
    ):
        raise ValueError(
            f"dense_bow_dim must be None, 'auto', or a positive int, got "
            f"{dense_bow_dim!r}"
        )
    if dense_bow_dim != "auto":
        return dense_bow_dim
    if not text_col:
        return None
    avg_toks = (
        records.agg(
            F.avg(
                F.size(
                    F.split(
                        F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\W+"
                    )
                )
            )
        ).first()[0]
        or 0.0
    )
    return AUTO_DENSE_DIM if avg_toks >= AUTO_DENSE_MIN_TOKENS else None


def pair_features(
    pairs: DataFrame,
    records: DataFrame,
    rec_id_col: str = "rec_id",
    name_col: str = "name",
    text_col: str | None = "text",
    max_broadcast_name_pairs: int | None = 5_000_000,
    dense_bow_dim: int | str | None = None,
    persisted_out: list | None = None,
    max_broadcast_vec_bytes: int | None = DEFAULT_VEC_BCAST_BYTES,
) -> DataFrame:
    """Attach per-side names/contexts and compute the feature columns.

    Output: (rec_id_a, rec_id_b, n_blocks, name_a, name_b,
             lev_sim, jacc3, jw, cos_bow).

    The distinct name-pair feature table is persisted when ``persisted_out``
    is passed (its subplan contains the whole pair-generation join — never
    evaluate that twice on the hot path; without a receiver nothing is
    pinned, so repeated no-receiver calls cannot leak caches) and only
    broadcast-HINTED while it holds at most ``max_broadcast_name_pairs``
    rows; past the budget (LSH-banded cross-name pairs at web scale) the
    join back degrades to a shuffle join instead of a forced multi-GB
    broadcast. ``None`` always hints.

    ``dense_bow_dim`` switches ``cos_bow`` from the exact sparse form
    (crc32 % 2^18 maps, O(|a|*|b|) per-pair map probing) to a dense hashed
    approximation at that dimension: constant 8*dim-byte payloads through
    the pair shuffle and an O(dim) ``zip_with`` dot — the knob to reach for
    when the feature join's shuffle volume, not compute, bounds throughput
    (long contexts, 10^9+ pairs). Default None keeps the exact semantics.
    ``"auto"`` decides from the data: one cheap JVM agg estimates avg
    tokens/record and picks dim ``AUTO_DENSE_DIM`` when it exceeds
    ``AUTO_DENSE_MIN_TOKENS`` (the measured payload crossover — see the
    constants above), else stays exact. NB "auto" runs that estimation scan
    EAGERLY at plan-construction time on every call — callers invoking
    pair_features repeatedly over the same records (sweeps, benchmarks)
    should resolve the knob once and pass the explicit dim (ADVICE r4).

    ``max_broadcast_vec_bytes``: while the per-record cos payload fits this
    budget (dense: the exactly-known rows * dim * 8 B; sparse: a conservative
    token-count estimate from one JVM agg), ``cos_bow`` is computed by a
    vectorized Arrow UDF over ONLY the two id columns against a broadcast
    numpy table — the per-pair vector/bow joins (and the interpreted
    higher-order-function dot, the r5 bottleneck: per-pair ``zip_with`` +
    ``aggregate`` folds, and the sparse path's O(|a|·|b|) ``element_at``
    map probes) disappear from the plan entirely (guide §4.2/§8: decide
    with small rows, keep the heavy payload out of the pair stream). Past
    the budget — billions of records on a real cluster — the join path runs
    as before. The dense broadcast path is bit-identical to the join path
    (same fold order); the sparse broadcast path agrees to float
    associativity (same addend sequence, ``np.add.reduceat`` reduction).
    ``None`` disables the broadcast path outright; the default is the
    ``MINIMEL_VEC_BCAST_BYTES`` env knob (128 MiB). Records are assumed to
    carry unique ``rec_id_col`` values (both paths: the join path would
    multiply pair rows on duplicate ids, the broadcast path keeps one).
    """
    dense_bow_dim = resolve_dense_bow_dim(records, dense_bow_dim, text_col)
    if persisted_out is not None:
        # the pair stream feeds TWO subplans (the distinct name-pair branch
        # and the output rows); without a cache the whole pair-generation
        # join runs once per branch (r6 — measured one full extra pass per
        # segment at sf0.1). MEMORY_AND_DISK, caller-owned lifecycle, same
        # contract as the other caches here.
        pairs = pairs.persist()
        persisted_out.append(pairs)
    if "name_a" in pairs.columns and "name_b" in pairs.columns:
        # pair generator already carried both surface forms (the
        # surface_blocked_pairs path) — no joins back to the record table
        df = pairs
    else:
        ids = records.select(
            F.col(rec_id_col).alias("_rid"), F.col(name_col).alias("_name")
        )
        df = (
            pairs.join(
                ids.select(F.col("_rid").alias("rec_id_a"), F.col("_name").alias("name_a")),
                "rec_id_a",
            )
            .join(
                ids.select(F.col("_rid").alias("rec_id_b"), F.col("_name").alias("name_b")),
                "rec_id_b",
            )
        )
    # name-level features once per distinct surface-form pair, joined back.
    # Caches feed the returned lazy plan, so they are persisted ONLY when the
    # caller passes ``persisted_out`` to own the unpersist-after-materialize
    # lifecycle (ADVICE r3); with no receiver nothing is pinned (a persist
    # with no owner would leak executor memory for the session — the same
    # contract as minhash_dups/ngram_jaccard_dups).
    distinct_names = df.select("name_a", "name_b").distinct()
    if persisted_out is not None:
        distinct_names = distinct_names.persist()
        persisted_out.append(distinct_names)
    name_feats = name_pair_features(distinct_names)
    if max_broadcast_name_pairs is None or (
        distinct_names.count() <= max_broadcast_name_pairs
    ):
        name_feats = F.broadcast(name_feats)
    df = df.join(name_feats, ["name_a", "name_b"])
    if text_col and max_broadcast_vec_bytes is not None:
        # budget gate sizing (one shuffle-free agg): the dense payload is
        # rows * dim * 8 B; the sparse bow payload is bounded by a
        # conservative token-count estimate (the tokenizing sum only runs on
        # the sparse path, where the bow UDF pass dwarfs it anyway). r6 also
        # estimates the DISTINCT-text count (HLL ±2%): mention-style corpora
        # attach one paragraph text to dozens of records, so the vector/bow
        # table only needs one row per distinct text plus an 16 B/record
        # id -> row map — 10-100x less Python tokenize work, driver pull and
        # broadcast than the per-record build, and corpora whose per-record
        # payload overflows the budget (the bench's sparse segment) come
        # BACK under it. All three builds (per-record, distinct-text,
        # join fallback) produce bit-identical cos_bow, so the choice is
        # purely a cost decision.
        aggs = [
            F.count(F.lit(1)).alias("_n"),
            F.approx_count_distinct(text_col, 0.02).alias("_nd"),
        ]
        if not dense_bow_dim:
            aggs.append(
                F.coalesce(
                    F.sum(
                        F.size(
                            F.split(
                                F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                                r"\W+",
                            )
                        )
                    ),
                    F.lit(0),
                ).alias("_toks")
            )
        stats = records.agg(*aggs).first()
        n_rec = stats["_n"]
        # +1: approx_count_distinct ignores nulls; null text is its own group
        n_text = min(n_rec, int(stats["_nd"] * 1.05) + 1)  # HLL slack
        n_toks = 0 if dense_bow_dim else stats["_toks"]
        # distinct-text payload: the map costs 16 B/record; tokens scale by
        # the distinct ratio (texts are dup-heavy or they are not — a 1.1
        # slack absorbs skewed duplication toward short texts)
        ratio = n_text / max(1, n_rec)
        if dense_bow_dim:
            per_rec_bytes = n_rec * dense_bow_dim * 8
            dedup_bytes = n_text * dense_bow_dim * 8 + n_rec * 16
        else:
            per_rec_bytes = n_rec * 32 + n_toks * 16
            dedup_bytes = (
                n_text * 32 + int(n_toks * ratio * 1.1) * 16 + n_rec * 16
            )
        # dedupe when texts repeat enough to pay for the groupBy (partial
        # aggregation shrinks its shuffle to ~distinct texts/partition), or
        # when only the deduped table fits the broadcast budget at all;
        # MINIMEL_VEC_DEDUP_TEXTS=0 pins the r5-shaped per-record build
        dedup_texts = (
            os.environ.get("MINIMEL_VEC_DEDUP_TEXTS", "1") != "0"
            and dedup_bytes <= max_broadcast_vec_bytes
            and (n_text <= 0.7 * n_rec or per_rec_bytes > max_broadcast_vec_bytes)
        )
        use_bcast = dedup_texts or per_rec_bytes <= max_broadcast_vec_bytes
        spark = records.sparkSession
        if use_bcast:
            import numpy as np

            if dedup_texts:
                # exact id -> distinct-text mapping: group on the coalesced
                # text (the bow/vec UDFs treat null as "", so folding null
                # into "" is value-preserving), one representative id per
                # text, and a broadcast join back for the (record, text) map
                rt = records.select(
                    F.col(rec_id_col).alias("_rid"),
                    F.coalesce(F.col(text_col), F.lit("")).alias("_t"),
                )
                g = rt.groupBy("_t").agg(F.min("_rid").alias("_tid")).persist()
                map_pdf = (
                    rt.join(F.broadcast(g), "_t").select("_rid", "_tid").toPandas()
                )
                vec_src = g.select(F.col("_tid").alias("_rid"), F.col("_t"))
            else:
                map_pdf = None
                vec_src = records.select(
                    F.col(rec_id_col).alias("_rid"), F.col(text_col).alias("_t")
                )
            if dense_bow_dim:
                pdf = vec_src.select(
                    "_rid", _dense_bow_udf(dense_bow_dim)(F.col("_t")).alias("_v")
                ).toPandas()
                mat = (
                    np.array(pdf["_v"].tolist(), dtype=np.float64)
                    if len(pdf)
                    else np.empty((0, dense_bow_dim))
                )
            else:
                pdf = record_bow(vec_src, "_rid", "_t").select(
                    "_rid",
                    F.map_keys("bow").alias("_k"),
                    F.map_values("bow").alias("_w"),
                    "bow_norm",
                ).toPandas()
            if dedup_texts:
                g.unpersist()  # both consumers materialized eagerly above
                row_of = pd.Index(pdf["_rid"]).get_indexer(map_pdf["_tid"])
                ids = map_pdf["_rid"].tolist()
                rows = row_of.astype(np.int64)
            else:
                ids = pdf["_rid"].tolist()
                rows = np.arange(len(pdf), dtype=np.int64)
            if dense_bow_dim:
                cos = _dense_cos_bcast_udf(
                    spark, ids, rows, mat
                ).asNondeterministic()  # guide §4.4: the isnan filter below
                # must not duplicate the Arrow evaluation via filter pushdown
            else:
                n = len(pdf)
                counts = np.fromiter(
                    (len(k) for k in pdf["_k"]), dtype=np.int64, count=n
                )
                keys = (
                    np.concatenate(pdf["_k"].to_list()).astype(np.int64)
                    if counts.sum()
                    else np.empty(0, dtype=np.int64)
                )
                vals = (
                    np.concatenate(pdf["_w"].to_list()).astype(np.float64)
                    if counts.sum()
                    else np.empty(0, dtype=np.float64)
                )
                cos = _sparse_cos_bcast_udf(
                    spark,
                    ids,
                    rows,
                    keys,
                    vals,
                    counts,
                    pdf["bow_norm"].to_numpy(dtype=np.float64),
                ).asNondeterministic()  # see the dense path note
            return (
                df.withColumn("cos_bow", cos(F.col("rec_id_a"), F.col("rec_id_b")))
                .where(~F.isnan("cos_bow"))  # inner-join semantics: drop
                # pairs referencing ids absent from the record table
                .select(
                    "rec_id_a", "rec_id_b", "n_blocks", "name_a", "name_b",
                    "lev_sim", "jacc3", "jw", "cos_bow",
                )
            )
    if text_col and dense_bow_dim:
        # persisted (receiver-owned): the vector table feeds BOTH join sides
        # — without the cache the per-record embedding UDF runs twice over
        # all records, so callers on the hot path should pass persisted_out
        vecs = records.select(
            F.col(rec_id_col).alias("_rid"),
            _dense_bow_udf(dense_bow_dim)(F.col(text_col)).alias("_v"),
        )
        if persisted_out is not None:
            vecs = vecs.persist()
            persisted_out.append(vecs)
        # past-budget (or broadcast-disabled) fallback: both joins stay
        # shuffle joins and the dot is the exact JVM fold — unchanged r5
        # semantics for corpora whose vector table cannot be broadcast
        va = vecs.select(F.col("_rid").alias("rec_id_a"), F.col("_v").alias("_va"))
        vb = vecs.select(F.col("_rid").alias("rec_id_b"), F.col("_v").alias("_vb"))
        df = (
            df.join(va, "rec_id_a")
            .join(vb, "rec_id_b")
            .withColumn(
                "cos_bow",
                F.aggregate(
                    F.zip_with("_va", "_vb", lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
            )
            .drop("_va", "_vb")
        )
    elif text_col:
        # persisted (receiver-owned) for the same two-consumer reason as the
        # dense path; the sparse maps' byte size is data-dependent (no cheap
        # exact bound), so these joins are never force-broadcast
        bows = record_bow(records, rec_id_col, text_col)
        if persisted_out is not None:
            bows = bows.persist()
            persisted_out.append(bows)
        df = (
            df.join(
                bows.select(
                    F.col("_rid").alias("rec_id_a"),
                    F.col("bow").alias("_bow_a"),
                    F.col("bow_norm").alias("_norm_a"),
                ),
                "rec_id_a",
            )
            .join(
                bows.select(
                    F.col("_rid").alias("rec_id_b"),
                    F.col("bow").alias("_bow_b"),
                    F.col("bow_norm").alias("_norm_b"),
                ),
                "rec_id_b",
            )
            .withColumn(
                "cos_bow",
                _pair_cosine(
                    F.col("_bow_a"), F.col("_bow_b"), F.col("_norm_a"), F.col("_norm_b")
                ),
            )
            .drop("_bow_a", "_bow_b", "_norm_a", "_norm_b")
        )
    else:
        df = df.withColumn("cos_bow", F.lit(0.0))
    return df.select(
        "rec_id_a",
        "rec_id_b",
        "n_blocks",
        "name_a",
        "name_b",
        "lev_sim",
        "jacc3",
        "jw",
        "cos_bow",
    )


def edit_distance_join(
    records: DataFrame,
    k: int = 2,
    q: int = 2,
    name_col: str = "name",
    id_col: str = "rec_id",
    persisted_out: list | None = None,
) -> DataFrame:
    """Exact edit-distance similarity self-join: all pairs with
    ``levenshtein(a, b) <= k``, via the LOSSLESS q-gram count filter
    (Gravano et al., "Approximate String Joins in a Database (Almost) for
    Free", VLDB 2001) — the edit-distance sibling of
    ``dedup.prefix_jaccard_dups``'s set-similarity prefix filter.

    Candidate generation, all JVM-side:

    - **length filter**: ``| |a| - |b| | <= k`` (each edit changes length by
      at most 1);
    - **count filter**: one edit destroys at most ``q`` of a string's
      overlapping q-grams, so ``ed(a,b) <= k`` implies the pair shares at
      least ``max(|a|,|b|) - q + 1 - k*q`` q-grams counted WITH multiplicity
      (multiset intersection = Σ_g min(count_a(g), count_b(g))). Pairs are
      generated by a posting-list join on the gram, one groupBy computes the
      multiset intersection, and the bound prunes the stream;
    - **short stratum**: when ``max(|a|,|b|) < q*(k+1)`` the bound is <= 0 —
      the lemma guarantees nothing — so strings shorter than ``q*(k+1)``
      additionally do an all-pairs pass among themselves (both sides of any
      missed pair are provably in the stratum: a partner of a string shorter
      than q is itself shorter than q*(k+1)). The stratum is all-pairs over
      DISTINCT short strings — bounded by construction (|Σ|^(q(k+1)) values
      at most; in practice a sliver) and worth it for losslessness.

    Every similarity stage runs over DISTINCT names; record pairs are
    expanded from the verified name pairs at the end (plus the same-name
    record groups at distance 0, which any exact join must emit), so
    duplicate-heavy corpora pay quadratic cost only where the OUTPUT is
    quadratic. Verification is the built-in ``levenshtein`` (whole-stage
    codegen). Output: ``(rec_id_a, rec_id_b, distance)`` with
    ``rec_id_a < rec_id_b``.

    Scale notes: the posting join is the standard q-gram method — hot grams
    dominate its fan-out exactly like hot shingles in ``ngram_jaccard_dups``;
    the count filter prunes AFTER the join, so corpora with heavy gram skew
    should pre-segment (PassJoin-style positional pigeonholing is the
    documented upgrade path, same join shape with (segment, position-band)
    keys). Everything is keyed shuffles + one codegen'd verify — no UDF, no
    driver state.
    """
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    if q < 1:
        raise ValueError(f"q must be >= 1, got {q}")
    names = records.select(
        F.col(id_col).alias("rid"), F.col(name_col).alias("nm")
    )
    # ALL similarity work runs over DISTINCT names — duplicate-heavy
    # corpora (many records sharing one name) pay the quadratic cost only
    # in the final expansion, which is output-sized by definition
    dn = names.select("nm").distinct().withColumn("ln", F.length("nm"))
    short_cut = q * (k + 1)

    # posting-list join over multiset gram counts (strings with >= 1 gram);
    # the positional slice needs expr() — F.substring takes literal positions
    grams = (
        dn.where(F.col("ln") >= q)
        .select(
            "nm",
            "ln",
            F.explode(
                F.expr(f"transform(sequence(1, ln - {q} + 1), i -> substr(nm, i, {q}))")
            ).alias("gram"),
        )
        .groupBy("nm", "ln", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # both sides of the posting join scan the same gram table: persist when
    # the caller manages the lifecycle
    if persisted_out is not None:
        grams = grams.persist()
        persisted_out.append(grams)
    ga = grams.select(
        F.col("nm").alias("_na"), F.col("ln").alias("_la"),
        "gram", F.col("cnt").alias("_ca"),
    )
    gb = grams.select(
        F.col("nm").alias("_nb"), F.col("ln").alias("_lb"),
        "gram", F.col("cnt").alias("_cb"),
    )
    bound = F.greatest("_la", "_lb") - F.lit(q - 1) - F.lit(k * q)
    cand_long = (
        ga.join(gb, "gram")
        .where(
            (F.col("_na") < F.col("_nb"))
            & (F.abs(F.col("_la") - F.col("_lb")) <= k)
        )
        .groupBy("_na", "_nb", "_la", "_lb")
        .agg(F.sum(F.least("_ca", "_cb")).alias("_common"))
        .where(F.col("_common") >= bound)
        .select("_na", "_nb")
    )

    # short stratum: all-pairs among DISTINCT strings below the lemma's
    # floor — as an EQUI join (hash, never a nested loop): side b explodes
    # its 2k+1 admissible partner lengths, side a joins on its own exact
    # length, so every |la - lb| <= k pair matches exactly once
    sh = dn.where(F.col("ln") < short_cut)
    sa = sh.select(F.col("nm").alias("_na"), F.col("ln").alias("_cl"))
    sb = sh.select(
        F.col("nm").alias("_nb"),
        F.explode(
            F.sequence(F.greatest(F.col("ln") - k, F.lit(0)), F.col("ln") + k)
        ).alias("_cl"),
    )
    cand_short = (
        sa.join(sb, "_cl")
        .where(F.col("_na") < F.col("_nb"))
        .select("_na", "_nb")
    )

    name_pairs = (
        cand_long.unionByName(cand_short)
        .distinct()
        .withColumn("distance", F.levenshtein("_na", "_nb"))
        .where(F.col("distance") <= k)
    )
    # expansion back to record pairs: cross-name pairs via two joins (each
    # record pair appears exactly once since _na < _nb), plus the same-name
    # groups at distance 0 (an exact join must emit those by definition)
    ra = names.select(F.col("rid").alias("_ra"), F.col("nm").alias("_na"))
    rb = names.select(F.col("rid").alias("_rb"), F.col("nm").alias("_nb"))
    cross = (
        name_pairs.join(ra, "_na")
        .join(rb, "_nb")
        .select(
            F.least("_ra", "_rb").alias("rec_id_a"),
            F.greatest("_ra", "_rb").alias("rec_id_b"),
            F.col("distance").cast("long").alias("distance"),
        )
    )
    same = (
        names.select(F.col("rid").alias("rec_id_a"), "nm")
        .join(names.select(F.col("rid").alias("rec_id_b"), "nm"), "nm")
        .where(F.col("rec_id_a") < F.col("rec_id_b"))
        .select("rec_id_a", "rec_id_b", F.lit(0).cast("long").alias("distance"))
    )
    return cross.unionByName(same)


def fuzzy_ratios(
    pairs: DataFrame,
    name_a: str = "name_a",
    name_b: str = "name_b",
) -> DataFrame:
    """Order-insensitive fuzzy name-match features (the fuzzywuzzy /
    RapidFuzz classics, standard in ER feature stacks next to raw
    Levenshtein/Jaro-Winkler):

    - ``ratio``: plain normalized similarity 1 - lev/max_len;
    - ``token_sort_ratio``: the same after lowercasing, tokenizing and
      sorting tokens — word-order permutations ("smith john" vs
      "john smith") score 1.0;
    - ``token_set_ratio``: computed on the sorted COMMON-token string vs
      each side's full sorted string, max of the two comparisons against
      the intersection — robust when one name extends the other
      ("acme corp" vs "acme corp holdings intl").

    Everything is JVM expression chains (split / array_sort /
    array_intersect / concat_ws / levenshtein) — no UDF — and each step
    has an exact DuckDB twin (list_sort / list_intersect /
    array_to_string / levenshtein), so the gate value-hashes all three
    features. Appends the three columns to ``pairs``.
    """

    def norm_sim(a, b):
        ml = F.greatest(F.length(a), F.length(b))
        return F.when(ml == 0, F.lit(1.0)).otherwise(
            1.0 - F.levenshtein(a, b) / ml
        )

    def toks(c):
        return F.array_sort(
            F.filter(F.split(F.lower(c), r"[^a-z0-9]+"), lambda w: w != "")
        )

    ta, tb = toks(F.col(name_a)), toks(F.col(name_b))
    sa, sb = F.concat_ws(" ", ta), F.concat_ws(" ", tb)
    common = F.concat_ws(" ", F.array_sort(F.array_intersect(ta, tb)))
    # a token-less side makes the common string trivially equal to it,
    # which would score 1.0 against ANYTHING (a punctuation-only junk name
    # must not emit a maximal containment signal) — fall back to the direct
    # token-string comparison: '' vs '' -> 1.0, '' vs non-empty -> 0.0
    token_set = F.when(
        (sa == "") | (sb == ""), norm_sim(sa, sb)
    ).otherwise(F.greatest(norm_sim(common, sa), norm_sim(common, sb)))
    return (
        pairs.withColumn("ratio", norm_sim(F.col(name_a), F.col(name_b)))
        .withColumn("token_sort_ratio", norm_sim(sa, sb))
        .withColumn("token_set_ratio", token_set)
    )


def soft_tfidf(
    pairs: DataFrame,
    records: DataFrame,
    threshold: float = 0.85,
    name_col: str = "name",
    name_a: str = "name_a",
    name_b: str = "name_b",
    persisted_out: list | None = None,
) -> DataFrame:
    """Soft-TF-IDF (Cohen, Ravikumar & Fienberg, "A Comparison of String
    Distance Metrics for Name-Matching Tasks", IIWeb 2003) — the hybrid
    metric that beat both pure-token TF-IDF cosine and pure-edit
    Jaro-Winkler in their benchmark, and remains the standard strong
    baseline for multi-token name matching:

        soft_tfidf(a, b) = Σ_{w ∈ close(a,b)} V(w, a) · V(match(w), b)
                                             · jw(w, match(w))

    where ``close`` = tokens of ``a`` with some token of ``b`` at
    Jaro-Winkler > ``threshold``, ``match(w)`` = the argmax-JW partner
    (ties broken by smallest partner token, deterministically), and
    ``V(w, s)`` = the L2-normalized corpus-IDF token weight
    ``tf(w, s) · ln(1 + N / df(w))`` over the ``records`` name corpus.

    Distributed shape (everything O(distinct) where it can be):

    - token DF and the per-name normalized weight table are corpus-side
      joins computed once (``persisted_out`` receives the weight table —
      it is consumed by both sides of every pair);
    - JW runs ONCE per DISTINCT cross-pair token combination (the same
      trick ``pair_features`` uses for whole names) — the pandas UDF
      never sees the pair stream;
    - per-pair token fan-out is |tokens(a)| × |tokens(b)|, bounded by
      name length, grouped straight back down to one row per pair.

    Asymmetric by definition (it iterates a's tokens); callers wanting a
    symmetric feature take ``max``/``mean`` of both directions. Pairs with
    no close token pair score 0.0. Appends ``soft_tfidf`` to ``pairs``.
    """
    if not 0.0 <= threshold < 1.0:
        raise ValueError(f"threshold must be in [0, 1), got {threshold}")

    def toks(c):
        return F.filter(F.split(F.lower(c), r"[^a-z0-9]+"), lambda w: w != "")

    names = records.select(F.col(name_col).alias("_nm")).distinct()
    n_names = names.agg(F.count(F.lit(1)).alias("_n"))
    tf = (
        names.select("_nm", F.explode(toks(F.col("_nm"))).alias("_tok"))
        .groupBy("_nm", "_tok")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    df_tbl = tf.groupBy("_tok").agg(F.count(F.lit(1)).alias("_df"))
    u = (
        tf.join(df_tbl, "_tok")
        .crossJoin(n_names)
        .withColumn("_u", F.col("_tf") * F.log(1.0 + F.col("_n") / F.col("_df")))
    )
    norm = u.groupBy("_nm").agg(F.sqrt(F.sum(F.col("_u") * F.col("_u"))).alias("_z"))
    w = (
        u.join(norm, "_nm")
        .select(
            "_nm",
            "_tok",
            F.when(F.col("_z") > 0, F.col("_u") / F.col("_z"))
            .otherwise(F.lit(0.0))
            .alias("_v"),
        )
    )
    if persisted_out is not None:
        w = w.persist()
        persisted_out.append(w)

    pa = pairs.join(
        w.select(
            F.col("_nm").alias(name_a),
            F.col("_tok").alias("_ta"),
            F.col("_v").alias("_va"),
        ),
        name_a,
    )
    both = pa.join(
        w.select(
            F.col("_nm").alias(name_b),
            F.col("_tok").alias("_tb"),
            F.col("_v").alias("_vb"),
        ),
        name_b,
    )
    # JW once per DISTINCT (_ta, _tb): the UDF stream is the token-pair
    # dictionary, not the pair stream
    tok_pairs = both.select("_ta", "_tb").distinct().withColumn(
        "_jw", jw_udf("_ta", "_tb")
    )
    close = (
        both.join(tok_pairs, ["_ta", "_tb"])
        .where(F.col("_jw") > threshold)
        .groupBy(name_a, name_b, "_ta", "_va")
        # argmax by jw, ties -> smallest partner token: min(struct(-jw, tb))
        .agg(
            F.min(
                F.struct(
                    (-F.col("_jw")).alias("_njw"),
                    F.col("_tb"),
                    (F.col("_vb") * F.col("_jw")).alias("_contrib"),
                )
            )["_contrib"].alias("_c")
        )
        .groupBy(name_a, name_b)
        .agg(F.sum(F.col("_va") * F.col("_c")).alias("soft_tfidf"))
    )
    return pairs.join(close, [name_a, name_b], "left").withColumn(
        "soft_tfidf", F.coalesce("soft_tfidf", F.lit(0.0))
    )


def monge_elkan(
    pairs: DataFrame,
    threshold: float = 0.85,
    name_a: str = "name_a",
    name_b: str = "name_b",
) -> DataFrame:
    """Monge-Elkan hybrid similarity (Monge & Elkan, "The field matching
    problem", KDD 1996) with a Jaro-Winkler inner metric — the per-token
    best-match average that handles re-ordered, abbreviated, and
    partially-overlapping multi-token names where whole-string edit
    distance fails:

        me(a→b) = (1/|T(a)|) Σ_{w ∈ T(a)} max_{v ∈ T(b)} jw'(w, v)

    where ``jw'(w, v) = jw(w, v) if jw(w, v) > threshold else 0`` — the
    thresholded inner metric (the generalized-ME noise-suppression knob,
    cf. Jimenez et al., "Generalized Monge-Elkan Method", CICLing 2009):
    below-cutoff token matches contribute nothing instead of dragging the
    mean toward junk alignments. T(·) is the token MULTISET (repeated
    tokens each occupy a slot of the mean, per the original definition).
    The metric is directional; the output carries both directions plus the
    symmetric mean:

        (``me_ab``, ``me_ba``, ``me_sym`` = (me_ab + me_ba) / 2)

    appended to ``pairs``.

    Distributed shape (same discipline as :func:`soft_tfidf`):

    - the pandas-UDF Jaro-Winkler runs ONCE per DISTINCT cross-pair token
      combination, never on the pair stream;
    - per-pair fan-out is |T(a)| × |T(b)| rows (bounded by name length),
      reduced by two grouped argmax passes — one per direction — straight
      back to one row per pair;
    - no windows, no sorts, no driver state; everything downstream of the
      token-pair dictionary is JVM expression + groupBy.

    The cutoff also makes the metric oracle-exact cross-engine: jw > 0.85
    forces jaro > 0.75, inside both DuckDB's and this repo's
    boost-threshold conventions, where the two implementations are
    bit-compatible (the same argument the soft-TF-IDF gate pins).
    """
    if not 0.0 <= threshold < 1.0:
        raise ValueError(f"threshold must be in [0, 1), got {threshold}")

    def toks(c):
        return F.filter(F.split(F.lower(c), r"[^a-z0-9]+"), lambda w: w != "")

    base = pairs.select(
        name_a,
        name_b,
        toks(F.col(name_a)).alias("_tsa"),
        toks(F.col(name_b)).alias("_tsb"),
    )
    # positions keep multiset slots distinct through the grouped argmax
    crossed = base.select(
        name_a,
        name_b,
        F.size("_tsa").alias("_na"),
        F.size("_tsb").alias("_nb"),
        F.posexplode("_tsa").alias("_ia", "_ta"),
    ).select(
        name_a, name_b, "_na", "_nb", "_ia", "_ta",
        F.posexplode(toks(F.col(name_b))).alias("_ib", "_tb"),
    )
    tok_pairs = crossed.select("_ta", "_tb").distinct().withColumn(
        "_jw", jw_udf("_ta", "_tb")
    )
    sims = crossed.join(tok_pairs, ["_ta", "_tb"]).withColumn(
        "_s", F.when(F.col("_jw") > threshold, F.col("_jw")).otherwise(F.lit(0.0))
    )
    dir_a = (
        sims.groupBy(name_a, name_b, "_na", "_ia")
        .agg(F.max("_s").alias("_best"))
        .groupBy(name_a, name_b)
        .agg((F.sum("_best") / F.min("_na")).alias("me_ab"))
    )
    dir_b = (
        sims.groupBy(name_a, name_b, "_nb", "_ib")
        .agg(F.max("_s").alias("_best"))
        .groupBy(name_a, name_b)
        .agg((F.sum("_best") / F.min("_nb")).alias("me_ba"))
    )
    return (
        pairs.join(dir_a, [name_a, name_b], "left")
        .join(dir_b, [name_a, name_b], "left")
        .withColumn("me_ab", F.coalesce("me_ab", F.lit(0.0)))
        .withColumn("me_ba", F.coalesce("me_ba", F.lit(0.0)))
        .withColumn("me_sym", (F.col("me_ab") + F.col("me_ba")) / 2.0)
    )


def skyline_2d(
    scored: DataFrame,
    s1_col: str,
    s2_col: str,
) -> DataFrame:
    """2-D Pareto skyline (Börzsönyi et al., "The Skyline Operator",
    ICDE 2001) over a doubly-scored pair table: the rows NOT dominated
    on (s1, s2) — a dominates b when it is ≥ on both scores and > on at
    least one; rows tied on BOTH scores all survive (neither dominates).
    In the review loop this is the frontier worth human eyes: a pair
    beaten on both the lexical and the semantic axis by some other pair
    teaches the matcher strictly less than its dominator.

    The 2-D case needs no pairwise dominance join: reduce to one row per
    DISTINCT s1 (its max s2 — anything below is dominated within the
    column), order those by s1 descending, and keep the s1 groups whose
    max s2 strictly exceeds the running max of every greater-s1 group;
    surviving rows are the ties at their group's max. The only ordered
    pass runs over the DISTINCT-s1 frame — bounded by score resolution,
    not row count (quantize scores upstream at web scale; similarity
    scores round to fixed decimals anyway), the same
    small-by-construction window contract as pr_curve.

    Output: the surviving input rows, unchanged schema.
    """
    s1, s2 = F.col(s1_col), F.col(s2_col)
    per = scored.groupBy(s1.alias("_s1")).agg(F.max(s2).alias("_m2"))
    w = Window.orderBy(F.desc("_s1")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier = (
        per.withColumn("_prev", F.max("_m2").over(w))
        .where(F.col("_prev").isNull() | (F.col("_m2") > F.col("_prev")))
        .select("_s1", "_m2")
    )
    return scored.join(
        frontier,
        (s1 == F.col("_s1")) & (s2 == F.col("_m2")),
    ).drop("_s1", "_m2")


def damerau_distance_join(
    records: DataFrame,
    k: int = 2,
    q: int = 2,
    name_col: str = "name",
    id_col: str = "rec_id",
    persisted_out: list | None = None,
) -> DataFrame:
    """Exact TRUE-Damerau-Levenshtein similarity self-join: all pairs with
    ``dl(a, b) <= k`` — the transposition-aware sibling of
    :func:`edit_distance_join`. Transposed adjacent characters are the
    dominant human typo class in names; plain Levenshtein charges a swap 2,
    so a lev-join at the same k provably MISSES swap-heavy pairs (dl <= lev
    always). Output ``(rec_id_a, rec_id_b, distance, lev_distance)`` with
    ``rec_id_a < rec_id_b`` — the lev column rides along so downstream can
    see exactly which pairs the transposition op rescued.

    Candidate generation is the same lossless Gravano q-gram count-filter
    shape as :func:`edit_distance_join`, with the constants relaxed for the
    extra operation: a unit DL op (insert / delete / substitute / adjacent
    transposition) destroys at most ``q + 1`` of a string's overlapping
    q-grams (the transposition touches the gram ending and the two grams
    spanning the swapped positions), so ``dl(a,b) <= k`` implies a multiset
    gram intersection of at least ``max(|a|,|b|) - q + 1 - k*(q+1)``; the
    length filter ``||a|-|b|| <= k`` is unchanged (a transposition is
    length-preserving). Strings below the lemma floor
    ``q + k*(q+1)`` take the all-pairs short stratum, joined on admissible
    length — identical structure, wider stratum. The gate's brute-force
    DuckDB oracle (native ``damerau_levenshtein``) is the losslessness
    proof at gate level; fuzz parity of the verifier lives in pytest.

    Verification is the only non-JVM stage: an Arrow-batched pandas UDF
    running the Lowrance-Wagner DP (functions/similarity.py
    ``damerau_levenshtein``, fuzz-checked against DuckDB's native
    implementation) over DISTINCT name pairs only — duplicate-heavy corpora
    pay the Python cost once per surface-form pair, never per record pair.
    """
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    if q < 1:
        raise ValueError(f"q must be >= 1, got {q}")
    from ..functions.similarity import damerau_levenshtein

    @F.pandas_udf(T.LongType())
    def _dl_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [damerau_levenshtein(x or "", y or "") for x, y in zip(a, b)],
            dtype="int64",
        )

    names = records.select(
        F.col(id_col).alias("rid"), F.col(name_col).alias("nm")
    )
    dn = names.select("nm").distinct().withColumn("ln", F.length("nm"))
    short_cut = q + k * (q + 1)

    grams = (
        dn.where(F.col("ln") >= q)
        .select(
            "nm",
            "ln",
            F.explode(
                F.expr(f"transform(sequence(1, ln - {q} + 1), i -> substr(nm, i, {q}))")
            ).alias("gram"),
        )
        .groupBy("nm", "ln", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if persisted_out is not None:
        grams = grams.persist()
        persisted_out.append(grams)
    ga = grams.select(
        F.col("nm").alias("_na"), F.col("ln").alias("_la"),
        "gram", F.col("cnt").alias("_ca"),
    )
    gb = grams.select(
        F.col("nm").alias("_nb"), F.col("ln").alias("_lb"),
        "gram", F.col("cnt").alias("_cb"),
    )
    bound = F.greatest("_la", "_lb") - F.lit(q - 1) - F.lit(k * (q + 1))
    cand_long = (
        ga.join(gb, "gram")
        .where(
            (F.col("_na") < F.col("_nb"))
            & (F.abs(F.col("_la") - F.col("_lb")) <= k)
        )
        .groupBy("_na", "_nb", "_la", "_lb")
        .agg(F.sum(F.least("_ca", "_cb")).alias("_common"))
        .where(F.col("_common") >= bound)
        .select("_na", "_nb")
    )
    sh = dn.where(F.col("ln") < short_cut)
    sa = sh.select(F.col("nm").alias("_na"), F.col("ln").alias("_cl"))
    sb = sh.select(
        F.col("nm").alias("_nb"),
        F.explode(
            F.sequence(F.greatest(F.col("ln") - k, F.lit(0)), F.col("ln") + k)
        ).alias("_cl"),
    )
    cand_short = (
        sa.join(sb, "_cl")
        .where(F.col("_na") < F.col("_nb"))
        .select("_na", "_nb")
    )

    name_pairs = (
        cand_long.unionByName(cand_short)
        .distinct()
        .withColumn("distance", _dl_udf("_na", "_nb"))
        .where(F.col("distance") <= k)
        .withColumn("lev_distance", F.levenshtein("_na", "_nb").cast("long"))
        # lazy checkpoint: the verified pair table feeds the two-sided record
        # expansion, and without the plan cut Catalyst re-evaluates the DP
        # UDF subtree once per consumer branch (observed 3x in the physical
        # plan) — the checkpoint materializes the (output-sized) name pairs
        # once on first action instead
        .localCheckpoint(eager=False)
    )
    ra = names.select(F.col("rid").alias("_ra"), F.col("nm").alias("_na"))
    rb = names.select(F.col("rid").alias("_rb"), F.col("nm").alias("_nb"))
    cross = (
        name_pairs.join(ra, "_na")
        .join(rb, "_nb")
        .select(
            F.least("_ra", "_rb").alias("rec_id_a"),
            F.greatest("_ra", "_rb").alias("rec_id_b"),
            F.col("distance").cast("long").alias("distance"),
            "lev_distance",
        )
    )
    same = (
        names.select(F.col("rid").alias("rec_id_a"), "nm")
        .join(names.select(F.col("rid").alias("rec_id_b"), "nm"), "nm")
        .where(F.col("rec_id_a") < F.col("rec_id_b"))
        .select(
            "rec_id_a",
            "rec_id_b",
            F.lit(0).cast("long").alias("distance"),
            F.lit(0).cast("long").alias("lev_distance"),
        )
    )
    return cross.unionByName(same)
