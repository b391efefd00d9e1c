"""Similarity search over an embedding column (``array<float>``).

- ``brute_force_topk``: exact cosine top-k of every query against the corpus.
  Queries are a SMALL dimension (broadcast as a numpy matrix); the corpus
  streams through an Arrow-batched pandas UDF that does one numpy matmul per
  batch, then a global top-k per query via window rank — the correctness
  baseline.
- ``lsh_topk``: random-hyperplane LSH buckets (deterministic seeded planes) +
  exact re-rank inside buckets — the scale path (sub-linear candidates, recall
  tunable via num_planes/num_tables).
- ``embedding_dups``: all corpus pairs with cosine >= threshold via LSH-bucket
  self-join + exact verify (embedding near-duplicate detection).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, Window

from .util import ensure_min_parallelism

TOPK_SCHEMA = T.StructType([
    T.StructField("query_id", T.LongType()),
    T.StructField("vec_id", T.LongType()),
    T.StructField("sim", T.DoubleType()),
])


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
) -> DataFrame:
    """-> (query_id, vec_id, sim, rank): exact cosine top-k per query.

    Per-batch partial top-k inside the UDF keeps shuffle volume at
    O(batches * queries * k), then one window finalizes the global top-k.
    """
    spark = corpus.sparkSession
    qrows = queries.select(query_id_col, vec_col).collect()
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = _normalize_rows(np.array([r[1] for r in qrows], dtype=np.float64))
    bc = spark.sparkContext.broadcast((qids, qmat))

    def gen(batches):
        ids, qm = bc.value
        for pdf in batches:
            cmat = _normalize_rows(
                np.array(pdf[vec_col].tolist(), dtype=np.float64)
            )
            sims = qm @ cmat.T  # (nq, batch)
            nb = sims.shape[1]
            kk = min(k, nb)
            top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            out_q, out_v, out_s = [], [], []
            vec_ids = pdf[id_col].to_numpy()
            for qi in range(len(ids)):
                out_q.extend([ids[qi]] * kk)
                out_v.extend(vec_ids[top[qi]])
                out_s.extend(sims[qi, top[qi]])
            yield pd.DataFrame({"query_id": out_q, "vec_id": out_v, "sim": out_s})

    partial = (
        ensure_min_parallelism(corpus.select(id_col, vec_col), id_col)
        .mapInPandas(gen, TOPK_SCHEMA)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def md5_plane_coeff(seed: int, t: int, p: int, d: int) -> float:
    """Deterministic U(-1, 1) hyperplane coefficient derived from md5 — the
    same arithmetic (60-bit md5 prefix / 2^60 * 2 - 1, all IEEE-exact or
    correctly-rounded ops) is reproducible in any engine with md5 + doubles,
    which is what lets the md5 hash family's bucket codes be recomputed
    bit-for-bit in DuckDB."""
    import hashlib

    h = int(hashlib.md5(f"{seed}:{t}:{p}:{d}".encode()).hexdigest()[:15], 16)
    return h / 2**60 * 2 - 1


def _fold_dot(vec, coeffs: list[float]):
    """Strict left-to-right double fold of <vec, coeffs> (F.aggregate is a
    left fold, matching DuckDB's list_reduce order — IEEE addition is
    deterministic given order, so the two engines agree bit-for-bit; a
    BLAS/numpy dot would not, and a sign flip near zero would change the
    bucket code)."""
    plane = F.array(*[F.lit(c) for c in coeffs])
    return F.aggregate(
        F.zip_with(vec, plane, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def hyperplane_buckets(
    df: DataFrame,
    dim: int,
    num_planes: int = 12,
    num_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hash_family: str = "np",
) -> DataFrame:
    """-> (id, bucket) rows: sign-pattern bucket per hash table.

    ``hash_family="np"`` (default): gaussian hyperplanes from a seeded numpy
    RNG, one BLAS matmul per Arrow batch — the perf path.
    ``hash_family="md5"``: U(-1,1) hyperplanes derived from md5 (see
    ``md5_plane_coeff``) with the dot computed as a strict left fold of JVM
    expressions — same plan shape (whole-stage codegen, no Python), chosen
    so the ENTIRE bucket assignment is bit-for-bit reproducible in DuckDB
    and the approximate ANN gates can carry full value oracles (the
    dedup_minhash md5 precedent extended to float LSH). Uniform-cube
    directions are mildly dimension-biased vs gaussian but remain
    locality-sensitive for cosine; measured recall is pinned by the recall
    gates either way."""
    if hash_family == "md5":
        vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        d = ensure_min_parallelism(df, id_col).select(
            F.col(id_col).alias("id"), vec.alias("_v")
        )
        buckets = []
        for t in range(num_tables):
            code = F.lit(0).cast("long")
            for p in range(num_planes):
                coeffs = [md5_plane_coeff(seed, t, p, i) for i in range(dim)]
                code = code + F.when(
                    _fold_dot(F.col("_v"), coeffs) > 0, F.lit(1 << p)
                ).otherwise(F.lit(0))
            buckets.append(F.concat(F.lit(f"{t}:"), code.cast("string")))
        return d.select("id", F.explode(F.array(*buckets)).alias("bucket"))
    if hash_family != "np":
        raise ValueError(f"hash_family must be 'np' or 'md5', got {hash_family!r}")
    spark = df.sparkSession
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((num_tables, num_planes, dim))
    bc = spark.sparkContext.broadcast(planes)
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("bucket", T.StringType()),
    ])

    def gen(batches):
        pl = bc.value
        pows = 1 << np.arange(num_planes, dtype=np.int64)
        for pdf in batches:
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            ids = pdf[id_col].to_numpy()
            out_i, out_b = [], []
            for t in range(num_tables):
                signs = (mat @ pl[t].T) > 0  # (n, planes)
                codes = (signs * pows).sum(axis=1)
                out_i.extend(ids)
                out_b.extend([f"{t}:{c}" for c in codes])
            yield pd.DataFrame({"id": out_i, "bucket": out_b})

    return ensure_min_parallelism(df.select(id_col, vec_col), id_col).mapInPandas(
        gen, schema
    )


@F.pandas_udf(T.DoubleType())
def cosine_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    ma = np.array(a.tolist(), dtype=np.float64)
    mb = np.array(b.tolist(), dtype=np.float64)
    num = (ma * mb).sum(axis=1)
    den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
    den[den == 0] = 1.0
    return pd.Series(num / den)


def fold_cosine(a, b):
    """Strict left-to-right double-fold cosine of two float vectors — the
    oracle-path twin of ``cosine_udf``. Every term is cast float->double
    (exact) before multiplying and summed with ``F.aggregate`` (a left fold
    whose 0.0 init is IEEE-exact to fold-without-init), so the result is
    bit-identical to DuckDB's ``list_reduce(list_transform(...), (x,y)->x+y)``
    over the same element order. ``cosine_udf`` (numpy pairwise summation,
    different rounding at ~1e-16) stays the perf default; the md5 hash
    families use THIS so the rank/threshold decisions hashed by the ANN
    value oracles cannot flip on summation-order noise between engines."""

    def dot(u, v):
        return F.aggregate(
            F.zip_with(u, v, lambda p, q: p.cast("double") * q.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    den = F.sqrt(dot(a, a)) * F.sqrt(dot(b, b))
    return F.when(den == F.lit(0.0), F.lit(0.0)).otherwise(dot(a, b) / den)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    num_planes: int = 10,
    num_tables: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hash_family: str = "np",
) -> DataFrame:
    """Approximate top-k: hyperplane-bucket join + exact cosine re-rank.
    ``hash_family="md5"`` switches to the DuckDB-reproducible plane family
    (see hyperplane_buckets) so the candidate set is oracle-checkable."""
    cb = hyperplane_buckets(corpus, dim, num_planes, num_tables, id_col=id_col,
                            vec_col=vec_col, hash_family=hash_family)
    qb = hyperplane_buckets(queries, dim, num_planes, num_tables, id_col=id_col,
                            vec_col=vec_col, hash_family=hash_family)
    cand = (
        qb.select(F.col("id").alias("query_id"), "bucket")
        .join(cb.select(F.col("id").alias("vec_id"), "bucket"), "bucket")
        .select("query_id", "vec_id")
        .distinct()
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    cv = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cv"))
    sim = fold_cosine("_qv", "_cv") if hash_family == "md5" else cosine_udf("_qv", "_cv")
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "vec_id")
        .withColumn("sim", sim)
        .drop("_qv", "_cv")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _lloyd(sample: np.ndarray, k: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    """Deterministic driver-side k-means on a (small) sample — the coarse
    quantizer codebook. At corpus scale the codebook is always fit on a
    sample; doing it in numpy keeps it partition-invariant."""
    rng = np.random.RandomState(seed)
    cents = sample[rng.choice(len(sample), size=min(k, len(sample)), replace=False)]
    for _ in range(iters):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    sample_size: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hash_family: str = "np",
) -> DataFrame:
    """IVF approximate top-k: coarse quantizer -> corpus rows assigned
    to their nearest cell -> each query probes its n_probe nearest cells ->
    exact cosine re-rank inside probed cells.

    vs LSH: cells adapt to the data distribution (better recall per candidate
    at the same fan-in); the codebook is a broadcast numpy matrix, cell
    assignment is one matmul per Arrow batch, and the probe join is a plain
    equi-join on cell id — all Catalyst-visible.

    ``hash_family="np"`` (default): Lloyd's k-means on a deterministic
    hash-ordered sample — the quality path. ``hash_family="md5"``: the
    codebook is the ``n_cells`` corpus vectors with the smallest
    md5(id-as-string) (IVF-with-random-centroids, a standard cheap
    quantizer), and squared distances are strict left-fold JVM doubles —
    both choices exist so the ENTIRE cell assignment and probe set is
    reproducible in DuckDB SQL (an iterative float k-means is not), giving
    the ivf gate a full value oracle; quality of the default family stays
    pinned by the recall gate.
    """
    spark = corpus.sparkSession
    if hash_family == "md5":
        cent_rows = (
            corpus.select(id_col, vec_col)
            .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
            .limit(n_cells)
            .collect()
        )
        cents_f = [[float(x) for x in r[1]] for r in cent_rows]
        vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))

        def cell_dists(v):
            return F.array(
                *[
                    F.struct(
                        F.aggregate(
                            F.zip_with(
                                v,
                                F.array(*[F.lit(c) for c in cent]),
                                lambda a, b: (a - b) * (a - b),
                            ),
                            F.lit(0.0),
                            lambda acc, x: acc + x,
                        ).alias("d"),
                        F.lit(i).alias("c"),
                    )
                    for i, cent in enumerate(cents_f)
                ]
            )

        corpus_cells = ensure_min_parallelism(corpus, id_col).select(
            F.col(id_col).alias("id"),
            F.array_min(cell_dists(vec))["c"].alias("cell"),
        )
        query_cells = queries.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.transform(
                    F.slice(F.array_sort(cell_dists(vec)), 1, n_probe),
                    lambda s: s["c"],
                )
            ).alias("cell"),
        )
        cand = (
            query_cells.select(F.col("id").alias("query_id"), "cell")
            .join(corpus_cells.select(F.col("id").alias("vec_id"), "cell"), "cell")
            .select("query_id", "vec_id")
            .distinct()
        )
        qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
        cv = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cv"))
        scored = (
            cand.join(F.broadcast(qv), "query_id")
            .join(cv, "vec_id")
            .withColumn("sim", fold_cosine("_qv", "_cv"))
            .drop("_qv", "_cv")
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
        return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
    if hash_family != "np":
        raise ValueError(f"hash_family must be 'np' or 'md5', got {hash_family!r}")
    # Deterministic hash-sample for the codebook: ordering by xxhash64(id) and
    # taking the first sample_size compiles to TakeOrderedAndProject (a
    # per-partition size-k heap + driver merge, NOT a full sort) and is
    # unbiased w.r.t. id order — an id-ordered limit would fit the codebook to
    # whatever happens to sort first.
    sample = np.array(
        [
            r[1]
            for r in corpus.select(id_col, vec_col)
            .orderBy(F.xxhash64(F.col(id_col)))
            .limit(sample_size)
            .collect()
        ],
        dtype=np.float64,
    )
    cents = _lloyd(sample, n_cells)
    bc = spark.sparkContext.broadcast(cents)
    assign_schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("cell", T.IntegerType())]
    )

    def assign(batches):
        c = bc.value
        for pdf in batches:
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            d = ((mat[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            yield pd.DataFrame(
                {"id": pdf[id_col].to_numpy(), "cell": d.argmin(axis=1).astype("int32")}
            )

    corpus_cells = ensure_min_parallelism(
        corpus.select(id_col, vec_col), id_col
    ).mapInPandas(assign, assign_schema)

    probe_schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("cell", T.IntegerType())]
    )

    def probe(batches):
        c = bc.value
        for pdf in batches:
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            d = ((mat[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            cells = np.argsort(d, axis=1)[:, :n_probe]
            ids = np.repeat(pdf[id_col].to_numpy(), cells.shape[1])
            yield pd.DataFrame({"id": ids, "cell": cells.ravel().astype("int32")})

    query_cells = queries.select(id_col, vec_col).mapInPandas(probe, probe_schema)

    cand = (
        query_cells.select(F.col("id").alias("query_id"), "cell")
        .join(corpus_cells.select(F.col("id").alias("vec_id"), "cell"), "cell")
        .select("query_id", "vec_id")
        .distinct()
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    cv = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cv"))
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "vec_id")
        .withColumn("sim", cosine_udf("_qv", "_cv"))
        .drop("_qv", "_cv")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def embedding_dups(
    corpus: DataFrame,
    dim: int,
    threshold: float = 0.95,
    num_planes: int = 10,
    num_tables: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hash_family: str = "np",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (LSH candidates + exact verify).
    ``hash_family="md5"``: DuckDB-reproducible buckets (hyperplane_buckets)."""
    # lazy plan cut: the bucket table feeds BOTH sides of the self-join —
    # without it the per-row bucket UDF / fold evaluates twice over the
    # corpus (r6; the simhash_dups precedent)
    b = hyperplane_buckets(corpus, dim, num_planes, num_tables, id_col=id_col,
                           vec_col=vec_col, hash_family=hash_family
                           ).localCheckpoint(eager=False)
    a = b.select(F.col("id").alias("id_a"), "bucket")
    c = b.select(F.col("id").alias("id_b"), "bucket")
    cand = a.join(c, "bucket").where(F.col("id_a") < F.col("id_b")).select("id_a", "id_b").distinct()
    va = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    sim = fold_cosine("_va", "_vb") if hash_family == "md5" else cosine_udf("_va", "_vb")
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("sim", sim)
        .where(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    m: int = 8,
    ks: int = 16,
    sample_size: int = 4096,
    refine: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hash_family: str = "np",
) -> DataFrame:
    """Product-quantization approximate top-k (Jégou, Douze & Schmid, TPAMI
    2011): the vector is split into ``m`` subspaces of dim/m, each subspace
    quantized against its own ``ks``-entry codebook, and every corpus vector
    is represented by its m sub-codes (m bytes at ks<=256 — the compressed
    representation a 100-TB corpus persists instead of 4·dim bytes of
    floats). Queries score candidates with ASYMMETRIC distance (ADC): the
    raw query sub-vector's squared L2 to the centroid its code names, summed
    over subspaces — a table lookup per subspace, never a float vector read.

    Contrast inside the ANN family: brute_force scans raw floats exactly;
    LSH/IVF prune candidates then re-rank exactly; PQ scans EVERYTHING but
    in compressed domain — the memory-bound regime's tool, and the building
    block IVF-PQ composes with ivf_topk's cell routing at real scale.
    Returns (query_id, vec_id, dist, rank) ranked by ADC squared L2
    ASCENDING (ties to the smaller vec_id) — approximate distances, no
    exact re-rank by default; recall is pinned by the recall gate.
    ``refine=R`` switches to the production shortlist regime: the ADC scan
    keeps the top R >= k candidates per query, ONLY those R rows read their
    raw float vectors back (one equi-join), and exact squared L2 re-ranks
    the shortlist to the final k — the standard ADC+refine operating point
    (pure ADC recall@10 measures ~0.5 at m=8/ks=16 on the fixture; with
    R=5k it recovers ~1.0 while still never scanning raw floats).

    ``hash_family="np"`` (default): per-subspace Lloyd codebooks fit on the
    deterministic xxhash64-ordered sample (the ivf_topk codebook contract);
    encode + ADC run fused in one Arrow-batched pass over the corpus with
    per-batch partial top-k (shuffle volume O(batches·queries·k)).
    ``hash_family="md5"``: per-subspace codebooks are the ks corpus
    sub-vectors with the smallest md5("s:"||id) (the ivf md5-family cheap
    quantizer, chosen PER SUBSPACE so codebooks differ), and encoding + ADC
    are strict left-fold JVM doubles — every code and distance is
    recomputable in DuckDB, giving the gate a full value oracle. Codebook
    loads collect m·ks rows (budget-gated small, the ivf contract).
    """
    if dim % m != 0:
        raise ValueError(f"m={m} must divide dim={dim}")
    ds = dim // m
    spark = corpus.sparkSession
    if hash_family == "md5":
        cents: list[list[list[float]]] = []
        for s in range(m):
            rows = (
                corpus.select(id_col, vec_col)
                .orderBy(
                    F.md5(F.concat(F.lit(f"{s}:"), F.col(id_col).cast("string"))),
                    F.col(id_col),
                )
                .limit(ks)
                .collect()
            )
            cents.append(
                [[float(x) for x in r[1][s * ds:(s + 1) * ds]] for r in rows]
            )

        def sub_l2(vslice, cent):
            return F.aggregate(
                F.zip_with(
                    vslice,
                    F.array(*[F.lit(c) for c in cent]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )

        vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        codes = F.array(
            *[
                F.array_min(
                    F.array(
                        *[
                            F.struct(
                                sub_l2(F.slice(vec, s * ds + 1, ds), cent).alias("d"),
                                F.lit(j).alias("c"),
                            )
                            for j, cent in enumerate(cents[s])
                        ]
                    )
                )["c"]
                for s in range(m)
            ]
        )
        enc = ensure_min_parallelism(corpus, id_col).select(
            F.col(id_col).alias("vec_id"), codes.alias("_codes")
        )
        qv = queries.select(
            F.col(id_col).alias("query_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_q"),
        )
        dist = None
        for s in range(m):
            lut_s = F.element_at(
                F.array(*[F.array(*[F.lit(c) for c in cent]) for cent in cents[s]]),
                F.col("_codes")[s] + 1,
            )
            term = F.aggregate(
                F.zip_with(
                    F.slice(F.col("_q"), s * ds + 1, ds),
                    lut_s,
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            dist = term if dist is None else dist + term
        # deliberate compressed-domain cross: every (query, code-row) pair is
        # scored — PQ is a scan method, not a pruning method; the broadcast
        # side is the (small) query set
        scored = enc.crossJoin(F.broadcast(qv)).select(
            "query_id", "vec_id", dist.alias("dist")
        )
        return _pq_finalize(
            scored, corpus, queries, k, refine, id_col, vec_col
        )
    if hash_family != "np":
        raise ValueError(f"hash_family must be 'np' or 'md5', got {hash_family!r}")
    sample = np.array(
        [
            r[1]
            for r in corpus.select(id_col, vec_col)
            .orderBy(F.xxhash64(F.col(id_col)))
            .limit(sample_size)
            .collect()
        ],
        dtype=np.float64,
    )
    subcents = np.stack(
        [_lloyd(sample[:, s * ds:(s + 1) * ds].copy(), ks) for s in range(m)]
    )  # (m, ks', ds) — ks' may be < ks on tiny corpora
    qrows = queries.select(id_col, vec_col).collect()
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    bc = spark.sparkContext.broadcast((subcents, qids, qmat))
    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("vec_id", T.LongType()),
            T.StructField("dist", T.DoubleType()),
        ]
    )

    def gen(batches):
        sc, ids, qm = bc.value
        mm, kss, dss = sc.shape
        # per-query ADC lookup tables, built once per task: (nq, m, ks)
        lut = np.stack(
            [
                ((qm[:, s * dss:(s + 1) * dss][:, None, :] - sc[s][None, :, :]) ** 2).sum(
                    axis=2
                )
                for s in range(mm)
            ],
            axis=1,
        )
        for pdf in batches:
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            vec_ids = pdf[id_col].to_numpy()
            # encode: per subspace argmin against the sub-codebook
            codes = np.stack(
                [
                    ((mat[:, s * dss:(s + 1) * dss][:, None, :] - sc[s][None, :, :]) ** 2)
                    .sum(axis=2)
                    .argmin(axis=1)
                    for s in range(mm)
                ],
                axis=1,
            )  # (n, m)
            nb = len(vec_ids)
            kk = min(k, nb)
            out_q, out_v, out_d = [], [], []
            ar = np.arange(mm)[:, None]
            for qi in range(len(ids)):
                d = lut[qi][ar, codes.T].sum(axis=0)  # (n,)
                top = np.argpartition(d, kk - 1)[:kk]
                out_q.extend([ids[qi]] * kk)
                out_v.extend(vec_ids[top])
                out_d.extend(d[top])
            yield pd.DataFrame(
                {"query_id": out_q, "vec_id": out_v, "dist": out_d}
            )

    partial = ensure_min_parallelism(
        corpus.select(id_col, vec_col), id_col
    ).mapInPandas(gen, out_schema)
    return _pq_finalize(partial, corpus, queries, k, refine, id_col, vec_col)


def _pq_finalize(scored, corpus, queries, k, refine, id_col, vec_col):
    """Shared pq_topk tail: rank the ADC stream; with ``refine`` keep the
    top-refine shortlist, read ONLY those raw vectors back, exact-squared-L2
    re-rank (strict left fold — deterministic) to the final k."""
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("vec_id"))
    if refine is None:
        return scored.withColumn("rank", F.row_number().over(w)).where(
            F.col("rank") <= k
        )
    if refine < k:
        raise ValueError(f"refine={refine} must be >= k={k}")
    short = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= refine)
        .select("query_id", "vec_id")
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_q")
    )
    cv = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_c"))
    l2 = F.aggregate(
        F.zip_with(
            "_q",
            "_c",
            lambda a, b: (a.cast("double") - b.cast("double"))
            * (a.cast("double") - b.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    rer = (
        short.join(F.broadcast(qv), "query_id")
        .join(cv, "vec_id")
        .select("query_id", "vec_id", l2.alias("dist"))
    )
    return rer.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
