"""M6 embedding TRANSFORM: text -> array<double> (SURVEY §2 M6; reference
minimel/vectorize.py:184-195 and run.py:22-31).

The reference embeds paragraphs either with a pickled (sklearn) hashing
vectorizer or with fasttext sentence vectors; round 1 covered similarity
*search* (operators/ann.py) but had no operator producing embeddings from
text. Three paths, mirroring the reference's options:

- ``embed_hashed`` — the default, a hashing vectorizer re-expressed ENTIRELY
  in JVM expressions (no UDF, whole-stage codegen): lowercase ``\\w+`` tokens,
  md5-hash each token into one of ``dim`` buckets, count, L2-normalize.
  The md5 bucket hash is deliberately SQL-reproducible
  (``('0x'||substr(md5(tok),1,15))::UBIGINT % dim`` in DuckDB equals Spark's
  ``conv(substr(md5(tok),1,15),16,10) % dim``), which is what gives the
  text_embed_hashed gate a full value-hash oracle.
- ``embed_with_fasttext`` — fasttext sentence vectors via an Arrow-batched
  pandas UDF with the model as an executor singleton (reference run.py:22-31);
  gated behind the optional fasttext import.
- ``embed_with_vectorizer`` — a pickled sklearn vectorizer applied per batch
  (reference vectorize.py:184-195); gated behind the optional import.

Scale notes for ``embed_hashed``: one scan -> explode -> two hash
aggregations keyed by the document id; the dense array is assembled with
``transform(sequence(...))`` over a per-doc bucket map — no shuffle beyond
the per-doc aggregation, no Python anywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def embed_hashed(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    out_col: str = "embedding",
) -> DataFrame:
    """(id, text) -> (id, embedding array<double>): L2-normalized hashed
    bag-of-words. Empty/token-less documents get the zero vector.

    ``explode_outer`` keeps token-less documents in the stream (null token ->
    null bucket, dropped from the per-doc map), so the zero-vector case falls
    out of the same two aggregations — no extra join back to the input to
    restore missing ids (one fewer exchange at scale).
    """
    from .util import ensure_min_parallelism

    toks = F.expr(f"regexp_extract_all(lower({text_col}), '\\\\w+', 0)")
    buckets = (
        ensure_min_parallelism(df, id_col)
        .select(id_col, F.explode_outer(toks).alias("_tok"))
        .select(
            id_col,
            F.expr(
                f"pmod(cast(conv(substr(md5(_tok), 1, 15), 16, 10) as bigint), {dim})"
            ).alias("_b"),
        )
        .groupBy(id_col, "_b")
        .agg(F.count(F.lit(1)).cast("double").alias("_c"))
    )
    return (
        buckets.groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.collect_list(
                    F.when(F.col("_b").isNotNull(), F.struct("_b", "_c"))
                )
            ).alias("_m")
        )
        .select(
            id_col,
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(F.element_at("_m", i.cast("long")), F.lit(0.0)),
            ).alias("_v"),
        )
        .withColumn(
            "_norm",
            F.sqrt(F.aggregate("_v", F.lit(0.0), lambda acc, x: acc + x * x)),
        )
        .select(
            id_col,
            F.when(
                F.col("_norm") > 0,
                F.transform("_v", lambda x: x / F.col("_norm")),
            )
            .otherwise(F.col("_v"))
            .alias(out_col),
        )
    )


def embed_with_fasttext(
    df: DataFrame,
    model_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "embedding",
) -> DataFrame:
    """fasttext sentence vectors (reference run.py:22-31). Requires the
    optional ``fasttext`` package; the model loads ONCE per executor task
    (iterator-form pandas UDF singleton) and batches flow through Arrow."""
    try:  # pragma: no cover - optional dependency
        import fasttext  # type: ignore # noqa: F401
    except ImportError as e:
        raise ImportError(
            "embed_with_fasttext requires the optional fasttext package"
        ) from e
    import pandas as pd
    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField(out_col, T.ArrayType(T.DoubleType())),
    ])

    def gen(batches):  # pragma: no cover - needs fasttext
        import fasttext as ft

        model = ft.load_model(model_path)
        for pdf in batches:
            vecs = [
                [float(x) for x in model.get_sentence_vector(t or "")]
                for t in pdf[text_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], out_col: vecs})

    return df.select(id_col, text_col).mapInPandas(gen, schema)


def embed_with_vectorizer(
    df: DataFrame,
    vectorizer_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "embedding",
) -> DataFrame:
    """Pickled sklearn vectorizer transform (reference vectorize.py:184-195).
    Requires the optional scikit-learn package; the pickle loads once per
    executor task and ``transform`` runs per Arrow batch."""
    try:  # pragma: no cover - optional dependency
        import sklearn  # type: ignore # noqa: F401
    except ImportError as e:
        raise ImportError(
            "embed_with_vectorizer requires the optional scikit-learn package"
        ) from e
    import pandas as pd
    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField(out_col, T.ArrayType(T.DoubleType())),
    ])

    def gen(batches):  # pragma: no cover - needs sklearn
        import pickle

        with open(vectorizer_path, "rb") as f:
            vec = pickle.load(f)
        for pdf in batches:
            m = vec.transform(list(pdf[text_col]))
            dense = m.toarray() if hasattr(m, "toarray") else m
            yield pd.DataFrame(
                {id_col: pdf[id_col], out_col: [list(map(float, r)) for r in dense]}
            )

    return df.select(id_col, text_col).mapInPandas(gen, schema)


def spectral_word_embedding(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_iter: int = 8,
) -> DataFrame:
    """1-D spectral word embedding: the dominant eigenvector of the PPMI
    bigram co-occurrence matrix by synchronous power iteration — the
    count-based ancestor of word2vec (Levy & Goldberg, NeurIPS 2014 showed
    SGNS factorizes exactly this matrix), expressed as Spark-first
    iterative linear algebra: the "training loop" is n_iter rounds of one
    sparse matrix-vector shuffle + one 1-row norm aggregate, so it scales
    like PageRank (the matrix never materializes beyond the co-occurrence
    edge list) and, being a pure function of the corpus, replays exactly
    in an unrolled SQL oracle.

    Construction: adjacent lowercase word pairs (w_i, w_{i+1}) per
    document, symmetrized; PPMI(a,b) = max(0, ln(n_ab·T / (r_a·r_b)))
    with T the total symmetrized pair count and r the row marginals —
    exact integer counts into one fixed IEEE ln. Power iteration starts
    from the uniform unit vector and L2-normalizes each round (norms are
    1-row aggregates broadcast back). The dominant eigenvector of a PPMI
    matrix is nonnegative (Perron-Frobenius), so the sign convention is
    fixed by construction and the result is partitioning-stable to
    ~1e-14 — rounded 6 in the gate.

    Returns ``(word, x)`` — the embedding coordinate per vocabulary word
    (words with no PPMI-positive neighbor converge to 0).
    """
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    words = docs.select(
        F.col(id_col).alias("_d"),
        F.posexplode(
            F.split(F.lower(F.col(text_col)), r"\s+")
        ).alias("pos", "w"),
    ).where(F.col("w") != "")
    # adjacency via self-join on (doc, pos+1): deterministic, JVM-only
    a = words.select("_d", "pos", F.col("w").alias("wa"))
    b = words.select(
        "_d", (F.col("pos") - 1).alias("pos"), F.col("w").alias("wb")
    )
    bi = a.join(b, ["_d", "pos"]).select("wa", "wb")
    sym = bi.unionAll(
        bi.select(F.col("wb").alias("wa"), F.col("wa").alias("wb"))
    )
    cooc = (
        sym.groupBy("wa", "wb")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .localCheckpoint(eager=True)  # scanned every iteration
    )
    marg = cooc.groupBy(F.col("wa").alias("w")).agg(F.sum("n_ab").alias("r"))
    total = cooc.agg(F.sum("n_ab")).first()[0]
    ppmi = (
        cooc.join(marg.select(F.col("w").alias("wa"), F.col("r").alias("ra")), "wa")
        .join(marg.select(F.col("w").alias("wb"), F.col("r").alias("rb")), "wb")
        .select(
            "wa",
            "wb",
            F.greatest(
                F.lit(0.0),
                F.log(
                    F.col("n_ab") * F.lit(float(total)) / (F.col("ra") * F.col("rb"))
                ),
            ).alias("m"),
        )
        .where(F.col("m") > 0)
        .localCheckpoint(eager=True)
    )
    vocab = marg.select("w").localCheckpoint(eager=True)
    n_vocab = vocab.count()
    x = vocab.select("w", F.lit(1.0 / float(n_vocab) ** 0.5).alias("x"))
    for _ in range(n_iter):
        mx = (
            ppmi.join(x.select(F.col("w").alias("wb"), "x"), "wb")
            .groupBy(F.col("wa").alias("w"))
            .agg(F.sum(F.col("m") * F.col("x")).alias("mx"))
        )
        y = vocab.join(mx, "w", "left").select(
            "w", F.coalesce("mx", F.lit(0.0)).alias("y")
        )
        norm = y.agg(F.sqrt(F.sum(F.col("y") * F.col("y"))).alias("_n"))
        x = (
            y.crossJoin(F.broadcast(norm))
            .select(
                "w",
                F.when(F.col("_n") > 0, F.col("y") / F.col("_n"))
                .otherwise(F.lit(0.0))
                .alias("x"),
            )
            .localCheckpoint(eager=True)
        )
    return x


def _jl_sign(seed: int, j: int, i: int) -> float:
    """±1 sign of JL matrix cell (j, i), md5-derived: +1 when the 60-bit
    md5 of 'jl:seed:j:i' is odd — recomputable in SQL as
    ('0x' || substr(md5('jl:seed:j:i'), 1, 15))::UBIGINT % 2."""
    import hashlib

    h = int(hashlib.md5(f"jl:{seed}:{j}:{i}".encode()).hexdigest()[:15], 16)
    return 1.0 if h % 2 == 1 else -1.0


def jl_project(
    df: DataFrame,
    in_dim: int,
    out_dim: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hash_family: str = "np",
) -> DataFrame:
    """Johnson-Lindenstrauss random projection with the ±1
    database-friendly matrix (Achlioptas, JCSS 2003): y = (1/√k)·R·x with
    R_{ji} ∈ {±1} — pairwise squared distances are preserved within 1±ε
    for k = O(ε⁻²·log n), which is what makes 64-dim embeddings joinable
    at 16 dims before the exact re-rank (the ANN pre-filter trade).

    ``hash_family="np"``: seeded-numpy R, one BLAS matmul per Arrow batch
    (the perf path). ``hash_family="md5"``: R from md5 cell signs (see
    :func:`_jl_sign`) and every output coordinate a STRICT LEFT FOLD of
    JVM doubles — the ann.py md5 contract, so the entire projection is
    bit-for-bit reproducible in DuckDB. Scale factor applied AFTER the
    fold. Output: (id_col, proj array<double>).
    """
    if out_dim < 1 or in_dim < 1:
        raise ValueError(f"dims must be >= 1, got in={in_dim}, out={out_dim}")
    import math

    scale = 1.0 / math.sqrt(out_dim)
    if hash_family == "md5":
        vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        cols = []
        for j in range(out_dim):
            plane = F.array(
                *[F.lit(_jl_sign(seed, j, i)) for i in range(in_dim)]
            )
            fold = F.aggregate(
                F.zip_with(vec, plane, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            cols.append(fold * F.lit(scale))
        return df.select(id_col, F.array(*cols).alias("proj"))
    if hash_family != "np":
        raise ValueError(f"hash_family must be 'np' or 'md5', got {hash_family!r}")
    import numpy as np
    import pandas as pd
    import pyspark.sql.types as T

    rng = np.random.RandomState(seed)
    R = (rng.randint(0, 2, size=(out_dim, in_dim)) * 2 - 1).astype(np.float64)

    def gen(batches):
        for pdf in batches:
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Y = X @ R.T * scale
            yield pd.DataFrame({id_col: pdf[id_col], "proj": list(Y)})

    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("proj", T.ArrayType(T.DoubleType())),
    ])
    return df.select(id_col, vec_col).mapInPandas(gen, schema)


def jl_distortion(
    orig: DataFrame,
    proj: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-pair JL distortion audit over CONSECUTIVE-id pairs (a
    deterministic pair panel — no sampling machinery):

        ratio = ‖y_a − y_b‖² / ‖x_a − x_b‖²

    which the JL lemma pins near 1. Squared distances are strict
    left-fold JVM doubles on BOTH sides (original floats cast to double
    first), so the whole audit replays bit-for-bit in SQL. Output:
    (id_a, id_b, d2_orig, d2_proj, ratio).
    """

    def d2(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    ov = orig.select(
        F.col(id_col).alias("id_a"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_xa"),
    )
    ow = orig.select(
        (F.col(id_col) - 1).alias("id_a"),
        F.col(id_col).alias("id_b"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_xb"),
    )
    pv = proj.select(F.col(id_col).alias("id_a"), F.col("proj").alias("_ya"))
    pw = proj.select((F.col(id_col) - 1).alias("id_a"), F.col("proj").alias("_yb"))
    return (
        ov.join(ow, "id_a")
        .join(pv, "id_a")
        .join(pw, "id_a")
        .select(
            "id_a",
            "id_b",
            d2(F.col("_xa"), F.col("_xb")).alias("d2_orig"),
            d2(F.col("_ya"), F.col("_yb")).alias("d2_proj"),
            (d2(F.col("_ya"), F.col("_yb")) / d2(F.col("_xa"), F.col("_xb"))).alias(
                "ratio"
            ),
        )
    )
