"""Document deduplication operators for large-scale training-data pipelines.

All operate on a documents table ``(doc_id, text, ...)``:

- ``exact_dedup``      — sha2 content hash groupBy (one shuffle on the hash);
- ``ngram_jaccard_dups`` — EXACT n-gram Jaccard duplicates: shared-shingle
  blocking + exact verification. For threshold t > 0 any qualifying pair shares
  ≥1 shingle, so shingle-blocking + verify is *lossless* (equals the brute-force
  cross join) while scaling as Σ_shingle C(n_s,2) instead of C(N,2).
- ``minhash_dups``     — MinHash-LSH candidates (sub-linear) + exact verify;
  the scale path: recall < 1 tunable via (num_hashes, bands).
- ``simhash``/``simhash_dups`` — 64-bit SimHash fingerprints; near-dups =
  hamming distance ≤ k found via 4-band exact-match blocking (pigeonhole: any
  pair with ≤3 differing bits shares at least one identical 16-bit band).
- ``embedding_dups``   — cosine near-dups over an embedding column (see ann.py).

Skew note: stop-shingle blowup (a shingle present in half the corpus) is capped
by ``max_docs_per_shingle`` — frequent shingles carry no discriminative signal,
dropping them is the standard stop-gram heuristic and keeps block sizes bounded.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, text) -> (id, content_hash, canonical_id, is_duplicate): canonical =
    min id per identical content."""
    h = docs.select(id_col, F.sha2(F.col(text_col), 256).alias("content_hash"))
    canon = h.groupBy("content_hash").agg(F.min(id_col).alias("canonical_id"))
    return h.join(canon, "content_hash").withColumn(
        "is_duplicate", F.col(id_col) != F.col("canonical_id")
    )


def _word_shingles(text_col, n: int = 3):
    """Word n-gram shingles as sorted distinct array, pure Spark expressions:
    lowercase, split on non-word, sliding windows of n words re-joined."""
    words = F.split(F.lower(text_col), r"\W+")
    words = F.filter(words, lambda w: w != "")
    idx = F.sequence(F.lit(1), F.greatest(F.size(words) - n + 1, F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, n)))
    return F.array_distinct(grams)


def shingle_docs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    return docs.select(id_col, _word_shingles(F.col(text_col), n).alias("shingles"))


def ngram_jaccard_dups(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_docs_per_shingle: int | None = 1000,
) -> DataFrame:
    """Exact Jaccard >= threshold pairs via lossless shared-shingle blocking."""
    sh = shingle_docs(docs, text_col, id_col, n)
    exploded = sh.select(id_col, F.explode("shingles").alias("sh"))
    if max_docs_per_shingle:
        freq = exploded.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
        exploded = exploded.join(
            F.broadcast(freq.where(F.col("df") > max_docs_per_shingle)), "sh", "left_anti"
        )
    a = exploded.select(F.col(id_col).alias("id_a"), "sh")
    b = exploded.select(F.col(id_col).alias("id_b"), "sh")
    cand = (
        a.join(b, "sh")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_dups(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash-LSH candidate pairs + exact Jaccard verification (scale path).

    Before the exact verify (which joins the full shingle arrays onto every
    candidate pair), candidates are prefiltered on shingle-set SIZES alone:
    J(A,B) >= t implies t <= |A|/|B| <= 1/t, so the size-ratio filter is
    lossless and runs on two longs per pair instead of two arrays — at scale
    the array join is the expensive part of verification.
    """
    from .blocking import minhash_signature

    rows_per_band = num_hashes // bands
    sh = shingle_docs(docs, text_col, id_col, n).where(F.size("shingles") > 0)
    sh = sh.withColumn("n_sh", F.size("shingles"))
    sig = sh.withColumn("sig", minhash_signature(F.col("shingles"), num_hashes))
    band_keys = F.array(
        *[
            F.concat(
                F.lit(f"{b}:"),
                F.xxhash64(F.slice("sig", b * rows_per_band + 1, rows_per_band)).cast("string"),
            )
            for b in range(bands)
        ]
    )
    blocked = sig.select(id_col, "n_sh", F.explode(band_keys).alias("bk"))
    a = blocked.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"), "bk")
    b = blocked.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"), "bk")
    cand = (
        a.join(b, "bk")
        .where(F.col("id_a") < F.col("id_b"))
        # lossless size-ratio prefilter: intersection <= min size, union >=
        # max size, so J <= min/max — drop pairs that cannot reach threshold
        .where(
            F.least("n_a", "n_b") >= threshold * F.greatest("n_a", "n_b")
        )
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


@F.pandas_udf(T.LongType())
def simhash_udf(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over word tokens (Arrow-batched, numpy bit-count)."""
    import zlib

    import numpy as np

    out = []
    for t in texts:
        toks = (t or "").lower().split()
        if not toks:
            out.append(0)
            continue
        acc = np.zeros(64, dtype=np.int64)
        shifts = np.arange(64, dtype=np.uint64)
        for tok in toks:
            h = np.uint64(
                zlib.crc32(tok.encode("utf-8"))
                | (zlib.crc32(tok[::-1].encode("utf-8")) << 32)
            )
            bits = (h >> shifts) & np.uint64(1)
            acc += np.where(bits == 1, 1, -1)
        fp = int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
        out.append(fp - (1 << 64) if fp >= (1 << 63) else fp)  # to signed long
    return pd.Series(out)


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return docs.select(id_col, simhash_udf(F.col(text_col)).alias("simhash"))


def simhash_dups(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming via 4x16-bit band
    blocking (complete for max_hamming <= 3 by pigeonhole)."""
    fp = simhash(docs, text_col, id_col)
    bands = F.array(
        *[
            F.concat(
                F.lit(f"{i}:"),
                F.shiftrightunsigned(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF)).cast("string"),
            )
            for i in range(4)
        ]
    )
    blocked = fp.select(id_col, "simhash", F.explode(bands).alias("bk"))
    a = blocked.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("h_a"), "bk")
    b = blocked.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("h_b"), "bk")
    cand = (
        a.join(b, "bk")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
