"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed in Arrow-batched ``mapInPandas``.

The decode step is STUBBED (image/audio libraries are not in this environment):
``decode_image``/``decode_audio`` raise ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder (sha-seeded feature
vector) stands in — the Spark-side contract (schema, batch shape, partition
sizing) is real and tested; swapping in PIL/soundfile is a one-function change.

Scale notes: binary payloads dominate row size, so ``repartition_by_bytes``
sizes partitions by payload bytes (not row count) to keep Arrow batches within
executor memory — the knob that matters when rows are 10 KB–10 MB blobs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("kind", T.StringType()),       # image | audio | video
    T.StructField("payload", T.BinaryType()),
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),      # typed metadata (nullable)
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),
])

FEATURE_DIM = 64

_FEAT_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
    T.StructField("n_bytes", T.IntegerType()),
])


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: sha256-seeded unit vector.
    Same payload -> same feature on every executor and at every parallelism."""
    digest = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(digest[:8], "big") % (2**32)
    rng = np.random.RandomState(seed)
    v = rng.standard_normal(FEATURE_DIM).astype(np.float32)
    return v / (np.linalg.norm(v) or 1.0)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    if fake:
        return _fake_decode(payload)
    raise NotImplementedError(
        "real image decode requires PIL/opencv (not in this environment); "
        "pass fake=True for the deterministic stand-in"
    )


def decode_audio(payload: bytes, fake: bool = False) -> np.ndarray:
    if fake:
        return _fake_decode(payload)
    raise NotImplementedError(
        "real audio decode requires soundfile/librosa (not in this environment); "
        "pass fake=True for the deterministic stand-in"
    )


def extract_features(
    media: DataFrame, fake: bool = True, batch_rows_hint: int = 256
) -> DataFrame:
    """(media_id, kind, payload, ...) -> (media_id, feature, n_bytes).

    One numpy pass per Arrow batch; the UDF signature/batching is exactly what a
    real decoder plugs into.
    """

    def gen(batches):
        for pdf in batches:
            feats = [
                (decode_image(p, fake=fake) if k == "image" else decode_audio(p, fake=fake)).tolist()
                for k, p in zip(pdf["kind"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(gen, _FEAT_SCHEMA)


_RESIZE_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])


def resize_images(
    media: DataFrame, width: int = 224, height: int = 224, fake: bool = True
) -> DataFrame:
    """Image resize plumbing: (media_id, payload, …) -> resized payload with
    updated typed metadata. The pixel op is STUBBED (no PIL here): the fake
    path emits a deterministic sha-derived payload of plausible size so the
    schema/batching/partitioning contract is real and testable."""

    def gen(batches):
        for pdf in batches:
            ids, payloads = [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if not fake:
                    raise NotImplementedError(
                        "real resize requires PIL/opencv; pass fake=True"
                    )
                digest = hashlib.sha256((p or b"") + f"{width}x{height}".encode()).digest()
                # deterministic stand-in payload, size ∝ target area
                reps = max(1, (width * height) // (16 * len(digest)))
                ids.append(mid)
                payloads.append(digest * reps)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": payloads,
                    "width": [width] * len(ids),
                    "height": [height] * len(ids),
                }
            )

    imgs = media.where(F.col("kind") == "image")
    return imgs.select("media_id", "payload").mapInPandas(gen, _RESIZE_SCHEMA)


_FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("ts_ms", T.IntegerType()),
    T.StructField("payload", T.BinaryType()),
])


def sample_frames(
    media: DataFrame, every_ms: int = 1000, fake: bool = True
) -> DataFrame:
    """Video/audio frame sampling plumbing: one output row per sampled frame
    at ``every_ms`` intervals across ``duration_ms`` (typed metadata drives
    fan-out). Decode is STUBBED: fake frames are sha-derived from
    (payload, ts) — deterministic at any parallelism."""

    def gen(batches):
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "ts_ms": [], "payload": []}
            for mid, p, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                if not fake:
                    raise NotImplementedError(
                        "real frame extraction requires ffmpeg/opencv; pass fake=True"
                    )
                n = max(1, int(dur or 0) // every_ms)
                for i in range(n):
                    ts = i * every_ms
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(ts)
                    out["payload"].append(
                        hashlib.sha256((p or b"") + ts.to_bytes(8, "big")).digest()
                    )
            yield pd.DataFrame(out)

    vids = media.where(F.col("duration_ms").isNotNull())
    return vids.select("media_id", "payload", "duration_ms").mapInPandas(
        gen, _FRAME_SCHEMA
    )


def repartition_by_bytes(
    media: DataFrame, target_bytes_per_partition: int = 128 << 20
) -> DataFrame:
    """Repartition so each partition carries ~target payload bytes (one pass to
    size, then a range repartition on a byte-weighted key)."""
    total = media.agg(F.sum(F.length("payload"))).first()[0] or 0
    nparts = max(1, int(total / target_bytes_per_partition) + 1)
    return media.repartition(nparts, F.col("media_id"))


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio"][i % 2]
        payload = bytes(rng.randrange(256) for _ in range(rng.randint(64, 512)))
        rows.append(
            (
                f"m{i:04d}",
                kind,
                payload,
                "image/png" if kind == "image" else "audio/wav",
                64 if kind == "image" else None,
                48 if kind == "image" else None,
                None if kind == "image" else 1000,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
