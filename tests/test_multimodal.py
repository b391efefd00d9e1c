"""Multimodal plumbing: decode/feature stubs, resize, frame sampling,
byte-aware repartition. Decode is stubbed (no image/audio libs here) — these
tests pin the Spark-side contract: schemas, fan-out, determinism."""

import pyspark.sql.functions as F
import pytest

from minimel_spark.operators.multimodal import (
    decode_image,
    extract_features,
    repartition_by_bytes,
    resize_images,
    sample_frames,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, n=32).cache()


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"xx", fake=False)


def test_extract_features_deterministic(spark, media):
    a = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    b = {
        r["media_id"]: r["feature"]
        for r in extract_features(media.repartition(7)).collect()
    }
    assert a == b and len(a) == 32
    assert all(len(v) == 64 for v in a.values())


def test_resize_images_contract(spark, media):
    out = resize_images(media, width=64, height=32)
    rows = out.collect()
    assert len(rows) == media.where(F.col("kind") == "image").count()
    assert all(r["width"] == 64 and r["height"] == 32 for r in rows)
    assert all(len(r["payload"]) > 0 for r in rows)
    # deterministic payloads
    again = {r["media_id"]: bytes(r["payload"]) for r in resize_images(media, 64, 32).collect()}
    assert {r["media_id"]: bytes(r["payload"]) for r in rows} == again


def test_sample_frames_fanout(spark, media):
    out = sample_frames(media, every_ms=250)
    got = {
        r["media_id"]: r["n"]
        for r in out.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # synth audio rows have duration_ms=1000 -> 4 frames at 250ms
    assert got and all(n == 4 for n in got.values())
    first = out.where((F.col("frame_idx") == 0)).first()
    assert first["ts_ms"] == 0


def test_repartition_by_bytes(spark, media):
    out = repartition_by_bytes(media, target_bytes_per_partition=2048)
    assert out.count() == 32
    assert out.rdd.getNumPartitions() >= 2
