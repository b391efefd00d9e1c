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
    out = sample_frames(media, every_ms=100)
    got = {
        r["media_id"]: r["n"]
        for r in out.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    want = {
        r["media_id"]: max(1, r["duration_ms"] // 100)
        for r in media.where(F.col("duration_ms").isNotNull()).collect()
    }
    assert got == want and got
    first = out.where((F.col("frame_idx") == 0)).first()
    assert first["ts_ms"] == 0


def test_real_ppm_roundtrip_and_resize():
    import numpy as np

    from minimel_spark.operators.multimodal import encode_ppm, parse_ppm, resize_ppm

    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(6, 4, 3)
    assert (parse_ppm(encode_ppm(img)) == img).all()
    small = parse_ppm(resize_ppm(encode_ppm(img), width=2, height=3))
    assert small.shape == (3, 2, 3)
    # nearest-neighbor: top-left pixel survives
    assert (small[0, 0] == img[0, 0]).all()


def test_real_wav_roundtrip():
    import io
    import wave

    import numpy as np

    from minimel_spark.operators.multimodal import audio_features, parse_wav

    pcm = (np.sin(2 * np.pi * 440 * np.arange(800) / 8000) * 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(pcm.tobytes())
    x, rate = parse_wav(buf.getvalue())
    assert rate == 8000 and len(x) == 800
    assert abs(float(np.abs(x).max()) - 1.0) < 0.01
    f = audio_features(x, rate)
    assert len(f) == 64 and f[-2] > 0.5  # rms of a full-scale sine ~ 0.707


def test_extract_features_real_decode(spark, media):
    """fake=False runs the ACTUAL PPM/WAV decoders over synth_media's genuine
    payloads — deterministic, 64-dim, and different from the fake stand-in."""
    real = {r["media_id"]: r["feature"] for r in extract_features(media, fake=False).collect()}
    fake = {r["media_id"]: r["feature"] for r in extract_features(media, fake=True).collect()}
    assert len(real) == 32 and all(len(v) == 64 for v in real.values())
    assert real != fake
    again = {
        r["media_id"]: r["feature"]
        for r in extract_features(media.repartition(5), fake=False).collect()
    }
    assert real == again


def test_resize_images_real(spark, media):
    out = resize_images(media, width=4, height=4, fake=False)
    rows = out.collect()
    assert rows and all(r["width"] == 4 and r["height"] == 4 for r in rows)
    from minimel_spark.operators.multimodal import parse_ppm

    assert all(parse_ppm(bytes(r["payload"])).shape == (4, 4, 3) for r in rows)


def test_repartition_by_bytes(spark, media):
    out = repartition_by_bytes(media, target_bytes_per_partition=2048)
    assert out.count() == 32
    assert out.rdd.getNumPartitions() >= 2


def test_repartition_by_bytes_packs_by_bytes_not_hash(spark):
    """VERDICT r2 #6: the packing must be byte-TRUE. One 1 MB blob among 10^3
    1 KB blobs at a 64 KB target: every bucket holds < target + its first
    blob, the monster blob sits in a bucket of its own, and partition loads
    are whole buckets (never id-hash co-location of heavy blobs)."""
    import pyspark.sql.functions as F

    from minimel_spark.operators.multimodal import byte_pack_buckets

    target = 64 << 10
    rows = [("big0000", b"\xab" * (1 << 20))] + [
        (f"s{i:06d}", bytes([i % 251]) * 1024) for i in range(1000)
    ]
    media = spark.createDataFrame(rows, "media_id string, payload binary")

    buckets = byte_pack_buckets(media, target).join(
        media.select("media_id", F.length("payload").alias("nb")), "media_id"
    )
    per_bucket = (
        buckets.groupBy("_byte_bucket")
        .agg(
            F.sum("nb").alias("bytes"),
            F.count(F.lit(1)).alias("n"),
            F.max("nb").alias("max_nb"),
        )
        .collect()
    )
    # strict packing invariant: at most target bytes besides the heaviest
    # blob per bucket — a monster blob can drag along < target of neighbors,
    # never another monster
    for r in per_bucket:
        assert r["bytes"] - r["max_nb"] < target, dict(r.asDict())
    # ~ (1MB + 1000KB)/64KB bucket-widths, minus the ~15 widths the 1 MB blob
    # swallows into a single bucket: many buckets, not one hash blob-pile
    assert len(per_bucket) >= 15

    # end-to-end: partition loads are unions of whole buckets
    out = repartition_by_bytes(media, target_bytes_per_partition=target)
    pid = out.withColumn("pid", F.spark_partition_id())
    loads = (
        pid.groupBy("pid")
        .agg(F.sum(F.length("payload")).alias("bytes"))
        .collect()
    )
    # nparts = max bucket id + 1 (bucket ids are sparse around monster blobs)
    assert out.rdd.getNumPartitions() == max(r["_byte_bucket"] for r in per_bucket) + 1
    # worst case = a few whole buckets colliding; never a byte-blind pile-up
    for r in loads:
        assert r["bytes"] <= 4 * (target + (1 << 20)), dict(r.asDict())
    # determinism: same input, same bucketing, any input partitioning
    again = byte_pack_buckets(media.repartition(7), target)
    want = sorted(map(tuple, byte_pack_buckets(media, target).collect()))
    assert sorted(map(tuple, again.collect())) == want


def test_byte_pack_buckets_no_single_partition_window(spark):
    """VERDICT r3 #4: the cumsum must be a distributed prefix sum — the
    physical plan may not funnel the projection through a single-partition
    exchange (the old global Window.orderBy did, and Spark warned)."""
    import pyspark.sql.functions as F

    from minimel_spark.operators.multimodal import byte_pack_buckets

    rows = [(f"x{i:04d}", bytes([i % 251]) * (100 + i)) for i in range(200)]
    media = spark.createDataFrame(rows, "media_id string, payload binary")
    out = byte_pack_buckets(media, 4096)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    # the invariant the operator exists for still holds
    per_bucket = (
        out.join(media.select("media_id", F.length("payload").alias("nb")), "media_id")
        .groupBy("_byte_bucket")
        .agg(F.sum("nb").alias("bytes"), F.max("nb").alias("max_nb"))
        .collect()
    )
    for r in per_bucket:
        assert r["bytes"] - r["max_nb"] < 4096, dict(r.asDict())


def test_sniff_mime_routes_by_bytes_not_labels(spark):
    import pyspark.sql.functions as F

    from minimel_spark.operators.multimodal import sniff_mime, synth_media

    # real synthesized payloads: PPM images and RIFF/WAVE audio
    media = synth_media(spark, 12)
    out = {
        (r["kind"], r["mime"])
        for r in sniff_mime(media).select("kind", "mime").distinct().collect()
    }
    assert ("image", "image/x-portable-pixmap") in out
    assert ("audio", "audio/wav") in out
    # planted families, including the RIFF-but-not-WAVE split and fallback
    planted = spark.createDataFrame(
        [
            ("png", "89504E470D0A1A0A00"),
            ("riff_avi", "52494646111122224156492000"),
            ("html", "3C68746D6C3E"),
            ("junk", "00FFEE"),
        ],
        "tag string, hx string",
    ).select("tag", F.unhex("hx").alias("payload"))
    got = {r["tag"]: r["mime"] for r in sniff_mime(planted).collect()}
    assert got == {
        "png": "image/png",
        "riff_avi": "application/riff",
        "html": "text/html",
        "junk": "application/octet-stream",
    }


def test_ahash_py_known_pattern():
    import numpy as np

    from minimel_spark.operators.multimodal import ahash_py

    # left half black, right half white, 16x16 -> left 32 bits 0, right 1
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[:, 8:, :] = 255
    bits = ahash_py(img, grid=8)
    assert len(bits) == 64
    for i in range(8):
        row = bits[i * 8 : (i + 1) * 8]
        assert row == "00001111", row
    # uniform image: every cell equals the mean -> all ones (>= comparison)
    uni = np.full((10, 10, 3), 77, dtype=np.uint8)
    assert ahash_py(uni) == "1" * 64


def test_image_ahash_matches_driver_side(spark):
    from minimel_spark.operators.multimodal import (
        ahash_py,
        image_ahash,
        parse_ppm,
        synth_media,
    )

    media = synth_media(spark, n=16)
    got = {
        r["media_id"]: r["ahash_bits"] for r in image_ahash(media).collect()
    }
    rows = media.where("kind = 'image'").collect()
    assert len(got) == len(rows) > 0
    for r in rows:
        assert got[r["media_id"]] == ahash_py(parse_ppm(bytes(r["payload"])))
    # robustness: identical pixels re-encoded -> identical hash
    import pytest as _pytest

    with _pytest.raises(ValueError):
        image_ahash(media, grid=1)


def test_envelope_py_known_pattern():
    import numpy as np

    from minimel_spark.operators.multimodal import envelope_py

    # first half silent, second half loud, 128 samples over 64 windows
    pcm = np.concatenate(
        [np.zeros(64, dtype=np.int16), np.full(64, 1000, dtype=np.int16)]
    )
    bits = envelope_py(pcm, windows=64)
    assert bits == "0" * 32 + "1" * 32
    # gain invariance: scaling all samples leaves the hash unchanged
    assert envelope_py((pcm * 20).astype(np.int16), 64) == bits
    # constant signal: every window equals the mean -> all ones
    assert envelope_py(np.full(200, 5, dtype=np.int16), 64) == "1" * 64
    assert envelope_py(np.zeros(0, dtype=np.int16), 8) == "0" * 8


def test_audio_envelope_hash_matches_driver_side(spark):
    from minimel_spark.operators.multimodal import (
        audio_envelope_hash,
        envelope_py,
        parse_wav_pcm,
        synth_media,
    )

    media = synth_media(spark, n=16)
    got = {
        r["media_id"]: r["env_bits"]
        for r in audio_envelope_hash(media).collect()
    }
    rows = media.where("kind = 'audio'").collect()
    assert len(got) == len(rows) > 0
    for r in rows:
        assert got[r["media_id"]] == envelope_py(parse_wav_pcm(bytes(r["payload"])))
    import pytest as _pytest

    with _pytest.raises(ValueError):
        audio_envelope_hash(media, windows=1)


def test_whash_py_matches_rational_reference():
    from fractions import Fraction

    import numpy as np

    from minimel_spark.operators.multimodal import whash_py

    def naive(im, g=8):
        h, w = im.shape[:2]
        px = im.astype(np.int64).sum(axis=2)
        cells = [[[] for _ in range(g)] for _ in range(g)]
        for y in range(h):
            for x in range(w):
                cells[y * g // h][x * g // w].append(int(px[y, x]))
        mean = [
            [Fraction(sum(c), len(c)) if c else Fraction(0) for c in row]
            for row in cells
        ]

        def sgn(u, i):
            return -1 if bin(u & i).count("1") % 2 else 1

        C = [
            [
                sum(
                    sgn(u, i) * sgn(v, j) * mean[i][j]
                    for i in range(g)
                    for j in range(g)
                )
                for v in range(g)
            ]
            for u in range(g)
        ]
        flat = [C[u][v] for u in range(g) for v in range(g)]
        ac = sorted(flat[1:])
        med = ac[(len(ac) - 1) // 2]
        return "".join("1" if v > med else "0" for v in flat)

    rng = np.random.RandomState(11)
    for h, w in [(12, 16), (6, 9), (8, 8), (30, 41), (7, 7), (9, 6)]:
        im = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert whash_py(im) == naive(im), (h, w)


def test_whash_py_brightness_invariance_exact():
    import numpy as np
    import pytest as _pytest

    from minimel_spark.operators.multimodal import whash_py

    rng = np.random.RandomState(13)
    # no saturation: pixels stay in range after the +40 shift, and no empty
    # cells (h, w >= grid) so the constant shifts only the DC coefficient
    img = rng.randint(0, 200, size=(12, 16, 3), dtype=np.uint8)
    a, b = whash_py(img), whash_py((img.astype(int) + 40).astype(np.uint8))
    assert a[1:] == b[1:]
    # uniform image: every AC coefficient is 0 = the median -> strict '>'
    # makes all AC bits 0, DC is positive -> leading 1
    uni = np.full((16, 16, 3), 77, dtype=np.uint8)
    assert whash_py(uni) == "1" + "0" * 63
    with _pytest.raises(ValueError):
        whash_py(img, grid=6)


def test_image_whash_matches_driver_side(spark):
    import numpy as np
    import pytest as _pytest

    from minimel_spark.operators.multimodal import (
        image_whash,
        parse_ppm,
        synth_media,
        whash_py,
    )

    media = synth_media(spark, n=16)
    got = {r["media_id"]: r["whash_bits"] for r in image_whash(media).collect()}
    rows = media.where("kind = 'image'").collect()
    assert len(got) == len(rows) > 0
    for r in rows:
        assert got[r["media_id"]] == whash_py(parse_ppm(bytes(r["payload"])))
    a = sorted(map(tuple, image_whash(media.coalesce(1)).collect()))
    b = sorted(map(tuple, image_whash(media.repartition(8)).collect()))
    assert a == b
    with _pytest.raises(ValueError):
        image_whash(media, grid=5)
