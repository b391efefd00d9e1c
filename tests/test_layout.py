"""Z-order layout: Morton-key parity with a Python reference, bucket
boundary exactness, and the data-skipping property itself — per-file
min-max spans on the SECOND dimension must be far tighter than a linear
single-column sort gives."""

import pyspark.sql.functions as F
import pytest

from minimel_spark.operators.layout import (
    interleave_bits,
    rank_bucket,
    zorder_keys,
    zorder_write,
)


def _py_morton(vals, bits):
    out = 0
    for i, v in enumerate(vals):
        for j in range(bits):
            out |= ((v >> j) & 1) << (j * len(vals) + i)
    return out


def test_interleave_parity_with_python(spark):
    rows = [(a, b) for a in range(8) for b in range(8)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.withColumn(
            "z", interleave_bits([F.col("a"), F.col("b")], 3)
        ).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _py_morton([a, b], 3)
    # distinct inputs -> distinct keys (it is a bijection on the grid)
    assert len(set(got.values())) == 64


def test_rank_bucket_semantics(spark):
    df = spark.createDataFrame([(float(x),) for x in range(10)], "x double")
    out = {
        r["x"]: r["b"]
        for r in df.withColumn(
            "b", rank_bucket(F.col("x"), [2.0, 5.0, 7.0])
        ).collect()
    }
    assert out[1.0] == 0 and out[2.0] == 1  # boundary is inclusive (<=)
    assert out[6.0] == 2 and out[9.0] == 3


def test_zorder_keys_validation_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, float(i % 17), float((i * 7) % 23)) for i in range(300)],
        "id long, x double, y double",
    )
    with pytest.raises(ValueError):
        zorder_keys(df, [], bits=4)
    with pytest.raises(ValueError):
        zorder_keys(df, ["x"], bits=0)
    a, ba = zorder_keys(df, ["x", "y"], bits=3)
    b, bb = zorder_keys(df.repartition(13), ["x", "y"], bits=3)
    assert ba == bb  # exact boundaries are parallelism-invariant
    assert sorted(map(tuple, a.select("id", "zkey").collect())) == sorted(
        map(tuple, b.select("id", "zkey").collect())
    )


def test_zorder_write_skips_on_second_dim(spark, tmp_path):
    """The point of the layout: after zorder_write on (x, y), per-file
    min-max spans of y cover a SMALL fraction of y's range, while a plain
    x-sorted layout leaves every file spanning ~all of y."""
    n = 4096
    # independent dims: x row-major, y a full-period multiplicative cycle
    rows = [(i, float(i // 64), float((i * 37) % 64)) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, x double, y double")

    zdir = str(tmp_path / "z")
    zorder_write(df, ["x", "y"], zdir, n_files=16, bits=3)

    ldir = str(tmp_path / "linear")
    df.repartitionByRange(16, F.col("x")).sortWithinPartitions("x").write.mode(
        "overwrite"
    ).parquet(ldir)

    def mean_y_span(path):
        spans = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name())
            .agg((F.max("y") - F.min("y")).alias("span"))
            .collect()
        )
        assert len(spans) >= 8
        return sum(r["span"] for r in spans) / len(spans)

    z_span, l_span = mean_y_span(zdir), mean_y_span(ldir)
    # linear layout: every x-file sees nearly the full y range (~63);
    # z-order: files cover a contiguous z-range => both dims bounded
    assert l_span > 50
    assert z_span < l_span / 2
    # row content is preserved exactly
    assert sorted(map(tuple, spark.read.parquet(zdir).collect())) == sorted(rows)
