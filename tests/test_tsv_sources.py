"""Reference-format TSV sources/sinks (S3/S8/K6; D2/D11/D12)."""

import pyspark.sql.functions as F

from minimel_spark.sources.tsv import (
    read_paragraph_links_tsv,
    read_run_tsv,
    sniff_run_tsv_arity,
    write_predictions_tsv,
)
from minimel_spark.sources.wikidata import disambig_fixture


def _write(tmp_path, name, lines):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_paragraph_links_tsv(spark, tmp_path):
    path = _write(
        tmp_path, "pars.tsv",
        ['Page_A\t{"acme": 7, "globex": 9}\tacme bought globex'],
    )
    row = read_paragraph_links_tsv(spark, path).first()
    assert row["url"] == "Page_A"
    assert dict(row["links"]) == {"acme": 7, "globex": 9}
    assert row["text"] == "acme bought globex"


def test_run_tsv_arity_sniffing(spark, tmp_path):
    p1 = _write(tmp_path, "one.tsv", ["just some text", "more text"])
    p2 = _write(tmp_path, "two.tsv", ["d1\tsome text", "d2\tmore"])
    p3 = _write(tmp_path, "three.tsv", ['d1\t{"acme": 7}\tsome text'])
    assert sniff_run_tsv_arity(spark, p1) == 1
    assert sniff_run_tsv_arity(spark, p2) == 2
    assert sniff_run_tsv_arity(spark, p3) == 3
    df1, df2, df3 = (read_run_tsv(spark, p) for p in (p1, p2, p3))
    assert df1.columns == df2.columns == df3.columns == ["doc_id", "gold", "text"]
    assert df1.where(F.col("gold").isNotNull()).count() == 0
    assert {r["doc_id"] for r in df2.collect()} == {"d1", "d2"}
    assert dict(df3.first()["gold"]) == {"acme": 7}
    # 1-col doc ids are content-stable
    again = read_run_tsv(spark, p1)
    assert {r["doc_id"] for r in df1.collect()} == {r["doc_id"] for r in again.collect()}


def test_predictions_tsv_roundtrip(spark, tmp_path):
    preds = spark.createDataFrame(
        [("d1", "acme", 7), ("d1", "globex", 9), ("d2", "acme", 7)],
        "doc_id string, name string, pred_qid long",
    )
    out = str(tmp_path / "preds")
    write_predictions_tsv(preds, out)
    back = spark.read.option("sep", "\t").csv(out, schema="doc_id string, pred_json string")
    got = {r["doc_id"]: r["pred_json"] for r in back.collect()}
    assert got == {
        "d1": '{"acme":7,"globex":9}',
        "d2": '{"acme":7}',
    }
    # ADVICE r2: with the full input doc set, docs with zero resolved
    # mentions still emit a reference-format 'id\t{}' line (run.py:291-300)
    docs = spark.createDataFrame([("d1",), ("d2",), ("d3",)], "doc_id string")
    write_predictions_tsv(preds, out, all_doc_ids=docs)
    back = spark.read.option("sep", "\t").csv(out, schema="doc_id string, pred_json string")
    got = {r["doc_id"]: r["pred_json"] for r in back.collect()}
    assert got == {
        "d1": '{"acme":7,"globex":9}',
        "d2": '{"acme":7}',
        "d3": "{}",
    }


def test_disambig_fixture(spark):
    d = disambig_fixture(spark, [("Mercury_(disambiguation)", 1)])
    assert d.columns == ["title", "qid"] and d.count() == 1


def test_iceberg_plumbing_gated(spark):
    """Iceberg helpers: capability probe is honest (no jar in this sandbox),
    conf helper emits the standard catalog config, and read/write fail with
    the runtime hint instead of an opaque ClassNotFound."""
    import pytest

    from minimel_spark.sources.iceberg import (
        has_iceberg,
        iceberg_session_conf,
        read_iceberg,
        write_iceberg,
    )

    conf = iceberg_session_conf("c", "file:///tmp/w")
    assert conf["spark.sql.catalog.c"] == "org.apache.iceberg.spark.SparkCatalog"
    assert conf["spark.sql.catalog.c.warehouse"] == "file:///tmp/w"
    if has_iceberg(spark):
        import pytest
        pytest.skip("iceberg runtime present; gated-error path not applicable")
    df = spark.range(1)
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        write_iceberg(df, "c.db.t")
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        read_iceberg(spark, "c.db.t")
