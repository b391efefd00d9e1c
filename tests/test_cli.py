"""spark-submit CLI surface: the reference's count/clean/run/eval workflow
driven end to end through `python -m minimel_spark` subcommands."""

import json

import pyspark.sql.functions as F

from minimel_spark.__main__ import main


def test_cli_predict_evaluate_roundtrip(spark, tmp_path):
    """predict: run-TSV texts -> mention detection -> cascade -> reference
    TSV; evaluate: gold TSV vs that TSV -> scores. Mirrors reference
    run.py:141-300 + 59-76."""
    counts = spark.createDataFrame(
        [("acme", 7, 5), ("acme", 8, 1), ("globex", 9, 3)],
        "anchor string, qid long, cnt long",
    )
    counts_path = str(tmp_path / "counts.parquet")
    counts.write.parquet(counts_path)

    gold_tsv = tmp_path / "gold.tsv"
    gold_tsv.write_text(
        'd1\t{"acme": 7, "globex": 9}\tacme bought globex today\n'
        'd2\t{"acme": 8}\tacme was founded long ago\n'
    )
    out = str(tmp_path / "preds")
    rc = main([
        "--master", "local[4]",
        "predict", "--texts", str(gold_tsv), "--counts", counts_path, "--out", out,
    ])
    assert rc == 0
    lines = sorted(
        line
        for part in (tmp_path / "preds").glob("part-*")
        for line in part.read_text().splitlines()
    )
    parsed = {line.split("\t")[0]: json.loads(line.split("\t")[1]) for line in lines}
    # most-common-sense picks qid 7 for 'acme' everywhere (d2's gold is 8)
    assert parsed == {"d1": {"acme": 7, "globex": 9}, "d2": {"acme": 7}}

    rc = main(
        ["--master", "local[4]", "evaluate", "--gold", str(gold_tsv), "--pred", out]
    )
    assert rc == 0


def test_cli_clean_and_embed(spark, tmp_path):
    counts = spark.createDataFrame(
        [("acme", 7, 5), ("acme", 8, 2), ("solo", 1, 9)],
        "anchor string, qid long, cnt long",
    )
    cp = str(tmp_path / "c.parquet")
    counts.write.parquet(cp)
    index = spark.createDataFrame([("Acme", 7), ("Acme_(x)", 8)], "title string, qid long")
    ip = str(tmp_path / "i.parquet")
    index.write.parquet(ip)
    out = str(tmp_path / "cands.parquet")
    rc = main([
        "--master", "local[4]",
        "clean", "--counts", cp, "--index", ip, "--out", out, "--min-count", "1",
    ])
    assert rc == 0
    got = {(r["anchor"], r["qid"]) for r in spark.read.parquet(out).collect()}
    assert got == {("acme", 7), ("acme", 8)}  # 'solo' fails the ambiguity filter

    docs = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    dp = str(tmp_path / "docs.parquet")
    docs.write.parquet(dp)
    ep = str(tmp_path / "emb.parquet")
    rc = main(["--master", "local[4]", "embed", "--docs", dp, "--out", ep, "--dim", "8"])
    assert rc == 0
    emb = spark.read.parquet(ep).first()
    assert len(emb["embedding"]) == 8
    assert abs(sum(x * x for x in emb["embedding"]) - 1.0) < 1e-9


def test_cli_disambig(spark, tmp_path):
    pages = spark.createDataFrame(
        [("https://x/wiki/Dab", "* [[Acme_(0)]]\n* [[Nope]]",)],
        "url string, text string",
    ).select("url", F.lit(None).cast("timestamp").alias("warc_ts"),
             F.lit(None).cast("binary").alias("html"), "text",
             F.lit("en").alias("lang"))
    pp = str(tmp_path / "pages.parquet")
    pages.write.parquet(pp)
    index = spark.createDataFrame([("Acme_(0)", 100)], "title string, qid long")
    ip = str(tmp_path / "idx.parquet")
    index.write.parquet(ip)
    out = str(tmp_path / "dab.parquet")
    rc = main(["--master", "local[4]", "disambig", "--pages", pp, "--index", ip, "--out", out])
    assert rc == 0
    assert {(r["title"], r["qid"]) for r in spark.read.parquet(out).collect()} == {("Dab", 100)}
