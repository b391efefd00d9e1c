"""spark-submit entry point (north rule: "runs via spark-submit --py-files").

Usage (cluster):
    zip -r minimel_spark.zip minimel_spark
    spark-submit --py-files minimel_spark.zip -m minimel_spark \\
        pipeline --pages s3://…/pages --index s3://…/title_index \\
        --workdir s3://…/run1 [--min-count 2] [--cluster-threshold 0.5] …

Usage (sandbox):
    python -m minimel_spark pipeline --pages /tmp/pages.parquet \\
        --index /tmp/index.parquet --workdir /tmp/run1

Subcommands mirror the reference CLI surface (minimel/__main__.py:24-75 maps
subcommands to the experiment DAG); here each subcommand is one Spark job and
``pipeline`` is the whole DAG with checkpoint/resume (rerunning with the same
--workdir resumes from the last committed stage).
"""

from __future__ import annotations

import argparse
import sys


def _spark(args):
    from .session import get_spark

    return get_spark("minimel_spark", master=args.master)


def cmd_pipeline(args) -> int:
    from .pipeline import PipelineConfig, run_pipeline

    spark = _spark(args)
    pages = spark.read.parquet(args.pages)
    index = spark.read.parquet(args.index)
    cfg = PipelineConfig(
        language=args.language,
        min_count=args.min_count,
        cluster_threshold=args.cluster_threshold,
        match_threshold=args.match_threshold,
        max_pairs_per_block=args.max_pairs_per_block,
    )
    out = run_pipeline(spark, pages, index, workdir=args.workdir, config=cfg)
    n = out["er_clusters"].count()
    k = out["er_clusters"].select("cluster_id").distinct().count()
    print(f"er_clusters: {n} records in {k} clusters -> {args.workdir}/er_clusters")
    return 0


def cmd_count(args) -> int:
    from .operators.count import anchor_counts
    from .operators.extract import extract_paragraphs

    spark = _spark(args)
    pages = spark.read.parquet(args.pages)
    index = spark.read.parquet(args.index)
    counts = anchor_counts(
        extract_paragraphs(pages, index), args.language, min_count=args.min_count
    )
    counts.write.mode("overwrite").parquet(args.out)
    print(f"anchor_counts -> {args.out}")
    return 0


def cmd_dedup(args) -> int:
    from .operators.dedup import minhash_dups

    spark = _spark(args)
    docs = spark.read.parquet(args.docs)
    dups = minhash_dups(docs, threshold=args.threshold)
    dups.write.mode("overwrite").parquet(args.out)
    print(f"minhash dup pairs -> {args.out}")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="minimel_spark")
    p.add_argument("--master", default=None, help="override spark master")
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("pipeline", help="full ER pipeline with checkpoint/resume")
    pp.add_argument("--pages", required=True)
    pp.add_argument("--index", required=True)
    pp.add_argument("--workdir", required=True)
    pp.add_argument("--language", default=None)
    pp.add_argument("--min-count", type=int, default=2)
    pp.add_argument("--cluster-threshold", type=float, default=0.5)
    pp.add_argument("--match-threshold", type=float, default=0.5)
    pp.add_argument("--max-pairs-per-block", type=int, default=10_000)
    pp.set_defaults(fn=cmd_pipeline)

    pc = sub.add_parser("count", help="extraction + anchor statistics only")
    pc.add_argument("--pages", required=True)
    pc.add_argument("--index", required=True)
    pc.add_argument("--out", required=True)
    pc.add_argument("--language", default=None)
    pc.add_argument("--min-count", type=int, default=2)
    pc.set_defaults(fn=cmd_count)

    pd = sub.add_parser("dedup", help="MinHash-LSH near-duplicate detection")
    pd.add_argument("--docs", required=True)
    pd.add_argument("--out", required=True)
    pd.add_argument("--threshold", type=float, default=0.8)
    pd.set_defaults(fn=cmd_dedup)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
