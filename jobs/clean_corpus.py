"""spark-submit entry point: the corpus cleaning pass (filter chain).

Usage:
    spark-submit --py-files ndd.zip jobs/clean_corpus.py \
        --input /path/to/pages_parquet --output /path/to/clean \
        [--id-col url] [--text-col text] \
        [--min-tokens 20] [--max-tokens 100000] \
        [--max-dup-line-frac 0.3] [--max-boiler-frac 0.5] \
        [--boiler-min-docs 3] [--benchmark /path/to/benchmark_parquet] \
        [--report-only]

Runs operators/filter_chain.py over a parquet corpus: token bounds →
Gopher duplicate-line fraction → corpus boilerplate share → (optional)
benchmark n-gram contamination, each doc attributed to its FIRST failing
gate. Writes the kept rows (original columns) to --output unless
--report-only, and always prints one JSON line with the per-reason counts
— the tuning dashboard for the chain.

Reference analog: the reference's drop-gate for videos whose extraction
produced nothing usable (ndd/server_ndd.py:246-261), promoted to the
webtext cleaning pass a training pipeline runs before dedup.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output")
    ap.add_argument("--id-col", default="url")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--min-tokens", type=int, default=20)
    ap.add_argument("--max-tokens", type=int, default=100_000)
    ap.add_argument("--max-dup-line-frac", type=float, default=0.3)
    ap.add_argument("--max-boiler-frac", type=float, default=0.5)
    ap.add_argument("--boiler-min-docs", type=int, default=3)
    ap.add_argument("--line-width", type=int, default=3)
    ap.add_argument("--benchmark", help="parquet with a text column")
    ap.add_argument("--decontaminate-k", type=int, default=8)
    ap.add_argument("--report-only", action="store_true")
    args = ap.parse_args(argv)
    if not args.output and not args.report_only:
        ap.error("--output is required unless --report-only")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from near_duplicate_detection_spark.operators.filter_chain import (
        annotate_reject_reason,
    )

    spark = SparkSession.builder.appName("ndd-clean").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    docs = spark.read.parquet(args.input)
    bench = (
        spark.read.parquet(args.benchmark).select(args.text_col)
        if args.benchmark
        else None
    )
    ann = annotate_reject_reason(
        docs,
        id_col=args.id_col,
        text_col=args.text_col,
        min_tokens=args.min_tokens,
        max_tokens=args.max_tokens,
        max_dup_line_frac=args.max_dup_line_frac,
        max_boiler_frac=args.max_boiler_frac,
        boiler_min_docs=args.boiler_min_docs,
        line_width=args.line_width,
        benchmark=bench,
        decontaminate_k=args.decontaminate_k,
    )
    # one annotated plan feeds both outputs; materialize it once
    ann = ann.localCheckpoint()

    if not args.report_only:
        ann.where(F.col("reject_reason") == "kept").drop(
            "reject_reason"
        ).write.mode("overwrite").parquet(args.output)

    report = {
        r["reject_reason"]: r["n"]
        for r in ann.groupBy("reject_reason")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    print(
        json.dumps(
            {
                "docs": sum(report.values()),
                "kept": report.get("kept", 0),
                "reasons": report,
                "output": args.output if not args.report_only else None,
            },
            sort_keys=True,
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
