"""spark-submit entry point: top-k near-duplicate query against a built index.

Usage:
    spark-submit --py-files ndd.zip jobs/query_index.py \
        --catalog /path/to/catalog --text "query text ..." [--k 30]
    spark-submit --py-files ndd.zip jobs/query_index.py \
        --catalog /path/to/catalog --queries-tsv queries.tsv [--k 30]
    spark-submit --py-files ndd.zip jobs/query_index.py \
        --catalog /path/to/catalog --serve QUERIES_DIR \
        --out RESULTS_DIR --checkpoint CKPT_DIR [--continuous] [--k 30]

--queries-tsv resolves a whole table of queries (TSV: query_id<TAB>text)
in ONE Spark plan via query_top_k_batch — the batch path the reference's
per-request server cannot express.

--serve is the continuous analog of the reference's server loop: a
file-source stream of (query_id, text) parquet drops under QUERIES_DIR,
each micro-batch answered against the catalog's CURRENT committed index
and written to RESULTS_DIR/batch_id=N (streaming/serving.py — idempotent
per-batch sink, checkpointed exactly-once file consumption). Default
drains what's queued and exits (backfill); --continuous keeps serving.

Engine equivalent of the reference's similarity query endpoint
(ndd/server_ndd.py:271-306), minus the Flask wrapper: signature probe →
LSH band broadcast join → exact-Jaccard verify → one hit per cluster →
top-k (SURVEY §3.1).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--catalog", required=True)
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--text")
    g.add_argument("--queries-tsv")
    g.add_argument("--serve", metavar="QUERIES_DIR")
    ap.add_argument("--out", help="--serve results dir")
    ap.add_argument("--checkpoint", help="--serve checkpoint dir")
    ap.add_argument(
        "--continuous",
        action="store_true",
        help="--serve: keep running instead of drain-and-exit",
    )
    ap.add_argument("--k", type=int, default=30)  # W4 default (client_flask.py:123)
    args = ap.parse_args(argv)
    if args.serve and not (args.out and args.checkpoint):
        ap.error("--serve requires --out and --checkpoint")

    from pyspark.sql import SparkSession

    from near_duplicate_detection_spark.config import NDDConfig
    from near_duplicate_detection_spark.lineage import StageCatalog
    from near_duplicate_detection_spark.pipeline import query_top_k, query_top_k_batch

    spark = SparkSession.builder.appName("ndd-query").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    catalog = StageCatalog(spark, args.catalog)
    if args.serve is not None:
        from near_duplicate_detection_spark.streaming.serving import (
            query_file_stream,
            serve_queries,
        )

        q = serve_queries(
            spark,
            catalog,
            NDDConfig(),
            query_file_stream(spark, args.serve),
            args.out,
            args.checkpoint,
            k=args.k,
            available_now=not args.continuous,
        )
        q.awaitTermination()
        return 0
    if args.text is not None:
        hits = query_top_k(spark, catalog, NDDConfig(), args.text, k=args.k)
        for row in hits.collect():
            print(f"{row.jaccard:.4f}\t{row.cluster_id}\t{row.url}")
        return 0
    queries = (
        spark.read.option("sep", "\t")
        # raw TSV: no quote/escape processing — query text must reach the
        # signature UDF byte-identical to the file content
        .option("quote", "")
        .option("escape", "")
        .schema("query_id string, text string")
        .csv(args.queries_tsv)
    )
    hits = query_top_k_batch(spark, catalog, NDDConfig(), queries, k=args.k)
    for row in hits.orderBy("query_id", "rank").collect():
        print(f"{row.query_id}\t{row.rank}\t{row.jaccard:.4f}\t{row.cluster_id}\t{row.url}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
