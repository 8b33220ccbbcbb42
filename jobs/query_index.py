"""spark-submit entry point: top-k near-duplicate query against a built index.

Usage:
    spark-submit --py-files ndd.zip jobs/query_index.py \
        --catalog /path/to/catalog --text "query text ..." [--k 30]

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
    ap.add_argument("--text", required=True)
    ap.add_argument("--k", type=int, default=30)  # W4 default (client_flask.py:123)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from near_duplicate_detection_spark.config import NDDConfig
    from near_duplicate_detection_spark.lineage import StageCatalog
    from near_duplicate_detection_spark.pipeline import query_top_k

    spark = SparkSession.builder.appName("ndd-query").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    catalog = StageCatalog(spark, args.catalog)
    hits = query_top_k(spark, catalog, NDDConfig(), args.text, k=args.k)
    for row in hits.collect():
        print(f"{row.jaccard:.4f}\t{row.cluster_id}\t{row.url}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
