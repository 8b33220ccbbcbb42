"""spark-submit entry point: dedup report over a built catalog.

Usage:
    spark-submit --py-files ndd.zip jobs/dedup_report.py \
        --catalog /path/to/catalog [--top 20]

Prints one JSON line with corpus-level dedup statistics — the numbers a
training-data pipeline decides with (how much of the crawl is redundant,
what survives dedup, where the mass sits):

  docs, clusters, dup_docs (docs sharing a cluster), dup_rate,
  survivors (one representative per cluster), reduction_pct,
  cluster_size_histogram (log2 buckets), top clusters by size.

All aggregates are single groupBy passes over the clusters table; the
histogram groups on a log2 bucket expression (no driver-side iteration).
The reference has no reporting surface at all — its closest analog is the
index-size print at startup (ndd/server_ndd.py:257).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--catalog", required=True)
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from near_duplicate_detection_spark.lineage import StageCatalog
    from near_duplicate_detection_spark.pipeline import patched_clusters

    spark = SparkSession.builder.appName("ndd-report").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    catalog = StageCatalog(spark, args.catalog)

    clusters = patched_clusters(catalog)
    sizes = clusters.groupBy("cluster_id").agg(F.count("*").alias("size"))

    stats = sizes.agg(
        F.sum("size").alias("docs"),
        F.count("*").alias("n_clusters"),
        F.sum(F.when(F.col("size") > 1, F.col("size")).otherwise(0)).alias(
            "dup_docs"
        ),
    ).first()
    docs, n_clusters, dup_docs = stats.docs, stats.n_clusters, stats.dup_docs

    hist_rows = (
        sizes.groupBy(
            F.pow(F.lit(2), F.floor(F.log2("size"))).cast("bigint").alias("bucket")
        )
        .agg(F.count("*").alias("n_clusters"))
        .orderBy("bucket")
        .collect()
    )
    top_rows = (
        sizes.orderBy(F.desc("size"), F.asc("cluster_id"))
        .limit(args.top)
        .collect()
    )

    print(
        json.dumps(
            {
                "docs": docs,
                "clusters": n_clusters,
                "dup_docs": dup_docs,
                "dup_rate": round(dup_docs / docs, 6) if docs else 0.0,
                "survivors": n_clusters,
                "reduction_pct": round(100.0 * (docs - n_clusters) / docs, 4)
                if docs
                else 0.0,
                "cluster_size_histogram": {
                    str(r.bucket): r.n_clusters for r in hist_rows
                },
                "top_clusters": [
                    {"cluster_id": r.cluster_id, "size": r.size} for r in top_rows
                ],
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
