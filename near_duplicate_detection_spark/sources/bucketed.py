"""Bucketed stage tables: co-located url-keyed joins with zero shuffle.

Every cross-stage join in the engine keys on `url` (signatures ⋈ pairs,
pairs ⋈ pages for verify, clusters ⋈ pages for the report). When stage
tables share ONE bucketing on that key, Spark's bucketed scan gives each of
those joins for free — no Exchange on either side, `Bucketed: true` in the
scan, SelectedBucketsCount pruning on point lookups. At 100 TB that removes
the largest repeated shuffle class the pipeline has (the verify-side url
joins); on Iceberg the same declaration is `bucket(N, url)` partition
transforms, which is exactly how the production table would be laid out
(TESTDATA/BASELINE input_hint: Iceberg pages table).

The default StageCatalog (lineage.py) stays on plain parquet dirs — its
per-bucket lineage/resume layout is measured and the scaling evidence
(BENCH/BASELINE.md) is pinned to it. This module is the co-location path
for DERIVED marts: write once bucketed, join many times shuffle-free.

Spark requirement: bucketed tables must live in a catalog (saveAsTable) —
`spark.sql.warehouse.dir` decides where; use `database` to namespace.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str = "url",
    n_buckets: int = 64,
    sort: bool = True,
) -> None:
    """Persist df as a bucketed (and bucket-sorted) catalog table.

    Sorting within buckets lets SortMergeJoin skip its Sort too when both
    sides declare sortBy(key) — the join degenerates to a streaming merge
    per bucket pair.
    """
    w = df.write.bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.format("parquet").mode("overwrite").saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    return spark.table(name)


def colocated_join(
    spark: SparkSession, left: str, right: str, key: str = "url", how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables — plans with no Exchange."""
    return spark.table(left).join(spark.table(right), key, how)
