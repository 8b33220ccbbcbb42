"""Bucketed co-located joins (sources/bucketed.py): url-keyed stage-table
joins plan with NO Exchange, and results match the plain-parquet join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from near_duplicate_detection_spark.sources.bucketed import (
    colocated_join,
    write_bucketed,
)


@pytest.fixture()
def bucketed_pair(spark):
    # pin the planner to the code paths under test: tiny test tables would
    # otherwise broadcast (so no merge join to co-locate), and autoBucketedScan
    # turns bucketed reading off for scans it deems not to benefit
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.sources.bucketing.autoBucketedScan.enabled",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    sigs = spark.range(5000).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        F.xxhash64(F.col("id").cast("string")).alias("simhash"),
    )
    clusters = spark.range(0, 5000, 3).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        (F.col("id") % 7).alias("cluster_id"),
    )
    write_bucketed(sigs, "t_sigs", "url", n_buckets=8)
    write_bucketed(clusters, "t_clusters", "url", n_buckets=8)
    yield sigs, clusters
    spark.sql("DROP TABLE IF EXISTS t_sigs")
    spark.sql("DROP TABLE IF EXISTS t_clusters")
    for k, v in saved.items():
        spark.conf.set(k, v)


def test_colocated_join_no_exchange(spark, bucketed_pair):
    j = colocated_join(spark, "t_sigs", "t_clusters", "url")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("Bucketed: true") == 2


def test_colocated_join_matches_plain(spark, bucketed_pair):
    sigs, clusters = bucketed_pair
    got = colocated_join(spark, "t_sigs", "t_clusters", "url")
    want = sigs.join(clusters, "url")
    assert got.count() == want.count() == clusters.count()
    assert got.select(F.sum("cluster_id")).first()[0] == want.select(
        F.sum("cluster_id")
    ).first()[0]


def test_bucket_pruning_on_point_lookup(spark, bucketed_pair):
    from near_duplicate_detection_spark.sources.bucketed import read_bucketed

    q = read_bucketed(spark, "t_sigs").where(F.col("url") == "u123")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "SelectedBucketsCount: 1 out of 8" in plan
