"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship near-duplicate clustering over sf0.001 documents.
queries()     — SURVEY §2 operator catalog (plans/contract.py).
oracle_sql()  — matching DuckDB ANSI SQL per query (column names aligned).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from near_duplicate_detection_spark.plans.contract import ORACLES, QUERIES

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end near-duplicate clustering of the `documents`
    table — signatures → LSH candidates → exact-Jaccard verify → connected
    components (the engine's three-stage spine, in one lazy plan)."""
    from near_duplicate_detection_spark.plans.contract import q_near_dup_clusters

    return q_near_dup_clusters(spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
