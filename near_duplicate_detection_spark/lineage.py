"""Per-partition lineage + metrics tables — the distributed `.done` protocol.

Reference semantics: each stage writes a hidden `.done` file per videoid whose
content is a version string chaining stage params with upstream params;
string equality means "skip this partition on re-run"
(ndd/extract_features.py:86-88, ndd/shotdetect.py:115-117).

Engine: a `lineage` parquet table
    (stage, partition_id, config_hash, rows, wall_ms, completed_at)
appended once per completed (stage, partition); resume = anti-join of the
work-list against lineage rows with a matching config_hash. A `metrics` table
(stage, key, value) records counts, wall times, and flagged skew buckets
("no silent caps").

Stage tables live under a base dir as parquet; an Iceberg catalog would slot
in behind the same three calls (read_table / write_table / append_rows) — the
runtime image carries no Iceberg jars, so the layout keeps table-per-dir with
dynamic partition overwrite for idempotent partition replacement.
"""

from __future__ import annotations

import os
import time

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = (
    "stage string, partition_id int, config_hash string, rows bigint, "
    "wall_ms bigint, completed_at timestamp"
)
METRICS_SCHEMA = "stage string, key string, value double"


class StageCatalog:
    """Thin parquet-dir table catalog with append/overwrite + lineage."""

    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base_dir = base_dir
        os.makedirs(base_dir, exist_ok=True)

    def path(self, table: str) -> str:
        return os.path.join(self.base_dir, table)

    def exists(self, table: str) -> bool:
        p = self.path(table)
        if not os.path.isdir(p):
            return False
        for root, _dirs, files in os.walk(p):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(table))

    def write(self, df: DataFrame, table: str, partition_by: list[str] | None = None,
              mode: str = "overwrite") -> None:
        w = df.write.mode(mode)
        if partition_by:
            w = w.option("partitionOverwriteMode", "dynamic").partitionBy(*partition_by)
        w.parquet(self.path(table))

    # ---- lineage ----

    def lineage(self) -> DataFrame:
        if not self.exists("lineage"):
            return self.spark.createDataFrame([], schema=LINEAGE_SCHEMA)
        return self.read("lineage")

    def completed_partitions(self, stage: str, config_hash: str) -> set[int]:
        """The resume predicate (reference P1, ndd/extract_features.py:88):
        a partition is complete iff a lineage row with the SAME config hash
        exists — param changes upstream invalidate it automatically because
        the hash chains upstream hashes (config.py)."""
        rows = (
            self.lineage()
            .where((F.col("stage") == stage) & (F.col("config_hash") == config_hash))
            .select("partition_id")
            .collect()
        )
        return {r.partition_id for r in rows}

    def mark_complete(
        self, stage: str, config_hash: str, partition_rows: dict[int, int], wall_ms: int
    ) -> None:
        now = pd.Timestamp(int(time.time()), unit="s", tz="UTC")
        pdf = pd.DataFrame(
            [
                (stage, int(pid), config_hash, int(nrows), int(wall_ms), now)
                for pid, nrows in partition_rows.items()
            ],
            columns=["stage", "partition_id", "config_hash", "rows",
                     "wall_ms", "completed_at"],
        )
        df = self.spark.createDataFrame(pdf, schema=LINEAGE_SCHEMA)
        df.coalesce(1).write.mode("append").parquet(self.path("lineage"))

    # ---- metrics ----

    def add_metrics(self, stage: str, metrics: dict[str, float]) -> None:
        if not metrics:
            return
        pdf = pd.DataFrame(
            [(stage, k, float(v)) for k, v in metrics.items()],
            columns=["stage", "key", "value"],
        )
        df = self.spark.createDataFrame(pdf, schema=METRICS_SCHEMA)
        df.coalesce(1).write.mode("append").parquet(self.path("metrics"))

    def metrics(self) -> DataFrame:
        if not self.exists("metrics"):
            return self.spark.createDataFrame([], schema=METRICS_SCHEMA)
        return self.read("metrics")
