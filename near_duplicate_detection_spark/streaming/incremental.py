"""Incremental signature indexing via Structured Streaming.

The reference's incremental path is request-driven: POST update_index with
new videoids recomputes only stale entries (ndd/server_ndd.py:158-268, the
`.done` predicate at :182). The batch engine models that with the lineage
anti-join; this module adds the continuous variant: a file-source stream
over the pages table directory emits signature rows for NEW files only —
Spark's streaming file source tracks processed files in the checkpoint,
which plays exactly the `.done` role (per-input, not per-config).

Batch-only remains the primary mode (the north rule needs no streaming);
this is the additive path for continuously-arriving crawl data.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from near_duplicate_detection_spark.config import NDDConfig
from near_duplicate_detection_spark.functions.signatures import (
    SIGNATURE_SCHEMA,
    signature_map_fn,
)

PAGES_STRUCT = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("bucket", T.IntegerType()),
    ]
)


def incremental_signatures(
    spark: SparkSession,
    cfg: NDDConfig,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """Start a stream: new parquet files under pages_dir → signature rows
    appended under out_dir. Returns the StreamingQuery (caller stops it).

    Use trigger(availableNow=True) semantics via processAllAvailable() in
    tests: drains everything present, then stops.
    """
    stream = (
        spark.readStream.schema(PAGES_STRUCT)
        .option("maxFilesPerTrigger", 64)
        .parquet(pages_dir)
        .select("url", "text")
    )
    sigs = stream.mapInPandas(signature_map_fn(cfg), schema=SIGNATURE_SCHEMA)
    return (
        sigs.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_ingest_stats(spark: SparkSession, pages_dir: str):
    """Streaming windowed aggregation with watermark (late-data handling):
    pages per (1-minute warc_ts window, lang) — the crawl-monitoring rollup.
    Returns a streaming DataFrame for a memory-sink test harness."""
    stream = (
        spark.readStream.schema(PAGES_STRUCT).parquet(pages_dir)
    )
    return (
        stream.withWatermark("warc_ts", "10 minutes")
        .groupBy(F.window("warc_ts", "1 minute"), "lang")
        .agg(F.count("*").alias("n_pages"))
    )
