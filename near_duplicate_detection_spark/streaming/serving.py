"""Continuous query serving: a stream of ad-hoc query texts answered
against the committed near-duplicate index.

The reference IS a serving process — a Flask server that answers each
similarity query over HTTP against its in-memory index
(ndd/server_ndd.py:271-306, one O(N) features·query matmul + full argsort
per request). The Spark-native generalization treats the query side as a
STREAM and the index as versioned static state:

    readStream(queries) → foreachBatch:
        micro-batch (bounded DF) → query_top_k_batch against the
        catalog's CURRENT committed tables → idempotent per-batch sink

``foreachBatch`` is the idiomatic shape here, not a limitation dodge: the
per-query top-k needs rank windows and a two-phase candidate/verify join,
which are batch-DF semantics — Structured Streaming's own operator set
(stream-static joins + windowed aggs) cannot express "row_number per
query over a verified-join result" in append mode. Each micro-batch runs
the full Catalyst-optimized batch plan (band equi-join, broadcast by AQE
when the batch is small, candidate-set verify shared across the batch's
queries — pipeline.query_top_k_batch).

Index freshness: ``catalog.read`` re-lists the table directory per batch,
so a batch started AFTER an ``append_pages``/``run_incremental`` commit
serves the post-commit index with zero restart — the serving query and the
indexing pipeline share nothing but the storage layout. Mid-commit reads
follow the same freshness contract as the batch path (query_top_k's
docstring): committed clusters + individually-listed newer docs.

Exactly-once output: results land under ``out_dir/batch_id=N`` via
dynamic partition overwrite, so a replayed micro-batch (foreachBatch is
at-least-once on retry) overwrites its own partition instead of appending
duplicates — the parquet-sink analog of an idempotent upsert keyed by
batch id.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from near_duplicate_detection_spark.config import NDDConfig
from near_duplicate_detection_spark.lineage import StageCatalog

QUERY_SCHEMA = "query_id string, text string"


def query_file_stream(spark: SparkSession, queries_dir: str) -> DataFrame:
    """File-source stream of (query_id, text) parquet drops — the test and
    CLI transport. Spark's streaming file source tracks processed files in
    the checkpoint, so each drop is served exactly once per sink."""
    return spark.readStream.schema(QUERY_SCHEMA).parquet(queries_dir)


def serve_queries(
    spark: SparkSession,
    catalog: StageCatalog,
    cfg: NDDConfig,
    query_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    k: int = 30,
    available_now: bool = True,
    on_batch: Callable[[int, int], None] | None = None,
):
    """Start the serving query: every micro-batch of (query_id, text) rows
    is resolved by ``query_top_k_batch`` against the catalog's current
    committed index and written to ``out_dir/batch_id=N`` (idempotent —
    see module docstring). Returns the StreamingQuery handle.

    ``available_now=True`` drains what's currently in the source and stops
    (the test/backfill trigger); ``False`` runs continuously with the
    default micro-batch trigger. ``on_batch(batch_id, n_rows)`` is an
    optional observer for tests/metrics."""
    from near_duplicate_detection_spark.pipeline import query_top_k_batch

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        # foreachBatch hands a bounded batch DF; resolve it with the full
        # batch plan. Empty batches write nothing (no empty partitions).
        batch_df = batch_df.localCheckpoint()  # cut the streaming lineage
        if batch_df.isEmpty():
            if on_batch is not None:
                on_batch(batch_id, 0)
            return
        # materialize once (k-bounded — tiny): the emptiness probe and the
        # write would otherwise each run the full candidate/verify plan.
        # An all-miss batch writes nothing — a partitioned parquet write of
        # zero rows leaves a schema-less dir that breaks readers, so the
        # results dir exists only from the first non-empty batch on.
        hits = query_top_k_batch(
            spark, catalog, cfg, batch_df, k=k
        ).localCheckpoint()
        if hits.isEmpty():
            if on_batch is not None:
                on_batch(batch_id, batch_df.count())
            return
        (
            hits.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )
        if on_batch is not None:
            on_batch(batch_id, batch_df.count())

    writer = (
        query_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
