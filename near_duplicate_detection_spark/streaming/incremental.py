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


def streaming_candidate_pairs(
    spark: SparkSession,
    cfg: NDDConfig,
    pages_dir: str,
    signatures_path: str,
):
    """Stream-static LSH probe: continuously-arriving pages are signed with
    the SAME signature UDF as the batch path, band-exploded, and equi-joined
    against the band index derived from the built ``signatures`` table — the
    streaming analog of the reference's request-driven similarity probe
    (ndd/server_ndd.py:271-306), at crawl granularity instead of per-request.

    Stream-static joins need no state for the static side (Spark re-plans
    the join per micro-batch, picking broadcast when the index fits — but
    the static side's FILE LISTING is snapshotted when the query starts, so
    a re-indexed/compacted signatures table needs a query restart to be
    seen; with availableNow triggers + checkpoints a restart is the normal
    cadence anyway); the stream side carries only the new docs' bands. Output: (url_new, url_indexed) LSH
    candidates — acceptance stays with the batch exact-Jaccard verify, which
    recomputes shingle sets for candidates only (the engine never stores
    corpus-wide shingle sets; see operators/verify.py).

    Returns a streaming DataFrame for the caller to sink.
    """
    index = (
        spark.read.parquet(signatures_path)
        .select(
            F.col("url").alias("url_indexed"),
            F.posexplode("bands").alias("band_idx", "band_hash"),
        )
    )
    stream = (
        spark.readStream.schema(PAGES_STRUCT)
        .option("maxFilesPerTrigger", 64)
        .parquet(pages_dir)
        .select("url", "text")
    )
    probe = (
        stream.mapInPandas(signature_map_fn(cfg), schema=SIGNATURE_SCHEMA)
        .select(
            F.col("url").alias("url_new"),
            F.posexplode("bands").alias("band_idx", "band_hash"),
        )
    )
    return (
        probe.join(index, ["band_idx", "band_hash"])
        .where(F.col("url_new") != F.col("url_indexed"))
        # several bands of one pair collide → one candidate row; streaming
        # dropDuplicates keeps per-pair state (bounded by the micro-batch's
        # candidate volume; add a watermark on an event-time column for
        # unbounded runs)
        .dropDuplicates(["url_new", "url_indexed"])
        .select("url_new", "url_indexed")
    )


RECRAWL_OUT = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("fp", T.LongType()),
    ]
)
RECRAWL_STATE = T.StructType([T.StructField("fp", T.LongType())])


def recrawl_suppressor(stream_pages):
    """Custom stateful streaming operator (applyInPandasWithState): suppress
    re-crawls whose content is unchanged. State per url = last content
    fingerprint; a row is emitted only when the fingerprint is new or
    changed — the streaming version of the reference's `.done`
    version-equality skip (ndd/extract_features.py:88), keyed by url instead
    of by job.

    stream_pages: streaming DataFrame with (url, text). Returns a streaming
    DataFrame (url, fp) of docs that need (re-)processing.
    """
    import pandas as pd

    def fn(key, pdfs, state):
        url = key[0]
        last = state.get[0] if state.exists else None
        out_fp = None
        for pdf in pdfs:
            for fp in pdf["fp"]:
                if fp != last:
                    out_fp = last = int(fp)
        if out_fp is not None:
            state.update((last,))
            yield pd.DataFrame({"url": [url], "fp": [out_fp]})

    from pyspark.sql.streaming.state import GroupStateTimeout

    withfp = stream_pages.select("url", F.xxhash64("text").alias("fp"))
    return withfp.groupBy("url").applyInPandasWithState(
        fn,
        outputStructType=RECRAWL_OUT,
        stateStructType=RECRAWL_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
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


FP_TS_SCHEMA = "url string, fp bigint, warc_ts timestamp"


def _fp_with_ts_fn(cfg: NDDConfig):
    """mapInPandas fn: (url, text, warc_ts) → (url, fp, warc_ts) using the
    SAME content-fingerprint family as the batch signature pass (fp is a
    python-side SipHash over the normalized token stream — it cannot be
    recomputed JVM-side, so streams reuse the Arrow UDF and pass the event
    time through positionally)."""
    from collections.abc import Iterator

    import pandas as pd

    from near_duplicate_detection_spark.functions.hashing import perm_params
    from near_duplicate_detection_spark.functions.signatures import (
        compute_signatures_batch,
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        a, b = perm_params(cfg.num_perms)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            sigs = compute_signatures_batch(pdf["url"], pdf["text"], cfg, a, b)
            out = sigs[["url", "fp"]].copy()
            out["warc_ts"] = pdf["warc_ts"].values  # row order preserved
            yield out

    return fn


def novel_pages_stream(
    spark: SparkSession,
    cfg: NDDConfig,
    pages_dir: str,
    signatures_path: str,
):
    """Ingestion filter: continuously-arriving pages whose exact content
    fingerprint is NOT already in the built index — a stream-static LEFT
    ANTI join (stateless for the static side; its file listing is
    snapshotted at query start, so restart the query after a re-index — the
    normal cadence with availableNow triggers + checkpoints). The
    streaming analog of the batch exact-dedup star
    collapse (operators/lsh.py exact_groups): everything this filter passes
    is new content; near-dup acceptance stays with the batch verify over
    `streaming_candidate_pairs` output.

    Returns a streaming DataFrame(url, fp, warc_ts) for the caller to sink.
    """
    index_fps = spark.read.parquet(signatures_path).select("fp").distinct()
    stream = (
        spark.readStream.schema(PAGES_STRUCT)
        .option("maxFilesPerTrigger", 64)
        .parquet(pages_dir)
        .select("url", "text", "warc_ts")
    )
    fps = stream.mapInPandas(_fp_with_ts_fn(cfg), schema=FP_TS_SCHEMA)
    return fps.join(index_fps, "fp", "left_anti")


def stream_exact_dedup(
    spark: SparkSession,
    cfg: NDDConfig,
    pages_dir: str,
    delay: str = "10 minutes",
):
    """In-stream exact dedup across micro-batches:
    dropDuplicatesWithinWatermark on the content fingerprint keeps the FIRST
    occurrence and bounds the dedup state by the watermark delay — the
    streaming guarantee a plain dropDuplicates cannot give (its state grows
    with every distinct fp forever). Re-crawls of the same content inside
    the watermark window are suppressed; re-crawls after it re-emit, which
    is the correct crawl semantics (content is re-validated per crawl
    horizon, matching the reference's re-index-on-update policy,
    ndd/server_ndd.py:158-182).

    Returns a streaming DataFrame(url, fp, warc_ts).
    """
    stream = (
        spark.readStream.schema(PAGES_STRUCT)
        .option("maxFilesPerTrigger", 64)
        .parquet(pages_dir)
        .select("url", "text", "warc_ts")
    )
    fps = stream.mapInPandas(_fp_with_ts_fn(cfg), schema=FP_TS_SCHEMA)
    return fps.withWatermark("warc_ts", delay).dropDuplicatesWithinWatermark(["fp"])
