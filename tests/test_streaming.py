"""Structured Streaming: incremental signature indexing processes only NEW
files (checkpoint = distributed `.done`), windowed watermark aggregation."""

from __future__ import annotations

import pandas as pd
import pytest

from near_duplicate_detection_spark.config import NDDConfig
from near_duplicate_detection_spark.pipeline import NDDPipeline
from near_duplicate_detection_spark.sources.pages import generate_pages
from near_duplicate_detection_spark.streaming.incremental import (
    incremental_signatures,
    novel_pages_stream,
    recrawl_suppressor,
    stream_exact_dedup,
    streaming_candidate_pairs,
    windowed_ingest_stats,
)

CFG = NDDConfig(num_buckets=4)


def _drain(q):
    q.awaitTermination(120)


def test_incremental_signatures_only_new_files(spark, tmp_path):
    base = str(tmp_path / "cat")
    pipe = NDDPipeline(spark, CFG, base)
    pipe.stage0_ingest(generate_pages(spark, 200))
    pages_dir = pipe.catalog.path("pages")
    out = str(tmp_path / "sig_stream")
    ckpt = str(tmp_path / "ckpt")

    q = incremental_signatures(spark, CFG, pages_dir, out, ckpt)
    _drain(q)
    first = spark.read.parquet(out)
    assert first.count() == 200
    assert "minhash" in first.columns

    # append a new batch of pages → only the new file is processed
    # (partition value comes from the bucket=99 path, reference update_index
    # semantics: ndd/server_ndd.py:158-182)
    extra = generate_pages(spark, 260).where("CAST(substr(url, -4) AS INT) >= 200")
    extra.write.mode("append").parquet(pages_dir + "/bucket=99")
    q2 = incremental_signatures(spark, CFG, pages_dir, out, ckpt)
    _drain(q2)
    after = spark.read.parquet(out)
    assert after.count() == 260  # 200 old (not reprocessed) + 60 new


def test_streaming_candidate_pairs_probe_static_index(spark, tmp_path):
    """New streamed pages LSH-probe the BUILT signature index: a re-crawled
    copy of an indexed doc must surface as a candidate pair; an unrelated
    doc must not."""
    import pyspark.sql.functions as F

    base = str(tmp_path / "cat")
    pipe = NDDPipeline(spark, CFG, base)
    pipe.stage0_ingest(generate_pages(spark, 100))
    pipe.stage1_signatures()

    # stream dir: one exact copy of an indexed doc + one unrelated doc
    dup_src = (
        pipe.pages_table().where(F.col("url").endswith("0007")).limit(1)
        .select("url", "text").collect()[0]
    )
    new_dir = str(tmp_path / "new_pages")
    pd.DataFrame(
        {
            "url": ["stream://dup", "stream://fresh"],
            "text": [
                dup_src.text,
                " ".join(f"zq{i}" for i in range(40)),
            ],
        }
    ).pipe(spark.createDataFrame).write.parquet(new_dir)

    cands = streaming_candidate_pairs(
        spark, CFG, new_dir, pipe.catalog.path("signatures")
    )
    q = (
        cands.writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_cands")
        .option("checkpointLocation", str(tmp_path / "ckpt_cands"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    out = spark.sql("SELECT * FROM stream_cands").toPandas()
    hits = out[out.url_new == "stream://dup"]
    assert dup_src.url in set(hits.url_indexed), out
    assert "stream://fresh" not in set(out.url_new)


def test_recrawl_suppressor_stateful(spark, tmp_path):
    """applyInPandasWithState re-crawl suppression: unchanged content is
    dropped across micro-batches (state = last fp per url), changed content
    re-emits."""
    src = str(tmp_path / "crawl")
    ckpt = str(tmp_path / "ckpt_recrawl")
    out = str(tmp_path / "recrawl_out")

    def run_batch(rows):
        pd.DataFrame(rows).pipe(spark.createDataFrame).write.mode(
            "append"
        ).parquet(src)
        stream = (
            spark.readStream.schema("url string, text string").parquet(src)
        )
        # file sink: the memory sink cannot recover a stateful checkpoint
        # across query restarts — parquet can, and restart-with-state is
        # exactly what this test exercises
        q = (
            recrawl_suppressor(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)
        return spark.read.parquet(out).toPandas()

    first = run_batch({"url": ["a", "b"], "text": ["alpha text", "beta text"]})
    assert set(first.url) == {"a", "b"}
    assert len(first) == 2

    # batch 2: a unchanged (suppressed by state), b changed (re-emitted)
    second = run_batch(
        {"url": ["a", "b"], "text": ["alpha text", "beta text v2"]}
    )
    counts = second.url.value_counts().to_dict()
    assert counts == {"b": 2, "a": 1}, counts


def test_windowed_ingest_stats_watermark(spark, tmp_path):
    base = str(tmp_path / "cat")
    pipe = NDDPipeline(spark, CFG, base)
    pipe.stage0_ingest(generate_pages(spark, 120))
    agg = windowed_ingest_stats(spark, pipe.catalog.path("pages"))
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("ingest_stats")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    out = spark.sql("SELECT * FROM ingest_stats").toPandas()
    # 120 docs at 1s stride = exactly 2 one-minute windows per lang presence
    assert out.n_pages.sum() == 120
    assert set(out.lang) <= {"en", "de", "fr", "es", "zh"}
    assert len(out["window"].map(lambda w: w["start"]).unique()) == 2


def test_novel_pages_stream_filters_indexed_content(spark, tmp_path):
    """Stream-static anti-join on content fp: an exact re-crawl of indexed
    content is dropped; genuinely new content passes."""
    import datetime

    import pyspark.sql.functions as F

    base = str(tmp_path / "cat")
    pipe = NDDPipeline(spark, CFG, base)
    pipe.stage0_ingest(generate_pages(spark, 80))
    pipe.stage1_signatures()

    dup_src = (
        pipe.pages_table().where(F.col("url").endswith("0005")).limit(1)
        .select("text").collect()[0]
    )
    ts = datetime.datetime(2026, 1, 1)
    new_dir = str(tmp_path / "incoming")
    pd.DataFrame(
        {
            "url": ["stream://recrawl", "stream://novel"],
            "warc_ts": [ts, ts],
            "text": [dup_src.text, " ".join(f"nv{i}" for i in range(40))],
        }
    ).pipe(spark.createDataFrame).write.parquet(new_dir)

    q = (
        novel_pages_stream(spark, CFG, new_dir, pipe.catalog.path("signatures"))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("novel_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_novel"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    out = spark.sql("SELECT * FROM novel_out").toPandas()
    assert set(out.url) == {"stream://novel"}


def test_stream_exact_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark on fp: duplicate content inside the
    watermark horizon emits once; distinct content all passes."""
    import datetime

    src = str(tmp_path / "crawl_dedup")
    ts = datetime.datetime(2026, 1, 1)
    rows = {
        "url": ["a", "b", "c", "d"],
        "warc_ts": [ts, ts, ts + datetime.timedelta(minutes=1), ts],
        "text": ["same text here", "same text here", "same text here", "other text"],
    }
    pd.DataFrame(rows).pipe(spark.createDataFrame).write.parquet(src)

    q = (
        stream_exact_dedup(spark, CFG, src, delay="10 minutes")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(tmp_path / "dedup_out"))
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    out = spark.read.parquet(str(tmp_path / "dedup_out")).toPandas()
    assert len(out) == 2  # one survivor per distinct fp
    assert set(out.fp).__len__() == 2
    assert "d" in set(out.url)
