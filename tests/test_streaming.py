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
