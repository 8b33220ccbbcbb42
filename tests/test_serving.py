"""Continuous query serving (streaming/serving.py): foreachBatch over the
committed index — per-batch results match the batch query path, the
checkpoint gives exactly-once file consumption across restarts, batches
started after an append_pages commit see the appended docs, and the
per-batch-partition sink is idempotent under reprocessing."""

from __future__ import annotations

import os
import shutil

import pytest

from near_duplicate_detection_spark.config import NDDConfig
from near_duplicate_detection_spark.pipeline import (
    NDDPipeline,
    query_top_k_batch,
)
from near_duplicate_detection_spark.sources.pages import (
    doc_tokens,
    generate_pages,
)
from near_duplicate_detection_spark.streaming.serving import (
    QUERY_SCHEMA,
    serve_queries,
)

N_DOCS = 400
CFG = NDDConfig(num_buckets=4)


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("nddserve"))
    pipe = NDDPipeline(spark, CFG, base)
    pipe.run(generate_pages(spark, N_DOCS))
    return pipe


def _write_queries(spark, path, rows):
    spark.createDataFrame(rows, QUERY_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _serve(spark, built, qdir, out, ckpt, **kw):
    stream = (
        spark.readStream.schema(QUERY_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one file drop = one micro-batch
        .parquet(qdir)
    )
    q = serve_queries(
        spark, built.catalog, CFG, stream, out, ckpt, k=5, **kw
    )
    assert q.awaitTermination(180), "serving query did not drain"


def test_serving_matches_batch_path(spark, built, tmp_path):
    qdir, out, ckpt = (
        str(tmp_path / d) for d in ("queries", "results", "ckpt")
    )
    rows1 = [("q3", " ".join(doc_tokens(3)[0]))]
    rows2 = [
        ("q50", " ".join(doc_tokens(50)[0])),
        ("qz", "zzz qqq unseen tokens"),
    ]
    _write_queries(spark, qdir, rows1)
    _write_queries(spark, qdir, rows2)
    batches: list[tuple[int, int]] = []
    _serve(spark, built, qdir, out, ckpt, on_batch=lambda b, n: batches.append((b, n)))
    # one micro-batch per file drop, each batch's rows landed in its own
    # partition
    assert sorted(n for _, n in batches) == [1, 2]
    got = spark.read.parquet(out).toPandas()
    assert set(got.batch_id.unique()) == {0, 1}
    # per-query results equal the batch query path run directly
    qdf = spark.createDataFrame(rows1 + rows2, QUERY_SCHEMA)
    want = query_top_k_batch(spark, built.catalog, CFG, qdf, k=5).toPandas()
    for qid in ("q3", "q50", "qz"):
        g = got[got.query_id == qid].sort_values("rank")
        w = want[want.query_id == qid].sort_values("rank")
        assert list(g.url) == list(w.url), qid
        assert [round(x, 9) for x in g.jaccard] == [
            round(x, 9) for x in w.jaccard
        ], qid


def test_serving_sees_post_commit_appends(spark, built, tmp_path):
    """A batch started after an append_pages commit serves the appended doc
    — no restart of anything but the drained availableNow run, and the
    checkpoint means the earlier query files are NOT reprocessed."""
    qdir, out, ckpt = (
        str(tmp_path / d) for d in ("queries", "results", "ckpt")
    )
    novel = "totally novel serving corpus text " * 5
    _write_queries(
        spark,
        qdir,
        [("q_before", " ".join(doc_tokens(3)[0])), ("q_miss", novel)],
    )
    _serve(spark, built, qdir, out, ckpt)
    before = spark.read.parquet(out).toPandas()
    assert "url://appended" not in set(before.url)
    assert len(before[before.query_id == "q_miss"]) == 0  # all-miss query

    built.append_pages(
        spark.createDataFrame([("url://appended", novel)], "url string, text string")
    )
    try:
        _write_queries(spark, qdir, [("q_after", novel)])
        _serve(spark, built, qdir, out, ckpt)
        after = spark.read.parquet(out).toPandas()
        hits = after[after.query_id == "q_after"]
        assert "url://appended" in set(hits.url)
        # exactly-once consumption: q_before was not re-answered — its
        # batch-0 partition is byte-identical (no new batch contains it)
        assert set(after[after.query_id == "q_before"].batch_id) == {0}
        assert len(after[after.query_id == "q_before"]) == len(
            before[before.query_id == "q_before"]
        )
    finally:
        # restore the module-scoped catalog for other tests
        built.delete_pages(["url://appended"])


def test_serving_sink_idempotent_under_reprocessing(spark, built, tmp_path):
    """Reprocessing a batch overwrites its own batch_id partition instead
    of appending duplicates (a wiped checkpoint replays the source — the
    at-least-once case the dynamic partition overwrite exists for)."""
    qdir, out, ckpt = (
        str(tmp_path / d) for d in ("queries", "results", "ckpt")
    )
    _write_queries(spark, qdir, [("q7", " ".join(doc_tokens(7)[0]))])
    _serve(spark, built, qdir, out, ckpt)
    once = spark.read.parquet(out).toPandas()
    shutil.rmtree(ckpt)  # force a full replay of the source
    _serve(spark, built, qdir, out, ckpt)
    twice = spark.read.parquet(out).toPandas()
    assert len(twice) == len(once)
    assert sorted(twice.url) == sorted(once.url)
    assert os.path.isdir(os.path.join(out, "batch_id=0"))
