"""Batch query path: query_top_k_batch resolves a table of queries in one
plan and matches per-query query_top_k results (pipeline.py)."""

from __future__ import annotations

import pytest

from near_duplicate_detection_spark.config import NDDConfig
from near_duplicate_detection_spark.pipeline import (
    NDDPipeline,
    query_top_k,
    query_top_k_batch,
)
from near_duplicate_detection_spark.sources.pages import (
    doc_tokens,
    generate_pages,
)

N_DOCS = 400
CFG = NDDConfig(num_buckets=4)


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("nddbatchq"))
    pipe = NDDPipeline(spark, CFG, base)
    pipe.run(generate_pages(spark, N_DOCS))
    return pipe


def _query_texts():
    return {f"q{i}": " ".join(doc_tokens(i)[0]) for i in (3, 50, 121)}


def test_batch_matches_single_query_path(spark, built):
    texts = _query_texts()
    qdf = spark.createDataFrame(
        list(texts.items()), "query_id string, text string"
    )
    batch = query_top_k_batch(spark, built.catalog, CFG, qdf, k=5).toPandas()
    assert set(batch.columns) == {"query_id", "url", "jaccard", "cluster_id", "rank"}
    for qid, text in texts.items():
        single = (
            query_top_k(spark, built.catalog, CFG, text, k=5)
            .toPandas()
            .sort_values(["jaccard", "url"], ascending=[False, True])
        )
        mine = batch[batch.query_id == qid].sort_values("rank")
        assert list(mine.url) == list(single.url), qid
        assert [round(x, 9) for x in mine.jaccard] == [
            round(x, 9) for x in single.jaccard
        ], qid


def test_batch_rank_contract(spark, built):
    qdf = spark.createDataFrame(
        [("a", " ".join(doc_tokens(7)[0])), ("b", "zzz qqq unseen tokens")],
        "query_id string, text string",
    )
    pdf = query_top_k_batch(spark, built.catalog, CFG, qdf, k=3).toPandas()
    for _, grp in pdf.groupby("query_id"):
        assert list(grp.sort_values("rank")["rank"]) == list(
            range(1, len(grp) + 1)
        )
        assert grp.jaccard.is_monotonic_decreasing or len(grp) <= 1
    # self-duplicate of doc 7 must surface at rank 1 with jaccard ~1
    top_a = pdf[(pdf.query_id == "a") & (pdf["rank"] == 1)]
    assert len(top_a) == 1 and top_a.jaccard.iloc[0] > 0.99
