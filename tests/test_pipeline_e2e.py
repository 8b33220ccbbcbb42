"""End-to-end pipeline: planted-truth recall ≥ 0.99, decoy rejection,
cluster membership vs an exact-Jaccard oracle (FIXTURES.md §4)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from near_duplicate_detection_spark.config import NDDConfig
from near_duplicate_detection_spark.functions.signatures import shingle_strings
from near_duplicate_detection_spark.functions.text import tokenize
from near_duplicate_detection_spark.pipeline import NDDPipeline, query_top_k
from near_duplicate_detection_spark.sources.pages import (
    generate_pages,
    generate_rows,
    truth_pairs,
    url_of,
)

N_DOCS = 1500
CFG = NDDConfig(num_buckets=4)


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("nddcat"))
    pages = generate_pages(spark, N_DOCS)
    pipe = NDDPipeline(spark, CFG, base)
    clusters = pipe.run(pages)
    return pipe, clusters.toPandas()


def _cluster_of(clusters_pdf):
    return dict(zip(clusters_pdf.url, clusters_pdf.cluster_id))


def test_recall_against_planted_truth(built):
    _, clusters = built
    cl = _cluster_of(clusters)
    truth = truth_pairs(N_DOCS)
    hits = sum(cl[a] == cl[b] for a, b in zip(truth.url_a, truth.url_b))
    recall = hits / len(truth)
    assert recall >= 0.99, f"recall {recall:.4f} over {len(truth)} planted pairs"


def test_decoys_rejected(built):
    """Near-threshold decoys (Jaccard ≈ 1/3) must NOT share a cluster with
    their base — the verify stage's rejection (FIXTURES §1 negatives)."""
    _, clusters = built
    cl = _cluster_of(clusters)
    leaked = 0
    total = 0
    for base in range(2, N_DOCS - 7, 20):
        decoy = base + 7
        if decoy < N_DOCS:
            total += 1
            leaked += cl[url_of(base)] == cl[url_of(decoy)]
    assert total > 0
    assert leaked == 0, f"{leaked}/{total} decoys leaked into clusters"


def test_clusters_cover_all_urls_and_have_one_representative(built):
    _, clusters = built
    assert len(clusters) == N_DOCS
    reps = clusters.groupby("cluster_id")["is_representative"].sum()
    assert (reps == 1).all()


def test_precision_verified_pairs_exact_jaccard(built):
    """Every emitted pair must truly meet the Jaccard threshold (exact
    set-oracle recomputation in python — SURVEY §5.3 precision side)."""
    pipe, _ = built
    pairs = pipe.catalog.read("pairs").toPandas()
    assert len(pairs) > 0
    texts = generate_rows(np.arange(N_DOCS)).set_index("url").text
    rng = np.random.RandomState(1)
    sample = pairs.iloc[rng.choice(len(pairs), min(50, len(pairs)), replace=False)]
    for _, row in sample.iterrows():
        A = set(shingle_strings(tokenize(texts[row.url_a]), CFG.shingle_k))
        B = set(shingle_strings(tokenize(texts[row.url_b]), CFG.shingle_k))
        j = len(A & B) / len(A | B)
        assert j >= CFG.jaccard_threshold - 1e-9
        assert abs(j - row.jaccard) < 1e-9


def test_cluster_membership_matches_oracle_clustering(built):
    """Oracle: exact-Jaccard O(N²)-style clustering via shared-shingle
    pre-filter (pandas merge), then union-find — engine clusters must match
    on multi-doc components (test_clusters_match, FIXTURES §4)."""
    _, clusters = built
    texts = generate_rows(np.arange(N_DOCS))
    rows = []
    for url, text in zip(texts.url, texts.text):
        for sh in set(shingle_strings(tokenize(text), CFG.shingle_k)):
            rows.append((url, sh))
    inv = pd.DataFrame(rows, columns=["url", "sh"])
    sizes = inv.groupby("url").size()
    merged = inv.merge(inv, on="sh")
    merged = merged[merged.url_x < merged.url_y]
    inter = merged.groupby(["url_x", "url_y"]).size()
    # oracle edges: jaccard >= threshold (minhash path only — substring pairs
    # are additional edges with their own oracle below)
    parent: dict[str, str] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for (ua, ub), i in inter.items():
        j = i / (sizes[ua] + sizes[ub] - i)
        if j >= CFG.jaccard_threshold:
            union(ua, ub)
    # substring planted pairs are engine edges too
    for t in truth_pairs(N_DOCS).itertuples():
        if t.kind == "substring":
            union(t.url_a, t.url_b)

    oracle_label = {u: find(u) for u in texts.url}
    cl = _cluster_of(clusters)
    # same-partition predicate must agree for a sample of pairs
    urls = list(texts.url)
    rng = np.random.RandomState(2)
    for _ in range(4000):
        a, b = urls[rng.randint(N_DOCS)], urls[rng.randint(N_DOCS)]
        assert (oracle_label[a] == oracle_label[b]) == (cl[a] == cl[b]), (a, b)


def test_substring_pairs_found(built):
    pipe, _ = built
    subs = pipe.catalog.read("substring_pairs").toPandas()
    truth = truth_pairs(N_DOCS)
    planted = truth[truth.kind == "substring"]
    found = set(zip(subs.url_a, subs.url_b))
    missing = [
        (a, b) for a, b in zip(planted.url_a, planted.url_b) if (a, b) not in found
    ]
    assert not missing, f"substring pairs missed: {missing[:5]}"


def test_query_top_k(spark, built):
    pipe, _ = built
    # query with the text of doc 2 (base of a near group) → its copies rank top
    text = generate_rows(np.array([2])).text.iloc[0]
    res = query_top_k(spark, pipe.catalog, CFG, text, k=5).toPandas()
    assert len(res) >= 1
    assert res.jaccard.iloc[0] > 0.99  # the doc itself (or exact dup)
    # one hit per cluster (W1 semantics)
    assert res.url.is_unique


def test_metrics_and_lineage_written(built):
    pipe, _ = built
    lin = pipe.catalog.lineage().toPandas()
    assert set(lin.stage) == {
        "pages", "signatures", "pairs", "substring_pairs", "clusters",
    }
    assert len(lin[lin.stage == "signatures"]) == CFG.num_buckets
    assert len(lin[lin.stage == "pages"]) == CFG.num_buckets
    met = pipe.catalog.metrics().toPandas()
    assert "verified_pairs" in set(met.key)
