"""Resume (reference `.done` P1 semantics) + skew-ceiling tests (FIXTURES §4)."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from near_duplicate_detection_spark.config import NDDConfig
from near_duplicate_detection_spark.operators.lsh import (
    candidate_pairs,
    exact_groups,
    simhash_fallback_pairs,
)
from near_duplicate_detection_spark.pipeline import NDDPipeline
from near_duplicate_detection_spark.sources.pages import generate_pages, truth_pairs

CFG = NDDConfig(num_buckets=4)
N = 400


def _sig_files(pipe):
    out = {}
    root = pipe.catalog.path("signatures")
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                out[p] = os.path.getmtime(p)
    return out


def test_resume_after_stage1_kill(spark, tmp_path):
    """Kill after stage 1 → re-run recomputes ZERO completed partitions and
    produces identical clusters to an uninterrupted run."""
    base = str(tmp_path / "cat")
    pages = generate_pages(spark, N)
    pipe = NDDPipeline(spark, CFG, base)
    pipe.stage0_ingest(pages)
    pipe.stage1_signatures()
    before = _sig_files(pipe)
    # "new process": fresh pipeline object over the same catalog
    pipe2 = NDDPipeline(spark, CFG, base)
    clusters = pipe2.run().toPandas()  # resumes: stage 1 must be skipped
    after = _sig_files(pipe2)
    assert before == after, "stage-1 outputs were rewritten on resume"
    # identical to a from-scratch run
    base2 = str(tmp_path / "cat2")
    fresh = NDDPipeline(spark, CFG, base2).run(generate_pages(spark, N)).toPandas()
    a = clusters.sort_values("url", ignore_index=True)
    b = fresh.sort_values("url", ignore_index=True)
    assert (a["cluster_id"].values == b["cluster_id"].values).all()


def test_partial_bucket_resume(spark, tmp_path):
    """Pre-marked buckets are skipped: only pending buckets get computed
    (the distributed anti-join of work against lineage). The mark must carry
    the bucket's TRUE upstream stats — the predicate is data-aware, so a
    mark with stale stats would (correctly) not be honored."""
    base = str(tmp_path / "cat")
    pipe = NDDPipeline(spark, CFG, base)
    pipe.stage0_ingest(generate_pages(spark, N))
    h = CFG.stage1_hash()
    pstats = pipe.catalog.latest_partition_stats("pages", h)
    pipe.catalog.mark_complete(
        "signatures", h,
        {0: pstats[0][0], 1: pstats[1][0]}, 0,
        checksums={0: pstats[0][1], 1: pstats[1][1]},
    )
    pipe.stage1_signatures()
    buckets = {
        int(d.split("=")[1])
        for d in os.listdir(pipe.catalog.path("signatures"))
        if d.startswith("bucket=")
    }
    assert buckets == {2, 3}, buckets


def test_config_change_invalidates_lineage(spark, tmp_path):
    base = str(tmp_path / "cat")
    pipe = NDDPipeline(spark, CFG, base)
    pipe.stage0_ingest(generate_pages(spark, N))
    pipe.stage1_signatures()
    cfg2 = NDDConfig(num_buckets=4, shingle_k=7)
    pipe2 = NDDPipeline(spark, cfg2, base)
    assert (
        pipe2.catalog.completed_partitions("signatures", cfg2.stage1_hash()) == set()
    )


@pytest.fixture()
def boilerplate_sigs(spark):
    """30 near-identical docs (shared template + tiny unique tail) + 50 unique
    docs — a hot boilerplate cluster with DISTINCT fingerprints."""
    template = " ".join(f"tok{i}" for i in range(300))
    rows = [(f"u{i:03d}", template + f" unique{i}") for i in range(30)]
    rows += [
        (f"x{i:03d}", " ".join(f"z{i}w{j}" for j in range(120))) for i in range(50)
    ]
    pdf = pd.DataFrame(rows, columns=["url", "text"])
    from near_duplicate_detection_spark.functions.signatures import (
        SIGNATURE_SCHEMA,
        signature_map_fn,
    )

    return spark.createDataFrame(pdf).mapInPandas(
        signature_map_fn(NDDConfig()), schema=SIGNATURE_SCHEMA
    )


def test_skew_ceiling_flags_and_fallback_links(spark, boilerplate_sigs):
    """Buckets above the ceiling are flagged (no silent caps) and the SimHash
    star fallback still links the boilerplate cluster with LINEAR edges."""
    cfg = NDDConfig(max_bucket_size=5)
    sigs = boilerplate_sigs.localCheckpoint()
    _exact, reps = exact_groups(sigs)
    pairs, flagged = candidate_pairs(reps, cfg)
    n_flagged = flagged.count()
    assert n_flagged > 0, "expected over-ceiling LSH buckets to be flagged"
    fb = simhash_fallback_pairs(reps, flagged.localCheckpoint(), cfg).toPandas()
    # star: linear in cluster size, not quadratic
    assert 0 < len(fb) <= 29
    hubs = set(fb.url_a)
    assert len(hubs) == 1  # one hub for the boilerplate cluster
    members = set(fb.url_b) | hubs
    assert {f"u{i:03d}" for i in range(30)} <= members


def test_pair_ceiling_flags_independently_of_size_cap(spark, boilerplate_sigs):
    """bucket_pair_ceiling must bind on its own: with the size cap far above
    the 30-member boilerplate buckets but the pair ceiling below C(30,2),
    the buckets are flagged, pair expansion skips them, and the SimHash
    fallback routes their members (the round-2 dead-knob fix)."""
    sigs = boilerplate_sigs.localCheckpoint()
    _exact, reps = exact_groups(sigs)
    loose = NDDConfig(max_bucket_size=2_000)  # default ceiling: nothing flags
    pairs_loose, flagged_loose = candidate_pairs(reps, loose)
    assert flagged_loose.count() == 0
    n_loose = pairs_loose.count()
    assert n_loose > 0
    tight = NDDConfig(max_bucket_size=2_000, bucket_pair_ceiling=100)
    pairs_tight, flagged_tight = candidate_pairs(reps, tight)
    assert flagged_tight.count() > 0, "pair ceiling did not flag"
    assert pairs_tight.count() < n_loose, "pair ceiling did not gate expansion"
    fb = simhash_fallback_pairs(
        reps, flagged_tight.localCheckpoint(), tight
    ).toPandas()
    assert 0 < len(fb) <= 29  # linear star, not quadratic


def test_exact_groups_star_not_quadratic(spark):
    """200 exact copies → 199 star edges + 1 representative (not 19900 pairs)."""
    pdf = pd.DataFrame(
        [(f"u{i:04d}", "same text " * 30) for i in range(200)]
        + [("v0000", "different content entirely " * 20)],
        columns=["url", "text"],
    )
    from near_duplicate_detection_spark.functions.signatures import (
        SIGNATURE_SCHEMA,
        signature_map_fn,
    )

    sigs = spark.createDataFrame(pdf).mapInPandas(
        signature_map_fn(NDDConfig()), schema=SIGNATURE_SCHEMA
    )
    edges, reps = exact_groups(sigs)
    e = edges.toPandas()
    assert len(e) == 199
    assert set(e.url_a) == {"u0000"}
    assert (e.jaccard == 1.0).all()
    assert reps.count() == 2


def test_end_to_end_recall_with_exact_grouping(spark, tmp_path):
    """Regression: the exact-first refactor keeps full recall on planted truth."""
    base = str(tmp_path / "cat")
    clusters = NDDPipeline(spark, CFG, base).run(generate_pages(spark, N)).toPandas()
    cl = dict(zip(clusters.url, clusters.cluster_id))
    tr = truth_pairs(N)
    recall = sum(cl[a] == cl[b] for a, b in zip(tr.url_a, tr.url_b)) / len(tr)
    assert recall >= 0.99
