"""band_index serving index (operators/serving_index.py): partition-pruned
query probe, validated-freshness fallback, crash safety.

Contract under test:
- query_top_k over a fresh band_index is ROW-IDENTICAL to the full-view
  probe (the index is pure derived state);
- a single query's probe reads at most lsh_bands of the P partition dirs
  (directory pruning — the scale reason the index exists);
- ANY commit after the build (append, delete) flips the source stamp and
  queries fall back to the exact full view — stale serving is impossible;
- the index is built from the tombstone-resolved view, so a deleted url
  never appears even in the fresh-index path;
- a crash mid-build leaves a missing/mismatched stamp, never a
  falsely-fresh index.
"""

from __future__ import annotations

import os

import pytest

from near_duplicate_detection_spark.config import NDDConfig
from near_duplicate_detection_spark.operators import serving_index as si
from near_duplicate_detection_spark.pipeline import NDDPipeline, query_top_k
from near_duplicate_detection_spark.sources.pages import (
    doc_tokens,
    generate_pages,
    url_of,
)

CFG = NDDConfig(num_buckets=4, band_index_partitions=64)
N = 400


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("ndd_si"))
    pipe = NDDPipeline(spark, CFG, base)
    pipe.run(generate_pages(spark, N))
    return pipe


def _q(spark, pipe, doc_id=3, k=10):
    return (
        query_top_k(spark, pipe.catalog, CFG, " ".join(doc_tokens(doc_id)[0]), k=k)
        .toPandas()
        .sort_values(["jaccard", "url"])
        .reset_index(drop=True)
    )


def test_indexed_probe_equals_full_view(spark, built):
    before = _q(spark, built)
    built.build_serving_index()
    assert si.fresh_band_index(built.catalog) is not None
    after = _q(spark, built)
    assert before.equals(after)
    assert len(after) > 0 and after.jaccard.max() == 1.0


def test_probe_prunes_partitions(spark, built, tmp_path):
    """Hard pruning evidence: corrupt a partition the probe must NOT touch —
    the pruned scan still succeeds (the directory is never opened), while a
    scan aimed at that partition fails."""
    import shutil
    import subprocess

    from pyspark.sql import functions as F

    work = str(tmp_path / "cat")
    subprocess.run(["cp", "-al", built.catalog.base_dir, work], check=True)
    pipe = NDDPipeline(spark, CFG, work)
    pipe.build_serving_index()
    idx, P = si.fresh_band_index(pipe.catalog)
    assert P == CFG.band_index_partitions
    # all P partition dirs materialized at this corpus size (400*32 rows)
    dirs = {
        d
        for d in os.listdir(pipe.catalog.path(si.BAND_INDEX))
        if d.startswith("pt=")
    }
    assert len(dirs) == P
    hashes = sorted({h for _i, h in _query_bands(spark, pipe)})
    pts = set(si._pt_values(spark, hashes, P))
    assert 0 < len(pts) <= CFG.lsh_bands < P
    bad_pt = next(v for v in range(P) if v not in pts)
    bad_dir = os.path.join(pipe.catalog.path(si.BAND_INDEX), f"pt={bad_pt}")
    for f in os.listdir(bad_dir):
        if f.endswith(".parquet"):
            # hardlinked from the fixture catalog — replace, don't mutate
            os.unlink(os.path.join(bad_dir, f))
            with open(os.path.join(bad_dir, f), "wb") as fh:
                fh.write(b"this is not a parquet file")
    pruned = idx.where(F.col("pt").isin(sorted(pts)) & F.col("band_hash").isin(hashes))
    assert pruned.count() > 0  # corrupted dir pruned away, scan fine
    with pytest.raises(Exception):  # noqa: B017 — control: that dir IS broken
        idx.where(F.col("pt") == bad_pt).collect()
    shutil.rmtree(work, ignore_errors=True)


def _query_bands(spark, pipe, doc_id=3):
    import pandas as pd

    from near_duplicate_detection_spark.functions.hashing import perm_params
    from near_duplicate_detection_spark.functions.signatures import (
        compute_signatures_batch,
    )

    a, b = perm_params(CFG.num_perms)
    qsig = compute_signatures_batch(
        pd.Series(["query://q"]),
        pd.Series([" ".join(doc_tokens(doc_id)[0])]),
        CFG,
        a,
        b,
        include_shingles=True,
    )
    return [(i, int(h)) for i, h in enumerate(qsig["bands"].iloc[0])]


def test_append_staleness_falls_back(spark, built, tmp_path):
    import shutil
    import subprocess

    work = str(tmp_path / "cat")
    subprocess.run(["cp", "-al", built.catalog.base_dir, work], check=True)
    pipe = NDDPipeline(spark, CFG, work)
    pipe.build_serving_index()
    assert si.fresh_band_index(pipe.catalog) is not None
    pipe.append_pages(generate_pages(spark, N + 10, start=N))
    # the commit flipped the signatures state → stamp mismatch → fallback
    assert si.fresh_band_index(pipe.catalog) is None
    # and the fallback path SEES the appended doc (no stale serving)
    res = _q(spark, pipe, doc_id=N + 3)
    assert res[res.jaccard == 1.0].url.tolist() == [url_of(N + 3)]
    shutil.rmtree(work, ignore_errors=True)


def test_index_built_after_delete_excludes_tombstoned_url(spark, built, tmp_path):
    import shutil
    import subprocess

    work = str(tmp_path / "cat")
    subprocess.run(["cp", "-al", built.catalog.base_dir, work], check=True)
    pipe = NDDPipeline(spark, CFG, work)
    victim = url_of(3)
    pipe.delete_pages(spark.createDataFrame([(victim,)], "url string"))
    pipe.build_serving_index()
    idx, _p = si.fresh_band_index(pipe.catalog)
    assert idx.where(idx.url == victim).count() == 0
    # fresh-index query path: the deleted url never surfaces
    res = _q(spark, pipe)
    assert victim not in set(res.url)
    shutil.rmtree(work, ignore_errors=True)


def test_crash_mid_build_never_falsely_fresh(spark, built, tmp_path, monkeypatch):
    import shutil
    import subprocess

    work = str(tmp_path / "cat")
    subprocess.run(["cp", "-al", built.catalog.base_dir, work], check=True)
    pipe = NDDPipeline(spark, CFG, work)
    pipe.build_serving_index()
    assert si.fresh_band_index(pipe.catalog) is not None

    # kill the build right after the index write, before the stamp write
    def boom(*a, **k):
        raise RuntimeError("crash before stamp")

    monkeypatch.setattr(pipe.catalog, "write_small_local", boom)
    with pytest.raises(RuntimeError, match="crash before stamp"):
        pipe.build_serving_index()
    monkeypatch.undo()
    assert si.fresh_band_index(pipe.catalog) is None  # stamp gone → fallback
    # and queries still answer correctly through the fallback
    res = _q(spark, pipe)
    assert len(res) > 0 and res.jaccard.max() == 1.0
    shutil.rmtree(work, ignore_errors=True)


def test_compact_refreshes_existing_index(spark, built, tmp_path):
    import shutil
    import subprocess

    work = str(tmp_path / "cat")
    subprocess.run(["cp", "-al", built.catalog.base_dir, work], check=True)
    pipe = NDDPipeline(spark, CFG, work)
    pipe.build_serving_index()
    victim = url_of(7)
    pipe.delete_pages(spark.createDataFrame([(victim,)], "url string"))
    assert si.fresh_band_index(pipe.catalog) is None  # stale after commit
    out = pipe.compact()  # folds tombstones → rewrites signatures buckets
    assert si.BAND_INDEX in out  # compact rebuilt the index it invalidated
    idx, _p = si.fresh_band_index(pipe.catalog)
    assert idx is not None and idx.where(idx.url == victim).count() == 0
    # a compact with nothing to do leaves the fresh index alone (no rebuild)
    assert pipe.compact() == {}
    assert si.fresh_band_index(pipe.catalog) is not None
    shutil.rmtree(work, ignore_errors=True)


def test_knob_excluded_from_hashes_and_resume(spark, built):
    # band_index_partitions is execution strategy: changing it must not
    # invalidate any stage hash (no resume rebuild)
    a, b = NDDConfig(), NDDConfig(band_index_partitions=17)
    for h in ("stage1_hash", "stage2_hash", "stage2b_hash", "stage3_hash"):
        assert getattr(a, h)() == getattr(b, h)()
