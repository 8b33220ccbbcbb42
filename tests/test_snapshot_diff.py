"""Snapshot-diff provider seam (run_incremental(changed_buckets=...)) —
round-4 VERDICT next-round #2: a caller that can enumerate the drifted
url-hash buckets (the Iceberg snapshot-metadata analog) must get an
inferred-path run whose control-plane scans touch ONLY those buckets —
stage-0 ``_input_stats``, the pure-append url probe, and stage-2
``classify_drift``'s full-outer join — while producing the same cluster
partition as a full rebuild. Default behavior (no ``changed_buckets``)
stays corpus-inferred and is pinned by the rest of the suite.

Spy strategy (the test_explicit_retraction poison pattern, adapted): the
restricted scans still RUN — so instead of raising unconditionally, the
spies assert semantically that every frame reaching them contains zero
rows outside the declared buckets (an unrestricted corpus frame always
does), then delegate to the real implementation. The pure-append case
poisons outright: that path must never call ``_input_stats`` or
``classify_drift`` at all."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

import near_duplicate_detection_spark.operators.delta as delta_mod
from near_duplicate_detection_spark.config import NDDConfig
from near_duplicate_detection_spark.pipeline import NDDPipeline
from near_duplicate_detection_spark.sources.pages import generate_pages, url_of

# 8 buckets so a 3-url drift set occupies a PROPER subset of buckets —
# with 4 the declared set too often covers everything and the restriction
# assertions would be vacuous
CFG = NDDConfig(num_buckets=8)
N = 200


def _partition(clusters_pdf):
    return {
        frozenset(grp.url) for _, grp in clusters_pdf.groupby("cluster_id")
    }


def _buckets_of(spark, urls) -> set[int]:
    rows = (
        spark.createDataFrame([(u,) for u in urls], "url string")
        .select(
            F.pmod(F.xxhash64("url"), F.lit(CFG.num_buckets))
            .cast("int")
            .alias("b")
        )
        .collect()
    )
    return {int(r["b"]) for r in rows}


def _assert_within(df, buckets: set[int], label: str) -> None:
    outside = df.where(
        ~F.pmod(F.xxhash64("url"), F.lit(CFG.num_buckets))
        .cast("int")
        .isin([int(b) for b in sorted(buckets)])
    )
    assert outside.limit(1).count() == 0, (
        f"{label} reached a control-plane scan UNRESTRICTED "
        f"(rows outside declared buckets {sorted(buckets)})"
    )


@pytest.fixture(scope="module")
def base_catalog(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("ndd_sd_base"))
    NDDPipeline(spark, CFG, base).run(generate_pages(spark, N))
    return base


def _copy(base, tmp_path_factory, name):
    dst = str(tmp_path_factory.mktemp(name) / "cat")
    shutil.copytree(base, dst)
    return dst


def test_mixed_drift_restricted_scans_match_full(
    spark, tmp_path_factory, monkeypatch, base_catalog
):
    """Edit one doc + append two (mixed drift → the slow inferred path with
    a targeted retraction). With changed_buckets declared, every frame
    reaching _input_stats / classify_drift must be bucket-restricted, and
    the result must equal a from-scratch rebuild of the same snapshot."""
    # doc 20 is an exact-dup rep (21 copies it) — the structure-cutting edit
    snapshot = generate_pages(spark, N + 2).withColumn(
        "text",
        F.when(
            F.col("url").endswith("0020"),
            F.concat(F.col("text"), F.lit(" seam edited tail")),
        ).otherwise(F.col("text")),
    )
    changed = _buckets_of(
        spark, [url_of(20), url_of(N), url_of(N + 1)]
    )
    assert len(changed) < CFG.num_buckets  # restriction is non-vacuous
    calls = {"stats": 0, "drift": 0}

    orig_stats = NDDPipeline._input_stats
    orig_drift = delta_mod.classify_drift

    def spy_stats(self, pages):
        _assert_within(pages, changed, "_input_stats")
        calls["stats"] += 1
        return orig_stats(self, pages)

    def spy_drift(signatures, seen):
        _assert_within(signatures, changed, "classify_drift(signatures)")
        _assert_within(seen, changed, "classify_drift(seen)")
        calls["drift"] += 1
        return orig_drift(signatures, seen)

    monkeypatch.setattr(NDDPipeline, "_input_stats", spy_stats)
    monkeypatch.setattr(delta_mod, "classify_drift", spy_drift)

    cat_dir = _copy(base_catalog, tmp_path_factory, "ndd_sd_mixed")
    pipe = NDDPipeline(spark, CFG, cat_dir)
    clusters = pipe.run_incremental(
        snapshot, changed_buckets=changed
    ).toPandas()
    # r6: stage 0 consumes the pure-append probe's identity aggregate as
    # its stats (the probe frame is _restrict_changed-built — its
    # restriction is spy-verified by the pure-append test below), so
    # _input_stats may legitimately never run here; its spy stays as a
    # guard on any path that still reaches it.
    assert calls["drift"] >= 1
    assert pipe._changed_buckets is None  # seam reset after the run
    assert len(clusters) == N + 2

    monkeypatch.undo()  # the comparison rebuild legitimately scans
    full = (
        NDDPipeline(
            spark, CFG, str(tmp_path_factory.mktemp("ndd_sd_full"))
        )
        .run(snapshot)
        .toPandas()
    )
    assert _partition(clusters) == _partition(full)


def test_pure_append_with_seam_never_full_scans(
    spark, tmp_path_factory, monkeypatch, base_catalog
):
    """Append-only drift + declared buckets: the fast path (restricted url
    probe → append_pages) must complete WITHOUT ever invoking the two
    corpus control-plane scans — both are poisoned to raise — and match a
    full rebuild."""
    snapshot = generate_pages(spark, N + 3)
    changed = _buckets_of(spark, [url_of(N + i) for i in range(3)])

    def boom(*a, **k):  # pragma: no cover - failure mode
        raise AssertionError("corpus control-plane scan invoked")

    monkeypatch.setattr(NDDPipeline, "_input_stats", boom)
    monkeypatch.setattr(delta_mod, "classify_drift", boom)

    cat_dir = _copy(base_catalog, tmp_path_factory, "ndd_sd_append")
    pipe = NDDPipeline(spark, CFG, cat_dir)
    clusters = pipe.run_incremental(
        snapshot, changed_buckets=changed
    ).toPandas()
    assert len(clusters) == N + 3

    monkeypatch.undo()
    full = (
        NDDPipeline(
            spark, CFG, str(tmp_path_factory.mktemp("ndd_sd_afull"))
        )
        .run(snapshot)
        .toPandas()
    )
    assert _partition(clusters) == _partition(full)


def test_delete_drift_restricted_matches_full(
    spark, tmp_path_factory, monkeypatch, base_catalog
):
    """Delete-only drift under the seam: the snapshot drops two docs (one an
    exact-dup rep whose rows must transfer to the surviving member). The
    slow path's restricted scans must stay inside the declared buckets and
    the retraction must match a from-scratch rebuild of the shrunken
    corpus."""
    gone = [url_of(20), url_of(11)]
    snapshot = generate_pages(spark, N).where(~F.col("url").isin(gone))
    changed = _buckets_of(spark, gone)
    assert len(changed) < CFG.num_buckets

    orig_stats = NDDPipeline._input_stats
    orig_drift = delta_mod.classify_drift

    def spy_stats(self, pages):
        _assert_within(pages, changed, "_input_stats")
        return orig_stats(self, pages)

    def spy_drift(signatures, seen):
        _assert_within(signatures, changed, "classify_drift(signatures)")
        _assert_within(seen, changed, "classify_drift(seen)")
        return orig_drift(signatures, seen)

    monkeypatch.setattr(NDDPipeline, "_input_stats", spy_stats)
    monkeypatch.setattr(delta_mod, "classify_drift", spy_drift)

    cat_dir = _copy(base_catalog, tmp_path_factory, "ndd_sd_del")
    pipe = NDDPipeline(spark, CFG, cat_dir)
    clusters = pipe.run_incremental(
        snapshot, changed_buckets=changed
    ).toPandas()
    assert len(clusters) == N - 2
    assert not set(gone) & set(clusters.url)

    monkeypatch.undo()
    full = (
        NDDPipeline(
            spark, CFG, str(tmp_path_factory.mktemp("ndd_sd_dfull"))
        )
        .run(snapshot)
        .toPandas()
    )
    assert _partition(clusters) == _partition(full)


def test_changed_buckets_validation(spark, tmp_path_factory, base_catalog):
    cat_dir = _copy(base_catalog, tmp_path_factory, "ndd_sd_val")
    pipe = NDDPipeline(spark, CFG, cat_dir)
    with pytest.raises(ValueError, match="changed_buckets"):
        pipe.run_incremental(
            generate_pages(spark, N), changed_buckets=[CFG.num_buckets]
        )
    assert pipe._changed_buckets is None
