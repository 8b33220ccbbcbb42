"""Config-hash contract: knobs that change the OUTPUT chain into stage
hashes (skew ceilings → stage 2 AND 2b); knobs that only pick the execution
strategy (retraction/remap/driver-CC ceilings) are excluded — changing them
must never invalidate committed state."""

from __future__ import annotations

from near_duplicate_detection_spark.config import NDDConfig
from near_duplicate_detection_spark.pipeline import NDDPipeline
from near_duplicate_detection_spark.sources.pages import generate_pages

BASE = NDDConfig(num_buckets=4)


def test_skew_ceilings_chain_into_stage2b_hash():
    for knob in ("max_bucket_size", "bucket_pair_ceiling"):
        changed = NDDConfig(num_buckets=4, **{knob: 777})
        assert changed.stage2b_hash() != BASE.stage2b_hash(), knob
        assert changed.stage2_hash() != BASE.stage2_hash(), knob
        # and stage 3 inherits the invalidation through both parents
        assert changed.stage3_hash() != BASE.stage3_hash(), knob


def test_execution_knobs_do_not_touch_stage_hashes():
    changed = NDDConfig(
        num_buckets=4,
        max_retract=1,
        max_remap=1,
        driver_cc_max=1,
        retract_patch_ceiling=1,
        clusters_append_ceiling=1,
        page_tombstone_ceiling=0,
        query_collect_ceiling=0,
    )
    assert changed.stage1_hash() == BASE.stage1_hash()
    assert changed.stage2_hash() == BASE.stage2_hash()
    assert changed.stage2b_hash() == BASE.stage2b_hash()
    assert changed.stage3_hash() == BASE.stage3_hash()


def test_execution_knobs_preserve_resume_state(spark, tmp_path):
    """A catalog built under default knobs stays fully resumable under
    different execution knobs: both deltas accept and no-op."""
    base = str(tmp_path)
    NDDPipeline(spark, BASE, base).run(generate_pages(spark, 80))
    tweaked = NDDPipeline(
        spark,
        NDDConfig(num_buckets=4, max_retract=7, max_remap=9, driver_cc_max=3),
        base,
    )
    n_pairs = tweaked.catalog.count_rows("pairs")
    assert tweaked.stage2_pairs_delta() is True
    assert tweaked.stage2b_delta() is True
    assert tweaked.catalog.count_rows("pairs") == n_pairs


def test_ceiling_change_invalidates_2b_delta_state(spark, tmp_path):
    """The ADVICE regression: changing bucket_pair_ceiling must not let the
    2b delta early-return stale substring_pairs — the run hash AND the
    seen_2b stamp both move."""
    base = str(tmp_path)
    NDDPipeline(spark, BASE, base).run(generate_pages(spark, 80))
    changed = NDDPipeline(
        spark, NDDConfig(num_buckets=4, bucket_pair_ceiling=999), base
    )
    assert changed.stage2b_delta() is False
