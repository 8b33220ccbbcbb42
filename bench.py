"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Headline = the engine's own three-stage dedup build over a deterministic
synthetic pages table scaled by sf (the north-rule workload), plus
representative contract queries over the driver tables at the sf dir.
Extra keys (dedup_docs, dedup_docs_per_sec) quantify dedup throughput.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    from near_duplicate_detection_spark.config import NDDConfig
    from near_duplicate_detection_spark.pipeline import NDDPipeline
    from near_duplicate_detection_spark.session import get_spark
    from near_duplicate_detection_spark.sources.pages import generate_pages

    spark = get_spark(app_name="ndd-bench", master=f"local[{cpus}]")
    from near_duplicate_detection_spark.functions.signatures import prewarm_workers

    prewarm_workers(spark)  # untimed cluster warmup (see function docstring)
    timings: dict[str, float] = {}

    # ---- headline: full near-dup pipeline over synthetic pages (~400k*sf docs)
    n_docs = max(int(400_000 * sf), 2_000)
    cfg = NDDConfig()
    base = tempfile.mkdtemp(prefix="ndd_bench_")
    try:
        pipe = NDDPipeline(spark, cfg, base)
        t0 = time.monotonic()
        pipe.stage0_ingest(generate_pages(spark, n_docs), resume=False)
        timings["dedup_ingest"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        pipe.stage1_signatures(resume=False)
        timings["dedup_stage1_signatures"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        pipe.stage2_pairs(resume=False)
        timings["dedup_stage2_lsh_verify"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        pipe.stage2b_substring(resume=False)
        timings["dedup_stage2b_substring"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        pipe.stage3_clusters(resume=False)
        timings["dedup_stage3_clusters"] = round(time.monotonic() - t0, 3)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    dedup_sec = sum(v for k, v in timings.items() if k.startswith("dedup_stage"))

    # ---- contract queries over the sf-dir driver tables
    from near_duplicate_detection_spark.plans.contract import QUERIES

    for name in (
        "window_dedup_topk",
        "two_level_minmax",
        "interval_join",
        "sessionize",
        "embedding_knn_bruteforce",
        "ngram_jaccard_pairs",
        "lsh_candidate_pairs",
        "near_dup_clusters",
        "ann_ivf_topk",
    ):
        t0 = time.monotonic()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.monotonic() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "ndd_bench_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "dedup_docs": n_docs,
                "dedup_pipeline_sec": round(dedup_sec, 3),
                "dedup_docs_per_sec": round(n_docs / dedup_sec, 1) if dedup_sec else None,
                "cpus": int(cpus),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
