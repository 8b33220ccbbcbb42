"""One-off weak-scaling probe for the incremental-append paths (VERDICT r3
next-round #7): extend the per-appended-doc cost curve one more decade by
measuring a 10% append onto a 4M-doc corpus (40k → 400k → 4M bases).

Usage: python BENCH/append_scale_probe.py [n_docs] [passes] [legs]
``legs`` is a comma-separated subset of bench.py's incremental keys
(default: the two append legs); pass ``all`` for every leg — the
retraction legs' weak-scaling points use this.
Prints one JSON line mirroring bench.py's incremental keys.

Protocol notes (BENCH/BASELINE.md): min-of-passes against fresh hardlink
catalog copies; single JVM; the full build that seeds the catalog is timed
too (it doubles as the weak-scaling full-build point at this n).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _measure_incremental, _run_pipeline  # noqa: E402


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    legs = (
        ("incremental_append_sec", "append_pages_sec")
        if len(sys.argv) < 4
        else (
            None  # every leg, including the inferred/explicit retractions
            if sys.argv[3] == "all"
            else tuple(sys.argv[3].split(","))
        )
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from near_duplicate_detection_spark.config import NDDConfig
    from near_duplicate_detection_spark.functions.signatures import (
        prewarm_workers,
    )
    from near_duplicate_detection_spark.session import get_spark

    spark = get_spark(
        app_name="ndd-append-probe", master=f"local[{cpus}]"
    )
    prewarm_workers(spark)
    # max_retract is an EXECUTION knob (broadcast-map ceiling, excluded
    # from stage hashes): a 10% batch on a 4M corpus is 400k urls, over the
    # 100k default — raise it here so the explicit retraction legs measure
    # the engine's cost shape rather than the ceiling's refusal policy.
    mr = int(os.environ.get("SPARK_GRAFT_MAX_RETRACT", "0"))
    cfg = NDDConfig(max_retract=mr) if mr else NDDConfig()
    timings: dict[str, float] = {}
    t0 = time.monotonic()
    kept = _run_pipeline(spark, cfg, n_docs, timings, keep=True)
    build_sec = time.monotonic() - t0
    out = {
        "metric": "ndd_append_scale_probe",
        "dedup_docs": n_docs,
        "cpus": int(cpus),
        "full_build_sec": round(build_sec, 3),
        "full_build_docs_per_sec": round(n_docs / build_sec, 1),
        "stages": timings,
        **({"max_retract": mr} if mr else {}),
    }
    out.update(
        _measure_incremental(
            spark,
            cfg,
            kept,
            n_docs,
            passes=passes,
            only=legs,
        )
    )
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
