"""Round-6 optimization harness: noop-sink isolation per contract query
(guide §1.4) + .explain("formatted") capture (guide §7.2).

NOT the frozen driver bench (bench.py): this file exists so the optimization
round can time individual legs with labelled jobs and capture plan files
under plans/r06/ without touching the measured protocol.

Usage:
  python bench_extra.py queries [name ...]     # time + plan-dump contract queries
  python bench_extra.py plans  [suffix]        # only dump plans (default suffix: before)
  python bench_extra.py pipeline               # per-stage pipeline timing (one build)
"""

from __future__ import annotations

import json
import os
import sys
import time

PLANS_DIR = os.path.join(os.path.dirname(__file__), "plans", "r06")


def _spark():
    from near_duplicate_detection_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="ndd-bench-extra", master=f"local[{cpus}]")
    from near_duplicate_detection_spark.functions.signatures import prewarm_workers

    prewarm_workers(spark)
    return spark


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def run_queries(names=None, passes=3, suffix=None):
    from bench import CONTRACT_QUERIES

    from near_duplicate_detection_spark.plans.contract import QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    names = names or list(CONTRACT_QUERIES)
    out = {}
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        if suffix:
            os.makedirs(PLANS_DIR, exist_ok=True)
            with open(os.path.join(PLANS_DIR, f"{name}_{suffix}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        walls = []
        for _ in range(passes):
            spark.sparkContext.setJobDescription(f"q:{name}")
            t0 = time.monotonic()
            _noop(QUERIES[name](spark, sf_dir))
            walls.append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(walls), "samples": walls}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"total_min": round(sum(v["min"] for v in out.values()), 3)}))
    spark.stop()


def run_pipeline():
    import shutil
    import tempfile

    from near_duplicate_detection_spark.config import NDDConfig
    from near_duplicate_detection_spark.pipeline import NDDPipeline
    from near_duplicate_detection_spark.sources.pages import generate_pages

    n_docs = int(os.environ.get("SPARK_GRAFT_DOCS", "40000"))
    spark = _spark()
    cfg = NDDConfig()
    base = tempfile.mkdtemp(prefix="ndd_bx_")
    try:
        pipe = NDDPipeline(spark, cfg, base)
        for name, step in (
            ("ingest", lambda: pipe.stage0_ingest(generate_pages(spark, n_docs), resume=False)),
            ("stage1", lambda: pipe.stage1_signatures(resume=False)),
            ("stage2", lambda: pipe.stage2_pairs(resume=False)),
            ("stage2b", lambda: pipe.stage2b_substring(resume=False)),
            ("stage3", lambda: pipe.stage3_clusters(resume=False)),
        ):
            spark.sparkContext.setJobDescription(f"pipe:{name}")
            t0 = time.monotonic()
            step()
            print(json.dumps({name: round(time.monotonic() - t0, 3)}), flush=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if mode == "queries":
        run_queries(sys.argv[2:] or None)
    elif mode == "plans":
        run_queries(passes=0 or 1, suffix=(sys.argv[2] if len(sys.argv) > 2 else "before"))
    elif mode == "pipeline":
        run_pipeline()
    else:
        raise SystemExit(f"unknown mode {mode}")
