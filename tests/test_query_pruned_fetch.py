"""query_top_k's partition-pruned candidate-text fetch (pipeline.py
_candidate_texts): the verify step must read only the buckets holding
candidate urls, not the whole pages table.

Contract under test:
- pruned fetch is ROW-IDENTICAL to the unpruned semi-join fallback
  (query_collect_ceiling=0 forces the fallback — an execution knob, so
  both configs read the same committed catalog);
- hard pruning evidence: a poison row planted in a bucket holding NO
  candidate urls is invisible to the pruned fetch (directory never read)
  but visible to the full-scan fallback — deterministic, unlike corrupting
  a file, because schema inference may open any footer;
- the knob stays out of every stage hash (test_config_knobs).
"""

from __future__ import annotations

import os
import subprocess

import pytest

from near_duplicate_detection_spark.config import NDDConfig
from near_duplicate_detection_spark.pipeline import NDDPipeline, query_top_k
from near_duplicate_detection_spark.sources.pages import doc_tokens, generate_pages

CFG = NDDConfig(num_buckets=16)
CFG_FALLBACK = NDDConfig(num_buckets=16, query_collect_ceiling=0)
N = 200
QUERY_DOC = 3
# perturbed (not an exact corpus text): hits must score BELOW 1.0 so the
# poison row (text == query text, jaccard 1.0) is distinguishable
QUERY_TEXT = " ".join(doc_tokens(QUERY_DOC)[0]) + " zzq"


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("ndd_qpf"))
    pipe = NDDPipeline(spark, CFG, base)
    pipe.run(generate_pages(spark, N))
    return pipe


def _q(spark, pipe, cfg, k=10):
    return (
        query_top_k(spark, pipe.catalog, cfg, QUERY_TEXT, k=k)
        .toPandas()
        .sort_values(["jaccard", "url"])
        .reset_index(drop=True)
    )


def test_pruned_fetch_equals_fallback(spark, built):
    pruned = _q(spark, built, CFG)
    full = _q(spark, built, CFG_FALLBACK)
    assert len(pruned) > 0
    assert pruned.equals(full)


def _bucket_of(spark, urls, n_buckets):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return {
        r["url"]: int(r["b"])
        for r in df.select(
            "url",
            F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int").alias("b"),
        ).collect()
    }


def test_pruned_fetch_skips_noncandidate_buckets(spark, built, tmp_path):
    """Poison-row evidence: a row (url=candidate, text=query text) planted
    in a bucket that holds no candidates scores jaccard 1.0 — the fallback
    full scan picks it up, the pruned fetch never opens its directory."""
    import pyarrow.parquet as pq

    work = str(tmp_path / "cat")
    subprocess.run(["cp", "-al", built.catalog.base_dir, work], check=True)
    pipe = NDDPipeline(spark, CFG, work)

    base = _q(spark, pipe, CFG)
    # a candidate below 1.0 — the poison will lift exactly this url
    below = base[base.jaccard < 1.0]
    assert len(below) > 0, "fixture must yield a non-exact candidate"
    victim = below.iloc[-1]["url"]

    # candidate-FREE buckets must be computed from the full probe output
    # (what the pruned fetch actually reads), not the top-k result subset
    import pandas as pd

    from near_duplicate_detection_spark.functions.hashing import perm_params
    from near_duplicate_detection_spark.functions.signatures import (
        compute_signatures_batch,
    )
    from near_duplicate_detection_spark.operators.serving_index import probe_urls

    a, b = perm_params(CFG.num_perms)
    qsig = compute_signatures_batch(
        pd.Series(["query://q"]),
        pd.Series([QUERY_TEXT]),
        CFG,
        a,
        b,
        include_shingles=True,
    )
    q_bands = [(i, int(h)) for i, h in enumerate(qsig["bands"].iloc[0])]
    cand_urls = [
        r["url"] for r in probe_urls(spark, pipe.catalog, q_bands).collect()
    ]
    assert set(base.url) <= set(cand_urls)
    buckets = _bucket_of(spark, cand_urls, CFG.num_buckets)
    cand_buckets = set(buckets.values())
    free = [b for b in range(CFG.num_buckets) if b not in cand_buckets]
    assert free, "fixture must leave at least one candidate-free bucket"
    bad = free[0]

    # clone a real file's schema so inference is unaffected, swap in the
    # poison row, land it in the candidate-free bucket's directory
    victim_dir = os.path.join(
        pipe.catalog.path("pages"), f"bucket={buckets[victim]}"
    )
    src = next(
        os.path.join(victim_dir, f)
        for f in sorted(os.listdir(victim_dir))
        if f.endswith(".parquet")
    )
    t = pq.read_table(src)
    one = t.slice(0, 1).to_pydict()
    one["url"] = [victim]
    one["text"] = [QUERY_TEXT]
    import pyarrow as pa

    bad_dir = os.path.join(pipe.catalog.path("pages"), f"bucket={bad}")
    os.makedirs(bad_dir, exist_ok=True)
    pq.write_table(
        pa.Table.from_pydict(one, schema=t.schema),
        os.path.join(bad_dir, "poison.parquet"),
    )

    pruned = _q(spark, pipe, CFG)
    assert pruned.equals(base), "pruned fetch must never read the poison dir"

    full = _q(spark, pipe, CFG_FALLBACK)
    lifted = full[full.url == victim]
    assert len(lifted) == 1 and lifted.iloc[0]["jaccard"] == 1.0, (
        "control: the full scan must see the poison row"
    )
