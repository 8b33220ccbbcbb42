"""Stage 2b — exact long-repeat detection (rolling windows + suffix-array verify).

MinHash misses pairs whose only relation is one long verbatim run inside
otherwise-unrelated text (global Jaccard far below threshold). This pass:

  1. fingerprints each doc's normalized text with CONTENT-DEFINED anchored
     windows: a position i is an anchor iff the rolling hash of the g-gram
     t[i:i+g] ≡ 0 (mod d); each anchor contributes the W-char window t[i:i+W].
     Because the anchor decision depends only on run content, a verbatim run
     shared at DIFFERENT offsets in two docs anchors at the SAME in-run
     positions — fixed-stride windows would mis-align (this is the winnowing /
     content-defined-chunking idea). A shared run of length L ≥ min_len
     contains an eligible anchor w.p. 1-(1-1/d)^(L-W-g) ≈ 1-1e-15 at the
     default (d=8, W=64, L=200);
  2. groups window hashes (one shuffle), expands candidate pairs map-side
     under the same bucket ceiling as LSH (boilerplate windows are capped
     and flagged, not silently dropped);
  3. verifies each candidate pair with an exact suffix-array
     longest-common-run (functions/suffix.py) over the pair's texts inside
     an Arrow-batched UDF — only candidate pairs pay this cost.

Reference lineage: this is the graft of the reference's external shotdetect
segmentation + exact per-record verification shape (ndd/shotdetect.py:58-75
produces exact boundaries; ndd/server_ndd.py:104-112 verifies exactly).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from near_duplicate_detection_spark.config import NDDConfig
from near_duplicate_detection_spark.functions.hashing import hash_str_array
from near_duplicate_detection_spark.functions.suffix import (
    common_run_at_least,
    longest_common_run,
)
from near_duplicate_detection_spark.functions.text import normalize_text
from near_duplicate_detection_spark.operators.lsh import _PAIRS_EXPR

WINDOW_SCHEMA = "url string, win_hash bigint"


_ROLL_B = np.uint64(1099511628211)  # FNV prime as polynomial base


def anchor_positions(t: str, g: int, d: int) -> np.ndarray:
    """Content-defined anchor positions of a normalized string (vectorized)."""
    raw = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    n = len(raw)
    if n < g:
        return np.empty(0, dtype=np.int64)
    h = np.zeros(n - g + 1, dtype=np.uint64)
    for j in range(g):  # g shifted vectorized adds — no per-char Python
        h = h * _ROLL_B + raw[j : n - g + 1 + j]
    return np.nonzero(h % np.uint64(d) == 0)[0].astype(np.int64)


def window_fingerprint_fn(cfg: NDDConfig, text_col: str = "text"):
    """mapInPandas fn: (url, text) → (url, win_hash) rows, windows distinct per doc."""
    w, g, d = cfg.substring_window, cfg.substring_anchor_gram, cfg.substring_anchor_mod

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            urls: list[str] = []
            wins: list[str] = []
            for url, text in zip(pdf["url"], pdf[text_col]):
                t = normalize_text(text or "")
                if len(t) < w:
                    continue
                anchors = anchor_positions(t, g, d)
                anchors = anchors[anchors <= len(t) - w]
                doc_wins = {t[i : i + w] for i in anchors}
                urls.extend([url] * len(doc_wins))
                wins.extend(doc_wins)
            hashes = hash_str_array(wins).view(np.int64) if wins else np.empty(
                0, dtype=np.int64
            )
            yield pd.DataFrame({"url": urls, "win_hash": hashes})

    return fn


def substring_candidates(
    pages: DataFrame, cfg: NDDConfig, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """→ (pairs(url_a, url_b), flagged(win_hash, bucket_size)).

    Two-phase plan: phase 1 shuffles only (win_hash, count) — 16 bytes/row
    with map-side combine — to find the rare multi-doc window hashes; phase 2
    recomputes the (cheap) fingerprints and joins against that small hash set
    (AQE runtime-broadcasts it), so the url-carrying shuffle only sees rows
    that can actually pair. At corpus scale the overwhelming majority of
    windows are unique: shipping their urls to a groupBy would dominate the
    stage, exactly like the reference eagerly resizing all N images before
    top-k filtering (server_ndd.py:118-123) — the anti-pattern SURVEY bans.
    """
    windows = pages.select("url", text_col).mapInPandas(
        window_fingerprint_fn(cfg, text_col), schema=WINDOW_SCHEMA
    )
    # multi-doc window hashes are rare → materialize them once (small); the
    # flagged metric and the pruning join both derive from this checkpoint
    # instead of re-running the fingerprint pass
    counts = (
        windows.groupBy("win_hash").count().where(F.col("count") >= 2)
    ).localCheckpoint()
    flagged = counts.where(F.col("count") > cfg.max_bucket_size).select(
        "win_hash", F.col("count").alias("bucket_size")
    )
    ok_hashes = counts.where(F.col("count") <= cfg.max_bucket_size).select(
        "win_hash"
    )
    pairs = (
        windows.join(F.broadcast(ok_hashes), "win_hash")
        .groupBy("win_hash")
        .agg(F.collect_list("url").alias("urls"))
        .select(F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
        .select("p.url_a", "p.url_b")
        .dropDuplicates(["url_a", "url_b"])
    )
    return pairs, flagged


def verify_substring_pairs(
    pairs: DataFrame, pages: DataFrame, cfg: NDDConfig, text_col: str = "text"
) -> DataFrame:
    """Exact suffix-array verification → (url_a, url_b, common_run bigint)."""
    texts = pages.select("url", text_col)
    a = texts.select(F.col("url").alias("url_a"), F.col(text_col).alias("text_a"))
    b = texts.select(F.col("url").alias("url_b"), F.col(text_col).alias("text_b"))
    # Spread candidate pairs across all cores BEFORE the python LCS UDF:
    # AQE coalesces the (tiny-by-bytes) pair shuffle to one partition, which
    # would serialize the expensive per-pair suffix-array work on one core.
    # 4 partitions per core: the per-pair LCS cost is highly variable, so a
    # finer grain keeps the last wave short (straggler tail)
    n_parts = pairs.sparkSession.sparkContext.defaultParallelism * 4
    joined = pairs.join(a, "url_a").join(b, "url_b").repartition(n_parts)
    min_len = cfg.substring_min_len

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            runs = np.zeros(len(pdf), dtype=np.int64)
            for i, (ta, tb) in enumerate(zip(pdf["text_a"], pdf["text_b"])):
                na, nb = normalize_text(ta or ""), normalize_text(tb or "")
                # vectorized rolling-hash prefilter rejects most pairs;
                # the exact suffix-array LCS runs only on survivors
                if common_run_at_least(na, nb, min_len):
                    runs[i] = longest_common_run(na, nb)
            out = pd.DataFrame(
                {
                    "url_a": pdf["url_a"],
                    "url_b": pdf["url_b"],
                    "common_run": runs,
                }
            )
            yield out[out["common_run"] >= min_len]

    return joined.mapInPandas(fn, schema="url_a string, url_b string, common_run bigint")
