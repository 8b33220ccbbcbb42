"""Exact-Jaccard verification of candidate pairs.

The reference's exact-distance semantics (its query computes TRUE squared
euclidean distance against every index row, ndd/server_ndd.py:104-112)
survive here as the verification stage: LSH candidates are probabilistic;
acceptance is decided by exact Jaccard over the docs' distinct-shingle-hash
sets. All set math is JVM-side (array_intersect / size — whole-stage
codegen), no Python in the hot path.

Shuffle shape: two hash joins pairs⋈signatures (on url_a, then url_b). The
signature side projects only (url, shingles) so the scan prunes every other
column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from near_duplicate_detection_spark.config import NDDConfig


def verify_pairs(
    pairs: DataFrame, signatures: DataFrame, cfg: NDDConfig
) -> DataFrame:
    """pairs(url_a, url_b) → verified pairs with exact jaccard ≥ threshold.

    Output: (url_a, url_b, jaccard double).
    """
    sets = signatures.select("url", "shingles")
    a = sets.select(
        F.col("url").alias("url_a"), F.col("shingles").alias("sh_a")
    )
    b = sets.select(
        F.col("url").alias("url_b"), F.col("shingles").alias("sh_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        pairs.join(a, "url_a")
        .join(b, "url_b")
        .withColumn(
            "jaccard",
            F.when(union > 0, inter.cast("double") / union.cast("double"))
            .otherwise(F.lit(1.0)),
        )
        .where(F.col("jaccard") >= cfg.jaccard_threshold)
        .select("url_a", "url_b", "jaccard")
    )
