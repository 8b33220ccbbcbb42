"""LSH band equi-join candidate generation.

Replaces the reference's brute-force O(N)-per-query distance scan
(ndd/server_ndd.py:104-117, dense matmul over the whole index) with banding:
docs sharing any (band_id, band_hash) bucket become candidate pairs — an
equi-join Catalyst can shuffle-partition, instead of an all-pairs cross join.

Shuffle budget: ONE wide shuffle (groupBy band key), pair expansion map-side
via higher-order array functions (JVM codegen, no Python), then one dedup
shuffle on the canonical pair. Singleton buckets — the overwhelming majority —
are dropped by the post-aggregation size filter before any pair is
materialized.

Skew control (SURVEY §4.2): boilerplate-heavy shingles / hot domains produce
giant band buckets whose pair expansion is quadratic. Buckets above
``max_bucket_size`` are excluded from pair expansion and FLAGGED into the
metrics table (no silent caps) — callers route them to the SimHash-prefix
fallback rather than dropping recall silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from near_duplicate_detection_spark.config import NDDConfig

# map-side pair expansion: all unordered pairs of a bucket's url array,
# canonicalized (least, greatest) — SURVEY J6
_PAIRS_EXPR = """
flatten(
  transform(urls, (x, i) ->
    transform(slice(urls, i + 2, size(urls) - i - 1), y ->
      named_struct('url_a', least(x, y), 'url_b', greatest(x, y)))))
"""


def explode_bands(signatures: DataFrame) -> DataFrame:
    """signatures(url, bands) → (url, band_id, band_hash)."""
    return signatures.select(
        "url", F.posexplode("bands").alias("band_id", "band_hash")
    )


def exact_groups(signatures: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Exact-duplicate star edges + unique-content representatives.

    Web corpora are exact-duplicate heavy; feeding N identical docs into LSH
    puts all N in every band bucket → quadratic pair expansion (the skew the
    reference never faces because its index is one node). Instead: group by
    content fingerprint once, link each group as a STAR to its min-url
    representative (linear edges, transitively equivalent for clustering),
    and run LSH/substring over representatives only.

    → (exact_edges(url_a, url_b, jaccard=1.0), reps(signature rows)).

    groupBy-min + join rather than an unbounded window: a window must SORT
    each fp partition, and a million-copy boilerplate group lands in one
    sort partition AQE cannot split — the join path is skew-splittable."""
    rep_map = signatures.groupBy("fp").agg(F.min("url").alias("rep"))
    with_rep = signatures.join(rep_map, "fp")
    exact_edges = (
        with_rep.where(F.col("url") != F.col("rep"))
        .select(
            F.col("rep").alias("url_a"),
            F.col("url").alias("url_b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    reps = with_rep.where(F.col("url") == F.col("rep")).drop("rep")
    return exact_edges, reps


def over_ceiling(cfg: NDDConfig, size_col: str = "bucket_size"):
    """Boolean column: bucket exceeds EITHER skew limit — member count above
    ``max_bucket_size`` or pair expansion C(size, 2) above
    ``bucket_pair_ceiling``. Both knobs gate the quadratic pair blow-up; the
    pair ceiling binds first when max_bucket_size is raised (C(2001,2) ≈ 2M).
    Every consumer (expansion, flagging, fallback routing, 2b window buckets,
    delta paths) uses THIS predicate so no bucket is silently dropped."""
    bs = F.col(size_col).cast("bigint")
    return (bs > cfg.max_bucket_size) | (
        bs * (bs - 1) > 2 * cfg.bucket_pair_ceiling
    )


def band_buckets(signatures: DataFrame, cfg: NDDConfig) -> DataFrame:
    """All multi-member LSH buckets: (band_id, band_hash, urls, bucket_size)."""
    return (
        explode_bands(signatures)
        .groupBy("band_id", "band_hash")
        .agg(F.collect_list("url").alias("urls"))
        .withColumn("bucket_size", F.size("urls"))
        .where(F.col("bucket_size") >= 2)
    )


def flagged_buckets(buckets: DataFrame, cfg: NDDConfig) -> DataFrame:
    return buckets.where(over_ceiling(cfg)).select(
        "band_id", "band_hash", "bucket_size"
    )


def pairs_from_buckets(
    buckets: DataFrame, cfg: NDDConfig, dedup: bool = True
) -> DataFrame:
    """Map-side pair expansion of under-ceiling buckets, canonical + distinct.

    dedup=False defers the distinct shuffle to the caller — the pipeline
    unions these with the SimHash fallback pairs and dedups ONCE."""
    out = (
        buckets.where(~over_ceiling(cfg))
        .select(F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
        .select("p.url_a", "p.url_b")
    )
    return out.dropDuplicates(["url_a", "url_b"]) if dedup else out


def candidate_pairs(
    signatures: DataFrame, cfg: NDDConfig
) -> tuple[DataFrame, DataFrame]:
    """→ (pairs(url_a, url_b), flagged_buckets(band_id, band_hash, bucket_size)).

    pairs is distinct on the canonical (url_a < url_b) key across all bands.
    Callers that take multiple actions over the results should materialize
    band_buckets(...) once (it is small — multi-member buckets only) and use
    pairs_from_buckets/flagged_buckets directly, as the pipeline does.
    """
    buckets = band_buckets(signatures, cfg)
    return pairs_from_buckets(buckets, cfg), flagged_buckets(buckets, cfg)


def flagged_members(buckets: DataFrame, cfg: NDDConfig) -> DataFrame:
    """Urls of over-ceiling buckets, straight from the materialized bucket
    table — re-deriving them by re-exploding every signature's bands (the
    round-1 shape) costs a full corpus-wide explode+shuffle even when
    NOTHING is flagged."""
    return (
        buckets.where(over_ceiling(cfg))
        .select(F.explode("urls").alias("url"))
        .distinct()
    )


def simhash_fallback_pairs(
    signatures: DataFrame, flagged: DataFrame, cfg: NDDConfig,
    prefix_bits: int = 16, dedup: bool = True,
) -> DataFrame:
    """Recall fallback for members of over-ceiling LSH buckets.

    Docs whose band landed in a flagged bucket are re-bucketed by a SimHash
    prefix (near-identical pages share high simhash bits) and linked as a
    STAR to the bucket's min url — LINEAR in bucket size, so a
    million-page boilerplate cluster yields a million edges, not 10^12
    pairs. Star links still pass the exact-Jaccard verify individually, so
    a weak hub link prunes correctly; the flagged metrics row records that
    the cap was applied (no silent caps).

    ``flagged`` may be either flagged bucket keys (band_id, band_hash) or a
    pre-computed member url set (a `url` column) — the pipeline passes
    flagged_members(buckets) so the corpus-wide band explode never re-runs.
    """
    if "url" in flagged.columns:
        members = flagged.select("url")
    else:
        members = (
            explode_bands(signatures)
            .join(
                flagged.select("band_id", "band_hash"),
                ["band_id", "band_hash"],
            )
            .select("url")
            .distinct()
        )
    sims = signatures.join(members, "url").select(
        "url",
        F.shiftrightunsigned(
            F.col("simhash"), 64 - prefix_bits
        ).alias("sim_prefix"),
    )
    hubs = sims.groupBy("sim_prefix").agg(F.min("url").alias("hub"))
    out = (
        sims.join(hubs, "sim_prefix")  # skew-splittable (vs window sort)
        .where(F.col("url") != F.col("hub"))
        .select(
            F.least("hub", "url").alias("url_a"),
            F.greatest("hub", "url").alias("url_b"),
        )
    )
    return out.dropDuplicates(["url_a", "url_b"]) if dedup else out
