"""Iterative DataFrame connected components (min-label propagation).

Generalizes the reference's per-(videoid, shot) dedup grouping
(ndd/server_ndd.py:127-141: keep-first per key over sorted hits) to full
transitive closure over verified duplicate pairs — the step that turns pair
evidence into cluster assignments.

Algorithm: min-label propagation. Every node starts labeled with itself
(labels are urls; string min is total and deterministic). Each round, a node
takes the min of its label and its neighbors' labels — one hash join
edges⋈labels plus one groupBy(min). Converges in O(diameter) rounds; web
duplicate clusters are shallow (dozens at most), and each round is
``localCheckpoint``-ed to truncate the growing plan lineage (Spark has no
fixpoint operator — the loop is driver-driven, the data never leaves
executors).

At 100 TB the edge set is a tiny fraction of the corpus (only candidate pairs
that verified), so per-round shuffle cost is proportional to duplicate
volume, not corpus volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, max_iter: int = 25
) -> DataFrame:
    """edges(url_a, url_b) → labels(url, label) for every node in the edge set.

    label = lexicographic-min url reachable from the node (cluster rep).
    """
    sym = edges.select(
        F.col("url_a").alias("src"), F.col("url_b").alias("dst")
    ).union(
        edges.select(F.col("url_b").alias("src"), F.col("url_a").alias("dst"))
    )
    sym = sym.repartition("src").localCheckpoint()

    labels = (
        sym.select(F.col("src").alias("url"))
        .distinct()
        .withColumn("label", F.col("url"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.url)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.url == neighbor_min.src, "left")
            .select(
                "url",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "url")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def clusters_table(labels: DataFrame, all_urls: DataFrame) -> DataFrame:
    """→ clusters(url, cluster_id, is_representative) covering EVERY url.

    Docs with no duplicate edge form singleton clusters of themselves.
    cluster_id is a stable 64-bit hash of the representative url;
    representative = min url of the component (SURVEY A5 analog:
    min_by(url, url) — the reference picks the nearest canonical class,
    ndd/extract_aspect_ratio.py:46-47).
    """
    return (
        all_urls.select("url")
        .join(labels, "url", "left")
        .select(
            "url",
            F.coalesce("label", F.col("url")).alias("label"),
        )
        .select(
            "url",
            F.xxhash64("label").alias("cluster_id"),
            (F.col("url") == F.col("label")).alias("is_representative"),
        )
    )
