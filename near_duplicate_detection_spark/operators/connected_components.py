"""Iterative DataFrame connected components (min-label + pointer jumping).

Generalizes the reference's per-(videoid, shot) dedup grouping
(ndd/server_ndd.py:127-141: keep-first per key over sorted hits) to full
transitive closure over verified duplicate pairs — the step that turns pair
evidence into cluster assignments.

Algorithm: min-label propagation WITH pointer jumping. Every node starts
labeled with itself (labels are urls; string min is total and deterministic).
Each round a node takes the min over

    {its label} ∪ {neighbors' labels} ∪ {its label's label}   (pointer jump)

The jump term treats the label as a parent pointer and halves chain depth
each round, so convergence is O(log diameter) rounds — same asymptotic bound
as alternating large-star/small-star but with one fewer shuffle per round
(no re-materialized edge set, the edge set is static here). Web duplicate
clusters are shallow stars/triangles; chains only arise through transitive
substring links, and the jump term bounds those too.

Each round is ONE job and ONE join: the self/jump terms ride the edge join
as map-side message edges (see connected_components), so a round is
join + groupBy(min), materialized with ``localCheckpoint`` to truncate plan
lineage. Convergence is folded into the round's output as a ``changed``
column — detecting the fixpoint is a cheap scan of the freshly checkpointed
partitions, not a separate old⋈new join (the round-trip that made this
stage anti-scale 8→32 cores in round 1).

At 100 TB the edge set is a tiny fraction of the corpus (only candidate pairs
that verified), so per-round shuffle cost is proportional to duplicate
volume, not corpus volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, max_iter: int = 25) -> DataFrame:
    """edges(url_a, url_b) → labels(url, label) for every node in the edge set.

    label = lexicographic-min url reachable from the node (cluster rep).

    Each round computes, for every node u,

        new(u) = min( old(u), min_{v∈N(u)} old(v), old(old(u)) )

    as ONE join + ONE aggregation: the static ``sym`` edge set is unioned
    with two per-round message edges derived map-side from the labels —
    a self edge (u, u) carrying old(u) and a jump edge (u, old(u)) whose
    lookup resolves to old(old(u)) — and the whole union is joined against
    labels once (on dst) then min-aggregated by src. The round-5 shape
    spelled the same recurrence as three joins (neighbor-min groupBy + two
    left joins for self/jump), which cost two extra broadcast builds per
    round locally and two extra shuffles per round at scale; r6 A/B
    measured the fused round at ~½ the wall. The self edge is tagged so the
    aggregate also yields old(u), making the ``changed`` fixpoint column a
    map-side comparison — no old⋈new join, same trick as round 2.
    """
    sym = edges.select(
        F.col("url_a").alias("src"), F.col("url_b").alias("dst")
    ).union(
        edges.select(F.col("url_b").alias("src"), F.col("url_a").alias("dst"))
    )
    sym = sym.withColumn("is_self", F.lit(False)).localCheckpoint()

    # seed labels with min(self, direct neighbors): the same one-shuffle
    # cost as the distinct() this replaces, and it is exactly what round 1
    # of the loop would compute from identity labels — one fewer iteration
    # for free (r6; the invariant "label is a reachable url ≤ self" holds)
    labels = (
        sym.groupBy("src")
        .agg(F.min("dst").alias("_nbr"))
        .select(
            F.col("src").alias("url"),
            F.least(F.col("src"), F.col("_nbr")).alias("label"),
        )
        .localCheckpoint()
    )

    for _ in range(max_iter):
        self_edges = labels.select(
            F.col("url").alias("src"),
            F.col("url").alias("dst"),
            F.lit(True).alias("is_self"),
        )
        jump_edges = labels.select(
            F.col("url").alias("src"),
            F.col("label").alias("dst"),
            F.lit(False).alias("is_self"),
        )
        msgs = sym.unionByName(self_edges).unionByName(jump_edges)
        new_labels = (
            msgs.join(labels, msgs.dst == labels.url)
            .groupBy("src")
            .agg(
                F.min("label").alias("label"),
                # exactly one self edge per src ⇒ this IS old(u)
                F.min(F.when(F.col("is_self"), F.col("label"))).alias("old"),
            )
            .select(
                F.col("src").alias("url"),
                "label",
                (F.col("label") != F.col("old")).alias("changed"),
            )
            .localCheckpoint()
        )
        # fixpoint test over the partitions the checkpoint just materialized —
        # no extra join, near-zero cost
        changed = new_labels.where("changed").limit(1).count()
        labels = new_labels.drop("changed")
        if changed == 0:
            break
    return labels


def clusters_table(labels: DataFrame, all_urls: DataFrame) -> DataFrame:
    """→ clusters(url, cluster_id, is_representative) covering EVERY url.

    Docs with no duplicate edge form singleton clusters of themselves.
    cluster_id IS the representative url (min url of the component — SURVEY
    A5 analog: min_by(url, url); the reference picks the nearest canonical
    class, ndd/extract_aspect_ratio.py:46-47). A string id costs a few bytes
    over a hashed long but cannot collide: a 64-bit hash id at the target
    10^12-doc scale (~10^11 clusters) would see birthday collisions from
    ~2^32 ids on, silently merging unrelated clusters.
    """
    return (
        all_urls.select("url")
        .join(labels, "url", "left")
        .select(
            "url",
            F.coalesce("label", F.col("url")).alias("cluster_id"),
        )
        .withColumn("is_representative", F.col("url") == F.col("cluster_id"))
    )
