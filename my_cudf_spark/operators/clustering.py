"""Graph clustering for dedup canonicalization.

Near-dup detection (operators/dedup.py) emits PAIRS; a training-data
pipeline needs CLUSTERS — one canonical document per group of mutual
near-duplicates — which is connected components over the pair graph.
The reference stops at pair primitives (nvtext/jaccard.hpp:73,
minhash.hpp:72-213); this is the standard next step every dedup pipeline
bolts on top (e.g. the SlimPajama / RefinedWeb recipes).

``connected_components`` is iterative min-label propagation with pointer
jumping (path compression), the shuffle-bounded shape that scales:

- each iteration is two hash-partitioned shuffles (one join to gather
  neighbor labels, one groupBy to take the min) — no collect, no
  driver-side graph;
- pointer jumping (relabel through the current label mapping) gives the
  O(log n) round bound of Hash-to-Min-style algorithms instead of
  O(diameter) pure propagation — near-dup graphs are clique-ish so both
  are tiny, but chains (e.g. drifting boilerplate) stay cheap too;
- ``localCheckpoint`` truncates lineage every round, keeping plan size
  constant across iterations (the classic iterative-Spark failure mode is
  an exponentially growing plan).

Convergence is detected with a scalar aggregation per round (count of
changed labels) — an O(1)-result action, not a data collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "dedup_clusters"]


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
) -> DataFrame:
    """(id, cluster_id) for every vertex in ``edges``; cluster_id is the
    minimum vertex id of the connected component.

    Vertices are whatever appears in ``edges``; callers wanting singleton
    rows for isolated vertices should union them in afterwards (see
    ``dedup_clusters``).
    """
    # Undirected: propagate both ways.
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    bidir = e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    # Pre-shuffle once on the join key and reuse that layout every round.
    bidir = bidir.repartition("s").localCheckpoint(eager=True)

    labels = (
        bidir.select(F.col("s").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iterations):
        # Gather: min label over self and neighbors.
        nbr = (
            bidir.join(labels, bidir["s"] == labels["id"])
            .select(F.col("d").alias("id"), "label")
        )
        gathered = (
            labels.union(nbr).groupBy("id").agg(F.min("label").alias("label"))
        )
        # Pointer jumping: relabel through the mapping (label := label(label)).
        mapping = gathered.select(
            F.col("id").alias("m_id"), F.col("label").alias("m_label")
        )
        jumped = (
            gathered.join(mapping, gathered["label"] == mapping["m_id"], "left")
            .select("id", F.coalesce("m_label", "label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = jumped
        if changed == 0:
            break

    return labels.select("id", F.col("label").alias("cluster_id"))


def dedup_clusters(
    all_ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Canonical cluster assignment for every row of ``all_ids``: documents
    connected through near-dup ``pairs`` share the component's min id as
    ``cluster_id``; untouched documents are singleton clusters of
    themselves.  ``is_canonical`` marks the one row per cluster a dedup
    pipeline keeps."""
    comp = connected_components(
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")),
        max_iterations=max_iterations,
    )
    ids = all_ids.select(F.col(id_col).alias("id"))
    return (
        ids.join(comp, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("cluster_id", F.col("id")).alias("cluster_id"),
        )
        .withColumn("is_canonical", (F.col(id_col) == F.col("cluster_id")))
    )
