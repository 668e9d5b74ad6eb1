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

__all__ = ["connected_components", "dedup_clusters", "resolve_entities"]


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


def resolve_entities(
    records: DataFrame,
    id_col: str = "id",
    name_col: str = "name",
    source_col: str = "source",
    max_dist: int = 1,
    max_iterations: int = 25,
) -> DataFrame:
    """Entity resolution / record linkage: cluster dirty records whose
    names agree exactly or within ``max_dist`` edits, then survivorship —
    one canonical row per entity cluster with membership accounting.
    The composition a curation pipeline runs to reconcile near-identical
    names across sources (no reference equivalent; the reference stops at
    aligned-column edit_distance, edit_distance.hpp:57).

    Returns (cluster_id, canonical_name, n_records, n_sources,
    n_variants): cluster_id is the component's min record id,
    canonical_name the min-id record's name (deterministic survivorship).

    Scale shape: exact-name groups contribute STAR edges (rep → member)
    so an n-record name group costs n−1 edges, never the n² clique;
    fuzzy edges connect only the one REP per distinct name, through
    :func:`~my_cudf_spark.operators.joins.fuzzy_join`'s pigeonhole
    blocking (hash equi-join on segment keys, never |L|×|R|); components
    run on the shuffle-bounded min-label propagation above.  NULL names
    are the caller's contract to filter — a NULL groups with nothing.
    """
    from my_cudf_spark.operators.joins import fuzzy_join

    recs = records.select(
        F.col(id_col).alias("id"),
        F.col(source_col).alias("source"),
        F.col(name_col).alias("name"),
    )
    reps = recs.groupBy("name").agg(F.min("id").alias("rep"))
    star = (
        recs.join(reps, "name")
        .filter(F.col("id") != F.col("rep"))
        .select(F.col("rep").alias("id_a"), F.col("id").alias("id_b"))
    )
    lnames = reps.select(F.col("name").alias("__na"), F.col("rep").alias("__ra"))
    rnames = reps.select(F.col("name").alias("__nb"), F.col("rep").alias("__rb"))
    fz = fuzzy_join(
        lnames.select("__na"), rnames.select("__nb"), "__na", "__nb",
        max_dist=max_dist,
    ).filter(F.col("left_value") != F.col("right_value"))
    fedges = (
        fz.join(lnames, fz["left_value"] == lnames["__na"])
        .join(rnames, fz["right_value"] == rnames["__nb"])
        .select(F.col("__ra").alias("id_a"), F.col("__rb").alias("id_b"))
    )
    labeled = dedup_clusters(
        recs, star.union(fedges), id_col="id", max_iterations=max_iterations
    )
    return (
        recs.join(labeled, "id")
        .groupBy("cluster_id")
        .agg(
            F.min_by("name", "id").alias("canonical_name"),
            F.count(F.lit(1)).alias("n_records"),
            F.countDistinct("source").alias("n_sources"),
            F.countDistinct("name").alias("n_variants"),
        )
    )
