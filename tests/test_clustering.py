"""connected_components vs a driver-side union-find on random graphs."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from my_cudf_spark.operators.clustering import connected_components, dedup_clusters


def _union_find(n_nodes, edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {x: find(x) for x in parent}


@pytest.mark.parametrize("seed,n,m", [(1, 30, 15), (2, 60, 80), (3, 40, 39)])
def test_connected_components_matches_union_find(spark, seed, n, m):
    rng = random.Random(seed)
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    expect = _union_find(n, edges)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["id"]: r["cluster_id"]
        for r in connected_components(df).collect()
    }
    assert got == expect


def test_connected_components_chain_converges(spark):
    # A single path graph — worst case for pure propagation, where pointer
    # jumping's O(log n) rounds must kick in within max_iterations.
    n = 200
    df = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "src long, dst long")
    out = connected_components(df, max_iterations=12).collect()
    assert len(out) == n
    assert {r["cluster_id"] for r in out} == {0}


def test_dedup_clusters_singletons_and_canonicals(spark):
    ids = spark.range(10).withColumnRenamed("id", "doc_id")
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], "id_a long, id_b long")
    rows = {r["doc_id"]: r for r in dedup_clusters(ids, pairs, id_col="doc_id").collect()}
    assert rows[1]["cluster_id"] == 1 and rows[3]["cluster_id"] == 1
    assert rows[8]["cluster_id"] == 7
    assert rows[5]["cluster_id"] == 5 and rows[5]["is_canonical"]
    assert not rows[3]["is_canonical"]
    canon = [r for r in rows.values() if r["is_canonical"]]
    assert {r["doc_id"] for r in canon} == {0, 1, 4, 5, 6, 7, 9}


def test_cluster_safe_split_never_straddles(spark):
    """Every near-dup cluster lands wholly in one split (the leakage-safe
    property sample_cluster_safe_split exists for)."""
    from my_cudf_spark.queries import load_registry
    from tests.conftest import SF_DIR

    out = load_registry()["sample_cluster_safe_split"].fn(spark, SF_DIR)
    straddlers = (
        out.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert straddlers == 0


def test_resolve_entities_planted(spark):
    """Chain cluster across sources ('acme' ~ 'acmex' ~ 'acmexy' links via
    the rep chain), exact-name group collapses without fuzzy help, and an
    unrelated name stays a singleton entity."""
    from my_cudf_spark.operators.clustering import resolve_entities

    recs = spark.createDataFrame(
        [
            (1, "a", "acme"),
            (2, "b", "acme"),      # exact duplicate, other source
            (3, "b", "acmex"),     # 1 edit from acme
            (4, "a", "acmexy"),    # 1 edit from acmex (2 from acme: chain)
            (5, "a", "zzz corp"),  # singleton
            (6, "a", "zzz corp"),  # exact-name partner of 5
        ],
        "rid long, source string, name string",
    )
    out = {
        r["cluster_id"]: r
        for r in resolve_entities(
            recs, id_col="rid", name_col="name", source_col="source"
        ).collect()
    }
    assert set(out) == {1, 5}
    acme = out[1]
    assert acme["canonical_name"] == "acme"
    assert acme["n_records"] == 4
    assert acme["n_sources"] == 2
    assert acme["n_variants"] == 3
    zzz = out[5]
    assert (zzz["n_records"], zzz["n_sources"], zzz["n_variants"]) == (2, 1, 1)


def test_pagerank_mass_and_determinism(spark):
    """Integer micro-unit PageRank: total mass stays within the flooring
    loss bound of 1e12 (each floor division loses < 1 unit per term),
    ranks are positive, and repartitioning moves nothing (integer sums
    commute)."""
    from my_cudf_spark.queries import load_registry
    from tests.conftest import SF_DIR

    fn = load_registry()["graph_pagerank"].fn
    rows = fn(spark, SF_DIR).collect()
    total = sum(r["rank_micro"] for r in rows)
    n = len(rows)
    assert all(r["rank_micro"] > 0 for r in rows)
    # per iteration: n base-term floors + one floor per (edge + vertex)
    # damping term; three iterations over this graph lose well under
    # 0.1% of the unit mass
    assert 0.999 * 1e12 * 0.98 < total <= 1e12
