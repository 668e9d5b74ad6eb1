"""Deterministic sampling: reproducibility, split exhaustiveness, quotas."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from my_cudf_spark.operators.sampling import (
    assign_splits,
    hash_sample,
    stratified_sample,
)


@pytest.fixture(scope="module")
def rows(spark):
    return spark.range(2000).withColumn("g", (F.col("id") % 7).cast("int"))


def test_hash_sample_fraction_and_determinism(rows):
    got = hash_sample(rows, ["id"], 0.25)
    n = got.count()
    assert abs(n / 2000 - 0.25) < 0.05  # binomial 3-sigma ≈ 0.029
    # invariant under repartitioning — the property df.sample lacks
    again = hash_sample(rows.repartition(13), ["id"], 0.25)
    assert {r["id"] for r in got.collect()} == {r["id"] for r in again.collect()}
    # nested: a smaller fraction is a subset of a larger one
    small = {r["id"] for r in hash_sample(rows, ["id"], 0.1).collect()}
    assert small <= {r["id"] for r in got.collect()} or len(small - {r["id"] for r in got.collect()}) == 0


def test_hash_sample_salt_changes_membership(rows):
    a = {r["id"] for r in hash_sample(rows, ["id"], 0.5).collect()}
    b = {r["id"] for r in hash_sample(rows, ["id"], 0.5, salt="v2").collect()}
    assert a != b


def test_assign_splits_disjoint_exhaustive(rows):
    out = assign_splits(rows, ["id"], {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert sum(counts.values()) == 2000
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # deterministic across repartition
    again = assign_splits(
        rows.repartition(17), ["id"], {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    assert (
        out.join(again.withColumnRenamed("split", "split2"), "id")
        .filter(F.col("split") != F.col("split2"))
        .count()
        == 0
    )


def test_assign_splits_validates_weights(rows):
    with pytest.raises(ValueError):
        assign_splits(rows, ["id"], {"a": 0.5, "b": 0.4})


def test_stratified_sample_quota(rows):
    out = stratified_sample(rows, ["g"], ["id"], 5)
    counts = out.groupBy("g").count().collect()
    assert all(r["count"] == 5 for r in counts) and len(counts) == 7
    # small stratum: takes all rows, not more
    tiny = rows.filter(F.col("id") < 3)
    assert stratified_sample(tiny, ["g"], ["id"], 5).count() == 3
    with pytest.raises(ValueError):
        stratified_sample(rows, ["g"], ["id"], 0)


def test_mixture_sample_shares_and_determinism(spark):
    from my_cudf_spark.operators.sampling import mixture_sample

    df = spark.range(6000).select(
        F.col("id"),
        F.concat(F.lit("d"), (F.col("id") % 3).cast("string")).alias("dom"),
    )
    # 2000 rows per domain; targets 0.6/0.3/0.1 → c = min(2000/0.6, ...) and
    # d0 binds: p0 = 1.0, p1 = 0.5, p2 = 1/6.
    kept = mixture_sample(df, "dom", ["id"], {"d0": 0.6, "d1": 0.3, "d2": 0.1})
    counts = {r["dom"]: r["n"] for r in
              kept.groupBy("dom").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["d0"] == 2000  # binding domain kept whole (p=1 path)
    assert abs(counts["d1"] / 2000 - 0.5) < 0.04
    assert abs(counts["d2"] / 2000 - 1 / 6) < 0.04
    # membership is partitioning-invariant
    again = mixture_sample(
        df.repartition(17), "dom", ["id"], {"d0": 0.6, "d1": 0.3, "d2": 0.1}
    )
    assert {r["id"] for r in kept.collect()} == {r["id"] for r in again.collect()}
    # unweighted domains are dropped entirely
    partial = mixture_sample(df, "dom", ["id"], {"d0": 1.0, "d1": 1.0})
    assert partial.filter(F.col("dom") == "d2").count() == 0


def test_mixture_sample_validates_weights(spark):
    from my_cudf_spark.operators.sampling import mixture_sample

    df = spark.range(10).withColumn("dom", F.lit("a"))
    with pytest.raises(ValueError, match="non-empty"):
        mixture_sample(df, "dom", ["id"], {})
    with pytest.raises(ValueError, match="positive"):
        mixture_sample(df, "dom", ["id"], {"a": -1.0})


def test_epoch_shuffle_is_permutation_and_epoch_dependent(spark):
    from my_cudf_spark.operators.sampling import epoch_shuffle

    df = spark.createDataFrame([(i,) for i in range(300)], "id long").repartition(7)
    p1 = {r["id"]: r["pos"] for r in epoch_shuffle(df, ["id"], epoch=1).collect()}
    # exact permutation of 0..n-1
    assert sorted(p1.values()) == list(range(300))
    # repartitioning must not change the permutation (content-keyed)
    p1b = {r["id"]: r["pos"] for r in epoch_shuffle(df.repartition(3), ["id"], epoch=1).collect()}
    assert p1 == p1b
    # a different epoch yields a different permutation
    p2 = {r["id"]: r["pos"] for r in epoch_shuffle(df, ["id"], epoch=2).collect()}
    assert sorted(p2.values()) == list(range(300))
    assert p1 != p2


def test_incremental_dedup_semantics(spark):
    from pyspark.sql import functions as F
    from my_cudf_spark.operators.dedup import incremental_dedup

    corpus = spark.createDataFrame([(1, "aaa"), (2, "bbb")], "id long, t string")
    new = spark.createDataFrame(
        [(10, "aaa"), (11, "ccc"), (12, "ccc"), (13, "ddd")], "id long, t string"
    )
    got = sorted(
        r["id"]
        for r in incremental_dedup(new, corpus, "id", F.col("t"), F.col("t")).collect()
    )
    # 10 dropped (in corpus), 11 kept (first ccc), 12 dropped (batch dup),
    # 13 kept (novel)
    assert got == [11, 13]


def test_weighted_sample_biases_by_weight(spark):
    """A-ES sanity: with weights 10 vs 1 (500 rows each), the k=100 sample
    must be dominated by heavy rows (deterministic given the fixture)."""
    from my_cudf_spark.operators.sampling import weighted_sample

    rows = [(i, 10.0 if i < 500 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "id int, w double")
    got = weighted_sample(df, ["id"], "w", k=100).collect()
    assert len(got) == 100
    heavy = sum(1 for r in got if r["id"] < 500)
    # E[heavy] ≈ 91 under weight-proportional inclusion; uniform would be 50
    assert heavy > 75, heavy
    # keys must be attached, positive, and the max key bounds the sample
    assert all(r["sample_key"] > 0 for r in got)


def test_weighted_sample_drops_nonpositive_weights(spark):
    from my_cudf_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None)], "id int, w double"
    )
    got = weighted_sample(df, ["id"], "w", k=10).collect()
    assert [r["id"] for r in got] == [1]


def test_grouped_topn_matches_single_window(spark):
    """Two-phase grouped top-n is identical to the naive one-window form."""
    from pyspark.sql import Window

    from my_cudf_spark.operators.sampling import grouped_topn
    from my_cudf_spark.sources import load_table
    from tests.conftest import SF_DIR

    df = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    ).repartition(16)
    got = grouped_topn(
        df, ["o_orderpriority"], [F.col("o_totalprice").desc(), "o_orderkey"], n=7
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    want = (
        df.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 7)
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


# ---------------------------------------------------------------------------
# negative_samples (consistent-hash negative sampling)
# ---------------------------------------------------------------------------


def test_negative_samples_deterministic_across_partitionings(spark):
    from my_cudf_spark.operators.sampling import negative_samples

    corpus = spark.range(0, 200).withColumnRenamed("id", "doc")
    anchors = spark.range(0, 20).withColumnRenamed("id", "doc")
    a = negative_samples(anchors, corpus, "doc", "doc", k=3, bucket_chars=1)
    b = negative_samples(
        anchors.repartition(7), corpus.repartition(13), "doc", "doc", k=3,
        bucket_chars=1,
    )
    ra, rb = sorted(map(tuple, a.collect())), sorted(map(tuple, b.collect()))
    assert ra == rb
    assert len(ra) == 20 * 3  # padding absorbed every discard


def test_negative_samples_contract(spark):
    """No self-draws, no excluded pairs, no repeats, ranks contiguous."""
    from pyspark.sql import functions as F  # noqa: F811

    from my_cudf_spark.operators.sampling import negative_samples

    corpus = spark.range(0, 100).withColumnRenamed("id", "doc")
    anchors = spark.range(0, 30).withColumnRenamed("id", "doc")
    # Exclude every even candidate for every anchor.
    excl = (
        anchors.select(F.col("doc").alias("a"))
        .crossJoin(corpus.select(F.col("doc").alias("e")))
        .filter(F.col("e") % 2 == 0)
    )
    out = negative_samples(
        anchors, corpus, "doc", "doc", k=3, exclusions=excl, pad=8,
        bucket_chars=1,
    ).collect()
    per_anchor: dict[int, list] = {}
    for r in out:
        assert r["neg_doc"] != r["doc"]
        assert r["neg_doc"] % 2 == 1  # exclusions honored
        per_anchor.setdefault(r["doc"], []).append(r)
    for rows in per_anchor.values():
        negs = [r["neg_doc"] for r in rows]
        assert len(set(negs)) == len(negs)  # dedup
        assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == list(
            range(1, len(rows) + 1)
        )


def test_negative_samples_distribution_roughly_uniform(spark):
    """Consistent hashing draws ~uniformly over the corpus (no hot ids)."""
    from my_cudf_spark.operators.sampling import negative_samples

    corpus = spark.range(0, 50).withColumnRenamed("id", "doc")
    anchors = spark.range(1000, 1400).withColumnRenamed("id", "doc")
    out = negative_samples(anchors, corpus, "doc", "doc", k=5, bucket_chars=1)
    counts = [r["n"] for r in out.groupBy("neg_doc").count().withColumnRenamed("count", "n").collect()]
    # 2000 draws over 50 ids → mean 40; no id should dominate wildly.
    assert max(counts) < 40 * 6


def test_token_budget_mixture_waterfill_invariants(spark):
    """Greedy fill exactness: sum(alloc) == min(budget, sum(caps)); every
    source's alloc <= its 2-epoch cap; epochs <= 2; better-quality
    sources fill before worse ones (the partially-filled boundary source
    is unique); realized tokens land within the fractional-replication
    band around alloc."""
    import math

    from my_cudf_spark.functions import text as T
    from my_cudf_spark.operators.sampling import token_budget_mixture
    from my_cudf_spark.sources import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").filter(F.col("text").isNotNull())
    d = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.trim(F.col("text")), " ")).cast("long").alias("n_tokens"),
        T.quality_score("text").alias("q"),
    )
    alloc, rep = token_budget_mixture(
        d, "doc_id", "source", "n_tokens", "q", budget_frac=0.4, max_epochs=2.0
    )
    rows = alloc.collect()
    total = sum(r["total_tokens"] for r in rows)
    budget = math.floor(0.4 * total)
    caps = {r["source"]: math.floor(2.0 * r["total_tokens"]) for r in rows}
    assert sum(r["alloc_tokens"] for r in rows) == min(budget, sum(caps.values()))
    partial = []
    for r in rows:
        assert 0 <= r["alloc_tokens"] <= caps[r["source"]]
        assert r["epochs"] <= 2.0 + 1e-12
        if 0 < r["alloc_tokens"] < caps[r["source"]]:
            partial.append(r)
    assert len(partial) <= 1
    # ranking: every source with a FULL cap allocation has mean_q >= every
    # source with zero allocation (ties broken by name inside the window)
    full_q = [r["mean_q"] for r in rows if r["alloc_tokens"] == caps[r["source"]]]
    zero_q = [r["mean_q"] for r in rows if r["alloc_tokens"] == 0]
    if full_q and zero_q:
        assert min(full_q) >= max(zero_q)
    realized = {
        r["source"]: r
        for r in rep.groupBy("source")
        .agg(F.sum("n_tokens").alias("rt"), F.count(F.lit(1)).alias("rd"))
        .collect()
    }
    for r in rows:
        e = r["epochs"]
        rt = realized[r["source"]]["rt"] if r["source"] in realized else 0
        # floor(e) copies are exact; the +1 coin flips per doc, so realized
        # tokens sit between floor(e)x and ceil(e)x the source's tokens
        assert math.floor(e) * r["total_tokens"] <= rt <= math.ceil(e) * r["total_tokens"]
