"""global_cumsum / pack_sequences: the two-phase distributed prefix sum
must equal the single-window reference on any partitioning, and pack
assignment must respect boundaries."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from my_cudf_spark.operators.packing import global_cumsum, pack_sequences


def test_global_cumsum_matches_single_window(spark):
    rows = [(i, (i * 37) % 11 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(13)
    got = {
        r["k"]: r["cs"]
        for r in global_cumsum(df, "k", "v", "cs", num_partitions=7).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["k"]: r["cs"]
        for r in df.withColumn("cs", F.coalesce(F.sum("v").over(w), F.lit(0))).collect()
    }
    assert got == want


def test_pack_sequences_boundaries(spark):
    # budget 10; docs of 4 tokens each: doc 2 (offset 8) straddles 8..11
    df = spark.createDataFrame([(i, 4) for i in range(1, 6)], "doc long, n long")
    out = {r["doc"]: r for r in pack_sequences(df, "doc", "n", 10).collect()}
    assert [out[d]["start_offset"] for d in range(1, 6)] == [0, 4, 8, 12, 16]
    assert [out[d]["pack_id"] for d in range(1, 6)] == [0, 0, 0, 1, 1]
    assert out[3]["straddle"] and out[3]["end_pack_id"] == 1
    assert not out[1]["straddle"] and not out[4]["straddle"]


def test_pack_sequences_doc_longer_than_budget(spark):
    df = spark.createDataFrame([(1, 25), (2, 3)], "doc long, n long")
    out = {r["doc"]: r for r in pack_sequences(df, "doc", "n", 10).collect()}
    assert out[1]["pack_id"] == 0 and out[1]["end_pack_id"] == 2
    assert out[2]["start_offset"] == 25 and out[2]["pack_id"] == 2


def _reference_cumsum(spark, df, order_cols, v="v"):
    w = Window.orderBy(*order_cols).rowsBetween(Window.unboundedPreceding, -1)
    return {
        tuple(r[c] for c in df.columns if c not in ("cs",)): r["cs"]
        for r in df.withColumn("cs", F.coalesce(F.sum(v).over(w), F.lit(0))).collect()
    }


def test_global_cumsum_negative_float_keys(spark):
    # deterministic-bucket path with a signed float key (min/max binning
    # must handle negative spans)
    rows = [(float(i - 250) * 1.7, (i * 13) % 7 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "k double, v long").repartition(9)
    got = {r["k"]: r["cs"] for r in global_cumsum(df, "k", "v", "cs", num_partitions=8).collect()}
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    want = {r["k"]: r["cs"] for r in df.withColumn("cs", F.coalesce(F.sum("v").over(w), F.lit(0))).collect()}
    assert got == want


def test_global_cumsum_all_equal_key_single_bucket(spark):
    # span == 0 → every row lands in bucket 0; needs a tiebreak column for
    # a total order, carried as the second order key
    rows = [(7, i, 2) for i in range(100)]
    df = spark.createDataFrame(rows, "k long, t long, v long").repartition(5)
    out = global_cumsum(df, ["k", "t"], "v", "cs", num_partitions=8).collect()
    got = {r["t"]: r["cs"] for r in out}
    assert got == {i: 2 * i for i in range(100)}


def test_global_cumsum_string_key_fallback_path(spark):
    # non-binnable leading key → checkpoint-pinned range path; result must
    # still match the single-window reference
    rows = [(f"k{i:04d}", (i * 31) % 5 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "k string, v long").repartition(7)
    got = {r["k"]: r["cs"] for r in global_cumsum(df, "k", "v", "cs", num_partitions=6).collect()}
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    want = {r["k"]: r["cs"] for r in df.withColumn("cs", F.coalesce(F.sum("v").over(w), F.lit(0))).collect()}
    assert got == want


def test_global_cumsum_skewed_keys_still_exact(spark):
    # 90% of rows share one key value (plus a tiebreak) — uniform binning
    # puts them all in one bucket; that is a performance property only,
    # correctness must hold
    rows = [(0 if i % 10 else i, i, 1) for i in range(400)]
    df = spark.createDataFrame(rows, "k long, t long, v long").repartition(11)
    out = global_cumsum(df, ["k", "t"], "v", "cs", num_partitions=8).collect()
    ordered = sorted(((r["k"], r["t"]), r["cs"]) for r in out)
    expect = {kt: i for i, (kt, _) in enumerate(sorted(((r["k"], r["t"]), 0) for r in out))}
    assert all(cs == expect[kt] for kt, cs in ordered)


def test_pack_bestfit_invariants_and_waste(spark):
    """Every pack respects the budget; every pack except possibly the
    last per (class, shard) is full (k docs); total padding beats the
    one-doc-per-pack strawman by construction and the pack count is
    within the class/shard tail of the token lower bound."""
    import math

    from my_cudf_spark.operators.packing import pack_bestfit
    from my_cudf_spark.sources import load_table
    from tests.conftest import SF_DIR

    budget, shards = 512, 4
    docs = load_table(spark, SF_DIR, "documents").filter(F.col("text").isNotNull())
    t = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), " ")).cast("long").alias("n"),
    )
    out = pack_bestfit(t, "doc_id", "n", budget, shards=shards).cache()
    rows = out.collect()
    assert len(rows) == t.filter(F.col("n") > 0).count()

    packs = {}
    for r in rows:
        key = (r["size_class"], r["shard"], r["pack_idx"])
        packs.setdefault(key, []).append(r["n"])
    # budget respected for every non-oversize pack; oversize solo
    for (cls, _, _), ns in packs.items():
        if cls == 0:
            assert len(ns) == 1
        else:
            assert sum(ns) <= budget
            assert len(ns) <= cls
    # per (class, shard): every pack except the highest pack_idx is full
    by_cs = {}
    for (cls, sh, idx), ns in packs.items():
        by_cs.setdefault((cls, sh), []).append((idx, len(ns)))
    for (cls, _), lst in by_cs.items():
        if cls == 0:
            continue
        last = max(i for i, _ in lst)
        assert all(cnt == cls for i, cnt in lst if i != last)
    # waste: pack count within the per-(class,shard) tail of the token
    # lower bound, and far below the one-doc-per-pack strawman
    total_tokens = sum(r["n"] for r in rows if r["size_class"] > 0)
    n_packs = len([k for k in packs if k[0] > 0])
    lower = math.ceil(total_tokens / budget)
    tails = len([1 for (cls, _) in by_cs if cls > 0])
    assert n_packs <= 2 * lower + tails
    assert n_packs < len(rows) / 3


def test_pack_bestfit_rejects_non_integral_id(spark):
    """The shard arithmetic is pmod on the id: a string id must raise a
    TypeError up front (the stream_funnel precedent), not surface as an
    opaque pmod analysis error deep in the plan."""
    import pytest

    from my_cudf_spark.operators.packing import pack_bestfit

    df = spark.createDataFrame(
        [("a", 10), ("b", 20)], "doc_id string, n long"
    )
    with pytest.raises(TypeError, match="integral"):
        pack_bestfit(df, "doc_id", "n", 128, shards=2)
