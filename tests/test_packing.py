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
