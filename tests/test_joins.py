"""asof_join row semantics: all payload columns of an output row must come
from the SINGLE matched right row — a NULL payload cell in the matched row
stays NULL, never back-filled from an older right row (ASOF JOIN semantics;
regression for the per-column last(ignorenulls) carry)."""

from __future__ import annotations

from my_cudf_spark.operators.joins import asof_join


def test_asof_null_payload_not_backfilled(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 30)], "k int, t int"
    )
    right = spark.createDataFrame(
        [(1, 5, 100.0, "a"), (1, 15, None, "b"), (1, 25, 300.0, None)],
        "k int, t int, price double, tag string",
    )
    out = {
        r["t"]: (r["price"], r["tag"])
        for r in asof_join(left, right, on="t", by=["k"]).collect()
    }
    assert out[10] == (100.0, "a")
    # matched right row (t=15) has NULL price — must NOT inherit 100.0
    assert out[20] == (None, "b")
    # matched right row (t=25) has NULL tag — must NOT inherit "b"
    assert out[30] == (300.0, None)


def test_asof_no_match_is_all_null(spark):
    left = spark.createDataFrame([(1, 1)], "k int, t int")
    right = spark.createDataFrame([(1, 5, 9.0)], "k int, t int, v double")
    [row] = asof_join(left, right, on="t", by=["k"]).collect()
    assert row["v"] is None


def test_asof_forward_direction(spark):
    left = spark.createDataFrame([(1, 10), (1, 26)], "k int, t int")
    right = spark.createDataFrame(
        [(1, 15, 1.5), (1, 25, 2.5)], "k int, t int, v double"
    )
    out = {
        r["t"]: r["v"]
        for r in asof_join(left, right, on="t", by=["k"], direction="forward").collect()
    }
    assert out[10] == 1.5  # next right row at t=15
    assert out[26] is None  # nothing after 26
