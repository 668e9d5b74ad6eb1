"""range_join: correctness vs a theta-join oracle and bin-edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from my_cudf_spark.operators.joins import range_join


@pytest.fixture(scope="module")
def frames(spark):
    points = spark.createDataFrame(
        [(i, v) for i, v in enumerate([0, 1, 5, 7, 10, 13, 19, 20, 21, 99])],
        "pid long, p long",
    )
    intervals = spark.createDataFrame(
        [(100, 0, 5), (101, 5, 5), (102, 6, 20), (103, 18, 30), (104, 50, 60)],
        "iid long, lo long, hi long",
    )
    return points, intervals


def _expected(points, intervals, closed):
    lower = {"both": lambda p, lo: p >= lo, "left": lambda p, lo: p >= lo,
             "right": lambda p, lo: p > lo, "neither": lambda p, lo: p > lo}[closed]
    upper = {"both": lambda p, hi: p <= hi, "right": lambda p, hi: p <= hi,
             "left": lambda p, hi: p < hi, "neither": lambda p, hi: p < hi}[closed]
    return {
        (pid, iid)
        for pid, p in points
        for iid, lo, hi in intervals
        if lower(p, lo) and upper(p, hi)
    }


@pytest.mark.parametrize("closed", ["both", "left", "right", "neither"])
@pytest.mark.parametrize("bin_width", [1, 4, 7, 100])
def test_range_join_matches_bruteforce(spark, frames, closed, bin_width):
    points, intervals = frames
    got = {
        (r["pid"], r["iid"])
        for r in range_join(
            points, intervals, "p", "lo", "hi", bin_width, closed=closed
        ).collect()
    }
    p_rows = [(r["pid"], r["p"]) for r in points.collect()]
    i_rows = [(r["iid"], r["lo"], r["hi"]) for r in intervals.collect()]
    assert got == _expected(p_rows, i_rows, closed)


def test_range_join_no_duplicate_pairs(spark, frames):
    points, intervals = frames
    out = range_join(points, intervals, "p", "lo", "hi", 2).groupBy(
        "pid", "iid"
    ).count()
    assert out.filter(F.col("count") > 1).count() == 0


def test_range_join_left_keeps_unmatched_points(spark, frames):
    points, intervals = frames
    out = range_join(points, intervals, "p", "lo", "hi", 7, how="left")
    unmatched = out.filter(F.col("iid").isNull()).select("p").collect()
    assert {r["p"] for r in unmatched} == {99}
    # each unmatched point appears exactly once
    assert len(unmatched) == 1


def test_range_join_is_equi_not_bnlj(spark, frames):
    points, intervals = frames
    plan = range_join(
        points, intervals, "p", "lo", "hi", 7
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_rejects_bad_args(spark, frames):
    points, intervals = frames
    with pytest.raises(ValueError):
        range_join(points, intervals, "p", "lo", "hi", 0)
    with pytest.raises(ValueError):
        range_join(points, intervals, "p", "lo", "hi", 5, how="full")
    with pytest.raises(ValueError):
        range_join(points, intervals, "p", "lo", "hi", 5, closed="open")


def test_interval_overlap_join_planted(spark):
    """Overlap, containment, boundary-touch (inclusive), disjoint, and
    cross-key isolation — against the brute-force predicate."""
    from my_cudf_spark.operators.joins import interval_overlap_join

    left = spark.createDataFrame(
        [(1, 10, 0, 10), (1, 11, 40, 50), (2, 12, 0, 100)],
        "k long, id long, s long, e long",
    )
    right = spark.createDataFrame(
        [(1, 20, 5, 15), (1, 21, 10, 20), (1, 22, 51, 60),
         (1, 23, 45, 46), (2, 24, 99, 120), (3, 25, 0, 10)],
        "k long, id long, s long, e long",
    )
    out = interval_overlap_join(
        left, right, ["k"], "s", "e", "s", "e", bin_width=7
    )
    got = {(r["k"], r["a_id"], r["b_id"]) for r in out.collect()}
    want = set()
    for lk, lid, ls, le in [(1, 10, 0, 10), (1, 11, 40, 50), (2, 12, 0, 100)]:
        for rk, rid, rs, re_ in [(1, 20, 5, 15), (1, 21, 10, 20), (1, 22, 51, 60),
                                 (1, 23, 45, 46), (2, 24, 99, 120), (3, 25, 0, 10)]:
            if lk == rk and ls <= re_ and rs <= le:
                want.add((lk, lid, rid))
    assert got == want
    assert (1, 10, 21) in got       # boundary touch at 10 is inclusive
    assert (1, 11, 22) not in got   # 50 < 51: disjoint


def test_interval_overlap_join_duplicates_and_single_emission(spark):
    """Dedup is by anchor bin (the bin holding the later start), not by
    whole-row dropDuplicates: genuinely duplicate input rows each emit
    their pair, and a pair co-resident in many bins emits exactly once."""
    from my_cudf_spark.operators.joins import interval_overlap_join

    left = spark.createDataFrame(
        [(1, 10, 0, 100), (1, 10, 0, 100)],  # identical duplicate rows
        "k long, id long, s long, e long",
    )
    right = spark.createDataFrame(
        [(1, 20, 5, 95)], "k long, id long, s long, e long"
    )
    out = interval_overlap_join(
        left, right, ["k"], "s", "e", "s", "e", bin_width=7
    ).collect()
    # 15 shared bins each, but one pair per (left-occurrence, right) —
    # two duplicate left rows → exactly two pairs
    assert len(out) == 2
    assert all(r["a_id"] == 10 and r["b_id"] == 20 for r in out)
