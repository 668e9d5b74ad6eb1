"""Approximate aggregates (TDIGEST / HLL parity, SURVEY.md §2.4): tolerance
vs exact rather than oracle-hash (approx answers differ by engine)."""

from __future__ import annotations

from pyspark.sql import functions as F

from my_cudf_spark.sources import load_table
from tests.conftest import SF_DIR


def test_percentile_approx_near_exact(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    row = li.agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
    ).first()
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.01


def test_approx_count_distinct_bounds(spark):
    orders = load_table(spark, SF_DIR, "orders")
    row = orders.agg(
        F.approx_count_distinct("o_custkey").alias("approx"),
        F.count_distinct("o_custkey").alias("exact"),
    ).first()
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05


def test_sample_fraction(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    n = li.count()
    s = li.sample(fraction=0.1, seed=42).count()
    assert 0.05 * n < s < 0.15 * n
