"""HLL sketch rollups: error bound vs exact, merge ≡ direct sketch."""

from __future__ import annotations

from pyspark.sql import functions as F

from my_cudf_spark.operators import sketches as SK
from my_cudf_spark.sources import load_table
from tests.conftest import SF_DIR


def test_sketch_estimate_within_bound(spark):
    ev = load_table(spark, SF_DIR, "events")
    daily = SK.distinct_sketch(
        ev.withColumn("day", F.to_date("ts")), ["day"], "user_id"
    )
    est = daily.select("day", SK.estimate().alias("est"))
    exact = (
        ev.withColumn("day", F.to_date("ts"))
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("exact"))
    )
    rows = est.join(exact, "day").collect()
    assert rows
    for r in rows:
        assert abs(r["est"] - r["exact"]) <= max(3, 0.05 * r["exact"]), r


def test_merged_rollup_equals_direct_sketch(spark):
    # Union of daily sketches must give the SAME estimate as sketching the
    # month directly — the mergeability contract that makes pre-aggregated
    # rollups trustworthy.
    ev = load_table(spark, SF_DIR, "events").withColumn("day", F.to_date("ts"))
    ev = ev.withColumn("month", F.trunc("day", "month"))
    daily = SK.distinct_sketch(ev, ["month", "day"], "user_id")
    merged = SK.merge_sketches(daily, ["month"]).select(
        "month", SK.estimate().alias("est")
    )
    direct = SK.distinct_sketch(ev, ["month"], "user_id").select(
        "month", SK.estimate().alias("est")
    )
    m = {r["month"]: r["est"] for r in merged.collect()}
    d = {r["month"]: r["est"] for r in direct.collect()}
    assert m == d


def test_sketch_shuffle_carries_sketches_not_values(spark):
    # Partial aggregation: the plan must show a partial hll_sketch_agg
    # below the exchange (map-side summary), not a raw-value shuffle.
    ev = load_table(spark, SF_DIR, "events")
    plan = (
        SK.distinct_sketch(ev, ["event_type"], "user_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_hll_sketch_agg" in plan, plan
