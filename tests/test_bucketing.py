"""Bucketed co-located joins (SURVEY.md §7.0 scale posture): writing both
sides bucketed by the join key lets Spark plan a SortMergeJoin with ZERO
Exchange operators — the 100 TB recipe for repeated fact-to-fact joins
that AQE/broadcast can't cover (both sides large).

The reference has hash_partition (partitioning.hpp:106) but no persistent
bucketing; Spark's bucketed tables are the durable version of the same
idea: partition once at write time, join forever without shuffling.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from my_cudf_spark.sources import load_table
from tests.conftest import SF_DIR


@pytest.fixture()
def warehouse(spark):
    # warehouse dir is a static conf — managed tables land in the default
    # ./spark-warehouse (gitignored); DROP TABLE removes the files
    yield spark
    for t in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_is_shuffle_free(warehouse):
    spark = warehouse
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_b")
    )
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
    )
    # disable broadcast so the join strategy decision is bucket-driven
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("lineitem_b").join(
            spark.table("orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert "Exchange" not in plan, plan  # co-located: no shuffle at all
        # correctness: same count as the plain join
        plain = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        assert joined.count() == plain.count()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
