"""UDF surface tests: elementwise/arrow variants not covered by oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from my_cudf_spark.operators import udf as U
from my_cudf_spark.sources import load_table
from tests.conftest import SF_DIR


def test_apply_elementwise(spark):
    nation = load_table(spark, SF_DIR, "nation")

    def shout(s):
        return s.str.upper() + "!"

    up = U.apply_elementwise(shout, "string")
    rows = nation.select("n_name", up(F.col("n_name")).alias("u")).collect()
    assert all(r["u"] == r["n_name"].upper() + "!" for r in rows)


def test_apply_arrow_batches(spark):
    import pyarrow as pa

    region = load_table(spark, SF_DIR, "region")

    def double_key(rb: "pa.RecordBatch") -> "pa.RecordBatch":
        import pyarrow.compute as pc

        # cast to the declared output type: Arrow keeps the input width,
        # but the schema below promises int64
        col = rb.column(0).cast(pa.int64())
        return pa.RecordBatch.from_arrays(
            [pc.multiply(col, pa.scalar(2, pa.int64()))], names=["doubled"]
        )

    out = U.apply_arrow_batches(
        region.select("r_regionkey"), double_key, schema="doubled long"
    )
    got = sorted(r["doubled"] for r in out.collect())
    want = sorted(r["r_regionkey"] * 2 for r in region.collect())
    assert got == want


def test_grouped_agg_udf_over_window(spark):
    orders = load_table(spark, SF_DIR, "orders")

    def mean_udf(s):
        return float(s.mean())

    m = U.grouped_agg_udf(mean_udf, "double")
    out = (
        orders.groupBy("o_orderstatus")
        .agg(F.round(m("o_totalprice"), 4).alias("m"))
        .collect()
    )
    want = {
        r["o_orderstatus"]: round(r["m"], 4)
        for r in orders.groupBy("o_orderstatus")
        .agg(F.avg("o_totalprice").alias("m"))
        .collect()
    }
    assert {r["o_orderstatus"]: r["m"] for r in out} == want
