"""UDF-surface queries (SURVEY.md §2.11): the apply family executed
through Arrow-batched Python, oracle-checked against the same math in SQL.

These intentionally compute things SQL can also express — the point is to
certify the UDF *plumbing* (Arrow round-trip, grouping, schema contract)
exactly, not to do non-SQL math; rounding to 6 decimals absorbs the
pandas-vs-SQL float summation order.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from my_cudf_spark.operators import udf as U
from my_cudf_spark.queries import register
from my_cudf_spark.sources import load_table


@register(
    "udf_grouped_zscore",
    sql="""
    SELECT c_custkey,
           ROUND((c_acctbal - AVG(c_acctbal) OVER w) / STDDEV_SAMP(c_acctbal) OVER w, 6) AS z
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment)
    ORDER BY c_custkey
    """,
)
def udf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GroupBy.apply parity (groupby.py:1858): per-segment z-score where
    the whole group is one pandas frame inside the worker."""
    customer = load_table(spark, sf_dir, "customer")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        z = (pdf["c_acctbal"] - pdf["c_acctbal"].mean()) / pdf["c_acctbal"].std(ddof=1)
        return pd.DataFrame({"c_custkey": pdf["c_custkey"], "z": z.round(6)})

    out = U.grouped_apply(
        customer.select("c_custkey", "c_mktsegment", "c_acctbal"),
        ["c_mktsegment"],
        zscore,
        schema="c_custkey long, z double",
    )
    return out.orderBy("c_custkey")


@register(
    "udf_batch_tax",
    sql="""
    SELECT o_orderkey,
           ROUND(o_totalprice * CASE WHEN o_orderpriority LIKE '1%' THEN 1.10 ELSE 1.04 END, 2) AS taxed
    FROM orders ORDER BY o_orderkey
    """,
)
def udf_batch_tax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """apply_rows/apply_chunks parity (dataframe.py:4999): an arbitrary
    per-chunk pandas function via mapInPandas."""
    orders = load_table(spark, sf_dir, "orders")

    def tax(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        rate = pdf["o_orderpriority"].str.startswith("1").map({True: 1.10, False: 1.04})
        # half-up (SQL ROUND) — pandas .round is banker's half-even
        taxed = np.floor(pdf["o_totalprice"] * rate * 100 + 0.5) / 100
        return pd.DataFrame({"o_orderkey": pdf["o_orderkey"], "taxed": taxed})

    out = U.apply_batches(
        orders.select("o_orderkey", "o_totalprice", "o_orderpriority"),
        tax,
        schema="o_orderkey long, taxed double",
    )
    return out.orderBy("o_orderkey")


@register(
    "udf_grouped_agg_gmean",
    sql="""
    SELECT l_returnflag, ROUND(EXP(AVG(LN(l_extendedprice))), 4) AS gmean_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def udf_grouped_agg_gmean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregation (HOST_UDF parity, aggregation.hpp:113-115):
    geometric mean as a pandas GROUPED_AGG udf."""
    import numpy as np

    li = load_table(spark, sf_dir, "lineitem")

    def gmean(prices: pd.Series) -> float:
        return float(np.exp(np.log(prices.to_numpy()).mean()))

    gm = U.grouped_agg_udf(gmean, "double")
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(gm("l_extendedprice"), 4).alias("gmean_price"))
        .orderBy("l_returnflag")
    )
