"""Frame-verb queries for the remaining cudf_polars IR nodes
(SURVEY.md §2.1): row_index, HConcat, MergeSorted — plus the free SQL
surface (spark.sql over registered views), which the reference lacks
entirely (cudf has no SQL front end)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from my_cudf_spark.functions.stable import sql_dec2dbl
from my_cudf_spark.operators import frame as FR
from my_cudf_spark.queries import register
from my_cudf_spark.sources import load_table


@register(
    "frame_hconcat_rowindex",
    sql="""
    WITH l AS (SELECT o_orderkey,
                      ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS rn
               FROM orders),
         r AS (SELECT o_totalprice,
                      ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) - 1 AS rn
               FROM orders)
    SELECT l.o_orderkey, r.o_totalprice, l.rn AS row_index
    FROM l JOIN r USING (rn) ORDER BY row_index
    """,
)
def frame_hconcat_rowindex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_index (MapFunction ir.py:1797) + positional HConcat (ir.py:1968):
    pair the k-th smallest order key with the k-th largest price.  Spark has
    no positional hconcat — it is a row-index equi-join on two explicit
    orderings (SURVEY.md §7.4.1: order-sensitive ops take explicit order
    columns; ties broken by the unique key)."""
    orders = load_table(spark, sf_dir, "orders")
    left = orders.select("o_orderkey")
    right = orders.select("o_totalprice", "o_orderkey").withColumnRenamed(
        "o_orderkey", "__tie"
    )
    out = FR.hconcat(
        left,
        right,
        order_left=["o_orderkey"],
        order_right=[F.col("o_totalprice").desc(), F.col("__tie")],
    )
    withidx = FR.with_row_index(out.select("o_orderkey", "o_totalprice"),
                                "row_index", order_by=["o_orderkey"])
    return withidx.select(
        "o_orderkey", "o_totalprice", F.col("row_index").cast("long").alias("row_index")
    ).orderBy("row_index")


@register(
    "frame_merge_sorted",
    sql="""
    SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
    ORDER BY o_orderdate, o_orderkey
    """,
)
def frame_merge_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MergeSorted (ir.py:1752, merge.hpp:104): k-way merge of sorted
    frames.  Sortedness is a physical property in Spark — union + orderBy
    declares the semantics and the optimizer picks the merge; here the two
    inputs are the even/odd-key halves, each pre-sorted."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    evens = orders.filter(F.col("o_orderkey") % 2 == 0).orderBy("o_orderdate", "o_orderkey")
    odds = orders.filter(F.col("o_orderkey") % 2 == 1).orderBy("o_orderdate", "o_orderkey")
    return FR.merge_sorted([evens, odds], ["o_orderdate", "o_orderkey"])


@register(
    "sql_surface",
    sql=f"""
    SELECT n.n_name,
           COUNT(*) AS n_orders,
           {sql_dec2dbl("ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(27,6))), 2)")} AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name ORDER BY n.n_name
    """,
)
def sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front end — free in Spark, absent in the reference (cudf has
    no SQL surface): register views, run ANSI SQL, same Catalyst plan as
    the DataFrame API."""
    for t in ("orders", "customer", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT n.n_name,
               COUNT(*) AS n_orders,
               CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(27,6))), 2) AS DOUBLE) AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name ORDER BY n.n_name
        """
    )
