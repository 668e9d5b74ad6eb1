"""NDS-H (TPC-H-derived) headline queries.

The reference implements exactly Q1, Q5, Q6, Q9, Q10
(``/root/reference/cpp/benchmarks/ndsh/q01.cpp:28-57`` … ``q10.cpp``) as
hand-built kernel pipelines; here each is the declarative Spark plan and
Catalyst picks the physical strategy (broadcast joins for dims, partial/final
hash aggregation, parquet filter pushdown).

Adaptations for the driver fixtures (FIXTURES.md):
- date literals shifted into the generated 1995-2001 range;
- Q9: no ``partsupp`` table → profit = extendedprice*(1-discount); and no
  'green' parts in the generator vocabulary → filter '%blue%';
- Q10: customer has no address/phone/comment columns → grouped on the
  available ones.

Scale notes: lineitem is the only large input.  ``broadcast()`` hints are
pinned ONLY on the fixed-size dimensions (region: 5 rows, nation: 25 rows —
constant at every scale factor).  orders/customer/supplier/part grow
linearly with SF, so they carry NO hint: a Spark broadcast hint is
mandatory (it bypasses ``autoBroadcastJoinThreshold`` and AQE sizing) and
would OOM executors at the 100 TB posture.  At small SF, AQE + the 64 MiB
threshold still picks broadcast-hash for them automatically; at scale it
degrades gracefully to shuffle-hash/sort-merge — the plan adapts instead of
crashing.  Q1/Q6's groupBy keys are low-cardinality so partial aggregation
collapses the final shuffle to a few KB per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from my_cudf_spark.functions.stable import (
    davg,
    dsum,
    sql_dec2dbl,
    one_minus,
    one_plus,
    price,
    sql_davg,
    sql_dsum,
    sql_one_minus,
    sql_one_plus,
    sql_price,
)
from my_cudf_spark.queries import register
from my_cudf_spark.sources import load_table

# Shared computed measures (Spark expr and DuckDB SQL kept adjacent).
DISC_PRICE = lambda: price("l_extendedprice") * one_minus("l_discount")
SQL_DISC_PRICE = f"{sql_price('l_extendedprice')} * {sql_one_minus('l_discount')}"
CHARGE = lambda: price("l_extendedprice") * one_minus("l_discount") * one_plus("l_tax")
SQL_CHARGE = f"{SQL_DISC_PRICE} * {sql_one_plus('l_tax')}"

Q1_SQL = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum('l_quantity')} AS sum_qty,
  {sql_dsum('l_extendedprice')} AS sum_base_price,
  {sql_dec2dbl(f'SUM({SQL_DISC_PRICE})')} AS sum_disc_price,
  {sql_dec2dbl(f'SUM({SQL_CHARGE})')} AS sum_charge,
  {sql_davg('l_quantity')} AS avg_qty,
  {sql_davg('l_extendedprice')} AS avg_price,
  {sql_davg('l_discount')} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("ndsh_q1", sql=Q1_SQL)
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan→Filter→HStack→GroupBy→Sort (cudf_polars IR nodes, SURVEY.md §2.1).

    The shipdate predicate reaches the parquet scan (PushedFilters) and only
    the 7 referenced columns are read (ReadSchema) — verified in
    tests/test_plans.py.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(DISC_PRICE()).cast("double").alias("sum_disc_price"),
            F.sum(CHARGE()).cast("double").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q5_SQL = f"""
SELECT
  n_name,
  {sql_dec2dbl(f'SUM({SQL_DISC_PRICE})')} AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@register("ndsh_q5", sql=Q5_SQL)
def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-way star join (reference: q05.cpp). Fixed-size dims (nation,
    region) pinned broadcast; scale-growing sides left to AQE sizing."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    return (
        lineitem
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(DISC_PRICE()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


Q6_SQL = f"""
SELECT {sql_dec2dbl(f"SUM({sql_price('l_extendedprice')} * CAST(l_discount AS DECIMAL(6,4)))")} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


@register("ndsh_q6", sql=Q6_SQL)
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective filter + global agg (reference: q06.cpp). All four predicates
    push to parquet row-group stats; no shuffle at all (single-value agg)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(price("l_extendedprice") * F.col("l_discount").cast("decimal(6,4)"))
            .cast("double")
            .alias("revenue")
        )
    )


Q9_SQL = f"""
SELECT
  n_name AS nation,
  CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
  {sql_dec2dbl(f'SUM({SQL_DISC_PRICE})')} AS sum_profit
FROM lineitem, part, supplier, orders, nation
WHERE l_partkey = p_partkey
  AND l_suppkey = s_suppkey
  AND l_orderkey = o_orderkey
  AND s_nationkey = n_nationkey
  AND p_name LIKE '%blue%'
GROUP BY 1, 2
ORDER BY 1, 2 DESC
"""


@register("ndsh_q9", sql=Q9_SQL)
def q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapted Q9 (reference: q09.cpp; fixtures lack partsupp — FIXTURES.md).

    The selective '%blue%' part filter is applied before the broadcast, so
    the fact-side hash probe discards non-matching rows immediately.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%blue%"))
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    return (
        lineitem
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            DISC_PRICE().alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


Q10_SQL = f"""
SELECT
  c_custkey,
  c_name,
  {sql_dec2dbl(f'SUM({SQL_DISC_PRICE})')} AS revenue,
  c_acctbal,
  n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
  AND l_returnflag = 'R'
  AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
"""


@register("ndsh_q10", sql=Q10_SQL)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item report (reference: q10.cpp), adapted to fixture columns."""
    lineitem = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        lineitem
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(DISC_PRICE()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
    )
