"""Additional TPC-H-style relational queries beyond the reference's NDS-H five.

The reference benchmarks exactly Q1/Q5/Q6/Q9/Q10
(``/root/reference/cpp/benchmarks/ndsh/README.md:1-10``); these twelve extend
the relational surface to the classic shapes the reference *library* supports
but never benchmarks — correlated aggregates (Q17), HAVING + join-back (Q18),
EXISTS semi-joins (Q4), exists/not-exists composition (Q21), scalar-subquery
threshold + anti-join (Q22), left-join histograms (Q13), OR-of-ANDs scan
predicates (Q19), nation-pair volume (Q7), market-share ratios (Q8),
top-1-with-ties (Q15), conditional ratio aggregation (Q14) and top-k order
revenue (Q3).

Adaptations for the driver fixtures (FIXTURES.md): no partsupp / shipmode /
commitdate / receiptdate / shippriority columns, dates live in 1995-2001, part
types are single words (PROMO/SMALL/...), nations are NATION_0..24. Each
query documents its deviation from the spec text.

Scale notes: every join keys on the natural key and carries no broadcast
hint except fixed-size nation/region — AQE sizes the rest (see
queries/ndsh.py docstring). Q17's correlated subquery is a window over the
join result, not a self-join, so lineitem is scanned once. Q15's "= max"
runs as an unpartitioned window over the *aggregated* per-supplier frame
(|suppliers| rows, never raw lineitem). Q3/Q18's top-k carry total-order
tiebreaks so LIMIT is deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from my_cudf_spark.functions.stable import (
    dsum,
    one_minus,
    price,
    sql_dec2dbl,
    sql_one_minus,
    sql_price,
)
from my_cudf_spark.queries import register
from my_cudf_spark.sources import load_table

DISC_PRICE = lambda: price("l_extendedprice") * one_minus("l_discount")
SQL_DISC_PRICE = f"{sql_price('l_extendedprice')} * {sql_one_minus('l_discount')}"


def _t(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)


# --- Q3: shipping-priority top-k ---------------------------------------------

Q3_SQL = f"""
SELECT l_orderkey,
       {sql_dec2dbl(f'SUM({SQL_DISC_PRICE})')} AS revenue,
       o_orderdate, o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1997-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


@register("tpch_q3", sql=Q3_SQL)
def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (o_shippriority → o_orderpriority; fixture date). The
    mktsegment filter prunes customer before the join; l_orderkey tiebreak
    makes the LIMIT deterministic."""
    customer, orders, lineitem = _t(spark, sf_dir, "customer", "orders", "lineitem")
    cutoff = F.lit("1997-03-15").cast("timestamp_ntz")
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders.filter(F.col("o_orderdate") < cutoff),
              F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem.filter(F.col("l_shipdate") > cutoff),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(DISC_PRICE()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# --- Q4: order-priority checking (EXISTS) ------------------------------------

Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("tpch_q4", sql=Q4_SQL)
def q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 with the commitdate/receiptdate predicate adapted to the
    available columns: EXISTS a lineitem shipped >60 days after the order
    date. The EXISTS compiles to a left-semi hash join — no row duplication,
    no distinct needed."""
    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp_ntz"))
    )
    return (
        o.join(
            lineitem.select("l_orderkey", "l_shipdate"),
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --- Q7: volume shipping between two nations ---------------------------------

Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       {sql_dec2dbl('SUM(volume)')} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
         {SQL_DISC_PRICE} AS volume
  FROM supplier, lineitem, orders, customer, nation n1, nation n2
  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
    AND c_nationkey = n2.n_nationkey
    AND n1.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4')
    AND n2.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4')
    AND n1.n_name <> n2.n_name
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                       AND TIMESTAMP '1997-12-31 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@register("tpch_q7", sql=Q7_SQL)
def q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (FRANCE/GERMANY pair widened to all ordered pairs among
    NATION_1..4 so the smallest fixture produces rows). The nation-pair
    predicate lands on the two broadcast nation joins, so the big
    lineitem-orders join only carries rows from the two nations."""
    supplier, lineitem, orders, customer, nation = _t(
        spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation"
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2", "NATION_3", "NATION_4"))
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2", "NATION_3", "NATION_4"))
    li = lineitem.filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp_ntz"),
            F.lit("1997-12-31").cast("timestamp_ntz"),
        )
    )
    return (
        li.join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .select(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
            DISC_PRICE().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("volume").cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --- Q8: national market share ------------------------------------------------

Q8_SQL = f"""
SELECT o_year,
       {sql_dec2dbl('SUM(CASE WHEN nation = $$NATION_3$$ THEN volume ELSE 0 END)')}
       / {sql_dec2dbl('SUM(volume)')} AS mkt_share
FROM (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
         {SQL_DISC_PRICE} AS volume,
         n2.n_name AS nation
  FROM part, lineitem, supplier, orders, customer, nation n1, nation n2, region
  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
    AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                        AND TIMESTAMP '1997-12-31 00:00:00'
    AND p_type = 'PROMO'
) all_nations
GROUP BY o_year
ORDER BY o_year
""".replace("$$", "'")


@register("tpch_q8", sql=Q8_SQL)
def q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (BRAZIL/AMERICA/STEEL → NATION_3/ASIA/PROMO). Numerator and
    denominator are each an exact decimal sum cast to double, so the final
    double division is bit-identical across engines."""
    part, lineitem, supplier, orders, customer, nation, region = _t(
        spark, sf_dir, "part", "lineitem", "supplier", "orders", "customer",
        "nation", "region",
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    return (
        lineitem.join(part.filter(F.col("p_type") == "PROMO"),
                      F.col("p_partkey") == F.col("l_partkey"))
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            orders.filter(
                F.col("o_orderdate").between(
                    F.lit("1996-01-01").cast("timestamp_ntz"),
                    F.lit("1997-12-31").cast("timestamp_ntz"),
                )
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(broadcast(region.filter(F.col("r_name") == "ASIA")),
              F.col("n1_region") == F.col("r_regionkey"))
        .join(broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            DISC_PRICE().alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume"))
                      .otherwise(F.lit(0).cast("decimal(18,6)"))).cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --- Q13: customer order-count distribution ----------------------------------

Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("tpch_q13", sql=Q13_SQL)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (the 'not like %special%requests%' comment filter becomes a
    priority filter — orders has no comment column). Two-level aggregation:
    per-customer count (left join keeps 0-order customers), then histogram."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    per_cust = (
        customer.join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --- Q14: promotion-effect ratio ---------------------------------------------

Q14_SQL = f"""
SELECT {sql_dec2dbl(f'SUM(CASE WHEN p_type = $$PROMO$$ THEN {SQL_DISC_PRICE} ELSE 0 END)')}
       * 100.0 / {sql_dec2dbl(f'SUM({SQL_DISC_PRICE})')} AS promo_revenue
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
""".replace("$$", "'")


@register("tpch_q14", sql=Q14_SQL)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: conditional-ratio aggregate over one month of lineitem.
    The date predicate is pushed to the scan; part is join-pruned to the
    two referenced columns."""
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp_ntz"))
    )
    joined = li.join(part.select("p_partkey", "p_type"),
                     F.col("l_partkey") == F.col("p_partkey"))
    zero = F.lit(0).cast("decimal(28,10)")
    return joined.agg(
        (
            F.sum(F.when(F.col("p_type") == "PROMO", DISC_PRICE().cast("decimal(28,10)"))
                  .otherwise(zero)).cast("double")
            * F.lit(100.0)
            / F.sum(DISC_PRICE()).cast("double")
        ).alias("promo_revenue")
    )


# --- Q15: top supplier(s) by quarterly revenue -------------------------------

Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {sql_dec2dbl(f'SUM({SQL_DISC_PRICE})')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@register("tpch_q15", sql=Q15_SQL)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: per-supplier quarterly revenue, keep the max (with ties).
    The '= max' runs as an unpartitioned window over the per-supplier
    aggregate (|suppliers| rows), never over raw lineitem."""
    lineitem, supplier = _t(spark, sf_dir, "lineitem", "supplier")
    revenue = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(DISC_PRICE()).cast("double").alias("total_revenue"))
    )
    top = revenue.withColumn(
        "max_rev", F.max("total_revenue").over(Window.partitionBy())
    ).filter(F.col("total_revenue") == F.col("max_rev"))
    return (
        supplier.join(top, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --- Q17: small-quantity-order revenue (correlated avg) ----------------------

Q17_SQL = f"""
SELECT {sql_dec2dbl('SUM(CAST(l_extendedprice AS DECIMAL(12,2)))')} / 7.0
       AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey AND p_type = 'SMALL'
  AND l_quantity < (
    SELECT 0.2 * ({sql_dec2dbl('SUM(CAST(l_quantity AS DECIMAL(27,6)))')}
                  / COUNT(*))
    FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
"""


@register("tpch_q17", sql=Q17_SQL)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (Brand#23/MED BOX → p_type='SMALL'). The correlated
    per-part AVG is a window over the joined frame — since the average is
    keyed on p_partkey, restricting to the filtered parts first doesn't
    change it, and lineitem is scanned exactly once."""
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    joined = lineitem.join(
        part.filter(F.col("p_type") == "SMALL").select("p_partkey"),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    w = Window.partitionBy("p_partkey")
    avg_qty = (
        F.sum(F.col("l_quantity").cast("decimal(27,6)")).over(w).cast("double")
        / F.count("l_quantity").over(w)
    )
    return (
        joined.withColumn("avg_qty", avg_qty)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(price("l_extendedprice")).cast("double") / F.lit(7.0))
            .alias("avg_yearly")
        )
    )


# --- Q18: large-volume customers ---------------------------------------------

Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(27,6))) > 250)
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
"""


@register("tpch_q18", sql=Q18_SQL)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (threshold 250 sized to the fixture qty distribution). The
    HAVING subquery is a groupBy + left-semi join back onto orders;
    o_orderkey tiebreak makes the LIMIT deterministic."""
    customer, orders, lineitem = _t(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(27,6)")).alias("q"))
        .filter(F.col("q") > 250)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("decimal(27,6)")).cast("double")
             .alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


# --- Q19: discounted revenue (OR-of-ANDs) ------------------------------------

Q19_SQL = f"""
SELECT {sql_dec2dbl(f'SUM({SQL_DISC_PRICE})')} AS revenue
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        AND l_quantity >= 1 AND l_quantity <= 20)
    OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 30
        AND l_quantity >= 10 AND l_quantity <= 30)
    OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50
        AND l_quantity >= 20 AND l_quantity <= 40))
"""


@register("tpch_q19", sql=Q19_SQL)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (container/shipmode legs dropped — columns absent). The
    disjunction references both sides, so it stays a post-join filter, but
    Catalyst derives the single-side implications (brand IN, quantity range)
    and pushes them to the scans."""
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    leg = lambda brand, smax, qlo, qhi: (
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & (F.col("l_quantity") >= qlo)
        & (F.col("l_quantity") <= qhi)
    )
    return (
        lineitem.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .filter(
            leg("Brand#1", 15, 1, 20)
            | leg("Brand#2", 30, 10, 30)
            | leg("Brand#3", 50, 20, 40)
        )
        .agg(F.sum(DISC_PRICE()).cast("double").alias("revenue"))
    )


# --- Q21: suppliers who kept orders waiting ----------------------------------

Q21_SQL = """
WITH late AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 30 DAY AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F')
SELECT s_name, COUNT(*) AS numwait
FROM supplier, late l1
WHERE s_suppkey = l1.l_suppkey AND l1.is_late
  AND EXISTS (SELECT 1 FROM late l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.is_late)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


@register("tpch_q21", sql=Q21_SQL)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (receipt/commit-date lateness adapted to shipdate >
    orderdate + 30 days; no nation filter — fixture suppliers are
    uniform).  The exists/not-exists pair over the same derived 'late'
    frame compiles to one left-semi and one left-anti hash join against
    per-order aggregates — the lateness frame is aggregated to
    (orderkey → supplier count, late-supplier set size) ONCE instead of
    two correlated self-joins, so lineitem is scanned a single time."""
    orders, lineitem, supplier = _t(spark, sf_dir, "orders", "lineitem", "supplier")
    late = (
        lineitem.join(
            orders.filter(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
            .alias("is_late"),
        )
    )
    # per-(order, supplier) late-line counts: the only shuffle grain both
    # downstream consumers need.
    per_supp = late.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum(F.col("is_late").cast("int")).alias("n_late_lines")
    )
    per_order = per_supp.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum((F.col("n_late_lines") > 0).cast("int")).alias("n_late_supp"),
    )
    waiting = (
        per_supp.filter(F.col("n_late_lines") > 0)
        .join(per_order, F.col("l_orderkey") == F.col("ok"))
        # another supplier exists in the order; no OTHER supplier is late
        # (this supplier is late, so the order's late-supplier count is 1)
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    return (
        supplier.join(waiting, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# --- Q22: global sales opportunity (anti-join + scalar subquery) -------------

Q22_SQL = """
WITH avg_bal AS (
  SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
         / COUNT(*) AS ab
  FROM customer WHERE c_acctbal > 0.0
    AND c_nationkey IN (1, 2, 3, 4, 5, 6, 7))
SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
FROM customer, avg_bal
WHERE c_nationkey IN (1, 2, 3, 4, 5, 6, 7)
  AND c_acctbal > ab
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT'
                    AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
                    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
GROUP BY c_nationkey
ORDER BY cntrycode
"""


@register("tpch_q22", sql=Q22_SQL)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (phone-prefix country codes → c_nationkey; fixture
    customer has no phone column).  The scalar above-average threshold is
    a crossJoin of a 1-row aggregate; customers-without-orders is a
    left-anti hash join.  AVG over doubles is order-dependent, so both
    engines compute it as exact-decimal sum / count."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    nations = [1, 2, 3, 4, 5, 6, 7]
    cust = customer.filter(F.col("c_nationkey").isin(nations))
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("ab")
        )
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(
            orders.filter(
                (F.col("o_orderpriority") == "1-URGENT")
                & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            ),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
            .alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


# --- Q12: late-shipment priority mix (adapted) -------------------------------

Q12_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey
  AND l_returnflag IN ('A', 'R')
  AND l_shipdate >= o_orderdate + INTERVAL 60 DAY
  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag ORDER BY l_returnflag
"""


@register("tpch_q12", sql=Q12_SQL)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (spec: cpp-adjacent shape; fixtures ship no
    l_shipmode/l_commitdate/l_receiptdate — FIXTURES.md): l_returnflag
    stands in for the two ship modes and "late delivery" becomes
    l_shipdate >= o_orderdate + 60 days, a cross-table date-arithmetic
    residual on the equi-join. High/low priority split is the spec's
    conditional count pair.

    Scale: the only shuffle is the o_orderkey equi-join (both sides
    pre-filtered at the scan; the date residual evaluates post-join inside
    the same stage); the two-row result aggregates map-side."""
    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    li = lineitem.filter(
        F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    ).select("l_orderkey", "l_returnflag", "l_shipdate")
    jn = li.join(
        orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        jn.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )
