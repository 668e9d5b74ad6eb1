"""Remaining aggregation kinds + struct/map functions (SURVEY.md §2.4
Kind enum tail, §2.8 structs/maps/labeling) — closes the coverage gaps the
earlier family queries didn't touch: ANY/ALL, ARGMAX/ARGMIN, NUNIQUE,
NTH_ELEMENT, COLLECT_LIST/COLLECT_SET, HISTOGRAM (via binned counts +
label_bins/cut), COVARIANCE, SPEARMAN correlation, struct field access,
map construction/extraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from my_cudf_spark.functions.stable import DEC, PRICE, sql_dec2dbl
from my_cudf_spark.queries import register
from my_cudf_spark.sources import load_table


@register(
    "agg_bool_argminmax",
    sql="""
    SELECT o_orderpriority,
           bool_or(o_totalprice > 200000) AS any_big,
           bool_and(o_totalprice > 0) AS all_pos,
           COUNT(DISTINCT o_custkey) AS n_cust,
           arg_max(o_totalprice, o_orderkey) AS price_at_last,
           arg_min(o_totalprice, o_orderkey) AS price_at_first
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def agg_bool_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANY/ALL/NUNIQUE/ARGMAX/ARGMIN aggregation kinds
    (aggregation.hpp:87-123).  arg extremes keyed on the unique o_orderkey
    so ties cannot make the result engine-dependent."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.bool_or(F.col("o_totalprice") > 200000).alias("any_big"),
            F.bool_and(F.col("o_totalprice") > 0).alias("all_pos"),
            F.count_distinct("o_custkey").alias("n_cust"),
            F.max_by("o_totalprice", "o_orderkey").alias("price_at_last"),
            F.min_by("o_totalprice", "o_orderkey").alias("price_at_first"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "agg_collect_nth",
    sql="""
    SELECT n_regionkey,
           array_to_string(list_sort(list(DISTINCT n_name)), ',') AS names,
           list_sort(list(n_name))[2] AS second_name,
           COUNT(DISTINCT n_name) AS n_distinct
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
)
def agg_collect_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLLECT_LIST/COLLECT_SET/NTH_ELEMENT kinds (aggregation.hpp:87-123;
    nth via element_at over the sorted collected list)."""
    nation = load_table(spark, sf_dir, "nation")
    return (
        nation.groupBy("n_regionkey")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_set("n_name"))).alias("names"),
            F.element_at(F.sort_array(F.collect_list("n_name")), 2).alias("second_name"),
            F.count_distinct("n_name").alias("n_distinct"),
        )
        .orderBy("n_regionkey")
    )


@register(
    "agg_histogram_bins",
    sql="""
    SELECT CASE WHEN o_totalprice >= 100000 AND o_totalprice < 200000 THEN 0
                WHEN o_totalprice >= 200000 AND o_totalprice < 300000 THEN 1
                END AS bin,
           COUNT(*) AS n,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM orders GROUP BY 1 ORDER BY bin
    """,
)
def agg_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HISTOGRAM kind + label_bins / cut (labeling/label_bins.hpp:71,
    cudf cut.py): bin labels via compat.label_bins (values outside the
    edge range label NULL, matching the reference), then binned counts —
    the relational histogram (one shuffle, partial counts map-side)."""
    from my_cudf_spark.functions.compat import label_bins

    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn(
            "bin", label_bins("o_totalprice", [100000.0, 200000.0, 300000.0])
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("bin")
    )


@register(
    "agg_covar_spearman",
    sql=f"""
    WITH r AS (
      SELECT l_returnflag,
             RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
               + (COUNT(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1) / 2.0 AS rq,
             RANK() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
               + (COUNT(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1) / 2.0 AS re
      FROM lineitem),
    s AS (
      SELECT l_returnflag, COUNT(*) AS n,
             {sql_dec2dbl(f'SUM(CAST(rq AS {DEC}))')} AS sq,
             {sql_dec2dbl(f'SUM(CAST(re AS {DEC}))')} AS se,
             {sql_dec2dbl(f'SUM(CAST(rq AS {DEC}) * CAST(re AS {DEC}))')} AS sqe,
             {sql_dec2dbl(f'SUM(CAST(rq AS {DEC}) * CAST(rq AS {DEC}))')} AS sqq,
             {sql_dec2dbl(f'SUM(CAST(re AS {DEC}) * CAST(re AS {DEC}))')} AS see
      FROM r GROUP BY l_returnflag)
    SELECT l_returnflag,
           (sqe - sq*se/n) / (n-1) AS covar_rank,
           (sqe - sq*se/n) / (sqrt(sqq - sq*sq/n) * sqrt(see - se*se/n)) AS spearman
    FROM s ORDER BY l_returnflag
    """,
)
def agg_covar_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COVARIANCE + SPEARMAN correlation kinds (aggregation.hpp:255):
    average-method ranks (sorting.hpp:203 AVERAGE) per group, then the
    Pearson formula on ranks from exact decimal co-moments — identical
    double operands on both engines, so no rounding is needed.

    Ranks come from ``rank_avg_distinct``: with only 3 returnflag groups, a
    per-row rank window is 3 serial sorts of 200k rows per ordering; ranking
    the distinct (group, value) pairs and joining back keeps every stage
    distributed (and the 150-row quantity rank table broadcasts)."""
    from my_cudf_spark.operators.windows import rank_avg_distinct

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    ranked = rank_avg_distinct(li, "rq", "l_quantity", ["l_returnflag"])
    ranked = rank_avg_distinct(ranked, "re", "l_extendedprice", ["l_returnflag"])
    ranked = ranked.select("l_returnflag", "rq", "re")
    rq, re = F.col("rq").cast(DEC), F.col("re").cast(DEC)
    s = ranked.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(rq).cast("double").alias("sq"),
        F.sum(re).cast("double").alias("se"),
        F.sum(rq * re).cast("double").alias("sqe"),
        F.sum(rq * rq).cast("double").alias("sqq"),
        F.sum(re * re).cast("double").alias("see"),
    )
    n, sq, se = F.col("n"), F.col("sq"), F.col("se")
    sqe, sqq, see = F.col("sqe"), F.col("sqq"), F.col("see")
    return s.select(
        "l_returnflag",
        ((sqe - sq * se / n) / (n - 1)).alias("covar_rank"),
        (
            (sqe - sq * se / n)
            / (F.sqrt(sqq - sq * sq / n) * F.sqrt(see - se * se / n))
        ).alias("spearman"),
    ).orderBy("l_returnflag")


@register(
    "fn_struct_map",
    sql="""
    SELECT c_custkey,
           struct_pack(seg := c_mktsegment, bal := c_acctbal).seg AS seg_field,
           struct_pack(seg := c_mktsegment, bal := c_acctbal).bal AS bal_field,
           map {'balance': c_acctbal, 'double_bal': c_acctbal * 2}['double_bal'][1] AS from_map,
           array_to_string(map_keys(map {'balance': c_acctbal, 'double_bal': c_acctbal * 2}), ',') AS mkeys
    FROM customer ORDER BY c_custkey
    """,
)
def fn_struct_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction + field access (cudf structs §2 structs;
    col.getField) and MAP construction/extraction — cudf has no map type
    (encodes list<struct<k,v>>; SURVEY.md §1.2), Spark's MapType is the
    native superset."""
    customer = load_table(spark, sf_dir, "customer")
    st = F.struct(F.col("c_mktsegment").alias("seg"), F.col("c_acctbal").alias("bal"))
    mp = F.create_map(
        F.lit("balance"), F.col("c_acctbal"),
        F.lit("double_bal"), F.col("c_acctbal") * 2,
    )
    return customer.select(
        "c_custkey",
        st.getField("seg").alias("seg_field"),
        st.getField("bal").alias("bal_field"),
        F.element_at(mp, "double_bal").alias("from_map"),
        F.concat_ws(",", F.map_keys(mp)).alias("mkeys"),
    ).orderBy("c_custkey")


@register(
    "fn_search_isin",
    sql="""
    SELECT c_custkey, c_mktsegment,
           c_mktsegment IN ('BUILDING', 'MACHINERY') AS in_segs,
           CAST(list_position([100.0, 1000.0, 5000.0, 10000.0], 5000.0) AS BIGINT) AS pos_of,
           len(list_filter([100.0, 1000.0, 5000.0, 10000.0], x -> x <= c_acctbal)) AS lower_bound
    FROM customer ORDER BY c_custkey
    """,
)
def fn_search_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """search ops (search.hpp:70/112/138): ``contains`` → isin,
    ``lower_bound`` (searchsorted) → count of sorted-array elements ≤ the
    probe, ``index_of`` → array_position — all JVM-side expressions."""
    customer = load_table(spark, sf_dir, "customer")
    edges = F.array(*[F.lit(v) for v in (100.0, 1000.0, 5000.0, 10000.0)])
    return customer.select(
        "c_custkey",
        "c_mktsegment",
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY").alias("in_segs"),
        F.array_position(edges, 5000.0).alias("pos_of"),
        F.size(F.filter(edges, lambda x: x <= F.col("c_acctbal"))).cast("long").alias("lower_bound"),
    ).orderBy("c_custkey")


@register(
    "agg_decimal128",
    sql="""
    SELECT o_orderstatus,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS VARCHAR) AS sum_dec,
           CAST(MIN(CAST(o_totalprice AS DECIMAL(38,10))) AS VARCHAR) AS min_dec,
           CAST(MAX(CAST(o_totalprice AS DECIMAL(38,10))) AS VARCHAR) AS max_dec
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def agg_decimal128(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECIMAL128 aggregation (SURVEY.md §1.2/§7.4.8: cudf DECIMAL128 ↔
    DecimalType(38)): exact wide-decimal sum/min/max, emitted as canonical
    strings so precision-growth rules (Spark caps sum at p=38) can't hide a
    value drift behind a double cast.  (AVG is excluded: DuckDB's decimal
    AVG returns DOUBLE, so its last digit is not comparable to Spark's
    decimal average — a real cross-engine semantic, not a bug.)"""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_totalprice").cast("decimal(38,10)")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.sum(d).cast("decimal(38,10)").cast("string").alias("sum_dec"),
            F.min(d).cast("string").alias("min_dec"),
            F.max(d).cast("string").alias("max_dec"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "agg_mode",
    sql="""
    WITH c AS (SELECT user_id, event_type, COUNT(*) AS cnt
               FROM events GROUP BY 1, 2),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                        ORDER BY cnt DESC, event_type) AS rn FROM c)
    SELECT user_id, event_type AS mode_event, cnt
    FROM r WHERE rn = 1 ORDER BY user_id
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC mode aggregate: most frequent value per group with a
    total tie-break (count desc, value asc) — Spark's builtin ``mode()``
    returns an arbitrary tied value, which is unusable under a
    cross-engine exactness gate.  Two hash aggregations (both with
    map-side partials) + a per-group top-1 window over the already
    group-reduced counts."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("user_id").orderBy(F.col("cnt").desc(), "event_type")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_event"), "cnt")
        .orderBy("user_id")
    )


@register(
    "agg_product",
    sql="""
    WITH per_order AS (
      SELECT o_orderkey, PRODUCT(CAST(l_linenumber AS DOUBLE)) AS p
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_linenumber BETWEEN 1 AND 3
      GROUP BY o_orderkey)
    SELECT o_orderkey % 10 AS bucket,
           CAST(CAST(SUM(CAST(p AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE)
             AS sum_products,
           COUNT(*) AS n
    FROM per_order GROUP BY bucket ORDER BY bucket
    """,
)
def agg_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCT aggregation kind (aggregation.hpp:87 Kind::PRODUCT).
    Products of doubles are order-dependent once they exceed 2^53, so the
    PRODUCT itself runs per order (≤13 factors of ≤3 → ≤3^13, integral
    and exact in double regardless of order) and the cross-bucket rollup
    of those exact products goes through the decimal-stable SUM."""
    from my_cudf_spark.sources import load_table as _lt

    lineitem, orders = (
        _lt(spark, sf_dir, "lineitem"),
        _lt(spark, sf_dir, "orders"),
    )
    li = lineitem.filter(F.col("l_linenumber").between(1, 3))
    per_order = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(F.product(F.col("l_linenumber").cast("double")).alias("p"))
    )
    return (
        per_order.groupBy((F.col("o_orderkey") % 10).alias("bucket"))
        .agg(
            F.sum(F.col("p").cast("decimal(27,6)")).cast("double")
            .alias("sum_products"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("bucket")
    )


SKEW_KURT_SQL = """
WITH s AS (
  SELECT l_returnflag, COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
         CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s2,
         CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                  * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s3,
         CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                  * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s4
  FROM lineitem GROUP BY l_returnflag),
m AS (
  SELECT l_returnflag, n,
         CAST(s1 AS DOUBLE) / n AS mean,
         CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m2,
         CAST(s3 AS DOUBLE) / n
           - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
           + 2.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m3,
         CAST(s4 AS DOUBLE) / n
           - 4.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
           + 6.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
           - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m4
  FROM s)
SELECT l_returnflag,
       SQRT(CAST(n AS DOUBLE) * (n - 1)) / (n - 2) * (m3 / SQRT(m2 * m2 * m2)) AS skew_adj,
       ((n + 1.0) * (m4 / (m2 * m2) - 3.0) + 6.0) * (n - 1.0) / ((n - 2.0) * (n - 3.0))
         AS kurt_excess
FROM m ORDER BY l_returnflag
"""


@register("agg_skew_kurt", sql=SKEW_KURT_SQL)
def agg_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness and excess kurtosis with pandas/cudf bias adjustment
    (indexed_frame.py:1685 skew, :1630 kurtosis).  Engine-builtin
    skewness()/kurtosis() stream running moments whose low bits depend
    on visit order; instead both sides aggregate EXACT integer power
    sums (l_quantity is integral ≤50, so x⁴ sums stay far inside int64)
    and close the identical textual formula in double — bit-stable
    (m2^1.5 is sqrt(m2³): IEEE sqrt/multiply are exactly rounded where
    libm pow() differs between engines in the last bit)."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("bigint")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("s1"),
        F.sum(x * x).alias("s2"),
        F.sum(x * x * x).alias("s3"),
        F.sum(x * x * x * x).alias("s4"),
    )
    n = F.col("n")
    mean = F.col("s1").cast("double") / n
    m2 = F.col("s2").cast("double") / n - mean * mean
    m3 = (
        F.col("s3").cast("double") / n
        - F.lit(3.0) * mean * (F.col("s2").cast("double") / n)
        + F.lit(2.0) * mean * mean * mean
    )
    m4 = (
        F.col("s4").cast("double") / n
        - F.lit(4.0) * mean * (F.col("s3").cast("double") / n)
        + F.lit(6.0) * mean * mean * (F.col("s2").cast("double") / n)
        - F.lit(3.0) * mean * mean * mean * mean
    )
    return s.select(
        "l_returnflag",
        (F.sqrt(n.cast("double") * (n - 1)) / (n - 2) * (m3 / F.sqrt(m2 * m2 * m2)))
        .alias("skew_adj"),
        (
            ((n + F.lit(1.0)) * (m4 / (m2 * m2) - F.lit(3.0)) + F.lit(6.0))
            * (n - F.lit(1.0))
            / ((n - F.lit(2.0)) * (n - F.lit(3.0)))
        ).alias("kurt_excess"),
    ).orderBy("l_returnflag")


@register(
    "agg_approx_quantile",
    sql="""
    SELECT l_returnflag,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 6) AS exact_p50,
           TRUE AS approx_within_rank_bound
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TDIGEST-style approximate percentile (tdigest agg,
    cpp/include/cudf/tdigest + quantiles.hpp): Spark's percentile_approx
    (Greenwald-Khanna summaries — a mergeable quantile sketch, the same
    role as the reference's tdigest) checked against its own CONTRACT
    rather than hash-compared — approx answers differ by engine, so the
    driver-checked columns are the exact median plus a flag that the
    approx value lies within a rank window around p50.  The check window
    (±0.01) is wider than the sketch's guaranteed rank error (1/accuracy =
    0.001) because the two sides answer differently at the point level:
    percentile_approx returns an ACTUAL data value while exact percentile
    interpolates between points, so the window must span at least one
    inter-point gap to be meaningful at small group sizes.  Sketches merge
    map-side, so the shuffle carries one summary per group per partition,
    never raw values — the property that makes this the 100 TB quantile
    path while exact percentile buffers whole groups."""
    li = load_table(spark, sf_dir, "lineitem")
    acc = 1000
    eps = 0.01
    g = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, acc).alias("approx"),
        F.expr(
            f"percentile(l_extendedprice, array({0.5 - eps}D, 0.5D, {0.5 + eps}D))"
        ).alias("q"),
    )
    return g.select(
        "l_returnflag",
        F.round(F.element_at("q", 2), 6).alias("exact_p50"),
        (
            (F.col("approx") >= F.element_at("q", 1))
            & (F.col("approx") <= F.element_at("q", 3))
        ).alias("approx_within_rank_bound"),
    ).orderBy("l_returnflag")
