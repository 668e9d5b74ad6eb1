"""Reshape correctness queries (SURVEY.md §2.9): melt/unpivot, pivot,
crosstab, get_dummies, explode family (lists/explode.hpp:72-208)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from my_cudf_spark.functions.stable import DEC, sql_dsum, dsum
from my_cudf_spark.operators import reshape as R
from my_cudf_spark.queries import register
from my_cudf_spark.sources import load_table


@register(
    "reshape_melt",
    sql="""
    SELECT l_orderkey, l_linenumber, variable, value FROM (
      SELECT l_orderkey, l_linenumber, 'l_quantity' AS variable, l_quantity AS value FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem)
    ORDER BY l_orderkey, l_linenumber, variable
    """,
)
def reshape_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """melt (reshape.py:547) → unpivot; raw value passthrough (no float
    arithmetic → exact)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = R.melt(
        li,
        id_vars=["l_orderkey", "l_linenumber"],
        value_vars=["l_quantity", "l_extendedprice", "l_discount"],
    )
    # no final orderBy: a global sort of the 3× exploded output is pure
    # presentation cost (range partitioning even re-executes the child for
    # sampling) and the driver's comparison is order-insensitive
    return out


@register(
    "reshape_pivot",
    sql=f"""
    SELECT o_orderpriority,
           {sql_dsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS F,
           {sql_dsum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS O,
           {sql_dsum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS P
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def reshape_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pivot (reshape.py:1061): totalprice by priority × status. Explicit
    values list → no distinct-scan job."""
    orders = load_table(spark, sf_dir, "orders")
    out = R.pivot(
        orders,
        index=["o_orderpriority"],
        on="o_orderstatus",
        agg=F.sum(F.col("o_totalprice").cast(DEC)).cast("double"),
        values=["F", "O", "P"],
    )
    return out.orderBy("o_orderpriority")


@register(
    "reshape_crosstab",
    sql="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS F,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS O,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS P
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def reshape_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """crosstab (reshape.py:1398)."""
    orders = load_table(spark, sf_dir, "orders")
    out = R.crosstab(orders, "o_orderpriority", "o_orderstatus", values=["F", "O", "P"])
    return out.orderBy("o_orderpriority")


@register(
    "reshape_dummies",
    sql="""
    SELECT c_custkey,
           CAST(c_mktsegment = 'BUILDING' AS INT) AS seg_BUILDING,
           CAST(c_mktsegment = 'MACHINERY' AS INT) AS seg_MACHINERY,
           CAST(c_mktsegment = 'FURNITURE' AS INT) AS seg_FURNITURE
    FROM customer ORDER BY c_custkey
    """,
)
def reshape_dummies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_dummies / one_hot_encode (reshape.py:721, transform.hpp:182):
    explicit categories → pure narrow projection."""
    customer = load_table(spark, sf_dir, "customer")
    out = R.get_dummies(customer, "c_mktsegment", ["BUILDING", "MACHINERY", "FURNITURE"], prefix="seg")
    return out.select("c_custkey", "seg_BUILDING", "seg_MACHINERY", "seg_FURNITURE").orderBy("c_custkey")


@register(
    "reshape_explode",
    sql="""
    SELECT p_partkey, u.tok, u.pos FROM part,
         LATERAL (SELECT unnest(string_split(p_name, ' ')) AS tok,
                         generate_subscripts(string_split(p_name, ' '), 1) - 1 AS pos) u
    ORDER BY p_partkey, pos
    """,
)
def reshape_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode family — posexplode (lists/explode.hpp:108 explode_position:
    exact 1:1)."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.select("p_partkey", F.posexplode(F.split("p_name", " ")).alias("pos", "tok"))
        .select("p_partkey", "tok", F.col("pos").cast("long").alias("pos"))
        .orderBy("p_partkey", "pos")
    )


@register(
    "reshape_interleave_tile",
    sql="""
    SELECT n_nationkey, r.rep, p.pos,
           [n_name, CAST(n_regionkey AS VARCHAR)][p.pos] AS value
    FROM nation, range(0, 2) r(rep), range(1, 3) p(pos)
    ORDER BY n_nationkey, rep, pos
    """,
)
def reshape_interleave_tile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """interleave_columns + tile (reshape.hpp:53/77): k columns → k·n rows
    row-major, and count-fold row repetition — both narrow generates (no
    shuffle), with explicit pos/rep columns since Spark rows carry no
    implicit order."""
    from my_cudf_spark.operators.reshape import interleave_columns, tile

    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey",
        F.col("n_name").alias("a"),
        F.col("n_regionkey").cast("string").alias("b"),
    )
    out = interleave_columns(tile(nation, 2), ["a", "b"])
    return out.select(
        "n_nationkey",
        F.col("rep").cast("long").alias("rep"),
        F.col("pos").cast("long").alias("pos"),
        "value",
    ).orderBy("n_nationkey", "rep", "pos")


@register(
    "agg_cube_rollup",
    sql="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def agg_cube_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets — absent in the reference (SURVEY.md §2.4), builtin in
    Spark: capability win surfaced as an operator."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("o_orderstatus").asc_nulls_first(), F.col("o_orderpriority").asc_nulls_first())
    )


@register(
    "reshape_unstack",
    sql="""
    WITH long AS (
      SELECT o_orderpriority, o_orderstatus,
             CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2)
    SELECT o_orderpriority,
           COALESCE(max(CASE WHEN o_orderstatus = 'F' THEN n END), 0) AS F,
           COALESCE(max(CASE WHEN o_orderstatus = 'O' THEN n END), 0) AS O,
           COALESCE(max(CASE WHEN o_orderstatus = 'P' THEN n END), 0) AS P
    FROM long GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def reshape_unstack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unstack (reference reshape.py:1174): long (priority, status, n) →
    wide one column per status.  Pre-aggregated input, so (index, column)
    cells are unique and the pivot's distinct-values scan touches a
    15-row frame."""
    orders = load_table(spark, sf_dir, "orders")
    long = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        R.unstack(long, ["o_orderpriority"], "o_orderstatus", "n", fill_value=0)
        .orderBy("o_orderpriority")
    )


@register(
    "reshape_transpose",
    sql="""
    WITH base AS (
      SELECT r_name, CAST(count(*) AS BIGINT) AS n_nations,
             CAST(min(n_nationkey) AS BIGINT) AS min_key,
             CAST(max(n_nationkey) AS BIGINT) AS max_key
      FROM region JOIN nation ON r_regionkey = n_regionkey GROUP BY r_name)
    SELECT v.variable,
           max(CASE WHEN r_name = 'AFRICA' THEN v.val END) AS AFRICA,
           max(CASE WHEN r_name = 'AMERICA' THEN v.val END) AS AMERICA,
           max(CASE WHEN r_name = 'ASIA' THEN v.val END) AS ASIA,
           max(CASE WHEN r_name = 'EUROPE' THEN v.val END) AS EUROPE,
           max(CASE WHEN r_name = 'MIDDLE EAST' THEN v.val END) AS "MIDDLE EAST"
    FROM base, LATERAL (VALUES ('n_nations', n_nations), ('min_key', min_key),
                               ('max_key', max_key)) AS v(variable, val)
    GROUP BY v.variable ORDER BY v.variable
    """,
)
def reshape_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transpose (transpose.hpp:46): 5-region × 3-metric summary flipped to
    3 rows × 5 region columns via melt + pivot — the small-frame regime the
    reference also restricts transpose to."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    base = (
        region.join(nation, region["r_regionkey"] == nation["n_regionkey"])
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.min("n_nationkey").alias("min_key"),
            F.max("n_nationkey").alias("max_key"),
        )
    )
    return R.transpose(base, "r_name").orderBy("variable")


@register(
    "reshape_explode_outer",
    sql="""
    WITH a AS (
      SELECT o_orderkey,
             COALESCE(ARRAY_AGG(l_linenumber ORDER BY l_linenumber)
                        FILTER (WHERE l_quantity > 45), []) AS arr
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE o_orderkey % 7 = 0
      GROUP BY o_orderkey),
    padded AS (
      SELECT o_orderkey, arr,
             CASE WHEN len(arr) = 0 THEN [CAST(NULL AS INTEGER)] ELSE arr END AS arr2
      FROM a)
    SELECT o_orderkey,
           CASE WHEN len(arr) = 0 THEN NULL
                ELSE CAST(generate_subscripts(arr2, 1) - 1 AS INT) END AS pos,
           unnest(arr2) AS linenumber
    FROM padded ORDER BY o_orderkey, pos
    """,
)
def reshape_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode_outer — the null-preserving explode mode (cudf
    lists/explode.hpp:142 explode_outer / explode_outer_position):
    groups whose array is empty survive as a single (NULL pos, NULL
    value) row instead of disappearing, which is what left-join-shaped
    pipelines need after a filtered collect."""
    orders, lineitem = (
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )
    arrs = (
        orders.filter(F.col("o_orderkey") % 7 == 0)
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(
            F.sort_array(
                F.collect_list(F.when(F.col("l_quantity") > 45, F.col("l_linenumber")))
            ).alias("arr")
        )
    )
    return (
        arrs.select("o_orderkey", F.posexplode_outer("arr").alias("pos", "linenumber"))
        .select("o_orderkey", F.col("pos").cast("int").alias("pos"), "linenumber")
        .orderBy("o_orderkey", "pos")
    )
