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
    # DESC expressed as ascending order on the negated key: a plain numeric
    # leading key keeps both sides on global_cumsum's deterministic-bucket
    # path (no checkpoint, no range-sampling).  The positional index is the
    # hconcat join key itself (index_col), so no third row-index pass.
    out = FR.hconcat(
        left,
        right,
        order_left=["o_orderkey"],
        order_right=[-F.col("o_totalprice"), F.col("__tie")],
        index_col="row_index",
    )
    return out.select(
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


@register(
    "frame_value_counts",
    sql="""
    WITH c AS (SELECT o_orderpriority, o_orderstatus, COUNT(*) AS count
               FROM orders GROUP BY o_orderpriority, o_orderstatus),
    t AS (SELECT SUM(count) AS total FROM c)
    SELECT o_orderpriority, o_orderstatus, count,
           CAST(count AS DOUBLE) / total AS fraction
    FROM c, t
    ORDER BY count DESC, o_orderpriority, o_orderstatus
    """,
)
def frame_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """value_counts with normalize (cudf dataframe.py:8177): frequency of
    (priority, status) combinations; the normalizing total is a broadcast
    scalar over the aggregated frame, not a second input scan."""
    orders = load_table(spark, sf_dir, "orders")
    return FR.value_counts(
        orders, ["o_orderpriority", "o_orderstatus"], normalize=True
    )


DESCRIBE_SQL = f"""
WITH s AS (
  SELECT COUNT(*) AS n,
         {sql_dec2dbl('SUM(CAST(l_quantity AS DECIMAL(12,2)))')} AS sq,
         {sql_dec2dbl('SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)))')} AS sqq,
         {sql_dec2dbl('SUM(CAST(l_extendedprice AS DECIMAL(12,2)))')} AS se,
         {sql_dec2dbl('SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2)))')} AS see,
         MIN(l_quantity) AS min_q, MAX(l_quantity) AS max_q,
         MIN(l_extendedprice) AS min_e, MAX(l_extendedprice) AS max_e,
         ROUND(QUANTILE_CONT(l_quantity, 0.25), 6) AS p25_q,
         ROUND(QUANTILE_CONT(l_quantity, 0.50), 6) AS p50_q,
         ROUND(QUANTILE_CONT(l_quantity, 0.75), 6) AS p75_q,
         ROUND(QUANTILE_CONT(l_extendedprice, 0.25), 6) AS p25_e,
         ROUND(QUANTILE_CONT(l_extendedprice, 0.50), 6) AS p50_e,
         ROUND(QUANTILE_CONT(l_extendedprice, 0.75), 6) AS p75_e
  FROM lineitem)
SELECT statistic, l_quantity, l_extendedprice FROM (
  SELECT 'count' AS statistic, CAST(n AS DOUBLE) AS l_quantity, CAST(n AS DOUBLE) AS l_extendedprice, 1 AS ord FROM s
  UNION ALL SELECT 'mean', sq / n, se / n, 2 FROM s
  UNION ALL SELECT 'std', SQRT((sqq - sq*sq/n) / (n-1)), SQRT((see - se*se/n) / (n-1)), 3 FROM s
  UNION ALL SELECT 'min', min_q, min_e, 4 FROM s
  UNION ALL SELECT '25%', p25_q, p25_e, 5 FROM s
  UNION ALL SELECT '50%', p50_q, p50_e, 6 FROM s
  UNION ALL SELECT '75%', p75_q, p75_e, 7 FROM s
  UNION ALL SELECT 'max', max_q, max_e, 8 FROM s)
ORDER BY ord
"""


@register("frame_describe", sql=DESCRIBE_SQL)
def frame_describe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """describe() summary frame (cudf dataframe.py:5501): count/mean/std/
    min/quartiles/max for two numeric columns — exact decimal co-moments
    close the mean/std formulas bit-stably in one fixed-buffer aggregation
    pass, and each quartile triple comes from
    :func:`operators.stats.exact_quantiles` (distinct-value counts +
    distributed rank cumsum + fixed-buffer bracketing agg).  A keyless
    ``percentile(col, array(...))`` would instead funnel EVERY value of
    both columns into one ObjectHashAggregate buffer merged on a single
    final reducer — the one shape that cannot survive a whole-table
    describe at 100 TB (flagged round 3; plan-guarded percentile-free in
    test_plans).  The two 1-row quantile frames broadcast into the stats
    row; the stack() unpivot to pandas-shaped rows runs on that single
    row."""
    from my_cudf_spark.operators.stats import exact_quantiles

    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(12,2)")
    e = F.col("l_extendedprice").cast("decimal(12,2)")
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).cast("double").alias("sq"),
        F.sum(q * q).cast("double").alias("sqq"),
        F.sum(e).cast("double").alias("se"),
        F.sum(e * e).cast("double").alias("see"),
        F.min("l_quantity").alias("min_q"),
        F.max("l_quantity").alias("max_q"),
        F.min("l_extendedprice").alias("min_e"),
        F.max("l_extendedprice").alias("max_e"),
    )
    pq = exact_quantiles(li, "l_quantity", [0.25, 0.5, 0.75], prefix="pq")
    pe = exact_quantiles(li, "l_extendedprice", [0.25, 0.5, 0.75], prefix="pe")
    s = s.join(F.broadcast(pq), F.lit(True), "left").join(
        F.broadcast(pe), F.lit(True), "left"
    )
    return (
        s.select(
            F.expr(
                """stack(8,
              'count', CAST(n AS DOUBLE), CAST(n AS DOUBLE), 1,
              'mean', sq / n, se / n, 2,
              'std', SQRT((sqq - sq*sq/n) / (n-1)), SQRT((see - se*se/n) / (n-1)), 3,
              'min', min_q, min_e, 4,
              '25%', ROUND(pq0, 6), ROUND(pe0, 6), 5,
              '50%', ROUND(pq1, 6), ROUND(pe1, 6), 6,
              '75%', ROUND(pq2, 6), ROUND(pe2, 6), 7,
              'max', max_q, max_e, 8)
              AS (statistic, l_quantity, l_extendedprice, ord)"""
            )
        )
        .orderBy("ord")
        .drop("ord")
    )


@register(
    "frame_factorize",
    sql="""
    WITH u AS (SELECT DISTINCT c_mktsegment FROM customer),
    codes AS (SELECT c_mktsegment,
                     CAST(DENSE_RANK() OVER (ORDER BY c_mktsegment) - 1 AS BIGINT) AS code
              FROM u)
    SELECT c.c_custkey, c.c_mktsegment, codes.code
    FROM customer c JOIN codes USING (c_mktsegment)
    ORDER BY c.c_custkey
    """,
)
def frame_factorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """factorize/categorical dense codes (cudf Series.factorize,
    core/algorithms.py): stable value→code mapping via dense_rank over
    the DISTINCT values (|categories| rows — tiny), broadcast-joined
    back.  Ranking the distinct frame instead of the full table keeps
    the window single-pass over categories, not rows."""
    customer = load_table(spark, sf_dir, "customer")
    from pyspark.sql import Window

    u = customer.select("c_mktsegment").distinct()
    codes = u.withColumn(
        "code",
        (F.dense_rank().over(Window.orderBy("c_mktsegment")) - 1).cast("long"),
    )
    return (
        customer.join(F.broadcast(codes), "c_mktsegment")
        .select("c_custkey", "c_mktsegment", "code")
        .orderBy("c_custkey")
    )


@register(
    "frame_duplicated_cumcount",
    sql="""
    SELECT o_orderkey, o_custkey, o_orderpriority,
           CAST(ROW_NUMBER() OVER w - 1 AS BIGINT) AS cumcount,
           (ROW_NUMBER() OVER w > 1) AS duplicated
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey, o_orderpriority ORDER BY o_orderkey)
    ORDER BY o_orderkey
    """,
)
def frame_duplicated_cumcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """duplicated(keep='first') + groupby.cumcount (cudf
    dataframe.py/indexed_frame duplicated; groupby cumcount): one
    (key)-partitioned window yields both — occurrence index and the
    duplicate flag for every later occurrence."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey", "o_orderpriority").orderBy("o_orderkey")
    rn = F.row_number().over(w)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderpriority",
        (rn - 1).cast("long").alias("cumcount"),
        (rn > 1).alias("duplicated"),
    ).orderBy("o_orderkey")


@register(
    "frame_query_expr",
    sql="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    WHERE (o_totalprice > 150000 AND o_orderpriority != '5-LOW')
       OR (NOT o_orderstatus = 'F' AND o_totalprice < 1000)
    ORDER BY o_orderkey
    """,
)
def frame_query_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas-dialect DataFrame.query surface (cudf dataframe.py:4586 —
    the mini-expression entry the reference parses to its own GPU AST;
    §3.2): the &/|/~ boolean expression translates to a Spark SQL filter
    and from there into the SAME Catalyst predicate any native filter
    gets — pushdown included, no interpreter."""
    orders = load_table(spark, sf_dir, "orders")
    out = FR.query_expr(
        orders,
        "(o_totalprice > 150000 & o_orderpriority != '5-LOW')"
        " | (~(o_orderstatus == 'F') & o_totalprice < 1000)",
    )
    return out.select("o_orderkey", "o_totalprice", "o_orderpriority").orderBy("o_orderkey")


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _corr_matrix_sql() -> str:
    dec = "DECIMAL(12,2)"
    sums, selects = ["COUNT(*) AS n"], []
    for i, a in enumerate(_CORR_COLS):
        sums.append(sql_dec2dbl(f"SUM(CAST({a} AS {dec}))") + f" AS s{i}")
        sums.append(
            sql_dec2dbl(f"SUM(CAST({a} AS {dec}) * CAST({a} AS {dec}))")
            + f" AS s{i}{i}"
        )
        for j in range(i + 1, len(_CORR_COLS)):
            b = _CORR_COLS[j]
            sums.append(
                sql_dec2dbl(f"SUM(CAST({a} AS {dec}) * CAST({b} AS {dec}))")
                + f" AS s{i}{j}"
            )
    for i, a in enumerate(_CORR_COLS):
        for j in range(i + 1, len(_CORR_COLS)):
            b = _CORR_COLS[j]
            selects.append(
                f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
                f"(n*s{i}{j} - s{i}*s{j}) / SQRT((n*s{i}{i} - s{i}*s{i}) * (n*s{j}{j} - s{j}*s{j})) AS corr FROM s"
            )
    return (
        "WITH s AS (SELECT " + ", ".join(sums) + " FROM lineitem)\n"
        + " UNION ALL ".join(selects)
        + " ORDER BY col_a, col_b"
    )


@register("frame_corr_matrix", sql=_corr_matrix_sql())
def frame_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix (pandas/cudf DataFrame.corr)
    over four lineitem measures — operators/stats.corr_matrix: one
    fixed-buffer pass of exact decimal co-moments, closed in double
    identically on both engines (see agg_var_corr)."""
    from my_cudf_spark.operators.stats import corr_matrix

    li = load_table(spark, sf_dir, "lineitem")
    return corr_matrix(li, _CORR_COLS).orderBy("col_a", "col_b")


@register(
    "frame_quantile_normalize",
    sql="""
    SELECT o_orderkey, o_totalprice,
           ROUND(PERCENT_RANK() OVER (ORDER BY o_totalprice), 9) AS pct_rank
    FROM orders ORDER BY o_orderkey
    """,
)
def frame_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization (operators/stats.quantile_normalize):
    percent-rank of o_totalprice via distinct-value counts + distributed
    rank cumsum + a value hash-join back — the scale-safe form of
    ``percent_rank() OVER (ORDER BY col)``, which plans every row into ONE
    task.  cum/(n-1) reproduces SQL's ties-share-min-rank semantics
    bit-for-bit (rounded at 9dp only to absorb division association)."""
    from my_cudf_spark.operators.stats import quantile_normalize

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    out = quantile_normalize(orders, "o_totalprice")
    return out.select(
        "o_orderkey", "o_totalprice", F.round("pct_rank", 9).alias("pct_rank")
    ).orderBy("o_orderkey")


@register(
    "frame_pareto_frontier",
    sql=r"""
    WITH t AS (SELECT doc_id, source,
                      CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS nt,
                      ROUND(CASE WHEN length(text) > 0 THEN
                        (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)/length(text))*0.6
                        + (CASE WHEN (CAST(length(text) - length(regexp_replace(text, '[^ ]', '', 'g')) AS DOUBLE)
                                      /(length(regexp_replace(text, '[^ ]', '', 'g'))+1)) BETWEEN 3 AND 10
                           THEN 1.0 ELSE 0.0 END)*0.3
                        + LEAST(CAST(length(text) AS DOUBLE)/100.0, 1.0)*0.1
                      ELSE 0.0 END, 6) AS q
               FROM documents WHERE text IS NOT NULL),
    g AS (SELECT source, q, MAX(nt) AS gmax FROM t GROUP BY source, q),
    p AS (SELECT source, q, gmax,
                 MAX(gmax) OVER (PARTITION BY source ORDER BY q DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
          FROM g)
    SELECT t.source, t.doc_id, t.q, t.nt
    FROM t JOIN p ON t.source = p.source AND t.q = p.q
    WHERE t.nt = p.gmax AND (p.prev_max IS NULL OR t.nt > p.prev_max)
    ORDER BY t.source, t.q DESC, t.doc_id
    """,
)
def frame_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto frontier (skyline) per source over (quality, length):
    a document survives iff no other same-source document is ≥ in both
    dimensions and > in one — the data-selection frontier shape (pick
    the quality/length trade-off curve, not a single threshold).  The
    classic quadratic NOT EXISTS collapses to ONE window pass: group to
    per-(source, q) max length, running max over strictly-higher-q
    groups (ROWS … 1 PRECEDING over the DISTINCT-q frame), survivor ⇔
    length equals its q-group max and beats every higher-q max.  The
    window runs over distinct (source, q) rows — corpus-sized work is
    two hash aggregations and a join."""
    from my_cudf_spark.functions import text as T
    from pyspark.sql import Window

    t = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull()).select(
        "doc_id",
        "source",
        F.size(F.split(F.trim(F.col("text")), " ")).cast("long").alias("nt"),
        T.quality_score("text").alias("q"),
    )
    g = t.groupBy("source", "q").agg(F.max("nt").alias("gmax"))
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("q").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    p = g.withColumn("prev_max", F.max("gmax").over(w))
    return (
        t.join(p, ["source", "q"])
        .filter(
            (F.col("nt") == F.col("gmax"))
            & (F.col("prev_max").isNull() | (F.col("nt") > F.col("prev_max")))
        )
        .select("source", "doc_id", "q", "nt")
        .orderBy("source", F.col("q").desc(), "doc_id")
    )
