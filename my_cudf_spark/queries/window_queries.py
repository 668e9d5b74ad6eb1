"""Window / rolling / resample / quantile correctness queries
(SURVEY.md §2.4-2.6; reference rolling.hpp, groupby.hpp:243/299/373,
quantiles.hpp, sorting.hpp:203).

Float determinism: window sums go through decimal casts (DuckDB uses segment
trees for window aggregation → different summation order than Spark's
running accumulation); variance/correlation are computed from exact decimal
co-moment sums with the final formula in double (identical operands →
identical doubles). EWMA is intrinsically floating — rounded to 6 decimals
on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from my_cudf_spark.functions.stable import DEC, PRICE, sql_dec2dbl
from my_cudf_spark.operators import windows as W
from my_cudf_spark.queries import register
from my_cudf_spark.sources import load_table

DAY_US = 86_400_000_000


@register(
    "window_rank",
    sql="""
    SELECT o_orderkey, o_custkey,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC)
    ORDER BY o_orderkey
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK/DENSE_RANK/ROW_NUMBER aggregation kinds (aggregation.hpp:87-123,
    sorting.hpp:203)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    wrn = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.row_number().over(wrn).cast("long").alias("rn"),
    ).orderBy("o_orderkey")


@register(
    "window_rank_avg",
    sql="""
    SELECT c_custkey,
           RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal)
             + (COUNT(*) OVER (PARTITION BY c_mktsegment, c_acctbal) - 1) / 2.0 AS avg_rank
    FROM customer ORDER BY c_custkey
    """,
)
def window_rank_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank method='average' (sorting.hpp:203 AVERAGE) — composite of rank +
    tie-group size (SURVEY.md §7.3)."""
    customer = load_table(spark, sf_dir, "customer")
    out = W.rank_avg(customer, "avg_rank", order_by=["c_acctbal"], partition_by=["c_mktsegment"])
    return out.select("c_custkey", "avg_rank").orderBy("c_custkey")


@register(
    "window_lag_cumsum",
    sql=f"""
    SELECT event_id, user_id,
           LAG(value) OVER w AS prev_value,
           value - LAG(value) OVER w AS diff_value,
           {sql_dec2dbl(f'SUM(CAST(value AS {DEC})) OVER (PARTITION BY user_id ORDER BY event_id ROWS UNBOUNDED PRECEDING)')} AS cum_value,
           LEAD(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    ORDER BY event_id
    """,
)
def window_lag_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAD/LAG + grouped scan (groupby::scan/shift, groupby.hpp:243/299;
    diff/pct_change, cudf groupby.py)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    return ev.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        (F.col("value") - F.lag("value").over(w)).alias("diff_value"),
        F.sum(F.col("value").cast(DEC)).over(cum).cast("double").alias("cum_value"),
        F.lead("event_type").over(w).alias("next_type"),
    ).orderBy("event_id")


@register(
    "window_rolling_rows",
    sql=f"""
    SELECT o_orderkey,
           CASE WHEN COUNT(o_totalprice) OVER w >= 3
                THEN {sql_dec2dbl(f'SUM(CAST(o_totalprice AS {DEC})) OVER w')} END AS roll_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    ORDER BY o_orderkey
    """,
)
def window_rolling_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-frame grouped rolling with min_periods (rolling.hpp:172/346;
    Rolling min_periods, cudf rolling.py:49). Ordering key
    (o_orderdate, o_orderkey) is unique — ROWS frames with tied orderings
    are engine-dependent (SURVEY.md §7.4.1)."""
    orders = load_table(spark, sf_dir, "orders")
    out = W.grouped_rolling(
        orders,
        F.sum(F.col("o_totalprice").cast(DEC)),
        "roll_price",
        keys=["o_custkey"],
        order_by=["o_orderdate", "o_orderkey"],
        preceding=4,
        min_periods=3,
        count_col="o_totalprice",
    )
    return out.select("o_orderkey", F.col("roll_price").cast("double").alias("roll_price")).orderBy("o_orderkey")


@register(
    "window_rolling_range",
    sql=f"""
    SELECT event_id,
           {sql_dec2dbl(f'SUM(CAST(value AS {DEC})) OVER (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) RANGE BETWEEN {7 * DAY_US} PRECEDING AND CURRENT ROW)')} AS weekly_value
    FROM events ORDER BY event_id
    """,
)
def window_rolling_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range rolling window (grouped_range_rolling_window,
    rolling.hpp:539): 7-day trailing sum per user."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "__us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    out = W.range_rolling(
        ev,
        F.sum(F.col("value").cast(DEC)),
        "weekly_value",
        order_col="__us",
        preceding=7 * DAY_US,
        partition_by=["user_id"],
    )
    return out.select(
        "event_id", F.col("weekly_value").cast("double").alias("weekly_value")
    ).orderBy("event_id")


@register(
    "window_ffill",
    sql="""
    SELECT event_id, user_id,
           LAST_VALUE(CASE WHEN event_type <> 'error' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY event_id ROWS UNBOUNDED PRECEDING) AS value_filled
    FROM events ORDER BY event_id
    """,
)
def window_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped ffill of nulls (groupby replace_nulls ffill, groupby.hpp:373).
    The fixture has no nulls, so 'error' rows are masked to null first —
    deterministic on both sides."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "value", F.when(F.col("event_type") != "error", F.col("value"))
    )
    out = W.ffill(ev, ["value"], order_by=["event_id"], partition_by=["user_id"])
    return out.select("event_id", "user_id", F.col("value").alias("value_filled")).orderBy("event_id")


@register(
    "window_interpolate",
    sql="""
    WITH ev AS (
      SELECT event_id, user_id,
             CASE WHEN event_type <> 'error' THEN value END AS v
      FROM events),
    marked AS (
      SELECT event_id, user_id, v,
             CAST(event_id AS DOUBLE) AS x,
             LAST_VALUE(v IGNORE NULLS) OVER wb AS pv,
             LAST_VALUE(CASE WHEN v IS NOT NULL THEN CAST(event_id AS DOUBLE) END IGNORE NULLS) OVER wb AS px,
             FIRST_VALUE(v IGNORE NULLS) OVER wf AS nv,
             FIRST_VALUE(CASE WHEN v IS NOT NULL THEN CAST(event_id AS DOUBLE) END IGNORE NULLS) OVER wf AS nx
      FROM ev
      WINDOW wb AS (PARTITION BY user_id ORDER BY event_id ROWS UNBOUNDED PRECEDING),
             wf AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT event_id,
           CASE WHEN v IS NOT NULL THEN v
                WHEN pv IS NULL THEN nv
                WHEN nv IS NULL THEN pv
                ELSE pv + (nv - pv) * (x - px) / (nx - px) END AS value_interp
    FROM marked ORDER BY event_id
    """,
)
def window_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of nulls (cudf ``interpolate``, SURVEY.md §7.4.5),
    masking 'error' rows to null first. Same double formula both sides."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "v", F.when(F.col("event_type") != "error", F.col("value"))
    )
    out = W.interpolate_linear(ev, "v", "value_interp", order_col="event_id", partition_by=["user_id"])
    return out.select("event_id", "value_interp").orderBy("event_id")


@register(
    "window_ewma",
    sql="""
    WITH seq AS (
      SELECT user_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS i,
             event_id
      FROM events)
    SELECT event_id,
           ROUND(SUM(value * POWER(1/0.7, i)) OVER cum * POWER(0.7, i)
                 / (SUM(POWER(1/0.7, i)) OVER cum * POWER(0.7, i)), 6) AS ewma_value
    FROM seq
    WINDOW cum AS (PARTITION BY user_id ORDER BY i ROWS UNBOUNDED PRECEDING)
    ORDER BY event_id
    """,
)
def window_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA α=0.3 adjust=True (Series.ewm, indexed_frame.py:1844) as weighted
    prefix sums — no UDF. Rounded to 6dp on both sides (intrinsically
    floating; see module docstring)."""
    ev = load_table(spark, sf_dir, "events")
    out = W.ewma(ev, "value", alpha=0.3, name="ewma_value", order_by=["event_id"], partition_by=["user_id"])
    return out.select("event_id", F.round("ewma_value", 6).alias("ewma_value")).orderBy("event_id")


@register(
    "resample_daily",
    sql=f"""
    SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS bin_start,
           COUNT(*) AS n_events,
           {sql_dec2dbl(f'SUM(CAST(value AS {DEC}))')} AS sum_value
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def resample_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """resample → time-bin groupBy (cudf resample.py:37-90 → Spark
    ``window()``); identical code path on streams."""
    ev = load_table(spark, sf_dir, "events")
    out = W.resample(
        ev,
        "ts",
        "1 day",
        aggs=[
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        ],
    )
    return out.select("bin_start", "n_events", "sum_value").orderBy("bin_start")


@register(
    "agg_quantiles",
    sql="""
    SELECT l_returnflag,
           ROUND(MEDIAN(l_extendedprice), 6) AS med_price,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.25), 6) AS p25,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.75), 6) AS p75
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEDIAN/QUANTILE aggregation kinds (aggregation.hpp:87-123,
    quantiles.hpp:130 linear interpolation) → exact percentile().

    One ``percentile(col, array(...))`` agg, not three separate ones: each
    separate exact-percentile agg serializes its OWN copy of every group's
    values through the partial→final shuffle (measured 3× the bytes, 3.3×
    the wall time at sf0.1); the array form shares a single buffer."""
    li = load_table(spark, sf_dir, "lineitem")
    qs = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, array(0.5D, 0.25D, 0.75D))").alias("q")
    )
    return qs.select(
        "l_returnflag",
        F.round(F.element_at("q", 1), 6).alias("med_price"),
        F.round(F.element_at("q", 2), 6).alias("p25"),
        F.round(F.element_at("q", 3), 6).alias("p75"),
    ).orderBy("l_returnflag")


@register(
    "agg_var_corr",
    sql=f"""
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             {sql_dec2dbl(f'SUM(CAST(l_quantity AS {PRICE}))')} AS sq,
             {sql_dec2dbl(f'SUM(CAST(l_quantity AS {PRICE}) * CAST(l_quantity AS {PRICE}))')} AS sqq,
             {sql_dec2dbl(f'SUM(CAST(l_extendedprice AS {PRICE}))')} AS se,
             {sql_dec2dbl(f'SUM(CAST(l_extendedprice AS {PRICE}) * CAST(l_extendedprice AS {PRICE}))')} AS see,
             {sql_dec2dbl(f'SUM(CAST(l_quantity AS {PRICE}) * CAST(l_extendedprice AS {PRICE}))')} AS sqe
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag,
           (sqq - sq*sq/n) / (n-1) AS var_qty,
           SQRT((sqq - sq*sq/n) / (n-1)) AS std_qty,
           (n*sqe - sq*se) / SQRT((n*sqq - sq*sq) * (n*see - se*se)) AS corr_qty_price
    FROM s ORDER BY l_returnflag
    """,
)
def agg_var_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANCE/STD/CORRELATION kinds (aggregation.hpp:87-123, :255) from
    exact decimal co-moments; the closing formula runs in double on
    identical operands both sides — bit-stable without rounding."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast(PRICE)
    e = F.col("l_extendedprice").cast(PRICE)
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).cast("double").alias("sq"),
        F.sum(q * q).cast("double").alias("sqq"),
        F.sum(e).cast("double").alias("se"),
        F.sum(e * e).cast("double").alias("see"),
        F.sum(q * e).cast("double").alias("sqe"),
    )
    n, sq, sqq, se, see, sqe = (F.col(c) for c in ("n", "sq", "sqq", "se", "see", "sqe"))
    return s.select(
        "l_returnflag",
        ((sqq - sq * sq / n) / (n - 1)).alias("var_qty"),
        F.sqrt((sqq - sq * sq / n) / (n - 1)).alias("std_qty"),
        ((n * sqe - sq * se) / F.sqrt((n * sqq - sq * sq) * (n * see - se * se))).alias("corr_qty_price"),
    ).orderBy("l_returnflag")


@register(
    "window_diff_pct",
    sql="""
    SELECT event_id, user_id, value,
           value - LAG(value) OVER w AS value_diff,
           CASE WHEN LAG(value) OVER w = 0 AND value > 0 THEN 'infinity'::DOUBLE
                WHEN LAG(value) OVER w = 0 AND value < 0 THEN '-infinity'::DOUBLE
                WHEN LAG(value) OVER w = 0 THEN 'nan'::DOUBLE
                ELSE value / (LAG(value) OVER w) - 1.0 END AS value_pct_change
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    ORDER BY event_id
    """,
)
def window_diff_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """diff + pct_change (cudf dataframe.py:3531/:7806) per user along
    event time: one (user_id)-partitioned window shuffle computes both;
    same-double subtraction/division is bit-stable across engines."""
    ev = load_table(spark, sf_dir, "events")
    out = W.diff(ev, "value", ["ts", "event_id"], ["user_id"], name="value_diff")
    out = W.pct_change(
        out, "value", ["ts", "event_id"], ["user_id"], name="value_pct_change"
    )
    return out.select(
        "event_id", "user_id", "value", "value_diff", "value_pct_change"
    ).orderBy("event_id")


@register(
    "window_ntile_qcut",
    sql="""
    SELECT o_orderkey, o_totalprice,
           NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS price_quartile,
           NTILE(10) OVER (PARTITION BY o_orderpriority
                           ORDER BY o_totalprice, o_orderkey) AS decile_in_priority
    FROM orders ORDER BY o_orderkey
    """,
)
def window_ntile_qcut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE — the qcut/equal-frequency binning member of the rank family
    (aggregation.hpp rank kinds; pandas/cudf qcut equivalent) — WITHOUT
    the single-task global window ``ntile() OVER (ORDER BY ...)`` plans
    to (the suite's last remaining global-window shape, retired round 4).
    Both buckets ride the distributed row index
    (``frame.with_row_index`` → deterministic-bucket global cumsum) plus
    the closed-form ``windows.ntile_from_index`` arithmetic.  The grouped
    decile encodes (priority, price) into one monotone numeric leading
    key — priority digit × 10M + price, exact in double — so its index
    ALSO stays on the bucketed cumsum path AND avoids the
    5-giant-partition skew a ``PARTITION BY priority`` window has at
    scale; per-group base/size broadcast back from a 5-row aggregate."""
    from my_cudf_spark.operators import frame as FR
    from my_cudf_spark.operators.windows import ntile_from_index

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    idx = FR.with_row_index(orders, "__r", order_by=["o_totalprice", "o_orderkey"])
    # Spacing guard: the combined key is only monotone while every price
    # fits strictly under the 10M spacing — a price at/over it would bleed
    # into the next priority's range and silently mis-bucket.  Safe on
    # TPC-H (max o_totalprice ≈ 530k), enforced per-row so a future
    # fixture fails loudly instead of wrongly.
    spacing = 10_000_000
    combined = (
        F.when(
            F.col("o_totalprice") >= spacing,
            F.raise_error(
                f"window_ntile_qcut: o_totalprice >= {spacing} breaks the "
                "combined priority+price decile key; raise the spacing"
            ),
        ).otherwise(
            F.substring("o_orderpriority", 1, 1).cast("long") * spacing
            + F.col("o_totalprice")
        )
    ).alias("__pk")
    idx = FR.with_row_index(
        idx.withColumn("__pk", combined),
        "__r2",
        order_by=["__pk", "o_orderkey"],
    )
    tot = idx.agg(F.count(F.lit(1)).alias("__n"))
    grp = idx.groupBy("o_orderpriority").agg(
        F.min("__r2").alias("__base"), F.count(F.lit(1)).alias("__gn")
    )
    return (
        idx.join(F.broadcast(tot), F.lit(True), "left")
        .join(F.broadcast(grp), "o_orderpriority")
        .select(
            "o_orderkey",
            "o_totalprice",
            ntile_from_index(F.col("__r"), F.col("__n"), 4).alias("price_quartile"),
            ntile_from_index(
                F.col("__r2") - F.col("__base"), F.col("__gn"), 10
            ).alias("decile_in_priority"),
        )
        .orderBy("o_orderkey")
    )


ROLL_DEC = "DECIMAL(27,6)"
ROLLSTD_SQL = f"""
WITH w AS (
  SELECT l_orderkey, l_linenumber,
         COUNT(*) OVER win AS n,
         {sql_dec2dbl(f'SUM(CAST(l_quantity AS {ROLL_DEC})) OVER win')} AS sq,
         {sql_dec2dbl(f'SUM(CAST(l_quantity AS {ROLL_DEC}) * CAST(l_quantity AS {ROLL_DEC})) OVER win')} AS sqq,
         {sql_dec2dbl(f'SUM(CAST(l_extendedprice AS {ROLL_DEC})) OVER win')} AS se,
         {sql_dec2dbl(f'SUM(CAST(l_extendedprice AS {ROLL_DEC}) * CAST(l_extendedprice AS {ROLL_DEC})) OVER win')} AS see,
         {sql_dec2dbl(f'SUM(CAST(l_quantity AS {ROLL_DEC}) * CAST(l_extendedprice AS {ROLL_DEC})) OVER win')} AS sqe
  FROM lineitem
  WHERE l_orderkey <= 20000
  WINDOW win AS (PARTITION BY l_returnflag
                 ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
SELECT l_orderkey, l_linenumber,
       CASE WHEN n >= 7 THEN ROUND(SQRT((sqq - sq*sq/n) / (n-1)), 6) END AS roll_std_qty,
       CASE WHEN n >= 7 THEN ROUND((sqe - sq*se/n)
              / SQRT((sqq - sq*sq/n) * (see - se*se/n)), 6) END AS roll_corr
FROM w ORDER BY l_orderkey, l_linenumber
"""


@register("window_rolling_std", sql=ROLLSTD_SQL)
def window_rolling_std(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling std + rolling corr (pandas/cudf Rolling.std/.corr — the
    co-moment members of the Rolling surface; rolling.hpp only ships
    sum/min/max/count/mean, so this is the composed-builtin route per
    SURVEY §7.3): one 7-row window carries SIX exact decimal co-moment
    sums and the var/corr formulas close in double — bit-stable
    cross-engine because every float op happens on exactly-represented
    decimal sums in the same order as the oracle (the agg_var_corr
    recipe, applied per window frame).  min_periods=7 → NULL before the
    frame fills, pandas semantics.  The frame order extends (orderkey,
    linenumber) — NOT unique in these fixtures — with the two value
    columns: any remaining tie is between rows identical in every
    window input, so frame multisets (and therefore every sum) are
    order-invariant."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 20000)
    dq = F.col("l_quantity").cast(ROLL_DEC.lower())
    de = F.col("l_extendedprice").cast(ROLL_DEC.lower())
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .rowsBetween(-6, 0)
    )
    n = F.count(F.lit(1)).over(w)
    sq = F.sum(dq).over(w).cast("double")
    sqq = F.sum(dq * dq).over(w).cast("double")
    se = F.sum(de).over(w).cast("double")
    see = F.sum(de * de).over(w).cast("double")
    sqe = F.sum(dq * de).over(w).cast("double")
    nn = n.cast("double")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.when(
                n >= 7, F.round(F.sqrt((sqq - sq * sq / nn) / (nn - 1)), 6)
            ).alias("roll_std_qty"),
            F.when(
                n >= 7,
                F.round(
                    (sqe - sq * se / nn)
                    / F.sqrt((sqq - sq * sq / nn) * (see - se * se / nn)),
                    6,
                ),
            ).alias("roll_corr"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "window_rolling_median",
    sql="""
    SELECT user_id, event_id, CAST(value AS DOUBLE) AS value,
           CASE WHEN COUNT(value) OVER w = 7 THEN median(value) OVER w END AS med7
    FROM events WHERE value IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-row median per user (pandas/cudf Rolling.median — the
    robust member of the rolling family next to window_rolling_std),
    min_periods = window: an odd full window's median is the exact middle
    order statistic, so ``element_at(array_sort(collect_list), 4)`` over
    the frame matches DuckDB's windowed ``median`` with no interpolation
    ambiguity.  The per-frame sort is over ≤ 7 elements — bounded work
    per row, one Exchange on the partition key."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    med7 = F.when(
        F.count("value").over(w) == 7,
        F.element_at(F.array_sort(F.collect_list(F.col("value").cast("double")).over(w)), 4),
    )
    return ev.select(
        "user_id",
        "event_id",
        F.col("value").cast("double").alias("value"),
        med7.alias("med7"),
    ).orderBy("user_id", "event_id")
