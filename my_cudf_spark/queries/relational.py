"""Relational-operator correctness queries (SURVEY.md §2.1, §2.3, §2.6, §2.7).

One query per operator family: semi/anti/cross/full joins, theta & mixed
joins (ConditionalJoin/mixed_join, join.hpp:579-1034), as-of join (absent in
the reference, SURVEY.md §2.3), distinct keep-first/none
(stream_compaction.hpp:286-340), sort+slice (ir.py:1606/1687), union &
intersect/except (§2.7), unique-consecutive (stream_compaction.hpp:258).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from my_cudf_spark.operators import frame as fr
from my_cudf_spark.operators import joins as j
from my_cudf_spark.queries import register
from my_cudf_spark.sources import load_table


@register(
    "join_semi",
    sql="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
                  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
    ORDER BY c_custkey
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi_join (join.hpp:213)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    return (
        j.equi_join(customer, orders.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_anti",
    sql="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti_join (join.hpp:246)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        j.equi_join(customer, orders.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_mixed",
    sql="""
    SELECT o_orderkey, o_totalprice, c_acctbal
    FROM orders o JOIN customer c
      ON o.o_custkey = c.c_custkey AND o.o_totalprice > 50 * c.c_acctbal
    ORDER BY o_orderkey
    """,
)
def join_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi keys + residual predicate in one hash join (mixed_inner_join,
    join.hpp:808). Spark evaluates the residual during the hash probe."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "o_custkey")
    out = j.mixed_join(
        orders,
        broadcast(customer),
        ["o_custkey"],
        residual=F.col("o_totalprice") > 50 * F.col("c_acctbal"),
    )
    return out.select("o_orderkey", "o_totalprice", "c_acctbal").orderBy("o_orderkey")


@register(
    "join_theta",
    sql="""
    SELECT n.n_name, r.r_name
    FROM nation n JOIN region r ON n.n_regionkey <> r.r_regionkey
    ORDER BY n_name, r_name
    """,
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure theta join on a non-equi predicate (conditional_inner_join,
    join.hpp:579) → BroadcastNestedLoopJoin."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        j.theta_join(nation, broadcast(region), F.col("n_regionkey") != F.col("r_regionkey"))
        .select("n_name", "r_name")
        .orderBy("n_name", "r_name")
    )


@register(
    "join_full",
    sql="""
    WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS cust_cnt FROM customer GROUP BY 1),
         s AS (SELECT s_nationkey AS nk, COUNT(*) AS supp_cnt FROM supplier GROUP BY 1)
    SELECT COALESCE(c.nk, s.nk) AS nk, cust_cnt, supp_cnt
    FROM c FULL JOIN s ON c.nk = s.nk
    ORDER BY nk
    """,
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """full_join (join.hpp:182) with key coalescing (Join IR coalesce
    option, ir.py:1230-1246)."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    c = customer.groupBy(F.col("c_nationkey").alias("nk")).agg(F.count(F.lit(1)).alias("cust_cnt"))
    s = supplier.groupBy(F.col("s_nationkey").alias("nk")).agg(F.count(F.lit(1)).alias("supp_cnt"))
    return (
        c.join(s, "nk", "full")  # Spark coalesces the USING column natively
        .select("nk", "cust_cnt", "supp_cnt")
        .orderBy("nk")
    )


@register(
    "join_cross",
    sql="""
    SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cross_join (join.hpp:276)."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return region.crossJoin(broadcast(nation)).select("r_name", "n_name").orderBy("r_name", "n_name")


@register(
    "join_asof",
    sql="""
    WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
                FROM events),
         p AS (SELECT * FROM ev WHERE event_type = 'purchase'),
         s AS (SELECT * FROM ev WHERE event_type <> 'purchase')
    SELECT p.event_id, s.event_id AS prev_event_id, s.value AS prev_value
    FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts
    ORDER BY p.event_id
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (not in the reference — SURVEY.md §2.3 'Absent'): for each
    purchase, the user's most recent non-purchase event at-or-before it.
    Oracle: DuckDB's native ASOF JOIN."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("event_id", "ts", "user_id")
    s = ev.filter(F.col("event_type") != "purchase").select(
        "ts", "user_id", F.col("event_id").alias("prev_event_id"), F.col("value").alias("prev_value")
    )
    out = j.asof_join(p, s, on="ts", by=["user_id"], direction="backward")
    return out.select("event_id", "prev_event_id", "prev_value").orderBy("event_id")


@register(
    "join_asof_nearest",
    sql="""
    WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
                FROM events),
         p AS (SELECT * FROM ev WHERE event_type = 'purchase'),
         s AS (SELECT * FROM ev WHERE event_type <> 'purchase'),
         best AS (
           SELECT p.event_id,
                  s.event_id AS near_event_id, s.value AS near_value,
                  ROW_NUMBER() OVER (
                    PARTITION BY p.event_id
                    ORDER BY abs(epoch_us(p.ts) - epoch_us(s.ts)),
                             CASE WHEN s.ts <= p.ts THEN 0 ELSE 1 END) AS rn
           FROM p JOIN s USING (user_id)
           WHERE abs(epoch_us(p.ts) - epoch_us(s.ts)) <= CAST(3600 AS BIGINT) * 1000000
         )
    SELECT p.event_id, b.near_event_id, b.near_value
    FROM p LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (event_id)
    ORDER BY p.event_id
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join direction='nearest' with tolerance (cudf/pandas
    ``merge_asof`` surface, python/cudf/cudf/core/reshape.py): for each
    purchase, the CLOSEST non-purchase event of the same user within one
    hour, ties to the earlier side; purchases with no event inside the
    window keep NULL payload.  Distances compare in exact integer µs —
    fixtures carry sub-second timestamps, so second-truncated arithmetic
    would mis-rank near-ties (the oracle's epoch_us agrees bit-for-bit).

    Scale: same shape as join_asof — one hash-partition exchange on
    user_id; 'nearest' adds a second sort (forward pass) over that same
    exchange, never a second shuffle.  The oracle's all-pairs join is
    oracle-only (per-user pair expansion; fine at fixture scale)."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("event_id", "ts", "user_id")
    s = ev.filter(F.col("event_type") != "purchase").select(
        "ts", "user_id", F.col("event_id").alias("near_event_id"), F.col("value").alias("near_value")
    )
    out = j.asof_join(p, s, on="ts", by=["user_id"], direction="nearest", tolerance=3600)
    return out.select("event_id", "near_event_id", "near_value").orderBy("event_id")


@register(
    "join_pit_multi",
    sql="""
    WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
                FROM events),
         p AS (SELECT event_id, ts, user_id FROM ev WHERE event_type = 'purchase'),
         v AS (SELECT user_id, ts, value FROM ev WHERE event_type = 'view'),
         c AS (SELECT user_id, ts, value,
                      COUNT(*) OVER (PARTITION BY user_id ORDER BY ts) AS n
               FROM ev WHERE event_type = 'click'),
         s AS (SELECT user_id, ts,
                      COUNT(*) OVER (PARTITION BY user_id ORDER BY ts) AS n
               FROM ev WHERE event_type = 'signup')
    SELECT p.event_id,
           v.value AS view_value,
           c.value AS click_value,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n_clicks,
           CAST(COALESCE(s.n, 0) AS BIGINT) AS n_signups
    FROM p
    ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
    ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts
    ORDER BY p.event_id
    """,
)
def join_pit_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-feature point-in-time join (operators/joins.pit_join) — the
    feature-store training-data shape: for every purchase, the user's
    latest view value, latest click value, and RUNNING click/signup
    counts, all as of the purchase timestamp.  Three feature frames (one
    a windowed cumulative-count derivation) resolve in ONE union + ONE
    window pass — a single hash Exchange on user_id regardless of feature
    count, where chained as-of joins would re-shuffle the spine per
    feature.  Oracle: three chained DuckDB ASOF LEFT JOINs."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("event_id", "ts", "user_id")
    v = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", "ts", "value")
        .withColumn("n", F.count(F.lit(1)).over(wcum))
    )
    s = (
        ev.filter(F.col("event_type") == "signup")
        .select("user_id", "ts")
        .withColumn("n", F.count(F.lit(1)).over(wcum))
    )
    out = j.pit_join(p, {"view": v, "click": c, "signup": s}, on="ts", by=["user_id"])
    return out.select(
        "event_id",
        F.col("view_value"),
        F.col("click_value"),
        F.coalesce(F.col("click_n"), F.lit(0)).cast("long").alias("n_clicks"),
        F.coalesce(F.col("signup_n"), F.lit(0)).cast("long").alias("n_signups"),
    ).orderBy("event_id")


@register(
    "distinct_keep_first",
    sql="""
    SELECT o_custkey, o_orderkey, o_orderdate FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders) WHERE rn = 1
    ORDER BY o_custkey
    """,
)
def distinct_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct keep='first' under an explicit order (ir.py:1519-1556;
    stable_distinct, stream_compaction.hpp:340)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        fr.distinct(orders, subset=["o_custkey"], keep="first", order_by=["o_orderdate", "o_orderkey"])
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .orderBy("o_custkey")
    )


@register(
    "distinct_keep_none",
    sql="""
    SELECT o_custkey FROM orders GROUP BY o_custkey HAVING COUNT(*) = 1 ORDER BY o_custkey
    """,
)
def distinct_keep_none(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct keep='none' — only singleton keys survive (ir.py:1551-1556)."""
    orders = load_table(spark, sf_dir, "orders")
    return fr.distinct(orders, subset=["o_custkey"], keep="none").select("o_custkey").orderBy("o_custkey")


@register(
    "sort_slice",
    sql="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 5
    """,
)
def sort_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort + Slice(offset, length) (ir.py:1606/1687) — plans as
    TakeOrderedAndProject, not a full sort."""
    orders = load_table(spark, sf_dir, "orders")
    return fr.slice_rows(
        orders.select("o_orderkey", "o_totalprice"),
        offset=5,
        length=20,
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
    )


@register(
    "set_intersect",
    sql="""
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    ORDER BY o_custkey
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-level INTERSECT — absent in cudf, free in Spark (SURVEY.md §2.7)."""
    orders = load_table(spark, sf_dir, "orders")
    y96 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    ).select("o_custkey")
    y97 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    ).select("o_custkey")
    return y96.intersect(y97).orderBy("o_custkey")


@register(
    "set_except",
    sql="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    ORDER BY c_custkey
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-level EXCEPT (SURVEY.md §2.7)."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return customer.exceptAll(orders.distinct()).orderBy("c_custkey")


@register(
    "union_concat",
    sql="""
    SELECT kind, key, name FROM (
      SELECT 'customer' AS kind, c_custkey AS key, c_name AS name FROM customer
      UNION ALL
      SELECT 'supplier' AS kind, s_suppkey AS key, s_name AS name FROM supplier)
    ORDER BY kind, key
    """,
)
def union_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vertical concat (Union ir.py:1943; concatenate.hpp:64)."""
    customer = load_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"), F.col("c_custkey").alias("key"), F.col("c_name").alias("name")
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"), F.col("s_suppkey").alias("key"), F.col("s_name").alias("name")
    )
    return customer.unionByName(supplier).orderBy("kind", "key")


@register(
    "unique_consecutive",
    sql="""
    SELECT event_id, user_id, event_type FROM (
      SELECT event_id, user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_type
      FROM events)
    WHERE prev_type IS NULL OR prev_type <> event_type
    ORDER BY event_id
    """,
)
def unique_consecutive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive dedup (``unique``, stream_compaction.hpp:258), per-user:
    collapse runs of the same event_type along the event sequence."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
    )


@register(
    "join_range",
    sql="""
    WITH o AS (SELECT o_orderkey, o_orderdate,
                      o_orderdate + INTERVAL 10 DAY AS o_end
               FROM orders
               WHERE o_orderpriority = '1-URGENT'
                 AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1995-03-31')
    SELECT o.o_orderkey AS o_orderkey,
           COUNT(*) AS n_ship,
           COUNT(DISTINCT l.l_orderkey) AS n_orders
    FROM o JOIN lineitem l
      ON l.l_shipdate >= o.o_orderdate AND l.l_shipdate < o.o_end
    GROUP BY 1 ORDER BY 1
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join via bin bucketing (operators/joins.range_join):
    shipments falling inside each urgent order's 10-day window, as an
    equi-join on bin id instead of the BNLJ a raw BETWEEN predicate plans
    (guarded by tests/test_plans.py)."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & F.col("o_orderdate").between("1995-01-01", "1995-03-31")
        )
        .select(
            "o_orderkey",
            "o_orderdate",
            (F.col("o_orderdate") + F.expr("INTERVAL 10 DAYS")).alias("o_end"),
        )
    )
    # Static bound implied by the join (intervals span ≤ 1995-04-10): lets
    # the parquet scan skip ~95% of lineitem row groups via PushedFilters —
    # the predicate a user would write; the join condition already implies it.
    points = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate").between("1995-01-01", "1995-04-30"))
        .select("l_orderkey", "l_shipdate")
    )
    joined = j.range_join(
        points, orders, "l_shipdate", "o_orderdate", "o_end",
        # 1-day bins: join parallelism = distinct bins (the fixture's
        # order-date span / width), so day bins give ~90 reducers where
        # week bins gave ~13; each 10-day interval replicates to ~11 bins
        # — replication × parallelism is the range-join tradeoff.
        bin_width=86400, closed="left",
    )
    return (
        joined.groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_ship"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "join_salted_skew",
    sql="""
    SELECT o_orderpriority, COUNT(*) AS n_lines,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE)
             AS sum_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join (operators/joins.py:salted_join): the left side
    gets a random salt bucket and the right side is exploded salt ways,
    spreading any hot key over ``salt`` reducers — the manual fallback
    for skew AQE can't split.  Salting only re-routes rows, so the
    result set is identical to the plain equi-join and the plain-SQL
    oracle applies verbatim."""
    lineitem, orders = (
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
    )
    joined = j.salted_join(
        lineitem.withColumnRenamed("l_orderkey", "k"),
        orders.withColumnRenamed("o_orderkey", "k").select("k", "o_orderpriority"),
        on=["k"],
        how="inner",
        salt=8,
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity").cast("decimal(27,6)")).cast("double")
            .alias("sum_qty"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "join_null_safe",
    sql="""
    WITH l AS (SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg
               FROM customer),
         r AS (SELECT nullif(c_mktsegment, 'BUILDING') AS seg,
                      COUNT(*) AS seg_count
               FROM customer GROUP BY 1)
    SELECT l.c_custkey, COALESCE(l.seg, r.seg) AS seg, r.seg_count
    FROM l JOIN r ON l.seg IS NOT DISTINCT FROM r.seg
    ORDER BY c_custkey
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join IR option nulls_equal (cudf_polars ir.py:1230-1246 →
    eqNullSafe; oracle: IS NOT DISTINCT FROM): NULL keys match each other
    instead of dropping — here BUILDING is nulled out on both sides, so
    its customers only survive via null-safe matching, and the coalesced
    key column mirrors polars' coalesce=True output shape.

    Scale: eqNullSafe keys stay hash-partitionable (null is one ordinary
    bucket), so this plans the same single-shuffle equi-join as the plain
    key — no BNLJ fallback."""
    customer = load_table(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg")
    l = customer.select("c_custkey", seg)
    r = customer.select(seg).groupBy("seg").agg(F.count(F.lit(1)).alias("seg_count"))
    out = j.equi_join(l, r, "seg", nulls_equal=True)
    return out.select("c_custkey", "seg", "seg_count").orderBy("c_custkey")


@register(
    "join_indicator",
    sql="""
    WITH c AS (SELECT DISTINCT c_nationkey AS nk FROM customer
               WHERE c_nationkey % 4 <> 1),
         s AS (SELECT DISTINCT s_nationkey AS nk FROM supplier
               WHERE s_nationkey % 3 <> 0)
    SELECT COALESCE(c.nk, s.nk) AS nk,
           CASE WHEN c.nk IS NOT NULL AND s.nk IS NOT NULL THEN 'both'
                WHEN c.nk IS NOT NULL THEN 'left_only'
                ELSE 'right_only' END AS _merge
    FROM c FULL JOIN s ON c.nk = s.nk
    ORDER BY nk
    """,
)
def join_indicator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """merge(indicator=True) parity (pandas/cudf merge surface — cudf
    core/join): full join tagging each output row left_only / right_only /
    both, the standard reconciliation shape.  The _merge tag derives from
    pre-coalesce key nullness, so it costs nothing beyond the join."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    c = (
        customer.filter(F.col("c_nationkey") % 4 != 1)
        .select(F.col("c_nationkey").alias("nk"))
        .distinct()
    )
    s = (
        supplier.filter(F.col("s_nationkey") % 3 != 0)
        .select(F.col("s_nationkey").alias("nk"))
        .distinct()
    )
    joined = c.withColumn("__l", F.lit(1)).join(
        s.withColumn("__r", F.lit(1)), "nk", "full"
    )
    return joined.select(
        "nk",
        F.when(F.col("__l").isNotNull() & F.col("__r").isNotNull(), "both")
        .when(F.col("__l").isNotNull(), "left_only")
        .otherwise("right_only")
        .alias("_merge"),
    ).orderBy("nk")


@register(
    "join_fuzzy",
    sql="""
    WITH l AS (SELECT DISTINCT lower(p_name) AS a FROM part),
         r AS (SELECT DISTINCT substr(lower(p_name), 1, length(p_name) - 1) || 'x' AS b
               FROM part)
    SELECT a AS left_value, b AS right_value,
           CAST(levenshtein(a, b) AS INT) AS dist
    FROM l, r
    WHERE levenshtein(a, b) <= 1
    ORDER BY left_value, right_value
    """,
)
def join_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string join (joins.fuzzy_join): all cross-side name pairs
    within edit distance 1 — the entity-resolution join of a curation
    pipeline (reconcile near-identical titles/names across sources).  The
    right side is the part vocabulary with its last character perturbed,
    so every name has a planted distance-1 partner plus whatever organic
    near-collisions exist.  The operator's pigeonhole prefix/suffix
    blocking turns the oracle's |L|x|R| scan into a hash equi-join on
    segment keys with exact levenshtein verification on candidates only —
    completeness proven against brute force in tests/test_joins.py."""
    part = load_table(spark, sf_dir, "part")
    names = part.select(F.lower("p_name").alias("a")).distinct()
    perturbed = part.select(
        F.concat(
            F.expr("substr(lower(p_name), 1, length(p_name) - 1)"), F.lit("x")
        ).alias("b")
    ).distinct()
    out = j.fuzzy_join(names, perturbed, "a", "b")
    return out.select(
        "left_value", "right_value", F.col("dist").cast("int").alias("dist")
    ).orderBy("left_value", "right_value")


@register(
    "join_bucketed",
    sql="""
    SELECT o.o_orderkey, o.o_totalprice,
           SUM(l.l_quantity) AS sum_qty,
           COUNT(*) AS n_items
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2 ORDER BY o.o_orderkey
    """,
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located fact-to-fact join (SURVEY §2.3 / §7.0 scale
    posture; the persistent form of the reference's hash_partition,
    partitioning.hpp:106): both sides written ``bucketBy(8, key)`` into
    managed tables, then joined with a merge hint — the bucketed scans
    already provide hash clustering on the key, so the SortMergeJoin AND
    the same-key aggregation run with ZERO hash Exchange (plan-guarded in
    test_plans; the only exchange left is the final presentation sort).
    This is the 100 TB recipe for repeated large-to-large joins that
    broadcast/AQE cannot cover: partition once at write time, join
    forever without shuffling.  SUM(l_quantity) is exact cross-engine
    (integral values in double)."""
    import os
    import shutil

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    ob, lb = f"orders_bq_{tag}", f"lineitem_bq_{tag}"
    # The metastore is per-session but the warehouse dir persists: drop any
    # catalog entry AND clear a stale location a previous session left, or
    # saveAsTable fails with LOCATION_ALREADY_EXISTS.
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in (ob, lb):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(ob)
    )
    (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_quantity")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(lb)
    )
    return (
        spark.table(lb)
        .join(
            spark.table(ob).hint("merge"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "join_pit_window",
    sql="""
    WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
                FROM events),
         p AS (SELECT event_id, ts, user_id FROM ev WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts,
                      COUNT(*) OVER (PARTITION BY user_id ORDER BY ts) AS n
               FROM ev WHERE event_type = 'click'),
         cs AS (SELECT user_id, ts + INTERVAL 6 HOUR AS ts, n FROM c)
    SELECT p.event_id,
           CAST(COALESCE(c.n, 0) - COALESCE(cs.n, 0) AS BIGINT) AS clicks_6h
    FROM p
    ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    ASOF LEFT JOIN cs ON p.user_id = cs.user_id AND p.ts >= cs.ts
    ORDER BY p.event_id
    """,
)
def join_pit_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window point-in-time feature ('clicks in the 6 h before the
    purchase') — the rolling-feature shape every feature store needs,
    expressed WITHOUT a range self-join: windowed count(≤T) minus
    count(≤T−6h), where the second term is the SAME cumulative frame
    joined through pit_join with its timestamps shifted +6h (a click at t
    becomes visible to the shifted lookup only once T ≥ t+6h).  Both
    lookups ride the one-Exchange pit_join union; the oracle is two
    chained DuckDB ASOF joins on the raw and shifted cum frames."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("event_id", "ts", "user_id")
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", "ts")
        .withColumn("n", F.count(F.lit(1)).over(wcum))
    )
    cs = c.withColumn("ts", F.col("ts") + F.expr("INTERVAL 6 HOURS"))
    out = j.pit_join(p, {"cum": c, "cumshift": cs}, on="ts", by=["user_id"])
    return out.select(
        "event_id",
        (
            F.coalesce(F.col("cum_n"), F.lit(0))
            - F.coalesce(F.col("cumshift_n"), F.lit(0))
        ).cast("long").alias("clicks_6h"),
    ).orderBy("event_id")


# Mega-basket cap for agg_market_basket: baskets with more items than
# this are dropped from the whole computation in both engines (the
# stats.market_basket_rules contract) — a basket of m items seeds m²
# pair candidates, so uncapped skew is the op's one 100 TB failure mode.
# Fixture baskets top out at 13 items, so the cap is semantics-neutral
# here while making the posture code, not prose.
_BASKET_CAP = 64


@register(
    "agg_market_basket",
    sql=f"""
    WITH b0 AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    b AS (SELECT o, p FROM (
            SELECT o, p, COUNT(*) OVER (PARTITION BY o) AS bsz FROM b0)
          WHERE bsz <= {_BASKET_CAP}),
    n AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n_orders FROM b),
    item AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS s FROM b GROUP BY p),
    pr AS (SELECT a.p AS part_a, c.p AS part_b, CAST(COUNT(*) AS BIGINT) AS support
           FROM b a JOIN b c ON a.o = c.o AND a.p < c.p
           GROUP BY 1, 2 HAVING COUNT(*) >= 3)
    SELECT pr.part_a, pr.part_b, pr.support,
           CAST(pr.support AS DOUBLE) / ia.s AS conf_ab,
           CAST(pr.support AS DOUBLE) / ib.s AS conf_ba,
           (CAST(pr.support AS DOUBLE) * CAST(n.n_orders AS DOUBLE))
             / (CAST(ia.s AS DOUBLE) * CAST(ib.s AS DOUBLE)) AS lift
    FROM pr JOIN item ia ON ia.p = pr.part_a
            JOIN item ib ON ib.p = pr.part_b
            CROSS JOIN n
    ORDER BY part_a, part_b
    """,
)
def agg_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (A-priori level 2,
    stats.market_basket_rules): item-pair support within orders, plus
    confidence both ways and lift — the classic co-occurrence analytics
    op.  The pair join is an equi-join on the basket key (pairs per
    basket bounded by basket size — never a cross product) with the
    ``max_basket_size`` mega-basket cap bounding the per-basket
    quadratic term in both engines; item supports broadcast back; every
    ratio is an IEEE division of exact integer counts, so both engines
    agree bit-for-bit."""
    from my_cudf_spark.operators.stats import market_basket_rules

    b = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    rules = market_basket_rules(
        b, "o", "p", min_support=3, max_basket_size=_BASKET_CAP
    )
    return rules.select(
        F.col("item_a").alias("part_a"),
        F.col("item_b").alias("part_b"),
        "support",
        "conf_ab",
        "conf_ba",
        "lift",
    ).orderBy("part_a", "part_b")


@register(
    "join_interval_overlap",
    sql="""
    WITH v AS (SELECT user_id, event_id AS a_id,
                      epoch_us(CAST(ts AS TIMESTAMP)) AS a_s,
                      epoch_us(CAST(ts AS TIMESTAMP)) + 600000000 AS a_e
               FROM events WHERE event_type = 'view'),
    p AS (SELECT user_id, event_id AS b_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS b_s,
                 epoch_us(CAST(ts AS TIMESTAMP)) + 600000000 AS b_e
          FROM events WHERE event_type = 'purchase')
    SELECT v.user_id AS user_id, v.a_id, p.b_id,
           (LEAST(v.a_e, p.b_e) - GREATEST(v.a_s, p.b_s)) // 1000000 AS overlap_sec
    FROM v JOIN p ON v.user_id = p.user_id
                 AND v.a_s <= p.b_e AND p.b_s <= v.a_e
    ORDER BY v.user_id, a_id, b_id
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap join (joins.interval_overlap_join — the
    two-sided sibling of join_range's point-in-interval bucketing): every
    same-user pair of a 10-minute view window and a 10-minute purchase
    window that overlap, with the overlap length.  Candidates come from a
    hash equi-join on (user, 10-minute bin), never the |V|×|P| predicate
    scan the oracle runs; the exact bound check verifies candidates."""
    from my_cudf_spark.operators.joins import interval_overlap_join

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    mk = lambda t: (
        ev.filter(F.col("event_type") == t).select(
            "user_id",
            F.col("event_id").alias("id"),
            us.alias("s"),
            (us + 600000000).alias("e"),
        )
    )
    out = interval_overlap_join(
        mk("view"), mk("purchase"), ["user_id"], "s", "e", "s", "e",
        bin_width=600000000,
    )
    return out.select(
        "user_id",
        F.col("a_id").alias("a_id"),
        F.col("b_id").alias("b_id"),
        F.expr("(LEAST(a_e, b_e) - GREATEST(a_s, b_s)) div 1000000")
        .cast("long")
        .alias("overlap_sec"),
    ).orderBy("user_id", "a_id", "b_id")
