"""CDC / lakehouse-maintenance correctness queries (operators/cdc.py).

The change feeds are derived DETERMINISTICALLY from the fixtures (modular
slices of ``customer`` / ``orders``), so both engines construct the exact
same batch and the oracles replay full MERGE / changelog-compaction / SCD2
semantics with plain SQL joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from my_cudf_spark.operators import cdc as C
from my_cudf_spark.queries import register
from my_cudf_spark.sources import load_table


@register(
    "cdc_merge_upsert",
    sql="""
    WITH src AS (
      SELECT c_custkey AS k, c_acctbal + 100.0 AS bal, FALSE AS del
      FROM customer WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT c_custkey, NULL, TRUE FROM customer WHERE c_custkey % 10 = 1
      UNION ALL
      SELECT c_custkey + 10000000, 0.0, FALSE
      FROM customer WHERE c_custkey % 10 = 2
    ),
    upd AS (
      SELECT t.c_custkey, t.c_name,
             CASE WHEN s.k IS NOT NULL THEN s.bal ELSE t.c_acctbal END AS c_acctbal,
             t.c_mktsegment
      FROM customer t LEFT JOIN src s ON t.c_custkey = s.k
      WHERE NOT COALESCE(s.del, FALSE)
    ),
    ins AS (
      SELECT s.k AS c_custkey, CAST(NULL AS VARCHAR) AS c_name,
             s.bal AS c_acctbal, CAST(NULL AS VARCHAR) AS c_mktsegment
      FROM src s LEFT JOIN customer t ON t.c_custkey = s.k
      WHERE t.c_custkey IS NULL AND NOT s.del
    )
    SELECT * FROM (SELECT * FROM upd UNION ALL SELECT * FROM ins)
    ORDER BY c_custkey
    """,
)
def cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-style MERGE INTO (operators/cdc.merge_upsert; the reference
    stops at scatter/boolean-mask updates, copying.hpp:30): one batch
    carrying updates (custkey%10==0 → acctbal+100), deletes (%10==1) and
    inserts (%10==2 → new key, zero balance) applied to ``customer`` —
    matched-update, matched-delete, and not-matched-insert legs in one
    call, target payload never shuffled."""
    cust = load_table(spark, sf_dir, "customer")
    base = cust.select("c_custkey", "c_acctbal", (F.col("c_custkey") % 10).alias("m"))
    src = (
        base.filter(F.col("m") == 0)
        .select(
            "c_custkey",
            (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
            F.lit(False).alias("del"),
        )
        .unionByName(
            base.filter(F.col("m") == 1).select(
                "c_custkey",
                F.lit(None).cast("double").alias("c_acctbal"),
                F.lit(True).alias("del"),
            )
        )
        .unionByName(
            base.filter(F.col("m") == 2).select(
                (F.col("c_custkey") + 10_000_000).alias("c_custkey"),
                F.lit(0.0).alias("c_acctbal"),
                F.lit(False).alias("del"),
            )
        )
    )
    merged = C.merge_upsert(
        cust, src, keys=["c_custkey"], update_cols=["c_acctbal"], delete_col="del"
    )
    return merged.select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    ).orderBy("c_custkey")


@register(
    "cdc_apply_changelog",
    sql="""
    WITH ch AS (
      SELECT o_custkey AS cust, o_orderkey AS seq,
             CASE WHEN o_orderkey % 97 = 0 THEN 'D' ELSE 'U' END AS op,
             o_totalprice AS bal
      FROM orders
    ),
    r AS (SELECT cust, op, bal,
                 ROW_NUMBER() OVER (PARTITION BY cust
                                    ORDER BY seq DESC, op DESC) AS rn
          FROM ch)
    SELECT cust, bal FROM r WHERE rn = 1 AND op <> 'D' ORDER BY cust
    """,
)
def cdc_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog compaction (operators/cdc.apply_changelog): a
    synthetic per-customer balance feed keyed by order (seq = orderkey,
    every 97th order a tombstone) reduced to current state — latest event
    per key wins, deleted keys disappear.  One keep-latest shuffle, state
    ∝ distinct keys."""
    orders = load_table(spark, sf_dir, "orders")
    ch = orders.select(
        F.col("o_custkey").alias("cust"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderkey") % 97 == 0, "D").otherwise("U").alias("op"),
        F.col("o_totalprice").alias("bal"),
    )
    return C.apply_changelog(ch, ["cust"], "seq", "op").orderBy("cust")


@register(
    "cdc_scd2",
    sql="""
    WITH dim AS (SELECT c_custkey AS k, c_mktsegment AS segment,
                        TIMESTAMP '1995-01-01 00:00:00' AS valid_from
                 FROM customer),
    ch AS (
      SELECT c_custkey AS k, 'MIGRATED' AS segment, TIMESTAMP '2000-06-01 00:00:00' AS eff
      FROM customer WHERE c_custkey % 4 = 0
      UNION ALL
      SELECT c_custkey, c_mktsegment, TIMESTAMP '2000-06-01 00:00:00'
      FROM customer WHERE c_custkey % 4 = 1
      UNION ALL
      SELECT c_custkey + 10000000, 'NEW', TIMESTAMP '2000-06-01 00:00:00'
      FROM customer WHERE c_custkey % 4 = 2
    ),
    cur AS (SELECT d.k, d.segment, d.valid_from,
                   CASE WHEN ch.k IS NOT NULL
                             AND ch.segment IS DISTINCT FROM d.segment
                        THEN ch.eff END AS valid_to,
                   NOT (ch.k IS NOT NULL
                        AND ch.segment IS DISTINCT FROM d.segment) AS is_current
            FROM dim d LEFT JOIN ch ON d.k = ch.k),
    newv AS (SELECT ch.k, ch.segment, ch.eff AS valid_from,
                    CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
             FROM ch LEFT JOIN dim d ON d.k = ch.k
             WHERE d.k IS NULL OR ch.segment IS DISTINCT FROM d.segment)
    SELECT k AS c_custkey, segment, valid_from, valid_to, is_current
    FROM (SELECT * FROM cur UNION ALL SELECT * FROM newv)
    ORDER BY c_custkey, valid_from
    """,
)
def cdc_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension (operators/cdc.scd2_apply): a
    segment-migration batch (every 4th customer re-segmented, every
    4th+1 a no-op echo, every 4th+2 spawning a brand-new key) versions the
    customer dimension — changed keys close their open version at the
    effective date and append a new one; no-ops touch nothing.  The
    point-in-time reproduction shape training-set lineage needs."""
    cust = load_table(spark, sf_dir, "customer")
    dim = cust.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit("1995-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    m = (F.col("c_custkey") % 4).alias("m")
    eff = F.lit("2000-06-01 00:00:00").cast("timestamp")
    ch = (
        cust.filter(m == 0)
        .select("c_custkey", F.lit("MIGRATED").alias("segment"), eff.alias("eff"))
        .unionByName(
            cust.filter(m == 1).select(
                "c_custkey", F.col("c_mktsegment").alias("segment"), eff.alias("eff")
            )
        )
        .unionByName(
            cust.filter(m == 2).select(
                (F.col("c_custkey") + 10_000_000).alias("c_custkey"),
                F.lit("NEW").alias("segment"),
                eff.alias("eff"),
            )
        )
    )
    out = C.scd2_apply(
        dim, ch, keys=["c_custkey"], attr_cols=["segment"], eff_col="eff"
    )
    return out.select(
        "c_custkey", "segment", "valid_from", "valid_to", "is_current"
    ).orderBy("c_custkey", "valid_from")


@register(
    "cdc_merge_bucketed",
    sql="""
    WITH s0 AS (SELECT o_custkey AS k, MAX(o_totalprice) AS bal
                FROM orders GROUP BY o_custkey),
    snap AS (
      SELECT k, bal, (k % 7 = 0) AS del FROM s0
      UNION ALL
      SELECT k + 10000000, 0.0, FALSE FROM s0 WHERE k % 11 = 3
    ),
    upd AS (SELECT t.c_custkey, t.c_name,
                   CASE WHEN s.k IS NOT NULL THEN s.bal
                        ELSE t.c_acctbal END AS c_acctbal
            FROM customer t LEFT JOIN snap s ON t.c_custkey = s.k
            WHERE NOT COALESCE(s.del, FALSE)),
    ins AS (SELECT s.k AS c_custkey, CAST(NULL AS VARCHAR) AS c_name,
                   s.bal AS c_acctbal
            FROM snap s LEFT JOIN customer t ON t.c_custkey = s.k
            WHERE t.c_custkey IS NULL AND NOT s.del)
    SELECT * FROM (SELECT * FROM upd UNION ALL SELECT * FROM ins)
    ORDER BY c_custkey
    """,
)
def cdc_merge_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZERO-EXCHANGE MERGE: ``customer`` written ``bucketBy(8, c_custkey)``
    (join_bucketed's persistent-layout technique), then merge_upsert with
    ``null_safe_keys=False`` (bucketed-PK contract) and a merge-hinted
    source — BOTH MERGE legs (matched left join + insert anti-join) run as
    SortMergeJoins fed straight from the bucketed scans with NO Exchange
    on the target side; only the batch-sized snapshot shuffles.  This is
    the checked artifact behind cdc.py's scale claim (the target payload
    of a 100 TB governed table is never shuffled — and with bucketed
    layout, never even its key projection): partition once at write time,
    MERGE forever without shuffling.  Plan-guarded in
    tests/test_bucketing.py; the snapshot carries updates, tombstones
    (k%7==0) and fresh keys (k%11==3 shifted) so all three legs are
    non-trivially exercised."""
    import os
    import shutil
    from urllib.parse import unquote, urlparse

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    tb = f"cust_mrg_bq_{tag}"
    # DROP TABLE removes a managed table's files, but a PRIOR session's
    # leftover directory (metastore is per-session, spark-warehouse is
    # not) still trips LOCATION_ALREADY_EXISTS — hence the rmtree.  Parse
    # the conf as a URI: bare paths, file:/p and file:///p all yield the
    # plain filesystem path (removeprefix("file:") left a
    # scheme-relative //p for file://host URIs).
    wh_uri = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
    wh = unquote(wh_uri.path) if wh_uri.scheme in ("", "file") else None
    spark.sql(f"DROP TABLE IF EXISTS {tb}")
    if wh:
        shutil.rmtree(os.path.join(wh, tb), ignore_errors=True)
    (
        load_table(spark, sf_dir, "customer")
        .write.mode("overwrite")
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .saveAsTable(tb)
    )
    target = spark.table(tb)
    s0 = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.max("o_totalprice").alias("bal"))
    )
    snap = (
        s0.select("k", "bal", (F.col("k") % 7 == 0).alias("del"))
        .unionByName(
            s0.filter(F.col("k") % 11 == 3).select(
                (F.col("k") + 10_000_000).alias("k"),
                F.lit(0.0).alias("bal"),
                F.lit(False).alias("del"),
            )
        )
        .select(
            F.col("k").alias("c_custkey"),
            F.col("bal").alias("c_acctbal"),
            "del",
        )
    )
    merged = C.merge_upsert(
        target,
        snap.hint("merge"),
        keys=["c_custkey"],
        update_cols=["c_acctbal"],
        delete_col="del",
        null_safe_keys=False,
    )
    return merged.select("c_custkey", "c_name", "c_acctbal").orderBy("c_custkey")


@register(
    "cdc_incremental_agg",
    sql="""
    WITH f AS (SELECT o_custkey AS cust, o_orderkey AS id,
                      CAST(o_totalprice AS DECIMAL(28,2)) AS v
               FROM orders),
    base AS (SELECT * FROM f WHERE id % 7 <> 0),
    kept AS (SELECT cust, v FROM base
             WHERE id % 5 <> 0 AND NOT (id % 11 = 0)),
    upd_new AS (SELECT cust, v + CAST(10.0 AS DECIMAL(28,2)) AS v
                FROM base WHERE id % 5 = 0),
    ins AS (SELECT cust, v FROM f WHERE id % 7 = 0),
    facts AS (SELECT * FROM kept UNION ALL SELECT * FROM upd_new
              UNION ALL SELECT * FROM ins)
    SELECT cust,
           CAST(CAST(SUM(v) AS VARCHAR) AS DOUBLE) AS total,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM facts GROUP BY cust ORDER BY cust
    """,
)
def cdc_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance (cdc.incremental_agg):
    yesterday's per-customer (SUM, COUNT) view of orders is updated with
    a CDC batch — inserts (every 7th order arrives late), updates (every
    5th surviving order's price +10, Debezium before/after envelope),
    deletes (every 11th of the rest) — WITHOUT rescanning the fact
    table: one aggregation over the change batch + one full-outer join
    against the view.  The DuckDB oracle recomputes the view from the
    post-change facts from scratch; decimal deltas make maintained ==
    recomputed bit-for-bit (the IVM gold standard)."""
    f = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("cust"),
        F.col("o_orderkey").alias("id"),
        F.col("o_totalprice").cast("decimal(28,2)").alias("v"),
    )
    base = f.filter(F.col("id") % 7 != 0)
    base_agg = base.groupBy("cust").agg(
        F.sum("v").alias("total"), F.count(F.lit(1)).alias("n")
    )
    ten = F.lit(10.0).cast("decimal(28,2)")
    changes = (
        f.filter(F.col("id") % 7 == 0)
        .select("cust", F.lit(None).cast("decimal(28,2)").alias("old_v"),
                F.col("v").alias("new_v"))
        .unionAll(
            base.filter(F.col("id") % 5 == 0).select(
                "cust", F.col("v").alias("old_v"), (F.col("v") + ten).alias("new_v")
            )
        )
        .unionAll(
            base.filter((F.col("id") % 5 != 0) & (F.col("id") % 11 == 0)).select(
                "cust", F.col("v").alias("old_v"),
                F.lit(None).cast("decimal(28,2)").alias("new_v"),
            )
        )
    )
    out = C.incremental_agg(
        base_agg, changes, ["cust"], "old_v", "new_v", sum_col="total", count_col="n"
    )
    return out.select(
        "cust",
        F.col("total").cast("double").alias("total"),
        F.col("n").cast("long").alias("n"),
    ).orderBy("cust")


@register(
    "cdc_table_diff",
    sql="""
    WITH a AS (SELECT o_orderkey AS id, CAST(o_totalprice AS DECIMAL(28,2)) AS v
               FROM orders WHERE o_orderkey % 7 <> 0),
    b AS (SELECT id, CASE WHEN id % 5 = 0 THEN v + CAST(10.0 AS DECIMAL(28,2))
                          ELSE v END AS v
          FROM a WHERE NOT (id % 5 <> 0 AND id % 11 = 0)
          UNION ALL
          SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(28,2))
          FROM orders WHERE o_orderkey % 7 = 0),
    j AS (SELECT COALESCE(a.id, b.id) AS id,
                 CASE WHEN a.id IS NULL THEN 'added'
                      WHEN b.id IS NULL THEN 'removed'
                      WHEN a.v <> b.v THEN 'changed' END AS status,
                 a.v AS old_v, b.v AS new_v
          FROM a FULL JOIN b ON a.id = b.id)
    SELECT id, status,
           CASE WHEN status = 'changed' THEN 'v' ELSE '' END AS changed_cols,
           CAST(CAST(old_v AS VARCHAR) AS DOUBLE) AS old_v,
           CAST(CAST(new_v AS VARCHAR) AS DOUBLE) AS new_v
    FROM j WHERE status IS NOT NULL ORDER BY id
    """,
)
def cdc_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff / change-data-feed generation (cdc.table_diff) — the
    inverse of changelog application: two versions of the orders table
    (the cdc_incremental_agg change families applied at row level) are
    diffed into the added/removed/changed feed that transforms one into
    the other.  One full-outer join on the key, null-safe column
    comparison, unchanged rows dropped."""
    f = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"),
        F.col("o_totalprice").cast("decimal(28,2)").alias("v"),
    )
    a = f.filter(F.col("id") % 7 != 0)
    ten = F.lit(10.0).cast("decimal(28,2)")
    b = (
        a.filter(~((F.col("id") % 5 != 0) & (F.col("id") % 11 == 0)))
        .select(
            "id",
            F.when(F.col("id") % 5 == 0, F.col("v") + ten).otherwise(F.col("v")).alias("v"),
        )
        .unionAll(f.filter(F.col("id") % 7 == 0))
    )
    out = C.table_diff(a, b, ["id"], ["v"])
    return out.select(
        "id",
        "status",
        "changed_cols",
        F.col("old_v").cast("double").alias("old_v"),
        F.col("new_v").cast("double").alias("new_v"),
    ).orderBy("id")


@register(
    "cdc_time_travel",
    sql="""
    WITH ch AS (SELECT o_custkey AS cust, o_orderkey AS seq,
                       CASE WHEN o_orderkey % 97 = 0 THEN 'D' ELSE 'U' END AS op,
                       o_totalprice AS bal
                FROM orders),
    v AS (SELECT MAX(o_orderkey) // 2 AS v FROM orders),
    f AS (SELECT ch.* FROM ch, v WHERE ch.seq <= v.v),
    p1 AS (SELECT cust, bal, seq AS asof_seq FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY cust
                         ORDER BY seq DESC, op DESC) AS rn FROM f)
           WHERE rn = 1 AND op <> 'D'),
    iv AS (SELECT cust, seq, op, bal,
                  LEAD(seq) OVER (PARTITION BY cust ORDER BY seq) AS nxt
           FROM ch),
    p2 AS (SELECT i.cust, i.bal AS bal_iv FROM iv i, v
           WHERE i.seq <= v.v AND (i.nxt IS NULL OR i.nxt > v.v)
             AND i.op <> 'D'),
    cnt AS (SELECT cust, CAST(COUNT(*) AS BIGINT) AS n_versions
            FROM f GROUP BY cust)
    SELECT COALESCE(p1.cust, p2.cust) AS cust, p1.asof_seq, cnt.n_versions,
           p1.bal, p2.bal_iv,
           (p1.bal IS NOT DISTINCT FROM p2.bal_iv) AS agree
    FROM p1 FULL OUTER JOIN p2 ON p1.cust = p2.cust
    JOIN cnt ON cnt.cust = COALESCE(p1.cust, p2.cust)
    ORDER BY cust
    """,
)
def cdc_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lakehouse TIME TRAVEL (operators/cdc.time_travel): reconstruct the
    per-customer balance table AS OF version v (the changelog's midpoint
    sequence, a data-derived pin that rides a 1-row broadcast — never a
    driver collect) and PROVE the two canonical reconstructions agree:

    - path 1, compaction: events with seq ≤ v through the existing
      keep-latest shape (the ``max-seq ≤ v per key is one filter + the
      compaction window`` contract — zero full-history shuffles);
    - path 2, validity intervals: the SCD2 view of the same changelog
      (valid_from = seq, valid_to = next seq per key) probed for the
      interval containing v, tombstones excluded.

    Output carries both balances, the as-of version stamp, the per-key
    version count ≤ v, and the null-safe agreement flag — a full outer
    join, so any divergence between the two reconstructions surfaces as
    extra rows / false flags in BOTH engines' hash compare."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    ch = orders.select(
        F.col("o_custkey").alias("cust"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderkey") % 97 == 0, "D").otherwise("U").alias("op"),
        F.col("o_totalprice").alias("bal"),
    )
    vdf = orders.agg(
        F.floor(F.max("o_orderkey") / 2).cast("long").alias("v")
    )
    p1 = C.time_travel(
        ch.withColumn("asof_seq", F.col("seq")), ["cust"], "seq", "op", vdf
    ).select("cust", "bal", "asof_seq")

    w = Window.partitionBy("cust").orderBy("seq")
    iv = ch.withColumn("nxt", F.lead("seq").over(w))
    p2 = (
        iv.crossJoin(F.broadcast(vdf))
        .filter(
            (F.col("seq") <= F.col("v"))
            & (F.col("nxt").isNull() | (F.col("nxt") > F.col("v")))
            & (F.col("op") != "D")
        )
        .select("cust", F.col("bal").alias("bal_iv"))
    )
    cnt = (
        ch.crossJoin(F.broadcast(vdf))
        .filter(F.col("seq") <= F.col("v"))
        .groupBy("cust")
        .agg(F.count(F.lit(1)).alias("n_versions"))
    )
    return (
        p1.join(p2, "cust", "full")
        .join(cnt, "cust")
        .withColumn("agree", F.col("bal").eqNullSafe(F.col("bal_iv")))
        .select("cust", "asof_seq", "n_versions", "bal", "bal_iv", "agree")
        .orderBy("cust")
    )


@register(
    "cdc_scd2_asof",
    sql="""
    WITH dim AS (SELECT c_custkey AS k, c_mktsegment AS segment,
                        TIMESTAMP '1995-01-01 00:00:00' AS valid_from
                 FROM customer),
    ch AS (
      SELECT c_custkey AS k, 'MIGRATED' AS segment,
             TIMESTAMP '2000-06-01 00:00:00' AS eff
      FROM customer WHERE c_custkey % 4 = 0
      UNION ALL
      SELECT c_custkey, c_mktsegment, TIMESTAMP '2000-06-01 00:00:00'
      FROM customer WHERE c_custkey % 4 = 1
      UNION ALL
      SELECT c_custkey + 10000000, 'NEW', TIMESTAMP '2000-06-01 00:00:00'
      FROM customer WHERE c_custkey % 4 = 2
    ),
    cur AS (SELECT d.k, d.segment, d.valid_from,
                   CASE WHEN ch.k IS NOT NULL
                             AND ch.segment IS DISTINCT FROM d.segment
                        THEN ch.eff END AS valid_to,
                   NOT (ch.k IS NOT NULL
                        AND ch.segment IS DISTINCT FROM d.segment) AS is_current
            FROM dim d LEFT JOIN ch ON d.k = ch.k),
    newv AS (SELECT ch.k, ch.segment, ch.eff AS valid_from,
                    CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
             FROM ch LEFT JOIN dim d ON d.k = ch.k
             WHERE d.k IS NULL OR ch.segment IS DISTINCT FROM d.segment),
    v AS (SELECT * FROM cur UNION ALL SELECT * FROM newv),
    pre AS (SELECT k, segment FROM v
            WHERE valid_from <= TIMESTAMP '1999-01-01 00:00:00'
              AND (valid_to IS NULL OR valid_to > TIMESTAMP '1999-01-01 00:00:00')),
    post AS (SELECT k, segment FROM v
             WHERE valid_from <= TIMESTAMP '2000-12-31 00:00:00'
               AND (valid_to IS NULL OR valid_to > TIMESTAMP '2000-12-31 00:00:00'))
    SELECT COALESCE(pre.k, post.k) AS c_custkey,
           pre.segment AS segment_pre, post.segment AS segment_post,
           (pre.segment IS DISTINCT FROM post.segment) AS changed
    FROM pre FULL OUTER JOIN post ON pre.k = post.k
    ORDER BY c_custkey
    """,
)
def cdc_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension AS-OF reads (operators/cdc.scd2_asof) — the
    dimension-side twin of cdc_time_travel, together reproducing the
    exact training-set join a past run saw: the cdc_scd2 versioned
    customer dimension probed at two instants — before the 2000-06-01
    segment migration and after it — with the half-open
    ``[valid_from, valid_to)`` convention (at exactly the effective
    instant the new version is current).  Output: each key's segment at
    both instants via a full outer join (brand-new keys are absent
    pre-migration) and the null-safe changed flag, so any interval-
    boundary disagreement between the two engines surfaces as extra
    rows or flag flips.  The as-of read itself is a narrow filter — no
    shuffle, no window."""
    cust = load_table(spark, sf_dir, "customer")
    dim = cust.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit("1995-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    m = (F.col("c_custkey") % 4).alias("m")
    eff = F.lit("2000-06-01 00:00:00").cast("timestamp")
    ch = (
        cust.filter(m == 0)
        .select("c_custkey", F.lit("MIGRATED").alias("segment"), eff.alias("eff"))
        .unionByName(
            cust.filter(m == 1).select(
                "c_custkey", F.col("c_mktsegment").alias("segment"), eff.alias("eff")
            )
        )
        .unionByName(
            cust.filter(m == 2).select(
                (F.col("c_custkey") + 10_000_000).alias("c_custkey"),
                F.lit("NEW").alias("segment"),
                eff.alias("eff"),
            )
        )
    )
    versioned = C.scd2_apply(
        dim, ch, keys=["c_custkey"], attr_cols=["segment"], eff_col="eff"
    )
    pre = C.scd2_asof(versioned, "1999-01-01 00:00:00").select(
        "c_custkey", F.col("segment").alias("segment_pre")
    )
    post = C.scd2_asof(versioned, "2000-12-31 00:00:00").select(
        "c_custkey", F.col("segment").alias("segment_post")
    )
    return (
        pre.join(post, "c_custkey", "full")
        .select(
            "c_custkey",
            "segment_pre",
            "segment_post",
            (~F.col("segment_pre").eqNullSafe(F.col("segment_post"))).alias("changed"),
        )
        .orderBy("c_custkey")
    )
