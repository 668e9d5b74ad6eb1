"""IO round-trip queries (SURVEY.md §2.2): write a fixture table through a
format and read it back with its explicit schema; the DuckDB oracle reads
the ORIGINAL parquet, so a hash match certifies end-to-end writer+reader
fidelity (values, nulls, dates/timestamps) for that format.

Staging dirs are deterministic per (format, sf) under /tmp and rewritten
with mode=overwrite, so repeated runs (bench repeats, driver warmup) don't
accumulate files.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from my_cudf_spark.queries import register
from my_cudf_spark.sources import io as IO
from my_cudf_spark.sources import load_table

_STAGE = os.path.join(tempfile.gettempdir(), "my_cudf_spark_io")


def _stage(fmt: str, sf_dir: str) -> str:
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    return os.path.join(_STAGE, f"{fmt}_{tag}")


@register("io_csv_roundtrip", sql="SELECT * FROM orders ORDER BY o_orderkey")
def io_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV write→read (csv.hpp): dates, doubles (Java shortest-repr float
    formatting is round-trip exact) and strings survive the text format."""
    orders = load_table(spark, sf_dir, "orders")
    path = _stage("csv", sf_dir)
    IO.write_csv(orders, path)
    return IO.read_csv(spark, path, schema=orders.schema).orderBy("o_orderkey")


@register("io_json_roundtrip", sql="SELECT * FROM events ORDER BY event_id")
def io_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDJSON write→read (json.hpp): µs timestamps and the embedded-JSON
    ``props`` string (quote escaping) survive; schema applied explicitly on
    read, matching the reference's explicit-dtype JSON reader."""
    events = load_table(spark, sf_dir, "events")
    path = _stage("json", sf_dir)
    # default NTZ format truncates to ms — pin µs on both sides
    us = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    IO.write_json(events, path, timestampNTZFormat=us)
    return IO.read_json(
        spark, path, schema=events.schema, timestampNTZFormat=us
    ).orderBy("event_id")


@register("io_orc_roundtrip", sql="SELECT * FROM part ORDER BY p_partkey")
def io_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC write→read (orc.hpp) with native vectorized reader."""
    part = load_table(spark, sf_dir, "part")
    path = _stage("orc", sf_dir)
    IO.write_orc(part, path)
    return IO.read_orc(spark, path).orderBy("p_partkey")


@register("io_text_roundtrip", sql="SELECT text AS value FROM documents ORDER BY value")
def io_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw text write→read with a MULTIBYTE record separator (U+241E, 3
    UTF-8 bytes) — the multibyte_split parity case (text/
    multibyte_split.hpp:40-77): Spark's text source splits on arbitrary
    lineSep byte sequences while parallelizing by byte ranges, exactly the
    reference's delimiter scan.  Oracle reads the original parquet, so the
    hash match certifies writer+reader fidelity for the text format."""
    docs = load_table(spark, sf_dir, "documents")
    path = _stage("text", sf_dir)
    sep = "␞"
    docs.select(F.col("text").alias("value")).write.mode("overwrite").option(
        "lineSep", sep
    ).text(path)
    return IO.read_text(spark, path, line_sep=sep).orderBy("value")


@register(
    "io_partitioned_roundtrip",
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
    FROM orders WHERE o_orderpriority = '1-URGENT'
    ORDER BY o_orderkey
    """,
)
def io_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned parquet write → partition-PRUNED read (parquet.hpp
    partitioned layout; Scan partition pruning, SURVEY §4.1): write orders
    partitioned by priority, read back with a partition predicate — the
    scan must touch only the matching directory (PartitionFilters, not a
    post-scan filter; pinned in tests/test_plans.py), which is the layout
    property that turns a 100 TB scan into a 20 TB one."""
    orders = load_table(spark, sf_dir, "orders")
    path = _stage("partitioned", sf_dir)
    orders.select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    ).write.mode("overwrite").partitionBy("o_orderpriority").parquet(path)
    out = spark.read.parquet(path).filter(F.col("o_orderpriority") == "1-URGENT")
    return out.select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    ).orderBy("o_orderkey")


@register("io_arrow_roundtrip", sql="SELECT * FROM nation ORDER BY n_nationkey")
def io_arrow_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow interop round-trip (interop.hpp:466-722 to_arrow_host /
    from_arrow): DataFrame → pyarrow.Table → DataFrame must preserve
    values and types bit-for-bit.  Arrow interop is driver-side by
    definition (the Table is a host object), so the query runs it on a
    dimension table — the realistic shape (exporting a result or dim to
    another Arrow-speaking system), never a fact-table materialization."""
    nation = load_table(spark, sf_dir, "nation")
    return IO.from_arrow(spark, IO.to_arrow(nation)).orderBy("n_nationkey")


_QUARTERS = [(m, f"Q{(m - 1) // 3 + 1}") for m in range(1, 13)]


@register(
    "io_dataframe_scan",
    sql=f"""
    SELECT q.quarter, COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_price
    FROM orders o
    JOIN (VALUES {", ".join(f"({m}, '{q}')" for m, q in _QUARTERS)}) AS q(m, quarter)
      ON EXTRACT(month FROM o.o_orderdate) = q.m
    GROUP BY q.quarter ORDER BY q.quarter
    """,
)
def io_dataframe_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrameScan (cudf_polars ir.py DataFrameScan; SURVEY §2.1): a
    LOCAL literal frame (driver-side rows → createDataFrame) joined
    against a fixture fact — the in-memory-data-as-relation leaf.  The
    12-row dim broadcasts; the month-bucketed aggregation is one
    map-side-combined shuffle.  The decimal sum keeps the cross-engine
    hash stable (float SUM visit order would not be)."""
    quarters = spark.createDataFrame(_QUARTERS, "m int, quarter string")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(
            F.broadcast(quarters), F.month("o_orderdate") == F.col("m")
        )
        .groupBy("quarter")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("quarter")
    )


@register("io_sized_write_roundtrip", sql="SELECT * FROM supplier ORDER BY s_suppkey")
def io_sized_write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sized-output write→read (sources/io.write_sized): file count derived
    from Catalyst's optimized-plan size estimate over a target file size —
    the small-files / monster-files knob plain df.write lacks and a 100 TB
    curation sink needs.  The roundtrip certifies the repartition +
    maxRecordsPerFile path loses nothing; the footer-level sizing
    contract itself is unit-proven (test_packing)."""
    sup = load_table(spark, sf_dir, "supplier")
    path = _stage("sized", sf_dir)
    IO.write_sized(sup, path, target_file_bytes=256 << 10, max_records_per_file=2000)
    return spark.read.parquet(path).orderBy("s_suppkey")


@register("io_zorder_roundtrip", sql="SELECT * FROM orders ORDER BY o_orderkey")
def io_zorder_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustered write→read (sources/io.write_zordered — the
    Delta/Iceberg OPTIMIZE ZORDER BY layout lever): Morton-interleaved
    (o_custkey, o_totalprice) key, range-clustered files sorted within —
    footer stats stay tight on BOTH columns so predicates on either prune
    files (quantified in tests/test_io.py); the roundtrip certifies the
    layout loses nothing."""
    orders = load_table(spark, sf_dir, "orders")
    path = _stage("zorder", sf_dir)
    IO.write_zordered(
        orders, path, ["o_custkey", "o_totalprice"], target_file_bytes=512 << 10
    )
    return spark.read.parquet(path).orderBy("o_orderkey")
