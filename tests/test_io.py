"""IO connector tests beyond the oracle round-trips: text/lineSep source,
Arrow interop, Avro gating, partitioned parquet layout."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from my_cudf_spark.sources import io as IO
from my_cudf_spark.sources import load_table
from tests.conftest import SF_DIR


def test_read_text_multibyte_split(spark, tmp_path):
    raw = "alpha|beta|gamma|delta"
    p = tmp_path / "raw.txt"
    p.write_text(raw)
    rows = IO.read_text(spark, str(p), line_sep="|").collect()
    assert [r["value"] for r in rows] == ["alpha", "beta", "gamma", "delta"]


def test_arrow_interop_roundtrip(spark):
    nation = load_table(spark, SF_DIR, "nation")
    tbl = IO.to_arrow(nation)
    back = IO.from_arrow(spark, tbl)
    assert back.schema == nation.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_avro_needs_package(spark, tmp_path):
    with pytest.raises(NotImplementedError, match="spark-avro"):
        IO.read_avro(spark, str(tmp_path))


def test_partitioned_parquet_prunes(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_part")
    IO.write_parquet(orders, path, partition_by=["o_year"])
    # hive layout on disk
    years = [d for d in os.listdir(path) if d.startswith("o_year=")]
    assert len(years) > 1
    # partition-pruned scan reads only the matching directory
    one_year = int(years[0].split("=")[1])
    df = IO.read_parquet(spark, path, predicate=f"o_year = {one_year}")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert df.count() == orders.filter(F.col("o_year") == one_year).count()
    assert "PartitionFilters: [" in plan and f"(o_year#" in plan or "o_year" in plan
