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


def test_write_sized_splits_by_target(spark, tmp_path):
    from my_cudf_spark.sources.io import write_sized

    df = spark.range(200_000).selectExpr("id", "repeat('x', 64) AS pad")
    out = str(tmp_path / "sized")
    n = write_sized(df, out, target_file_bytes=1 << 20)
    files = [p for p in os.listdir(out) if p.endswith(".parquet")]
    assert n > 1 and len(files) == n
    back = spark.read.parquet(out)
    assert back.count() == 200_000
    # near-even spread: no file dominates (round-robin repartition)
    sizes = [os.path.getsize(os.path.join(out, f)) for f in files]
    assert max(sizes) < 3 * min(sizes)


def test_write_sized_single_file_for_tiny_input(spark, tmp_path):
    from my_cudf_spark.sources.io import write_sized

    df = spark.range(10)
    out = str(tmp_path / "tiny")
    n = write_sized(df, out, target_file_bytes=128 << 20)
    assert n == 1
    assert len([p for p in os.listdir(out) if p.endswith(".parquet")]) == 1


def test_write_sized_partition_by(spark, tmp_path):
    from my_cudf_spark.sources.io import write_sized

    df = spark.range(1000).selectExpr("id", "CAST(id % 3 AS INT) AS g")
    out = str(tmp_path / "parts")
    write_sized(df, out, target_file_bytes=1 << 30, partition_by=["g"])
    assert sorted(p for p in os.listdir(out) if p.startswith("g=")) == ["g=0", "g=1", "g=2"]
    assert spark.read.parquet(out).count() == 1000


def test_compact_rewrites_small_files(spark, tmp_path):
    from my_cudf_spark.sources.io import compact

    src = str(tmp_path / "fragmented")
    spark.range(50_000).selectExpr("id", "repeat('y', 32) AS pad").repartition(64).write.parquet(src)
    assert len([p for p in os.listdir(src) if p.endswith(".parquet")]) == 64
    n = compact(spark, src, target_file_bytes=128 << 20)
    dst = src + ".compact"
    files = [p for p in os.listdir(dst) if p.endswith(".parquet")]
    assert n == len(files) and len(files) < 64
    assert spark.read.parquet(dst).count() == 50_000


def test_write_clustered_prunes_files(spark, tmp_path):
    import pyarrow.parquet as pq
    from my_cudf_spark.sources.io import write_clustered

    df = spark.range(200_000).selectExpr("id", "repeat('y', 64) AS pad")
    out = str(tmp_path / "clustered")
    n = write_clustered(df, out, ["id"], target_file_bytes=1 << 20)
    files = sorted(
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")
    )
    assert n > 2 and len(files) == n
    # range clustering ⇒ per-file id ranges are disjoint, so footer
    # min/max stats let a point predicate skip every other file
    ranges = []
    for f in files:
        md = pq.read_metadata(f)
        mins = [md.row_group(i).column(0).statistics.min for i in range(md.num_row_groups)]
        maxs = [md.row_group(i).column(0).statistics.max for i in range(md.num_row_groups)]
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
        assert hi_a < lo_b, "file key ranges overlap — clustering broken"
    # rows are sorted within each file (row-group-level skipping layout)
    first = pq.read_table(files[0], columns=["id"]).column("id").to_pylist()
    assert first == sorted(first)
    back = spark.read.parquet(out)
    assert back.count() == 200_000


def test_write_clustered_validates(spark, tmp_path):
    from my_cudf_spark.sources.io import write_clustered

    with pytest.raises(ValueError, match="non-empty"):
        write_clustered(spark.range(5), str(tmp_path / "x"), [])


def test_zorder_key_locality_and_bounds(spark):
    from my_cudf_spark.sources.io import zorder_key

    df = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x int, y int"
    )
    rows = {(r["x"], r["y"]): r["__z"] for r in zorder_key(df, ["x", "y"], bits=4).collect()}
    # canonical Morton order on a 16x16 grid: interleave bits exactly
    def morton(x, y):
        z = 0
        for i in range(4):
            z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return z
    # values are min-max normalized; with x,y in 0..15 and bits=4 the
    # quantized value equals the input, so keys must match canonical Morton
    for (x, y), z in rows.items():
        assert z == morton(x, y), (x, y, z)
    assert len(set(rows.values())) == 256  # bijective on the grid
    import pytest
    with pytest.raises(ValueError, match="<= 62"):
        zorder_key(df, ["x", "y"], bits=32)


def test_write_zordered_tightens_both_dims(spark, tmp_path):
    """Z-order layout: per-file spans must be tight on BOTH columns —
    1-D range clustering would leave the second column's per-file span at
    ~100% of the global span."""
    import pyarrow.parquet as pq
    from my_cudf_spark.sources.io import write_zordered

    # two independent uniform dims (deterministic hash-derived)
    df = spark.range(200_000).selectExpr(
        "CAST(conv(substr(md5(CAST(id AS STRING)), 1, 6), 16, 10) AS BIGINT) % 10000 AS a",
        "CAST(conv(substr(md5(CAST(id AS STRING)), 7, 6), 16, 10) AS BIGINT) % 10000 AS b",
        "repeat('y', 32) AS pad",
    )
    out = str(tmp_path / "zorder")
    n = write_zordered(df, out, ["a", "b"], target_file_bytes=1 << 20)
    files = [os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == n and n >= 4
    spans = {"a": [], "b": []}
    for f in files:
        md = pq.read_metadata(f)
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for col in ("a", "b"):
            mins = [md.row_group(g).column(idx[col]).statistics.min for g in range(md.num_row_groups)]
            maxs = [md.row_group(g).column(idx[col]).statistics.max for g in range(md.num_row_groups)]
            spans[col].append((max(maxs) - min(mins)) / 10000.0)
    # average per-file span must be clearly tighter than the full range on
    # BOTH dims (sqrt(n) tiles of a 2-D grid → span ~ 1/sqrt(tiles) per dim)
    for col in ("a", "b"):
        avg = sum(spans[col]) / len(spans[col])
        assert avg < 0.75, (col, avg, n)
    assert spark.read.parquet(out).count() == 200_000
