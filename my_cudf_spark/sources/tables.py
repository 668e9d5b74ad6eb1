"""Fixture table loaders.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file each under
``/root/testdata/sf{0.001,0.01,0.1}/``.

Schema quirks handled here (and only here):

- ``events.ts`` is parquet timestamp[ns].  Spark has no ns timestamp type
  and rejects the file outright, so we read with
  ``spark.sql.legacy.parquet.nanosAsLong=true`` and convert to a µs
  TIMESTAMP_NTZ (truncating ns → µs exactly like DuckDB's
  ``CAST(ts_ns AS TIMESTAMP)``).  SURVEY.md §7.4.2.
- All other timestamp columns are timestamp[ms] and arrive as TIMESTAMP_NTZ
  natively.

At cluster scale these loaders would point at a directory of many files /
a catalog table; the call shape stays the same.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from my_cudf_spark.session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, normalizing schema quirks."""
    apply_runtime_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name == "events":
        # Fixture generations vary: ts is either ns-as-long or a native
        # timestamp.  Normalize both to µs TIMESTAMP_NTZ (session tz pinned
        # to UTC makes the TimestampType→NTZ cast an identity on the
        # wall-clock value).
        ts_type = df.schema["ts"].dataType.typeName()
        if ts_type in ("long", "integer"):
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
            )
        else:
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return df


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register fixture tables as temp views for spark.sql use."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
