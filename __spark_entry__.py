"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``my_cudf_spark.queries``: every implemented operator
family from SURVEY.md §2 registers a named query (Spark callable + DuckDB
oracle SQL) there; this module exposes the registry in the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from my_cudf_spark.queries import load_registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (NDS-H Q1) on /root/testdata/sf0.001."""
    registry = load_registry()
    return registry["ndsh_q1"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2."""
    return {name: q.fn for name, q in load_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each SQL-expressible query."""
    return {name: q.sql for name, q in load_registry().items() if q.sql is not None}
