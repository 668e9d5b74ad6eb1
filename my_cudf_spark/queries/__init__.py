"""Correctness-query registry.

Every implemented operator family from SURVEY.md §2 registers here as a
named query: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) the equivalent DuckDB oracle SQL.  ``__spark_entry__.py``
exposes the registry to the driver; ``tests/test_oracle.py`` mirrors the
driver's comparison locally.

Determinism contract (FIXTURES.md): float aggregates go through the
decimal-stable helpers in ``functions.stable``; result column names are
aliased identically on both sides; every query's result is hashable
order-insensitively (no ambiguous ties).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None → rows-only check


REGISTRY: dict[str, Query] = {}

# Modules that register queries on import. Order = SURVEY.md §2 walk.
_QUERY_MODULES = (
    "my_cudf_spark.queries.tpch_extra",
    "my_cudf_spark.queries.pipeline_queries",
    "my_cudf_spark.queries.ndsh",
    "my_cudf_spark.queries.relational",
    "my_cudf_spark.queries.window_queries",
    "my_cudf_spark.queries.function_queries",
    "my_cudf_spark.queries.reshape_queries",
    "my_cudf_spark.queries.text_queries",
    "my_cudf_spark.queries.sampling_queries",
    "my_cudf_spark.queries.vector_queries",
    "my_cudf_spark.queries.multimodal_queries",
    "my_cudf_spark.queries.io_queries",
    "my_cudf_spark.queries.udf_queries",
    "my_cudf_spark.queries.agg_misc_queries",
    "my_cudf_spark.queries.cdc_queries",
    "my_cudf_spark.queries.frame_queries",
    "my_cudf_spark.queries.event_queries",
    "my_cudf_spark.queries.streaming_queries",
)


def register(name: str, sql: str | None = None):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable to the registry."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, sql=sql)
        return fn

    return wrap


def load_registry() -> dict[str, Query]:
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # tolerate not-yet-written modules during incremental build
            if mod.rsplit(".", 1)[-1] not in str(e):
                raise
    return REGISTRY
