"""User-defined-function surface (SURVEY.md §2.11).

Reference parity map (all from the cudf Python layer, which JIT-compiles
user Python with numba / jitify):

- ``Series.apply`` / masked scalar UDFs (``python/cudf/cudf/core/udf/``,
  ``dataframe.py:4683``)        → :func:`apply_elementwise` (Arrow-batched
  pandas_udf — the vectorized slow path; builtin Column exprs remain the
  fast path, Catalyst-codegen'd)
- ``apply_rows``/``apply_chunks`` (numba kernels over row chunks,
  ``dataframe.py:4999/5078``)   → :func:`apply_batches` (mapInPandas: the
  user function sees a pandas chunk per Arrow batch, mirroring
  apply_chunks' chunk view) and :func:`apply_arrow_batches` (mapInArrow,
  zero-copy RecordBatch view)
- ``GroupBy.apply`` (``groupby.py:1858/1758``), ``apply_grouped``
                                → :func:`grouped_apply` (applyInPandas,
  GROUPED_MAP: whole group as one pandas frame)
- PTX/CUDA/HOST_UDF aggregations (aggregation.hpp:113-115)
                                → :func:`grouped_agg_udf` (pandas_udf
  GROUPED_AGG usable in ``df.groupBy().agg`` and over Windows)

Scale: every surface here is Arrow-batched (no per-row Python round
trips); grouped_apply shuffles once on the keys and holds ONE group in
memory per worker at a time — groups must fit an executor, which is the
same contract the reference's apply_grouped has on one GPU.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "apply_elementwise",
    "apply_batches",
    "apply_arrow_batches",
    "grouped_apply",
    "grouped_agg_udf",
]


def apply_elementwise(fn: Callable, return_type: str) -> Callable[..., Column]:
    """Vectorized elementwise UDF: ``fn`` receives pandas Series (one per
    argument column) and returns a Series.  Use ONLY when no builtin
    Column expression exists — builtins stay in whole-stage codegen."""
    import inspect

    import pandas as pd

    # `from __future__ import annotations` callers have string hints the
    # udf type-inference can't resolve — set object annotations for every
    # parameter explicitly.
    params = inspect.signature(fn).parameters
    fn.__annotations__ = {name: pd.Series for name in params} | {"return": pd.Series}
    return F.pandas_udf(fn, return_type)


def apply_batches(
    df: DataFrame, fn: Callable[[Any], Any], schema: str
) -> DataFrame:
    """apply_chunks parity: ``fn(pandas.DataFrame) -> pandas.DataFrame``
    applied per Arrow batch via mapInPandas.  Output schema is explicit
    (DDL string), like the reference's ``outcols``."""

    def run(batches: Iterator[Any]) -> Iterator[Any]:
        for pdf in batches:
            yield fn(pdf)

    return df.mapInPandas(run, schema=schema)


def apply_arrow_batches(
    df: DataFrame, fn: Callable[[Any], Any], schema: str
) -> DataFrame:
    """Zero-copy variant: ``fn(pyarrow.RecordBatch) -> pyarrow.RecordBatch``
    via mapInArrow — for UDFs that stay columnar (no pandas conversion)."""

    def run(batches: Iterator[Any]) -> Iterator[Any]:
        for rb in batches:
            yield fn(rb)

    return df.mapInArrow(run, schema=schema)


def grouped_apply(
    df: DataFrame,
    keys: list[str],
    fn: Callable[[Any], Any],
    schema: str,
) -> DataFrame:
    """GroupBy.apply parity: ``fn(pandas.DataFrame) -> pandas.DataFrame``
    per key group (applyInPandas GROUPED_MAP)."""
    return df.groupBy(*keys).applyInPandas(fn, schema=schema)


def grouped_agg_udf(fn: Callable, return_type: str) -> Callable[..., Column]:
    """Custom aggregation (HOST_UDF parity): ``fn(pandas.Series) -> scalar``
    usable in groupBy().agg and over windows (pandas_udf GROUPED_AGG)."""
    return F.pandas_udf(fn, return_type, F.PandasUDFType.GROUPED_AGG)
