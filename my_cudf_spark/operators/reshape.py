"""Reshape operators (SURVEY.md §2.9; reference
``python/cudf/cudf/core/reshape.py`` — melt :547, pivot :1061, pivot_table
:1513, crosstab :1398, get_dummies :721; ``cpp/include/cudf/reshape.hpp`` /
``transform.hpp:182`` one_hot_encode; transpose.hpp:46).

All are single-shuffle Spark plans: melt is a narrow ``unpivot``; pivot and
crosstab are one groupBy with pivot (two-phase: distinct-values scan, then
pivoted partial agg). For 100 TB pivots pass ``values=`` explicitly to skip
the distinct scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "melt",
    "pivot",
    "pivot_table",
    "crosstab",
    "get_dummies",
    "unstack",
    "transpose",
    "interleave_columns",
    "tile",
]


def melt(
    df: DataFrame,
    id_vars: Sequence[str],
    value_vars: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """melt (reshape.py:547) → native unpivot (narrow, no shuffle)."""
    return df.unpivot(list(id_vars), list(value_vars), var_name, value_name)


def pivot(
    df: DataFrame,
    index: Sequence[str],
    on: str,
    agg: Column,
    values: Sequence[str] | None = None,
) -> DataFrame:
    """pivot (reshape.py:1061) → groupBy().pivot().agg(). ``values``
    short-circuits the distinct-values job — required at scale."""
    g = df.groupBy(*index)
    p = g.pivot(on, list(values)) if values is not None else g.pivot(on)
    return p.agg(agg)


def pivot_table(
    df: DataFrame,
    index: Sequence[str],
    on: str,
    agg: Column,
    values: Sequence[str] | None = None,
    fill_value=None,
) -> DataFrame:
    """pivot_table (reshape.py:1513, dataframe.py:7730)."""
    out = pivot(df, index, on, agg, values)
    if fill_value is not None:
        out = out.na.fill(fill_value, [c for c in out.columns if c not in index])
    return out


def crosstab(df: DataFrame, row: str, col: str, values: Sequence[str] | None = None) -> DataFrame:
    """crosstab (reshape.py:1398): count matrix of two categoricals."""
    return pivot_table(df, [row], col, F.count(F.lit(1)), values=values, fill_value=0)


def get_dummies(df: DataFrame, column: str, categories: Sequence[str], prefix: str | None = None) -> DataFrame:
    """get_dummies / one_hot_encode (reshape.py:721, transform.hpp:182).

    Explicit ``categories`` keeps it a narrow map-side projection (no
    distinct scan, no shuffle) — the only shape that works at 100 TB.
    """
    prefix = prefix if prefix is not None else column
    return df.select(
        "*",
        *[
            (F.col(column) == v).cast("int").alias(f"{prefix}_{v}")
            for v in categories
        ],
    )


def unstack(
    df: DataFrame,
    index: Sequence[str],
    column: str,
    value: str,
    fill_value=None,
) -> DataFrame:
    """unstack (reference python/cudf/cudf/core/reshape.py:1174): pivot the
    ``column`` level of a long frame into one output column per distinct
    value, cells taken from ``value``.  (index, column) pairs are expected
    unique — like the reference, duplicate cells are an input error; we
    surface ``first(value)`` per cell.  One shuffle (groupBy+pivot); pass a
    pre-aggregated frame at scale so the distinct-values scan is tiny."""
    out = df.groupBy(*index).pivot(column).agg(F.first(value))
    if fill_value is not None:
        out = out.na.fill(fill_value, [c for c in out.columns if c not in index])
    return out


def transpose(df: DataFrame, index_col: str) -> DataFrame:
    """transpose (transpose.hpp:46) via melt + pivot. Only sane for small
    frames (the reference holds the whole table in memory too)."""
    value_cols = [c for c in df.columns if c != index_col]
    melted = df.unpivot([index_col], value_cols, "variable", "value")
    return melted.groupBy("variable").pivot(index_col).agg(F.first("value"))


def interleave_columns(
    df: DataFrame, cols: Sequence[str], pos_col: str = "pos", out_col: str = "value"
) -> DataFrame:
    """interleave_columns (reshape.hpp:53): k same-typed columns → one
    column of k·n rows, row-major.  posexplode(array(cols)) — a narrow
    generate, no shuffle; ``pos_col`` (1-based, matching the within-row
    source position) keeps the interleave order explicit since Spark rows
    carry no implicit order."""
    others = [c for c in df.columns if c not in cols]
    return df.select(
        *others, F.posexplode(F.array(*cols)).alias(pos_col, out_col)
    ).withColumn(pos_col, F.col(pos_col) + 1)


def tile(df: DataFrame, count: int, rep_col: str = "rep") -> DataFrame:
    """tile (reshape.hpp:77): repeat every row ``count`` times.  explode of
    a literal sequence — narrow, no shuffle; ``rep_col`` ∈ [0, count) tags
    the copy (the reference's output order is an exec detail we surface as
    a column)."""
    return df.withColumn(rep_col, F.explode(F.sequence(F.lit(0), F.lit(count - 1))))
