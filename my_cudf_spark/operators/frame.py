"""Order-aware frame verbs — the cudf_polars IR nodes that are not literally
one Spark method call (SURVEY.md §2.1).

cudf frames are row-ordered; Spark frames are not. Every order-sensitive verb
here therefore takes an explicit ``order_by`` column list (SURVEY.md §7.4.1)
— at 100 TB an implicit row order does not exist, so the API makes the
ordering key a first-class argument instead of pretending.

Reference parity (file:line):
- Distinct keep first/last/any/none: ``cudf_polars/dsl/ir.py:1519-1556``,
  ``cpp/include/cudf/stream_compaction.hpp:286-340``.
- Slice: ``ir.py:1687``; Sort: ``ir.py:1606``; Union: ``ir.py:1943``;
  HConcat: ``ir.py:1968``; MergeSorted: ``ir.py:1752``.
- unique (consecutive dedup): ``stream_compaction.hpp:258``.
- shift / copy_if_else / sample: ``cpp/include/cudf/copying.hpp:423/626/848``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Sentinel: shift/unique_consecutive demand an explicit partitioning
# decision — a key (distributed) or a literal None (global single-task
# window, bounded frames only).  See the round-7 review note on silent
# scale-unsafe defaults.
_PARTITION_REQUIRED: object = object()

__all__ = [
    "distinct",
    "slice_rows",
    "unique_consecutive",
    "hconcat",
    "merge_sorted",
    "with_row_index",
    "shift",
    "top_k",
    "query_expr",
]


def _cols(cols: Sequence[str | Column]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cols]


def distinct(
    df: DataFrame,
    subset: Sequence[str] | None = None,
    keep: str = "any",
    order_by: Sequence[str | Column] | None = None,
) -> DataFrame:
    """Drop duplicates with cudf/polars ``keep`` semantics.

    keep='any'   → plain dropDuplicates (fastest: partial aggregation).
    keep='first'/'last' → per-key min/max along ``order_by`` via one
    window-free groupBy join-back? No — single shuffle: row_number over
    (partition by subset order by order_by) == 1.
    keep='none'  → keep only keys that appear exactly once.

    At scale: one hash shuffle on ``subset`` either way; 'any' additionally
    benefits from map-side partial distinct.
    """
    subset = list(subset) if subset else df.columns
    if keep == "any":
        return df.dropDuplicates(subset)
    if keep == "none":
        counts = Window.partitionBy(*subset)
        return (
            df.withColumn("__n", F.count(F.lit(1)).over(counts))
            .filter(F.col("__n") == 1)
            .drop("__n")
        )
    if keep in ("first", "last"):
        if not order_by:
            raise ValueError("keep='first'/'last' requires order_by (Spark frames are unordered)")
        ordering = _cols(order_by)
        if keep == "last":
            ordering = [c.desc() for c in ordering]
        w = Window.partitionBy(*subset).orderBy(*ordering)
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    raise ValueError(f"keep must be any|first|last|none, got {keep!r}")


def slice_rows(
    df: DataFrame, offset: int, length: int | None, order_by: Sequence[str | Column]
) -> DataFrame:
    """Slice(offset, length) relative to an explicit total order (ir.py:1687).

    Uses Spark's native offset/limit which plan as a single-pass
    TakeOrderedAndProject for small slices — no full sort materialization.
    """
    out = df.orderBy(*_cols(order_by)).offset(offset)
    return out.limit(length) if length is not None else out


def top_k(df: DataFrame, k: int, order_by: Sequence[str | Column]) -> DataFrame:
    """nlargest/nsmallest (dataframe.py nlargest): per-partition top-k then
    merge — Spark's TakeOrderedAndProject, no global sort."""
    return df.orderBy(*_cols(order_by)).limit(k)


def unique_consecutive(
    df: DataFrame,
    subset: Sequence[str],
    order_by: Sequence[str | Column],
    partition_by: "Sequence[str] | None" = _PARTITION_REQUIRED,
) -> DataFrame:
    """Keep the first row of each run of equal ``subset`` values along
    ``order_by`` (stream_compaction.hpp:258 ``unique``).

    ``partition_by`` is REQUIRED: pass a key whenever runs cannot cross it
    (e.g. per-user event streams) so the lag window distributes, or an
    explicit ``partition_by=None`` to opt in to the GLOBAL window — one
    task sees every row, acceptable only for bounded frames.  Omitting the
    argument raises instead of silently planning the single-task path
    (scale-unsafe defaults should be visible choices).
    """
    if partition_by is _PARTITION_REQUIRED:
        raise TypeError(
            "unique_consecutive: pass partition_by=<keys> (distributed) or "
            "an explicit partition_by=None to opt in to the single-task "
            "global window (bounded frames only)"
        )
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(*_cols(order_by))
    else:
        w = Window.orderBy(*_cols(order_by))
    changed = F.lit(False)
    for c in subset:
        prev = F.lag(F.col(c)).over(w)
        changed = changed | ~prev.eqNullSafe(F.col(c))
    first_row = F.row_number().over(w) == 1
    return (
        df.withColumn("__new_run", first_row | changed)
        .filter(F.col("__new_run"))
        .drop("__new_run")
    )


def with_row_index(df: DataFrame, name: str = "row_index", order_by: Sequence[str | Column] | None = None) -> DataFrame:
    """Row-index column (MapFunction row_index, ir.py:1797-1823).

    Without ``order_by``: partition-stable but non-contiguous ids
    (monotonically_increasing_id) — O(1), no shuffle.
    With ``order_by``: contiguous 0..n-1 following the order, computed as an
    exclusive global cumsum of 1 via ``packing.global_cumsum`` — two narrow
    range-partitioned passes plus a broadcast of per-partition offsets, so no
    single-partition window anywhere; safe on scale-growing frames.
    ``order_by`` must be a total order (ties → nondeterministic indices).
    """
    if order_by is None:
        return df.withColumn(name, F.monotonically_increasing_id())
    from my_cudf_spark.operators.packing import global_cumsum

    return (
        global_cumsum(
            df.withColumn("__one", F.lit(1)), _cols(order_by), "__one", out_col=name
        )
        .drop("__one")
    )


def hconcat(
    left: DataFrame,
    right: DataFrame,
    order_left: Sequence[str | Column],
    order_right: Sequence[str | Column],
    index_col: str | None = None,
) -> DataFrame:
    """Positional horizontal concat (HConcat, ir.py:1968) via row-index
    equi-join on the two explicit orderings.  ``index_col`` keeps the
    positional index in the output (cudf's hconcat result carries its
    RangeIndex) — the join key IS that index, so exposing it is free and
    saves callers a third row-index pass."""
    l = with_row_index(left, "__ri", order_left)
    r = with_row_index(right, "__ri", order_right)
    out = l.join(r, "__ri", "inner")
    if index_col is None:
        return out.drop("__ri")
    return out.withColumnRenamed("__ri", index_col)


def merge_sorted(frames: Sequence[DataFrame], order_by: Sequence[str | Column]) -> DataFrame:
    """K-way merge of sorted frames (MergeSorted ir.py:1752, merge.hpp:104).

    In Spark sortedness is a physical property: union then orderBy; the
    optimizer handles the merge. Semantics (not physical merging) preserved.
    """
    out = frames[0]
    for other in frames[1:]:
        out = out.unionByName(other, allowMissingColumns=True)
    return out.orderBy(*_cols(order_by))


def shift(
    df: DataFrame,
    cols: Sequence[str],
    periods: int,
    order_by: Sequence[str | Column],
    partition_by: "Sequence[str] | None" = _PARTITION_REQUIRED,
    fill_value=None,
) -> DataFrame:
    """Column shift along an explicit order (copying.hpp:423; grouped
    variant = groupby.shift, cudf groupby.py).

    ``partition_by`` is REQUIRED: a key distributes the lag/lead window;
    an explicit ``partition_by=None`` opts in to the GLOBAL window (one
    task holds the whole frame — bounded frames only).  Omitting the
    argument raises instead of silently planning the single-task path.
    """
    if partition_by is _PARTITION_REQUIRED:
        raise TypeError(
            "shift: pass partition_by=<keys> (distributed) or an explicit "
            "partition_by=None to opt in to the single-task global window "
            "(bounded frames only)"
        )
    w = Window.orderBy(*_cols(order_by))
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(*_cols(order_by))
    out = df
    for c in cols:
        expr = F.lag(F.col(c), periods).over(w) if periods >= 0 else F.lead(F.col(c), -periods).over(w)
        if fill_value is not None:
            expr = F.coalesce(expr, F.lit(fill_value))
        out = out.withColumn(f"{c}_shifted", expr)
    return out


def value_counts(
    df: DataFrame,
    cols: Sequence[str],
    normalize: bool = False,
) -> DataFrame:
    """Frequency table of value combinations (cudf
    DataFrame.value_counts dataframe.py:8177; Series.value_counts
    series.py:3117), ordered count-desc with the values as tiebreak.
    The normalizing total rides a single-row broadcast over the already
    aggregated frame — never a second scan of the input."""
    counted = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("count"))
    if normalize:
        total = counted.agg(F.sum("count").alias("__total"))
        counted = counted.crossJoin(F.broadcast(total)).withColumn(
            "fraction", F.col("count").cast("double") / F.col("__total")
        ).drop("__total")
    return counted.orderBy(F.desc("count"), *cols)


def query_expr(df: DataFrame, expr: str) -> DataFrame:
    """pandas/cudf ``DataFrame.query`` filter surface (cudf
    dataframe.py:4586 query / :8029 eval — the mini-expression entry the
    reference parses to its own AST): translate the pandas boolean-
    expression dialect to Spark SQL and filter.

    Translated tokens (outside string literals): ``&``→AND, ``|``→OR,
    ``~``→NOT, ``==``/``!=``/comparisons and arithmetic pass through
    (identical syntax), python keywords ``and/or/not/in`` already match
    Spark SQL.  Backtick-quoted names pass through (both dialects use
    backticks for odd identifiers); backslash-escaped quotes inside string
    literals do not terminate the literal.

    Precedence caveat: in pandas/Python, ``&``/``|`` bind TIGHTER than
    comparisons (hence pandas' mandatory parentheses around each
    comparison), while SQL AND/OR bind looser — so only the
    pandas-recommended fully-parenthesized form (``(a == b) & (c > d)``)
    keeps its meaning under translation; an unparenthesized ``a == b & c``
    is rejected by pandas itself (TypeError on ambiguous Series truth
    value) and is NOT supported here.
    """
    out: list[str] = []
    i, n = 0, len(expr)
    in_str: str | None = None
    while i < n:
        ch = expr[i]
        if in_str is not None:
            if ch == "\\" and i + 1 < n:
                out.append(ch)
                out.append(expr[i + 1])
                i += 2
                continue
            out.append(ch)
            if ch == in_str:
                in_str = None
            i += 1
            continue
        if ch in ("'", '"'):
            in_str = ch
            out.append(ch)
            i += 1
            continue
        if ch == "&":
            out.append(" AND ")
            i += 1
        elif ch == "|":
            out.append(" OR ")
            i += 1
        elif ch == "~":
            out.append(" NOT ")
            i += 1
        else:
            out.append(ch)
            i += 1
    return df.filter(F.expr("".join(out)))
