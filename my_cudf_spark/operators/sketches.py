"""Mergeable distinct-count sketches (Apache DataSketches HLL via Spark
builtins — hll_sketch_agg / hll_union_agg / hll_sketch_estimate).

The 100 TB cardinality pattern: exact COUNT(DISTINCT) re-shuffles the raw
key universe for every regrouping, but an HLL sketch is a fixed-size
mergeable summary — build per fine bucket (e.g. day) ONCE, then answer
any coarser rollup (week/month/source/total) by merging kilobyte sketches
instead of rescanning terabytes.  Estimates carry the standard HLL error
(~1.04/√2^lgk ≈ 1.6% at the default lgConfK=12); tests pin the bound
against exact counts.

Counterpart of the reference's approx surface (tdigest quantiles,
quantiles.hpp) on the cardinality axis; no direct cuDF equivalent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["distinct_sketch", "merge_sketches", "estimate"]


def distinct_sketch(
    df: DataFrame,
    keys: Sequence[str],
    value: str | Column,
    lgk: int = 12,
) -> DataFrame:
    """One HLL sketch of ``value`` per ``keys`` group (column ``sketch``,
    binary, mergeable).  Map-side partial aggregation applies — the
    shuffle carries sketches, never raw values."""
    v = F.col(value) if isinstance(value, str) else value
    return df.groupBy(*keys).agg(F.hll_sketch_agg(v, F.lit(lgk)).alias("sketch"))


def merge_sketches(
    df: DataFrame,
    keys: Sequence[str],
    sketch: str = "sketch",
) -> DataFrame:
    """Roll sketches up to a coarser grouping by union — the whole point:
    a rollup touches |groups| kilobyte sketches, not the raw data."""
    return df.groupBy(*keys).agg(F.hll_union_agg(F.col(sketch)).alias("sketch"))


def estimate(sketch: str | Column = "sketch") -> Column:
    """Estimated distinct count of a sketch column (long)."""
    c = F.col(sketch) if isinstance(sketch, str) else sketch
    return F.hll_sketch_estimate(c)
