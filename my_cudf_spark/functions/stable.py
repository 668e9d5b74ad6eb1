"""Decimal-stable aggregate helpers for differential testing.

Summing doubles is order-dependent: Spark's partitioned partial/final
aggregation and DuckDB's single-node aggregation visit rows in different
orders, so ``SUM(double)`` differs in the low bits between engines — enough
to break a value-hash comparison.  The fix used throughout ``queries/``:
cast inputs to DECIMAL (exact, associative arithmetic), aggregate, cast the
final result back to DOUBLE.  Both engines then produce bit-identical
doubles regardless of row order or partitioning.

This mirrors the determinism rules in FIXTURES.md and is a *testing* device;
the public operator API (``my_cudf_spark.operators``/``functions``) uses
native double aggregation on the hot path.

Decimal-width budget: Spark multiplication produces precision p1+p2+1 and
scale s1+s2, and anything past precision 38 triggers inexact rounding — so
product chains must stay under 38.  With PRICE=(12,2) and FRAC=(7,4):
price*frac*frac = (28,10), and SUM grows precision to the 38 cap without
losing scale.  Identical exact values on the DuckDB side.

Reference parity: aggregation Kind enum
``/root/reference/cpp/include/cudf/aggregation.hpp:86-124``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# General-purpose sum/avg cast: fits ~1e9 rows of ~1e6-magnitude values.
DEC = "decimal(27,6)"
# Price-like columns (2 decimal digits, < 1e10).
PRICE = "decimal(12,2)"
# Fractions like discount/tax (≤ 4 decimal digits, < 100).
FRAC = "decimal(6,4)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str, cast: str = DEC) -> Column:
    """Order-independent SUM of a double column, returned as double."""
    return F.sum(_c(col).cast(cast)).cast("double")


def davg(col: Column | str, cast: str = DEC) -> Column:
    """Order-independent AVG: exact decimal sum, double division."""
    c = _c(col)
    return F.sum(c.cast(cast)).cast("double") / F.count(c)


def price(col: Column | str) -> Column:
    return _c(col).cast(PRICE)


def one_minus(col: Column | str) -> Column:
    """(1 - frac) computed in decimal: exact."""
    return F.lit(1).cast(FRAC) - _c(col).cast(FRAC)


def one_plus(col: Column | str) -> Column:
    return F.lit(1).cast(FRAC) + _c(col).cast(FRAC)


# --- matching DuckDB SQL fragments -------------------------------------------
# Kept textually adjacent to the Column helpers so the two dialects cannot
# drift; queries/ modules build both sides from these.
#
# DuckDB's direct DECIMAL→DOUBLE cast is not correctly rounded for wide
# decimals (observed 1-ulp error vs Python/Java on scale-10 sums); the
# VARCHAR roundtrip parses the exact decimal string and IS correctly
# rounded, matching Spark's BigDecimal.doubleValue().

def sql_dec2dbl(expr: str) -> str:
    """Correctly-rounded DECIMAL→DOUBLE for DuckDB."""
    return f"CAST(CAST({expr} AS VARCHAR) AS DOUBLE)"


def sql_dsum(expr: str, cast: str = DEC) -> str:
    return sql_dec2dbl(f"SUM(CAST({expr} AS {cast}))")


def sql_davg(expr: str, cast: str = DEC) -> str:
    return f"{sql_dec2dbl(f'SUM(CAST({expr} AS {cast}))')} / COUNT({expr})"


SQL_PRICE = PRICE.upper()
SQL_FRAC = FRAC.upper()


def sql_price(expr: str) -> str:
    return f"CAST({expr} AS {SQL_PRICE})"


def sql_one_minus(expr: str) -> str:
    return f"(CAST(1 AS {SQL_FRAC}) - CAST({expr} AS {SQL_FRAC}))"


def sql_one_plus(expr: str) -> str:
    return f"(CAST(1 AS {SQL_FRAC}) + CAST({expr} AS {SQL_FRAC}))"
