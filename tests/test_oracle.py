"""Differential test of every registered query against the DuckDB oracle.

Local mirror of the driver's t2 gate (CORRECTNESS_r{N}.json): same tables,
same comparison shape (row count + columns + order-insensitive exact values).
Queries without oracle SQL get a rows-run smoke check.
"""

from __future__ import annotations

import pytest

from my_cudf_spark.queries import load_registry
from tests.conftest import SF_DIR, assert_matches_oracle

REGISTRY = load_registry()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, oracle):
    q = REGISTRY[name]
    df = q.fn(spark, SF_DIR)
    if q.sql is None:
        assert df.count() >= 0  # rows-only smoke, driver applies same
    else:
        assert_matches_oracle(df, oracle, q.sql)
