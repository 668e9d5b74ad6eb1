"""Shared fixtures: one local SparkSession per test run, DuckDB oracle con.

Mirrors the driver's t2 comparison (row count + schema + order-insensitive
values) so a green local run predicts a green CORRECTNESS gate.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from my_cudf_spark.session import get_spark
from my_cudf_spark.sources import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("my_cudf_spark-tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(SF_DIR, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form for order-insensitive comparison: columns sorted by
    name, timestamps at µs, rows sorted by all columns."""
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[col]):
            df[col] = df[col].astype("datetime64[us]")
        elif df[col].dtype == object:
            # Spark arrays arrive as numpy arrays / lists — make hashable
            df[col] = df[col].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or hasattr(v, "tolist") and not isinstance(v, str) else v
            )
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def assert_matches_oracle(spark_df, oracle_con, sql: str) -> None:
    got = normalize(spark_df.toPandas())
    want = normalize(oracle_con.sql(sql).df())
    assert len(got) == len(want), f"row count {len(got)} != oracle {len(want)}"
    assert list(got.columns) == list(want.columns), (
        f"columns {list(got.columns)} != oracle {list(want.columns)}"
    )
    for col in got.columns:
        assert got[col].dtype == want[col].dtype, (
            f"dtype mismatch on {col!r}: spark {got[col].dtype} vs oracle {want[col].dtype}"
        )
    for col in got.columns:
        g, w = got[col], want[col]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            ok = (g.astype("float64").fillna(-1.0) == w.astype("float64").fillna(-1.0)).all()
        else:
            ok = (g.fillna("\0") == w.fillna("\0")).all() if g.dtype == object else (
                g.isna().equals(w.isna()) and (g.dropna().values == w.dropna().values).all()
            )
        if not ok:
            diff = (got[col] != want[col])
            raise AssertionError(
                f"column {col!r} mismatch; first diffs:\n"
                f"spark:\n{got[diff].head(5)}\noracle:\n{want[diff].head(5)}"
            )
