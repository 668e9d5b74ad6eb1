"""shift/unique_consecutive partitioning contract (round-7 review note #3):
the scale-unsafe global window must be an explicit opt-in, never a silent
default."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_shift_requires_partitioning_decision(spark):
    from my_cudf_spark.operators import frame as fr

    df = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "k int, v int")
    with pytest.raises(TypeError, match="partition_by"):
        fr.shift(df, ["v"], 1, ["k"])
    # Explicit None opts in to the global window (bounded frames).
    got = {r["k"]: r["v_shifted"] for r in fr.shift(df, ["v"], 1, ["k"], partition_by=None).collect()}
    assert got == {1: None, 2: 10, 3: 20}
    # Keyed form distributes and restarts per key.
    df2 = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 20.0), (2, 1, 30.0)], "g int, k int, v double"
    )
    got2 = {
        (r["g"], r["k"]): r["v_shifted"]
        for r in fr.shift(df2, ["v"], 1, ["k"], partition_by=["g"]).collect()
    }
    assert got2 == {(1, 1): None, (1, 2): 10.0, (2, 1): None}


def test_unique_consecutive_requires_partitioning_decision(spark):
    from my_cudf_spark.operators import frame as fr

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "a")], "i int, x string"
    )
    with pytest.raises(TypeError, match="partition_by"):
        fr.unique_consecutive(df, ["x"], ["i"])
    got = sorted(
        r["i"] for r in fr.unique_consecutive(df, ["x"], ["i"], partition_by=None).collect()
    )
    assert got == [1, 3, 4]
