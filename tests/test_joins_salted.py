"""Salted-join equivalence: the skew-resistant rewrite must return exactly
the plain join's rows (salting only changes the physical distribution)."""

from __future__ import annotations

from pyspark.sql import functions as F

from my_cudf_spark.operators.joins import salted_join
from my_cudf_spark.sources import load_table
from tests.conftest import SF_DIR


def test_salted_join_equals_plain(spark):
    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    # small dim keyed by user_id
    dim = (
        ev.groupBy("user_id").agg(F.avg("value").alias("user_avg"))
    )
    plain = ev.join(dim, ["user_id"]).select("event_id", "user_id", "user_avg")
    salted = salted_join(ev, dim, ["user_id"], salt=8).select(
        "event_id", "user_id", "user_avg"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id")
    dim = ev.filter(F.col("user_id") < 10).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    plain = ev.join(dim, ["user_id"], "left")
    salted = salted_join(ev, dim, ["user_id"], how="left", salt=4)
    assert plain.count() == salted.count()
    assert (
        plain.filter(F.col("n").isNull()).count()
        == salted.filter(F.col("n").isNull()).count()
    )


def test_salted_join_rejects_right_preserving(spark):
    # right/full would replicate each unmatched right row once per salt copy
    import pytest

    from my_cudf_spark.sources import load_table as _lt

    ev = _lt(spark, SF_DIR, "events").select("event_id", "user_id")
    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(ev, ev, ["user_id"], how="right")
    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(ev, ev, ["user_id"], how="full")
