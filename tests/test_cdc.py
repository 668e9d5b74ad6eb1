"""CDC operator semantics (operators/cdc.py): hand-computed MERGE /
changelog-compaction / SCD2 cases, including the edges the fixture queries
cannot reach (NULL keys, update-subset preservation, NULL-attr inserts,
no-op echoes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from my_cudf_spark.operators import cdc as C


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


def test_apply_changelog_latest_wins_and_deletes(spark):
    ch = spark.createDataFrame(
        [
            (1, 10, "I", 100.0),
            (1, 20, "U", 150.0),
            (2, 5, "I", 50.0),
            (2, 9, "D", None),
            (3, 1, "D", None),
            (3, 2, "I", 30.0),
        ],
        "k long, seq long, op string, val double",
    )
    out = C.apply_changelog(ch, ["k"], "seq", "op")
    assert out.columns == ["k", "val"]
    assert _rows(out, "k") == [(1, 150.0), (3, 30.0)]


def test_merge_upsert_update_delete_insert_and_untouched(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, bal double",
    )
    source = spark.createDataFrame(
        [(1, 11.0, False), (2, None, True), (9, 99.0, False), (8, 88.0, True)],
        "k long, bal double, del boolean",
    )
    out = C.merge_upsert(target, source, ["k"], delete_col="del")
    # 1 updated, 2 deleted, 3 untouched, 9 inserted (name NULL),
    # 8 delete-of-absent-key is a no-op
    assert _rows(out, "k") == [
        (1, "a", 11.0),
        (3, "c", 30.0),
        (9, None, 99.0),
    ]


def test_merge_upsert_update_subset_preserves_other_columns(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0, "x")], "k long, name string, bal double, seg string"
    )
    source = spark.createDataFrame(
        [(1, 11.0, "ignored")], "k long, bal double, seg string"
    )
    out = C.merge_upsert(target, source, ["k"], update_cols=["bal"])
    assert _rows(out, "k") == [(1, "a", 11.0, "x")]


def test_merge_upsert_validates_update_cols(spark):
    target = spark.createDataFrame([(1, 1.0)], "k long, bal double")
    source = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="absent from source"):
        C.merge_upsert(target, source, ["k"], update_cols=["bal"])


def test_merge_upsert_null_key_matches_null_safe(spark):
    # eqNullSafe key match: a NULL-key source row updates the NULL-key
    # target row instead of silently inserting a duplicate
    target = spark.createDataFrame([(None, 1.0), (2, 2.0)], "k long, bal double")
    source = spark.createDataFrame([(None, 9.0)], "k long, bal double")
    out = C.merge_upsert(target, source, ["k"])
    assert _rows(out, F.col("k").asc_nulls_first()) == [(None, 9.0), (2, 2.0)]


def _scd2_frames(spark):
    dim = spark.createDataFrame(
        [
            (1, "A", 100, None, True),
            (1, "OLD", 50, 100, False),  # closed history row
            (2, "B", 100, None, True),
        ],
        "k long, seg string, valid_from long, valid_to long, is_current boolean",
    )
    ch = spark.createDataFrame(
        [(1, "A2", 200), (2, "B", 200), (3, None, 200)],
        "k long, seg string, eff long",
    )
    return dim, ch


def test_scd2_apply_close_noop_insert(spark):
    dim, ch = _scd2_frames(spark)
    out = C.scd2_apply(dim, ch, ["k"], ["seg"], "eff")
    got = _rows(out, "k", "valid_from")
    assert got == [
        (1, "OLD", 50, 100, False),   # history untouched
        (1, "A", 100, 200, False),    # changed → closed at eff
        (1, "A2", 200, None, True),   # new open version
        (2, "B", 100, None, True),    # no-op echo: untouched
        (3, None, 200, None, True),   # new key, NULL attr still inserts
    ]


def test_scd2_apply_null_key_noop_echo_inserts_nothing(spark):
    dim = spark.createDataFrame(
        [(None, "A", 100, None, True)],
        "k long, seg string, valid_from long, valid_to long, is_current boolean",
    )
    ch = spark.createDataFrame([(None, "A", 200)], "k long, seg string, eff long")
    out = C.scd2_apply(dim, ch, ["k"], ["seg"], "eff")
    assert _rows(out, "valid_from") == [(None, "A", 100, None, True)]


def test_scd2_apply_result_is_valid_scd2(spark):
    dim, ch = _scd2_frames(spark)
    out = C.scd2_apply(dim, ch, ["k"], ["seg"], "eff")
    per_key = out.groupBy("k").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_open"),
        F.sum(F.col("valid_to").isNull().cast("int")).alias("n_unclosed"),
    )
    # exactly one open, unclosed version per key
    assert all(r["n_open"] == 1 and r["n_unclosed"] == 1 for r in per_key.collect())
