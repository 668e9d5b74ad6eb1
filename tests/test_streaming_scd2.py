"""Streaming SCD2 dimension maintenance (streaming/scd2.scd2_history):
batch↔stream parity, chunking/arrival-order independence, late-event
interval splitting, the (key, eff) contract, and the scd2_asof
composition that reproduces point-in-time dimension reads on the
drained table."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from my_cudf_spark.sources import load_table
from my_cudf_spark.streaming import ops as S
from my_cudf_spark.streaming.scd2 import scd2_history
from my_cudf_spark.streaming.sources import replay_table
from tests.conftest import SF_DIR

EV_SCHEMA = "cust long, eff long, priority string, status string"


def _orders_events(spark):
    return load_table(spark, SF_DIR, "orders").select(
        F.col("o_custkey").alias("cust"),
        F.col("o_orderkey").alias("eff"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderstatus").alias("status"),
    )


def _final_snapshot(drained):
    """Max-n_events snapshot per key (the monotone-snapshot convention),
    as a sorted tuple set."""
    from pyspark.sql import Window

    w = Window.partitionBy("cust")
    rows = (
        drained.withColumn("__mx", F.max("n_events").over(w))
        .filter(F.col("n_events") == F.col("__mx"))
        .drop("__mx")
        .dropDuplicates()
        .collect()
    )
    return sorted(tuple(r) for r in rows)


def test_scd2_history_batch_fold(spark):
    """Hand case: consecutive-equal collapse, NULL attrs, re-opened
    attribute value gets a NEW version (type-2, not type-1)."""
    ev = spark.createDataFrame(
        [
            (1, 10, "A", "O"),
            (1, 20, "A", "O"),   # no-op echo — versions nothing
            (1, 30, "B", "O"),
            (1, 40, "A", "O"),   # back to A → a THIRD version, not a merge
            (2, 5, None, "F"),
            (2, 7, None, "F"),   # NULL attrs equal null-safely
            (2, 9, "X", "F"),
        ],
        EV_SCHEMA,
    )
    out = scd2_history(ev, ["cust"], ["priority", "status"], "eff")
    got = sorted((tuple(r) for r in out.collect()), key=lambda t: (t[0], t[3]))
    assert got == [
        (1, "A", "O", 10, 30, False, 4),
        (1, "B", "O", 30, 40, False, 4),
        (1, "A", "O", 40, None, True, 4),
        (2, None, "F", 5, 9, False, 3),
        (2, "X", "F", 9, None, True, 3),
    ]


def test_scd2_stream_equals_batch_under_chunkings(spark):
    """Drained final snapshot == the batch window fold, for two
    different micro-batch chunkings of the orders change feed."""
    want = sorted(tuple(r) for r in scd2_history(
        _orders_events(spark), ["cust"], ["priority", "status"], "eff"
    ).collect())
    for chunks in (2, 4):
        stream, work_dir = replay_table(
            spark, SF_DIR, "orders", "o_orderkey", num_chunks=chunks
        )
        try:
            ch = stream.select(
                F.col("o_custkey").alias("cust"),
                F.col("o_orderkey").alias("eff"),
                F.col("o_orderpriority").alias("priority"),
                F.col("o_orderstatus").alias("status"),
            )
            drained = S.run_to_memory(
                scd2_history(ch, ["cust"], ["priority", "status"], "eff", buckets=8),
                f"scd2_eq_{chunks}",
                output_mode="update",
            )
            assert _final_snapshot(drained) == want, f"chunks={chunks}"
        finally:
            shutil.rmtree(work_dir, ignore_errors=True)


def _replay_frames(spark, frames, tag):
    """Write each frame (list of row tuples) as ONE parquet file with
    ascending mtimes so maxFilesPerTrigger=1 replays them in order (the
    test_streaming._write_chunks pattern)."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            ("cust", pa.int64()),
            ("eff", pa.int64()),
            ("priority", pa.string()),
            ("status", pa.string()),
        ]
    )
    work_dir = tempfile.mkdtemp(prefix=f"scd2_{tag}_")
    now = time.time()
    for i, rows in enumerate(frames):
        fp = os.path.join(work_dir, f"chunk{i}.parquet")
        cols = list(zip(*rows))
        pq.write_table(
            pa.table(
                {n: list(c) for n, c in zip(schema.names, cols)}, schema=schema
            ),
            fp,
        )
        os.utime(fp, (now + i, now + i))
    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(work_dir)
    )
    return stream, work_dir


def test_scd2_late_event_splits_version(spark):
    """An out-of-order event arriving between two already-folded events
    SPLITS the version interval it lands in — and a later event that
    became a no-op echo under the new ordering collapses.  Version
    history is a pure function of the final event set."""
    frames = [
        [(1, 10, "A", "O"), (1, 30, "A", "O")],  # folds to one version A[10,∞)
        [(1, 20, "B", "O")],                     # late: splits into A/B/A
    ]
    stream, work_dir = _replay_frames(spark, frames, "late")
    try:
        drained = S.run_to_memory(
            scd2_history(stream, ["cust"], ["priority", "status"], "eff", buckets=2),
            "scd2_late",
            output_mode="update",
        )
        assert _final_snapshot(drained) == sorted(
            [
                (1, "A", "O", 10, 20, False, 3),
                (1, "B", "O", 20, 30, False, 3),
                (1, "A", "O", 30, None, True, 3),
            ]
        )
        # the batch-1 emission existed and showed the pre-split fold
        early = sorted(
            tuple(r)
            for r in drained.filter(F.col("n_events") == 2).collect()
        )
        assert early == [(1, "A", "O", 10, None, True, 2)]
    finally:
        shutil.rmtree(work_dir, ignore_errors=True)


def test_scd2_redelivery_idempotent(spark):
    """Exact redelivery of a whole micro-batch changes nothing (state is
    the deduplicated event set; n_events stays put)."""
    b1 = [(1, 10, "A", "O"), (1, 20, "B", "O")]
    frames = [b1, b1, [(1, 30, "C", "F")]]
    stream, work_dir = _replay_frames(spark, frames, "redeliver")
    try:
        drained = S.run_to_memory(
            scd2_history(stream, ["cust"], ["priority", "status"], "eff", buckets=2),
            "scd2_rd",
            output_mode="update",
        )
        assert _final_snapshot(drained) == [
            (1, "A", "O", 10, 20, False, 3),
            (1, "B", "O", 20, 30, False, 3),
            (1, "C", "F", 30, None, True, 3),
        ]
    finally:
        shutil.rmtree(work_dir, ignore_errors=True)


def test_scd2_conflicting_same_eff_raises(spark):
    """Two events on one (key, eff) with different attrs have no defined
    fold order — the stream fails loudly instead of picking one."""
    frames = [[(1, 10, "A", "O"), (1, 10, "B", "O")]]
    stream, work_dir = _replay_frames(spark, frames, "conflict")
    try:
        with pytest.raises(Exception, match="same effective time"):
            S.run_to_memory(
                scd2_history(
                    stream, ["cust"], ["priority", "status"], "eff", buckets=2
                ),
                "scd2_conflict",
                output_mode="update",
            )
    finally:
        shutil.rmtree(work_dir, ignore_errors=True)


def test_scd2_asof_composition_on_drained_dimension(spark):
    """cdc.scd2_asof over the drained dimension reproduces the exact
    point-in-time read the batch SCD2 table gives — the training-set
    lineage composition (stream-maintained dimension + as-of pin)."""
    from my_cudf_spark.operators.cdc import scd2_asof

    stream, work_dir = replay_table(
        spark, SF_DIR, "orders", "o_orderkey", num_chunks=3
    )
    try:
        ch = stream.select(
            F.col("o_custkey").alias("cust"),
            F.col("o_orderkey").alias("eff"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderstatus").alias("status"),
        )
        drained = S.run_to_memory(
            scd2_history(ch, ["cust"], ["priority", "status"], "eff", buckets=8),
            "scd2_asof",
            output_mode="update",
        )
        from pyspark.sql import Window

        w = Window.partitionBy("cust")
        dim = (
            drained.withColumn("__mx", F.max("n_events").over(w))
            .filter(F.col("n_events") == F.col("__mx"))
            .drop("__mx", "n_events")
            .dropDuplicates()
        )
        batch = scd2_history(
            _orders_events(spark), ["cust"], ["priority", "status"], "eff"
        ).drop("n_events")
        # pin at the median event — half-open [valid_from, valid_to)
        pin = _orders_events(spark).agg(
            F.percentile_approx("eff", 0.5).cast("long").alias("p")
        ).collect()[0]["p"]
        got = sorted(
            tuple(r)
            for r in scd2_asof(
                dim, F.lit(int(pin)), valid_from="valid_from", valid_to="valid_to"
            ).collect()
        )
        want = sorted(
            tuple(r)
            for r in scd2_asof(
                batch, F.lit(int(pin)), valid_from="valid_from", valid_to="valid_to"
            ).collect()
        )
        assert got == want and len(got) > 0
        # exactly one current-or-historical version covers the pin per key
        assert len({t[0] for t in got}) == len(got)
    finally:
        shutil.rmtree(work_dir, ignore_errors=True)
