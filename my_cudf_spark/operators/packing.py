"""Sequence packing for LLM training pipelines (north star; no reference
equivalent — the reference stops at tokenization).

``pack_sequences`` implements the standard concat-then-chunk packing:
documents are laid out in a deterministic order, token offsets accumulate
globally, and each fixed-``budget`` window of the token stream is one
training sequence ("pack").  A document whose span crosses a boundary
straddles two (or more) packs — the GPT-style regime where sequences are
chunked, not the bin-packing regime (exact next-fit is a sequential fold
over the full prefix and does not distribute; concat-then-chunk is what
large-scale pipelines run).

The only hard part at 100 TB is the GLOBAL cumulative sum: a bare
``Window.orderBy(...)`` with no partition key pulls the whole table through
ONE task.  ``global_cumsum`` does it in two phases instead:

1. range-repartition on the order key, partition-local window cumsum —
   fully parallel;
2. per-partition totals (one row per partition — metadata-sized) get a
   prefix-sum of their own and broadcast back as offsets.

Wall-clock is two narrow passes + one broadcast join; no stage sees more
than one partition's rows in one task.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

__all__ = ["global_cumsum", "pack_sequences"]


def global_cumsum(
    df: DataFrame,
    order_col: str | Sequence[str | Column],
    value_col: str,
    out_col: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """EXCLUSIVE global running sum of ``value_col`` in ``order_col`` order
    (row i gets the sum of all strictly-earlier rows), without a
    single-partition window.

    ``order_col`` (one column or a list) must be a total order (ties would
    make the prefix sum nondeterministic across runs)."""
    if num_partitions is None:
        num_partitions = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    order_cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    d = (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    # Pin the range exchange to ONE concrete RDD.  The totals branch and the
    # final join both read `d`; left as two plan branches, each instantiates
    # its own range exchange whose sampled boundaries can differ between
    # executions — __pid then disagrees across branches and the offsets
    # misalign (observed as duplicate/gapped indices).  localCheckpoint
    # (lazy) materializes the shuffle once so every consumer shares the same
    # partitioner; lineage truncation is the same device clustering.py uses
    # per CC round.
    d = d.localCheckpoint(eager=False)
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # One row per partition; the prefix window below runs on that tiny
    # frame, so its single-partition sort is metadata-sized by design.
    totals = d.groupBy("__pid").agg(F.sum(value_col).alias("__tot"))
    w_prefix = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid", F.coalesce(F.sum("__tot").over(w_prefix), F.lit(0)).alias("__ofs")
    )
    return (
        d.withColumn("__local", F.coalesce(F.sum(value_col).over(w_local), F.lit(0)))
        .join(broadcast(offsets), "__pid")
        .withColumn(out_col, (F.col("__local") + F.col("__ofs")).cast("long"))
        .drop("__pid", "__local")
    )


def pack_sequences(
    df: DataFrame,
    order_col: str,
    count_col: str,
    budget: int,
) -> DataFrame:
    """Assign each document to fixed-size training sequences by global
    token offset (concat-then-chunk).

    Adds: ``start_offset`` (global exclusive cumsum of ``count_col``),
    ``pack_id`` = start_offset // budget, ``end_pack_id`` covering the
    document's last token, and ``straddle`` (document crosses ≥1 pack
    boundary).  Deterministic given a total order on ``order_col``."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    d = global_cumsum(df, order_col, count_col, out_col="start_offset")
    end = F.col("start_offset") + F.col(count_col) - 1
    return (
        d.withColumn("pack_id", F.floor(F.col("start_offset") / budget).cast("long"))
        .withColumn("end_pack_id", F.floor(end / budget).cast("long"))
        .withColumn("straddle", F.col("end_pack_id") > F.col("pack_id"))
    )
