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
from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

__all__ = ["global_cumsum", "pack_sequences", "pack_bestfit"]


def global_cumsum(
    df: DataFrame,
    order_col: str | Sequence[str | Column],
    value_col: str | Sequence[str],
    out_col: str | Sequence[str] = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """EXCLUSIVE global running sum of ``value_col`` in ``order_col`` order
    (row i gets the sum of all strictly-earlier rows), without a
    single-partition window.

    ``order_col`` (one column or a list) must be a total order (ties would
    make the prefix sum nondeterministic across runs).

    ``value_col``/``out_col`` accept LISTS to compute several cumsums over
    the SAME order in one pass (r12): chaining two single-value calls
    nests the first call's whole window+join tree inside the second
    call's three plan branches (min/max, totals, main) — three full
    re-evaluations; the multi-value form shares one bucket assignment,
    one window pass and one offsets broadcast, and each column's values
    are identical to its single-value run (per-column sums are
    independent)."""
    if num_partitions is None:
        num_partitions = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    order_cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    value_cols = [value_col] if isinstance(value_col, str) else list(value_col)
    out_cols = [out_col] if isinstance(out_col, str) else list(out_col)
    if len(value_cols) != len(out_cols):
        raise ValueError("value_col and out_col must have equal length")

    key_num = _numeric_view(df, order_cols[0])
    if key_num is not None:
        return _cumsum_deterministic_buckets(
            df, order_cols, key_num, value_cols, out_cols, num_partitions
        )
    return _cumsum_range_checkpoint(df, order_cols, value_cols, out_cols, num_partitions)


def _numeric_view(df: DataFrame, expr: Column) -> Column | None:
    """A numeric Column mirroring ``expr``'s sort order, or None when the
    first order key is not binnable (string/complex, or a SortOrder like
    ``col.desc()`` that fails analysis)."""
    try:
        dtype = df.select(expr.alias("__k")).schema[0].dataType.typeName()
    except Exception:
        return None
    if dtype in ("integer", "long", "short", "byte", "float", "double") or dtype.startswith(
        "decimal"
    ):
        return expr.cast("double")
    if dtype.startswith("timestamp"):
        # session tz is UTC, so the ntz→ts cast is a wall-clock identity
        return F.unix_micros(expr.cast("timestamp")).cast("double")
    if dtype == "date":
        return F.datediff(expr, F.lit("1970-01-01")).cast("double")
    return None


def _cumsum_deterministic_buckets(
    df: DataFrame,
    order_cols: list[Column],
    key_num: Column,
    value_cols: list[str],
    out_cols: list[str],
    num_partitions: int,
) -> DataFrame:
    """Scale path: partition id is a PURE FUNCTION of row values (uniform
    min/max binning of the first order key), so the totals branch and the
    main branch can evaluate independently and still agree — no exchange
    pinning, no localCheckpoint materialization, no range-boundary sampling
    job.  min/max are merge-order-insensitive aggregates (unlike
    approx_percentile, whose summary merges could differ between the two
    branch evaluations and misalign the offsets).

    Value-skewed keys make buckets uneven (performance, never correctness);
    callers with pathological first-key skew can extend the order key or
    fall back to the range path by passing a non-numeric leading key."""
    mm = df.agg(
        F.min(key_num).alias("__lo"),
        F.max(key_num).alias("__hi"),
        # count only to guard the all-equal / empty edge (width 0)
    )
    span = F.col("__hi") - F.col("__lo")
    pid = F.when(
        key_num.isNull() | (span <= F.lit(0.0)), F.lit(0)
    ).otherwise(
        F.least(
            F.lit(num_partitions - 1),
            F.floor((key_num - F.col("__lo")) / span * num_partitions).cast("int"),
        )
    )
    d = df.crossJoin(broadcast(mm)).withColumn("__pid", pid).drop("__lo", "__hi")
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # Totals re-derive __pid from scratch (deterministic), so Catalyst is
    # free to plan this branch as scan → partial agg → tiny shuffle; the
    # full-width data only crosses the wire once, for the window below.
    totals = d.groupBy("__pid").agg(
        *[F.sum(v).alias(f"__tot{i}") for i, v in enumerate(value_cols)]
    )
    w_prefix = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid",
        *[
            F.coalesce(F.sum(f"__tot{i}").over(w_prefix), F.lit(0)).alias(f"__ofs{i}")
            for i in range(len(value_cols))
        ],
    )
    out = d
    for i, v in enumerate(value_cols):
        out = out.withColumn(
            f"__local{i}", F.coalesce(F.sum(v).over(w_local), F.lit(0))
        )
    out = out.join(broadcast(offsets), "__pid")
    for i, oc in enumerate(out_cols):
        out = out.withColumn(
            oc, (F.col(f"__local{i}") + F.col(f"__ofs{i}")).cast("long")
        )
    return out.drop(
        "__pid",
        *[f"__local{i}" for i in range(len(value_cols))],
        *[f"__ofs{i}" for i in range(len(value_cols))],
    )


def _cumsum_range_checkpoint(
    df: DataFrame,
    order_cols: list[Column],
    value_cols: list[str],
    out_cols: list[str],
    num_partitions: int,
) -> DataFrame:
    """General path (string / SortOrder / complex first keys): range
    exchange pinned with a lazy localCheckpoint.  The totals branch and the
    final join both read ``d``; left as two plan branches, each instantiates
    its own range exchange whose sampled boundaries can differ between
    executions — __pid then disagrees across branches and the offsets
    misalign (observed as duplicate/gapped indices).  localCheckpoint (lazy)
    materializes the shuffle once so every consumer shares the same
    partitioner.  No sortWithinPartitions before the checkpoint: the window
    below re-sorts anyway (ordering metadata does not survive the
    checkpoint), so pre-sorting is pure waste."""
    d = (
        df.repartitionByRange(num_partitions, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    d = d.localCheckpoint(eager=False)
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # One row per partition; the prefix window below runs on that tiny
    # frame, so its single-partition sort is metadata-sized by design.
    totals = d.groupBy("__pid").agg(
        *[F.sum(v).alias(f"__tot{i}") for i, v in enumerate(value_cols)]
    )
    w_prefix = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid",
        *[
            F.coalesce(F.sum(f"__tot{i}").over(w_prefix), F.lit(0)).alias(f"__ofs{i}")
            for i in range(len(value_cols))
        ],
    )
    out = d
    for i, v in enumerate(value_cols):
        out = out.withColumn(
            f"__local{i}", F.coalesce(F.sum(v).over(w_local), F.lit(0))
        )
    out = out.join(broadcast(offsets), "__pid")
    for i, oc in enumerate(out_cols):
        out = out.withColumn(
            oc, (F.col(f"__local{i}") + F.col(f"__ofs{i}")).cast("long")
        )
    return out.drop(
        "__pid",
        *[f"__local{i}" for i in range(len(value_cols))],
        *[f"__ofs{i}" for i in range(len(value_cols))],
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


def pack_bestfit(
    df: DataFrame,
    id_col: str,
    count_col: str,
    budget: int,
    shards: int = 1,
) -> DataFrame:
    """Size-classed first-fit-decreasing bin packing — the NO-SPLIT
    regime next to :func:`pack_sequences`'s concat-then-chunk: every
    document lands whole in exactly one ``budget``-token pack, padding
    bounded by construction instead of documents straddling boundaries.

    Harmonic size classes make FFD distributable AND deterministic:
    class ``k = floor(budget / n_tokens)`` holds exactly the documents
    of which ``k`` fit per pack (``budget/(k+1) < n ≤ budget/k``), so
    within a class, packing is arithmetic on a row_number — every pack
    except the last per (class, shard) carries ``k`` documents and fills
    ``> budget·k/(k+1) ≥ budget/2``.  Documents longer than ``budget``
    go to class 0, one per pack (flag downstream; nothing is truncated
    here).

    ``shards`` is the 100 TB knob: each class is one window partition,
    and the small-document classes hold most of a corpus — sharding by
    ``id % shards`` bounds the partition to class/shards rows at the
    cost of at most one extra underfull pack per (class, shard).  The
    whole assignment is one hash shuffle on (class, shard) and is a pure
    function of the input set (SQL-oracle replicable; no sampling, no
    RNG).

    Returns one row per document:
    ``(id, count, size_class, shard, pack_idx, slot)`` — a pack is keyed
    by ``(size_class, shard, pack_idx)``.  ``id_col`` must be an
    integral type (byte/short/int/long — the shard arithmetic is pmod on
    the id; hash a string or fractional id first); rows with
    ``count <= 0`` are dropped.
    """
    if budget <= 0 or shards <= 0:
        raise ValueError("budget and shards must be positive")
    if not isinstance(
        df.schema[id_col].dataType,
        (ByteType, ShortType, IntegerType, LongType),
    ):
        raise TypeError(
            f"pack_bestfit id_col must be an integral type, got "
            f"{df.schema[id_col].dataType.simpleString()} (the shard "
            f"arithmetic is pmod on the id — hash a string id first)"
        )
    d = df.select(F.col(id_col), F.col(count_col)).filter(F.col(count_col) > 0)
    cls = F.when(F.col(count_col) > budget, F.lit(0)).otherwise(
        F.floor(F.lit(budget) / F.col(count_col))
    )
    d = d.withColumn("size_class", cls.cast("long")).withColumn(
        "shard", F.pmod(F.col(id_col), F.lit(shards)).cast("long")
    )
    w = Window.partitionBy("size_class", "shard").orderBy(
        F.col(count_col).desc(), F.col(id_col)
    )
    per_pack = F.greatest(F.lit(1), F.col("size_class"))
    return (
        d.withColumn("__rn", F.row_number().over(w) - 1)
        .withColumn("pack_idx", F.floor(F.col("__rn") / per_pack).cast("long"))
        .withColumn("slot", (F.col("__rn") % per_pack).cast("int"))
        .drop("__rn")
    )
