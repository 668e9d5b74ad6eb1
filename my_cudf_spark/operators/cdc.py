"""Change-data-capture application and dimension versioning.

The reference is an in-memory frame library with no mutation-application
surface at all (closest primitives: ``cudf::scatter`` / boolean-mask
updates, copying.hpp:30); a continuously-ingested training-data lake needs
the three standard shapes a lakehouse engine provides:

- ``apply_changelog``  : compact a CDC event stream (key, seq, op I/U/D,
  payload) into current state — latest op per key wins, deletes drop.
- ``merge_upsert``     : MERGE a (already compacted) upsert/delete batch
  into a target table — Delta/Iceberg ``MERGE INTO`` semantics re-expressed
  as joins Catalyst can plan.
- ``scd2_apply``       : slowly-changing-dimension type-2 versioning —
  close the current version of changed keys, append the new version,
  keep full history queryable (point-in-time training-set reproduction).

Scale shapes (the reason these are NOT a full-outer join of everything):

- ``merge_upsert`` never shuffles the target payload: matched rows come
  from a LEFT join target←batch on the keys (batch side broadcastable —
  CDC batches are small next to a 100 TB target), inserts from an
  anti-join of the batch against the target's NARROW key projection
  (shuffle ∝ batch + key column, never target payload).  With the target
  laid out bucketed on the keys (``bucketBy`` layout — the
  join_bucketed demo in queries/relational.py) even the key-projection exchange disappears.
- ``apply_changelog`` is one hash shuffle of the changelog (row_number
  per key) — state size ∝ distinct keys, the same shape as streaming
  dedup.
- ``scd2_apply`` joins ONLY the current version slice against the change
  batch; closed history rows pass through untouched (union, no shuffle).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "apply_changelog", "merge_upsert", "scd2_apply", "scd2_asof",
    "incremental_agg", "table_diff", "time_travel",
]


def time_travel(
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    op_col: str,
    version,
    delete_op: str = "D",
) -> DataFrame:
    """AS-OF read over a CDC changelog — reconstruct the table state at
    ``version``: keep events with ``seq_col`` ≤ version, then compact
    with :func:`apply_changelog` (max-seq-per-key wins, tombstones
    drop).  The lakehouse time-travel primitive the MERGE / changelog /
    SCD2 tier was missing: training-set lineage replays the exact table
    a past run saw by pinning its version.

    ``version`` is an int/literal, or a 1-row DataFrame holding the
    version scalar (first column) — the latter rides a broadcast so a
    data-derived pin (e.g. "the sequence the last run drained to")
    never collects driver-side.  The 1-row contract is ENFORCED in-plan
    (no extra job): the frame is aggregated to (max, count) and a
    ``raise_error`` fires if the pin is empty, multi-row, or NULL — a
    bad pin (a grouped max-seq-per-run instead of a global scalar, an
    empty drain) fails loudly instead of silently fanning the changelog
    out per version row or filtering everything away.

    Scale: zero full-history shuffles — the version filter prunes
    BEFORE the one keep-latest hash shuffle on the keys, so cost is the
    compaction of the ≤ v prefix, never all versions of all keys."""
    if isinstance(version, DataFrame):
        vdf = version.agg(
            F.max(F.col(version.columns[0])).alias("__ttv"),
            F.count(F.lit(1)).alias("__ttn"),
        )
        # count==1 makes max() the identity, so the pin value is passed
        # through exactly; any other cardinality (or a NULL pin) raises
        # at evaluation time.
        pin = F.when(
            (F.col("__ttn") == 1) & F.col("__ttv").isNotNull(), F.col("__ttv")
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "time_travel version frame must hold exactly one "
                        "non-null row, got "
                    ),
                    F.col("__ttn").cast("string"),
                    F.lit(" row(s)"),
                )
            )
        )
        filtered = (
            changes.crossJoin(F.broadcast(vdf))
            .filter(F.col(seq_col) <= pin)
            .drop("__ttv", "__ttn")
        )
    else:
        filtered = changes.filter(F.col(seq_col) <= F.lit(version))
    return apply_changelog(filtered, keys, seq_col, op_col, delete_op)


def apply_changelog(
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    op_col: str,
    delete_op: str = "D",
) -> DataFrame:
    """Compact a CDC changelog to current state: per key, the row with the
    highest ``seq_col`` wins (ties broken by ``op_col`` descending so a
    same-sequence U/D pair resolves deterministically — documented, not
    recommended; give events unique sequences); keys whose winning op is
    ``delete_op`` disappear.  Returns the surviving rows minus the
    bookkeeping columns.

    One hash shuffle on the keys; the classic keep-latest window
    (row_number, never a groupBy+join double scan)."""
    keys = list(keys)
    w = Window.partitionBy(*keys).orderBy(F.desc(seq_col), F.desc(op_col))
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col(op_col) != delete_op))
        .drop("__rn", seq_col, op_col)
    )


def _key_match(
    left_pfx: str, right_pfx: str, keys: Sequence[str], null_safe: bool = True
) -> Column:
    if null_safe:
        cmps = [
            F.col(f"{left_pfx}{k}").eqNullSafe(F.col(f"{right_pfx}{k}"))
            for k in keys
        ]
    else:
        cmps = [F.col(f"{left_pfx}{k}") == F.col(f"{right_pfx}{k}") for k in keys]
    return reduce(lambda a, b: a & b, cmps)


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    update_cols: Sequence[str] | None = None,
    delete_col: str | None = None,
    null_safe_keys: bool = True,
) -> DataFrame:
    """MERGE ``source`` into ``target`` on ``keys`` (Delta-style):

    - matched + ``delete_col`` true → target row removed,
    - matched otherwise → target row with ``update_cols`` overwritten
      from the source (all other target columns preserved),
    - source-only + not delete → inserted (target columns the source
      lacks become NULL),
    - target-only → unchanged.

    ``update_cols`` defaults to every non-key target column present in the
    source.  CONTRACT: source carries at most one row per key (compact a
    raw feed with :func:`apply_changelog` first) — a duplicate source key
    would fan out matched target rows, as in every MERGE engine.

    ``null_safe_keys`` (default True) matches NULL keys to each other in
    every leg.  Pass False when keys are non-null by contract (a primary
    key): plain equality keys are ALSO what lets a ``bucketBy``-laid-out
    target satisfy the join distribution straight from its bucketed scan
    — the zero-Exchange MERGE (see cdc_merge_bucketed / test_bucketing).

    Scale: target payload is scanned once and never shuffled — the
    matched leg is a left join whose source side is CDC-batch-sized
    (broadcastable), the insert leg anti-joins the batch against the
    target's narrow key projection.  With a bucketed target and
    ``null_safe_keys=False`` even the key-projection Exchange disappears:
    the anti-join reuses the scan's hash clustering and only the
    batch-sized source shuffles."""
    keys = list(keys)
    tcols = target.columns
    src_value_cols = [
        c for c in source.columns if c not in keys and c != delete_col
    ]
    if update_cols is None:
        update_cols = [c for c in tcols if c not in keys and c in src_value_cols]
    missing = [c for c in update_cols if c not in src_value_cols]
    if missing:
        raise ValueError(f"update_cols absent from source: {missing}")
    s = source.select(
        *[F.col(k).alias(f"__s_{k}") for k in keys],
        *[F.col(c).alias(f"__s_{c}") for c in src_value_cols],
        (
            F.coalesce(F.col(delete_col).cast("boolean"), F.lit(False))
            if delete_col
            else F.lit(False)
        ).alias("__s_del"),
        F.lit(True).alias("__s_present"),
    )
    cond = _key_match("", "__s_", keys, null_safe_keys)
    upd = target.join(s, cond, "left")
    matched = F.coalesce(F.col("__s_present"), F.lit(False))
    kept = upd.filter(~(matched & F.col("__s_del"))).select(
        *[
            (
                F.when(matched, F.col(f"__s_{c}")).otherwise(F.col(c)).alias(c)
                if c in update_cols
                else F.col(c)
            )
            for c in tcols
        ]
    )
    inserts = (
        s.filter(~F.col("__s_del"))
        # null-safe anti-join, matching the update leg's key semantics —
        # a plain column-list anti join never matches NULL keys and would
        # re-insert a NULL-key row it just updated
        .join(
            target.select(*[F.col(k).alias(f"__t_{k}") for k in keys]),
            _key_match("__s_", "__t_", keys, null_safe_keys),
            "left_anti",
        )
        .select(
            *[
                (
                    F.col(f"__s_{c}")
                    if (c in keys or c in src_value_cols)
                    else F.lit(None)
                )
                .cast(dict(target.dtypes)[c])
                .alias(c)
                for c in tcols
            ]
        )
    )
    return kept.unionByName(inserts)


def scd2_asof(
    dim: DataFrame,
    ts,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Dimension state AS OF ``ts`` — the version whose validity interval
    contains the timestamp, with the standard half-open ``[valid_from,
    valid_to)`` convention (at exactly the close/effective instant the
    NEW version is current).  The dimension-side twin of
    :func:`time_travel` (which reconstructs a fact table from its
    changelog): together they reproduce the exact training-set join a
    past run saw.

    ``ts`` is a timestamp string/literal or a Column.  Scale: a narrow
    filter — no shuffle, no window; with the dimension partitioned on
    ``valid_from`` dates the scan prunes to the relevant history."""
    t = ts if isinstance(ts, Column) else F.lit(ts).cast("timestamp")
    return dim.filter(
        (F.col(valid_from) <= t)
        & (F.col(valid_to).isNull() | (F.col(valid_to) > t))
    )


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    attr_cols: Sequence[str],
    eff_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """Apply a change batch to a type-2 slowly-changing dimension.

    ``dim`` rows carry (keys, attrs, ``valid_from``, ``valid_to`` NULL for
    open versions, ``is_current``).  ``changes`` carries (keys, attrs,
    ``eff_col``).  Per change row:

    - key exists with DIFFERENT attrs (null-safe struct compare) → the
      open version closes (``valid_to`` = effective time, ``is_current``
      false) and a new open version appends,
    - key exists with identical attrs → no-op,
    - new key → new open version appends.

    Closed history rows pass through untouched.  CONTRACT: one change row
    per key per batch (pre-compact with :func:`apply_changelog`).

    Scale: the join touches only the current-version slice; history is a
    union leg with no shuffle."""
    keys = list(keys)
    attr_cols = list(attr_cols)
    dcols = dim.columns
    # A NULL is_current (malformed dimension) must not vanish — filter(col)
    # and filter(~col) BOTH exclude NULL; coalesce routes such rows to the
    # history leg (they are certainly not the open version).
    cur_flag = F.coalesce(F.col(is_current), F.lit(False))
    history = dim.filter(~cur_flag)
    current = dim.filter(cur_flag)
    ch = changes.select(
        *[F.col(k).alias(f"__c_{k}") for k in keys],
        *[F.col(a).alias(f"__c_{a}") for a in attr_cols],
        F.col(eff_col).alias("__c_eff"),
        F.lit(True).alias("__c_present"),
    )
    j = current.join(ch, _key_match("", "__c_", keys), "left")
    changed = F.coalesce(F.col("__c_present"), F.lit(False)) & ~F.struct(
        *[F.col(a) for a in attr_cols]
    ).eqNullSafe(F.struct(*[F.col(f"__c_{a}") for a in attr_cols]))
    # current versions: closed if their attrs changed, untouched otherwise
    kept_current = j.select(
        *[
            (
                F.when(changed, F.col("__c_eff")).otherwise(F.col(valid_to)).alias(c)
                if c == valid_to
                else F.when(changed, F.lit(False)).otherwise(F.col(is_current)).alias(c)
                if c == is_current
                else F.col(c)
            )
            for c in dcols
        ]
    )
    # new open versions: changed keys + brand-new keys (one presence-marked
    # join — a NULL-attr change on a new key still inserts)
    cur_attrs = current.select(
        *[F.col(k).alias(f"__p_{k}") for k in keys],
        *[F.col(a).alias(f"__p_{a}") for a in attr_cols],
        F.lit(True).alias("__p_present"),
    )
    # null-safe key match, consistent with the close leg — a NULL-key
    # no-op echo must not insert a duplicate open version
    fresh = ch.join(cur_attrs, _key_match("__c_", "__p_", keys), "left").filter(
        ~F.coalesce(F.col("__p_present"), F.lit(False))
        | ~F.struct(*[F.col(f"__p_{a}") for a in attr_cols]).eqNullSafe(
            F.struct(*[F.col(f"__c_{a}") for a in attr_cols])
        )
    )
    dtypes = dict(dim.dtypes)
    new_versions = fresh.select(
        *[
            (
                F.col(f"__c_{c}")
                if c in keys or c in attr_cols
                else F.col("__c_eff")
                if c == valid_from
                else F.lit(None)
                if c == valid_to
                else F.lit(True)
                if c == is_current
                else F.lit(None)
            )
            .cast(dtypes[c])
            .alias(c)
            for c in dcols
        ]
    )
    return history.unionByName(kept_current).unionByName(new_versions)


def incremental_agg(
    base_agg: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    old_col: str,
    new_col: str,
    sum_col: str = "total",
    count_col: str = "n",
    dec_type: str | None = None,
) -> DataFrame:
    """Incremental materialized-view maintenance for a per-key
    SUM/COUNT aggregate (AVG etc. derive from the pair): apply a CDC
    change batch to ``base_agg`` WITHOUT rescanning the fact table — the
    delta-maintenance identity of every lakehouse IVM engine
    (sum' = sum + Σ(new − old), n' = n + inserts − deletes).

    ``changes`` rows carry the before/after images: insert → old NULL,
    delete → new NULL, update → both (the Debezium envelope).  Values
    must arrive as DECIMAL (exact addition — the maintained view must
    equal a from-scratch recompute bit-for-bit, which float deltas would
    drift from).  Keys whose count reaches 0 drop out, matching the
    recompute's GROUP BY.

    ``dec_type`` is the exact accumulator type.  By default it is DERIVED
    from the inputs — scale = the widest input decimal scale (so no value
    is silently rounded), precision = input precision + 10 headroom
    digits capped at 38.  An explicit ``dec_type`` narrower in scale than
    any decimal input raises instead of rounding (the maintained ==
    recomputed contract is bit-for-bit; a lossy cast would break it
    silently).

    Scale: one aggregation over the CHANGE BATCH (∝ changed rows) plus
    one full-outer join against the view on its key — the view never
    rescans facts, and with the view bucketed on the keys the join runs
    with zero exchange on the big side (the cdc_merge_bucketed layout).
    """
    import re

    from pyspark.sql.types import DecimalType

    keys = list(keys)
    dec_ins = [
        t
        for t in (
            changes.schema[old_col].dataType,
            changes.schema[new_col].dataType,
            base_agg.schema[sum_col].dataType,
        )
        if isinstance(t, DecimalType)
    ]
    if dec_type is None:
        scale = max((t.scale for t in dec_ins), default=2)
        prec = min(38, max((t.precision for t in dec_ins), default=18) + 10)
        dec_type = f"decimal({prec},{scale})"
    else:
        m = re.fullmatch(r"decimal\((\d+),\s*(\d+)\)", dec_type.strip().lower())
        if not m:
            raise ValueError(f"dec_type must be 'decimal(p,s)', got {dec_type!r}")
        tscale = int(m.group(2))
        lossy = [t.simpleString() for t in dec_ins if t.scale > tscale]
        if lossy:
            raise ValueError(
                f"dec_type {dec_type} would round inputs {lossy}; widen its scale"
            )
    zero = F.lit(0).cast(dec_type)
    delta = changes.groupBy(*keys).agg(
        F.sum(
            F.coalesce(F.col(new_col).cast(dec_type), zero)
            - F.coalesce(F.col(old_col).cast(dec_type), zero)
        ).alias("__dsum"),
        F.sum(
            F.when(F.col(old_col).isNull(), 1)
            .when(F.col(new_col).isNull(), -1)
            .otherwise(0)
            .cast("long")
        ).alias("__dn"),
    )
    merged = base_agg.join(delta, keys, "full_outer").select(
        *keys,
        (
            F.coalesce(F.col(sum_col).cast(dec_type), zero)
            + F.coalesce(F.col("__dsum"), zero)
        ).alias(sum_col),
        (
            F.coalesce(F.col(count_col), F.lit(0)) + F.coalesce(F.col("__dn"), F.lit(0))
        ).alias(count_col),
    )
    return merged.filter(F.col(count_col) > 0)


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Snapshot diff — the INVERSE of changelog application: given two
    versions of a table, emit the change feed that turns ``old`` into
    ``new`` (Delta/Iceberg change-data-feed generation, lakehouse
    time-travel diffing).  One full-outer hash join on the keys; rows
    equal on every compare column are dropped before anything wide
    happens.

    Output: keys + ``status`` ('added' | 'removed' | 'changed') +
    ``changed_cols`` (comma-joined names, '' unless changed) + old_/new_
    prefixed compare columns.  Null-safe comparisons: NULL → value is a
    change, NULL == NULL is not."""
    keys = list(keys)
    o = old.select(*keys, *[F.col(c).alias(f"old_{c}") for c in compare_cols])
    n = new.select(*keys, *[F.col(c).alias(f"new_{c}") for c in compare_cols])
    # membership flags survive the outer join even when every payload
    # column is NULL on one side
    j = o.withColumn("__in_old", F.lit(True)).join(
        n.withColumn("__in_new", F.lit(True)), keys, "full_outer"
    )
    diffs = [
        ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}")) for c in compare_cols
    ]
    status = (
        F.when(F.col("__in_old").isNull(), "added")
        .when(F.col("__in_new").isNull(), "removed")
        .when(reduce(lambda a, b: a | b, diffs), "changed")
    )
    changed = F.concat_ws(
        ",",
        *[
            F.when(
                (F.col("__in_old").isNotNull())
                & (F.col("__in_new").isNotNull())
                & ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}")),
                F.lit(c),
            )
            for c in compare_cols
        ],
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .withColumn("changed_cols", changed)
        .select(
            *keys,
            "status",
            "changed_cols",
            *[f"old_{c}" for c in compare_cols],
            *[f"new_{c}" for c in compare_cols],
        )
    )
