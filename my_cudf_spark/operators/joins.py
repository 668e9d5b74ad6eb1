"""Join operators (SURVEY.md §2.3; reference ``cpp/include/cudf/join.hpp``).

Spark covers the reference's entire join surface natively (inner/left/right/
full/semi/anti/cross, theta via BNLJ, mixed equi+residual); this module adds
the scale-minded helpers and the joins the reference lacks:

- ``join``        : thin wrapper choosing broadcast hints by declared side size.
- ``theta_join``  : ConditionalJoin (ir.py:1121, join.hpp:579-753).
- ``mixed_join``  : equi keys + residual predicate (join.hpp:808-1034).
- ``asof_join``   : absent in reference (SURVEY.md §2.3 'Absent'), standard in
                    time-series engines — union + last-non-null window, no
                    per-row range probe, one shuffle per side.
- ``salted_join`` : skew mitigation — explode hot keys on the build side,
                    salt the probe side (SURVEY.md §7.2.7).
- ``range_join``  : point-in-interval join via bin bucketing — turns the
                    BNLJ Spark would plan for ``p BETWEEN lo AND hi`` into
                    an equi-join on bin id (the standard trick interval/
                    spatial engines use; absent in reference like asof).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

__all__ = [
    "equi_join", "theta_join", "mixed_join", "asof_join", "salted_join",
    "range_join",
    "fuzzy_join",
    "pit_join",
    "interval_overlap_join",
]

_HOW = {
    "inner", "left", "right", "full", "outer", "left_semi", "semi",
    "left_anti", "anti", "cross",
}


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] | Column,
    how: str = "inner",
    *,
    broadcast_right: bool = False,
    nulls_equal: bool = False,
) -> DataFrame:
    """Equi-join with optional broadcast hint and null-safe key equality
    (Join IR options ``nulls_equal``, ir.py:1230-1246 → eqNullSafe)."""
    if how not in _HOW:
        raise ValueError(f"unknown how={how!r}")
    r = broadcast(right) if broadcast_right else right
    if nulls_equal and not isinstance(on, Column):
        keys = [on] if isinstance(on, str) else list(on)
        cond = None
        for k in keys:
            c = left[k].eqNullSafe(r[k])
            cond = c if cond is None else (cond & c)
        out = left.join(r, cond, how)
        # coalesce duplicate key columns like polars' coalesce=True
        for k in keys:
            out = out.withColumn(f"{k}__c", F.coalesce(left[k], r[k])).drop(left[k]).drop(r[k]) \
                     .withColumnRenamed(f"{k}__c", k)
        return out
    return left.join(r, on, how)


def theta_join(left: DataFrame, right: DataFrame, predicate: Column, how: str = "inner") -> DataFrame:
    """Join on an arbitrary predicate (ConditionalJoin → BNLJ/cartesian).

    Scale note: Spark requires one broadcastable side for non-equi joins
    (BroadcastNestedLoopJoin); keep the right side small or pre-filter.
    """
    return left.join(right, predicate, how)


def mixed_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    residual: Column,
    how: str = "inner",
) -> DataFrame:
    """Equi keys + residual condition in one join (mixed_*_join,
    join.hpp:808-1034). Spark hashes on the equi keys and applies the
    residual during the probe — exactly the reference's 'mixed' strategy."""
    cond = None
    for k in on:
        c = left[k] == right[k]
        cond = c if cond is None else (cond & c)
    out = left.join(right, cond & residual, how)
    for k in on:  # drop right-side duplicate key columns
        out = out.drop(right[k])
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] | None = None,
    direction: str = "backward",
    suffix: str = "_right",
    tolerance: int | float | None = None,
) -> DataFrame:
    """As-of join: for each left row, the most recent right row with
    ``right.on <= left.on`` (backward; 'forward' = next ``>=``; 'nearest' =
    whichever side is closer, exact cudf/pandas ``merge_asof`` directions —
    python/cudf/cudf/core/reshape.py merge_asof surface), optionally within
    ``by`` groups and within ``tolerance`` of the key (seconds for
    timestamps, days for dates, raw units for numerics; a left row whose
    best match is farther keeps NULL payload, pandas semantics).

    Implementation (scales: one shuffle per side, no range cross-product):
    union both sides tagged, window passes carrying the previous/next
    right-side row along ``on``, then keep left rows.  'nearest' runs one
    backward and one forward pass over the SAME partition exchange (two
    sorts, one shuffle) and picks per-row by distance, ties to backward.
    Matches DuckDB ``ASOF JOIN`` semantics (the oracle for this operator).

    All right-side payload columns (plus the matched key, for tolerance /
    nearest arithmetic) ride in ONE struct carried by a single
    ``last/first(ignorenulls=True)`` window, so every output row's payload
    comes from the single matched right row — a right row with NULL in one
    payload column never gets that column back-filled from an older right
    row (and one window pass replaces len(rcols) passes).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be backward|forward|nearest")

    def _family(t: str) -> str:
        if t.startswith("timestamp"):
            return "timestamp"
        if t == "date":
            return "date"
        if t in ("integer", "long", "short", "byte", "float", "double") or t.startswith(
            "decimal"
        ):
            return "numeric"
        return t

    lf = _family(left.schema[on].dataType.typeName())
    rf = _family(right.schema[on].dataType.typeName())
    if lf != rf:
        # distance/tolerance units below derive from the RIGHT side's type;
        # mixed families (e.g. left timestamp vs right date) would silently
        # scale by the wrong unit instead of erroring.
        raise ValueError(
            f"asof_join 'on' type families differ: left {lf} vs right {rf}; "
            "cast one side so distance/tolerance units agree"
        )
    by = list(by) if by else []
    rcols = [c for c in right.columns if c != on and c not in by]
    from pyspark.sql import types as T

    r_struct_type = T.StructType(
        [right.schema[c] for c in rcols] + [T.StructField("__on", right.schema[on].dataType)]
    )
    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r_tag = right.select(
        *[F.col(c) if c in (by + [on]) else F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns
          if c in (by + [on])],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in (by + [on])],
        F.lit(0).alias("__is_left"),
        F.struct(*[F.col(c).alias(c) for c in rcols], F.col(on).alias("__on")).alias("__r"),
    ).select(*[c for c in l_tag.columns])  # align column order

    unioned = l_tag.unionByName(r_tag)

    dtype = right.schema[on].dataType.typeName()

    def dist(a: Column, b: Column) -> Column:
        # |a - b|, exact: integer µs for timestamps (unix_timestamp would
        # TRUNCATE sub-second parts and mis-rank near-ties), days for dates,
        # raw units otherwise.  Session tz is UTC so the ntz→ts cast is a
        # wall-clock identity.
        if dtype.startswith("timestamp"):
            return F.abs(
                F.unix_micros(a.cast("timestamp")) - F.unix_micros(b.cast("timestamp"))
            )
        if dtype == "date":
            return F.abs(F.datediff(a, b)).cast("long")
        return F.abs(a - b)

    def tol_units(t: int | float) -> Column:
        # public tolerance API: seconds for timestamps, days for dates.
        if dtype.startswith("timestamp"):
            return F.lit(int(t * 1_000_000)).cast("long")
        return F.lit(t)

    # Backward: right rows sort before left rows at equal `on` so an exact
    # tie matches; carry the last right struct seen so far.
    w_back = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Forward: left rows sort before right rows at equal `on` (ties still
    # match); carry the first right struct at-or-after the current row.
    w_fwd = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__is_left").desc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    if direction == "backward":
        matched = F.last("__r", ignorenulls=True).over(w_back)
    elif direction == "forward":
        matched = F.first("__r", ignorenulls=True).over(w_fwd)
    else:
        b = F.last("__r", ignorenulls=True).over(w_back)
        f = F.first("__r", ignorenulls=True).over(w_fwd)
        matched = F.when(f.isNull(), b).when(b.isNull(), f).otherwise(
            # tie → backward (pandas picks the prior row on equal distance)
            F.when(
                dist(F.col(on), b.getField("__on")) <= dist(F.col(on), f.getField("__on")),
                b,
            ).otherwise(f)
        )
    if tolerance is not None:
        matched = F.when(dist(F.col(on), matched.getField("__on")) <= tol_units(tolerance), matched)
    out = (
        unioned
        .withColumn("__r", matched)
        .filter(F.col("__is_left") == 1)
        .drop("__is_left")
    )
    for c in rcols:
        out = out.withColumn(
            c if c not in left.columns else f"{c}{suffix}", F.col("__r").getField(c)
        )
    return out.drop("__r")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Skew-resistant equi-join: salt the (large, skewed) left side with a
    random bucket and explode the right side ``salt`` ways, so one hot key
    spreads over ``salt`` reducers. Complements AQE skew-join for cases AQE
    can't split (e.g. aggregations after the join).

    Only left-preserving joins are allowed: the right side is replicated
    ``salt`` ways, so right/full outer would emit each unmatched right row
    once per salt copy (silent row multiplication)."""
    if how not in ("inner", "left", "left_semi", "semi", "left_anti", "anti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, not how={how!r}: "
            "the exploded right side would duplicate unmatched right rows"
        )
    on = list(on)
    l = left.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    r = right.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = l.join(r, on + ["__salt"], how)
    return out.drop("__salt")


def _as_long(df: DataFrame, col: str) -> Column:
    """Numeric view of a column for binning: dates → days since epoch,
    timestamps → epoch seconds (session tz pinned UTC), numerics as-is."""
    dtype = dict(df.dtypes)[col]
    c = F.col(col)
    if dtype == "date":
        return F.datediff(c, F.lit("1970-01-01")).cast("long")
    if dtype.startswith("timestamp"):
        return F.unix_timestamp(c)
    return c.cast("long")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: int,
    how: str = "inner",
    closed: str = "both",
) -> DataFrame:
    """Join each ``points`` row to every ``intervals`` row whose
    ``[lo, hi]`` contains ``point`` — WITHOUT the BroadcastNestedLoopJoin
    Spark plans for a bare ``p BETWEEN lo AND hi`` predicate.

    Bin bucketing: intervals are exploded to every ``bin_width``-sized bin
    they overlap, points map to exactly one bin, and the join becomes an
    equi-join on bin id + residual containment predicate.  A (point,
    interval) pair can only meet in the point's single bin, so no dedup
    pass is needed.  Shuffle volume is O(points + intervals·span/bin_width)
    — pick ``bin_width`` near the typical interval span so most intervals
    explode to ~2 bins.  This is the interval-join shape that survives
    100 TB; Spark's own optimizer has no equivalent rewrite.

    ``closed``: "both" ([lo, hi]), "left" ([lo, hi)), "right" ((lo, hi]),
    "neither".  ``how``: inner or left (points-preserving; interval-side
    outer would need per-bin dedup of unmatched interval copies).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports inner/left, not how={how!r}")
    if closed not in ("both", "left", "right", "neither"):
        raise ValueError(f"unknown closed={closed!r}")
    w = int(bin_width)
    if w <= 0:
        raise ValueError("bin_width must be positive")

    p_long = _as_long(points, point_col)
    lo_long = _as_long(intervals, lo_col)
    hi_long = _as_long(intervals, hi_col)

    p = points.withColumn("__bin", F.floor(p_long / w))
    i = intervals.withColumn(
        "__bin", F.explode(F.sequence(F.floor(lo_long / w), F.floor(hi_long / w)))
    )
    pc, lo, hi = F.col(point_col), F.col(lo_col), F.col(hi_col)
    lower = pc >= lo if closed in ("both", "left") else pc > lo
    upper = pc <= hi if closed in ("both", "right") else pc < hi
    cond = (p["__bin"] == i["__bin"]) & lower & upper
    return p.join(i, cond, how).drop("__bin")


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """Fuzzy string join: all (left, right) pairs with edit distance ≤
    ``max_dist`` — the entity-resolution / record-linkage join an LLM-data
    pipeline runs to reconcile near-identical names (no reference
    equivalent; nvtext stops at pairwise edit_distance on ALIGNED columns,
    edit_distance.hpp:57).

    Scale shape (max_dist=1): pigeonhole blocking instead of the all-pairs
    cross product.  One edit leaves either the first half untouched as a
    PREFIX or the second half untouched (position measured from the END)
    as a SUFFIX, so every true pair shares at least one of two
    (kind, segment-length, segment) keys; the right side emits keys for
    the three compatible lengths (|b|-1, |b|, |b|+1).  Candidates come
    from a hash equi-join on those keys — volume is bounded by segment
    collision counts, never |L|×|R| — then exact ``levenshtein`` verifies.
    Empty segments (1-char strings' untouched half) are legal keys: they
    only pair strings of length ≤ 2, so the degenerate block stays tiny.
    max_dist>1 needs the (k+1)-segment PartEnum generalization and is
    rejected rather than silently planned as a cross join."""
    if max_dist != 1:
        raise ValueError("fuzzy_join currently implements max_dist=1 (pigeonhole "
                         "halves); k>1 needs PartEnum-style k+1 segments")
    l = left.select(
        F.col(left_col).alias("__a"),
        F.length(left_col).alias("__la"),
    )
    # left emits its own two halves
    half = F.col("__la") / 2
    l_keys = l.select(
        "__a",
        F.explode(
            F.array(
                F.struct(
                    F.lit("P").alias("kind"),
                    F.ceil(half).cast("int").alias("n"),
                    F.col("__a").substr(F.lit(1), F.ceil(half).cast("int")).alias("seg"),
                ),
                F.struct(
                    F.lit("S").alias("kind"),
                    (F.col("__la") - F.ceil(half).cast("int")).alias("n"),
                    F.col("__a").substr(
                        F.ceil(half).cast("int") + 1, F.col("__la")
                    ).alias("seg"),
                ),
            )
        ).alias("k"),
    ).select("__a", "k.kind", "k.n", "k.seg")
    # right emits prefix/suffix keys for each compatible LEFT length
    r = right.select(F.col(right_col).alias("__b"), F.length(right_col).alias("__lb"))
    r_keys = (
        r.select("__b", "__lb", F.explode(F.expr("sequence(__lb - 1, __lb + 1)")).alias("__lc"))
        .filter(F.col("__lc") >= 0)
        .select(
            "__b",
            F.explode(
                F.array(
                    F.struct(
                        F.lit("P").alias("kind"),
                        F.ceil(F.col("__lc") / 2).cast("int").alias("n"),
                        F.col("__b").substr(
                            F.lit(1), F.ceil(F.col("__lc") / 2).cast("int")
                        ).alias("seg"),
                    ),
                    F.struct(
                        F.lit("S").alias("kind"),
                        (F.col("__lc") - F.ceil(F.col("__lc") / 2).cast("int")).alias("n"),
                        F.col("__b").substr(
                            F.length("__b") - (F.col("__lc") - F.ceil(F.col("__lc") / 2).cast("int")) + 1,
                            F.col("__lc"),
                        ).alias("seg"),
                    ),
                )
            ).alias("k"),
        )
        .select("__b", "k.kind", "k.n", "k.seg")
    )
    cands = (
        l_keys.join(r_keys, ["kind", "n", "seg"])
        .select("__a", "__b")
        .distinct()
    )
    return (
        cands.withColumn("dist", F.levenshtein("__a", "__b"))
        .filter(
            (F.col("dist") <= max_dist)
            & (F.abs(F.length("__a") - F.length("__b")) <= max_dist)
        )
        .select(
            F.col("__a").alias("left_value"),
            F.col("__b").alias("right_value"),
            F.col("dist").cast("int").alias("dist"),
        )
    )


def pit_join(
    spine: DataFrame,
    features: "dict[str, DataFrame]",
    on: str,
    by: Sequence[str],
) -> DataFrame:
    """Multi-feature point-in-time join — the feature-store retrieval
    shape (absent in the reference like ``asof_join``; cudf/pandas stop at
    single-table ``merge_asof``, python/cudf/cudf/core/reshape.py): for
    every spine row, attach the latest at-or-before-``on`` payload from
    EACH feature frame in one pass.

    Each value of ``features`` is a frame carrying ``by`` + ``on`` +
    payload columns; every payload column ``c`` of feature ``f`` lands in
    the output as ``{f}_{c}``.  A spine row with no feature row at or
    before its ``on`` keeps NULLs for that feature (left semantics,
    matching chained DuckDB ``ASOF LEFT JOIN``s — the oracle).

    Scale: chaining N ``asof_join``s exchanges the (growing) spine N
    times; this instead unions ALL sides once and computes one
    ``last(ignorenulls)`` per feature over the SAME window spec, so
    Catalyst plans a single hash-partition Exchange on ``by`` and a
    single sort/WindowExec regardless of feature count.  Within equal
    ``on``, feature rows order before spine rows (at-or-before includes
    exact ties, DuckDB ``>=`` semantics); ``(by, on)`` must be unique
    within each feature frame or the tie payload is partitioning-
    dependent (same contract as ``asof_join``).
    """
    from pyspark.sql import types as T

    if not features:
        raise ValueError("pit_join needs at least one feature frame")
    by = list(by)
    names = list(features)
    spine_payload = [c for c in spine.columns if c not in by and c != on]
    fpayload = {
        f: [c for c in df.columns if c not in by and c != on]
        for f, df in features.items()
    }
    for f, cols in fpayload.items():
        if not cols:
            raise ValueError(f"feature {f!r} has no payload columns")

    def _struct_type(df: DataFrame, cols: Sequence[str]) -> T.StructType:
        return T.StructType([df.schema[c] for c in cols])

    l_type = _struct_type(spine, spine_payload)
    f_types = {f: _struct_type(features[f], fpayload[f]) for f in names}

    def _null(t: T.StructType) -> Column:
        return F.lit(None).cast(t)

    spine_row = spine.select(
        *by,
        F.col(on),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in spine_payload]).alias("__l"),
        *[_null(f_types[f]).alias(f"__f_{i}") for i, f in enumerate(names)],
    )
    parts = [spine_row]
    for i, f in enumerate(names):
        df = features[f]
        parts.append(
            df.select(
                *by,
                F.col(on),
                F.lit(0).alias("__is_left"),
                _null(l_type).alias("__l"),
                *[
                    (
                        F.struct(*[F.col(c) for c in fpayload[f]])
                        if j == i
                        else _null(f_types[g])
                    ).alias(f"__f_{j}")
                    for j, g in enumerate(names)
                ],
            )
        )
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = unioned.select(
        "*",
        *[
            F.last(f"__f_{i}", ignorenulls=True).over(w).alias(f"__m_{i}")
            for i in range(len(names))
        ],
    ).filter(F.col("__is_left") == 1)
    sel: list[Column] = [F.col(c) for c in by] + [F.col(on)]
    sel += [F.col("__l").getField(c).alias(c) for c in spine_payload]
    for i, f in enumerate(names):
        sel += [
            F.col(f"__m_{i}").getField(c).alias(f"{f}_{c}") for c in fpayload[f]
        ]
    return out.select(*sel)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_width: int,
) -> DataFrame:
    """Interval×interval overlap join (the two-sided sibling of the
    point-in-interval range join above): all (left, right) row pairs
    sharing the ``keys`` whose [start, end] intervals overlap.

    Scale shape: each interval explodes into the fixed-width bins it
    covers, candidates come from a hash equi-join on (keys, bin) — volume
    ∝ overlaps + bin co-residents, never |L|×|R| — then the exact
    predicate verifies.  Multi-bin co-residence is deduplicated BY
    CONSTRUCTION, not by a dropDuplicates shuffle: an overlapping pair
    co-resides in every shared bin, but exactly one of those is the bin
    holding the later of the two starts (that instant lies inside both
    intervals), so the join keeps a pair only where
    ``__bin == greatest(floor(a_start/w), floor(b_start/w))``.  This
    also makes genuinely duplicate input rows emit one pair per
    occurrence (a whole-row dedup would collapse them).
    ``bin_width`` (same units as the bounds) trades fan-out (≈ interval
    length / width bins per row) against candidate selectivity; set it
    near the typical interval length.

    Bounds are numeric (cast timestamps to epoch first); output carries
    every left/right column prefixed ``a_`` / ``b_``."""
    keys = list(keys)

    def binned(df: DataFrame, s: str, e: str, pfx: str) -> DataFrame:
        out = df.select(
            *[F.col(k).alias(k) for k in keys],
            *[
                F.col(c).alias(f"{pfx}{c}")
                for c in df.columns
                if c not in keys
            ],
        )
        return out.withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.floor(F.col(f"{pfx}{s}") / bin_width),
                    F.floor(F.col(f"{pfx}{e}") / bin_width),
                )
            ),
        )
    l = binned(left, left_start, left_end, "a_")
    r = binned(right, right_start, right_end, "b_")
    anchor = F.greatest(
        F.floor(F.col(f"a_{left_start}") / bin_width),
        F.floor(F.col(f"b_{right_start}") / bin_width),
    )
    cand = (
        l.join(r, [*keys, "__bin"])
        .filter(F.col("__bin") == anchor)
        .drop("__bin")
    )
    return cand.filter(
        (F.col(f"a_{left_start}") <= F.col(f"b_{right_end}"))
        & (F.col(f"b_{right_start}") <= F.col(f"a_{left_end}"))
    )
