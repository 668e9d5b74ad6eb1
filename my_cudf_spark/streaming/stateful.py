"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no stateful streaming machinery at all (SURVEY.md §2.12);
this is the Spark-native surface a user would reach for where the reference
would have hand-rolled a consumer loop over ``Consumer.read_gdf`` batches
(``/root/reference/python/custreamz/custreamz/kafka.py:82-176``).

``running_totals`` keeps per-key (count, sum) state across micro-batches and
emits the updated totals each batch — the streaming analogue of
``groupBy(keys).agg(count, sum)``, with O(distinct keys) state.  On batch
frames it falls back to exactly that aggregation, so the same call works in
both modes and the batch result is the oracle for the stream's final state.

``heavy_hitters`` is a per-key streaming top-k frequency sketch
(Space-Saving summary, Metwally et al. 2005): bounded state of
``capacity`` (item, count, error) counters per key, merged batch-at-a-time
— the ``count_min``/top-k shape a 100 TB event pipeline keeps per entity
where exact per-item counts would be unbounded state.  When ``capacity``
>= the key's distinct item count the summary is EXACT (error 0), which is
how the fixture query earns a bit-exact SQL oracle; over capacity the
classic guarantee holds (count overestimates true frequency by at most
``error``, true top-k ⊆ summary for skewed streams).  Batch frames take
the exact groupBy + rank twin."""

from __future__ import annotations

from collections.abc import Iterable, Sequence
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


# Arrow → pandas turns a NULL-bearing int64 column into float64/object,
# so a bucketed update that merges state rows (int lists from GroupState)
# against batch keys (floats) would raise on mismatched merge dtypes or
# fail to encode state arrays typed array<bigint>.  Normalizing BOTH
# frames to the pandas nullable dtype derived from the SPARK type keeps
# merge/groupby keys comparable and NULL keys representable — the bucketed
# paths then accept the same input domain as the per-key paths.
_PD_NULLABLE = {
    "tinyint": "Int8",
    "smallint": "Int16",
    "int": "Int32",
    "bigint": "Int64",
    "boolean": "boolean",
    "string": "string",
}


def _norm_nullable(pdf: pd.DataFrame, types: dict[str, str]) -> pd.DataFrame:
    """Cast columns to their Spark-type-derived pandas nullable dtype
    (see _PD_NULLABLE); non-mapped types (double, timestamp…) pass
    through — their pandas representation is already null-stable."""
    for c, t in types.items():
        want = _PD_NULLABLE.get(t)
        if want is not None and str(pdf[c].dtype) != want:
            pdf[c] = pdf[c].astype(want)
    return pdf


def _plain_list(s: pd.Series) -> list:
    """Series → list with NA scalars as None (the Arrow state encoder
    accepts None, never pd.NA/NaN, inside typed state arrays)."""
    return [None if pd.isna(v) else v for v in s.tolist()]


def running_totals(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    buckets: int | None = None,
) -> DataFrame:
    """Per-key running (n_events, sum_value), updated each micro-batch.

    ``buckets``: key the state store on ``hash(keys) % buckets`` instead
    of the raw key — one vectorized Python invocation per bucket per
    batch instead of one per key (the high-cardinality lever; see
    latest_state).  Same output and oracle."""
    keys = list(keys)
    if not df.isStreaming:
        return df.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
    if buckets is not None:
        return _running_totals_bucketed(df, keys, value_col, buckets)

    key_fields = ", ".join(f"{k} {df.schema[k].dataType.simpleString()}" for k in keys)
    out_schema = f"{key_fields}, n_events bigint, sum_value double"
    state_schema = "n bigint, s double"

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            vals = pdf[value_col].dropna()
            n += len(pdf)
            s += float(vals.sum()) if len(vals) else 0.0
        state.update((n, s))
        yield pd.DataFrame(
            [dict(zip(keys, key)) | {"n_events": n, "sum_value": s}]
        )

    return df.groupBy(*keys).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _space_saving_merge(
    summary: dict[str, list[int]], batch: dict[str, int], capacity: int
) -> None:
    """Merge one batch's item counts into a Space-Saving summary
    ({item: [count, error]}), in place.  Known items add exactly; new
    items fill free slots exactly; once full, each new item evicts the
    current minimum-count entry (ties to the lexicographically smallest)
    and inherits its count as the overestimate ``error``.  New items merge
    largest-first (count desc, item asc) so eviction order — and the
    summary — is deterministic."""
    for it in [i for i in batch if i in summary]:
        summary[it][0] += batch[it]
    for it in sorted(
        (i for i in batch if i not in summary), key=lambda i: (-batch[i], i)
    ):
        if len(summary) < capacity:
            summary[it] = [batch[it], 0]
        else:
            victim = min(summary, key=lambda j: (summary[j][0], j))
            floor_ = summary.pop(victim)[0]
            summary[it] = [floor_ + batch[it], floor_]


def heavy_hitters(
    df: DataFrame,
    keys: Sequence[str],
    item_col: str,
    k: int,
    capacity: int = 64,
    buckets: int | None = None,
) -> DataFrame:
    """Per-key top-``k`` most frequent ``item_col`` values.

    Streaming: a Space-Saving summary of ``capacity`` counters per key in
    applyInPandasWithState state (three parallel arrays + a seen counter —
    GroupState rows are flat structs, so the summary rides as
    array<item dtype>/array<long> columns, Arrow-encoded per micro-batch;
    the item column keeps its native dtype in state AND output, matching
    the batch twin's schema for any orderable atomic type).
    Each batch merges that batch's per-item counts: known items add
    exactly; new items fill free slots exactly; once full, a new item
    evicts the current minimum (inheriting its count as ``error`` — the
    classic overestimate bound).  New items merge in (count desc, item
    asc) order so the summary — and therefore the emitted rows — are
    deterministic for a deterministic replay.  Emits the current top-k
    (rank 1..k by count desc, item asc) plus ``n_seen`` (total items the
    key has seen), whose per-key maximum marks the final snapshot after a
    bounded drain.

    Batch: the exact groupBy count + row_number twin with the same output
    schema — the oracle for the streamed final state whenever ``capacity``
    covers the per-key distinct-item count.

    Scale: state is O(keys × capacity) regardless of stream length; the
    per-batch shuffle carries raw rows once (the groupBy), and emitted
    rows are k per touched key per batch.  ``buckets`` keys the state
    store on ``hash(keys) % buckets`` — one Python invocation per bucket
    per batch instead of one per key (the high-cardinality lever; the
    per-key Space-Saving merge order is unchanged, so the summary stays
    deterministic)."""
    keys = list(keys)
    if k < 1 or capacity < k:
        raise ValueError("require 1 <= k <= capacity")
    if not df.isStreaming:
        from pyspark.sql import Window

        # NULL items are not counted in either mode (the sketch drops them;
        # value_counts() semantics), so n_seen is the non-null item count.
        df = df.filter(F.col(item_col).isNotNull())
        c = df.groupBy(*keys, item_col).agg(F.count(F.lit(1)).alias("n"))
        w = Window.partitionBy(*keys).orderBy(F.desc("n"), F.asc(item_col))
        # n_seen via a window sum over the per-item counts, NOT a
        # key-equality self-join: a column-name-list join drops NULL keys
        # (the streaming leg keeps them), and the window reuses the rank's
        # partitioning — one shuffle instead of two plus a join.
        return (
            c.withColumn("rank", F.row_number().over(w))
            .withColumn("n_seen", F.sum("n").over(Window.partitionBy(*keys)))
            .filter(F.col("rank") <= k)
            .select(
                *keys,
                F.col("rank").cast("int"),
                item_col,
                F.col("n").cast("long"),
                F.col("n_seen").cast("long"),
            )
        )

    if buckets is not None:
        return _heavy_hitters_bucketed(df, keys, item_col, k, capacity, buckets)

    key_fields = ", ".join(f"{c} {df.schema[c].dataType.simpleString()}" for c in keys)
    # The item column keeps its NATIVE dtype in both output and state
    # (batch-twin oracle contract: identical schemas).  Items ride as dict
    # keys / sort keys in the summary, so any orderable Spark atomic type
    # works; numpy scalars from value_counts() are unwrapped to Python
    # natives before they enter state (Arrow state encoding).
    item_type = df.schema[item_col].dataType.simpleString()
    out_schema = (
        f"{key_fields}, rank int, {item_col} {item_type}, n bigint, n_seen bigint"
    )
    state_schema = (
        f"items array<{item_type}>, counts array<bigint>, errs array<bigint>,"
        " seen bigint"
    )

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, counts, errs, seen = state.get
            summary = {
                it: [int(c), int(e)] for it, c, e in zip(items, counts, errs)
            }
        else:
            summary, seen = {}, 0
        batch: dict[Any, int] = {}
        for pdf in pdfs:
            for it, n in pdf[item_col].dropna().value_counts().items():
                if hasattr(it, "item"):  # numpy scalar → Python native
                    it = it.item()
                batch[it] = batch.get(it, 0) + int(n)
                seen += int(n)
        _space_saving_merge(summary, batch, capacity)
        state.update(
            (
                list(summary.keys()),
                [v[0] for v in summary.values()],
                [v[1] for v in summary.values()],
                seen,
            )
        )
        top = sorted(summary.items(), key=lambda kv: (-kv[1][0], kv[0]))[:k]
        if not top:
            # A key whose batches so far held only NULL items has an empty
            # summary; pd.DataFrame([]) would carry ZERO columns, which the
            # applyInPandasWithState Arrow serializer rejects — emit a
            # typed empty frame instead.
            yield pd.DataFrame(columns=[*keys, "rank", item_col, "n", "n_seen"])
            return
        yield pd.DataFrame(
            [
                dict(zip(keys, key))
                | {"rank": r, item_col: it, "n": cnt[0], "n_seen": seen}
                for r, (it, cnt) in enumerate(top, start=1)
            ]
        )

    return df.groupBy(*keys).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def latest_state(
    df: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    op_col: str,
    value_cols: Sequence[str],
    delete_op: str = "D",
    buckets: int | None = None,
) -> DataFrame:
    """Streaming CDC compaction — the stream twin of
    :func:`my_cudf_spark.operators.cdc.apply_changelog`: per-key state is
    the single (seq, op, values) tuple with the highest sequence seen so
    far (ties by ``op_col`` descending, same contract as the batch
    operator); each micro-batch emits the keys it touched with their
    current state and an ``is_deleted`` flag, so a downstream MERGE sink
    (cdc.merge_upsert with ``delete_col="is_deleted"``) applies upserts
    and tombstones alike.  Arrival-order independent by construction —
    max-seq wins whatever the micro-batch boundaries.

    Batch frames take the exact keep-latest row_number twin with the SAME
    output schema (keys, seq, is_deleted, values) — the oracle for the
    stream's final snapshot.

    Scale: state is one tuple per key — O(distinct keys), the same bound
    as streaming dedup; the per-batch shuffle carries raw change rows
    once.  ``buckets`` is the high-cardinality lever: keying the state
    store on ``hash(keys) % buckets`` instead of the raw key collapses
    one Python invocation PER KEY per batch (dead at 10⁸ keys) into one
    per bucket, with a vectorized pandas keep-latest over the bucket's
    concatenated state+batch frame — size buckets so a bucket's distinct
    keys fit an Arrow batch comfortably (10³-10⁵ rows).  Same output,
    same oracle; the sf0.1 fixture drops ~5× wall-clock at buckets=64."""
    keys = list(keys)
    value_cols = list(value_cols)
    if not df.isStreaming:
        from pyspark.sql import Window

        w = Window.partitionBy(*keys).orderBy(F.desc(seq_col), F.desc(op_col))
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(
                *keys,
                seq_col,
                (F.col(op_col) == delete_op).alias("is_deleted"),
                *value_cols,
            )
        )

    if buckets is not None:
        return _latest_state_bucketed(
            df, keys, seq_col, op_col, value_cols, delete_op, buckets
        )

    typ = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    key_fields = ", ".join(f"{k} {typ[k]}" for k in keys)
    val_fields = ", ".join(f"{c} {typ[c]}" for c in value_cols)
    out_schema = f"{key_fields}, {seq_col} {typ[seq_col]}, is_deleted boolean"
    state_schema = f"seq {typ[seq_col]}, op {typ[op_col]}"
    if value_cols:
        out_schema += f", {val_fields}"
        state_schema += f", {val_fields}"

    def _native(v):
        return v.item() if hasattr(v, "item") else v

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        best = tuple(state.get) if state.exists else None
        for pdf in pdfs:
            if not len(pdf):
                continue
            top = pdf.sort_values([seq_col, op_col], ascending=False).iloc[0]
            cand = tuple(
                _native(top[c]) for c in [seq_col, op_col, *value_cols]
            )
            if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                best = cand
        state.update(best)
        yield pd.DataFrame(
            [
                dict(zip(keys, key))
                | {seq_col: best[0], "is_deleted": best[1] == delete_op}
                | dict(zip(value_cols, best[2:]))
            ]
        )

    return df.groupBy(*keys).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _latest_state_bucketed(
    df: DataFrame,
    keys: list[str],
    seq_col: str,
    op_col: str,
    value_cols: list[str],
    delete_op: str,
    buckets: int,
) -> DataFrame:
    """Bucketed keep-latest: state keyed on hash(keys) % buckets, one
    vectorized pandas reduction per bucket per batch (see latest_state)."""
    if buckets < 1:
        raise ValueError("buckets must be positive")
    typ = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    cols = [*keys, seq_col, op_col, *value_cols]
    key_fields = ", ".join(f"{k} {typ[k]}" for k in keys)
    out_schema = f"{key_fields}, {seq_col} {typ[seq_col]}, is_deleted boolean"
    if value_cols:
        out_schema += ", " + ", ".join(f"{c} {typ[c]}" for c in value_cols)
    # state = the bucket's current best rows as parallel arrays (positional
    # names: column identity is the `cols` order, immune to collisions)
    state_schema = ", ".join(f"c{i} array<{typ[c]}>" for i, c in enumerate(cols))

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        col_types = {c: typ[c] for c in cols}
        frames = []
        if state.exists:
            arrays = state.get
            frames.append(
                _norm_nullable(
                    pd.DataFrame({c: arrays[i] for i, c in enumerate(cols)}),
                    col_types,
                )
            )
        batch = [pdf[cols] for pdf in pdfs if len(pdf)]
        if not batch:
            yield pd.DataFrame(columns=[*keys, seq_col, "is_deleted", *value_cols])
            return
        batch_pdf = _norm_nullable(
            pd.concat(batch, ignore_index=True), col_types
        )
        frames.append(batch_pdf)
        allf = pd.concat(frames, ignore_index=True)
        best = (
            allf.sort_values([seq_col, op_col], ascending=False, kind="mergesort")
            .drop_duplicates(keys, keep="first")
        )
        state.update(tuple(_plain_list(best[c]) for c in cols))
        touched = batch_pdf[keys].drop_duplicates()
        out = best.merge(touched, on=keys)
        out["is_deleted"] = out[op_col] == delete_op
        yield out[[*keys, seq_col, "is_deleted", *value_cols]]

    bucket = F.pmod(F.hash(*[F.col(k) for k in keys]), F.lit(buckets))
    return (
        df.withColumn("__bkt", bucket)
        .groupBy("__bkt")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _running_totals_bucketed(
    df: DataFrame, keys: list[str], value_col: str, buckets: int
) -> DataFrame:
    """Bucketed running totals: state = the bucket's per-key (n, s) rows
    as parallel arrays; one vectorized pandas reduce per bucket."""
    if buckets < 1:
        raise ValueError("buckets must be positive")
    typ = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    key_fields = ", ".join(f"{k} {typ[k]}" for k in keys)
    out_schema = f"{key_fields}, n_events bigint, sum_value double"
    state_schema = (
        ", ".join(f"k{i} array<{typ[k]}>" for i, k in enumerate(keys))
        + ", n array<bigint>, s array<double>"
    )

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        key_types = {k: typ[k] for k in keys}
        if state.exists:
            arrays = state.get
            cur = _norm_nullable(
                pd.DataFrame(
                    {
                        **{k: arrays[i] for i, k in enumerate(keys)},
                        "n_events": arrays[len(keys)],
                        "sum_value": arrays[len(keys) + 1],
                    }
                ),
                key_types,
            )
        else:
            cur = pd.DataFrame(columns=[*keys, "n_events", "sum_value"])
        batch = [pdf for pdf in pdfs if len(pdf)]
        if not batch:
            yield pd.DataFrame(columns=[*keys, "n_events", "sum_value"])
            return
        b = _norm_nullable(pd.concat(batch, ignore_index=True), key_types)
        delta = (
            b.groupby(keys, dropna=False)[value_col]
            .agg(n_events="size", sum_value=lambda v: float(v.dropna().sum()))
            .reset_index()
        )
        merged = (
            pd.concat([cur, delta], ignore_index=True)
            .groupby(keys, dropna=False)[["n_events", "sum_value"]]
            .sum()
            .reset_index()
        )
        merged = _norm_nullable(merged, key_types)
        state.update(
            tuple(
                _plain_list(merged[c])
                for c in [*keys, "n_events", "sum_value"]
            )
        )
        touched = delta[keys].drop_duplicates()
        out = merged.merge(touched, on=keys)
        out["n_events"] = out["n_events"].astype("int64")
        yield out[[*keys, "n_events", "sum_value"]]

    bucket = F.pmod(F.hash(*[F.col(k) for k in keys]), F.lit(buckets))
    return (
        df.withColumn("__bkt", bucket)
        .groupBy("__bkt")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _heavy_hitters_bucketed(
    df: DataFrame,
    keys: list[str],
    item_col: str,
    k: int,
    capacity: int,
    buckets: int,
) -> DataFrame:
    """Bucketed Space-Saving top-k: the bucket's per-key summaries ride as
    EXPLODED parallel arrays (key…, item, count, err) plus a per-key seen
    array; the per-key merge logic (_space_saving_merge) is unchanged, so
    the summary — and the emitted rows — stay deterministic."""
    if buckets < 1:
        raise ValueError("buckets must be positive")
    typ = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    key_fields = ", ".join(f"{c} {typ[c]}" for c in keys)
    item_type = typ[item_col]
    out_schema = (
        f"{key_fields}, rank int, {item_col} {item_type}, n bigint, n_seen bigint"
    )
    state_schema = (
        ", ".join(f"sk{i} array<{typ[c]}>" for i, c in enumerate(keys))
        + f", sit array<{item_type}>, scnt array<bigint>, serr array<bigint>"
        + ", "
        + ", ".join(f"nk{i} array<{typ[c]}>" for i, c in enumerate(keys))
        + ", nseen array<bigint>"
    )
    nk = len(keys)

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        summaries: dict[tuple, dict[Any, list[int]]] = {}
        seen: dict[tuple, int] = {}
        if state.exists:
            arrays = state.get
            for row in zip(*arrays[: nk + 3]):
                kt, it, c, e = row[:nk], row[nk], row[nk + 1], row[nk + 2]
                summaries.setdefault(kt, {})[it] = [int(c), int(e)]
            for row in zip(*arrays[nk + 3 :]):
                seen[row[:nk]] = int(row[nk])
        batch = [pdf for pdf in pdfs if len(pdf)]
        if not batch:
            yield pd.DataFrame(columns=[*keys, "rank", item_col, "n", "n_seen"])
            return
        b = _norm_nullable(
            pd.concat(batch, ignore_index=True), {k: typ[k] for k in keys}
        )
        touched = []
        for kt, grp in b.groupby(keys, dropna=False, sort=True):
            if not isinstance(kt, tuple):
                kt = (kt,)
            kt = tuple(
                None
                if pd.isna(v)
                else (v.item() if hasattr(v, "item") else v)
                for v in kt
            )
            counts = {}
            for it, n in grp[item_col].dropna().value_counts().items():
                if hasattr(it, "item"):
                    it = it.item()
                counts[it] = int(n)
            summary = summaries.setdefault(kt, {})
            _space_saving_merge(summary, counts, capacity)
            seen[kt] = seen.get(kt, 0) + sum(counts.values())
            touched.append(kt)
        flat_k = [[] for _ in range(nk)]
        flat_it, flat_c, flat_e = [], [], []
        for kt, summary in summaries.items():
            for it, (c, e) in summary.items():
                for i in range(nk):
                    flat_k[i].append(kt[i])
                flat_it.append(it)
                flat_c.append(c)
                flat_e.append(e)
        seen_k = [[kt[i] for kt in seen] for i in range(nk)]
        state.update(
            (*flat_k, flat_it, flat_c, flat_e, *seen_k, [seen[kt] for kt in seen])
        )
        rows = []
        for kt in touched:
            top = sorted(
                summaries[kt].items(), key=lambda kv: (-kv[1][0], kv[0])
            )[:k]
            rows.extend(
                dict(zip(keys, kt))
                | {"rank": r, item_col: it, "n": cnt[0], "n_seen": seen[kt]}
                for r, (it, cnt) in enumerate(top, start=1)
            )
        if not rows:
            yield pd.DataFrame(columns=[*keys, "rank", item_col, "n", "n_seen"])
            return
        yield pd.DataFrame(rows)

    bucket = F.pmod(F.hash(*[F.col(c) for c in keys]), F.lit(buckets))
    return (
        df.withColumn("__bkt", bucket)
        .groupBy("__bkt")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def incremental_agg_totals(
    df: DataFrame,
    key_col: str,
    dsum_col: str,
    dn_col: str,
    buckets: int = 8,
) -> DataFrame:
    """Streaming incremental materialized-view maintenance — the stream
    twin of :func:`my_cudf_spark.operators.cdc.incremental_agg`: per-key
    (sum, count) folded from a CDC delta stream (insert → (+v, +1),
    delete → (−v, −1), update → (Δv, 0)).  Deltas are INTEGERS (the
    caller scales currency to cents), so per-key state is exact int64
    arithmetic and the folded snapshot is arrival-order and chunking
    independent — the batch view-maintenance identity holds on the
    stream.

    State is bucketed (hash(key) % buckets → parallel arrays): one
    Arrow round-trip per bucket per batch; state volume is O(distinct
    keys).  Emits the cumulative ``(key, total, n, version)`` per key a
    batch touches; version (delta rows seen for the key) is strictly
    monotone, so the final snapshot is the max-version row per key.

    The key keeps its INPUT type — the output ``key`` column and the
    state array are declared from ``df.schema[key_col]`` (string /
    decimal / integral keys all work; the former long-only coercion
    failed at runtime on non-integral keys)."""
    ktype = df.schema[key_col].dataType.simpleString()
    rows = df.select(
        F.col(key_col).alias("__k"),
        F.col(dsum_col).cast("long").alias("__ds"),
        F.col(dn_col).cast("long").alias("__dn"),
    ).withColumn("__bkt", F.pmod(F.hash("__k"), F.lit(buckets)))

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.exists:
            ks, tot, n, ver = (list(a) for a in state.get)
            acc = {k: [t, c, v] for k, t, c, v in zip(ks, tot, n, ver)}
        else:
            acc = {}
        batch = [pdf for pdf in pdfs if len(pdf)]
        if not batch:
            yield pd.DataFrame(columns=["key", "total", "n", "version"])
            return
        new = pd.concat(batch, ignore_index=True)
        g = new.groupby("__k").agg(
            ds=("__ds", "sum"), dn=("__dn", "sum"), rows=("__k", "size")
        )
        out = []
        for k, r in g.iterrows():
            # keep the key's native type (numpy scalars → Python natives
            # for the Arrow state round-trip; strings/decimals pass through)
            k = k.item() if hasattr(k, "item") else k
            e = acc.setdefault(k, [0, 0, 0])
            e[0] += int(r["ds"])
            e[1] += int(r["dn"])
            e[2] += int(r["rows"])
            out.append((k, e[0], e[1], e[2]))
        state.update(
            (
                list(acc.keys()),
                [e[0] for e in acc.values()],
                [e[1] for e in acc.values()],
                [e[2] for e in acc.values()],
            )
        )
        yield pd.DataFrame(out, columns=["key", "total", "n", "version"])

    return rows.groupBy("__bkt").applyInPandasWithState(
        update,
        outputStructType=f"key {ktype}, total long, n long, version long",
        stateStructType=(
            f"ks array<{ktype}>, tot array<long>, ns array<long>,"
            " vers array<long>"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
