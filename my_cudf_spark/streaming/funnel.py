"""Streaming strict-order funnel — the stream twin of
events_funnel_ordered: per-entity funnel progression maintained across
micro-batches, with LATE events allowed to rewrite the progression
(an earlier-timestamped 'view' arriving late can unlock clicks that were
already seen).

Arrival-order independence by RECOMPUTATION over retained history (the
stream_pit correction pattern applied to stage folds): per-entity state
keeps the entity's funnel-step events (ts, event_id, step), every batch
that touches an entity re-runs the greedy earliest-progression fold over
the FULL sorted history, and emissions carry a strictly-monotone version
(events seen for that entity) — the max-version row per entity is
therefore a pure function of the final event set, equal to the batch
fold whatever the chunking.

State is bucketed (hash(entity) % buckets → flat parallel arrays): one
Arrow round-trip per bucket per batch instead of one per entity — the
repo's bucketed-state pattern.  State volume is funnel-step events per
entity over the retention horizon; production bounds it with the same
event-time watermark as sessionization (a sealed entity's stage is
final; its events can be compacted to the (stage, since) pair).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["stream_funnel"]


def stream_funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    type_col: str,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    buckets: int = 8,
) -> DataFrame:
    """Streaming funnel over (user, ts, event_id, event_type) rows — see
    module docstring.  Emits ``(user, stage, version)`` for every entity
    a micro-batch touches; fold with ``max_by(stage, version)`` per
    user.  Greedy semantics match
    :func:`~my_cudf_spark.queries.event_queries.events_funnel_ordered`:
    first step at the earliest event, each later step strictly AFTER the
    previous step's match."""
    step_idx = F.array_position(
        F.array(*[F.lit(s) for s in steps]), F.col(type_col)
    )
    rows = (
        df.filter(F.col(type_col).isin(list(steps)))
        .select(
            F.col(user_col).alias("__u"),
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__ts"),
            F.col(id_col).alias("__eid"),
            (step_idx - 1).cast("int").alias("__step"),
        )
        .withColumn("__bkt", F.pmod(F.hash("__u"), F.lit(buckets)))
    )
    n_steps = len(steps)

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            us, ts, eid, st = (
                np.asarray(a, dtype=np.int64) for a in state.get
            )
        else:
            us, ts, eid, st = (np.empty(0, dtype=np.int64) for _ in range(4))
        batch = [pdf for pdf in pdfs if len(pdf)]
        if not batch:
            yield pd.DataFrame(columns=["user", "stage", "version"])
            return
        new = pd.concat(batch, ignore_index=True)
        us = np.concatenate([us, new["__u"].to_numpy(np.int64)])
        ts = np.concatenate([ts, new["__ts"].to_numpy(np.int64)])
        eid = np.concatenate([eid, new["__eid"].to_numpy(np.int64)])
        st = np.concatenate([st, new["__step"].to_numpy(np.int64)])

        out_u, out_stage, out_ver = [], [], []
        for u in np.unique(new["__u"].to_numpy(np.int64)):
            m = us == u
            order = np.lexsort((eid[m], ts[m]))
            uts, ust = ts[m][order], st[m][order]
            stage, since = 0, None
            for t, s in zip(uts, ust):
                if s == stage and stage < n_steps and (
                    stage == 0 or t > since
                ):
                    stage += 1
                    since = t
            out_u.append(int(u))
            out_stage.append(stage)
            out_ver.append(int(m.sum()))
        state.update((us.tolist(), ts.tolist(), eid.tolist(), st.tolist()))
        yield pd.DataFrame(
            {
                "user": out_u,
                "stage": pd.array(out_stage, dtype="int32"),
                "version": out_ver,
            }
        )

    return rows.groupBy("__bkt").applyInPandasWithState(
        update,
        outputStructType="user long, stage int, version long",
        stateStructType=(
            "us array<long>, ts array<long>, eid array<long>, st array<int>"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
