"""Custom stateful streaming on the Spark 4 ``transformWithStateInPandas``
surface (the successor of ``applyInPandasWithState`` — typed per-key state
primitives: ValueState / ListState / MapState + timers).

The reference has no stateful streaming at all (SURVEY.md §2.12; its
streaming story is offset-range Kafka pulls into batch frames,
``/root/reference/python/custreamz/custreamz/kafka.py:82-176``), so this —
like ``stateful.running_totals`` — is capability-superset territory; the
value of a second operator here is covering the NEW state API, which is
what production Spark-4 pipelines will write against.

ENVIRONMENT GATE: the transformWithState Python runner requires
``google.protobuf`` (state-server wire protocol).  This sandbox ships no
protobuf and installs are not allowed, so the streaming path raises a
clear error here and runs anywhere protobuf exists; the batch fallback
(plain groupBy count) always works and doubles as the oracle.  Same
gating policy as Avro (sources/io.py) and Kafka (streaming/sources.py).

``type_counts`` keeps a per-user MapState{event_type → count} updated each
micro-batch and emits the refreshed (user, type, n) rows in update mode.
The logic is deliberately ORDER-INSENSITIVE (pure counting): the replay
harness chunks on event_id ranges, so per-user arrival order across
micro-batches is not time-monotonic, and any operator that assumed
monotonic timestamps would be silently wrong.  Timers are not exercised:
bounded replays run with the watermark past the data's span, so an
event-time timer would never fire before the stream drains.

On batch frames the same call degrades to ``groupBy(user, type).count()``
— which is also the DuckDB oracle for the streamed result's final state.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import TYPE_CHECKING, Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.stateful_processor import TimerValues

__all__ = ["type_counts"]


class _TypeCountProcessor(StatefulProcessor):
    """MapState{type_value → running count} per grouping key."""

    def __init__(self, key_cols: Sequence[str], type_col: str):
        self._keys = list(key_cols)
        self._type_col = type_col

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counts = handle.getMapState(
            "counts", "t string", "n bigint"
        )

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: "TimerValues"
    ) -> Iterator[pd.DataFrame]:
        batch_counts: dict[str, int] = {}
        for pdf in rows:
            for t, n in pdf[self._type_col].value_counts().items():
                batch_counts[t] = batch_counts.get(t, 0) + int(n)
        out = []
        for t, add in batch_counts.items():
            prev = (
                self._counts.getValue((t,))[0]
                if self._counts.containsKey((t,))
                else 0
            )
            total = prev + add
            self._counts.updateValue((t,), (total,))
            out.append(dict(zip(self._keys, key)) | {self._type_col: t, "n": total})
        yield pd.DataFrame(out)

    def close(self) -> None:
        pass


def type_counts(
    df: DataFrame, keys: Sequence[str], type_col: str
) -> DataFrame:
    """Per-key per-``type_col`` running counts across micro-batches.

    Streaming: transformWithStateInPandas in update mode — each batch emits
    the refreshed totals for the (key, type) pairs it touched; callers keep
    the final row per pair (``max_by``/``max``) after draining.
    Batch: the equivalent groupBy count (the oracle)."""
    keys = list(keys)
    if not df.isStreaming:
        return df.groupBy(*keys, type_col).agg(F.count(F.lit(1)).alias("n"))
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:  # pragma: no cover — env-dependent
        raise NotImplementedError(
            "transformWithStateInPandas requires the protobuf package "
            "(state-server wire protocol): pip install protobuf"
        ) from e
    key_fields = ", ".join(
        f"{k} {df.schema[k].dataType.simpleString()}" for k in keys
    )
    out_schema = f"{key_fields}, {type_col} string, n bigint"
    return df.groupBy(*keys).transformWithStateInPandas(
        _TypeCountProcessor(keys, type_col),
        outputStructType=out_schema,
        outputMode="update",
        timeMode="none",
    )
