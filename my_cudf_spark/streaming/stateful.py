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
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Per-key running (n_events, sum_value), updated each micro-batch."""
    keys = list(keys)
    if not df.isStreaming:
        return df.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )

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
