"""Structured Streaming layer (SURVEY.md §2.12).

The reference's only streaming surface is Kafka micro-batch ingest
(custreamz ``Consumer.read_gdf``, /root/reference/python/custreamz/custreamz/
kafka.py:82-176).  Our engine is a capability superset: the same function
library runs on streaming DataFrames, with event-time watermarks, tumbling/
sliding/session windows and stateful operators — all Structured Streaming
builtins.  Operators take batch OR streaming frames and build the identical
plan, so the batch result is the oracle for the stream.
"""

from my_cudf_spark.streaming.ops import (
    dedup,
    run_to_memory,
    session_agg,
    sliding_agg,
    tumbling_agg,
)
from my_cudf_spark.streaming.sources import (
    kafka_batch_read,
    kafka_stream,
    replay_events,
)
from my_cudf_spark.streaming.stateful import running_totals

__all__ = [
    "dedup",
    "kafka_batch_read",
    "kafka_stream",
    "replay_events",
    "run_to_memory",
    "running_totals",
    "session_agg",
    "sliding_agg",
    "tumbling_agg",
]
