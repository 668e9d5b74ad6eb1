"""SparkSession construction with a scale-minded configuration profile.

The same profile is used by tests, ``bench.py`` and ``__spark_entry__.py``
(when the driver lets us build the session).  On a real cluster only the
master / memory settings change; the SQL-level knobs below are the ones that
matter for plan quality at 100 TB:

- AQE on (runtime coalescing, skew-join splitting, dynamic join strategy).
- Parquet filter/aggregate pushdown on; vectorized reader on.
- Arrow for any pandas interchange (UDF and toPandas paths).
- A broadcast threshold sized for dimension tables (region/nation/supplier/
  part/customer at typical star-schema ratios).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied to *any* session (including one handed to us
# by a driver) before our queries run.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Older fixture generations stored events.ts as timestamp[ns]; Spark has
    # no ns timestamp type, so read those as long and convert to µs in
    # sources.load_table (type-aware — a no-op on µs-native fixtures).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # dims here are tiny vs. fact tables; 64 MiB is a sane cluster default.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
}


# Sessions already configured by apply_runtime_confs, keyed by JVM session
# identity: load_table re-applies the profile defensively on EVERY call
# (a driver may hand us a fresh session mid-run), and each conf.set is a
# py4j round trip — ~10 per table load adds up to whole seconds across a
# bench sweep.  One pass per session is enough; queries that TEMPORARILY
# override a conf (the streaming drain) restore it themselves.
import weakref

_CONFIGURED_SESSIONS: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()


# One profile conf re-read per memoized call (single py4j round trip vs the
# full ~10-set pass): if an external driver mutated the profile between
# queries, the cheap sentinel check notices and the full pass re-applies.
# Repo-internal temporary overrides (the streaming drain) touch only confs
# OUTSIDE this profile and restore themselves in ``finally``.
_SENTINEL_CONF = "spark.sql.session.timeZone"


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Best-effort apply of runtime-settable confs to an existing session
    (idempotent and memoized per live session object; a one-conf sentinel
    read detects external mutation and triggers a full re-apply)."""
    if spark in _CONFIGURED_SESSIONS:
        try:
            if spark.conf.get(_SENTINEL_CONF) == RUNTIME_CONFS[_SENTINEL_CONF]:
                return spark
        except Exception:
            return spark
        _CONFIGURED_SESSIONS.discard(spark)
    for k, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, value)
        except Exception:
            pass  # non-runtime-settable under this deployment; defaults stand
    _CONFIGURED_SESSIONS.add(spark)
    return spark


def get_spark(app_name: str = "my_cudf_spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a local session sized from $SPARK_GRAFT_CPUS."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    return apply_runtime_confs(builder.getOrCreate())
