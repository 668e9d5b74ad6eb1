"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``my_cudf_spark.queries``: every implemented operator
family from SURVEY.md §2 registers a named query (Spark callable + DuckDB
oracle SQL) there; this module exposes the registry in the driver's shape.
"""

from __future__ import annotations

import glob
import json
import os
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from my_cudf_spark.queries import load_registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (NDS-H Q1) on /root/testdata/sf0.001."""
    registry = load_registry()
    return registry["ndsh_q1"].fn(spark, "/root/testdata/sf0.001")


def _last_verified_round() -> dict[str, int]:
    """name -> most recent round with a green driver CORRECTNESS row.

    The driver verifies only the first N registered queries per round, so
    ``queries()`` orders never-verified queries first and then
    least-recently-verified — every query rotates through driver
    verification across rounds with no manual re-ordering.
    """
    seen: dict[str, int] = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("rows_match") and not row.get("err"):
                seen[name] = max(seen.get(name, 0), rnd)
    return seen


# Queries whose physical plan changed AFTER their most recent green driver
# row: they jump the rotation queue — right after never-verified queries —
# so the driver re-proves the CURRENT plan instead of spending the row
# budget on unchanged backlog.  The boost EXPIRES once the driver
# re-verifies at/after _PLAN_CHANGED_ROUND (a static set would otherwise
# preempt the stale backlog forever); bump the round and refresh the set
# whenever a green query's plan changes again.  (All r5/r6 names were
# driver-re-verified in r06, so the r6 set is cleared.)
_PLAN_CHANGED_ROUND = 7
_PLAN_CHANGED_SINCE_LAST_CHECK = frozenset(
    {
        # r7 edits: t-digest bucketed-state restore now _norm_nullable-
        # normalizes keys (Python fn rides in the plan), and
        # cdc_merge_bucketed's warehouse-path setup was URI-hardened
        "stream_quantile_replay",
        "cdc_merge_bucketed",
    }
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2.

    Ordered never-verified first, then plan-changed-since-last-check, then
    least-recently-verified (see ``_last_verified_round``)."""
    registry = load_registry()
    seen = _last_verified_round()
    order = {name: i for i, name in enumerate(registry)}

    def rank(n: str):
        if n not in seen:
            tier = 0
        elif (
            n in _PLAN_CHANGED_SINCE_LAST_CHECK
            and seen[n] < _PLAN_CHANGED_ROUND
        ):
            tier = 1
        else:
            tier = 2
        return (tier, seen.get(n, -1), order[n])

    ranked = sorted(registry, key=rank)
    return {name: registry[name].fn for name in ranked}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each SQL-expressible query."""
    return {name: q.sql for name, q in load_registry().items() if q.sql is not None}
