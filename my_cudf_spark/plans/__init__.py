"""Plan inspection & scale guardrails (SURVEY.md §4: all reference
rewrites are Catalyst builtins — this package verifies Catalyst actually
applied them per query)."""

from my_cudf_spark.plans.inspect import (
    cache_substitution,
    count_broadcasts,
    count_shuffles,
    forced_broadcast_hints,
    global_window_subtrees,
    has_cartesian,
    physical_plan,
    plan_report,
    pushed_filters,
    read_schemas,
)

__all__ = [
    "cache_substitution",
    "count_broadcasts",
    "count_shuffles",
    "forced_broadcast_hints",
    "global_window_subtrees",
    "has_cartesian",
    "physical_plan",
    "plan_report",
    "pushed_filters",
    "read_schemas",
]
