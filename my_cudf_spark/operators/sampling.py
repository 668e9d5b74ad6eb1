"""Deterministic sampling for training-data pipelines.

Random sampling (``df.sample``) is irreproducible across cluster sizes —
partition-seeded RNG changes membership when the partitioning changes.
Training pipelines need CONTENT-KEYED sampling: membership is a pure
function of the row's key, so the same corpus yields the same sample on
any cluster, resumes are consistent, and train/test splits never leak
when data is re-partitioned or re-ingested.  (The reference exposes only
partition-seeded `sample` — copying.hpp:30 `cudf::sample` — so this is a
capability superset in the spirit of SURVEY §2.3.)

Mechanism: md5 over the key columns (+ optional salt), compare a fixed
hex prefix against a precomputed threshold.  Lowercase fixed-width hex
compares lexicographically = numerically, and md5 is available in every
engine (the DuckDB oracles run the identical expression) — no float
rounding, no RNG, no engine-specific hash.

All three operators are narrow (no shuffle) except ``stratified_sample``,
which needs one hash-partitioned window per stratum — the exact per-group
top-n shape.  Nothing here touches the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["hash_bucket", "hash_sample", "assign_splits", "stratified_sample"]

_PREFIX_LEN = 8  # 32 bits of the digest: plenty for sampling resolution


def hash_bucket(key_cols: Sequence[str | Column], salt: str = "") -> Column:
    """Deterministic hex bucket in [0, 16^8) as a fixed-width lowercase hex
    string — the comparable sampling key. Same formula the oracles use:
    ``substr(md5(concat_ws('|', salt, keys...)), 1, 8)``."""
    cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    return F.substring(
        F.md5(F.concat_ws("|", F.lit(salt), *[c.cast("string") for c in cols])),
        1,
        _PREFIX_LEN,
    )


def _threshold_hex(fraction: float) -> str:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return format(int(fraction * (16**_PREFIX_LEN)), f"0{_PREFIX_LEN}x")


def hash_sample(
    df: DataFrame,
    key_cols: Sequence[str | Column],
    fraction: float,
    salt: str = "",
) -> DataFrame:
    """Keep ~``fraction`` of rows, membership a pure function of the key
    (re-runs, re-partitions, and other engines agree exactly)."""
    return df.filter(hash_bucket(key_cols, salt) < F.lit(_threshold_hex(fraction)))


def assign_splits(
    df: DataFrame,
    key_cols: Sequence[str | Column],
    weights: dict[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Label every row with a deterministic split ('train'/'val'/'test'…)
    by cumulative hash-threshold — disjoint, exhaustive, leak-free under
    re-partitioning.  ``weights`` must sum to 1 (±1e-9)."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    bucket = hash_bucket(key_cols, salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = bucket < F.lit(_threshold_hex(acc))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame,
    strata_cols: Sequence[str],
    key_cols: Sequence[str | Column],
    n_per_stratum: int,
    salt: str = "",
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum, chosen by hash rank
    (deterministic; one shuffle).  Equal per-stratum quotas are the usual
    balanced-corpus construction; for proportional quotas use
    ``hash_sample`` filtered per stratum."""
    if n_per_stratum <= 0:
        raise ValueError("n_per_stratum must be positive")
    keys = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    w = Window.partitionBy(*strata_cols).orderBy(
        hash_bucket(key_cols, salt), *[k.cast("string") for k in keys]
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )
