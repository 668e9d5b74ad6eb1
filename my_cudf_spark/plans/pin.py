"""Semantic-hash-keyed LRU of persisted frames (call-owned subplan reuse).

A builder that returns a LAZY frame referencing a shared projection (gram
sets in :mod:`..operators.dedup`, token projections in
:mod:`..functions.text`) cannot unpersist inside the builder — the caller
executes later.  Instead every such projection goes through
:func:`lru_persist`: a repeated identical build (same source, same
expression → same ``semanticHash``) returns the SAME persisted frame so
Spark's plan-based cache substitution stays warm, and distinct builds
beyond ``cap`` evict the least-recent.  Unpersist is advisory — an
unconsumed older plan just recomputes — so eviction never affects
correctness, only caching.  Long-lived sessions stay bounded at ``cap``
frames; :func:`release_persisted` drops them all eagerly.
"""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

__all__ = ["lru_persist", "release_persisted"]

_CACHE: OrderedDict[int, DataFrame] = OrderedDict()
# Sized for the largest COMPOSED pipeline stage, not one query: a curation
# stage can hold 2 token projections (bm25 + LM) + 4 gram frames (dedup
# pair builders) + a semantic-dedup assignment at once; eviction before a
# frame's consumers run silently reverts it to multi-scan (correct but the
# exact regression the r4 verdict flagged).  MEMORY_AND_DISK spills, so
# the cap bounds executor-storage entries, not heap.
_CACHE_CAP = 12


def lru_persist(df: DataFrame) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK) under its semantic hash, reusing a
    live identical frame when one exists; bounded LRU eviction."""
    try:
        key = df.semanticHash()
    except Exception:  # pragma: no cover — defensive: hash failure disables reuse
        key = id(df)
    hit = _CACHE.get(key)
    if hit is not None:
        # semanticHash is 32-bit — a collision between two DIFFERENT plans
        # would silently return the wrong frame (wrong results, not a perf
        # miss), so a hit must confirm plan equality before reuse.
        try:
            same = df.sameSemantics(hit)
        except Exception:  # pragma: no cover — defensive, treat as miss
            same = False
        if same:
            _CACHE.move_to_end(key)
            return hit
        # collision: evict the old occupant before the slot is reused
        try:
            hit.unpersist()
        except Exception:
            pass
        del _CACHE[key]
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _CACHE[key] = df
    while len(_CACHE) > _CACHE_CAP:
        _, old = _CACHE.popitem(last=False)
        try:
            old.unpersist()
        except Exception:
            pass
    return df


def release_persisted() -> int:
    """Unpersist every frame in the LRU (call once consumers finish, e.g.
    at the end of a pipeline stage).  Returns the number released."""
    n = 0
    for df in _CACHE.values():
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to release
            pass
    _CACHE.clear()
    return n
