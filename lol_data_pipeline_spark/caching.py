"""Tracked persistence: persist() with a release discipline.

`DataFrame.persist()` registers the plan in Spark's CacheManager,
which holds executor storage until an explicit `unpersist()` —
Python GC does NOT reclaim it (the JVM-side cache is keyed by
logical plan, not by the Python object). Operators that persist
intermediates (dedup signature/shingle tables, ANN norm tables)
therefore leak storage across queries in a long-lived session
unless something releases them.

Discipline implemented here:
- operators call `tracked_persist(df)` instead of `df.persist()`;
  every handle lands in a module registry.
- `release_caches()` unpersists everything tracked; registered plan
  entries call it on entry, so a session holds AT MOST one query's
  intermediates (the current one — which must stay cached until the
  caller consumes the lazy result).
- `cache_scope()` gives library users deterministic scoping:
  everything persisted inside the block is unpersisted on exit
  (consume the result inside the block).
"""

from __future__ import annotations

import contextlib
from typing import Iterator

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() that registers the handle for later release."""
    out = df.persist()
    _TRACKED.append(out)
    return out


def release_caches() -> int:
    """Unpersist every tracked intermediate; returns how many were
    released. Safe to call with lazy plans still referencing them —
    they simply recompute (correctness is unaffected)."""
    n = 0
    while _TRACKED:
        _TRACKED.pop().unpersist()
        n += 1
    return n


@contextlib.contextmanager
def cache_scope() -> Iterator[None]:
    """Scope tracked persists: everything persisted inside the block
    is unpersisted on exit. Nestable (inner scopes release only their
    own persists)."""
    mark = len(_TRACKED)
    try:
        yield
    finally:
        while len(_TRACKED) > mark:
            _TRACKED.pop().unpersist()
