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
from typing import Any, Iterator

from pyspark.sql import DataFrame

# anything with a zero-arg .unpersist(): DataFrames from
# tracked_persist, and JVM RDD handles from truncate_lineage's
# localCheckpoint branch (their MEMORY_AND_DISK blocks are otherwise
# reclaimed only when the JVM ContextCleaner GCs the RDD)
_TRACKED: list[Any] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() that registers the handle for later release."""
    out = df.persist()
    _TRACKED.append(out)
    return out


def truncate_lineage(df: DataFrame) -> DataFrame:
    """Checkpoint ``df`` to cut its logical plan — the per-round step
    of iterative kernels (connected components, PageRank), whose plan
    otherwise embeds the previous round's plan twice and grows
    O(2^rounds) (plain persist caches data but keeps the full tree;
    the tree's re-stringification alone OOMs a default-1g driver).

    Two tiers:
    - a checkpoint dir is set (``sc.setCheckpointDir``): RELIABLE
      ``checkpoint()`` — blocks live on the fault-tolerant store, so
      an executor loss mid-iteration recomputes nothing from scratch.
      This is the 100 TB-cluster posture.
    - no checkpoint dir (default local session): ``localCheckpoint()``
      — executor-local MEMORY_AND_DISK blocks; fast, but an executor
      loss kills the lineage. The freshly persisted RDD handle is
      registered so ``release_caches()`` frees its blocks
      deterministically instead of waiting for JVM GC.
    """
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=False)
    jsc = sc._jsc
    before = set(jsc.getPersistentRDDs().keySet().toArray())
    out = df.localCheckpoint(eager=False)
    # rdd.localCheckpoint() marks its RDD persisted immediately (even
    # with eager=False), so the new handle is visible right away
    pers = jsc.getPersistentRDDs()
    for rid in set(pers.keySet().toArray()) - before:
        _TRACKED.append(pers.get(rid))
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
