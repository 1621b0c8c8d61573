"""Query-scoped cache management.

Self-join-shaped plans (MinHash banding, LSH bucketing, SimHash
all-pairs) must ``persist()`` their shared input or Spark recomputes the
full upstream pipeline once per reference.  But a persist with no
matching unpersist leaks: across a long registry run on one shared
session the block manager accumulates every query's cache (visible as
``CacheManager: Asked to cache already cached data`` warnings and
creeping executor memory).

The contract here: a query builder calls :func:`scoped_persist` for any
DataFrame it needs cached *while its result is being consumed*.  The
registry wrapper (plans/registry.py) calls :func:`release_persisted`
right before building the NEXT query — by which point the previous
query's result has been collected and its caches are dead weight.  Live
cached handles are therefore bounded by one query's working set, not the
whole run's.

CONCURRENCY CONTRACT (deliberate, documented): the module-global
``_LIVE`` list assumes strict single-threaded build → consume → build
sequencing — the driver's, bench's, and pytest's actual execution
model.  Two interleaved registered-query consumers on one session would
release each other's caches (silent full recompute, never wrong
results).  Callers OUTSIDE the registry path (backfills invoking
``connected_components`` directly, notebooks) should not rely on the
registry's deferred release firing: wrap the work in
:func:`cache_scope`, which releases exactly the handles persisted
inside the ``with`` block, deterministically, on exit.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def scoped_persist(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK_DESER
) -> DataFrame:
    """Persist ``df`` and track the handle for deferred release.

    Default is MEMORY_AND_DISK_DESER (DataFrame.persist's own default):
    A/B-measured on the MinHash signature relation (array-heavy, the
    worst case for object boxing) at 1× and 10× local scale, serialized
    MEMORY_AND_DISK was ~20% slower at 1× and a wash at 10× — the
    single-expression signature rewrite removed the materialization cost
    that once favored serialized blocks.  Call sites that cache a
    relation larger than executor memory can pass ``level`` explicitly;
    serialized blocks spill to disk more compactly."""
    df = df.persist(level)
    _LIVE.append(df)
    return df


def track(df: DataFrame) -> DataFrame:
    """Track an already-persisted handle for deferred release."""
    _LIVE.append(df)
    return df


def release_persisted() -> None:
    """Unpersist every tracked handle (idempotent, never raises)."""
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist()
        except Exception:
            pass


def release_local_checkpoint(df: DataFrame) -> None:
    """Free the RDD blocks behind a ``localCheckpoint(eager=True)``
    handle (best-effort, never raises).

    ``unpersist()`` on a checkpointed DataFrame is a no-op — the blocks
    live on the checkpointed RDD captured by the plan's LogicalRDD
    node, not in the CacheManager — so without this, every checkpoint
    taken on a long-lived session accumulates block-manager memory
    until the DataFrame is GC'd (r11 ADVICE on pipelines/curation.py).
    The handle (and anything derived from it that was not itself
    materialized) must NOT be used after release: its data is gone."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


@contextmanager
def cache_scope():
    """Deterministic release for non-registry callers.

    Handles persisted (via :func:`scoped_persist` / :func:`track`)
    inside the ``with`` block are unpersisted on exit — even on error —
    without touching handles that were already live when the scope
    opened.  Consume (collect/write) the result INSIDE the block; after
    exit its caches are gone and evaluation falls back to full
    recompute."""
    mark = len(_LIVE)
    try:
        yield
    finally:
        while len(_LIVE) > mark:
            df = _LIVE.pop()
            try:
                df.unpersist()
            except Exception:
                pass
