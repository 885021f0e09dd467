"""Operator-scoped cache accounting (r3 VERDICT #6 / carried ADVICE).

Several operators ``persist()`` intermediates that feed multiple
subtrees (minhash band tables, semdedup assignments, curation stage
boundaries) — necessarily, or every consumer would recompute the
prefix. The r1-r3 contract was *caller* hygiene: call
``spark.catalog.clearCache()`` when done (the bench.py pattern). That
contract nukes every cache in the session and leaks storage in
long-lived sessions that forget. This module adds the scoped
alternative:

    from spark_fits_spark import caching

    with caching.release_after():
        out = pipeline.curate_corpus(docs)
        out["clean"].write.parquet(...)   # consume INSIDE the scope
    # here: every cache block the operators pinned is released

Mechanics
---------
- Package persist sites route through :func:`tracked_persist`; with no
  active scope it is exactly ``DataFrame.persist`` (r3 behavior).
- ``localCheckpoint`` blocks (the connected-components lineage
  truncation) are RDD-level persists the cache manager cannot see;
  :func:`tracked_local_checkpoint` registers them and
  :func:`free_local_checkpoint` walks the plan's ``LogicalRDD`` leaves
  and unpersists their RDDs directly — otherwise the blocks linger
  until both Python and JVM GC happen to run (ContextCleaner).
- Scopes nest and are thread-local: each releases only blocks pinned
  by operator calls on its own thread inside its own ``with`` body, so
  concurrent jobs in one session don't cross-free.
- Releasing is idempotent (``unpersist`` on a released block is a
  no-op), and ONLY safe after the scope's results are fully consumed —
  a DataFrame escaping the scope recomputes from source on next use.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_tls = threading.local()


def _scopes() -> list[list]:
    s = getattr(_tls, "scopes", None)
    if s is None:
        s = _tls.scopes = []
    return s


def tracked_persist(
    df: DataFrame,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """``df.persist(level)``, registered with the innermost active
    :func:`release_after` scope (no-op registration without one)."""
    df = df.persist(level)
    s = _scopes()
    if s:
        s[-1].append(("persist", df))
    return df


def tracked_local_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """``df.localCheckpoint(eager)``, registered for RDD-level release
    at scope exit (checkpoint blocks bypass the cache manager)."""
    out = df.localCheckpoint(eager=eager)
    s = _scopes()
    if s:
        s[-1].append(("checkpoint", out))
    return out


def free_local_checkpoint(df: DataFrame) -> bool:
    """Unpersist the RDD blocks behind a ``localCheckpoint``-ed
    DataFrame NOW instead of waiting for Python+JVM GC and the
    ContextCleaner. Walks the analyzed plan's ``LogicalRDD`` leaves via
    py4j (internal API — failure is swallowed, GC remains the
    backstop). Only call when ``df`` will never be evaluated again: a
    checkpointed plan has no lineage to recompute from."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        leaves = plan.collectLeaves()
        freed = False
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            if leaf.getClass().getSimpleName() == "LogicalRDD":
                leaf.rdd().unpersist(False)
                freed = True
        return freed
    except Exception:
        return False


@contextmanager
def release_after(blocking: bool = False):
    """Scope whose exit releases every tracked persist/checkpoint block
    pinned inside it (innermost scope wins for nesting). Consume your
    results before the scope closes."""
    mine: list[tuple[str, DataFrame]] = []
    _scopes().append(mine)
    try:
        yield
    finally:
        _scopes().pop()
        for kind, df in reversed(mine):
            try:
                if kind == "persist":
                    df.unpersist(blocking)
                else:
                    free_local_checkpoint(df)
            except Exception:
                pass  # releasing is best-effort; GC is the backstop


def persistent_rdd_count(spark) -> int:
    """Number of RDDs currently holding storage blocks in the session
    (cache-manager persists AND checkpoint blocks) — the observability
    hook the release test pins."""
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def persistent_rdd_ids(spark) -> set[int]:
    """Ids of RDDs currently holding storage blocks. Prefer comparing
    SETS across a scope (new ids must not survive) over raw counts:
    blocks left by unrelated earlier work can be garbage-collected by
    the ContextCleaner at any moment, shifting counts underneath a
    before/after comparison."""
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().keysIterator()
    out = set()
    while it.hasNext():
        out.add(it.next())
    return out
