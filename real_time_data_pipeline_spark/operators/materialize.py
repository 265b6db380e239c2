"""Lineage-truncating materialization with a durability choice.

Iterative DataFrame programs (PageRank, recursive reachability,
k-means, pointer-jumping) must truncate lineage between reuses or the
plan grows per iteration. Two Spark primitives do that:

- ``localCheckpoint()``: blocks stored on EXECUTORS. Fast (no extra
  filesystem round-trip) but NOT fault-tolerant — if an executor
  holding blocks is lost (dynamic allocation scale-in, spot
  preemption, OOM kill), the job FAILS instead of recomputing.
- ``checkpoint()``: blocks written to the session's reliable
  checkpoint directory (HDFS / object store on a cluster). Survives
  executor loss; costs one write+read of the frame.

`reliable_materialize` picks per deployment: reliable ``checkpoint()``
whenever the session has a checkpoint directory configured
(``sc.setCheckpointDir`` — every real cluster should set one, to
shared storage), falling back to ``localCheckpoint()`` when none is
set (single-JVM ``local[N]`` runs, where "executor loss" would mean
the whole JVM died anyway). At 100× scale the fallback is the wrong
default, so cluster entry points must set the directory — the docs
recipe (docs/cluster-smoke.md) and `session.get_spark`'s
``SPARK_GRAFT_CHECKPOINT_DIR`` handle this.

Checkpoint files are cleaned when the source RDD is garbage-collected
iff ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (set in
`session._DEFAULTS`); otherwise they live until the directory is
cleared.

For frames that are merely REUSED (self-joins, multi-branch reads)
rather than iterated over, `persist_tracked` is the better tool: it
keeps lineage intact, so an executor loss RECOMPUTES the partitions
instead of failing the job (strictly better fault behavior than
localCheckpoint), shares one computation across all consuming
branches, and costs no filesystem round-trip. Its registry pairs with
`release_caches()` exactly like the ranking operators' cache registry
(operators/ranking.py delegates here).
"""

from __future__ import annotations

import threading as _threading
from contextlib import contextmanager as _contextmanager

from pyspark.sql import DataFrame

# Persisted frames awaiting release — see `release_caches`. Guarded by
# _LOCK: concurrent foreachBatch bodies / multi-query threads register
# and release caches from different threads (ADVICE r8).
_LIVE_CACHES: "list[DataFrame]" = []
_LOCK = _threading.RLock()
# Per-thread stack of active `cache_scope` collectors: a scope tracks
# the exact frames ITS thread created, so releasing a scope can never
# unpersist another thread's not-yet-materialized frame (the
# de-canonicalization hazard ranking.py documents).
_SCOPES = _threading.local()


def persist_tracked(df: DataFrame) -> DataFrame:
    """persist() + register for later release. For reused
    (non-iterated) frames: lineage stays intact, so executor loss
    recomputes rather than failing — see module doc.

    Registration target: the innermost `cache_scope` active on THIS
    thread if any (released when that scope exits), else the global
    registry (released by `release_caches`)."""
    out = df.persist()
    stack = getattr(_SCOPES, "stack", None)
    if stack:
        stack[-1].append(out)
    else:
        with _LOCK:
            _LIVE_CACHES.append(out)
    return out


def _is_materialized(df: DataFrame) -> bool:
    """Best-effort probe: have ``df``'s cached column buffers been
    built (i.e. has at least one action run through the cache)?

    Uses the CacheManager entry's ``isCachedColumnBuffersLoaded`` (a
    stable field since Spark 3.1, verified against the pinned PySpark
    by tests/test_registry.py::
    test_hygiene_drain_skips_unmaterialized_persists). Returns True — "safe to
    drain" — when the cache entry is already gone (unpersist would be
    a no-op) or the probe itself fails (degrades to the pre-r15
    always-drain behavior rather than to unbounded accumulation)."""
    try:
        jss = df.sparkSession._jsparkSession
        entry = jss.sharedState().cacheManager().lookupCachedData(df._jdf)
        if not entry.isDefined():
            return True
        return bool(
            entry.get().cachedRepresentation().cacheBuilder().isCachedColumnBuffersLoaded()
        )
    except Exception:  # pragma: no cover — py4j internals shifted
        return True


def release_caches(blocking: bool = False, materialized_only: bool = False) -> int:
    """Unpersist every tracked cache; returns how many were released.
    Long-lived sessions call this between requests (bench and the
    parity suite do, per query). Only call after the consumers of the
    cached frames have run their final action.

    ``materialized_only=True`` (the registry hygiene drain) skips —
    and re-registers for a later drain — any cache whose buffers have
    never been built: unpersisting a never-materialized ranking
    persist de-canonicalizes its count/rank branches onto independent
    range exchanges and silently corrupts global offsets (ranking.py
    module doc; ADVICE r14 #1). A never-materialized persist holds no
    blocks, so skipping it costs nothing; it is drained by the next
    call after its consumer's first action."""
    with _LOCK:
        drained, _LIVE_CACHES[:] = _LIVE_CACHES[:], []
    kept: "list[DataFrame]" = []
    n = 0
    for df in drained:
        if materialized_only and not _is_materialized(df):
            kept.append(df)
            continue
        try:
            df.unpersist(blocking=blocking)
            n += 1
        except Exception:  # pragma: no cover — session already stopped
            pass
    if kept:
        with _LOCK:
            _LIVE_CACHES.extend(kept)
    return n


@_contextmanager
def cache_scope():
    """Release-on-exit scope for `persist_tracked` caches created
    INSIDE the block — for library code that runs repeatedly in a
    long-lived process (a foreachBatch body, a service handler) and
    must not leak one cache per invocation, while leaving any caches
    the CALLER had registered before the scope untouched (a global
    release here could unpersist a caller's not-yet-materialized
    ranking frame — the correctness hazard in ranking.py's module
    doc). Everything created inside the scope must be fully
    materialized before the block exits.

    The scope records the EXACT frames registered on its own thread
    (a thread-local stack, nested scopes nest), not a length
    watermark into the global list — concurrent foreachBatch bodies
    on other threads can therefore never have their caches popped by
    this scope's exit (ADVICE r8)."""
    stack = getattr(_SCOPES, "stack", None)
    if stack is None:
        stack = _SCOPES.stack = []
    mine: "list[DataFrame]" = []
    stack.append(mine)
    try:
        yield
    finally:
        stack.pop()
        for df in reversed(mine):
            try:
                df.unpersist(blocking=False)
            except Exception:  # pragma: no cover — session already stopped
                pass


def reliable_materialize(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate ``df``'s lineage; durable against executor loss when
    the session has a reliable checkpoint directory, else local."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
