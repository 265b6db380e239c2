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

from contextlib import contextmanager as _contextmanager

from pyspark.sql import DataFrame

# Persisted frames awaiting release — see `release_caches`.
_LIVE_CACHES: "list[DataFrame]" = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """persist() + register for later `release_caches`. For reused
    (non-iterated) frames: lineage stays intact, so executor loss
    recomputes rather than failing — see module doc."""
    out = df.persist()
    _LIVE_CACHES.append(out)
    return out


def release_caches(blocking: bool = False) -> int:
    """Unpersist every tracked cache; returns how many were released.
    Long-lived sessions call this between requests (bench and the
    parity suite do, per query). Only call after the consumers of the
    cached frames have run their final action."""
    n = 0
    while _LIVE_CACHES:
        df = _LIVE_CACHES.pop()
        try:
            df.unpersist(blocking=blocking)
            n += 1
        except Exception:  # pragma: no cover — session already stopped
            pass
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
    materialized before the block exits."""
    mark = len(_LIVE_CACHES)
    try:
        yield
    finally:
        while len(_LIVE_CACHES) > mark:
            df = _LIVE_CACHES.pop()
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
