"""Session-scoped shared index artifacts.

Several query families re-derive the same expensive intermediate in
many registry queries — k-means centroids, the 3-gram Jaccard dedup
graph, the nation trade-flow matrix, the part co-purchase edge list.
In production these are INDEX BUILDS: computed once per corpus
snapshot and served to every downstream report. The engine models
that by memoizing the materialized frame per
(SparkContext applicationId, sf_dir, artifact name).

Every memoized artifact must be deterministic (quantized-integer
k-means, exact integer aggregates, total-ordered top-k), so sharing
cannot change any oracle-checked value. Frames are reliably
materialized (checkpoint files when a checkpoint dir is set, local
blocks otherwise), NOT tracked persists: the cache-leak registry
stays empty and `release_caches` is unaffected.

Footprint contract: the artifacts are deliberately FEW and, with one
exception, DIMENSION-sized (centroids, nation/part edge lists,
component labels — thousands of rows regardless of corpus size). The
exception is the novelty first-owner attribution
(queries/text.py::_novelty_attributed_shared): POSTINGS-sized, one
row per distinct (doc, 3-gram), i.e. proportional to corpus token
count. At 100 TB that artifact is a deliberate index-build trade —
pay one materialization so two reports share it — and deployments
that cannot afford the pinned blocks should point the session at a
reliable checkpoint dir (spilling it to shared storage rather than
executor memory).

Introduced for the embed/dedup families in r8
(queries/similarity.py); factored out in r9 so the graph family can
share it without importing the 3000-line similarity module.
"""

from __future__ import annotations

import threading
import time

from pyspark.sql import DataFrame

from real_time_data_pipeline_spark.operators.materialize import (
    reliable_materialize,
)

# key → (frame, checkpoint dir of the owning context at build time —
# None when the context had no reliable checkpoint dir).
_SHARED_ARTIFACTS: "dict[tuple, tuple[DataFrame, str | None]]" = {}
_SHARED_LOCK = threading.RLock()
# Wall-clock seconds spent INSIDE one-time artifact builds this
# process. Build cost lands on whichever query consumes an artifact
# first, so per-query timings shift with execution order (the bench
# registry order rotates every round); this counter lets a harness
# report the order-dependent build share separately instead of
# misreading it as a per-query regression.
_BUILD_SECONDS = 0.0


def _best_effort_delete_dir(spark, path: str) -> None:
    """Delete a dead context's checkpoint directory via the current
    context's Hadoop FS. Best-effort: eviction must never fail a live
    query because a dead app's files are unreachable."""
    try:  # pragma: no cover — exercised only across session restarts
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        fs.delete(p, True)
    except Exception:  # pragma: no cover
        pass


def _shared_artifact(spark, sf_dir, what, build):
    app = spark.sparkContext.applicationId
    key = (app, sf_dir, what)
    # Double-checked under a lock: concurrent query threads must not
    # each pay for (and race to register) the same index build. The
    # build itself runs inside the lock — the artifacts are
    # deliberately few and one-time, and a duplicate k-means training
    # racing in parallel would waste far more than the serialization.
    # The lock is reentrant, so an artifact build may itself consume
    # other shared artifacts.
    entry = _SHARED_ARTIFACTS.get(key)
    if entry is None:
        with _SHARED_LOCK:
            # Evict artifacts keyed by OTHER applicationIds: they
            # belong to stopped SparkContexts and would pin dead
            # localCheckpoint blocks for the life of the process
            # (ADVICE r8). Keying by appId alone isn't enough — the
            # memo must also *shrink* across session restarts in one
            # process. When the dead context HAD a reliable
            # checkpoint dir, its rdd-* files outlive its
            # ContextCleaner, so eviction also best-effort deletes
            # that per-context directory (safe: the UUID-suffixed dir
            # belongs exclusively to the dead app, and RDD checkpoint
            # dirs are unrelated to streaming-query checkpoints)
            # (ADVICE r9).
            stale_dirs = set()
            current_dir = spark.sparkContext.getCheckpointDir()
            for stale in [k for k in _SHARED_ARTIFACTS if k[0] != app]:
                _, ckpt_dir = _SHARED_ARTIFACTS.pop(stale)
                if ckpt_dir is not None and ckpt_dir != current_dir:
                    stale_dirs.add(ckpt_dir)
            for d in stale_dirs:
                _best_effort_delete_dir(spark, d)
            entry = _SHARED_ARTIFACTS.get(key)
            if entry is None:
                global _BUILD_SECONDS
                t0 = time.perf_counter()
                df = reliable_materialize(build())
                _BUILD_SECONDS += time.perf_counter() - t0
                entry = (df, spark.sparkContext.getCheckpointDir())
                _SHARED_ARTIFACTS[key] = entry
    return entry[0]


def shared_artifact_build_seconds() -> float:
    """Total wall-clock seconds this process has spent in one-time
    shared-artifact builds (see _BUILD_SECONDS note)."""
    return _BUILD_SECONDS


def clear_shared_artifacts() -> None:
    """Drop every memoized artifact. Call after an executor loss in a
    session with no reliable checkpoint dir: localCheckpoint blocks
    died with the executor, and the memo would otherwise keep serving
    frames whose blocks are gone (every consumer fails until the
    memo is cleared or the process restarts)."""
    with _SHARED_LOCK:
        _SHARED_ARTIFACTS.clear()
