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

Introduced for the embed/dedup families in r8
(queries/similarity.py); factored out in r9 so the graph family can
share it without importing the 3000-line similarity module.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

from real_time_data_pipeline_spark.operators.materialize import (
    reliable_materialize,
)

_SHARED_ARTIFACTS: "dict[tuple, DataFrame]" = {}
_SHARED_LOCK = threading.RLock()


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
    df = _SHARED_ARTIFACTS.get(key)
    if df is None:
        with _SHARED_LOCK:
            # Evict artifacts keyed by OTHER applicationIds: they
            # belong to stopped SparkContexts and pin dead
            # localCheckpoint blocks / checkpoint files for the life
            # of the process (ADVICE r8). Keying by appId alone isn't
            # enough — the memo must also *shrink* across session
            # restarts in one process.
            for stale in [k for k in _SHARED_ARTIFACTS if k[0] != app]:
                del _SHARED_ARTIFACTS[stale]
            df = _SHARED_ARTIFACTS.get(key)
            if df is None:
                df = reliable_materialize(build())
                _SHARED_ARTIFACTS[key] = df
    return df


def clear_shared_artifacts() -> None:
    """Drop every memoized artifact. Call after an executor loss in a
    session with no reliable checkpoint dir: localCheckpoint blocks
    died with the executor, and the memo would otherwise keep serving
    frames whose blocks are gone (every consumer fails until the
    memo is cleared or the process restarts)."""
    with _SHARED_LOCK:
        _SHARED_ARTIFACTS.clear()
