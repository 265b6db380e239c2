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
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def reliable_materialize(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate ``df``'s lineage; durable against executor loss when
    the session has a reliable checkpoint directory, else local."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
