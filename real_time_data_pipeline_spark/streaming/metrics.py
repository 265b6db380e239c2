"""Streaming observability: per-micro-batch progress capture.

The reference ships Grafana/Prometheus pointers but no in-engine
metrics surface (`/root/reference/docker-compose.yml` monitoring
services; SURVEY §6). This module closes that as code: a
`StreamingQueryListener` that records every micro-batch's progress
(rows, processing rate, durations, watermark, state-store size) into
a bounded in-memory buffer, plus a converter to a DataFrame so the
metrics are queryable with the same engine that produced them — the
input a DQ check or an alerting rule actually needs (e.g. "batch
duration p95 over the last hour", "input rate vs processing rate").

Scale notes: the listener runs on the DRIVER and holds only the last
``max_batches`` compact progress dicts (bounded deque, default 1k) —
never row data. For durable metrics, point `progress_frame` at a
parquet sink on a schedule; the frame is tiny (one row per
micro-batch) so the write cost is noise.
"""

from __future__ import annotations

import json
import threading
from collections import deque

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

_FIELDS = [
    ("query_name", "string"),
    ("batch_id", "long"),
    ("timestamp", "string"),
    ("num_input_rows", "long"),
    ("input_rows_per_second", "double"),
    ("processed_rows_per_second", "double"),
    ("batch_duration_ms", "long"),
    ("state_rows", "long"),
    ("watermark", "string"),
]
PROGRESS_SCHEMA = ", ".join(f"{n} {t}" for n, t in _FIELDS)


class ProgressCapture(StreamingQueryListener):
    """Collects micro-batch progress events into a bounded buffer.

    Appends happen on Spark's listener-bus thread while readers call
    `rows`/`progress_frame` from their own — the buffer is guarded by
    a lock (an unguarded deque raises mid-iteration when mutated)."""

    def __init__(self, max_batches: int = 1000):
        self._buf: deque = deque(maxlen=max_batches)
        self._lock = threading.Lock()

    # -- StreamingQueryListener interface --------------------------------
    def onQueryStarted(self, event) -> None:  # pragma: no cover - trivial
        pass

    def onQueryProgress(self, event) -> None:
        p = json.loads(event.progress.json)
        durations = p.get("durationMs") or {}
        # Sum across ALL state operators: a dedup + windowed-agg (or
        # stream-stream join) query reports several, and an unbounded
        # second operator must not hide behind the first.
        state_rows = sum(
            op.get("numRowsTotal", 0) for op in p.get("stateOperators") or []
        )
        row = {
            "query_name": p.get("name"),
            "batch_id": p.get("batchId"),
            "timestamp": p.get("timestamp"),
            "num_input_rows": p.get("numInputRows", 0),
            "input_rows_per_second": float(p.get("inputRowsPerSecond") or 0.0),
            "processed_rows_per_second": float(
                p.get("processedRowsPerSecond") or 0.0
            ),
            "batch_duration_ms": durations.get("triggerExecution", 0),
            "state_rows": state_rows,
            "watermark": (p.get("eventTime") or {}).get("watermark"),
        }
        with self._lock:
            self._buf.append(row)

    def onQueryTerminated(self, event) -> None:  # pragma: no cover - trivial
        pass

    def onQueryIdle(self, event) -> None:  # pragma: no cover - trivial
        pass

    # -- query surface ---------------------------------------------------
    def rows(self) -> list[dict]:
        with self._lock:
            return list(self._buf)

    def progress_frame(self, spark: SparkSession) -> DataFrame:
        """The captured progress as a DataFrame (PROGRESS_SCHEMA) —
        empty-safe, so monitoring queries run before the first batch."""
        rows = self.rows()
        if not rows:
            return spark.createDataFrame([], PROGRESS_SCHEMA)
        return spark.createDataFrame(
            [tuple(r[name] for name, _ in _FIELDS) for r in rows],
            PROGRESS_SCHEMA,
        )


def attach_progress_capture(
    spark: SparkSession, max_batches: int = 1000
) -> ProgressCapture:
    """Register a fresh capture listener on the session and return it.
    Detach with ``spark.streams.removeListener(capture)``."""
    cap = ProgressCapture(max_batches=max_batches)
    spark.streams.addListener(cap)
    return cap
