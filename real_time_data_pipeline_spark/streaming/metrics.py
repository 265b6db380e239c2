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
from collections import deque

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

PROGRESS_SCHEMA = (
    "query_name string, batch_id long, timestamp string, "
    "num_input_rows long, input_rows_per_second double, "
    "processed_rows_per_second double, batch_duration_ms long, "
    "state_rows long, watermark string"
)


class ProgressCapture(StreamingQueryListener):
    """Collects micro-batch progress events into a bounded buffer."""

    def __init__(self, max_batches: int = 1000):
        self._buf: deque = deque(maxlen=max_batches)

    # -- StreamingQueryListener interface --------------------------------
    def onQueryStarted(self, event) -> None:  # pragma: no cover - trivial
        pass

    def onQueryProgress(self, event) -> None:
        p = json.loads(event.progress.json)
        durations = p.get("durationMs") or {}
        state = (p.get("stateOperators") or [{}])[0]
        self._buf.append(
            {
                "query_name": p.get("name"),
                "batch_id": p.get("batchId"),
                "timestamp": p.get("timestamp"),
                "num_input_rows": p.get("numInputRows", 0),
                "input_rows_per_second": float(p.get("inputRowsPerSecond") or 0.0),
                "processed_rows_per_second": float(
                    p.get("processedRowsPerSecond") or 0.0
                ),
                "batch_duration_ms": durations.get("triggerExecution", 0),
                "state_rows": state.get("numRowsTotal", 0),
                "watermark": (p.get("eventTime") or {}).get("watermark"),
            }
        )

    def onQueryTerminated(self, event) -> None:  # pragma: no cover - trivial
        pass

    def onQueryIdle(self, event) -> None:  # pragma: no cover - trivial
        pass

    # -- query surface ---------------------------------------------------
    def rows(self) -> list[dict]:
        return list(self._buf)

    def progress_frame(self, spark: SparkSession) -> DataFrame:
        """The captured progress as a DataFrame (PROGRESS_SCHEMA) —
        empty-safe, so monitoring queries run before the first batch."""
        rows = self.rows()
        if not rows:
            return spark.createDataFrame([], PROGRESS_SCHEMA)
        return spark.createDataFrame(
            [tuple(r[f.split(" ")[0]] for f in PROGRESS_SCHEMA.split(", "))
             for r in rows],
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
