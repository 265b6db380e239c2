"""Streaming joins: stream-static enrichment and stream-stream
interval joins (absent from the reference — SURVEY §2.6 end note).

- Stream-static: each micro-batch hash-joins against a (small) batch
  dimension; broadcast it so the stream never shuffles. The dimension
  is re-resolved per batch, so slowly-changing dims pick up updates.
- Stream-stream: both sides are watermarked and the join condition
  carries an event-time interval bound — Spark buffers only rows
  inside the watermark+interval horizon, keeping state finite. An
  unbounded-condition stream-stream join would grow state forever;
  this operator refuses to build one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stream_static_join(
    stream: DataFrame,
    dim: DataFrame,
    on: Column,
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Enrich a stream with a batch dimension (per-micro-batch join)."""
    if dim.isStreaming:
        raise ValueError("dim must be a batch DataFrame (use stream_stream_interval_join)")
    right = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(right, on, how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    keys: Column,
    interval: str,
    left_watermark: str,
    right_watermark: str,
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join bounded to
    ``right_time ∈ [left_time − interval, left_time]``.

    Both watermarks + the interval bound are what let Spark evict join
    state; all three are therefore required arguments.
    """
    l = left.withWatermark(left_time, left_watermark)
    r = right.withWatermark(right_time, right_watermark)
    bound = (
        (F.col(right_time) >= F.col(left_time) - F.expr(f"INTERVAL {interval}"))
        & (F.col(right_time) <= F.col(left_time))
    )
    return l.join(r, keys & bound, how)
