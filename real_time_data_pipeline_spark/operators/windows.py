"""Event-time window aggregation operators (reference A1/A2/W1/W2).

The reference's Gold computation is a 15-minute tumbling-window grouped
average (`src/jobs/spark_streaming_job.py:105-117`, batch twin
`src/jobs/spark_batch_backfill.py:56-67`) whose ``window`` struct is
flattened to ``window_start``/``window_end`` (P7, `:122-126`). Here the
same shape is one reusable operator covering tumbling, sliding and
session windows, batch or streaming.

Scale: ``groupBy(window(...), keys)`` plans a two-phase HashAggregate —
partial map-side combine, one shuffle on (window, keys), final
aggregate. That is the minimal-shuffle plan for this computation; the
only tuning that matters at 100 TB is the shuffle partition count
(AQE coalesces) and skewed keys (AQE skew-join/salting).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_agg(
    df: DataFrame,
    event_time: str,
    window_duration: str,
    keys: Sequence[str],
    aggs: Mapping[str, Column],
    slide: str | None = None,
    watermark_delay: str | None = None,
) -> DataFrame:
    """Tumbling (or sliding) event-time window aggregation, flattened.

    ``aggs`` maps output column name → aggregate Column. Output columns:
    ``window_start``, ``window_end``, ``*keys``, ``*aggs``.
    """
    if watermark_delay is not None:
        df = df.withWatermark(event_time, watermark_delay)
    win = (
        F.window(F.col(event_time), window_duration, slide)
        if slide
        else F.window(F.col(event_time), window_duration)
    )
    grouped = df.groupBy(win.alias("window"), *[F.col(k) for k in keys])
    out = grouped.agg(*[expr.alias(name) for name, expr in aggs.items()])
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *keys,
        *aggs.keys(),
    )


def session_windowed_agg(
    df: DataFrame,
    event_time: str,
    gap: str,
    keys: Sequence[str],
    aggs: Mapping[str, Column],
    watermark_delay: str | None = None,
) -> DataFrame:
    """Session-window aggregation (gap-based), flattened like above."""
    if watermark_delay is not None:
        df = df.withWatermark(event_time, watermark_delay)
    grouped = df.groupBy(
        F.session_window(F.col(event_time), gap).alias("window"),
        *[F.col(k) for k in keys],
    )
    out = grouped.agg(*[expr.alias(name) for name, expr in aggs.items()])
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *keys,
        *aggs.keys(),
    )


def windowed_distinct_count(
    df: DataFrame,
    event_time: str,
    window_duration: str,
    key_cols: Sequence[str],
    out_col: str = "n_distinct",
    watermark_delay: str | None = None,
) -> DataFrame:
    """Distinct-key count per tumbling event-time window (windowed
    DAU), batch or streaming, with identical results.

    Streaming aggregations cannot express ``count_distinct``
    (distinct aggregates need the whole group in one place — exactly
    what an incremental state update can't have), so the streaming
    plan uses the canonical two-stage decomposition instead:
    watermark-first ``dropDuplicatesWithinWatermark`` on
    (window, *keys) — state is one row per distinct key per window,
    evicted once the watermark passes — then a plain windowed COUNT
    of the survivors, which IS incrementally computable. The batch
    twin collapses to ``count_distinct`` directly; both reduce to the
    same set cardinality, so parity is exact whenever re-deliveries
    of a (window, key) arrive within the watermark (later ones would
    double-count — size the delay to the source's re-delivery bound,
    the same contract as every watermarked dedup here).

    NULL keys follow SQL ``COUNT(DISTINCT ...)`` semantics on BOTH
    paths: rows where any key column is NULL are not counted (the
    streaming branch filters them explicitly — ``dropDuplicates``
    would otherwise keep one (window, NULL) row and the plain count
    would include it, silently breaking parity). Rows with a NULL
    ``event_time`` are likewise excluded on BOTH paths: they have no
    window, the streaming watermark would never close their (NULL)
    state, and the batch path would otherwise emit a
    (null, null, n) row the streaming path can never produce.

    Scale: dedup state is distinct-keys-per-live-window sized (never
    event-sized); the count is a two-phase aggregate on window keys.
    """
    win = F.window(F.col(event_time), window_duration)
    no_nulls = F.col(event_time).isNotNull()
    for k in key_cols:
        no_nulls = no_nulls & F.col(k).isNotNull()
    if df.isStreaming:
        if watermark_delay is None:
            raise ValueError(
                "streaming windowed_distinct_count requires watermark_delay"
            )
        deduped = (
            df.withWatermark(event_time, watermark_delay)
            .where(no_nulls)
            .select(win.alias("window"), *[F.col(k) for k in key_cols])
            .dropDuplicatesWithinWatermark(["window", *key_cols])
        )
        out = deduped.groupBy("window").agg(F.count(F.lit(1)).alias(out_col))
    else:
        out = (
            df.where(no_nulls)
            .select(win.alias("window"), *[F.col(k) for k in key_cols])
            .groupBy("window")
            .agg(F.count_distinct(*[F.col(k) for k in key_cols]).alias(out_col))
        )
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        out_col,
    )
