"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no custom state (SURVEY §2.6: only built-in window
agg + dedup state). This module adds the extension point a real
engine needs: arbitrary per-key state with timeouts, Arrow-batched.

`running_totals` is the canonical example — per-key cumulative
count/sum emitted every micro-batch (the streaming twin of a grouped
aggregate, but with state the caller controls: custom eviction,
custom emission cadence, non-algebraic updates).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_SCHEMA = StructType(
    [
        StructField("key", LongType(), False),
        StructField("n_events", LongType(), True),
        StructField("total_value", DoubleType(), True),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType(), True),
        StructField("total", DoubleType(), True),
    ]
)


def running_totals(
    df: DataFrame, key_col: str, value_col: str, timeout: str = "NoTimeout"
) -> DataFrame:
    """Per-key running count/sum with explicit state.

    Batches for one key arrive as pandas DataFrames; state is a
    (n, total) tuple carried across micro-batches. Emits the updated
    running totals for every key seen in the current batch.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({"key": [key[0]], "n_events": [n], "total_value": [total]})

    grouped = df.groupBy(df[key_col])
    return grouped.applyInPandasWithState(
        update,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )


FUNNEL_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("stage", LongType(), True),  # 0=none .. 3=purchased
    ]
)

# (stage, stage_ts_us): furthest ORDERED stage reached and the event
# time (epoch micros) of the event that reached it — needed so a later
# micro-batch can only advance on events strictly after it.
FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("stage", LongType(), True),
        StructField("stage_ts", LongType(), True),
    ]
)

FUNNEL_STAGES = ("view", "click", "purchase")


def funnel_stages(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Streaming ordered-funnel progression: per-user furthest stage.

    The streaming twin of the batch `funnel_conversion` query
    (queries/events_analytics.py): a user advances to stage k+1 only
    on a stage-(k+1) event with a STRICTLY LATER event time than the
    event that reached stage k. State per user is just (stage,
    stage_ts) — two longs, bounded regardless of event volume, the
    shape that survives 100 TB/day streams. Events inside one batch
    are replayed in event-time order, so for IN-ORDER feeds batch
    boundaries don't change the result (verified against the batch
    query in tests/test_streaming.py). A late event arriving in a
    LATER micro-batch than a higher-stage event it precedes in event
    time can still change which event qualifies vs the batch query —
    inherent to single-pass streaming state, not a batching artifact.

    Emits the user's current stage each micro-batch that touches the
    user (update mode); the gold snapshot is a foreachBatch upsert
    keyed on user_id.
    """
    stage_of = {s: i + 1 for i, s in enumerate(FUNNEL_STAGES)}

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        stage, stage_ts = state.get if state.exists else (0, -1)
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows[rows[type_col].isin(FUNNEL_STAGES)]
        if len(rows):
            # Arrow hands timestamps as datetime64[ns] (sometimes [us]
            # depending on version): normalize to MICROS explicitly so
            # stage_ts has one unit across batches and restarts.
            ts_us = rows[ts_col].astype("datetime64[us]").astype("int64")
            order = ts_us.sort_values(kind="mergesort").index
            for i in order:
                ev_stage = stage_of[rows[type_col][i]]
                ev_ts = int(ts_us[i])
                if ev_stage == stage + 1 and ev_ts > stage_ts:
                    stage, stage_ts = ev_stage, ev_ts
            state.update((int(stage), int(stage_ts)))
        yield pd.DataFrame({"user_id": [key[0]], "stage": [stage]})

    grouped = df.groupBy(df[user_col])
    return grouped.applyInPandasWithState(
        update,
        outputStructType=FUNNEL_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )
