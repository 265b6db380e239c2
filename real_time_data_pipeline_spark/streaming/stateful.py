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
