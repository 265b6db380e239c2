"""Custom stateful operators on Spark 4's transformWithState engine.

`applyInPandasWithState` (streaming/stateful.py) is the Spark 3.x
extension point; Spark 4 ships its successor —
``transformWithStateInPandas`` with a ``StatefulProcessor`` contract —
adding the pieces production state ops actually need:

- **typed, named state variables** (value/list/map) instead of one
  opaque tuple;
- **real timers**: event-time timers fire when the WATERMARK passes
  the registered expiry, so "emit the session when the user goes
  quiet" is first-class instead of being emulated with per-batch
  timeout polling;
- **state TTL** for bounded retention without hand-rolled eviction.

`timer_sessionizer` is the canonical demonstration: gap-based session
summaries emitted ON TIMER EXPIRY (append semantics — a session row is
final when it leaves the operator), the shape every "abandoned cart" /
"session ended" trigger takes at scale. The batch twin is
`operators/windows.session_windowed_agg`; the e2e test checks
stream/batch parity on closed sessions.

Requires the RocksDB state store provider (`session.use_rocksdb_state`)
— transformWithState is implemented only on RocksDB, which is also the
provider the 100 TB state story needs anyway.

ENVIRONMENT GATE: the transformWithState state-server protocol speaks
protobuf (`google.protobuf`), which is not installed in this sandbox
and cannot be (package installation is disallowed) — probe with
`transform_with_state_available()` before starting a query, exactly
like the Delta MERGE gate. The operator's plan construction (schemas,
API wiring, watermark placement) is analysis-checked in tests either
way; the executed stateful-op surface in this environment is
`streaming/stateful.py` (applyInPandasWithState), which covers the
same semantics minus first-class timers.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

def transform_with_state_available() -> bool:
    """True when the protobuf runtime the transformWithState state
    protocol needs is importable. False in this sandbox (see module
    doc); on a standard deployment `pip install pyspark[connect]` or
    plain `protobuf` provides it."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)
_STATE_SCHEMA = "start_us long, last_us long, n long, total double"
_US = 1_000_000


class _TimerSessionizer(StatefulProcessor):
    """Per-key gap sessionizer: state = the OPEN session; an
    event-time timer at (last event + gap) closes and emits it when
    the watermark passes — no rows are emitted from input handling,
    so the output is append-clean (each session exactly once).
    """

    def __init__(self, gap_seconds: int, ts_col: str, value_col: str) -> None:
        self._gap_us = gap_seconds * _US
        self._ts_col = ts_col
        self._value_col = value_col

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._sess = handle.getValueState("open_session", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows, timer_values: TimerValues
    ) -> Iterator[pd.DataFrame]:
        start_us = last_us = None
        n, total = 0, 0.0
        if self._sess.exists():
            start_us, last_us, n, total = self._sess.get()
        for pdf in rows:
            if not len(pdf):
                continue
            # normalize whatever datetime64 unit pandas hands us to µs
            ts_us = (
                pdf[self._ts_col].to_numpy().astype("datetime64[us]").astype("int64")
            )
            n += len(pdf)
            total += float(pdf[self._value_col].sum())
            lo, hi = int(ts_us.min()), int(ts_us.max())
            start_us = lo if start_us is None else min(start_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
        if last_us is None:
            # a key can arrive with only EMPTY pandas batches and no
            # prior state (ADVICE r8): nothing to record, and touching
            # state/timers here would register a timer off None
            return iter(())
        self._sess.update((start_us, last_us, n, total))
        # one live timer per key: the session closes gap after the
        # LATEST event, so earlier registrations are superseded.
        # Materialize the listing BEFORE deleting — deleteTimer inside
        # the streaming iteration corrupts the state-server protocol.
        for t in list(self._handle.listTimers()):
            self._handle.deleteTimer(t)
        self._handle.registerTimer((last_us + self._gap_us) // 1000)
        return iter(())

    def handleExpiredTimer(
        self, key, timer_values: TimerValues, expired_timer_info: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        if not self._sess.exists():
            return
        start_us, last_us, n, total = self._sess.get()
        self._sess.clear()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(last_us, unit="us")],
                "n_events": [n],
                "total_value": [total],
            }
        )

    def close(self) -> None:  # pragma: no cover — nothing to release
        pass


def timer_sessionizer(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_seconds: int = 30 * 60,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Gap-based session summaries emitted on event-time TIMER expiry.

    ``df`` is a streaming frame with ``ts_col`` event time and a
    ``value`` column; output is one append-mode row per CLOSED session
    (user, start, end=last event, count, value sum). A session closes
    when the watermark passes last event + gap — late events inside
    the lateness horizon reopen nothing (they extend the still-open
    session, because its timer has not fired yet).

    Scale shape: state is one row per OPEN session key (RocksDB,
    disk-backed), timers are the engine's own timer store — no
    per-batch scan of all keys, unlike timeout emulation on
    applyInPandasWithState.
    """
    return (
        df.withWatermark(ts_col, watermark_delay)
        .groupBy(key_col)
        .transformWithStateInPandas(
            statefulProcessor=_TimerSessionizer(gap_seconds, ts_col, value_col),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )
