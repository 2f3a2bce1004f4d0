"""Custom stateful streaming operator: gap-based sessionization.

`applyInPandasWithState` keeps one open session per user across
micro-batches; a session closes when a later event arrives more than
GAP seconds after the last one (emitting the closed session), or when
event-time timeout fires past the watermark. This is the engine's
demonstration of arbitrary stateful streaming — the batch equivalent
(lag + cumsum window) is the `sessionize` gate query, which doubles
as its oracle in tests/test_streaming.py.

State is a single (start, last, n) tuple per user — O(users) not
O(events) — so the operator survives 10^12-event streams; the shuffle
key is user_id (the same partitioning the batch window uses).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_S = 1800

OUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, n_events int"
)
STATE_SCHEMA = "start_us bigint, last_us bigint, n int"

_US = 1_000_000


def _session_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    closed: list[tuple] = []

    if state.hasTimedOut:
        if state.exists:
            start_us, last_us, n = state.get
            closed.append((user_id, start_us, last_us, n))
        state.remove()
    else:
        ts_us: list[int] = []
        for pdf in pdfs:
            ts_us.extend(
                int(v.value // 1000) for v in pd.to_datetime(pdf["ts"])
            )
        ts_us.sort()
        if state.exists:
            cur = list(state.get)
        else:
            cur = None
        for t in ts_us:
            if cur is None:
                cur = [t, t, 0]
            elif t - cur[1] > SESSION_GAP_S * _US:
                closed.append((user_id, cur[0], cur[1], cur[2]))
                cur = [t, t, 0]
            cur[1] = max(cur[1], t)
            cur[2] += 1
        if cur is not None:
            state.update(tuple(cur))
            # close the trailing session when the watermark passes its gap
            state.setTimeoutTimestamp(cur[1] // 1000 + SESSION_GAP_S * 1000)

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [c[0] for c in closed],
                "session_start": [pd.Timestamp(c[1], unit="us") for c in closed],
                "session_end": [pd.Timestamp(c[2], unit="us") for c in closed],
                "n_events": [c[3] for c in closed],
            }
        )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events(ts timestamp, user_id, ...) stream → closed sessions."""
    return (
        events.withWatermark("ts", "30 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            OUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def _closed_frame(rows: list[tuple]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [c[0] for c in rows],
            "session_start": [pd.Timestamp(c[1], unit="us") for c in rows],
            "session_end": [pd.Timestamp(c[2], unit="us") for c in rows],
            "n_events": [c[3] for c in rows],
        }
    )


def make_session_processor():
    """Same gap-sessionization on the NEW arbitrary-stateful API
    (`transformWithStateInPandas`, Spark 4): typed ValueState instead
    of a bare tuple, explicit event-time timers instead of
    setTimeoutTimestamp. One timer per key (re-registered on every
    input batch at last_event + GAP), so an expired timer always refers
    to the live trailing session. Semantics — including the trailing-
    session emission rule — match `sessionize_stream`, and the gate
    checks both against the SAME oracle."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class SessionProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._handle = handle
            self._state = handle.getValueState("session", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            ts_us: list[int] = []
            for pdf in rows:
                ts_us.extend(
                    int(v.value // 1000) for v in pd.to_datetime(pdf["ts"])
                )
            ts_us.sort()
            closed: list[tuple] = []
            cur = list(self._state.get()) if self._state.exists() else None
            for t in list(self._handle.listTimers()):
                self._handle.deleteTimer(t)
            for t in ts_us:
                if cur is None:
                    cur = [t, t, 0]
                elif t - cur[1] > SESSION_GAP_S * _US:
                    closed.append((user_id, cur[0], cur[1], cur[2]))
                    cur = [t, t, 0]
                cur[1] = max(cur[1], t)
                cur[2] += 1
            if cur is not None:
                self._state.update(tuple(cur))
                self._handle.registerTimer(
                    cur[1] // 1000 + SESSION_GAP_S * 1000
                )
            if closed:
                yield _closed_frame(closed)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            (user_id,) = key
            if self._state.exists():
                start_us, last_us, n = self._state.get()
                if (
                    expiredTimerInfo.getExpiryTimeInMs()
                    >= last_us // 1000 + SESSION_GAP_S * 1000
                ):
                    self._state.clear()
                    yield _closed_frame([(user_id, start_us, last_us, n)])

        def close(self) -> None:
            pass

    return SessionProcessor()


def sessionize_stream_tws(events: DataFrame) -> DataFrame:
    """`sessionize_stream` on transformWithStateInPandas. Requires the
    RocksDB state store provider (the API's backing store)."""
    return (
        events.withWatermark("ts", "30 minutes")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=make_session_processor(),
            outputStructType=OUT_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )


def read_session_state(spark, checkpoint: str) -> DataFrame:
    """Inspect the LIVE sessionize state through Spark 4's state-store
    data source (`spark.read.format("statestore")`): one row per open
    (not-yet-emitted) session the stream is holding — the operational
    view an on-call engineer reads to answer "what is this stateful
    query buffering right now" without touching the job. The layout is
    the applyInPandasWithState STATE_SCHEMA (start_us, last_us, n)
    keyed by user_id; timestamps come back as real timestamps. By the
    sessionize emission rule, after an availableNow run this relation
    is exactly each user's trailing session whose close timer
    (last + GAP) has not passed the final watermark (max ts - GAP)."""
    from pyspark.sql import functions as F

    st = spark.read.format("statestore").load(checkpoint)
    g = "value.groupState"
    return st.select(
        F.col("key.user_id").alias("user_id"),
        F.timestamp_micros(F.col(f"{g}.start_us")).alias("session_start"),
        F.timestamp_micros(F.col(f"{g}.last_us")).alias("session_end"),
        F.col(f"{g}.n").alias("n_events"),
    )
