"""Custom stateful streaming operator: gap-based sessionization with explicit
per-key state (``applyInPandasWithState``).

``F.session_window`` (streaming/sessionize.py) covers plain windowed
aggregation; this operator exists for the semantics the built-in can't
express — carrying arbitrary per-session state (first/last event type, a
running value total, an event-count cap) and emitting a *custom-shaped* record
exactly once per closed session.

Design for scale:

* state is keyed by ``user_id`` → distributed across executors by the state
  store; no driver involvement;
* per batch, each key's new events arrive as ONE Arrow batch (pandas DataFrame)
  — the sort + fold below is C-speed pandas, not per-row Python;
* event-time timeout (``GroupStateTimeout.EventTimeTimeout``) closes idle
  sessions when the watermark passes, which also bounds state size: an
  abandoned key is evicted instead of accumulating forever.

Parity note: the reference system (anatol-ju/iceberg-evolve) has no streaming
surface at all (SURVEY.md §2.2); this is north-star extension work.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double, first_type string, last_type string"
)

STATE_SCHEMA = (
    "start long, last long, n long, total double, first_type string, last_type string"
)


def _close(user_id: int, st: tuple) -> pd.DataFrame:
    start, last, n, total, first_type, last_type = st
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start, unit="us")],
            "session_end": [pd.Timestamp(last, unit="us")],
            "n_events": [n],
            "total_value": [round(total, 6)],
            "first_type": [first_type],
            "last_type": [last_type],
        }
    )


def make_session_fn(gap_minutes: int):
    """Build the per-group update function. Separate factory so the gap is
    captured in the closure (the UDF signature is fixed by Spark)."""
    gap_us = gap_minutes * 60 * 1_000_000

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                st = state.get
                state.remove()
                yield _close(user_id, st)
            return

        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        ts_us = rows["ts"].astype("int64") // 1000  # ns → µs
        out: list[pd.DataFrame] = []

        if state.exists:
            start, last, n, total, first_type, last_type = state.get
        else:
            start = last = n = 0
            total = 0.0
            first_type = last_type = None

        for t, etype, value in zip(ts_us, rows["event_type"], rows["value"]):
            if n == 0:
                start, last, n = t, t, 1
                total = float(value)
                first_type = last_type = etype
            elif t - last > gap_us:
                out.append(_close(user_id, (start, last, n, total, first_type, last_type)))
                start, last, n = t, t, 1
                total = float(value)
                first_type = last_type = etype
            else:
                last = max(last, t)
                n += 1
                total += float(value)
                last_type = etype

        state.update((start, last, n, total, first_type, last_type))
        # wake this key once the watermark passes (last event + gap) to close
        # the open session and evict its state
        state.setTimeoutTimestamp(last // 1000 + gap_minutes * 60 * 1000)
        yield from out

    return update


def stateful_sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark_minutes: int = 60,
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming gap-sessionization with custom per-session state.

    Emits one row per CLOSED session — closed either by a later event past the
    gap, or by the event-time timeout when the watermark overtakes
    ``last_event + gap``. Works on a streaming DataFrame with columns
    (user_id, ts, event_type, value).
    """
    src = events.withWatermark(ts_col, f"{watermark_minutes} minutes")
    return src.groupBy("user_id").applyInPandasWithState(
        make_session_fn(gap_minutes),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Spark 4 successor API: transformWithStateInPandas (StatefulProcessor)
# ---------------------------------------------------------------------------


# Spark 4-only API: import-guarded so the Spark 3 applyInPandasWithState
# path above keeps importing (and working) on older PySpark.
try:
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor
except ImportError:  # pragma: no cover - PySpark < 4.0
    StatefulProcessor = object


class SessionProcessor(StatefulProcessor):
    """Gap-sessionization as a Spark 4 ``StatefulProcessor`` — the successor
    of ``applyInPandasWithState`` with composable typed state (ValueState /
    ListState / MapState) and EXPLICIT per-key timers instead of a single
    timeout configuration.

    Semantics match :func:`stateful_sessionize` exactly (same fold, same
    closed-session record); the state-store layout differs: session state
    lives in a named ``ValueState`` and eviction is a registered event-time
    timer at ``last_event + gap``, re-registered as the session extends.
    At scale the state is partitioned by key across executors and timer
    firing is driven by the watermark — no full-state scans per batch.
    """

    def __init__(self, gap_minutes: int) -> None:
        self.gap_minutes = gap_minutes
        self.gap_us = gap_minutes * 60 * 1_000_000

    def init(self, handle) -> None:
        self.handle = handle
        self.session = handle.getValueState("session", STATE_SCHEMA)

    def _register_timer(self, last_us: int) -> None:
        # clear any previous eviction timer; timers are per (key, timestamp).
        # Materialize before mutating: the real handle's iterator is
        # state-server-backed and deletion during iteration is undefined.
        for t in list(self.handle.listTimers()):
            self.handle.deleteTimer(t)
        self.handle.registerTimer(last_us // 1000 + self.gap_minutes * 60 * 1000)

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        pdfs = list(rows)
        if not pdfs:
            return
        batch = pd.concat(pdfs, ignore_index=True).sort_values("ts")
        ts_us = batch["ts"].astype("int64") // 1000  # ns → µs

        st = self.session.get() if self.session.exists() else None
        if st is not None:
            start, last, n, total, first_type, last_type = st
        else:
            start = last = n = 0
            total = 0.0
            first_type = last_type = None

        out: list[pd.DataFrame] = []
        for t, etype, value in zip(ts_us, batch["event_type"], batch["value"]):
            t = int(t)
            if n == 0:
                start, last, n = t, t, 1
                total = float(value)
                first_type = last_type = etype
            elif t - last > self.gap_us:
                out.append(
                    _close(user_id, (start, last, n, total, first_type, last_type))
                )
                start, last, n = t, t, 1
                total = float(value)
                first_type = last_type = etype
            else:
                last = max(last, t)
                n += 1
                total += float(value)
                last_type = etype

        self.session.update((start, last, n, total, first_type, last_type))
        self._register_timer(last)
        yield from out

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        if self.session.exists():
            st = self.session.get()
            self.session.clear()
            yield _close(key[0], st)

    def handleInitialState(self, key, initialState, timerValues) -> None:
        pass  # no warm-start state in this pipeline

    def close(self) -> None:
        pass


def stateful_sessionize_tws(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark_minutes: int = 60,
    ts_col: str = "ts",
) -> DataFrame:
    """:func:`stateful_sessionize` on the Spark 4 ``transformWithStateInPandas``
    API — one closed-session row per session, eviction via event-time timers."""
    src = events.withWatermark(ts_col, f"{watermark_minutes} minutes")
    return src.groupBy("user_id").transformWithStateInPandas(
        SessionProcessor(gap_minutes),
        outputStructType=OUT_SCHEMA,
        outputMode="append",
        timeMode="eventTime",
        eventTimeColumnName="",
    )
