"""Stream-stream joins with watermark-bounded state.

Unlike stream-static enrichment (``enrich.py``), BOTH sides here are unbounded,
so Spark must buffer rows until the other side can no longer produce a match.
The interval condition + watermarks are what make state bounded: a click older
than (watermark − interval) can never match a future view, so its state is
evicted. Without the time bound the state store grows forever — this module
makes the bound part of the operator's signature rather than a caller
afterthought.

Canonical use: attribution — join each view/conversion to the preceding click
by the same user within an attribution window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_within_window(
    left: DataFrame,
    right: DataFrame,
    key: str,
    window_minutes: int = 30,
    watermark_minutes: int = 60,
    left_ts: str = "ts",
    right_ts: str = "ts",
    how: str = "inner",
) -> DataFrame:
    """Join ``right`` events to ``left`` events with the same ``key`` where
    ``left.ts <= right.ts <= left.ts + window``.

    State bound: each side buffers at most ``watermark + window`` minutes of
    rows per key. ``how='leftOuter'`` additionally emits unmatched left rows
    once their window expires (Spark requires the time bound for outer
    stream-stream joins — enforced here by construction).

    Output columns are prefixed ``l_`` / ``r_`` to keep both timestamps.
    """
    l = left.withWatermark(left_ts, f"{watermark_minutes} minutes")
    r = right.withWatermark(right_ts, f"{watermark_minutes} minutes")
    l = l.select([F.col(c).alias(f"l_{c}") for c in l.columns])
    r = r.select([F.col(c).alias(f"r_{c}") for c in r.columns])
    cond = (
        (F.col(f"l_{key}") == F.col(f"r_{key}"))
        & (F.col(f"r_{right_ts}") >= F.col(f"l_{left_ts}"))
        & (
            F.col(f"r_{right_ts}")
            <= F.col(f"l_{left_ts}") + F.expr(f"INTERVAL {window_minutes} MINUTES")
        )
    )
    return l.join(r, cond, how)
