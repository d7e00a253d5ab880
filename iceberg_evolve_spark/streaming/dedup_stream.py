"""Streaming deduplication — exactly-once semantics over at-least-once sources.

Two built-in-backed strategies:

* :func:`dedup_stream_exact` — ``dropDuplicatesWithinWatermark``: state holds
  each key only until the watermark passes it, so state is bounded by the
  late-data window instead of growing forever (``dropDuplicates`` on a stream
  without watermark = unbounded state = eventual OOM at 100 TB/day rates).
* :func:`dedup_stream_by_content` — same, keyed on a content fingerprint
  (normalized-text hash) instead of the event id: catches *replayed* payloads
  that arrive under fresh ids.

The reference system has no streaming surface (SURVEY.md §2.2); extension work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream_exact(
    events: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate events (same key) within the watermark window.

    State per key is evicted once the watermark passes — bounded memory. An
    event arriving later than ``watermark`` after its duplicate is NOT caught
    (that's the documented trade-off of watermarked dedup).
    """
    key_cols = key_cols or ["event_id"]
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def dedup_stream_by_content(
    events: DataFrame,
    content_col: str = "props",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Dedup on a whitespace-normalized content hash — catches replays that
    carry new surrogate ids. The fingerprint column is dropped on output."""
    fp = F.xxhash64(F.regexp_replace(F.lower(F.trim(F.col(content_col))), r"\s+", " "))
    return (
        events.withColumn("_fp", fp)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_fp"])
        .drop("_fp")
    )
