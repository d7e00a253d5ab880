"""Event-stream operators: sessionization + windowed aggregation, usable in both
batch and Structured Streaming."""

from iceberg_evolve_spark.streaming.sessionize import (
    sessionize,
    session_stats,
    session_window_stats,
    windowed_event_counts,
)

__all__ = [
    "sessionize",
    "session_stats",
    "session_window_stats",
    "windowed_event_counts",
]
