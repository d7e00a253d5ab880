"""Sessionization and windowed aggregation over the ``events`` table/stream.

Two formulations, deliberately:

* :func:`sessionize` — the classic gap-based lag/cumsum window formulation.
  Batch-only (window functions over unbounded history), but exactly expressible
  in ANSI SQL → this is the DuckDB-oracle-checked path. One shuffle
  (partition by user), then two window passes over the same partitioning —
  Spark reuses the exchange.
* :func:`session_window_stats` — ``F.session_window`` grouping, the idiomatic
  Spark construct that ALSO works under Structured Streaming with watermarks
  (state store merges sessions incrementally; late events beyond the watermark
  drop). Same results as the batch formulation for on-time data.

At 100 TB: both shuffle on ``user_id`` — a skewed power user inflates one
partition; AQE skew-join/agg splitting handles it, or pre-salt extreme keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def epoch_seconds(df: DataFrame, ts_col: str) -> Column:
    """Seconds-since-epoch for a timestamp column, independent of the session
    timezone for BOTH timestamp flavors:

    * TIMESTAMP (LTZ) already stores an instant — ``CAST(... AS BIGINT)`` is
      exact and TZ-free.
    * TIMESTAMP_NTZ (what naive parquet timestamps read as) has no long cast,
      and hopping through TIMESTAMP would interpret the wall clock in the
      *session* timezone — silently wrong gaps across DST jumps under a
      non-UTC session. Instead the wall-clock fields are combined directly
      (``unix_date`` + hour/minute/second), which treats the naive value
      as-if-UTC — exactly what DuckDB's ``epoch()`` does on naive timestamps,
      and DST-proof because no timezone is ever consulted.
    """
    dt = dict(df.dtypes).get(ts_col, "")
    col = df[ts_col]
    if dt == "timestamp_ntz":
        return (
            F.unix_date(F.to_date(col)).cast("long") * 86400
            + F.hour(col) * 3600
            + F.minute(col) * 60
            + F.second(col)
        )
    return col.cast("long")  # LTZ instant or already-numeric: exact, TZ-free


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign a session index per user: a new session starts when the gap since
    the previous event exceeds ``gap_minutes``. Adds ``session_id`` (1-based,
    per user)."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col("event_id").asc())
    epoch = epoch_seconds(df, ts_col)
    gap = epoch - F.lag(epoch).over(w)
    new_session = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn("_new", new_session).withColumn(
        "session_id", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).drop("_new")


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session aggregates: event count, span seconds, total value.
    Output: (user_id, session_id, n_events, span_sec, total_value)."""
    s = sessionize(df, user_col, ts_col, gap_minutes)
    epoch = epoch_seconds(s, ts_col)
    return s.groupBy(user_col, "session_id").agg(
        F.count("*").alias("n_events"),
        (F.max(epoch) - F.min(epoch)).alias("span_sec"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


def session_window_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    watermark_minutes: int | None = None,
) -> DataFrame:
    """Same aggregation via ``F.session_window`` — valid on a streaming
    DataFrame: pass ``watermark_minutes`` to bound state and drop late events.
    """
    src = df
    if watermark_minutes is not None and df.isStreaming:
        src = df.withWatermark(ts_col, f"{watermark_minutes} minutes")
    return src.groupBy(
        F.col(user_col), F.session_window(F.col(ts_col), f"{gap_minutes} minutes")
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


def windowed_event_counts(
    df: DataFrame,
    ts_col: str = "ts",
    window_minutes: int = 60,
    watermark_minutes: int | None = None,
) -> DataFrame:
    """Tumbling-window event counts per type — the canonical streaming agg;
    works identically in batch. Output: (window_start, event_type, n)."""
    src = df
    if watermark_minutes is not None and df.isStreaming:
        src = df.withWatermark(ts_col, f"{watermark_minutes} minutes")
    return (
        src.groupBy(
            F.window(F.col(ts_col), f"{window_minutes} minutes").alias("w"),
            F.col("event_type"),
        )
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
