"""Stream-static enrichment joins.

The canonical streaming pattern the batch operators compose into: a stream of
facts joined per-micro-batch against a *static* (or slowly refreshed)
dimension. Spark re-plans the static side each micro-batch, so a broadcast
dimension costs one broadcast per batch and the stream side never shuffles for
the join.

Two flavors:

* :func:`enrich_stream` — current-state lookup (plain key equi-join).
* :func:`enrich_stream_point_in_time` — SCD2-aware lookup: each event gets the
  dimension row valid AT THE EVENT'S OWN TIMESTAMP, not the latest one. This
  is the streaming half of the training-serving-skew defense built in
  ``operators/scd.py`` (the batch half is ``as_of_lookup``). Stream-static
  joins permit the extra range predicates because the static side is fully
  known per batch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream_df: DataFrame, dim_df: DataFrame, key: str, how: str = "left"
) -> DataFrame:
    """Per-micro-batch key lookup against a broadcast static dimension."""
    return stream_df.join(F.broadcast(dim_df), key, how)


def enrich_stream_point_in_time(
    stream_df: DataFrame,
    scd2_dim: DataFrame,
    key: str,
    event_ts: Column | str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Join each event to the SCD2 dimension interval containing its event
    time (``valid_from <= ts < valid_to``, NULL valid_to = open/current)."""
    t = F.col(event_ts) if isinstance(event_ts, str) else event_ts
    d = scd2_dim.withColumnRenamed(key, "_dim_key")
    cond = (
        (stream_df[key] == d["_dim_key"])
        & (t >= d[valid_from])
        & (t < F.coalesce(d[valid_to], F.lit("9999-12-31").cast("timestamp")))
    )
    return stream_df.join(F.broadcast(d), cond, "left").drop("_dim_key")
