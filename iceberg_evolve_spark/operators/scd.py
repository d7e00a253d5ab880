"""Slowly-Changing-Dimension type 2: collapse a change-event stream into
validity intervals, and look dimension state up as-of a point in time.

This is the warehouse counterpart of the schema-evolution core: where
`Schema.evolve` versions *metadata*, SCD2 versions *rows*. A dimension built
here composes with the as-of join (`functions/asof.py`) for point-in-time
enrichment — the standard way to avoid training-serving skew in a feature
pipeline (features must reflect the dimension as it was when the fact
happened, not as it is now).

Scale shape: one shuffle on the entity key; everything else is window
functions over that single clustering (run detection via lag, run ids via a
running sum, interval close via lead). No self-joins, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    df: DataFrame,
    key: str,
    attrs: list[str],
    ts: str,
    tiebreak: str | None = None,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    version: str = "version",
) -> DataFrame:
    """Build SCD2 validity intervals from per-event attribute observations.

    Consecutive events (ordered by ``ts``, then ``tiebreak``) with identical
    ``attrs`` merge into one interval. ``valid_from`` is the run's first
    timestamp, ``valid_to`` the next run's start (NULL = current), ``version``
    the 1-based run index per key.
    """
    order = [F.col(ts).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    changed = F.lit(False)
    for a in attrs:
        changed = changed | ~F.lag(F.col(a)).over(w).eqNullSafe(F.col(a))
    # First row per key: lag is NULL for every attr — eqNullSafe keeps that
    # from counting as a change when the attr itself is NULL, so force it.
    is_first = F.row_number().over(w) == 1
    run = F.sum(F.when(changed | is_first, 1).otherwise(0)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = df.select(key, ts, *attrs, *( [tiebreak] if tiebreak else [] )).withColumn(
        "_run", run
    )
    iv = runs.groupBy(key, "_run", *attrs).agg(F.min(ts).alias(valid_from))
    w2 = Window.partitionBy(key).orderBy(F.col("_run").asc())
    return iv.select(
        key,
        *attrs,
        valid_from,
        F.lead(valid_from).over(w2).alias(valid_to),
        F.col("_run").cast("int").alias(version),
    )


def as_of_lookup(
    dim: DataFrame,
    facts: DataFrame,
    key: str,
    fact_ts: Column | str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Point-in-time dimension lookup: attach the dimension row whose
    [valid_from, valid_to) interval contains the fact timestamp.

    Implemented as an equi-join on the key plus interval predicates — Catalyst
    plans an equi-join with residual filter (NOT a nested loop), because the
    key equality dominates. For dimension-heavy skew use
    ``functions.asof.asof_join`` instead (single-window formulation).
    """
    t = F.col(fact_ts) if isinstance(fact_ts, str) else fact_ts
    d = dim.withColumnRenamed(key, "_dim_key")
    cond = (
        (facts[key] == d["_dim_key"])
        & (t >= d[valid_from])
        & (t < F.coalesce(d[valid_to], F.lit("9999-12-31").cast("timestamp")))
    )
    return facts.join(d, cond, "left").drop("_dim_key")
