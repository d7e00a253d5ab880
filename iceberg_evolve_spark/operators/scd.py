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


def scd2_apply_changes(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    attrs: list[str],
    ts: str,
    tiebreak: str | None = None,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    version: str = "version",
) -> DataFrame:
    """Incrementally maintain an SCD2 dimension from a CDC batch — the
    warehouse MERGE-into-SCD2 pattern: closed history is untouched, each
    changed key's OPEN interval is closed at its first real change, and the
    batch's new intervals append with continuing version numbers. A leading
    change event whose attributes equal the key's current state is a no-op
    (it extends the open interval instead of opening a duplicate version),
    so replaying full-state CDC snapshots cannot inflate history.

    Precondition (the CDC invariant): every change timestamp must be >= the
    key's current ``valid_from``; late events that belong INSIDE closed
    history need a history rebuild (`scd2_intervals` over the full event
    log), not an incremental apply.

    Scale shape: the batch collapses to intervals with one batch-keyed
    window; everything else is key-partitioned joins between the batch's
    keys and the dimension — untouched keys move through a single
    left join with no rewrite. ``apply(intervals(events < t), events >= t)``
    equals ``intervals(all events)`` — hash-gated by the
    `scd2_incremental_apply` entry."""
    batch = scd2_intervals(
        changes, key, attrs, ts, tiebreak, valid_from, valid_to, version
    )
    cur = dim.filter(F.col(valid_to).isNull()).select(
        F.col(key),
        *[F.col(a).alias(f"_c_{a}") for a in attrs],
        F.col(version).alias("_c_ver"),
    )
    b = batch.join(cur, key, "left")
    same_as_cur = F.lit(True)
    for a in attrs:
        same_as_cur = same_as_cur & F.col(a).eqNullSafe(F.col(f"_c_{a}"))
    lead_noop = (
        (F.col(version) == 1) & F.col("_c_ver").isNotNull() & same_as_cur
    )
    # The per-key shift (1 when the leading batch interval was a no-op) and
    # the key's first surviving valid_from are WINDOWS over the join output,
    # not groupBy+self-joins: the left join already clustered ``b`` by the
    # key, so both aggregates reuse that partitioning in one pass and the
    # batch pipeline (two interval windows + the join) is evaluated once
    # instead of three times.
    wk = Window.partitionBy(key)
    b = b.withColumn("_drop", lead_noop).withColumn(
        "_shift", F.max(lead_noop.cast("int")).over(wk)
    )
    surv = b.filter(~F.col("_drop")).select(
        key,
        *attrs,
        valid_from,
        valid_to,
        (
            F.col(version) - F.col("_shift") + F.coalesce(F.col("_c_ver"), F.lit(0))
        ).cast("int").alias(version),
    )
    first_new = b.groupBy(key).agg(
        F.min(F.when(~F.col("_drop"), F.col(valid_from))).alias("_close_at")
    )
    # ONE pass over the dimension for both history branches: closed rows
    # keep their valid_to (coalesce short-circuits), open rows close at the
    # key's first new interval (or stay open when the key is untouched) —
    # previously the dim subtree was computed twice more here (a filtered
    # open-rows join plus the closed-history filter).
    kept = dim.join(first_new, key, "left").select(
        *[
            F.coalesce(F.col(valid_to), F.col("_close_at")).alias(valid_to)
            if c == valid_to
            else F.col(c)
            for c in dim.columns
        ]
    )
    return kept.unionByName(surv.select(*dim.columns))
