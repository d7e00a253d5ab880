"""Incremental view maintenance for algebraic aggregates.

At 100 TB you do not recompute a rollup because a day of data arrived — you
merge the day's partial aggregate into the materialized one. That works
exactly for *algebraic* measures (Gray et al., "Data Cube", 1997 terminology):
SUM and COUNT add, MIN/MAX combine by min/max, AVG derives from (SUM, COUNT).
Holistic measures (exact DISTINCT, exact percentiles) do NOT merge — maintain
a sketch instead (``functions/sketch.py``: KMV for distinct, CMS for
frequencies — both mergeable by construction).

This is the batch half of the incremental story; the streaming half is
``streaming/sink.py`` (foreachBatch upsert = the same merge driven by a
stream). Scale shape: the delta aggregates first (map-side combine over the
small delta), then one key-partitioned full-outer join against the base — the
base is never rescanned, only shuffled on the same key it is already keyed by
(a bucketed base table skips even that, see ``sources/bucketing.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_delta(
    delta: DataFrame,
    keys: list[str],
    sum_cols: dict[str, str] | None = None,
    count_col: str = "n",
    min_cols: dict[str, str] | None = None,
    max_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Partial aggregate of a delta batch in the merged table's schema.

    ``sum_cols``/``min_cols``/``max_cols`` map source column → output column.
    """
    aggs = [F.count(F.lit(1)).alias(count_col)]
    for src, out in (sum_cols or {}).items():
        aggs.append(F.sum(src).alias(out))
    for src, out in (min_cols or {}).items():
        aggs.append(F.min(src).alias(out))
    for src, out in (max_cols or {}).items():
        aggs.append(F.max(src).alias(out))
    return delta.groupBy(*keys).agg(*aggs)


def merge_aggregates(
    base: DataFrame,
    delta_agg: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    count_col: str = "n",
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
) -> DataFrame:
    """Merge a partial aggregate into the materialized one (full-outer join on
    the group keys; measures combine per their algebra). Column sets of
    ``base`` and ``delta_agg`` must match: keys + measures."""
    # Base and delta often share lineage (both derived from the same table),
    # which makes plain column references ambiguous after a self-join — rename
    # the delta side outright instead of relying on aliases.
    d = delta_agg.select([F.col(c).alias(f"_d_{c}") for c in delta_agg.columns])
    cond = [base[k].eqNullSafe(d[f"_d_{k}"]) for k in keys]
    joined = base.join(d, cond, "full")
    bcol = lambda c: base[c]
    dcol = lambda c: d[f"_d_{c}"]
    out_cols = [F.coalesce(bcol(k), dcol(k)).alias(k) for k in keys]
    zero = F.lit(0)
    out_cols.append(
        (F.coalesce(bcol(count_col), zero) + F.coalesce(dcol(count_col), zero)).alias(count_col)
    )
    for c in sum_cols:
        out_cols.append((F.coalesce(bcol(c), zero) + F.coalesce(dcol(c), zero)).alias(c))
    for c in min_cols or []:
        out_cols.append(F.least(bcol(c), dcol(c)).alias(c))  # least/greatest skip NULLs
    for c in max_cols or []:
        out_cols.append(F.greatest(bcol(c), dcol(c)).alias(c))
    return joined.select(*out_cols)
