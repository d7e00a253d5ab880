"""Skew-handling utilities for hot-key aggregations and joins at scale.

AQE's skew-join splitting handles most cases; these helpers cover the two
patterns AQE cannot: (a) a single hot GROUP BY key overwhelming one reducer,
(b) a broadcast-infeasible join against a skewed key distribution.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation with a random salt: groupBy(keys + salt) computes
    partials in ``salt_buckets``-way parallelism even for a single hot key, then
    a cheap second aggregation over (keys) merges partials.

    ``aggs`` maps column → fn in {sum, count, min, max} (the fns with an exact
    two-phase merge). For mean, pass sum + count and divide afterwards.
    """
    merge_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for fn in aggs.values():
        if fn not in merge_fn:
            raise ValueError(f"unsupported agg {fn!r}; use sum/count/min/max")

    salted = df.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[getattr(F, fn)(c).alias(f"_p_{c}") for c, fn in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[
            getattr(F, merge_fn[fn])(f"_p_{c}").alias(f"{fn}_{c}")
            for c, fn in aggs.items()
        ]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skewed-left inner join: salt the left side's key, replicate the right side
    ``salt_buckets`` times, join on (key, salt). Turns one hot partition into
    ``salt_buckets`` even ones at the cost of replicating the (smaller) right
    side — the standard remedy when the right side is too big to broadcast but
    small enough to replicate k-fold."""
    salted_l = left.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    replicated_r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return salted_l.join(replicated_r, [on, "_salt"]).drop("_salt")
