"""Merge / upsert over plain DataFrames — MERGE INTO semantics without a
transactional table format.

``merge_upsert`` implements the classic SCD-1 rule set:

* matched key → take the update row's values,
* unmatched update → insert,
* unmatched target → keep (or drop with ``delete_missing=True``, turning the
  merge into a full snapshot replace).

Shape: ONE full-outer shuffle join on the key, then a coalesce projection —
no driver loops, no collects. At 100 TB both sides hash-partition on the key;
if the target is bucketed by the key (sources/bucketing.py) its half of the
shuffle disappears. Against a real Iceberg catalog the same call site would
emit ``MERGE INTO`` and let the format do copy-on-write/merge-on-read; this
operator is the engine-level equivalent for raw parquet lakes, and composes
with the schema engine: run ``migrate_dataframe`` on the updates first when
their schema is a newer version of the target's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key: str,
    delete_missing: bool = False,
) -> DataFrame:
    """Upsert ``updates`` into ``target`` by ``key``; both sides must share a
    schema (evolve the updates with ``migrate_dataframe`` first if not)."""
    if target.columns != updates.columns:
        raise ValueError(
            f"schema mismatch: target {target.columns} vs updates "
            f"{updates.columns}; run migrate_dataframe on the updates first"
        )
    t = target.alias("t")
    u = updates.alias("u")
    cond = F.col(f"t.{key}") == F.col(f"u.{key}")
    joined = t.join(u, cond, "full_outer")
    matched_or_insert = F.col(f"u.{key}").isNotNull()
    out_cols = [
        F.when(matched_or_insert, F.col(f"u.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
        for c in target.columns
    ]
    merged = joined.select(*out_cols) if not delete_missing else (
        joined.filter(matched_or_insert).select(*[F.col(f"u.{c}").alias(c) for c in updates.columns])
    )
    return merged
