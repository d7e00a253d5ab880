"""Range (interval) join — point-in-interval matching at scale.

``range_join(points, intervals, ...)`` pairs every point row with every
interval row of the same key whose ``[start, end]`` contains the point's
timestamp.

A naive ``p JOIN i ON key AND start <= ts AND ts <= end`` degenerates in Spark
to a shuffled **nested-loop within key groups** — O(|P_k| × |I_k|) per key,
which explodes when one key holds millions of rows. The classic scale remedy
(used by Databricks' range-join hints and KDB's window joins alike) is
**bucketization**:

1. choose a bucket width ``W`` (≈ typical interval length);
2. each interval replicates to every bucket it overlaps —
   ``explode(sequence(floor(start/W), floor(end/W)))`` — short intervals land
   in ~1-2 buckets;
3. each point maps to exactly ONE bucket: ``floor(ts/W)``;
4. equi-join on (key, bucket) + residual ``start <= ts <= end`` filter.

The join becomes a plain hash join whose build side grows only by the
replication factor (avg interval length / W), and per-bucket work is linear.
AQE still handles residual key skew.

The reference system (anatol-ju/iceberg-evolve) has no relational operators at
all (SURVEY.md §2.2); this is north-star extension work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point to all same-key intervals containing it (inclusive ends).

    ``bucket_seconds`` should be on the order of the typical interval length:
    too small → high interval replication; too large → buckets pair too many
    non-matching rows. Output: all point columns + all interval columns except
    the join key.
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")

    def secs(df: DataFrame, c: str):
        # TIMESTAMP_NTZ has no direct long cast; hop through TIMESTAMP (the
        # session TZ is expected to be UTC, keeping the mapping stable)
        col = df[c]
        if dict(df.dtypes)[c].startswith("timestamp"):
            col = col.cast("timestamp")
        return col.cast("long")

    w = F.lit(bucket_seconds)
    # Surrogate row id for the left-join bookkeeping: matched rows are
    # identified by _rid, never by value equality over the point columns —
    # null-unsafe column comparison would re-emit matched rows whose payload
    # contains a NULL (a row is never "equal" to itself through a NULL).
    p0 = points.withColumn("_rid", F.monotonically_increasing_id())
    p = p0.withColumn("_bkt", (secs(p0, point_ts) / w).cast("long"))
    i = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                (secs(intervals, start_col) / w).cast("long"),
                (secs(intervals, end_col) / w).cast("long"),
            )
        ),
    )
    cond = (
        (p[on] == i[on])
        & (p["_bkt"] == i["_bkt"])
        & (secs(i, start_col) <= secs(p, point_ts))
        & (secs(p, point_ts) <= secs(i, end_col))
    )
    out_cols = [p[c] for c in points.columns] + [
        i[c] for c in intervals.columns if c != on
    ]
    joined = p.join(i, cond, "inner").select(p["_rid"], *out_cols)
    if how == "inner":
        return joined.drop("_rid")
    # left: re-attach unmatched points with nulls, identified by _rid.
    matched_ids = joined.select("_rid").distinct()
    unmatched = p0.join(matched_ids, "_rid", "left_anti")
    for c in intervals.columns:
        if c != on:
            unmatched = unmatched.withColumn(c, F.lit(None).cast(dict(intervals.dtypes)[c]))
    return joined.drop("_rid").unionByName(unmatched.drop("_rid"))
