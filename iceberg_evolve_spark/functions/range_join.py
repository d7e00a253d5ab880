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
    # F.floor, not a long cast: casting truncates toward zero, which only
    # equals floor for non-negative epochs — pre-1970 timestamps would land
    # points and intervals in different bucket conventions.
    p = p0.withColumn("_bkt", F.floor(secs(p0, point_ts) / w))
    i = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(secs(intervals, start_col) / w),
                F.floor(secs(intervals, end_col) / w),
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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_start: str = "start",
    left_end: str = "end",
    right_start: str = "start",
    right_end: str = "end",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Join interval rows to interval rows: every (l, r) pair with equal
    ``on`` keys whose closed ranges ``[left_start, left_end]`` and
    ``[right_start, right_end]`` intersect. ``on`` may be empty (global
    overlap join, bucketed on time alone).

    Scale shape (the band-join trick, two-sided): BOTH sides replicate to
    the ``bucket_seconds``-wide buckets they span, the join is a plain
    equi-join on (keys…, bucket), and a pair that shares several buckets is
    emitted exactly ONCE — only in the bucket containing the overlap's
    START, ``floor(max(s_l, s_r)/W)`` — so no distinct pass is needed. Work
    per bucket is |L_b|×|R_b| instead of |L|×|R|; output size is inherently
    pair-bound, which is the operator's nature (degree aggregations on top
    stay linear). Column names must be disjoint apart from the keys."""
    wlit = F.lit(bucket_seconds)

    def secs(df: DataFrame, c: str):
        col = df[c]
        if dict(df.dtypes)[c].startswith("timestamp"):
            col = col.cast("timestamp")
        return col.cast("long")

    # F.floor throughout, never a long cast (truncation ≠ floor below zero):
    # with truncation a pre-1970 pair could compute its exactly-once bucket
    # as a bucket neither side replicated to, silently dropping the pair.
    l = left.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(secs(left, left_start) / wlit),
                F.floor(secs(left, left_end) / wlit),
            )
        ),
    )
    r = right.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(secs(right, right_start) / wlit),
                F.floor(secs(right, right_end) / wlit),
            )
        ),
    )
    cond = l["_bkt"] == r["_bkt"]
    for k in on:
        cond = cond & (l[k] == r[k])
    ls, le = secs(l, left_start), secs(l, left_end)
    rs, re_ = secs(r, right_start), secs(r, right_end)
    cond = cond & (ls <= re_) & (rs <= le)
    # exactly-once: only the bucket holding the overlap start emits the pair
    cond = cond & (F.floor(F.greatest(ls, rs) / wlit) == l["_bkt"])
    out_cols = [l[c] for c in left.columns] + [
        r[c] for c in right.columns if c not in on
    ]
    return l.join(r, cond, "inner").select(*out_cols)
