"""Input-parallelism guard shared by CPU-heavy narrow operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def _estimated_splits(df: DataFrame) -> int:
    """Catalyst-statistics estimate of the scan's input splits:
    ``ceil(sizeInBytes / maxPartitionBytes)``. Reads the optimized plan's
    statistics instead of ``df.rdd.getNumPartitions()`` — the RDD probe
    forces a throwaway physical plan (and a Python RDD wrapper) per call,
    while the stats are computed during analysis anyway. For file sources
    sizeInBytes is the file-index total, exactly what drives Spark's own
    split planning."""
    spark = df.sparkSession
    jvm = spark._jvm
    max_split = int(
        jvm.org.apache.spark.util.Utils.byteStringAsBytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB")
        )
    )
    size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    return max(1, -(-size // max(1, max_split)))


#: Logical operators that establish their own output partitioning — for
#: plans containing any of these, byte-size is NOT a proxy for partition
#: count and the exact (RDD) probe must be used instead.
_PARTITIONING_OPS = (
    "Join", "Aggregate", "Repartition", "Window", "Deduplicate", "Sort",
)


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Spread a narrow input across the cluster before a CPU-heavy subtree
    (shingling, per-token hashing, regex scans). A small parquet file arrives
    as ONE input split, which would serialize the whole pipeline on a single
    core; at real scale the input already has ≥ defaultParallelism splits and
    this is a no-op (so it never adds a shuffle where data is already wide).

    The cheap statistics estimate applies only to scan-rooted NARROW plans
    (the actual callers: right after ``spark.read``); a plan containing its
    own partitioning operator (join/aggregate/repartition/…) may be small in
    bytes but already wide, so it falls back to the exact RDD probe rather
    than risking an added shuffle on already-distributed data (review fix)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        if any(op in plan for op in _PARTITIONING_OPS):
            splits = df.rdd.getNumPartitions()
        else:
            splits = _estimated_splits(df)
    except Exception:  # non-classic sessions / stats unavailable: old probe
        splits = df.rdd.getNumPartitions()
    if splits < target:
        return df.repartition(target)
    return df
