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


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Spread a narrow input across the cluster before a CPU-heavy subtree
    (shingling, per-token hashing, regex scans). A small parquet file arrives
    as ONE input split, which would serialize the whole pipeline on a single
    core; at real scale the input already has ≥ defaultParallelism splits and
    this is a no-op (so it never adds a shuffle where data is already wide)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        splits = _estimated_splits(df)
    except Exception:  # non-classic sessions / stats unavailable: old probe
        splits = df.rdd.getNumPartitions()
    if splits < target:
        return df.repartition(target)
    return df
