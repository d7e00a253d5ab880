"""Input-parallelism guard shared by CPU-heavy narrow operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Spread a narrow input across the cluster before a CPU-heavy subtree
    (shingling, per-token hashing, regex scans). A small parquet file arrives
    as ONE input split, which would serialize the whole pipeline on a single
    core; at real scale the input already has ≥ defaultParallelism splits and
    this is a no-op (so it never adds a shuffle where data is already wide)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
