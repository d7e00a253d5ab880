"""Small-file compaction — the unglamorous operator every parquet lake needs.

Streaming sinks and over-parallel writers leave directories with thousands of
KB-scale files; every subsequent scan then pays per-file open/footer costs and
the driver pays listing time. ``compact`` rewrites a directory to
``ceil(bytes / target_mb)`` files (optionally sorted, which also restores
data-skipping statistics — see ``formats.write_sorted``).

Safe-rewrite discipline: write to a sibling temp dir, then atomically swap via
rename. A reader racing the swap sees either the old or the new directory,
never a half state. (On object stores rename is a copy — there, compact into a
NEW prefix and flip a pointer/manifest instead, which is exactly what table
formats like Iceberg automate.)
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession

from iceberg_evolve_spark.sources import swap as _swap


def dir_stats(path: str) -> tuple[int, int]:
    """(#data files, total bytes) under ``path`` (ignores _SUCCESS/.crc)."""
    n, size = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            n += 1
            size += os.path.getsize(os.path.join(root, f))
    return n, size


def compact(
    spark: SparkSession,
    path: str,
    target_mb: int = 128,
    sort_cols: list[str] | None = None,
) -> int:
    """Rewrite the parquet dir at ``path`` into ~``target_mb`` files.
    Returns the new file count."""
    _swap.recover(path)  # heal a half-finished swap from a crash
    _, total = dir_stats(path)
    n_files = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "._compact_tmp"
    if sort_cols:
        out = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(tmp)
    _swap.swap(tmp, path)
    return dir_stats(path)[0]
