"""Bucketed tables: shuffle-free co-located joins and aggregations.

At 100 TB the dominant cost of ``lineitem ⋈ orders`` is the shuffle of both
fact tables. Writing both **bucketed by the join key into the same number of
buckets** moves that shuffle to write time, once; every subsequent join or
aggregation on the key reads co-located buckets and skips the exchange
entirely (`SortMergeJoin` directly over bucketed scans — verified by test
asserting no ``Exchange`` in the executed plan).

Spark bucketing requires a catalog table (``saveAsTable``): bucket metadata
lives in the catalog, not in the parquet files. The helpers below use the
session's current catalog/warehouse — in tests, the default in-memory catalog
with a temp warehouse dir; in production, the real metastore/Iceberg catalog
(Iceberg's equivalent is a ``bucket(N, key)`` partition transform).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a parquet catalog table bucketed (and optionally
    sorted) by ``bucket_col``. Sorting within buckets lets the co-located join
    skip its per-partition sort too. ``path`` makes it an external table
    (useful when the session has no writable warehouse dir)."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on the bucket key. When bucket
    counts match, Catalyst plans this without any Exchange."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
