"""Exactly-once-shaped streaming sink: foreachBatch + idempotent upsert.

Structured Streaming's ``foreachBatch`` gives at-least-once batch delivery —
a crashed batch replays with the SAME ``batch_id``. Exactly-once *effects*
therefore need the write to be idempotent. Two standard shapes:

* key-idempotent (this module): merge each micro-batch into the target by a
  business key (``operators.merge.merge_upsert``). A replayed batch merges the
  same keys to the same values — converges to the same state.
* transactional: write batch output + batch_id atomically (table formats).

The target here is a plain parquet directory snapshot, rewritten per batch via
the safe-swap rename discipline (see ``sources/compact.py``). At scale, the
target is an Iceberg/Delta table and MERGE INTO does the swap; the call-site
shape is identical.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def upsert_batch_writer(spark: SparkSession, target_path: str, key: str):
    """Build a ``foreachBatch`` function that merges every micro-batch into
    the parquet snapshot at ``target_path`` by ``key``."""
    from iceberg_evolve_spark.operators.merge import merge_upsert

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.dropDuplicates([key])  # within-batch last-writer guard
        if os.path.isdir(target_path):
            target = spark.read.parquet(target_path)
            merged = merge_upsert(target, batch_df.select(target.columns), key)
        else:
            merged = batch_df
        tmp = target_path.rstrip("/") + f"._batch_{batch_id}_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        old = target_path.rstrip("/") + "._old"
        if os.path.isdir(target_path):
            os.rename(target_path, old)
        os.rename(tmp, target_path)
        shutil.rmtree(old, ignore_errors=True)

    return write


def run_upsert_stream(
    stream: DataFrame,
    target_path: str,
    key: str,
    checkpoint: str,
):
    """Start the stream with the idempotent upsert sink. The checkpoint dir
    makes batch replay use stable batch_ids across restarts."""
    return (
        stream.writeStream.foreachBatch(
            upsert_batch_writer(stream.sparkSession, target_path, key)
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )
