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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_evolve_spark.sources import swap as _swap


def upsert_batch_writer(
    spark: SparkSession,
    target_path: str,
    key: str,
    order_col: str | None = None,
):
    """Build a ``foreachBatch`` function that merges every micro-batch into
    the parquet snapshot at ``target_path`` by ``key``.

    A micro-batch can carry several rows for one key. With ``order_col`` the
    winner is deterministic — the row with the greatest ``order_col`` (an
    event-time / sequence column), ties broken arbitrarily-but-stably by the
    key ordering of the remaining columns. Without it, which row survives is
    UNDEFINED (Spark's ``dropDuplicates`` keeps an arbitrary one); pass an
    ordering column whenever replay determinism matters.
    """
    from iceberg_evolve_spark.operators.merge import merge_upsert

    def write(batch_df: DataFrame, batch_id: int) -> None:
        if order_col is not None:
            w = Window.partitionBy(key).orderBy(F.col(order_col).desc())
            batch_df = (
                batch_df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        else:
            batch_df = batch_df.dropDuplicates([key])  # arbitrary within-batch winner
        _swap.recover(target_path)  # heal a half-finished swap from a crash
        if os.path.isdir(target_path):
            target = spark.read.parquet(target_path)
            merged = merge_upsert(target, batch_df.select(target.columns), key)
        else:
            merged = batch_df
        tmp = target_path.rstrip("/") + f"._batch_{batch_id}_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        _swap.swap(tmp, target_path)

    return write


def run_upsert_stream(
    stream: DataFrame,
    target_path: str,
    key: str,
    checkpoint: str,
    order_col: str | None = None,
):
    """Start the stream with the idempotent upsert sink. The checkpoint dir
    makes batch replay use stable batch_ids across restarts."""
    return (
        stream.writeStream.foreachBatch(
            upsert_batch_writer(stream.sparkSession, target_path, key, order_col)
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )


def cdc_batch_writer(
    spark: SparkSession,
    target_path: str,
    key: str,
    op_col: str = "op",
    order_col: str = "ts_ms",
):
    """``foreachBatch`` CDC apply — the streaming twin of
    ``operators/cdc.py:apply_cdc``: each micro-batch carries upserts
    (``op`` = 'c'/'u', full row) AND deletes ('d'), reduced to the last
    change per key (event-time; delete beats upsert on ties — same total
    order as the batch operator), then applied to the parquet snapshot via
    the same crash-safe swap.

    Replay safety is the same key-idempotent argument as the upsert sink:
    re-applying a batch's final per-key changes to the already-changed
    snapshot converges to the identical state (upserts overwrite with the
    same values; deletes of absent keys are no-ops) — so at-least-once
    delivery yields exactly-once effects with no batch markers."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        w = Window.partitionBy(key).orderBy(
            F.col(order_col).desc(),
            (F.col(op_col) == "d").cast("int").desc(),
            F.col(op_col).desc(),
        )
        last = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        _swap.recover(target_path)
        # op and the event-time ordinal are envelope METADATA — the snapshot
        # holds the row payload only
        data_cols = [c for c in last.columns if c not in (op_col, order_col)]
        upserts = last.filter(F.col(op_col) != "d").select(*data_cols)
        dropped_keys = last.select(key)
        if os.path.isdir(target_path):
            target = spark.read.parquet(target_path)
            survivors = target.join(dropped_keys, key, "left_anti")
            merged = survivors.unionByName(upserts.select(target.columns))
        else:
            merged = upserts
        tmp = target_path.rstrip("/") + f"._batch_{batch_id}_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        _swap.swap(tmp, target_path)

    return write


def mor_cdc_batch_writer(
    spark: SparkSession,
    table_path: str,
    key: str,
    op_col: str = "op",
    order_col: str = "ts_ms",
    max_delete_files: int | None = None,
    delete_mode: str = "rewrite",
):
    """``foreachBatch`` CDC apply with MERGE-ON-READ commits (VERDICT r7
    task 5): instead of rewriting the parquet snapshot per batch (the swap
    path above — correct, but O(table) per batch), each micro-batch lands as

    1. ONE equality-delete commit (``SnapshotTable.delete_by_key``) retiring
       every changed key — delete envelopes AND the superseded versions of
       upserted rows; the data is never scanned, and
    2. ONE fast-append commit (``SnapshotTable.publish(mode="append")`` of
       the batch's pre-staged upsert files — the WAP ingest path, so the
       has-upserts decision reads the staged footers driver-side instead of
       running a probe job) adding the new row versions — data-sequence
       numbers keep them alive past the delete.

    That is Iceberg's streaming-upsert shape: O(batch) work per batch
    regardless of table size, with compaction
    (``rewrite_data_files``) amortized separately.

    Exactly-once effects under foreachBatch's at-least-once replay: BOTH
    commits carry a batch-id stamp token. A replayed batch whose FINAL
    commit's stamp is already in the manifest is skipped whole; a crash
    between the delete commit and the append commit replays the batch and
    the retire stamp (``cdc-batch:{id}:retire``) skips the delete step too —
    without it, every crash-loop replay would stack one more identical
    equality-delete file (state-correct but unbounded metadata growth until
    maintain() fires).

    ``max_delete_files`` bounds read amplification: after each batch,
    ``SnapshotTable.maintain`` folds the merge-on-read stack once the
    delete-file count reaches the threshold (one anti-join per delete file
    on every read otherwise) — the amortized compaction loop a long-running
    MOR stream needs. A crash after the append but before the compaction
    just defers the fold to the next batch. ``delete_mode="vector"`` makes
    that fold the CHEAP one — equality-delete files collapse into one
    deletion vector, O(deleted rows) written and zero data files touched —
    reserving the data-file binpack for the manifest-count trigger; at
    streaming cadence on a large table this is the difference between a
    recurring metadata-sized job and a recurring file-rewrite job."""
    from iceberg_evolve_spark.sources.snapshots import (
        SnapshotTable,
        _parquet_dir_rows,
    )

    def write(batch_df: DataFrame, batch_id: int) -> None:
        t = SnapshotTable(table_path)
        stamp = f"cdc-batch:{batch_id}"
        retire_stamp = f"{stamp}:retire"
        # exact-token match: "cdc-batch:1" must not match "cdc-batch:10 ..."
        tokens = {
            (e.get("note") or "").split(" ", 1)[0] for e in t.versions()
        }
        if stamp in tokens:  # replayed batch, already fully committed
            return
        w = Window.partitionBy(key).orderBy(
            F.col(order_col).desc(),
            (F.col(op_col) == "d").cast("int").desc(),
            F.col(op_col).desc(),
        )
        # Persist the per-key reduction: the staged upsert write and the
        # delete commit both act on it, and without the cache every action
        # re-runs the window over a re-read of the micro-batch source.
        # Batch-sized state — the standard cache-per-micro-batch discipline
        # for multi-action foreachBatch sinks.
        last = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .persist()
        )
        try:
            data_cols = [
                c for c in last.columns if c not in (op_col, order_col)
            ]
            upserts = last.filter(F.col(op_col) != "d").select(*data_cols)
            # Stage the upserts FIRST (staged dirs are invisible to readers,
            # so commit order is unchanged), then read has_upserts from the
            # staged footers' row counts driver-side: one Spark job per
            # batch replaces the old probe + append pair (the limit(1)
            # probe was a full extra job per micro-batch). A replayed batch
            # restages the same id, which replaces a crashed attempt.
            sid = f"cdc_{batch_id}"
            t.stage(upserts, sid)
            has_upserts = (
                _parquet_dir_rows(os.path.join(t.path, f"stage_{sid}")) > 0
            )
            if not t.versions():
                if not has_upserts:
                    t.discard_staged(sid)
                    return  # nothing to delete from an empty table
                t.publish(sid, note=f"{stamp} bootstrap")
                return
            # delete-only batches: the delete IS the final commit, stamped
            # with the full-batch token. Upsert batches stamp the delete
            # commit with its own retire token so a crash-replay skips it
            # (ADVICE r9).
            if retire_stamp not in tokens:
                t.delete_by_key(
                    last.select(key),
                    [key],
                    note=f"{stamp} retire"
                    if not has_upserts
                    else f"{retire_stamp} of batch {batch_id}",
                )
            if has_upserts:
                t.publish(sid, mode="append", note=f"{stamp} append")
            else:
                t.discard_staged(sid)
        finally:
            last.unpersist()
        if max_delete_files is not None:
            t.maintain(
                spark,
                max_delete_files=max_delete_files,
                delete_mode=delete_mode,
            )

    return write


def run_mor_cdc_stream(
    stream: DataFrame,
    table_path: str,
    key: str,
    checkpoint: str,
    op_col: str = "op",
    order_col: str = "ts_ms",
    max_delete_files: int | None = None,
    delete_mode: str = "rewrite",
):
    """Start a merge-on-read CDC-apply stream (availableNow-compatible; see
    ``mor_cdc_batch_writer``)."""
    return (
        stream.writeStream.foreachBatch(
            mor_cdc_batch_writer(
                stream.sparkSession, table_path, key, op_col, order_col,
                max_delete_files=max_delete_files, delete_mode=delete_mode,
            )
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )


def run_cdc_stream(
    stream: DataFrame,
    target_path: str,
    key: str,
    checkpoint: str,
    op_col: str = "op",
    order_col: str = "ts_ms",
):
    """Start a CDC-apply stream (availableNow-compatible; see
    ``cdc_batch_writer``)."""
    return (
        stream.writeStream.foreachBatch(
            cdc_batch_writer(
                stream.sparkSession, target_path, key, op_col, order_col
            )
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )
