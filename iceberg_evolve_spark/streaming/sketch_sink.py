"""Incremental sketch maintenance over a stream: Count-Min counters that stay
current as micro-batches arrive.

CMS counters are LINEAR (counters of a union = elementwise sum of counters),
so per-batch counters merge into the running sketch by summing on
``(seed, bucket)`` — the streaming twin of ``operators/incremental.py``'s
algebraic view maintenance, applied to a sketch instead of an exact rollup.

Additive state is NOT key-idempotent: a replayed ``foreachBatch`` (Structured
Streaming is at-least-once per batch) would double-count. Exactly-once effects
come
from the transactional pattern instead — every snapshot carries zero-byte
``_applied_<batch_id>`` markers (underscore-prefixed files are invisible to
parquet readers), and a batch whose marker already exists is skipped. Marker
and data move together through the same atomic safe-swap used by
``streaming/sink.py``, so a crash between merge and swap replays cleanly.

At scale the snapshot is depth × width rows (KB — metadata, not data), while
the stream side aggregates with map-side combine; the merge cost per batch is
independent of total stream volume.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_evolve_spark.functions.sketch import cms_counters
from iceberg_evolve_spark.sources import swap as _swap


def _applied(target_path: str, batch_id: int) -> bool:
    return os.path.exists(os.path.join(target_path, f"_applied_{batch_id}"))


def _copy_markers(target_path: str, tmp: str, new_batch_id: int) -> None:
    os.makedirs(tmp, exist_ok=True)
    if os.path.isdir(target_path):
        for name in os.listdir(target_path):
            if name.startswith("_applied_"):
                open(os.path.join(tmp, name), "w").close()
    open(os.path.join(tmp, f"_applied_{new_batch_id}"), "w").close()


def cms_batch_writer(
    spark: SparkSession,
    target_path: str,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
):
    """Build a ``foreachBatch`` function maintaining the CMS snapshot at
    ``target_path``. Replay-safe: an already-applied batch_id is a no-op."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        _swap.recover(target_path)
        if _applied(target_path, batch_id):
            return
        delta = cms_counters(batch_df, key_col, depth=depth, width=width)
        if os.path.isdir(target_path):
            current = spark.read.parquet(target_path)
            merged = (
                current.unionByName(delta)
                .groupBy("seed", "bucket")
                .agg(F.sum("cnt").alias("cnt"))
            )
        else:
            merged = delta
        tmp = target_path.rstrip("/") + f"._batch_{batch_id}_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        _copy_markers(target_path, tmp, batch_id)
        _swap.swap(tmp, target_path)

    return write


def run_cms_stream(
    stream: DataFrame,
    target_path: str,
    key_col: str,
    checkpoint: str,
    depth: int = 4,
    width: int = 1024,
):
    """Start the stream with the incremental-CMS sink; the checkpoint pins
    batch_ids across restarts so the replay markers line up.

    ``availableNow`` (the same catch-up-then-stop trigger the sibling
    ``run_lsh_dedup_stream`` uses): the sink is idempotent and checkpointed,
    so the deployment shape is repeated catch-up runs — and a test that
    drives it terminates when the backlog is drained instead of burning its
    whole awaitTermination timeout polling an idle source."""
    return (
        stream.writeStream.trigger(availableNow=True).foreachBatch(
            cms_batch_writer(stream.sparkSession, target_path, key_col, depth, width)
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )


# ---------------------------------------------------------------------------
# HyperLogLog maintenance — idempotent-by-construction
# ---------------------------------------------------------------------------


def hll_batch_writer(
    spark: SparkSession,
    target_path: str,
    key_col: str,
    b: int = 8,
    group_cols: list[str] | None = None,
):
    """``foreachBatch`` function maintaining an HLL register snapshot.

    The instructive contrast with :func:`cms_batch_writer`: CMS counters are
    ADDITIVE, so at-least-once replay double-counts and needs the
    ``_applied_<batch_id>`` markers. HLL registers merge by row-wise MAX —
    IDEMPOTENT — so replaying a batch merges the same registers again and
    changes nothing; exactly-once state comes for free and no markers are
    needed. Only the atomic safe-swap (crash between write and rename) is
    still required. The snapshot is ≤ 2**b rows of metadata; the distinct
    count of the entire stream history is one KB-scale read away at any
    volume.

    ``group_cols`` maintains one sketch per group (e.g. per hour-bucket:
    register rows keyed ``(bucket, j)``) — the layout
    ``sketch.hll_sliding_distinct`` serves trailing-window distinct
    queries from, so the stream maintains the registers and ANY trailing
    window is answered from the snapshot without replaying data.
    """
    from iceberg_evolve_spark.functions.sketch import hll_merge, hll_registers

    def write(batch_df: DataFrame, batch_id: int) -> None:
        _swap.recover(target_path)
        # hash60 hashes text; cast so id-like BIGINT keys work out of the box
        # (Spark's long→string rendering equals DuckDB's CAST AS VARCHAR).
        delta = hll_registers(
            batch_df, F.col(key_col).cast("string"), b=b, group_cols=group_cols
        )
        if os.path.isdir(target_path):
            current = spark.read.parquet(target_path)
            merged = hll_merge(current, delta, group_cols=group_cols)
        else:
            merged = delta
        tmp = target_path.rstrip("/") + f"._batch_{batch_id}_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        _swap.swap(tmp, target_path)

    return write


def run_hll_stream(
    stream: DataFrame,
    target_path: str,
    key_col: str,
    checkpoint: str,
    b: int = 8,
    group_cols: list[str] | None = None,
):
    """Start the stream with the incremental-HLL sink (``availableNow``
    catch-up-then-stop trigger — see :func:`run_cms_stream`)."""
    return (
        stream.writeStream.trigger(availableNow=True).foreachBatch(
            hll_batch_writer(stream.sparkSession, target_path, key_col, b, group_cols)
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )
