"""Incremental near-dup INDEX maintenance over a stream: the MinHash-LSH
corpus index stays current as micro-batches of documents arrive, and every
batch's near-dups against the EXISTING corpus are logged as they happen.

This is the streaming twin of the batch probe
(`functions/dedup.py:minhash_lsh_probe`, entries `dedup_incremental_probe` /
`snapshot_incremental_dedup`): per micro-batch, (1) the batch's signatures
are probed against the index as it stood BEFORE the batch — one bucket join,
linear in the batch — and the accepted pairs append to a dup log; (2) the
batch's signatures append to the index. A 100 TB corpus never self-joins
again after its initial index build; each day costs its own batch.

Exactly-once discipline: signature APPEND is not idempotent (a replayed
batch would double-insert its signatures and then self-collide on the next
probe), so the sink uses the transactional `_applied_<batch_id>` marker
pattern of `sketch_sink.cms_batch_writer`. Index and dup log live under ONE
snapshot directory (``<target>/index`` + ``<target>/dups``) written together
into the same tmp dir and installed by a single atomic swap — a crash can
never commit the index without its batch's dup log or vice versa.

At scale the per-batch cost is the batch's signature computation + one
shuffle join against the index buckets; the snapshot rewrite is the index's
(id, sig) relation — rows = corpus docs, KB per thousand docs. Past the
point where full-snapshot rewrite dominates, the same marker+swap protocol
applies per PARTITION of the index (band-hash range), not to a monolith.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_evolve_spark.functions.dedup import (
    minhash_lsh_probe,
    minhash_signatures,
    unpersist_intermediates,
)
from iceberg_evolve_spark.sources import swap as _swap
from iceberg_evolve_spark.streaming.sketch_sink import _applied, _copy_markers


def lsh_index_batch_writer(
    spark: SparkSession,
    target_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    threshold: float = 0.5,
):
    """Build the ``foreachBatch`` function maintaining ``<target>/index``
    (signature relation) and ``<target>/dups`` (accepted near-dup pairs,
    stamped with the batch id that surfaced them). Replay-safe: an
    already-applied batch_id is a no-op."""

    idx_sub, dup_sub = "index", "dups"

    def write(batch_df: DataFrame, batch_id: int) -> None:
        _swap.recover(target_path)
        if _applied(target_path, batch_id):
            return
        sig = minhash_signatures(
            batch_df, id_col, text_col, num_hashes=num_hashes, k=k
        )
        idx_path = os.path.join(target_path, idx_sub)
        hits = None
        if os.path.isdir(idx_path):
            corpus = spark.read.parquet(idx_path)
            hits = minhash_lsh_probe(
                corpus,
                sig,
                id_col,
                num_hashes=num_hashes,
                bands=bands,
                threshold=threshold,
            )
            merged = corpus.unionByName(
                sig.select(F.col(id_col), F.col("sig"))
            )
            dups = spark.read.parquet(os.path.join(target_path, dup_sub)).unionByName(
                hits.withColumn("batch_id", F.lit(batch_id).cast("long"))
            )
        else:
            merged = sig
            id_type = sig.schema[id_col].dataType
            dups = spark.createDataFrame(
                [],
                T.StructType(
                    [
                        T.StructField("new_id", id_type),
                        T.StructField("corpus_id", id_type),
                        T.StructField("est_jaccard", T.DoubleType()),
                        T.StructField("batch_id", T.LongType()),
                    ]
                ),
            )
        tmp = target_path.rstrip("/") + f"._batch_{batch_id}_tmp"
        merged.write.mode("overwrite").parquet(os.path.join(tmp, idx_sub))
        dups.write.mode("overwrite").parquet(os.path.join(tmp, dup_sub))
        _copy_markers(target_path, tmp, batch_id)
        _swap.swap(tmp, target_path)
        if hits is not None:
            unpersist_intermediates(hits)

    return write


def run_lsh_dedup_stream(
    stream: DataFrame,
    target_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    threshold: float = 0.5,
):
    """Start the stream with the incremental LSH-index sink; the checkpoint
    pins batch_ids across restarts so the replay markers line up."""
    return (
        stream.writeStream.trigger(availableNow=True).foreachBatch(
            lsh_index_batch_writer(
                stream.sparkSession,
                target_path,
                id_col=id_col,
                text_col=text_col,
                num_hashes=num_hashes,
                bands=bands,
                k=k,
                threshold=threshold,
            )
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )
