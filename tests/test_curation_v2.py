"""Second end-to-end composition test, over the LATE-round-4 operators: the
snapshot-governed curation loop a production corpus actually runs.

    snapshot v1 (raw) → exact-substring dup report → model-score gate →
    snapshot v2 (curated) → schema-drift check (none) → incremental-probe of a
    simulated new batch against the curated corpus → governance matrix

Asserts: version isolation (v1 unchanged after v2 lands), the gate only
narrows, drift between v1 and v2 is data-only (schemas equal), and the
incremental probe of a batch drawn FROM the curated corpus reports itself
(sanity: every batch doc near-matches its own corpus copy when duplicated)."""

import os

from pyspark.sql import functions as F

from iceberg_evolve_spark.diff import SchemaDiff
from iceberg_evolve_spark.functions.dedup import (
    exact_substring_shared,
    minhash_lsh_probe,
    minhash_signatures,
)
from iceberg_evolve_spark.functions.text import feature_hashing
from iceberg_evolve_spark.sources.snapshots import SnapshotTable
from iceberg_evolve_spark.spark_convert import struct_from_spark


def test_snapshot_governed_curation_loop(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = SnapshotTable(str(tmp_path / "corpus"))
    t.write(docs, note="raw crawl", ts=1.0)
    n_raw = t.read(spark, version=1).count()
    assert n_raw == docs.count()

    # duplication report on the raw snapshot (Lee et al. signal)
    dup = exact_substring_shared(t.read(spark, version=1), "doc_id", k=10)
    assert dup.filter(F.col("n_shared") > F.col("n_windows")).count() == 0

    # quality gate: linear model over hashed features, keep score > 0
    feats = feature_hashing(t.read(spark, version=1), "doc_id", "text", dim=64)
    scored = feats.groupBy("doc_id").agg(F.sum("weight").alias("s"))
    keep = scored.filter(F.col("s") > 0).select("doc_id")
    curated = t.read(spark, version=1).join(keep, "doc_id")
    n_curated = curated.count()
    assert 0 < n_curated < n_raw  # the gate narrows but keeps something

    v2 = t.write(curated, note="curated", ts=2.0)
    assert v2 == 2
    # version isolation: v1 still serves the raw corpus
    assert t.read(spark, version=1).count() == n_raw
    assert t.read(spark).count() == n_curated

    # drift check: curation changed DATA, not schema
    sa = struct_from_spark(t.read(spark, version=1).schema)
    sb = struct_from_spark(t.read(spark, version=2).schema)
    assert SchemaDiff.union_by_name(sa, sb).is_empty
    assert SchemaDiff.union_by_name(sb, sa).is_empty

    # incremental dedup: a "new batch" that is an exact re-crawl of part of
    # the curated corpus must be flagged against it by the probe
    corpus_sig = minhash_signatures(
        t.read(spark), "doc_id", num_hashes=16, k=3
    ).persist()
    batch_ids = [r.doc_id for r in curated.select("doc_id").limit(5).collect()]
    batch_sig = corpus_sig.filter(F.col("doc_id").isin(batch_ids)).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "sig"
    )
    hits = minhash_lsh_probe(
        corpus_sig, batch_sig, "doc_id", num_hashes=16, bands=8, threshold=0.99
    )
    got = {(r.new_id - 10_000_000, r.corpus_id) for r in hits.collect()}
    assert {(i, i) for i in batch_ids} <= got  # each re-crawled doc flags itself
    corpus_sig.unpersist()

    # manifest bookkeeping survived the loop
    assert [e["version"] for e in t.versions()] == [1, 2]
    assert os.path.isdir(os.path.join(t.path, "v00001"))
