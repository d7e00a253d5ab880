"""End-to-end corpus-curation pipeline: the chain a real training-data job
runs, composed from the package operators, with stage invariants asserted.

    mixture-resample → boilerplate removal → quality-percentile prune →
    near-dup keep-best → decontaminate vs held-out → pack sequences → shards

Each stage only ever narrows the corpus (or re-labels it); the test asserts
monotone row counts, stage-specific invariants, and that the final layout is
a valid training shard plan.
"""

from pyspark.sql import Window
from pyspark.sql import functions as F

from iceberg_evolve_spark.functions.dedup import minhash_lsh_pairs
from iceberg_evolve_spark.functions.graph import assign_components
from iceberg_evolve_spark.functions.hashing import SEP, hash60
from iceberg_evolve_spark.functions.sampling import (
    domain_mixture_sample,
    shard_assignments,
)
from iceberg_evolve_spark.functions.text import (
    add_text_stats,
    pack_token_sequences,
    quality_percentile_prune,
    remove_repeated_segments,
)


def test_full_curation_pipeline(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. Domain mixing: resample toward a target language composition.
    mixed = domain_mixture_sample(
        docs, "lang", "doc_id", {"en": 0.5, "de": 0.2, "fr": 0.15, "es": 0.15}
    )
    n1 = mixed.count()
    assert 0 < n1 <= n0
    assert mixed.filter(F.col("lang") == "zh").count() == 0  # unlisted dropped

    # 2. Boilerplate removal: strip cross-document templated segments.
    cleaned = remove_repeated_segments(mixed, "doc_id", "text", k=5, min_docs=3)
    assert cleaned.count() == n1  # re-labels, never drops docs
    assert cleaned.filter(F.col("n_removed") > 0).count() >= 0
    cleaned_docs = mixed.select("doc_id", "lang", "source").join(
        cleaned.select("doc_id", F.col("clean_text").alias("text")), "doc_id"
    ).filter(F.length("text") > 0)

    # 3. Quality pruning: drop the worst 20% per language.
    pruned = quality_percentile_prune(cleaned_docs, stratum="lang", drop_frac=0.2)
    n3 = pruned.count()
    assert 0 < n3 <= cleaned_docs.count()

    # 4. Near-dup dedup with keep-best policy (highest quality per cluster).
    pairs = minhash_lsh_pairs(pruned, "doc_id", num_hashes=16, bands=8, k=3, threshold=0.5)
    clustered = assign_components(pruned.select("doc_id"), "doc_id", pairs)
    best = (
        clustered.join(pruned.select("doc_id", "quality_score"), "doc_id")
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("cluster_id").orderBy(
                    F.col("quality_score").desc(), F.col("doc_id").asc()
                )
            ),
        )
        .filter(F.col("_rn") == 1)
        .select("doc_id")
    )
    deduped = pruned.join(best, "doc_id")
    n4 = deduped.count()
    assert 0 < n4 <= n3

    # 5. Decontamination: remove docs whose exact text appears in a held-out
    # split (deterministic hash split of the ORIGINAL corpus).
    split_hash = hash60(F.concat(F.col("doc_id").cast("string"), F.lit(f"{SEP}eval")))
    heldout = docs.filter(split_hash >= F.lit(int(0.9 * (1 << 60))))
    fp = F.md5(F.col("text"))
    train = deduped.withColumn("_fp", fp).join(
        heldout.select(F.md5(F.col("text")).alias("_fp")).distinct(),
        "_fp",
        "left_anti",
    ).drop("_fp")
    n5 = train.count()
    assert 0 < n5 <= n4

    # 6. Pack into token-budget sequences per language, then lay out shards.
    packed = pack_token_sequences(
        train.withColumn("n_tokens", F.size(F.split(F.col("text"), r"\s+"))),
        "doc_id",
        "lang",
        "n_tokens",
        budget=2048,
    )
    assert packed.filter(F.col("seq_id") < 0).count() == 0
    sharded = shard_assignments(packed, "doc_id", n_shards=4)
    assert sharded.count() == n5
    # dense positions per shard
    for r in (
        sharded.groupBy("shard")
        .agg(F.count("*").alias("n"), F.max("pos_in_shard").alias("mx"))
        .collect()
    ):
        assert r["n"] == r["mx"]
