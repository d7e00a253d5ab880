"""Scale extension operators (the 100-TB training-data-pipeline track).

Everything here is built on ``pyspark.sql.functions`` (JVM-side, whole-stage
codegen) — no Python UDFs in any hot path. Each public function is a pure
DataFrame→DataFrame transform so Catalyst can push filters/prune columns through
it, and each has an ANSI-SQL-expressible definition used by the DuckDB oracle in
``__spark_entry__.py``.
"""

from iceberg_evolve_spark.functions.hashing import hash60, hash60_seeded
from iceberg_evolve_spark.functions.text import (
    add_text_stats,
    language_id,
    document_fingerprint,
    token_count_bpe,
)
from iceberg_evolve_spark.functions.dedup import (
    exact_dedup,
    ngram_jaccard_pairs,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash,
    simhash_near_dups,
    embedding_near_dups,
)
from iceberg_evolve_spark.functions.similarity import (
    cosine_sim,
    lsh_bucket,
    topk_brute_force,
    topk_ivf,
    topk_lsh,
)
from iceberg_evolve_spark.functions.dedup import (
    exact_substring_shared,
    minhash_lsh_probe,
)
from iceberg_evolve_spark.functions.graph import (
    assign_components,
    connected_components,
    pagerank,
)
from iceberg_evolve_spark.functions.linkage import (
    blocked_candidate_pairs,
    fuzzy_match_pairs,
)
from iceberg_evolve_spark.functions.text import bpe_train_merges, feature_hashing

__all__ = [
    "hash60",
    "hash60_seeded",
    "add_text_stats",
    "language_id",
    "document_fingerprint",
    "token_count_bpe",
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash",
    "simhash_near_dups",
    "embedding_near_dups",
    "cosine_sim",
    "lsh_bucket",
    "topk_brute_force",
    "topk_ivf",
    "topk_lsh",
    "exact_substring_shared",
    "minhash_lsh_probe",
    "assign_components",
    "connected_components",
    "pagerank",
    "blocked_candidate_pairs",
    "fuzzy_match_pairs",
    "bpe_train_merges",
    "feature_hashing",
]
