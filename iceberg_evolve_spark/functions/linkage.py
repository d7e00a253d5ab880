"""Record linkage / entity resolution over DataFrames: blocked candidate
generation + edit-distance matching.

The scale problem in entity resolution is candidate generation: naive
all-pairs is O(n²) and dies at any real corpus size. The standard answer is
BLOCKING — a deterministic key (phonetic code, prefix, sorted-neighborhood
bucket) such that true matches almost surely share a block, then match only
within blocks. Cost becomes Σ|block|², bounded by the largest block, so the
blocking key must be engineered for bounded block size (and skewed blocks
salted or dropped, exactly like the stop-shingle cap in
``functions/dedup.py``).

Everything here is pure Catalyst: the self-join shuffles once on the block
key, and ``levenshtein`` is a JVM built-in — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_candidate_pairs(
    df: DataFrame,
    id_col: str,
    block_cols: list[str],
    payload_cols: list[str] | None = None,
    max_block_size: int | None = None,
) -> DataFrame:
    """Generate within-block candidate pairs (``id_a < id_b``).

    One shuffle on the block key; per-block fan-out is |block|², so
    ``max_block_size`` drops oversized blocks up front (the frequent-shingle
    cap of linkage — a block that big means the blocking key failed there and
    a finer key, not a bigger join, is the fix). Returns one row per pair with
    ``_a``/``_b`` suffixed payload columns plus the block columns.
    """
    payload_cols = payload_cols or []
    cols = [id_col, *block_cols, *payload_cols]
    base = df.select(*dict.fromkeys(cols))
    if max_block_size is not None:
        sizes = base.groupBy(*block_cols).agg(F.count(F.lit(1)).alias("_bsz"))
        base = (
            base.join(sizes.filter(F.col("_bsz") > max_block_size), block_cols, "left_anti")
        )
    a = base.select(
        *[F.col(c).alias(f"{c}_a") if c not in block_cols else F.col(c) for c in cols]
    )
    b = base.select(
        *[F.col(c).alias(f"{c}_b") if c not in block_cols else F.col(c) for c in cols]
    )
    return a.join(b, block_cols).filter(F.col(f"{id_col}_a") < F.col(f"{id_col}_b"))


def fuzzy_match_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: list[str],
    max_distance: int = 1,
    max_block_size: int | None = None,
) -> DataFrame:
    """Within-block name pairs with Levenshtein distance ≤ ``max_distance``.

    Edit distance is an exact integer (JVM ``levenshtein``), so the match
    boundary is bit-deterministic across engines. Output columns:
    block cols + ``(<id>_a, <id>_b, <name>_a, <name>_b, dist)``.
    """
    pairs = blocked_candidate_pairs(
        df, id_col, block_cols, payload_cols=[name_col], max_block_size=max_block_size
    )
    dist = F.levenshtein(F.col(f"{name_col}_a"), F.col(f"{name_col}_b"))
    return pairs.withColumn("dist", dist).filter(F.col("dist") <= max_distance)
