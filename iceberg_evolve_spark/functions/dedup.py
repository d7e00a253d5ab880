"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Design for 100 TB (see module docstrings per function):

* Exact dedup is a hash-partitioned ``row_number`` — one shuffle on the content
  fingerprint, the minimum possible.
* Near-dup families never do an O(n²) cross join. They build an **inverted index**
  (explode → join on shingle / band-bucket / bit-chunk) so the join key
  distributes, and candidate verification happens only inside buckets. Frequent
  shingles (the classic skew source) can be capped with ``max_df``.
* All hashes are the portable 60-bit md5 hash (``hashing.py``), so the DuckDB
  oracle reproduces signatures bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from iceberg_evolve_spark.functions.hashing import hash60, hash60_seeded
from iceberg_evolve_spark.functions.text import tokens

# ---------------------------------------------------------------------------
# Shingling
# ---------------------------------------------------------------------------


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct word k-grams of the lowercased text, joined by single spaces.

    ``transform(sequence(...))`` keeps generation inside codegen; ``array_distinct``
    turns the bag into a set (Jaccard is set-based).
    """
    toks = tokens(col)
    n = F.size(toks)
    # sequence(1, 0) yields a DESCENDING [1, 0] in Spark, so guard short texts
    # (fewer than k tokens → no shingles) with an explicit empty array.
    positions = F.when(
        n >= k, F.sequence(F.lit(1), n - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(positions, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    return F.array_distinct(grams)


def _shingle_index(
    df: DataFrame, id_col: str, text_col: str, k: int, max_df: int | None
) -> DataFrame:
    """Inverted index: one row per (doc, distinct shingle). Optionally drop
    shingles appearing in more than ``max_df`` docs (skew + noise control at
    scale: a stop-shingle shared by millions of docs would otherwise create a
    quadratic bucket)."""
    idx = df.select(
        F.col(id_col).alias("_id"),
        F.explode(word_shingles(text_col, k)).alias("sh"),
    )
    if max_df is not None:
        good = (
            idx.groupBy("sh")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_df)
            .select("sh")
        )
        idx = idx.join(F.broadcast(good), "sh")
    return idx


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    df: DataFrame,
    id_col: str,
    key_cols: list[str] | None = None,
    normalize_col: str | None = None,
) -> DataFrame:
    """Keep exactly one row (the smallest ``id_col``) per duplicate group.

    Group key: ``key_cols``, or the whitespace-normalized lowercase of
    ``normalize_col``. One shuffle (hash partition by key); the per-key winner is
    picked map-side-combinable via ``min_by`` semantics (row_number window).
    """
    if normalize_col is not None:
        key = [
            F.regexp_replace(F.lower(F.trim(F.col(normalize_col))), r"\s+", " ").alias(
                "_dedup_key"
            )
        ]
        df = df.withColumn("_dedup_key", key[0])
        partition = ["_dedup_key"]
    elif key_cols:
        partition = key_cols
    else:
        raise ValueError("pass key_cols or normalize_col")

    w = Window.partitionBy(*partition).orderBy(F.col(id_col).asc())
    out = (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return out.drop("_dedup_key") if normalize_col is not None else out


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """All pairs with Jaccard(shingles_a, shingles_b) >= threshold.

    Inverted-index join: common-shingle counting shuffles on the shingle, never
    materializing non-overlapping pairs. Output: (id_a, id_b, jaccard) with
    id_a < id_b.
    """
    idx = _shingle_index(df, id_col, text_col, k, max_df)
    sizes = idx.groupBy("_id").agg(F.count("*").alias("n_sh"))

    a = idx.select(F.col("_id").alias("id_a"), "sh")
    b = idx.select(F.col("_id").alias("id_b"), "sh")
    common = (
        a.join(b, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    out = (
        common.join(sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            (F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))).cast(
                "double"
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 32,
    k: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """MinHash signature per document: ``sig[i] = min over shingles of
    hash60(shingle ++ seed_i)``.

    One explode + one groupBy(doc): the ``num_hashes`` mins are computed as
    parallel aggregate columns (map-side partial aggregation keeps shuffle volume
    at one row per doc). Docs with fewer than ``k`` tokens (no shingles) are
    omitted. Output: (id, sig array<bigint>).
    """
    idx = _shingle_index(df, id_col, text_col, k, max_df)
    aggs = [
        F.min(hash60_seeded(F.col("sh"), i)).alias(f"_h{i}") for i in range(num_hashes)
    ]
    sig = idx.groupBy("_id").agg(*aggs)
    return sig.select(
        F.col("_id").alias(id_col),
        F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias("sig"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Near-dup candidate pairs via banded LSH over MinHash signatures, scored by
    the signature-estimated Jaccard (fraction of agreeing hash positions).

    rows-per-band r = num_hashes/bands; a pair collides if any band of r
    consecutive signature values matches exactly. Banding shuffles on
    (band_index, band_hash) — each bucket is tiny for non-duplicate data, so the
    candidate join is output-linear rather than O(n²). Output:
    (id_a, id_b, est_jaccard >= threshold).
    """
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, num_hashes, k, max_df)

    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws(",", *[F.col("sig")[b * r + j].cast("string") for j in range(r)])).alias(
                    "bhash"
                ),
            )
            for b in range(bands)
        ]
    )
    banded = sig.select(F.col(id_col).alias("_id"), "sig", F.explode(band_structs).alias("bd"))
    banded = banded.select("_id", "sig", F.col("bd.band").alias("band"), F.col("bd.bhash").alias("bhash"))

    a = banded.select(
        F.col("_id").alias("id_a"), F.col("sig").alias("sig_a"), "band", "bhash"
    )
    b = banded.select(
        F.col("_id").alias("id_b"), F.col("sig").alias("sig_b"), "band", "bhash"
    )
    cand = (
        a.join(b, ["band", "bhash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    agree = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda eq: eq,
        )
    )
    return (
        cand.withColumn("est_jaccard", (agree / F.lit(num_hashes)).cast("double"))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60  # fits the portable 60-bit hash


def simhash(
    df: DataFrame, id_col: str, text_col: str = "text", bits: int = SIMHASH_BITS
) -> DataFrame:
    """SimHash fingerprint: bit i is set iff the sum over tokens of
    (+1 if bit i of hash60(token) else -1), weighted by term frequency, is > 0.

    Shape: explode tokens → groupBy(doc) with ``bits`` conditional-sum aggregate
    columns (all map-side combinable) → fold bits into one BIGINT. Bit tests use
    integer shifts (``shiftright``/``&``), which DuckDB reproduces exactly.
    """
    tok = df.select(F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("t"))
    h = hash60(F.col("t"))
    aggs = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"_b{i}")
        for i in range(bits)
    ]
    agg = tok.groupBy("_id").agg(*aggs)
    fp = None
    for i in range(bits):
        term = F.when(F.col(f"_b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return agg.select(F.col("_id").alias(id_col), fp.cast("bigint").alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    max_hamming: int = 3,
    bits: int = SIMHASH_BITS,
    chunks: int = 4,
) -> DataFrame:
    """Pairs with Hamming(simhash_a, simhash_b) <= max_hamming.

    Pigeonhole LSH: split the fingerprint into ``chunks`` equal bit-chunks; any
    pair within ``chunks - 1`` differing bits shares at least one identical chunk
    (requires ``max_hamming < chunks``). Candidate join on (chunk_idx, chunk_value)
    — distributes like a hash join; verification is a popcount of XOR.
    """
    if max_hamming >= chunks:
        raise ValueError("need max_hamming < chunks for pigeonhole guarantee")
    width = bits // chunks
    sh = simhash(df, id_col, text_col, bits)
    chunk_arr = F.array(
        *[
            F.struct(
                F.lit(c).alias("c"),
                F.shiftright(F.col("simhash"), c * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("v"),
            )
            for c in range(chunks)
        ]
    )
    ch = sh.select(F.col(id_col).alias("_id"), "simhash", F.explode(chunk_arr).alias("ck"))
    ch = ch.select("_id", "simhash", F.col("ck.c").alias("c"), F.col("ck.v").alias("v"))
    a = ch.select(F.col("_id").alias("id_a"), F.col("simhash").alias("fp_a"), "c", "v")
    b = ch.select(F.col("_id").alias("id_b"), F.col("simhash").alias("fp_b"), "c", "v")
    cand = (
        a.join(b, ["c", "v"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "fp_a", "fp_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.expr("fp_a ^ fp_b"))
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# Embedding near-dup
# ---------------------------------------------------------------------------


def embedding_near_dups(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Pairs of rows whose embedding cosine similarity >= threshold.

    Exact block-join formulation: for corpora that fit a broadcast (≤ ~1 GB of
    vectors) the right side is broadcast, making this a map-only pass over the
    left; beyond that, switch to :func:`iceberg_evolve_spark.functions.similarity.
    lsh_buckets`-style sign-bucketing to keep candidate counts output-linear.
    Cosine is computed in double precision with a sequential fold (portable to
    the DuckDB oracle).
    """
    from iceberg_evolve_spark.functions.similarity import cosine_sim

    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    pairs = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
    sim = cosine_sim(F.col("v_a"), F.col("v_b"))
    return (
        pairs.withColumn("cosine", sim)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
