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


def unpersist_intermediates(df: DataFrame) -> int:
    """Release cached subtrees pinned by the near-dup builders
    (:func:`ngram_jaccard_pairs`, :func:`minhash_lsh_pairs`,
    :func:`simhash_near_dups`).

    Those builders persist their expensive shared subtree (shingle index /
    signatures / fingerprints) because the returned lazy plan reads it more
    than once; Spark's cache manager pins such entries until explicitly
    unpersisted, so repeated calls in a long-lived session accumulate executor
    storage. Call this once the returned plan has been materialized
    (collected / written). Returns the number of cache entries released.
    """
    handles = getattr(df, "_persisted_intermediates", ())
    for h in handles:
        h.unpersist()
    return len(handles)


def _attach_intermediates(out: DataFrame, *handles: DataFrame) -> DataFrame:
    out._persisted_intermediates = handles
    return out

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


def word_windows(col: Column | str, k: int) -> Column:
    """ALL word k-grams of the lowercased text, position-preserving (a bag,
    not a set — unlike :func:`word_shingles` no ``array_distinct``): the unit
    of EXACT substring duplication detection, where every occurrence counts."""
    toks = tokens(col)
    n = F.size(toks)
    positions = F.when(
        n >= k, F.sequence(F.lit(1), n - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(positions, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))


def exact_substring_shared(
    df: DataFrame, id_col: str, text_col: str = "text", k: int = 10
) -> DataFrame:
    """Exact substring duplication per document (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", ACL 2022 — the suffix-array
    ExactSubstr dedup, re-expressed relationally): a document's token
    k-window is DUPLICATED if the identical k-token string occurs in some
    OTHER document. Returns ``(id, n_windows, n_shared)`` — the fraction
    ``n_shared / n_windows`` is the doc's duplicated-span rate, the signal
    used to cut boilerplate/licence/contaminated spans at corpus scale.

    Shape: explode all windows with the portable 60-bit hash (one narrow
    (id, h) relation), ONE aggregation per window hash computing its document
    frequency (map-side combined), then a semi-join-style count back onto the
    per-doc windows — two shuffles on the window hash, both partition-aligned,
    output one row per document. No pairwise comparison anywhere: cost is
    linear in corpus tokens at any scale (the suffix-array method's O(n log n)
    with a far simpler distributed story).
    """
    base = _ensure_parallelism(df).select(
        F.col(id_col).alias("_id"),
        F.explode(word_windows(F.col(text_col), k)).alias("w"),
    )
    wins = base.select("_id", hash60(F.col("w")).alias("h"))
    # document frequency per window hash (not occurrence count: a gram
    # repeated only WITHIN one doc is self-repetition, not duplication).
    docfreq = wins.groupBy("h").agg(F.count_distinct(F.col("_id")).alias("nd"))
    joined = wins.join(docfreq, "h")
    return (
        joined.groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum((F.col("nd") >= 2).cast("long")).alias("n_shared"),
        )
        .select(F.col("_id").alias(id_col), "n_windows", "n_shared")
    )


from iceberg_evolve_spark.functions.parallel import ensure_parallelism as _ensure_parallelism


def _shingle_index(
    df: DataFrame, id_col: str, text_col: str, k: int, max_df: int | None
) -> DataFrame:
    """Inverted index: one row per (doc, distinct shingle). Optionally drop
    shingles appearing in more than ``max_df`` docs (skew + noise control at
    scale: a stop-shingle shared by millions of docs would otherwise create a
    quadratic bucket)."""
    df = _ensure_parallelism(df)
    idx = df.select(
        F.col(id_col).alias("_id"),
        F.explode(word_shingles(text_col, k)).alias("sh"),
    )
    if max_df is not None:
        # Broadcast the FREQUENT side, never the kept side: the stop-shingle
        # set (df > max_df) is a handful of hyper-common n-grams by
        # construction, while the kept side is nearly the whole shingle
        # vocabulary — billions of rows at corpus scale, an OOM if broadcast.
        # left_anti against the small complement is the scale-safe shape.
        stop = (
            idx.groupBy("sh")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .select("sh")
        )
        idx = idx.join(F.broadcast(stop), "sh", "left_anti")
    return idx


def shingle_index(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """Public inverted shingle index: one row per (``_id``, distinct shingle),
    optionally stop-shingle-capped (see :func:`_shingle_index`). The building
    block for the n-gram pair family and for n-gram decontamination."""
    return _shingle_index(df, id_col, text_col, k, max_df)


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


def _bucket_pairs(ids: Column) -> Column:
    """All ordered pairs (a < b) from a sorted id array — the candidate-pair
    generator for inverted-index buckets. Stays inside codegen (nested
    ``transform`` + ``flatten``)."""
    n = F.size(ids)
    return F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, n),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )


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
    idx = _shingle_index(df, id_col, text_col, k, max_df).persist()
    sizes = idx.groupBy("_id").agg(F.count("*").alias("n_sh"))

    # Bucket pairing instead of a raw self-join: one shuffle on the shingle,
    # pairs generated inside each (tiny, max_df-bounded) bucket — the shingle
    # index subtree is evaluated once, not once per join side.
    common = (
        idx.groupBy("sh")
        .agg(F.sort_array(F.collect_list("_id")).alias("ids"))
        .select(F.explode(_bucket_pairs(F.col("ids"))).alias("p"))
        .select(F.col("p.id_a"), F.col("p.id_b"))
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
    return _attach_intermediates(out, idx)


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Directional near-subset detection: ``containment(A→B) = |sh_A ∩ sh_B|
    / |sh_A|``. A short document pasted inside a longer one scores high
    containment but LOW Jaccard (the union is dominated by the long doc), so
    symmetric dedup misses it — this is the operator that catches quote-
    expansion and template-wrapping duplication.

    Same single-shuffle inverted-index shape as :func:`ngram_jaccard_pairs`
    (one shingle shuffle, bucket pairing in codegen, ``max_df`` skew cap);
    each unordered candidate pair emits up to two directed rows
    (src contained-in dst). Output: (src_id, dst_id, containment).
    """
    idx = _shingle_index(df, id_col, text_col, k, max_df).persist()
    sizes = idx.groupBy("_id").agg(F.count("*").alias("n_sh"))
    common = (
        idx.groupBy("sh")
        .agg(F.sort_array(F.collect_list("_id")).alias("ids"))
        .select(F.explode(_bucket_pairs(F.col("ids"))).alias("p"))
        .select(F.col("p.id_a"), F.col("p.id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    both = common.join(
        sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a"
    ).join(sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
    directed = both.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("src_id"),
                    F.col("id_b").alias("dst_id"),
                    (F.col("n_common") / F.col("n_a")).cast("double").alias("containment"),
                ),
                F.struct(
                    F.col("id_b").alias("src_id"),
                    F.col("id_a").alias("dst_id"),
                    (F.col("n_common") / F.col("n_b")).cast("double").alias("containment"),
                ),
            )
        ).alias("d")
    ).select("d.src_id", "d.dst_id", "d.containment")
    out = directed.filter(F.col("containment") >= threshold)
    return _attach_intermediates(out, idx)


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


def _banded(sig: DataFrame, id_col: str, bands: int, r: int) -> DataFrame:
    """Explode a signature table into (``_id``, band, band-hash) bucket keys —
    shared by the self-pairing path (:func:`minhash_lsh_pairs`) and the
    incremental probe path (:func:`minhash_lsh_probe`)."""
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",", *[F.col("sig")[b * r + j].cast("string") for j in range(r)]
                    )
                ).alias("bhash"),
            )
            for b in range(bands)
        ]
    )
    return (
        sig.select(F.col(id_col).alias("_id"), F.explode(band_structs).alias("bd"))
        .select("_id", F.col("bd.band").alias("band"), F.col("bd.bhash").alias("bhash"))
    )


def _sig_agreement(num_hashes: int) -> Column:
    """Fraction of agreeing positions between ``sig_a`` and ``sig_b``."""
    agree = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda eq: eq,
        )
    )
    return (agree / F.lit(num_hashes)).cast("double")


def minhash_lsh_probe(
    corpus_sig: DataFrame,
    batch_sig: DataFrame,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Incremental near-dup detection: probe a NEW batch of signatures against
    the EXISTING corpus index — the production shape of streaming dedup, where
    the corpus LSH buckets are built once (and persisted) and every arriving
    batch costs only its own bucket join, never a corpus self-join.

    Both inputs are signature tables as produced by
    :func:`minhash_signatures` (``(id, sig array<bigint>)``). The probe is one
    shuffle join on (band, band-hash): corpus buckets on one side, the batch's
    bucket keys on the other — candidate volume is output-linear in batch
    size. Pairs are then verified by exact signature agreement (estimated
    Jaccard ≥ ``threshold``). Output: (new_id, corpus_id, est_jaccard).
    """
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands
    # Each side is read twice (band bucketing + the verification join below);
    # persist so a caller passing an unpersisted signature PIPELINE doesn't
    # recompute the full minhash stage per read. Handles are attached for
    # release via unpersist_intermediates, same as minhash_lsh_pairs.
    corpus_sig = corpus_sig.persist()
    batch_sig = batch_sig.persist()
    cb = _banded(corpus_sig, id_col, bands, r)
    nb = _banded(batch_sig, id_col, bands, r)
    cand = (
        nb.select(F.col("_id").alias("new_id"), "band", "bhash")
        .join(cb.select(F.col("_id").alias("corpus_id"), "band", "bhash"), ["band", "bhash"])
        .select("new_id", "corpus_id")
        .dropDuplicates(["new_id", "corpus_id"])
    )
    sa = batch_sig.select(F.col(id_col).alias("new_id"), F.col("sig").alias("sig_a"))
    sb = corpus_sig.select(F.col(id_col).alias("corpus_id"), F.col("sig").alias("sig_b"))
    out = (
        cand.join(sa, "new_id")
        .join(sb, "corpus_id")
        .withColumn("est_jaccard", _sig_agreement(num_hashes))
        .filter(F.col("est_jaccard") >= threshold)
        .select("new_id", "corpus_id", "est_jaccard")
    )
    return _attach_intermediates(out, corpus_sig, batch_sig)


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
    # The signature aggregation is the expensive subtree — persist it so band
    # bucketing and pair verification both reuse it instead of recomputing.
    sig = minhash_signatures(df, id_col, text_col, num_hashes, k, max_df).persist()

    banded = _banded(sig, id_col, bands, r)

    # Bucket pairing on (band, bhash): one shuffle, pairs emitted inside buckets.
    cand = (
        banded.groupBy("band", "bhash")
        .agg(F.sort_array(F.collect_list("_id")).alias("ids"))
        .select(F.explode(_bucket_pairs(F.col("ids"))).alias("p"))
        .select(F.col("p.id_a"), F.col("p.id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sa = sig.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    cand = cand.join(sa, "id_a").join(sb, "id_b")
    out = (
        cand.withColumn("est_jaccard", _sig_agreement(num_hashes))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )
    return _attach_intermediates(out, sig)


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
    tok = _ensure_parallelism(df).select(
        F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("t")
    )
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
    sh = simhash(df, id_col, text_col, bits).persist()
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
    ch = sh.select(F.col(id_col).alias("_id"), F.explode(chunk_arr).alias("ck"))
    ch = ch.select("_id", F.col("ck.c").alias("c"), F.col("ck.v").alias("v"))
    cand = (
        ch.groupBy("c", "v")
        .agg(F.sort_array(F.collect_list("_id")).alias("ids"))
        .select(F.explode(_bucket_pairs(F.col("ids"))).alias("p"))
        .select(F.col("p.id_a"), F.col("p.id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    fa = sh.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("fp_a"))
    fb = sh.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("fp_b"))
    cand = cand.join(fa, "id_a").join(fb, "id_b")
    hamming = F.bit_count(F.expr("fp_a ^ fp_b"))
    out = (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    return _attach_intermediates(out, sh)


# ---------------------------------------------------------------------------
# Embedding near-dup
# ---------------------------------------------------------------------------


_PAIR_SCHEMA = "id_a long, id_b long, cosine double"


def _normalized_matrix(pdf, id_col: str, vec_col: str):
    """ids (int64) + row-L2-normalized float64 matrix from a pandas frame."""
    import numpy as np

    ids = pdf[id_col].to_numpy(dtype="int64")
    mat = np.array(list(pdf[vec_col]), dtype="float64")
    if mat.ndim != 2:  # zero rows
        mat = mat.reshape(0, 0)
    norms = np.linalg.norm(mat, axis=1) if len(mat) else np.ones(0)
    norms = np.where(norms == 0, 1.0, norms)
    return ids, mat / norms[:, None]


def _pairs_frame(ids_l, mat_l, ids_r, mat_r, threshold, within: bool):
    """Thresholded cosine pairs between two normalized blocks as a pandas frame.

    ``within=True`` means both blocks are the same set (emit the strict upper
    triangle); otherwise every (left, right) combination is a distinct pair.
    Output ids are ordered ``id_a < id_b`` in both cases.
    """
    import numpy as np
    import pandas as pd

    if len(ids_l) == 0 or len(ids_r) == 0:
        return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
            {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
        )
    sims = mat_l @ mat_r.T
    mask = sims >= threshold
    if within:
        mask &= ids_l[:, None] < ids_r[None, :]
    li, ri = np.nonzero(mask)
    a, b = ids_l[li], ids_r[ri]
    return pd.DataFrame(
        {"id_a": np.minimum(a, b), "id_b": np.maximum(a, b), "cosine": sims[li, ri]}
    )


def embedding_near_dups(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    threshold: float = 0.95,
    blocks: int = 8,
    strategy: str = "tiled",
    broadcast_limit: int = 100_000,
) -> DataFrame:
    """EXACT pairs of rows whose embedding cosine similarity >= threshold.

    ``strategy='tiled'`` (default, the 100 TB path): hash each row into one of
    ``blocks`` blocks, replicate it to the ``blocks`` block-pair groups (i, j)
    it participates in, and run one BLAS matmul per group via grouped
    ``applyInPandas``. Every unordered pair lands in exactly one group, so the
    result is exact; no row ever reaches the driver, and per-task memory is two
    blocks (2·n/blocks rows) regardless of corpus size — size ``blocks`` so a
    block fits an executor. Shuffle volume is n·blocks vector rows; the O(n²·d)
    FLOPs inherent to exact all-pairs run as vectorized C inside each group.

    ``strategy='broadcast'`` is the small-corpus fast path (single broadcast of
    the collected corpus, one map stage, no shuffle) and refuses corpora larger
    than ``broadcast_limit`` rows. ``strategy='auto'`` picks by a count.

    For approximate-but-output-linear candidate generation at extreme scale see
    :func:`embedding_near_dups_lsh`.
    """
    if strategy == "auto":
        strategy = "broadcast" if df.count() <= broadcast_limit else "tiled"
    if strategy == "broadcast":
        return _embedding_near_dups_broadcast(
            df, id_col, vec_col, threshold, broadcast_limit
        )
    if strategy != "tiled":
        raise ValueError(f"unknown strategy {strategy!r}")

    B = blocks
    blk = F.pmod(F.xxhash64(F.col("_id")), F.lit(B)).cast("int")
    # Group keys this row participates in: (min(b, o), max(b, o)) for every
    # other block o — B keys, each unordered block pair exactly once.
    keys = F.transform(
        F.sequence(F.lit(0), F.lit(B - 1)),
        lambda o: F.struct(
            F.least(F.col("_blk"), o).alias("i"),
            F.greatest(F.col("_blk"), o).alias("j"),
        ),
    )
    exploded = (
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"))
        .withColumn("_blk", blk)
        .withColumn("_g", F.explode(keys))
        .select("_id", "_vec", "_blk", F.col("_g.i").alias("_gi"), F.col("_g.j").alias("_gj"))
    )

    threshold_ = threshold

    def per_group(key, pdf):
        i, j = key
        if i == j:
            ids, mat = _normalized_matrix(pdf, "_id", "_vec")
            return _pairs_frame(ids, mat, ids, mat, threshold_, within=True)
        left = pdf[pdf["_blk"] == i]
        right = pdf[pdf["_blk"] == j]
        ids_l, mat_l = _normalized_matrix(left, "_id", "_vec")
        ids_r, mat_r = _normalized_matrix(right, "_id", "_vec")
        return _pairs_frame(ids_l, mat_l, ids_r, mat_r, threshold_, within=False)

    return exploded.groupBy("_gi", "_gj").applyInPandas(per_group, schema=_PAIR_SCHEMA)


def _embedding_near_dups_broadcast(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    broadcast_limit: int,
) -> DataFrame:
    """Small-corpus fast path: broadcast the whole corpus, one map stage.

    Collects ids + vectors to the driver — guarded by ``broadcast_limit`` so it
    cannot silently become a driver OOM at scale (use the tiled strategy there).
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    rows = df.select(id_col, vec_col).limit(broadcast_limit + 1).collect()
    if len(rows) > broadcast_limit:
        raise ValueError(
            f"corpus exceeds broadcast_limit={broadcast_limit}; use strategy='tiled'"
        )
    ids = np.array([r[0] for r in rows], dtype="int64")
    mat = np.array([r[1] for r in rows], dtype="float64")
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    spark = df.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat / norms[:, None])

    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def block(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rid, rmat = b_ids.value, b_mat.value
        for pdf in batches:
            lids, lmat = _normalized_matrix(pdf, id_col, vec_col)
            sims = lmat @ rmat.T
            li, ri = np.nonzero((sims >= threshold) & (lids[:, None] < rid[None, :]))
            yield pd.DataFrame(
                {"id_a": lids[li], "id_b": rid[ri], "cosine": sims[li, ri]}
            )

    return df.select(id_col, vec_col).mapInPandas(block, schema=out_schema)


def embedding_near_dups_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    dims: int | None = None,
    threshold: float = 0.95,
    n_planes: int = 4,
    n_tables: int = 4,
) -> DataFrame:
    """APPROXIMATE cosine near-dup pairs, output-linear at any scale.

    Candidate pairs are generated only inside sign-LSH buckets
    (:func:`iceberg_evolve_spark.functions.similarity.lsh_bucket`), with
    ``n_tables`` independent hyperplane sets to recover recall (a pair is a
    candidate if it collides in ANY table). Per (table, bucket) group the same
    BLAS kernel verifies exact cosine, and duplicates across tables are dropped.
    Unlike the exact tiled strategy this never compares vectors in different
    buckets — work is Σ bucket² instead of n², the classic LSH trade: recall
    (tested against the exact path) for a corpus-size-independent guarantee.
    """
    if dims is None:
        from pyspark.sql import types as T

        field = df.schema[vec_col]
        if not isinstance(field.dataType, T.ArrayType):
            raise ValueError(f"{vec_col} must be an array column")
        dims_row = df.select(F.size(vec_col).alias("d")).limit(1).collect()
        dims = int(dims_row[0]["d"]) if dims_row else 0

    from iceberg_evolve_spark.functions.similarity import lsh_bucket

    tables = F.array(
        *[
            F.struct(
                F.lit(t).alias("t"),
                lsh_bucket(F.col("_vec"), dims, n_planes, seed=f"nd{t}").alias("b"),
            )
            for t in range(n_tables)
        ]
    )
    exploded = (
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"))
        .withColumn("_tb", F.explode(tables))
        .select("_id", "_vec", F.col("_tb.t").alias("_t"), F.col("_tb.b").alias("_b"))
    )

    threshold_ = threshold

    def per_bucket(key, pdf):
        ids, mat = _normalized_matrix(pdf, "_id", "_vec")
        return _pairs_frame(ids, mat, ids, mat, threshold_, within=True)

    pairs = exploded.groupBy("_t", "_b").applyInPandas(per_bucket, schema=_PAIR_SCHEMA)
    # A pair colliding in several tables is emitted once per collision — keep one.
    w = Window.partitionBy("id_a", "id_b").orderBy(F.col("cosine").desc())
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup: cluster-then-prune)
# ---------------------------------------------------------------------------


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_centroids: int = 16,
    seed: str = "semdedup",
) -> DataFrame:
    """SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at web-scale
    through semantic deduplication", arXiv:2303.09540): assign every embedding
    to its nearest coarse centroid, then prune near-duplicates *within each
    cluster only* — a document is dropped when a lower-id document in the same
    cell has cosine similarity >= ``threshold``.

    Output per input row: ``(id, cell, max_sim_prior, keep)`` where
    ``max_sim_prior`` is the rounded max cosine to any lower-id cell-mate
    (-1.0 when the row is its cell's lowest id) and ``keep`` is the survival
    verdict. Cross-cell duplicates are deliberately not compared — that is the
    SemDeDup approximation that turns exact O(n²) all-pairs into
    O(Σ cell²).

    Scale shape: centroid pick is deterministic md5-ordered sampling
    (:func:`~iceberg_evolve_spark.functions.similarity.sample_centroids` — a
    KB-scale collect, engine-replayable, unlike KMeans), assignment is a pure
    Catalyst projection over literal centroids, and the prune is ONE shuffle
    on the cell key into a grouped Arrow BLAS kernel. Per-task memory is one
    cell's matrix: at 100 TB you size ``n_centroids`` so a cell fits an
    executor (SemDeDup itself runs k=50k clusters for LAION-scale corpora);
    cells are roughly balanced for non-degenerate corpora because centroids
    are in-distribution samples.
    """
    import numpy as np
    import pandas as pd

    from iceberg_evolve_spark.functions.similarity import assign_cell, sample_centroids

    df = _ensure_parallelism(df)
    centroids = sample_centroids(df, id_col, vec_col, n_centroids, seed)
    cells = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        assign_cell(F.col(vec_col), centroids).alias("_cell"),
    )
    threshold_ = threshold

    def per_cell(key, pdf):
        ids, mat = _normalized_matrix(pdf, "_id", "_vec")
        if len(ids) == 0:
            return pd.DataFrame({"id": [], "cell": [], "raw": []}).astype(
                {"id": "int64", "cell": "int32", "raw": "float64"}
            )
        sims = mat @ mat.T
        prior = ids[None, :] < ids[:, None]  # [i, j]: j is a lower-id cell-mate of i
        masked = np.where(prior, sims, -np.inf)
        best = masked.max(axis=1)
        best = np.where(np.isneginf(best), -1.0, best)
        return pd.DataFrame(
            {"id": ids, "cell": np.full(len(ids), key[0], dtype="int32"), "raw": best}
        )

    out = cells.groupBy("_cell").applyInPandas(
        per_cell, schema="id long, cell int, raw double"
    )
    # Round + verdict in Spark expressions (HALF_UP, matching the oracle's SQL
    # ROUND) — numpy's round is half-to-even, a latent boundary mismatch.
    sim = F.round(F.col("raw"), 6)
    return out.select(
        F.col("id").alias(id_col),
        "cell",
        sim.alias("max_sim_prior"),
        (sim < F.lit(threshold_)).alias("keep"),
    )
