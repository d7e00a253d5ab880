"""Embedding-vector preprocessing: int8 scalar quantization and norms.

At 100 TB the embedding column dominates storage and shuffle width: a 1024-dim
float32 vector is 4 KiB/row, so a quantized int8 copy (1 KiB + one double
scale) cuts ANN scan and shuffle bytes 4× with a bounded reconstruction error
of ``scale/2`` per component. This is the standard serving layout (FAISS
``SQ8``); the IVF index in :mod:`.similarity` can store quantized vectors per
cell and re-rank the top candidates against the float originals.

Everything here is elementwise column arithmetic — project + ``posexplode``
only, no shuffle, no UDFs — and every operation is a single IEEE-double op so
the DuckDB oracle reproduces results bit-for-bit:

- ``m = max_i |v_i|`` (float32 max is order-independent; float→double exact)
- ``scale = m / 127.0`` (one double division)
- ``q_i = clamp(floor(v_i / scale + 0.5), -127, 127)`` ("round half toward
  +inf" — identical op sequence in both engines, no half-even tie ambiguity)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Symmetric int8 range. 127 (not 128) so the negative crest is representable.
Q_MAX = 127


def _abs_max(vec: Column) -> Column:
    return F.array_max(F.transform(vec, lambda x: F.abs(x))).cast("double")


def quantize_int8_exploded(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-component int8 quantization in exploded (id, dim_idx, q, scale) form.

    The exploded layout exists for bit-exact cross-engine comparison; use
    :func:`quantize_int8` for the packed array form a table would store.
    All-zero vectors get scale 0.0 and q == 0 everywhere.
    """
    scale = _abs_max(F.col(vec_col)) / F.lit(127.0)
    out = df.select(
        F.col(id_col).alias("vec_id"),
        scale.alias("scale"),
        F.posexplode(vec_col).alias("dim_idx", "v"),
    )
    q = F.when(F.col("scale") == 0.0, F.lit(0)).otherwise(
        F.greatest(
            F.lit(-Q_MAX),
            F.least(
                F.lit(Q_MAX),
                F.floor(F.col("v").cast("double") / F.col("scale") + F.lit(0.5)).cast("int"),
            ),
        )
    )
    return out.select(
        "vec_id",
        "dim_idx",
        q.cast("int").alias("q"),
        "scale",
    )


def quantize_int8_cols(vec_col: Column) -> tuple[Column, Column]:
    """``(q array<tinyint>, scale double)`` as plain column expressions, for
    adding the quantized copy INLINE to an existing projection (the IVF build
    does this — a join back onto the corpus would shuffle for no reason).
    Identical arithmetic to :func:`quantize_int8`."""
    scale = _abs_max(vec_col) / F.lit(127.0)
    q = F.when(
        scale == 0.0, F.transform(vec_col, lambda x: F.lit(0).cast("tinyint"))
    ).otherwise(
        F.transform(
            vec_col,
            lambda x: F.greatest(
                F.lit(-Q_MAX),
                F.least(F.lit(Q_MAX), F.floor(x.cast("double") / scale + F.lit(0.5))),
            ).cast("tinyint"),
        )
    )
    return q, scale


def quantize_int8(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Packed form: (id, q array<tinyint>, scale double). One projection."""
    q, scale = quantize_int8_cols(F.col(vec_col))
    return df.select(
        F.col(id_col).alias("vec_id"), q.alias("q"), scale.alias("scale")
    )


def dequantize(df: DataFrame, q_col: str = "q", scale_col: str = "scale") -> DataFrame:
    """Reconstruct approximate float components: v̂_i = q_i * scale."""
    return df.withColumn(
        "v_hat", F.transform(q_col, lambda x: x.cast("double") * F.col(scale_col))
    )


def projection_component(seed: str, out_dim: int, in_dim: int) -> float:
    """Deterministic projection-matrix entry in [-1, 1] — same md5 derivation
    as :func:`..similarity.hyperplane_component`, so any engine can rebuild
    the matrix bit-for-bit (no stored model, no broadcast)."""
    import hashlib

    h = int(hashlib.md5(f"{seed}|{out_dim}|{in_dim}".encode()).hexdigest()[:15], 16)
    return (h % 2001 - 1000) / 1000.0


def random_projection(
    df: DataFrame,
    in_dims: int,
    out_dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "rp",
) -> DataFrame:
    """Johnson–Lindenstrauss-style dimensionality reduction with a
    hash-derived LITERAL matrix: ``y_j = Σ_i v_i · R[j][i]``.

    The matrix is materialized as double literals at plan-build time (the
    same discipline as the LSH hyperplanes — per-row hash expressions would
    dominate the scan), each output component is one fixed-order
    multiply-add chain, and the whole operator is a single narrow projection:
    no shuffle, no model object, reproducible on any engine. Use it to shrink
    embedding width before expensive all-pairs stages (the blocked-tiling
    near-dup or brute-force ANN cost scales linearly in dims).

    Output: (id, y array<double> of length ``out_dims``).
    """
    # Literal ARRAYS + a sequential aggregate fold, not an unrolled 512-term
    # "+" chain: the unrolled form made Catalyst analysis/codegen the dominant
    # cost (seconds per plan). The fold keeps the identical left-to-right
    # association — ((0 + t_0) + t_1) + … — so values are bit-unchanged.
    comps = []
    for j in range(out_dims):
        plane = F.array(
            *[F.lit(projection_component(seed, j, i)) for i in range(in_dims)]
        )
        y = F.aggregate(
            F.zip_with(
                F.col(vec_col), plane, lambda x, r: x.cast("double") * r
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        comps.append(y.alias(f"_y{j}"))
    out = df.select(F.col(id_col).alias("vec_id"), *comps)
    return out.select(
        "vec_id", F.array(*[F.col(f"_y{j}") for j in range(out_dims)]).alias("y")
    )


def binary_quantize(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    lo_col: str = "bq_lo",
    hi_col: str = "bq_hi",
) -> DataFrame:
    """Binary quantization: a d-dim float vector becomes d SIGN BITS
    (bit i set ⇔ component i ≥ 0) — a 32× storage/bandwidth cut, and
    similarity becomes ``popcount(xor)`` (Hamming distance), pure integer
    ops with no float anywhere. This is the BQ serving mode of production
    vector stores: scan the codes, Hamming-rank, exact-rerank survivors.

    Codes pack into 32-bit WORDS (``lo`` = components 0..31, ``hi`` =
    32..63): a single 64-bit word would need ``1 << 63``, which overflows
    signed BIGINT in the oracle engine — and the per-32-dim word layout is
    exactly how wider embeddings (128/256-d) pack anyway. Both words are
    plain integer folds in codegen; the oracle replays the identical bit
    arithmetic."""
    if dim > 64:
        raise ValueError("dim > 64 needs more words; pack per 32 dims")
    c = F.col(vec_col)

    def word(start: int, n: int):
        # Horner form (high bit first: acc·2 + bit) — shiftleft() takes only
        # a LITERAL bit count, so a per-element shift can't be expressed;
        # the fold is the same integer, one multiply+add per element.
        return F.aggregate(
            F.sequence(F.lit(start + n), F.lit(start + 1), F.lit(-1)),
            F.lit(0).cast("long"),
            lambda acc, i: acc * F.lit(2).cast("long")
            + F.when(F.element_at(c, i.cast("int")) >= 0, F.lit(1).cast("long"))
            .otherwise(F.lit(0).cast("long")),
        )

    n_lo = min(dim, 32)
    out = df.withColumn(lo_col, word(0, n_lo))
    n_hi = dim - n_lo
    return out.withColumn(
        hi_col, word(32, n_hi) if n_hi > 0 else F.lit(0).cast("long")
    )


def hamming_topk(
    df: DataFrame,
    query_lo: int,
    query_hi: int,
    k: int = 10,
    lo_col: str = "bq_lo",
    hi_col: str = "bq_hi",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by Hamming distance to a literal query code:
    ``bit_count(lo XOR q_lo) + bit_count(hi XOR q_hi)`` is one codegen'd
    integer expression per row; ``ORDER BY … LIMIT k`` compiles to
    TakeOrderedAndProject (per-partition heaps, no global sort). Ties
    break on id for determinism."""
    dist = F.bit_count(
        F.col(lo_col).bitwiseXOR(F.lit(int(query_lo)).cast("long"))
    ) + F.bit_count(
        F.col(hi_col).bitwiseXOR(F.lit(int(query_hi)).cast("long"))
    )
    return (
        df.select(F.col(id_col), dist.cast("int").alias("hamming"))
        .orderBy(F.col("hamming").asc(), F.col(id_col).asc())
        .limit(k)
    )
