"""Similarity search over embedding columns (``array<float>``).

Baseline: exact brute-force cosine top-k — a single narrow map + distributed
TopK (Spark's ``TakeOrderedAndProject``), no shuffle of the corpus. Scale paths:

* :func:`topk_ivf` — IVF-style two-stage search: KMeans-partition the corpus once
  (MLlib, Catalyst-external but offline), then probe only the ``n_probe`` nearest
  cells. At 100 TB the cell assignment becomes the table's physical partition key
  so a probe prunes partitions at the parquet/Iceberg scan.
* :func:`lsh_bucket` — deterministic random-hyperplane sign buckets (hash-derived
  hyperplanes, no stored model) for join-style candidate generation.

All cosine math is double-precision sequential folds over the array — exactly
reproducible by the DuckDB oracle (``list_`` lambdas).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from iceberg_evolve_spark.functions.hashing import hash60


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a sequential double fold (portable summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_sim(a: Column, b: Column) -> Column:
    return (dot(a, b) / (norm(a) * norm(b))).cast("double")


def topk_brute_force(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact top-k by cosine against a constant query vector.

    The query is a literal array → the whole computation is one projection;
    ``ORDER BY ... LIMIT k`` compiles to TakeOrderedAndProject (per-partition
    heaps + driver merge — no global sort shuffle). Ties broken by id for
    determinism. Output: (id, cosine) — ``round_digits`` rounds the score so
    cross-engine float comparison is stable.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_sim(F.col(vec_col), q)
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        df.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def lsh_bucket(
    vec_col: Column, dims: int, n_planes: int = 8, seed: str = "hp"
) -> Column:
    """Sign-bucket id from ``n_planes`` deterministic pseudo-random hyperplanes.

    Hyperplane components are derived from the portable hash —
    ``hp[p][d] = (hash60('<seed>|p|d') % 2001 - 1000) / 1000`` ∈ [-1, 1] — so no
    model object needs storing/broadcasting, any engine can recompute them, and
    the bucket id of a vector is stable across runs and engines. Bucket id packs
    the sign bits: Σ (dot(v, hp_p) > 0) << p.
    """
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = F.array(
            *[
                (
                    (hash60(F.lit(f"{seed}|{p}|{d}")) % 2001 - 1000) / F.lit(1000.0)
                ).cast("double")
                for d in range(dims)
            ]
        )
        bit = F.when(dot(vec_col, plane) > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket.cast("int")


def topk_lsh(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    round_digits: int | None = 6,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's sign-bucket.

    At scale the bucket id is a stored/partitioned column, so this prunes the
    scan to ~1/2^n_planes of the corpus; here it is computed on the fly. Recall
    is tested against :func:`topk_brute_force` in the test suite.
    """
    dims = len(query_vec)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    bucketed = df.withColumn("_bucket", lsh_bucket(F.col(vec_col), dims, n_planes))
    # the query's bucket is a driver-side constant expression: evaluate via a 1-row df
    qb = (
        df.sparkSession.range(1)
        .select(lsh_bucket(q, dims, n_planes).alias("b"))
        .collect()[0]["b"]
    )
    sim = cosine_sim(F.col(vec_col), q)
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        bucketed.filter(F.col("_bucket") == qb)
        .select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def topk_ivf(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    round_digits: int | None = 6,
    max_iter: int = 8,
) -> DataFrame:
    """IVF-style approximate top-k: KMeans-cluster the corpus, search only the
    ``n_probe`` cells nearest the query.

    The clustering pass is offline/amortized (at 100 TB: persist ``_cell`` as a
    partition column; the probe then becomes partition pruning at the scan).
    ``max_iter`` is capped low on purpose: an ANN coarse quantizer needs
    roughly-balanced cells, not converged centroids — extra iterations buy
    recall nothing. Falls back gracefully: probing all cells == exact search.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    import numpy as np

    from iceberg_evolve_spark.functions.dedup import _ensure_parallelism

    df = _ensure_parallelism(df)
    vecs = df.select(
        F.col(id_col), array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(
        k=n_centroids, seed=seed, featuresCol="features", maxIter=max_iter
    ).fit(vecs)
    assigned = model.transform(vecs).select(id_col, F.col("prediction").alias("_cell"))

    q = np.asarray(query_vec, dtype="float64")
    centers = model.clusterCenters()

    def cell_dist(c):
        return float(np.linalg.norm(np.asarray(c) - q))

    probe = sorted(range(len(centers)), key=lambda i: cell_dist(centers[i]))[:n_probe]

    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_sim(F.col(vec_col), qcol)
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        df.join(assigned, id_col)
        .filter(F.col("_cell").isin(probe))
        .select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )
