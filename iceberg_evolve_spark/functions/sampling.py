"""Deterministic, reproducible sampling for training-data pipelines.

``df.sample()`` is seed-dependent *per partition layout* — re-partition the
input and the sample changes, and no other engine can reproduce it. For
pipeline work (hold-out splits, decontamination, A/B corpus cuts) you want
content-addressed sampling: membership decided by a hash of a stable key, so

* the same row set is selected on every engine, at every parallelism,
* re-running on appended data keeps the prior selection stable,
* the filter is a cheap per-row predicate — no shuffle, no state, and it
  composes with partition pruning and predicate pushdown.

All samplers use the portable 60-bit hash (engine-checkable in DuckDB).
Thresholds are exact integers (``floor(fraction · 2^60)``) so membership is an
integer comparison — no float boundary ambiguity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from iceberg_evolve_spark.functions.hashing import SEP, hash60, hash60_sql

TWO60_INT = 1 << 60


def _threshold(fraction: float) -> int:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return int(fraction * TWO60_INT)


def _keyed(key: Column | str, salt: str) -> Column:
    c = F.col(key) if isinstance(key, str) else key
    c = c.cast("string")
    return F.concat(c, F.lit(f"{SEP}{salt}")) if salt else c


def hash_sample(
    df: DataFrame, key: Column | str, fraction: float, salt: str = ""
) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows with hash(key) below the
    integer threshold. ``salt`` derives independent samples from the same key
    (e.g. train/validation splits that must not correlate)."""
    return df.filter(hash60(_keyed(key, salt)) < F.lit(_threshold(fraction)))


def stratified_hash_sample(
    df: DataFrame,
    strata: Column | str,
    key: Column | str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample common languages,
    keep all rare ones). ``fractions`` maps stratum value → fraction; strata
    not listed get ``default_fraction``. One map lookup + one integer compare
    per row — still no shuffle."""
    s = F.col(strata) if isinstance(strata, str) else strata
    thr: Column = F.lit(_threshold(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(s == value, F.lit(_threshold(frac))).otherwise(thr)
    return df.filter(hash60(_keyed(key, salt)) < thr)


def smallest_k_sample(df: DataFrame, key: Column | str, k: int, salt: str = "") -> DataFrame:
    """Deterministic uniform k-subset without replacement: the k rows with the
    smallest keyed hashes. Executes as TakeOrderedAndProject — per-partition
    top-k, merged on the driver; no global sort."""
    return df.withColumn("_sk", hash60(_keyed(key, salt))).orderBy("_sk").limit(k).drop("_sk")


def priority_sample(
    df: DataFrame,
    key: Column | str,
    weight_col: Column | str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Weighted priority sampling (Duffield, Lund & Thorup, "Priority
    sampling for estimation of arbitrary subset sums", JACM 2007): each row
    gets priority ``w / u`` with ``u`` uniform from the content-addressed
    hash; the sample is the top ``k`` priorities. Heavy rows enter with
    probability ~min(1, w/τ), and the DLT estimator ``Σ max(w_i, τ)`` over
    the sample (τ = the (k+1)-th priority) is an UNBIASED estimate of the
    total weight — subset sums of a 100 TB fact table from a k-row sample.

    Determinism (the property the built-in ``sample()``/rand() can't give):
    ``u = (hash+1)/2^60``, and the priority is computed as the single-rounded
    ``(w·2^60)/(hash+1)`` — multiplication and division of deterministic
    doubles, identical in every IEEE engine — so the sample, τ, and the
    estimate replay bit-for-bit cross-engine and across partitionings. The
    top-(k+1) runs as TakeOrderedAndProject (per-partition top-k, merged on
    the driver; no global sort). Adds ``_priority``; returns k+1 rows — the
    last carries τ for the estimator (see the entry for the composed form).
    """
    c = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    h = hash60(_keyed(key, salt))
    pr = (c.cast("double") * F.lit(float(TWO60_INT))) / (h + 1).cast("double")
    return (
        df.withColumn("_priority", pr)
        .orderBy(F.col("_priority").desc(), F.col(key) if isinstance(key, str) else key)
        .limit(k + 1)
    )


def hash_sample_sql(key_expr: str, fraction: float, salt: str = "") -> str:
    """DuckDB predicate selecting the identical rows."""
    e = f"CAST({key_expr} AS VARCHAR)"
    if salt:
        e = f"{e} || '{SEP}{salt}'"
    return f"{hash60_sql(e)} < {_threshold(fraction)}"


def domain_mixture_sample(
    df: DataFrame,
    domain: str,
    key: Column | str,
    weights: dict[str, float],
    salt: str = "",
    size_col: str | None = None,
) -> DataFrame:
    """Resample a corpus toward a target domain mixture (the data-mixing step
    of training-set construction: "40% web, 30% code, ...").

    Domains absent from ``weights`` are dropped. The sample keeps every listed
    domain's rows at the largest feasible scale ``s = min_d(n_d / w_d)`` — the
    domain that binds keeps ALL its rows and the over-represented ones are
    hash-downsampled to ``s·w_d`` expected rows, so the output composition
    matches ``weights`` up to binomial noise while no row is upsampled.

    ``size_col`` switches the budget unit: domain masses ``n_d`` become
    ``Σ size_col`` instead of row counts, so the mixture targets (for a
    token-count column) TOKEN shares — what an LLM data recipe actually
    specifies — while selection stays whole-doc and content-addressed. Keep
    probability is still per-row, so achieved token shares match the target
    in expectation (doc-length variance is reported, not hidden, by the
    `docs_token_budget_mixture` entry).

    Selection is content-addressed (portable hash threshold), so the row set
    is engine- and parallelism-independent. Scale shape: one map-side-combined
    count/sum per domain (output is |domains| rows), thresholds derived on
    that tiny relation and broadcast back; the corpus itself is touched by
    exactly one narrow filter — no corpus shuffle.
    """
    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be a non-empty map of positive weights")
    w_col: Column = F.lit(None).cast("double")
    for value, w in sorted(weights.items()):
        w_col = F.when(F.col(domain) == value, F.lit(float(w))).otherwise(w_col)
    mass = F.sum(size_col) if size_col else F.count(F.lit(1))
    counts = (
        df.groupBy(domain)
        .agg(mass.cast("double").alias("_n"))
        .withColumn("_w", w_col)
        .filter(F.col("_w").isNotNull())
        # a weighted domain with zero/NULL mass (all-empty docs under a
        # size_col) has nothing to keep — it must not drive the global
        # scale s = min(n/w) to 0 and silently empty EVERY domain's sample
        .filter(F.col("_n") > 0)
    )
    scale = counts.agg(F.min(F.col("_n") / F.col("_w")).alias("_s"))
    thr = (
        counts.join(F.broadcast(scale))
        .select(
            domain,
            F.floor(
                F.least(F.lit(1.0), F.col("_s") * F.col("_w") / F.col("_n"))
                * F.lit(float(TWO60_INT))
            )
            .cast("bigint")
            .alias("_thr"),
        )
    )
    return (
        df.join(F.broadcast(thr), domain)
        .filter(hash60(_keyed(key, salt)) < F.col("_thr"))
        .drop("_thr")
    )


def shard_assignments(
    df: DataFrame,
    key: Column | str,
    n_shards: int,
    salt: str = "",
    order_by: list[Column] | None = None,
) -> DataFrame:
    """Deterministic global shuffle + sharding for training-order layout:
    every row gets a content-addressed ``shard`` (uniform via the portable
    hash) and a dense ``pos_in_shard`` following the hash order, so the
    resulting read order is a reproducible permutation of the corpus —
    independent of input partitioning, stable under re-runs.

    ``order_by`` overrides the within-shard order for curriculum layouts
    (e.g. ``[F.col("quality_score").desc()]`` feeds each shard its cleanest
    documents first); the hash + key stay as trailing tie-breaks so the
    position remains fully deterministic.

    One shuffle (the per-shard window). Choose ``n_shards`` so a shard fits an
    executor (corpus_bytes / ~1 GiB); shards are hash-balanced so the window
    partitions are uniform by construction — no skew handling needed.
    """
    from pyspark.sql import Window

    k = F.col(key) if isinstance(key, str) else key
    h = hash60(_keyed(key, salt))
    out = df.withColumn("_h", h).withColumn(
        "shard", F.pmod(F.col("_h"), F.lit(n_shards)).cast("int")
    )
    # Secondary sort on the key: 60-bit hashes do collide at 10^10-row scale,
    # and the position must stay deterministic when they do.
    order = list(order_by or []) + [F.col("_h").asc(), k.cast("string").asc()]
    w = Window.partitionBy("shard").orderBy(*order)
    return (
        out.withColumn("pos_in_shard", F.row_number().over(w).cast("long"))
        .drop("_h")
    )


def _pow_halves(x: Column, alpha: float) -> Column:
    """``x ** alpha`` for alpha a dyadic rational in (0, 1] with up to 4
    binary digits (0.5, 0.25, 0.75, 0.625, ...), computed ONLY from
    IEEE-correctly-rounded primitives: repeated ``sqrt`` and one product
    chain. ``pow(x, alpha)`` is NOT correctly rounded and may differ
    between engines by an ulp — enough to flip a floor()ed hash threshold;
    sqrt/multiply are exact-rounded everywhere, so this form is
    bit-reproducible (the oracle replays the same sqrt chain)."""
    num = alpha * 16
    if not (0 < alpha <= 1) or num != int(num):
        raise ValueError("alpha must be k/16 in (0, 1]")
    bits = int(num)  # alpha = bits / 16, binary digits over sqrt chain
    term = x  # x^1
    out: Column | None = None
    for i in range(5):  # x^(1/2^0) .. x^(1/2^4)
        if bits & (16 >> i):
            out = term if out is None else out * term
        term = F.sqrt(term)
    assert out is not None
    return out


def temperature_mixture_sample(
    df: DataFrame,
    domain: str,
    key: Column | str,
    alpha: float = 0.5,
    salt: str = "",
    size_col: str | None = None,
) -> DataFrame:
    """Temperature-based domain rebalancing — the multilingual/multi-domain
    recipe (mBERT/XLM-R style): target share of domain d is
    ``n_d^alpha / Σ n_e^alpha``. alpha = 1 keeps the natural mixture,
    alpha → 0 approaches uniform; 0.5–0.7 is the usual range that
    up-weights the tail without drowning the head.

    Unlike :func:`domain_mixture_sample` the weights are NOT caller
    literals — they are computed IN-PLAN from the same tiny per-domain
    mass relation, so the entry/oracle replay the whole derivation and no
    statistics cross engines. alpha is restricted to dyadic rationals
    (k/16) so ``n^alpha`` evaluates through a sqrt chain
    (:func:`_pow_halves`) — bit-reproducible across engines, unlike
    ``pow``. Since the feasible scale ``s = min_d(n_d / w_d)`` adapts to
    any positive rescaling of w, the weights need no normalization.

    Scale shape: identical to domain_mixture_sample — one map-side
    aggregate to |domains| rows, thresholds broadcast back, ONE narrow
    corpus filter, zero corpus shuffles."""
    mass = F.sum(size_col) if size_col else F.count(F.lit(1))
    counts = (
        df.groupBy(domain)
        .agg(mass.cast("double").alias("_n"))
        .filter(F.col(domain).isNotNull() & (F.col("_n") > 0))
        .withColumn("_w", _pow_halves(F.col("_n"), alpha))
    )
    scale = counts.agg(F.min(F.col("_n") / F.col("_w")).alias("_s"))
    thr = counts.join(F.broadcast(scale)).select(
        domain,
        F.floor(
            F.least(F.lit(1.0), F.col("_s") * F.col("_w") / F.col("_n"))
            * F.lit(float(TWO60_INT))
        )
        .cast("bigint")
        .alias("_thr"),
    )
    return (
        df.join(F.broadcast(thr), domain)
        .filter(hash60(_keyed(key, salt)) < F.col("_thr"))
        .drop("_thr")
    )


def grouped_split(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: the split is a function of
    the GROUP (domain, author, dedup-cluster id …), so correlated rows can
    never straddle the boundary — the group-aware split every evaluation
    methodology calls for once near-duplicates exist (a doc-level split
    leaks paraphrases of training rows into test).

    Content-addressed: ``hash60(group, salt)`` against cumulative integer
    thresholds — engine-reproducible, stable under re-runs and input
    partitioning, and rows of a group need no coordination (a pure
    projection; no shuffle, no group materialization). Adds ``split``."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(weights.values())
    if total <= 0 or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative and sum to a positive value")
    h = hash60(_keyed(group_col, salt))
    expr: Column | None = None
    acc = 0.0
    items = sorted(weights.items())
    for name, w in items[:-1]:
        acc += w / total
        thr = int(acc * TWO60_INT)
        cond = h < F.lit(thr)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", expr)
