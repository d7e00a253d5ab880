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


def hash_sample_sql(key_expr: str, fraction: float, salt: str = "") -> str:
    """DuckDB predicate selecting the identical rows."""
    e = f"CAST({key_expr} AS VARCHAR)"
    if salt:
        e = f"{e} || '{SEP}{salt}'"
    return f"{hash60_sql(e)} < {_threshold(fraction)}"
