"""Z-order (Morton-curve) clustered writes for multi-column data skipping.

Range-sorting a table clusters ONE column: filters on it prune files via
parquet zone maps (min/max), filters on anything else read everything.
Interleaving the bits of two columns' normalized ranks orders the data along a
space-filling curve, so file-level min/max stays tight on BOTH columns — the
standard layout trick for 100 TB tables queried on two independent dimensions
(Delta/Iceberg expose the same idea as ``OPTIMIZE ZORDER BY``; this is the
engine-level implementation).

Everything is JVM-side bit arithmetic inside whole-stage codegen — no UDF.
Normalization uses global min/max from one tiny aggregate (broadcast back),
not a rank (no global sort before the write's own range partition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _normalize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Min-max map to [0, 2^bits): equal-width buckets over the observed range."""
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
    scaled = (col.cast("double") - lo) / span * F.lit((1 << bits) - 1)
    return F.least(
        F.greatest(F.floor(scaled).cast("long"), F.lit(0)), F.lit((1 << bits) - 1)
    )


def _interleave(x: Column, y: Column, bits: int) -> Column:
    """Morton code: bit i of x → bit 2i, bit i of y → bit 2i+1."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        xb = F.shiftright(x, i).bitwiseAND(F.lit(1))
        yb = F.shiftright(y, i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(xb, 2 * i)).bitwiseOR(F.shiftleft(yb, 2 * i + 1))
    return z


def zorder_column(
    df: DataFrame, col_a: str, col_b: str, bits: int = 12, out: str = "_z"
) -> DataFrame:
    """Attach the Morton code of (col_a, col_b) as ``out``. The min/max stats
    come from one 1-row aggregate broadcast back onto the data."""
    stats = df.agg(
        F.min(F.col(col_a).cast("double")).alias("_alo"),
        F.max(F.col(col_a).cast("double")).alias("_ahi"),
        F.min(F.col(col_b).cast("double")).alias("_blo"),
        F.max(F.col(col_b).cast("double")).alias("_bhi"),
    )
    with_stats = df.join(F.broadcast(stats))
    z = _interleave(
        _normalize(F.col(col_a), F.col("_alo"), F.col("_ahi"), bits),
        _normalize(F.col(col_b), F.col("_blo"), F.col("_bhi"), bits),
        bits,
    )
    return with_stats.withColumn(out, z).drop("_alo", "_ahi", "_blo", "_bhi")


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    num_files: int = 16,
    bits: int = 12,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered along the (col_a, col_b) Z-curve:
    range-partition by the Morton code (balanced files), sort within
    partitions (tight pages), drop the helper column on write. Filters on
    EITHER column then prune most files via footer min/max."""
    zdf = zorder_column(df, col_a, col_b, bits=bits)
    (
        zdf.repartitionByRange(num_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
