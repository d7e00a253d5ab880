"""Parquet table access for the synthetic test corpus (TESTDATA.md).

Thin by design: tables are plain parquet directories read with
``spark.read.parquet`` so Catalyst gets native pushdown/pruning. At production
scale the same names would resolve through an Iceberg catalog instead
(``spark.table``) — the query layer is source-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ts is TIMESTAMP(NANOS) in parquet, surfaced as nanos-since-epoch via
        # spark.sql.legacy.parquet.nanosAsLong; truncate to micros (what DuckDB
        # also does) and restore the timestamp type.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` queries run as-is."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
