"""Beyond-parquet source/sink formats with model-driven schemas.

CSV/JSON readers take a schema from OUR model (``Schema``) so files load with
exact types and field order — never schema inference, which at 100 TB means a
full extra pass over the data and nondeterministic types (JSON ints→bigint vs
double depending on sampling).

The partitioned writer is the standard lake layout step: hash/partition-column
layout + bounded file sizes (small-file problem ⟷ giant-file problem both hurt;
``maxRecordsPerFile`` bounds the upper end, ``repartition`` the lower).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

if TYPE_CHECKING:
    from iceberg_evolve_spark.schema import Schema


def _spark_schema(schema: "Schema | None"):
    if schema is None:
        return None
    return schema.to_spark_struct()


def read_csv(
    spark: SparkSession,
    path: str,
    schema: "Schema | None" = None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV with an explicit model schema (no inference pass)."""
    reader = spark.read.options(header=str(header).lower(), **options)
    ss = _spark_schema(schema)
    if ss is not None:
        reader = reader.schema(ss)
    else:
        reader = reader.option("inferSchema", "true")  # small files only
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: "Schema | None" = None,
    **options: str,
) -> DataFrame:
    """JSON-lines with an explicit model schema (no inference pass)."""
    reader = spark.read.options(**options)
    ss = _spark_schema(schema)
    if ss is not None:
        reader = reader.schema(ss)
    return reader.json(path)


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-partition + sort the data before writing so parquet row-group
    min/max statistics become *disjoint ranges* — readers then skip whole
    files/row-groups for selective predicates on ``sort_cols`` (the poor
    man's clustering; Iceberg/Delta call the multi-dimensional variant
    Z-ordering). ``repartitionByRange`` gives globally disjoint files;
    ``sortWithinPartitions`` orders rows inside each for row-group skipping."""
    out = df.repartitionByRange(*sort_cols) if n_files is None else df.repartitionByRange(
        n_files, *sort_cols
    )
    out.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Write a partition-column lake layout with bounded file sizes.

    The pre-write ``repartition(partition_cols)`` routes each output partition
    to one task — without it, every task writes a sliver of every partition
    and the layout degenerates into the small-file problem.
    """
    (
        df.repartition(*partition_cols)
        .write.format(fmt)
        .mode(mode)
        .option("maxRecordsPerFile", str(max_records_per_file))
        .partitionBy(*partition_cols)
        .save(path)
    )


def read_json_quarantine(
    spark: SparkSession,
    path: str,
    schema: "Schema",
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE ingestion with a dead-letter split: returns
    ``(good_rows, quarantined_raw_lines)``.

    Malformed lines neither fail the job (FAILFAST) nor vanish (DROPMALFORMED)
    — they land in the quarantine frame as raw text for reprocessing, the
    production pattern for untrusted 100 TB input feeds.

    The frame is cached before splitting: Spark refuses to filter on only the
    corrupt-record column of a lazily parsed JSON relation (the parser would
    need to re-run with different required columns), and the cache also makes
    the two branches share one parse of the input.
    """
    from pyspark.sql.types import StringType

    ss = schema.to_spark_struct().add(corrupt_col, StringType())
    df = (
        spark.read.schema(ss)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
        .cache()
    )
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw")
    )
    return good, bad


def write_orc(
    df: DataFrame,
    path: str,
    sort_cols: list[str] | None = None,
    compression: str = "zstd",
) -> None:
    """Write ORC — the second mainstream columnar format (native in Spark,
    no extra jars): same predicate-pushdown / column-pruning / stripe-stats
    story as parquet, common in Hive-lineage warehouses. ``sort_cols``
    sorts within partitions so stripe min/max stats are tight (the ORC
    analog of the parquet footer-stats discipline)."""
    w = df.sortWithinPartitions(*sort_cols) if sort_cols else df
    w.write.mode("overwrite").option("compression", compression).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read ORC back; filters and column selection push into the stripe
    reader exactly as with parquet (assert via `PushedFilters` in
    `.explain`)."""
    return spark.read.orc(path)


def avro_unavailable_reason() -> str:
    """Why ``spark.read.format("avro")`` fails here: the external
    ``spark-avro`` connector jar is not bundled with a plain PySpark
    install (only the avro core jars ship). The repo covers the format
    anyway — :mod:`iceberg_evolve_spark.sources.avro` implements the Avro
    object-container format from scratch (``write_avro``/``read_avro``),
    so this message now only explains why the NATIVE datasource path is
    gated, not an absence of Avro support."""
    return (
        "Avro datasource requires the spark-avro connector jar "
        "(org.apache.spark:spark-avro_2.13), which is not bundled with "
        "PySpark; use iceberg_evolve_spark.sources.avro "
        "(from-scratch object-container reader/writer) instead"
    )
