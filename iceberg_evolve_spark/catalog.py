"""Catalog helper: live table schema → JSON-schema-style dict.

Reference parity: ``iceberg_evolve/catalog.py:16-44`` (S4) — loads a table's
schema through the catalog and emits a draft-JSON-Schema dict with the lossy
type map (int/long → "integer", float/double → "number", date/timestamp →
"string"). Here the catalog is Spark's (``spark.table``), with a parquet-path
fallback for catalog-less environments.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any

from iceberg_evolve_spark.exceptions import CatalogLoadError
from iceberg_evolve_spark.jsonschema import struct_to_json_schema
from iceberg_evolve_spark.spark_convert import struct_from_spark

if TYPE_CHECKING:
    from pyspark.sql import SparkSession


def load_table_schema(
    spark: "SparkSession", table: str, parquet_path: str | None = None
) -> dict[str, Any]:
    """Return the table's schema as a JSON-schema-style dict
    (``{"type": "object", "properties": {...}, "required": [...]}``)."""
    try:
        if parquet_path is not None:
            spark_schema = spark.read.parquet(parquet_path).schema
        else:
            spark_schema = spark.table(table).schema
    except Exception as exc:
        raise CatalogLoadError(table, "spark", str(exc)) from exc
    return struct_to_json_schema(struct_from_spark(spark_schema))
