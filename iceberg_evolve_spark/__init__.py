"""iceberg-evolve-spark — a PySpark-native schema-evolution + data-pipeline engine.

A from-scratch rebuild of the capabilities of the reference project
``anatol-ju/iceberg-evolve`` (a PyIceberg-based schema diff/evolve tool), re-expressed
Spark-first:

* **Core** (pure Python, no JVM needed): an Iceberg-style schema model with stable
  field IDs, Iceberg-metadata-JSON (de)serialization, SQL type-string parsing,
  JSON-Schema conversion, field-id-keyed schema diffing with minimal-move detection,
  and a dependency-safe evolution-operation planner.
  (Reference surface: ``iceberg_evolve/{schema,diff,migrate,utils,serializer}.py``.)
* **Spark layer**: model ⇄ ``pyspark.sql.types.StructType`` conversion (field IDs in
  ``StructField.metadata``), compilation of evolution plans to Spark/Iceberg
  ``ALTER TABLE`` DDL, a three-phase transactional executor, and a pure-DataFrame
  migration backend that rewrites data to a new schema when DDL is unavailable.
* **Scale extensions** (the 100-TB track): deduplication (exact, MinHash-LSH,
  SimHash, n-gram Jaccard, embedding-cosine), similarity search (brute-force and
  IVF/LSH), text analysis (language ID, quality scoring, token counting,
  fingerprinting), multimodal binary-column plumbing, and event sessionization —
  all built on ``pyspark.sql.functions`` so Catalyst/AQE optimize them.
"""

from iceberg_evolve_spark.model import (
    Field,
    IcebergType,
    PrimitiveType,
    DecimalType,
    StructType,
    ListType,
    MapType,
    IDAllocator,
)
from iceberg_evolve_spark.schema import Schema
from iceberg_evolve_spark.diff import FieldChange, SchemaDiff

__version__ = "0.1.0"

__all__ = [
    "Field",
    "IcebergType",
    "PrimitiveType",
    "DecimalType",
    "StructType",
    "ListType",
    "MapType",
    "IDAllocator",
    "Schema",
    "FieldChange",
    "SchemaDiff",
    "__version__",
]
