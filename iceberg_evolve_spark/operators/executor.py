"""Evolution executors: plan → effect.

Three backends behind one small protocol (``apply`` / ``refresh`` /
``current_schema``), driven by :meth:`Schema.evolve`'s three-phase loop
(reference control flow ``iceberg_evolve/schema.py:233-272``):

* :class:`SparkSQLExecutor` — compiles ops to Iceberg Spark-extension ``ALTER TABLE``
  DDL and runs them via ``spark.sql``. Each DDL statement is a metadata-only Iceberg
  commit (no data rewrite, no shuffle) — the Spark analog of the reference's PyIceberg
  ``UpdateSchema`` transactions. Requires an Iceberg catalog + the
  ``IcebergSparkSessionExtensions`` for MOVE/TYPE ops.
* :class:`CollectingExecutor` — dry-run/compile-only: records the DDL strings.
* DataFrame migration lives in ``operators/migrate_df.py`` — it *rewrites data*
  to the evolved schema, which the reference cannot do at all.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Protocol

if TYPE_CHECKING:
    from pyspark.sql import SparkSession

    from iceberg_evolve_spark.operators.evolution import BaseEvolutionOperation
    from iceberg_evolve_spark.schema import Schema


class EvolutionExecutor(Protocol):
    def apply(self, ops: list["BaseEvolutionOperation"]) -> None: ...

    def refresh(self) -> None: ...

    def current_schema(self) -> "Schema | None": ...


def compile_plan(ops: list["BaseEvolutionOperation"], table: str) -> list[str]:
    """Pure function: plan → ordered ALTER TABLE statements (unit-testable without
    a catalog)."""
    out: list[str] = []
    for op in ops:
        out.extend(op.to_sql(table))
    return out


class CollectingExecutor:
    """Records compiled DDL without executing — the dry-run / audit backend."""

    def __init__(self, table: str) -> None:
        self.table = table
        self.statements: list[str] = []
        self.refresh_count = 0

    def apply(self, ops: list["BaseEvolutionOperation"]) -> None:
        self.statements.extend(compile_plan(ops, self.table))

    def refresh(self) -> None:
        self.refresh_count += 1

    def current_schema(self) -> "Schema | None":
        return None


class SparkSQLExecutor:
    """Runs compiled DDL against a live table through ``spark.sql``.

    Every statement auto-commits (Spark DDL has no multi-statement transaction), so
    the reference's phase barriers (re-fetch between ``UpdateSchema`` transactions,
    ``schema.py:249, 262``) map to a catalog-cache refresh between phases.
    """

    def __init__(self, spark: "SparkSession", table: str) -> None:
        self.spark = spark
        self.table = table
        self.executed: list[str] = []

    def apply(self, ops: list["BaseEvolutionOperation"]) -> None:
        for stmt in compile_plan(ops, self.table):
            self.spark.sql(stmt)
            self.executed.append(stmt)

    def refresh(self) -> None:
        try:
            self.spark.catalog.refreshTable(self.table)
        except Exception:
            pass  # some catalogs don't need/support explicit refresh

    def current_schema(self) -> "Schema | None":
        from iceberg_evolve_spark.schema import Schema

        return Schema.from_spark_table(self.spark, self.table)
