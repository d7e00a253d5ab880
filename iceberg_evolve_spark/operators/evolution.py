"""Evolution-operation classes: the "physical ops" of the schema engine.

Reference surface: ``iceberg_evolve/migrate.py`` (E0–E6 in ``SURVEY.md §2``). The key
idiom shift: instead of calling PyIceberg ``UpdateSchema`` methods, each op compiles to
**Spark SQL DDL** (`ALTER TABLE`, Iceberg Spark-extension dialect) via :meth:`to_sql`,
and can also be applied to a plain :class:`~pyspark.sql.DataFrame` by the DataFrame
migration backend (``operators/migrate_df.py``) — a genuine capability the reference
lacks (it can only mutate catalog metadata).

Semantics reproduced from the reference:

* ``DropColumn.is_breaking()`` is always True (``migrate.py:142-150``).
* ``UpdateColumn.is_supported`` is False for non-primitive new types
  (``migrate.py:169-170``) with the documented workaround warning
  (``migrate.py:216-225``); breaking iff the change is not a widening
  (``migrate.py:228-236``).
* ``UnionSchema`` is permanently unsupported in the reference (``migrate.py:364-365``)
  — we keep ``is_supported = False`` for parity but implement it in the DataFrame
  backend.
* ``to_dict`` is provided as an alias of ``to_serializable_dict`` — the reference CLI
  calls ``op.to_dict()`` which doesn't exist there (latent ``--json`` bug, reference
  ``cli.py:59``); fixed here.
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass
from typing import Any

from iceberg_evolve_spark.canonical import (
    clean_type_str,
    is_engine_legal_promotion,
    is_narrower_than,
)
from iceberg_evolve_spark.exceptions import UnsupportedSchemaEvolutionWarning
from iceberg_evolve_spark.model import (
    DecimalType,
    IcebergType,
    ListType,
    MapType,
    PrimitiveType,
    StructType,
)

# ---------------------------------------------------------------------------
# Iceberg model type → Spark DDL type string
# ---------------------------------------------------------------------------

_SPARK_DDL_PRIMITIVES = {
    "string": "STRING",
    "int": "INT",
    "long": "BIGINT",
    "float": "FLOAT",
    "double": "DOUBLE",
    "boolean": "BOOLEAN",
    "date": "DATE",
    "timestamp": "TIMESTAMP_NTZ",
    "binary": "BINARY",
    # Spark has no TIME type (SURVEY.md §7.4 risk #3); surface a clear error.
}


def to_spark_ddl_type(t: IcebergType) -> str:
    """Render a model type as a Spark SQL DDL type string."""
    if isinstance(t, DecimalType):
        return f"DECIMAL({t.precision},{t.scale})"
    if isinstance(t, PrimitiveType):
        if t.name == "time":
            raise ValueError(
                "Spark SQL has no TIME type; store as STRING or TIMESTAMP_NTZ "
                "(see SURVEY.md §7.4)"
            )
        return _SPARK_DDL_PRIMITIVES[t.name]
    if isinstance(t, StructType):
        inner = ", ".join(
            f"{quote_ident(f.name)}: {to_spark_ddl_type(f.type)}"
            + ("" if not f.required else " NOT NULL")
            for f in t.fields
        )
        return f"STRUCT<{inner}>"
    if isinstance(t, ListType):
        return f"ARRAY<{to_spark_ddl_type(t.element)}>"
    if isinstance(t, MapType):
        return f"MAP<{to_spark_ddl_type(t.key)}, {to_spark_ddl_type(t.value)}>"
    raise TypeError(f"not an IcebergType: {t!r}")


def quote_ident(name: str) -> str:
    """Backtick-quote one identifier segment if needed."""
    if name.replace("_", "").isalnum() and not name[0].isdigit():
        return name
    return "`" + name.replace("`", "``") + "`"


def quote_path(dotted: str) -> str:
    """Quote a dotted column path segment-by-segment."""
    return ".".join(quote_ident(p) for p in dotted.split("."))


# ---------------------------------------------------------------------------
# Op classes
# ---------------------------------------------------------------------------


@dataclass
class BaseEvolutionOperation:
    """Abstract base (reference ``migrate.py:13-39``)."""

    name: str  # dotted column path the op targets

    op_name = "base"
    is_supported: bool = True

    def is_breaking(self) -> bool:
        return False

    def to_sql(self, table: str) -> list[str]:
        """Compile to zero or more ALTER TABLE statements."""
        raise NotImplementedError

    def to_serializable_dict(self) -> dict[str, Any]:
        raise NotImplementedError

    # Reference CLI bug fix: provide the method the CLI actually calls.
    def to_dict(self) -> dict[str, Any]:
        return self.to_serializable_dict()

    def pretty(self) -> str:
        d = self.to_serializable_dict()
        parts = ", ".join(f"{k}={v}" for k, v in d.items() if k != "op" and v is not None)
        return f"{d['op']}({parts})"

    def display(self) -> None:
        print(self.pretty())


@dataclass
class AddColumn(BaseEvolutionOperation):
    """Add a (possibly nested, dotted-path) column (reference ``migrate.py:42-93``).

    ``initial_default`` / ``write_default`` carry Iceberg v3 default values
    (spec §"Default values": the initial default backfills EXISTING rows as
    metadata, the write default applies to future writes omitting the column).
    The reference predates v3; here the DDL emits ``DEFAULT <write-default>``
    and the DataFrame migration backend fills pre-existing rows with the
    initial default instead of NULL."""

    new_type: IcebergType = None  # type: ignore[assignment]
    doc: str | None = None
    initial_default: object = None
    write_default: object = None

    op_name = "add_column"

    @staticmethod
    def _sql_literal(v: object) -> str:
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, (int, float)):
            return repr(v)
        return "'" + str(v).replace("'", "''") + "'"

    def to_sql(self, table: str) -> list[str]:
        ddl = f"ALTER TABLE {table} ADD COLUMN {quote_path(self.name)} {to_spark_ddl_type(self.new_type)}"
        if self.write_default is not None:
            ddl += f" DEFAULT {self._sql_literal(self.write_default)}"
        if self.doc:
            ddl += f" COMMENT '{self.doc.replace(chr(39), chr(39) * 2)}'"
        return [ddl]

    def to_serializable_dict(self) -> dict[str, Any]:
        out: dict[str, Any] = {
            "op": "add_column",
            "name": self.name,
            "type": clean_type_str(self.new_type),
            "doc": self.doc,
        }
        if self.initial_default is not None:
            out["initial_default"] = self.initial_default
        if self.write_default is not None:
            out["write_default"] = self.write_default
        return out


@dataclass
class DropColumn(BaseEvolutionOperation):
    """Drop a column — always a breaking change (reference ``migrate.py:96-150``)."""

    op_name = "drop_column"

    def is_breaking(self) -> bool:
        return True

    def to_sql(self, table: str) -> list[str]:
        return [f"ALTER TABLE {table} DROP COLUMN {quote_path(self.name)}"]

    def to_serializable_dict(self) -> dict[str, Any]:
        return {"op": "drop_column", "name": self.name}


@dataclass
class UpdateColumn(BaseEvolutionOperation):
    """Change a column's type (and/or doc) (reference ``migrate.py:153-236``)."""

    current_type: IcebergType = None  # type: ignore[assignment]
    new_type: IcebergType = None  # type: ignore[assignment]
    doc: str | None = None

    op_name = "update_column"

    def __post_init__(self) -> None:
        # Non-primitive target types can't be updated in place
        # (reference migrate.py:169-170).
        self.is_supported = bool(self.new_type) and self.new_type.is_primitive

    def is_breaking(self) -> bool:
        if self.current_type == self.new_type:
            return False
        return not is_narrower_than(self.current_type, self.new_type)

    def warn_if_unsupported(self) -> None:
        if not self.is_supported:
            warnings.warn(
                f"Cannot update column {self.name!r} to non-primitive type "
                f"{clean_type_str(self.new_type)}; workaround: add a new column, "
                f"backfill, then drop the old one (or use the DataFrame migration "
                f"backend, which rewrites data).",
                UnsupportedSchemaEvolutionWarning,
                stacklevel=2,
            )

    def to_sql(self, table: str) -> list[str]:
        if not self.is_supported:
            self.warn_if_unsupported()
            return []
        stmts = []
        if self.current_type != self.new_type:
            # The reference's widening lattice (is_narrower_than) classifies
            # e.g. int→float as non-breaking, but Iceberg/Spark DDL only
            # permits int→long, float→double and decimal precision widening —
            # the reference itself would crash inside PyIceberg on the others
            # (SURVEY §7.4 risk 2). Refuse to compile DDL that the engine will
            # reject; the workaround (or the DataFrame migration backend,
            # which CAN rewrite int→float) is in the warning.
            if not is_engine_legal_promotion(self.current_type, self.new_type):
                warnings.warn(
                    f"Type change {clean_type_str(self.current_type)} → "
                    f"{clean_type_str(self.new_type)} on {self.name!r} is not an "
                    f"engine-legal Iceberg promotion (only int→long, "
                    f"float→double, decimal precision widening). Workaround: "
                    f"add a new column, backfill, drop the old one — or use "
                    f"the DataFrame migration backend (migrate_dataframe), "
                    f"which rewrites data and supports any cast.",
                    UnsupportedSchemaEvolutionWarning,
                    stacklevel=2,
                )
            else:
                stmts.append(
                    f"ALTER TABLE {table} ALTER COLUMN {quote_path(self.name)} "
                    f"TYPE {to_spark_ddl_type(self.new_type)}"
                )
        if self.doc is not None:
            stmts.append(
                f"ALTER TABLE {table} ALTER COLUMN {quote_path(self.name)} "
                f"COMMENT '{self.doc.replace(chr(39), chr(39) * 2)}'"
            )
        return stmts

    def to_serializable_dict(self) -> dict[str, Any]:
        return {
            "op": "update_column",
            "name": self.name,
            "from": clean_type_str(self.current_type) if self.current_type else None,
            "to": clean_type_str(self.new_type) if self.new_type else None,
            "doc": self.doc,
        }


@dataclass
class RenameColumn(BaseEvolutionOperation):
    """Rename a (possibly nested) column (reference ``migrate.py:239-288``).
    ``name`` is the dotted path under the OLD leaf name; ``target`` the new leaf name."""

    target: str = ""

    op_name = "rename_column"

    def to_sql(self, table: str) -> list[str]:
        return [
            f"ALTER TABLE {table} RENAME COLUMN {quote_path(self.name)} "
            f"TO {quote_ident(self.target)}"
        ]

    def to_serializable_dict(self) -> dict[str, Any]:
        return {"op": "rename_column", "name": self.name, "to": self.target}


@dataclass
class MoveColumn(BaseEvolutionOperation):
    """Reposition a top-level column: first / before / after a target
    (reference ``migrate.py:291-349``). Requires the Iceberg SQL extensions in a
    live catalog; the DataFrame backend implements it by column reordering."""

    target: str | None = None
    position: str = "after"  # first | before | after

    op_name = "move_column"

    def to_sql(self, table: str) -> list[str]:
        col = quote_path(self.name)
        if self.position == "first":
            return [f"ALTER TABLE {table} ALTER COLUMN {col} FIRST"]
        if self.position in ("before", "after") and self.target:
            kw = self.position.upper()
            return [f"ALTER TABLE {table} ALTER COLUMN {col} {kw} {quote_ident(self.target)}"]
        raise ValueError(f"invalid move: position={self.position!r} target={self.target!r}")

    def to_serializable_dict(self) -> dict[str, Any]:
        return {
            "op": "move_column",
            "name": self.name,
            "position": self.position,
            "target": self.target,
        }


@dataclass
class SetNullability(BaseEvolutionOperation):
    """Flip a column between optional and required.

    No reference counterpart: the reference silently ignores required/optional
    flips (``SURVEY.md §1.1``); the diff here detects them
    (``include_required_changes=True``) and this op completes the path to DDL.

    ``required=False`` compiles to ``DROP NOT NULL`` — always safe (widens the
    value set). ``required=True`` compiles to ``SET NOT NULL`` and is a
    BREAKING change: Iceberg refuses to promote an optional column to required
    (existing data may hold nulls) unless incompatible changes are explicitly
    allowed, so the op both reports breaking and warns at compile time.
    """

    required: bool = False

    op_name = "set_nullability"

    def is_breaking(self) -> bool:
        return self.required

    def to_sql(self, table: str) -> list[str]:
        col = quote_path(self.name)
        if not self.required:
            return [f"ALTER TABLE {table} ALTER COLUMN {col} DROP NOT NULL"]
        warnings.warn(
            f"Making {self.name!r} required (SET NOT NULL) is rejected by "
            f"Iceberg unless the table provably holds no nulls and "
            f"incompatible changes are allowed; backfill nulls first.",
            UnsupportedSchemaEvolutionWarning,
            stacklevel=2,
        )
        return [f"ALTER TABLE {table} ALTER COLUMN {col} SET NOT NULL"]

    def to_serializable_dict(self) -> dict[str, Any]:
        return {
            "op": "set_nullability",
            "name": self.name,
            "required": self.required,
        }


@dataclass
class UnionSchema(BaseEvolutionOperation):
    """Merge a whole schema into the table by name.

    Permanently unsupported in the reference (``migrate.py:352-406``; the executor
    hard-rejects it, ``schema.py:195-198``). Kept for API parity — the DDL path warns
    and emits nothing; the DataFrame migration backend CAN apply it (unionByName
    semantics), which is a rebuild improvement.
    """

    new_type: IcebergType = None  # type: ignore[assignment]

    op_name = "union_schema"

    def __post_init__(self) -> None:
        self.is_supported = False

    def to_sql(self, table: str) -> list[str]:
        warnings.warn(
            "UnionSchema is not supported by the DDL executor; use "
            "SchemaDiff.union_by_name + to_evolution_operations, or the DataFrame "
            "migration backend.",
            UnsupportedSchemaEvolutionWarning,
            stacklevel=2,
        )
        return []

    def to_serializable_dict(self) -> dict[str, Any]:
        return {
            "op": "union_schema",
            "name": self.name,
            "type": clean_type_str(self.new_type) if self.new_type else None,
        }
