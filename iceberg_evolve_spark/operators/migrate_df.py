"""DataFrame migration backend: *rewrite data* into an evolved schema.

The reference can only mutate catalog metadata; it refuses nested type rewrites
(``migrate.py:216-225``) and suggests a manual "add + backfill + drop" workaround.
This backend IS that workaround, automated and generalized: given the current and
target schemas (with field IDs), it compiles the whole evolution — renames, type
promotions, adds (as NULLs), drops, moves, nested struct changes — into **one
declarative projection**, so Catalyst plans it as a single narrow map stage with
whole-stage codegen: no shuffle, no UDFs, scales linearly to any data size.

Resolution is by field ID (same identity rule as the diff, ``diff.py:131``):
for every field of the target schema we locate the source field with the same ID
(found → rename/cast as needed; missing → typed NULL). Field order in the output
follows the target schema, which subsumes MoveColumn.
"""

from __future__ import annotations

import warnings

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from iceberg_evolve_spark.exceptions import UnsupportedSchemaEvolutionWarning
from iceberg_evolve_spark.model import (
    DecimalType,
    Field,
    IcebergType,
    ListType,
    MapType,
    PrimitiveType,
    StructType,
)
from iceberg_evolve_spark.spark_convert import type_to_spark

_CASTABLE_PRIMITIVES = True  # primitive→primitive handled by Spark cast


def _migrate_column(col: Column, cur_t: IcebergType, new_t: IcebergType, path: str) -> Column:
    """Produce an expression converting ``col`` from ``cur_t`` to ``new_t``."""
    if cur_t == new_t:
        return col
    if isinstance(cur_t, StructType) and isinstance(new_t, StructType):
        return _migrate_struct(col, cur_t, new_t, path)
    if isinstance(cur_t, ListType) and isinstance(new_t, ListType):
        # transform elements lambda-wise; keeps the operation vectorized JVM-side
        return F.transform(
            col,
            lambda x: _migrate_column(x, cur_t.element, new_t.element, f"{path}.element"),
        )
    if isinstance(cur_t, MapType) and isinstance(new_t, MapType):
        return F.map_from_arrays(
            F.transform(
                F.map_keys(col),
                lambda k: _migrate_column(k, cur_t.key, new_t.key, f"{path}.key"),
            ),
            F.transform(
                F.map_values(col),
                lambda v: _migrate_column(v, cur_t.value, new_t.value, f"{path}.value"),
            ),
        )
    if isinstance(cur_t, (PrimitiveType, DecimalType)) and isinstance(
        new_t, (PrimitiveType, DecimalType)
    ):
        return col.cast(type_to_spark(new_t))
    # Shape change (e.g. list<int> → list<struct<...>>): no value mapping exists.
    warnings.warn(
        f"Column {path!r}: cannot migrate {cur_t} -> {new_t}; filling with NULL "
        f"(the reference refuses this change entirely, migrate.py:216-225)",
        UnsupportedSchemaEvolutionWarning,
        stacklevel=2,
    )
    return F.lit(None).cast(type_to_spark(new_t))


def _added_field_value(nf: Field) -> Column:
    """Value an ADDED field takes for pre-existing rows: the Iceberg v3
    ``initial-default`` when the target field carries one, else typed NULL
    (v1/v2 behavior). A literal cast is still a pure projection — the
    migration stays one shuffle-free map stage either way."""
    if nf.initial_default is not None:
        return F.lit(nf.initial_default).cast(type_to_spark(nf.type))
    return F.lit(None).cast(type_to_spark(nf.type))


def _migrate_struct(col: Column | None, cur: StructType, new: StructType, path: str) -> Column:
    """Rebuild a struct column in target-field order, resolving children by ID."""
    cur_by_id = {f.field_id: f for f in cur.fields}
    parts: list[Column] = []
    for nf in new.fields:
        cf = cur_by_id.get(nf.field_id)
        child_path = f"{path}.{nf.name}" if path else nf.name
        if cf is None:
            expr = _added_field_value(nf)
        else:
            src = col.getField(cf.name) if col is not None else F.col(cf.name)
            expr = _migrate_column(src, cf.type, nf.type, child_path)
        parts.append(expr.alias(nf.name))
    return F.struct(*parts)


def migration_columns(current: StructType, new: StructType) -> list[Column]:
    """The projection expressions converting a relation written under
    ``current`` into schema ``new`` (field-id resolution; see
    :func:`migrate_dataframe`). Exposed separately so callers that must
    carry extra passthrough columns (e.g. the snapshot reader's
    ``_file``/``_pos`` merge-on-read helpers) can append them to the same
    single select."""
    cur_by_id = {f.field_id: f for f in current.fields}
    out: list[Column] = []
    for nf in new.fields:
        cf = cur_by_id.get(nf.field_id)
        if cf is None:
            expr = _added_field_value(nf)
        else:
            expr = _migrate_column(F.col(cf.name), cf.type, nf.type, nf.name)
        out.append(expr.alias(nf.name))
    return out


def migrate_dataframe(df: DataFrame, current: StructType, new: StructType) -> DataFrame:
    """Project ``df`` (whose columns follow ``current``) into schema ``new``.

    One ``select`` — Catalyst fuses it with upstream/downstream operators; at 100 TB
    this is a pure map-side rewrite with no shuffle.
    """
    return df.select(*migration_columns(current, new))


def union_by_field_id(
    parts: list[tuple[DataFrame, StructType]], target: StructType
) -> DataFrame:
    """SCHEMA-ON-READ: read data written under SEVERAL historical schemas as
    one relation under the ``target`` schema — what Iceberg actually does
    when a table evolves (old data files are never rewritten; the reader
    resolves every file's columns by FIELD ID against the current schema).

    Each ``(df, written_schema)`` part is projected to ``target`` with
    :func:`migrate_dataframe` — renames resolve by id, widened types cast,
    added columns fill with their Iceberg-v3 ``initial_default`` (or NULL),
    dropped columns vanish — then the projections union positionally (all
    are in exact target order). The whole thing stays one narrow map stage
    per part with zero shuffles, so reading a 100 TB table across five
    schema generations costs exactly what reading it under one schema does.
    """
    if not parts:
        raise ValueError("union_by_field_id needs at least one part")
    out = None
    for df, written in parts:
        proj = migrate_dataframe(df, written, target)
        out = proj if out is None else out.unionByName(proj)
    return out
