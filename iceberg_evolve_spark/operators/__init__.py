"""Evolution operators, plan→DDL compilation, and executors."""

from iceberg_evolve_spark.operators.evolution import (
    AddColumn,
    BaseEvolutionOperation,
    DropColumn,
    MoveColumn,
    RenameColumn,
    SetNullability,
    UnionSchema,
    UpdateColumn,
)

__all__ = [
    "BaseEvolutionOperation",
    "AddColumn",
    "DropColumn",
    "UpdateColumn",
    "RenameColumn",
    "MoveColumn",
    "SetNullability",
    "UnionSchema",
]
