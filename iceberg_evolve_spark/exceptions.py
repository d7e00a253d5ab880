"""Exception surface, mirroring the reference's ``iceberg_evolve/exceptions.py:1-18``."""

from __future__ import annotations


class SchemaParseError(Exception):
    """A schema document could not be parsed (reference ``exceptions.py``)."""

    def __init__(self, source: str, detail: str | None = None) -> None:
        self.source = source
        self.detail = detail
        msg = f"Failed to parse schema from {source!r}"
        if detail:
            msg += f": {detail}"
        super().__init__(msg)


class CatalogLoadError(Exception):
    """A table could not be loaded from a catalog (reference ``exceptions.py``)."""

    def __init__(self, table: str, catalog: str, detail: str | None = None) -> None:
        self.table = table
        self.catalog = catalog
        msg = f"Failed to load table {table!r} from catalog {catalog!r}"
        if detail:
            msg += f": {detail}"
        super().__init__(msg)


class UnsupportedSchemaEvolutionWarning(UserWarning):
    """Emitted when an evolution operation cannot be applied (reference ``exceptions.py``)."""
