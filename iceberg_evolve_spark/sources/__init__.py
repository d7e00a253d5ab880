"""Data sources: testdata table loading + session factory."""

from iceberg_evolve_spark.sources.tables import TABLES, load_table, register_views
from iceberg_evolve_spark.sources.session import get_session
from iceberg_evolve_spark.sources.snapshots import SnapshotTable

__all__ = ["TABLES", "load_table", "register_views", "get_session", "SnapshotTable"]
