"""Snapshot/time-travel layer (`sources/snapshots.py`): manifest commit
protocol, version resolution, logical rollback, and orphan tolerance."""

import json
import os

import pytest
from pyspark.sql import functions as F

from iceberg_evolve_spark.sources.snapshots import MANIFEST, SnapshotTable


@pytest.fixture()
def table(tmp_path, spark):
    t = SnapshotTable(str(tmp_path / "t"))
    t.write(spark.range(0, 10), note="ten", ts=100.0)
    t.write(spark.range(0, 25), note="twentyfive", ts=200.0)
    return t


def test_versions_and_pinned_reads(spark, table):
    assert [e["version"] for e in table.versions()] == [1, 2]
    assert table.read(spark, version=1).count() == 10
    assert table.read(spark, version=2).count() == 25
    assert table.read(spark).count() == 25  # latest


def test_as_of_resolution(spark, table):
    assert table.read(spark, as_of=150.0).count() == 10
    assert table.read(spark, as_of=200.0).count() == 25  # inclusive boundary
    with pytest.raises(LookupError):
        table.read(spark, as_of=50.0)


def test_rollback_is_logical_and_history_preserved(spark, table):
    v3 = table.rollback(1, ts=300.0)
    assert v3 == 3
    assert table.read(spark).count() == 10  # latest is v1's data again
    assert table.read(spark, version=2).count() == 25  # v2 still readable
    # rollback entry points at v1's dir — no data was copied or deleted
    entries = table.versions()
    assert entries[-1]["data_dir"] == entries[0]["data_dir"]


def test_orphan_data_dir_is_ignored(spark, table):
    """A crash between data-dir rename and manifest commit leaves an orphan
    dir that no reader ever sees (the manifest is the source of truth)."""
    orphan = os.path.join(table.path, "v00099")
    spark.range(0, 3).write.parquet(orphan)
    assert [e["version"] for e in table.versions()] == [1, 2]
    assert table.read(spark).count() == 25


def test_manifest_is_valid_json_after_every_commit(spark, table):
    with open(os.path.join(table.path, MANIFEST)) as fh:
        entries = json.load(fh)
    assert all({"version", "data_dir", "ts"} <= set(e) for e in entries)
    # and no .tmp manifest remnant exists
    assert not os.path.exists(os.path.join(table.path, MANIFEST + ".tmp"))


def test_snapshots_are_immutable_under_append(spark, table):
    """Writing v3 never touches v1/v2 bytes (dir mtimes unchanged)."""
    d1 = os.path.join(table.path, "v00001")
    before = sorted(os.listdir(d1))
    table.write(spark.range(0, 7).withColumn("x", F.lit(1)), ts=300.0)
    assert sorted(os.listdir(d1)) == before
    assert table.read(spark, version=1).count() == 10
