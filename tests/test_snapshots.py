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


class TestExpireSnapshots:
    def test_expire_keeps_last_n_and_removes_orphans(self, spark, tmp_path_factory):
        t = SnapshotTable(str(tmp_path_factory.mktemp("exp") / "t"))
        for i in range(4):
            t.write(spark.range(i, i + 3).toDF("id"), ts=float(100 + i))
        expired, removed = t.expire_snapshots(keep_last=2)
        assert expired == [1, 2]
        assert removed == ["v00001", "v00002"]
        assert [e["version"] for e in t.versions()] == [3, 4]
        # survivors still read; expired versions are unresolvable
        assert t.read(spark, version=4).count() == 3
        with pytest.raises(LookupError):
            t.read(spark, version=1)

    def test_rollback_target_survives_expiry(self, spark, tmp_path_factory):
        t = SnapshotTable(str(tmp_path_factory.mktemp("expr") / "t"))
        t.write(spark.range(0, 5).toDF("id"), ts=100.0)   # v1
        t.write(spark.range(0, 9).toDF("id"), ts=101.0)   # v2
        t.rollback(1, ts=102.0)                           # v3 -> v1's dir
        expired, removed = t.expire_snapshots(keep_last=1)
        assert expired == [1, 2]
        # v1's DATA DIR is still referenced by the surviving rollback entry
        assert removed == ["v00002"]
        assert t.read(spark).count() == 5

    def test_min_ts_overrides_count(self, spark, tmp_path_factory):
        t = SnapshotTable(str(tmp_path_factory.mktemp("expt") / "t"))
        for i in range(4):
            t.write(spark.range(0, i + 1).toDF("id"), ts=float(100 + i))
        expired, _ = t.expire_snapshots(keep_last=1, min_ts=101.0)
        assert expired == [1]  # v2..v4 kept by ts even though keep_last=1
        assert [e["version"] for e in t.versions()] == [2, 3, 4]

    def test_crash_between_commit_and_cleanup_is_safe(self, spark, tmp_path_factory):
        import os as _os

        t = SnapshotTable(str(tmp_path_factory.mktemp("expc") / "t"))
        for i in range(3):
            t.write(spark.range(0, i + 1).toDF("id"), ts=float(100 + i))
        # simulate the crash window: manifest shrunk, dirs not yet removed
        entries = t.versions()
        t._commit(entries[-1:])
        assert _os.path.isdir(_os.path.join(t.path, "v00001"))  # orphan
        # the next retention call reclaims the crash orphans even though
        # their manifest entries are already gone
        expired, removed = t.expire_snapshots(keep_last=1)
        assert expired == []
        assert removed == ["v00001", "v00002"]
        assert t.read(spark).count() == 3

    def test_keep_last_validation(self, tmp_path_factory):
        t = SnapshotTable(str(tmp_path_factory.mktemp("expv") / "t"))
        with pytest.raises(ValueError):
            t.expire_snapshots(keep_last=0)
