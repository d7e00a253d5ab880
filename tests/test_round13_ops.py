"""Round-13 correctness pins: collision-safe lineage placement for
``write()``/``publish(mode='overwrite')`` (VERDICT r12 What's-wrong 1 — the
last mutator whose payload placement could clobber a concurrent writer's
committed data), schema tracking carried through overwrite publishes with a
name-AND-type staged gate (ADVICE r12 medium/low), and forward schema drift
on the streaming tail (ADVICE r12 medium — a generation created by a
mid-stream ``evolve_schema`` must project, not KeyError)."""

from __future__ import annotations

import os
import threading

import pytest
from pyspark.sql import functions as F

from iceberg_evolve_spark.sources.snapshots import (
    CommitConflict,
    SnapshotTable,
)


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path)


class TestWriteRaceSafety:
    """write()'s lineage-dir placement can never destroy committed data:
    the preferred deterministic name is claimed by atomic rename (fails on
    an existing non-empty dir), and collisions fall back to a uuid-suffixed
    lineage name — there is no rmtree on this path anymore."""

    def test_existing_dir_at_preferred_name_survives(self, spark, tdir):
        path = os.path.join(tdir, "t")
        t = SnapshotTable(path)
        t.write(spark.range(0, 10))
        # a crash orphan (or a concurrent writer's payload) at the next
        # version's preferred name — pre-r13 write() rmtree'd it
        orphan = os.path.join(path, "v00002")
        os.makedirs(orphan)
        marker = os.path.join(orphan, "part-committed.parquet")
        with open(marker, "wb") as fh:
            fh.write(b"not mine to delete")
        v = t.write(spark.range(0, 5))
        assert v == 2
        assert os.path.exists(marker), "existing dir must never be deleted"
        head = t.versions()[-1]
        assert head["data_dir"].startswith("v00002-")
        assert t.read(spark).count() == 5

    def test_concurrent_writes_keep_all_committed_files(self, spark, tdir):
        path = os.path.join(tdir, "t")
        SnapshotTable(path).write(spark.range(0, 10))
        conflicts: list[Exception] = []
        errs: list[Exception] = []
        barrier = threading.Barrier(2)

        def writer(lo):
            try:
                barrier.wait()
                for i in range(2):
                    try:
                        SnapshotTable(path).write(
                            spark.range(lo + i * 100, lo + i * 100 + 50)
                        )
                    except CommitConflict as exc:
                        conflicts.append(exc)
            except Exception as exc:  # noqa: BLE001
                errs.append(exc)

        threads = [
            threading.Thread(target=writer, args=(b,)) for b in (1000, 2000)
        ]
        [th.start() for th in threads]
        [th.join(300) for th in threads]
        assert not errs, errs
        t = SnapshotTable(path)
        entries = t.versions()
        versions = [e["version"] for e in entries]
        assert versions == list(range(1, len(versions) + 1))
        # THE invariant: every committed entry's manifest-listed data files
        # exist on disk — no writer ever deleted another's committed payload
        for e in entries:
            for f in t._entry_abs_files(e):
                assert os.path.exists(f), (e["version"], f)
        assert t.read(spark).count() == 50  # head is one writer's payload

    def test_chaos_mix_with_write_and_publish(self, spark, tdir):
        """VERDICT r12 next-round item 1: write() and stage->publish join
        the concurrent mix; afterwards every committed entry's files exist."""
        path = os.path.join(tdir, "t")
        SnapshotTable(path).write(spark.range(0, 100))
        errs: list[Exception] = []
        barrier = threading.Barrier(4)

        def appender(base):
            try:
                barrier.wait()
                for i in range(2):
                    try:
                        SnapshotTable(path).append(
                            spark.range(base + i * 10, base + i * 10 + 10)
                        )
                    except CommitConflict:
                        # an append composed against state a racing
                        # write()/publish replaced — correct refusal
                        pass
            except Exception as exc:  # noqa: BLE001
                errs.append(exc)

        def writer():
            try:
                barrier.wait()
                for i in range(2):
                    try:
                        SnapshotTable(path).write(spark.range(0, 30 + i))
                    except CommitConflict:
                        pass  # raced — the data dir is an orphan, never a loss
            except Exception as exc:  # noqa: BLE001
                errs.append(exc)

        def publisher():
            try:
                barrier.wait()
                for i in range(2):
                    t = SnapshotTable(path)
                    sid = f"chaos-{i}"
                    t.stage(spark.range(0, 40 + i), sid)
                    try:
                        t.publish(sid)
                    except CommitConflict:
                        pass
            except Exception as exc:  # noqa: BLE001
                errs.append(exc)

        threads = [
            threading.Thread(target=appender, args=(1000,)),
            threading.Thread(target=appender, args=(2000,)),
            threading.Thread(target=writer),
            threading.Thread(target=publisher),
        ]
        [th.start() for th in threads]
        [th.join(600) for th in threads]
        assert not errs, errs
        t = SnapshotTable(path)
        entries = t.versions()
        versions = [e["version"] for e in entries]
        assert versions == list(range(1, len(versions) + 1))
        for e in entries:
            for f in t._entry_abs_files(e):
                assert os.path.exists(f), (e["version"], f)
        t.read(spark).count()  # head readable

    def test_uuid_lineage_orphan_is_swept(self, spark, tdir):
        path = os.path.join(tdir, "t")
        t = SnapshotTable(path)
        t.write(spark.range(0, 10))
        os.makedirs(os.path.join(path, "v00002"))  # deterministic orphan
        t.write(spark.range(0, 5))  # lands at v00002-<uuid>
        t.write(spark.range(0, 7))
        live = {e["data_dir"] for e in t.versions()}
        _expired, removed = t.expire_snapshots(keep_last=3)
        # the deterministic orphan is reclaimed; live uuid-suffixed lineage
        # dirs survive the sweep
        assert "v00002" in removed
        for d in live:
            assert os.path.isdir(os.path.join(path, d))
        assert t.read(spark).count() == 7


class TestPublishTrackingAndTypeGate:
    """ADVICE r12: overwrite publishes keep schema tracking, and the staged
    gate compares TYPES, not just names."""

    def _tracked(self, spark, tdir):
        t = SnapshotTable(os.path.join(tdir, "t"))
        t.write(
            spark.range(0, 6).select(
                F.col("id").cast("int").alias("k"),
                (F.col("id") * 2).cast("int").alias("val"),
            ),
            track_schema=True,
        )
        return t

    def test_overwrite_publish_carries_tracking(self, spark, tdir):
        t = self._tracked(spark, tdir)
        sid_before = t.versions()[-1]["schema_id"]
        t.stage(
            spark.range(10, 16).select(
                F.col("id").cast("int").alias("k"),
                (F.col("id") * 3).cast("int").alias("val"),
            ),
            "ow",
        )
        t.publish("ow")  # mode="overwrite"
        assert t.table_schema() is not None
        head = t.versions()[-1]
        assert head["schema_id"] == sid_before
        assert set(head["manifest_schemas"].values()) == {sid_before}
        # the append drift-gate is still armed on the published lineage
        with pytest.raises(ValueError, match="drift"):
            t.append(
                spark.range(0, 2).select(
                    F.col("id").cast("int").alias("k"),
                    (F.col("id") * 2).cast("int").alias("val"),
                    F.lit("x").alias("extra"),
                )
            )

    def test_overwrite_publish_refuses_drifted_types(self, spark, tdir):
        t = self._tracked(spark, tdir)
        t.stage(
            spark.range(10, 16).select(
                F.col("id").cast("int").alias("k"),
                F.col("id").alias("val"),  # LONG files on an int table
            ),
            "bad",
        )
        with pytest.raises(ValueError, match="types drift"):
            t.publish("bad")

    def test_append_publish_refuses_drifted_types(self, spark, tdir):
        """Pre-r13 the append-publish gate compared NAMES only: int files
        on a widened-to-long table were stamped with the current schema
        generation and read without projection."""
        t = self._tracked(spark, tdir)
        t.stage(
            spark.range(10, 16).select(
                F.col("id").cast("int").alias("k"),
                F.col("id").alias("val"),
            ),
            "bad",
        )
        with pytest.raises(ValueError, match="types drift"):
            t.publish("bad", mode="append")

    def test_matching_stage_publishes_both_modes(self, spark, tdir):
        t = self._tracked(spark, tdir)
        batch = spark.range(10, 13).select(
            F.col("id").cast("int").alias("k"),
            (F.col("id") * 2).cast("int").alias("val"),
        )
        t.stage(batch, "a")
        t.publish("a", mode="append")
        assert t.read(spark).count() == 9
        t.stage(batch, "b")
        t.publish("b")  # overwrite
        assert t.read(spark).count() == 3
        assert t.table_schema() is not None


class TestStreamForwardDrift:
    """ADVICE r12 medium: files committed under a schema id CREATED after
    reader construction (mid-stream evolve) must project by field id in
    project mode — the pinned map alone predates the new generation."""

    def _reader(self, path, **opts):
        from iceberg_evolve_spark.sources.snapshot_stream import (
            SnapshotStreamReader,
        )

        return SnapshotStreamReader({"path": path, **opts})

    def _evolve_after(self, spark, t):
        import copy

        from iceberg_evolve_spark.schema import Schema

        j = copy.deepcopy(t.table_schema().to_json())
        for f in j["fields"]:
            if f["name"] == "val":
                f["name"] = "value"
        t.evolve_schema(Schema.from_json(j))
        t.append(
            spark.range(100, 103).select(
                F.col("id").cast("int").alias("k"),
                (F.col("id") * 2).cast("int").alias("value"),
            )
        )

    def test_project_mode_projects_forward_generation(self, spark, tdir):
        t = SnapshotTable(os.path.join(tdir, "t"))
        t.write(
            spark.range(0, 6).select(
                F.col("id").cast("int").alias("k"),
                (F.col("id") * 2).cast("int").alias("val"),
            ),
            track_schema=True,
        )
        reader = self._reader(t.path, on_schema_change="project")
        start = reader.initialOffset()
        # table evolves AFTER the reader pinned its schema map
        self._evolve_after(spark, t)
        end = reader.latestOffset()
        parts = reader.partitions(start, end)
        drifted = [p for p in parts if p.sid != 0]
        assert drifted, "expected partitions of the new generation"
        assert all(p.gen_json is not None for p in drifted)
        rows = []
        for p in parts:
            for batch in reader.read(p):
                rows.extend(batch.to_pylist())
        got = sorted((r["k"], r["val"]) for r in rows)
        assert got == [(i, 2 * i) for i in range(6)] + [
            (i, 2 * i) for i in range(100, 103)
        ]

    def test_fail_mode_still_refuses_forward_generation(self, spark, tdir):
        t = SnapshotTable(os.path.join(tdir, "t"))
        t.write(
            spark.range(0, 3).select(
                F.col("id").cast("int").alias("k"),
                (F.col("id") * 2).cast("int").alias("val"),
            ),
            track_schema=True,
        )
        reader = self._reader(t.path)  # on_schema_change="fail"
        start = reader.initialOffset()
        self._evolve_after(spark, t)
        end = reader.latestOffset()
        parts = reader.partitions(start, end)
        drifted = [p for p in parts if p.sid != 0]
        assert drifted
        with pytest.raises(ValueError, match="schema id"):
            for p in drifted:
                list(reader.read(p))
