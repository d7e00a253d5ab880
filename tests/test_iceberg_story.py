"""End-to-end composition of the table-format layer: the lifecycle a real
Iceberg table goes through, run across this repo's pieces in one flow —
snapshots → row-level deletes (merge-on-read) → schema evolution with v3
defaults → schema-on-read across generations → metadata tables → retention.

Each piece has its own battery (test_snapshots / test_round7_ops /
test_evolve_flow); this file proves they COMPOSE, because that composition is
the product: a user evolves a live table that already has delete files, and
old data must remain readable under the new schema without a rewrite.
"""

import os

import pytest
from pyspark.sql import functions as F

from iceberg_evolve_spark.diff import SchemaDiff
from iceberg_evolve_spark.model import Field, PrimitiveType, StructType
from iceberg_evolve_spark.operators.evolution import AddColumn
from iceberg_evolve_spark.operators.migrate_df import union_by_field_id
from iceberg_evolve_spark.sources.snapshots import SnapshotTable
from iceberg_evolve_spark.spark_convert import struct_from_spark


@pytest.fixture(scope="module")
def story(spark, tmp_path_factory):
    """Run the whole lifecycle once; tests assert on its stages."""
    t = SnapshotTable(str(tmp_path_factory.mktemp("story") / "t"))

    # -- generation 1: schema A = (id, status, amount int) ------------------
    gen1 = spark.range(0, 100).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 0, "dead").otherwise("live").alias("status"),
        (F.col("id") % 7).cast("int").alias("amount"),
    )
    t.write(gen1, note="gen1", ts=100.0)                       # v1

    # -- row-level delete, merge-on-read ------------------------------------
    t.delete_where(spark, F.col("status") == "dead", ts=200.0)  # v2: -10 rows

    # -- schema evolution: widen amount, add channel with defaults ----------
    schema_a = struct_from_spark(gen1.schema)
    by_name = {f.name: f for f in schema_a.fields}
    schema_b = StructType(
        (
            by_name["id"],
            by_name["status"],
            Field(by_name["amount"].field_id, "amount", PrimitiveType("long")),
            Field(
                9001,
                "channel",
                PrimitiveType("string"),
                initial_default="legacy",
                write_default="api",
            ),
        )
    )
    ops = SchemaDiff.from_schemas(schema_a, schema_b).to_evolution_operations()

    # -- generation 2 written AFTER the evolution, under schema B -----------
    gen2 = spark.range(100, 130).select(
        F.col("id"),
        F.lit("live").alias("status"),
        (F.col("id") % 7).cast("long").alias("amount"),
        F.lit("api").alias("channel"),
    )
    t2 = SnapshotTable(str(tmp_path_factory.mktemp("story") / "t2"))
    t2.write(gen2, note="gen2", ts=300.0)

    return {
        "t": t,
        "t2": t2,
        "schema_a": schema_a,
        "schema_b": schema_b,
        "ops": ops,
    }


def test_evolution_plan_carries_the_default(story):
    adds = [o for o in story["ops"] if isinstance(o, AddColumn)]
    assert len(adds) == 1 and adds[0].name == "channel"
    assert adds[0].initial_default == "legacy"
    assert "DEFAULT 'api'" in adds[0].to_sql("t")[0]


def test_schema_on_read_unifies_generations_over_mor_deletes(spark, story):
    """Old-generation rows (read through their delete stack) surface under
    schema B with the initial default; new-generation rows keep real
    values. No rewrite happened anywhere."""
    unified = union_by_field_id(
        [
            (story["t"].read(spark), story["schema_a"]),   # MOR applied here
            (story["t2"].read(spark), story["schema_b"]),
        ],
        story["schema_b"],
    )
    rows = unified.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n"), F.sum("amount").alias("s")
    )
    got = {r["channel"]: (r["n"], r["s"]) for r in rows.collect()}
    # gen1: 100 rows minus the 10 'dead' (ids 0,10,..,90); amount = id % 7
    live_ids = [i for i in range(100) if i % 10 != 0]
    assert got["legacy"] == (90, sum(i % 7 for i in live_ids))
    assert got["api"] == (30, sum(i % 7 for i in range(100, 130)))
    # widen took effect: amount is long everywhere
    assert dict(unified.dtypes)["amount"] == "bigint"


def test_metadata_tables_reflect_the_delete_stack(spark, story):
    t = story["t"]
    snaps = {r["version"]: r for r in t.snapshots_df(spark).collect()}
    assert snaps[1]["n_delete_files"] == 0
    assert snaps[2]["n_delete_files"] == 1
    files = t.files_df(spark, stats_cols=["id"]).collect()
    by_content = {}
    for r in files:
        by_content.setdefault(r["content"], []).append(r)
    assert sum(r["n_rows"] for r in by_content["data"]) == 100
    assert sum(r["n_rows"] for r in by_content["pos-delete"]) == 10


def test_compaction_then_retention_finishes_the_story(spark, story):
    t = story["t"]
    t.rewrite_data_files(spark, ts=400.0)
    expired, removed = t.expire_snapshots(keep_last=1)
    assert t.read(spark).count() == 90
    assert not t.versions()[-1].get("deletes")
    # the delete file is reclaimed, and so are the data files the scoped
    # compaction replaced (files, not dirs, are the unit under the shared
    # lineage dir — r10 manifest-list layout)
    assert any(d.startswith("d") for d in removed)
    assert any(
        r.startswith("v") and r.endswith(".parquet") for r in removed
    )
    # nothing but the surviving lineage dir remains
    leftovers = [
        n
        for n in os.listdir(t.path)
        if os.path.isdir(os.path.join(t.path, n))
    ]
    assert leftovers == [t.versions()[-1]["data_dir"]]
    # and every file inside it is manifest-listed (no orphans survive)
    live = set(t._entry_files(t.versions()[-1]))
    on_disk = set()
    dd = os.path.join(t.path, leftovers[0])
    for root, _dirs, names in os.walk(dd):
        for n in names:
            if n.endswith(".parquet"):
                on_disk.add(os.path.relpath(os.path.join(root, n), dd))
    assert on_disk == live
