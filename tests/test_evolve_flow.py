"""evolve() control flow + DDL compilation (reference test_schema.py /
test_migrate.py semantics, re-targeted at the Spark DDL backend)."""

import warnings

import pytest

from iceberg_evolve_spark.exceptions import UnsupportedSchemaEvolutionWarning
from iceberg_evolve_spark.jsonschema import struct_from_json_schema, struct_to_json_schema
from iceberg_evolve_spark.model import Field, ListType, PrimitiveType, StructType
from iceberg_evolve_spark.operators.evolution import (
    AddColumn,
    DropColumn,
    MoveColumn,
    RenameColumn,
    UpdateColumn,
)
from iceberg_evolve_spark.operators.executor import CollectingExecutor, compile_plan
from iceberg_evolve_spark.schema import Schema

from conftest import FIXTURES, load_fixture

P = PrimitiveType


class TestDDLCompile:
    def test_add_column(self):
        op = AddColumn(name="is_active", new_type=P("boolean"), doc="active flag")
        assert op.to_sql("cat.db.users") == [
            "ALTER TABLE cat.db.users ADD COLUMN is_active BOOLEAN COMMENT 'active flag'"
        ]

    def test_nested_add(self):
        op = AddColumn(name="metadata.used_login", new_type=P("string"))
        assert op.to_sql("t") == ["ALTER TABLE t ADD COLUMN metadata.used_login STRING"]

    def test_drop(self):
        assert DropColumn(name="comments").to_sql("t") == [
            "ALTER TABLE t DROP COLUMN comments"
        ]

    def test_rename(self):
        assert RenameColumn(name="signup", target="signup_datetime").to_sql("t") == [
            "ALTER TABLE t RENAME COLUMN signup TO signup_datetime"
        ]

    def test_update_type(self):
        op = UpdateColumn(name="x", current_type=P("int"), new_type=P("long"))
        assert op.to_sql("t") == ["ALTER TABLE t ALTER COLUMN x TYPE BIGINT"]

    def test_update_type_date_to_timestamp_refused(self):
        # Not engine-legal on Iceberg v2 (v3-only promotion): warn, no DDL.
        op = UpdateColumn(name="signup", current_type=P("date"), new_type=P("timestamp"))
        with warnings.catch_warnings(record=True) as ws:
            warnings.simplefilter("always")
            assert op.to_sql("t") == []
        assert any("engine-legal" in str(x.message) for x in ws)

    def test_update_unsupported_emits_nothing(self):
        op = UpdateColumn(
            name="metadata.login_attempts",
            current_type=ListType(13, P("int")),
            new_type=ListType(
                13,
                StructType([Field(14, "timestamp", P("int")), Field(15, "success", P("boolean"))]),
            ),
        )
        assert not op.is_supported
        with pytest.warns(UnsupportedSchemaEvolutionWarning):
            assert op.to_sql("t") == []

    def test_move_first_and_after(self):
        assert MoveColumn(name="a", position="first").to_sql("t") == [
            "ALTER TABLE t ALTER COLUMN a FIRST"
        ]
        assert MoveColumn(name="a", target="b", position="after").to_sql("t") == [
            "ALTER TABLE t ALTER COLUMN a AFTER b"
        ]

    def test_quoting(self):
        op = AddColumn(name="weird col.sub-field", new_type=P("int"))
        assert op.to_sql("t") == [
            "ALTER TABLE t ADD COLUMN `weird col`.`sub-field` INT"
        ]


class TestEvolveFlow:
    def test_dry_run_returns_ops_applies_nothing(self, users_current, users_new):
        ex = CollectingExecutor("cat.db.users")
        ops = users_current.evolve(users_new, ex, dry_run=True, quiet=True)
        assert len(ops) == 9
        assert ex.statements == []

    def test_strict_rejects_unsupported(self, users_current, users_new):
        ex = CollectingExecutor("cat.db.users")
        with pytest.raises(ValueError, match="Unsupported"):
            users_current.evolve(users_new, ex, quiet=True, strict=True)

    def test_breaking_gate(self, users_current, users_new):
        ex = CollectingExecutor("cat.db.users")
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            with pytest.raises(ValueError, match="Breaking"):
                users_current.evolve(users_new, ex, quiet=True, strict=False)

    def test_full_apply_three_phases(self, users_current, users_new):
        ex = CollectingExecutor("cat.db.users")
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            users_current.evolve(
                users_new, ex, quiet=True, strict=False, allow_breaking=True
            )
        stmts = ex.statements
        # phase barriers: one refresh per non-empty phase
        assert ex.refresh_count == 3
        # renames first, moves last
        assert stmts[0].startswith("ALTER TABLE cat.db.users RENAME")
        assert stmts[1].startswith("ALTER TABLE cat.db.users RENAME")
        assert "AFTER signup_datetime" in stmts[-1]
        # the unsupported nested update emitted nothing
        assert not any("login_attempts" in s and "TYPE" in s for s in stmts)
        # date→timestamp is NOT an engine-legal in-place promotion (Iceberg v2
        # rejects it; v3-only) — the op must warn and emit no TYPE statement.
        assert not any("signup_datetime TYPE" in s for s in stmts)

    def test_quiet_false_displays(self, users_current, users_new, capsys):
        ex = CollectingExecutor("t")
        users_current.evolve(users_new, ex, dry_run=True, quiet=False)
        out = capsys.readouterr().out
        assert "rename_column" in out and "add_column" in out


class TestJsonSchemaConversion:
    def test_fixture_converts(self):
        doc = load_fixture("users_current.json")
        struct = struct_from_json_schema(doc)
        names = [f.name for f in struct.fields]
        assert "id" in names and "metadata" in names
        by_name = {f.name: f for f in struct.fields}
        assert by_name["id"].required  # in the fixture's required list
        # signup_date has format date-time → timestamp
        assert any(
            f.type == P("timestamp") for f in struct.fields if "signup" in f.name
        )

    def test_array_and_map(self):
        struct = struct_from_json_schema(
            {
                "type": "object",
                "properties": {
                    "tags": {"type": "array", "items": {"type": "string"}},
                    "attrs": {
                        "type": "object",
                        "additionalProperties": {"type": "integer"},
                    },
                },
            }
        )
        by_name = {f.name: f for f in struct.fields}
        assert isinstance(by_name["tags"].type, ListType)
        assert str(by_name["attrs"].type) == "map<string, int>"

    def test_reverse_lossy_map(self, users_current):
        out = struct_to_json_schema(users_current.struct)
        assert out["type"] == "object"
        assert out["properties"]["age"] == {"type": "integer"}
        assert out["properties"]["signup"] == {"type": "string"}
        assert "id" in out["required"]


class TestEngineLegalPromotionGate:
    def test_illegal_promotion_warns_and_compiles_no_ddl(self):
        import warnings as w

        from iceberg_evolve_spark.exceptions import UnsupportedSchemaEvolutionWarning
        from iceberg_evolve_spark.model import PrimitiveType
        from iceberg_evolve_spark.operators.evolution import UpdateColumn

        op = UpdateColumn(
            name="x",
            current_type=PrimitiveType("int"),
            new_type=PrimitiveType("float"),
        )
        # reference lattice says int→float is non-breaking…
        assert not op.is_breaking()
        # …but the engine can't apply it in place: no DDL, loud warning
        with w.catch_warnings(record=True) as ws:
            w.simplefilter("always")
            stmts = op.to_sql("cat.db.t")
        assert stmts == []
        assert any(
            isinstance(x.message, UnsupportedSchemaEvolutionWarning)
            and "engine-legal" in str(x.message)
            for x in ws
        )

    def test_legal_promotion_compiles(self):
        from iceberg_evolve_spark.model import PrimitiveType
        from iceberg_evolve_spark.operators.evolution import UpdateColumn

        op = UpdateColumn(
            name="x",
            current_type=PrimitiveType("int"),
            new_type=PrimitiveType("long"),
        )
        assert op.to_sql("cat.db.t") == [
            "ALTER TABLE cat.db.t ALTER COLUMN x TYPE BIGINT"
        ]


class TestSetNullability:
    def _schemas(self):
        cur = Schema(
            StructType(
                [
                    Field(1, "id", PrimitiveType("long"), required=True),
                    Field(2, "note", PrimitiveType("string"), required=False),
                ]
            )
        )
        new = Schema(
            StructType(
                [
                    Field(1, "id", PrimitiveType("long"), required=False),
                    Field(2, "note", PrimitiveType("string"), required=True),
                ]
            )
        )
        return cur, new

    def test_planned_from_required_changed_and_compiled(self):
        from iceberg_evolve_spark.operators.evolution import SetNullability

        cur, new = self._schemas()
        diff = cur.diff(new, include_required_changes=True)
        ops = diff.to_evolution_operations()
        flips = [op for op in ops if isinstance(op, SetNullability)]
        assert {(op.name, op.required) for op in flips} == {
            ("id", False),
            ("note", True),
        }
        drop = next(op for op in flips if not op.required)
        assert not drop.is_breaking()
        assert drop.to_sql("cat.db.t") == [
            "ALTER TABLE cat.db.t ALTER COLUMN id DROP NOT NULL"
        ]
        seto = next(op for op in flips if op.required)
        assert seto.is_breaking()
        with warnings.catch_warnings(record=True) as ws:
            warnings.simplefilter("always")
            assert seto.to_sql("cat.db.t") == [
                "ALTER TABLE cat.db.t ALTER COLUMN note SET NOT NULL"
            ]
        assert any("backfill" in str(x.message) for x in ws)

    def test_evolve_applies_flips_through_executor(self):
        cur, new = self._schemas()
        ex = CollectingExecutor("cat.db.t")
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            cur.evolve(
                new,
                ex,
                quiet=True,
                allow_breaking=True,  # SET NOT NULL is breaking
                include_required_changes=True,
            )
        assert "ALTER TABLE cat.db.t ALTER COLUMN id DROP NOT NULL" in ex.statements
        assert "ALTER TABLE cat.db.t ALTER COLUMN note SET NOT NULL" in ex.statements

    def test_breaking_gate_blocks_set_not_null(self):
        cur, new = self._schemas()
        ex = CollectingExecutor("cat.db.t")
        with pytest.raises(ValueError, match="Breaking operations"):
            cur.evolve(new, ex, quiet=True, include_required_changes=True)

    def test_flips_off_by_default_for_reference_parity(self):
        cur, new = self._schemas()
        assert cur.diff(new).is_empty()


class TestMergeUpsert:
    def test_update_insert_keep_and_delete_missing(self, spark):
        from iceberg_evolve_spark.operators.merge import merge_upsert

        target = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, name string, v double"
        )
        updates = spark.createDataFrame(
            [(2, "b2", 99.0), (4, "d", 40.0)], "k long, name string, v double"
        )
        got = sorted(tuple(r) for r in merge_upsert(target, updates, "k").collect())
        assert got == [(1, "a", 10.0), (2, "b2", 99.0), (3, "c", 30.0), (4, "d", 40.0)]

        snap = sorted(
            tuple(r) for r in merge_upsert(target, updates, "k", delete_missing=True).collect()
        )
        assert snap == [(2, "b2", 99.0), (4, "d", 40.0)]

    def test_schema_mismatch_rejected(self, spark):
        from iceberg_evolve_spark.operators.merge import merge_upsert

        t = spark.createDataFrame([(1, "a")], "k long, name string")
        u = spark.createDataFrame([(1,)], "k long")
        import pytest as _pt

        with _pt.raises(ValueError, match="migrate_dataframe"):
            merge_upsert(t, u, "k")
