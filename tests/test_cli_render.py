"""CLI + renderer tests (reference test_cli.py / test_renderer.py semantics)."""

import json
import subprocess
import sys

import pytest

from iceberg_evolve_spark.diff import SchemaDiff
from iceberg_evolve_spark.render import EvolutionOperationsRenderer, SchemaDiffRenderer

from conftest import FIXTURES

CUR = str(FIXTURES / "users_current.iceberg.json")
NEW = str(FIXTURES / "users_new.iceberg.json")


def run_cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "iceberg_evolve_spark.cli", *args],
        capture_output=True,
        text=True,
        cwd=str(FIXTURES.parent.parent),
    )


class TestCliDiff:
    def test_json_output_is_valid_and_complete(self):
        # regression for the reference's --json AttributeError (cli.py:59)
        res = run_cli("diff", CUR, NEW, "--json")
        assert res.returncode == 0, res.stderr
        ops = json.loads(res.stdout)
        assert len(ops) == 9
        assert {o["op"] for o in ops} == {
            "rename_column",
            "update_column",
            "add_column",
            "drop_column",
            "move_column",
        }

    def test_human_output(self):
        res = run_cli("diff", CUR, NEW, "--no-color")
        assert res.returncode == 0
        assert "ADDED" in res.stdout
        assert "REMOVED" in res.stdout
        assert "CHANGED" in res.stdout
        assert "signup renamed to: signup_datetime" in res.stdout
        assert "WARNING" in res.stdout  # nested list<int>->list<struct> unsupported

    def test_match_by_name(self):
        res = run_cli("diff", CUR, NEW, "--match-by", "name", "--json")
        ops = json.loads(res.stdout)
        assert all(o["op"] in ("add_column", "update_column") for o in ops)

    def test_bad_file_errors(self):
        res = run_cli("diff", "/nonexistent.json", NEW)
        assert res.returncode != 0

    def test_sql_only_evolve(self):
        res = run_cli(
            "evolve",
            "--table",
            "cat.db.users",
            "--schema-path",
            NEW,
            "--current-schema",
            CUR,
            "--sql-only",
            "--quiet",
            "--no-strict",
            "--allow-breaking",
        )
        assert res.returncode == 0, res.stderr
        stmts = [l for l in res.stdout.splitlines() if l.startswith("ALTER")]
        # 7 statements: the signup date→timestamp promotion no longer compiles
        # (not engine-legal on Iceberg v2), leaving 2 renames, 2 adds, 2 drops,
        # 1 move.
        assert len(stmts) == 7
        assert stmts[0].startswith("ALTER TABLE cat.db.users RENAME")
        assert not any("TYPE TIMESTAMP" in s for s in stmts)


class TestRenderers:
    @pytest.fixture(scope="class")
    def diff(self, users_current, users_new):
        return SchemaDiff.from_schemas(users_current.struct, users_new.struct)

    def test_nested_suppression(self, diff):
        lines = SchemaDiffRenderer(diff, use_color=False).lines()
        text = "\n".join(lines)
        # metadata.used_login IS shown (its parent 'metadata' isn't in ADDED)
        assert "metadata.used_login" in text

    def test_ops_renderer_filters_nested(self, diff):
        ops = diff.to_evolution_operations()
        lines = EvolutionOperationsRenderer(ops, use_color=False).lines()
        body = [l for l in lines if l and not l.startswith(("WARNING", "  -"))]
        assert not any("metadata." in l for l in body)
        # warning block lists the unsupported nested update
        assert any("login_attempts" in l for l in lines)

    def test_color_toggle(self, diff):
        colored = "\n".join(SchemaDiffRenderer(diff, use_color=True).lines())
        plain = "\n".join(SchemaDiffRenderer(diff, use_color=False).lines())
        assert "\x1b[" in colored and "\x1b[" not in plain
