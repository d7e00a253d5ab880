"""CLI: ``diff`` / ``evolve`` / ``serialize`` (reference ``iceberg_evolve/cli.py``
C1–C3, rebuilt on argparse since typer isn't available here).

Differences from the reference, on purpose:

* ``diff --json`` works — the reference calls ``op.to_dict()`` which doesn't
  exist there (latent AttributeError, reference ``cli.py:59``); our ops define
  it.
* ``evolve`` has three backends: ``--sql-only`` prints compiled ALTER TABLE DDL
  (no cluster needed), ``--backend sql`` executes DDL through a SparkSession
  against a catalog table, and ``--backend dataframe`` rewrites parquet data to
  the target schema (a capability the reference lacks).
* ``serialize`` can snapshot either a catalog table's schema or a parquet
  file's schema into Iceberg metadata JSON.

Run as ``python -m iceberg_evolve_spark.cli <command> ...``.
"""

from __future__ import annotations

import argparse
import json
import sys

from iceberg_evolve_spark.diff import SchemaDiff
from iceberg_evolve_spark.render import EvolutionOperationsRenderer, SchemaDiffRenderer
from iceberg_evolve_spark.schema import Schema


def _cmd_diff(args: argparse.Namespace) -> int:
    current = Schema.from_file(args.current)
    new = Schema.from_file(args.new)
    diff = current.diff(new, match_by=args.match_by)
    ops = diff.to_evolution_operations()
    if args.json:
        print(json.dumps([op.to_dict() for op in ops], indent=2))
    else:
        SchemaDiffRenderer(diff, use_color=not args.no_color).display()
        EvolutionOperationsRenderer(ops, use_color=not args.no_color).display()
    return 0


def _cmd_evolve(args: argparse.Namespace) -> int:
    current = (
        Schema.from_file(args.current_schema) if args.current_schema else None
    )
    new = Schema.from_file(args.schema_path)

    if args.sql_only:
        from iceberg_evolve_spark.operators.executor import CollectingExecutor

        if current is None:
            print("--sql-only requires --current-schema", file=sys.stderr)
            return 2
        ex = CollectingExecutor(args.table)
        current.evolve(
            new,
            ex,
            quiet=args.quiet,
            strict=args.strict,
            allow_breaking=args.allow_breaking,
            dry_run=False,
        )
        for stmt in ex.statements:
            print(stmt + ";")
        return 0

    from iceberg_evolve_spark.sources import get_session

    spark = get_session(app_name="iceberg-evolve-cli")

    if args.backend == "dataframe":
        if not args.input_parquet or not args.output_parquet:
            print("dataframe backend requires --input-parquet/--output-parquet", file=sys.stderr)
            return 2
        from iceberg_evolve_spark.operators.migrate_df import migrate_dataframe
        from iceberg_evolve_spark.spark_convert import struct_from_spark

        df = spark.read.parquet(args.input_parquet)
        cur_struct = current.struct if current else struct_from_spark(df.schema)
        out = migrate_dataframe(df, cur_struct, new.struct)
        out.write.mode("overwrite").parquet(args.output_parquet)
        print(f"migrated {args.input_parquet} -> {args.output_parquet}")
        return 0

    from iceberg_evolve_spark.operators.executor import SparkSQLExecutor

    cur = current or Schema.from_spark_table(spark, args.table)
    ex = SparkSQLExecutor(spark, args.table)
    result = cur.evolve(
        new,
        ex,
        dry_run=args.dry_run,
        quiet=args.quiet,
        strict=args.strict,
        allow_breaking=args.allow_breaking,
        return_applied_schema=args.return_applied_schema,
    )
    if args.return_applied_schema and isinstance(result, Schema):
        print(json.dumps(result.to_json(), indent=2))
    return 0


def _cmd_evolve_table(args: argparse.Namespace) -> int:
    """Evolve a schema-tracked :class:`SnapshotTable` IN PLACE as one
    metadata-only commit (round 12 — the reference's evolve flow,
    schema.py:152-283, pointed at the engine's own storage layer instead
    of an Iceberg catalog). Needs no Spark session: the diff, the gates,
    and the commit are all metadata work."""
    from iceberg_evolve_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(args.table_dir, branch=args.branch)
    cur = t.table_schema()
    if cur is None:
        print(
            f"{args.table_dir} is not schema-tracked — bootstrap the "
            "table with write(df, track_schema=True)",
            file=sys.stderr,
        )
        return 2
    new = Schema.from_file(args.schema_path)
    diff = cur.diff(new)
    ops = diff.to_evolution_operations()
    if args.json:
        print(json.dumps([op.to_dict() for op in ops], indent=2))
    elif not args.quiet:
        SchemaDiffRenderer(diff, use_color=not args.no_color).display()
        EvolutionOperationsRenderer(ops, use_color=not args.no_color).display()
    if args.dry_run:
        return 0
    head = t.versions()[-1]["version"]
    v = t.evolve_schema(new, allow_breaking=args.allow_breaking)
    if v == head:
        print("no schema changes — nothing committed")
    else:
        print(
            f"committed schema evolution as snapshot v{v} "
            "(metadata-only; zero data files touched)"
        )
    return 0


def _cmd_serialize(args: argparse.Namespace) -> int:
    from iceberg_evolve_spark.sources import get_session

    spark = get_session(app_name="iceberg-evolve-cli")
    if args.parquet:
        from iceberg_evolve_spark.spark_convert import struct_from_spark

        schema = Schema(struct_from_spark(spark.read.parquet(args.parquet).schema))
    else:
        schema = Schema.from_spark_table(spark, args.table)
    schema.to_file(args.output)
    print(f"wrote {args.output}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="iceberg-evolve-spark")
    sub = p.add_subparsers(dest="command", required=True)

    d = sub.add_parser("diff", help="diff two Iceberg schema JSON files")
    d.add_argument("current")
    d.add_argument("new")
    d.add_argument("--match-by", choices=["id", "name"], default="id")
    d.add_argument("--json", action="store_true")
    d.add_argument("--no-color", action="store_true")
    d.set_defaults(func=_cmd_diff)

    e = sub.add_parser("evolve", help="apply schema evolution to a table")
    e.add_argument("--table", "-t", default="table")
    e.add_argument("--schema-path", "-p", required=True, help="target schema JSON")
    e.add_argument("--current-schema", help="current schema JSON (else read from table)")
    e.add_argument("--backend", choices=["sql", "dataframe"], default="sql")
    e.add_argument("--input-parquet")
    e.add_argument("--output-parquet")
    e.add_argument("--sql-only", action="store_true", help="print DDL, touch nothing")
    e.add_argument("--dry-run", action="store_true")
    e.add_argument("--quiet", action="store_true")
    e.add_argument("--strict", action=argparse.BooleanOptionalAction, default=True)
    e.add_argument("--allow-breaking", action="store_true")
    e.add_argument("--return-applied-schema", action="store_true")
    e.set_defaults(func=_cmd_evolve)

    et = sub.add_parser(
        "evolve-table",
        help="metadata-only schema evolution of a SnapshotTable dir",
    )
    et.add_argument("--table-dir", "-d", required=True)
    et.add_argument("--schema-path", "-p", required=True, help="target schema JSON")
    et.add_argument("--branch", help="evolve a branch instead of main")
    et.add_argument("--dry-run", action="store_true")
    et.add_argument("--allow-breaking", action="store_true")
    et.add_argument("--json", action="store_true")
    et.add_argument("--quiet", action="store_true")
    et.add_argument("--no-color", action="store_true")
    et.set_defaults(func=_cmd_evolve_table)

    s = sub.add_parser("serialize", help="snapshot a table/parquet schema to JSON")
    s.add_argument("--table", "-t")
    s.add_argument("--parquet", help="parquet path instead of a catalog table")
    s.add_argument("--output", "-o", required=True)
    s.set_defaults(func=_cmd_serialize)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
