"""Local driver-style oracle check: run queries()[name] on Spark and
oracle_sql()[name] on DuckDB over the same sf dir, compare rows/schema/values.

Usage: python tests/_oracle_check.py [sf_dir] name1 name2 ...
       python tests/_oracle_check.py --all          (every oracle entry)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.01"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)

    import duckdb

    import __spark_entry__ as entry
    from iceberg_evolve_spark.sources import get_session

    qs = {**entry.queries(), **entry.queries_extended()}
    oracles = entry.oracle_sql()
    names = list(oracles) if args == ["--all"] else args

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    spark = get_session(app_name="oracle-check")
    spark.sparkContext.setLogLevel("ERROR")

    failures = 0
    for name in names:
        sdf = qs[name](spark, sf_dir).toPandas()
        odf = con.execute(oracles[name]).fetchdf()
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        ok_schema = scols == ocols
        ok_rows = len(sdf) == len(odf)
        ok_vals = False
        if ok_schema and ok_rows:
            a = sdf[scols].round(6).sort_values(scols).reset_index(drop=True)
            b = odf[scols].round(6)
            b = b.astype({c: a[c].dtype for c in scols if str(a[c].dtype) != "object"})
            b = b.sort_values(scols).reset_index(drop=True)
            ok_vals = a.equals(b)
            if not ok_vals:
                diff = (a != b) & ~(a.isna() & b.isna())
                bad = diff.any(axis=1)
                print(f"  first diffs for {name}:")
                print(a[bad].head(5))
                print(b[bad].head(5))
        status = "OK" if (ok_schema and ok_rows and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{status} {name}: spark_rows={len(sdf)} oracle_rows={len(odf)} "
            f"schema={ok_schema} values={ok_vals} "
            + ("" if ok_schema else f"spark_cols={scols} oracle_cols={ocols}")
        )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
