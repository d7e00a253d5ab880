"""Driver-contract test: every queries() entry runs and matches its DuckDB
oracle at sf0.001 (the driver's own gate runs the same comparison at sf0.01)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod
from iceberg_evolve_spark.sources.tables import TABLES


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def _norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(cols), sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns


def test_every_query_has_oracle_or_documented_absence():
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    missing = set(qs) - set(os_)
    assert missing == set()  # every entry is oracle-checked (r3: IVF included)


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_matches_oracle(name, spark, sf_dir, oracle_con):
    fn = entry_mod.queries()[name]
    sdf = fn(spark, sf_dir)
    scols, srows = _norm(sdf.columns, [tuple(r) for r in sdf.collect()])
    oracle = entry_mod.oracle_sql().get(name)
    if oracle is None:
        assert len(srows) >= 0
        return
    res = oracle_con.execute(oracle)
    ocols, orows = _norm([d[0] for d in res.description], res.fetchall())
    assert scols == ocols
    assert len(srows) == len(orows)
    assert srows == orows


def test_sql_api_parity(spark, sf_dir):
    """The engine is usable through plain spark.sql over registered views —
    same results as the DataFrame formulation (same Catalyst plan space)."""
    from pyspark.sql import functions as F

    from iceberg_evolve_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    via_sql = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(ROUND(l_quantity, 1) AS DECIMAL(22,1))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """
    )
    li = spark.table("lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    via_df = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.round(F.col("l_quantity"), 1).cast("decimal(22,1)"))
        .cast("double")
        .alias("sum_qty"),
        F.count("*").alias("count_order"),
    )
    a = sorted(tuple(r) for r in via_sql.collect())
    b = sorted(tuple(r) for r in via_df.collect())
    assert a == b
