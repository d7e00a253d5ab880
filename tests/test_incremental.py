"""Incremental aggregate maintenance ≡ full recompute."""

from pyspark.sql import functions as F

from iceberg_evolve_spark.operators.incremental import aggregate_delta, merge_aggregates
from iceberg_evolve_spark.sources.tables import load_table

KEYS = ["o_orderpriority"]
SPEC = dict(
    sum_cols={"o_totalprice": "total"},
    min_cols={"o_orderdate": "first_order"},
    max_cols={"o_orderdate": "last_order"},
)


def _full(df):
    return aggregate_delta(df, KEYS, **SPEC)


def _rows(df):
    return {
        tuple(r[k] for k in KEYS): (r.n, round(r.total, 2), r.first_order, r.last_order)
        for r in df.collect()
    }


class TestIncrementalAggregates:
    def test_merge_equals_full_recompute(self, spark, sf_dir):
        orders = load_table(spark, sf_dir, "orders")
        cutoff = F.lit("1998-01-01").cast("timestamp")
        base = _full(orders.filter(F.col("o_orderdate") < cutoff))
        delta = orders.filter(F.col("o_orderdate") >= cutoff)
        merged = merge_aggregates(
            base,
            aggregate_delta(delta, KEYS, **SPEC),
            KEYS,
            sum_cols=["total"],
            min_cols=["first_order"],
            max_cols=["last_order"],
        )
        assert _rows(merged) == _rows(_full(orders))

    def test_merge_with_new_and_missing_keys(self, spark):
        mk = lambda rows: spark.createDataFrame(rows, "k string, v double, d timestamp")
        from datetime import datetime

        t1, t2 = datetime(2024, 1, 1), datetime(2024, 2, 1)
        base_rows = mk([("a", 1.0, t1), ("b", 2.0, t1)])
        delta_rows = mk([("b", 3.0, t2), ("c", 4.0, t2)])  # b updates, c is new, a untouched
        spec = dict(sum_cols={"v": "total"}, min_cols={"d": "lo"}, max_cols={"d": "hi"})
        base = aggregate_delta(base_rows, ["k"], **spec)
        merged = merge_aggregates(
            base, aggregate_delta(delta_rows, ["k"], **spec), ["k"],
            sum_cols=["total"], min_cols=["lo"], max_cols=["hi"],
        )
        got = {r.k: (r.n, r.total, r.lo, r.hi) for r in merged.collect()}
        assert got == {
            "a": (1, 1.0, t1, t1),
            "b": (2, 5.0, t1, t2),
            "c": (1, 4.0, t2, t2),
        }

    def test_repeated_merges_associative(self, spark, sf_dir):
        """day-by-day merging lands on the same result as one big merge."""
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderdate") < F.lit("1995-06-01").cast("timestamp")
        )
        m1 = F.lit("1995-03-01").cast("timestamp")
        m2 = F.lit("1995-05-01").cast("timestamp")
        parts = [
            orders.filter(F.col("o_orderdate") < m1),
            orders.filter((F.col("o_orderdate") >= m1) & (F.col("o_orderdate") < m2)),
            orders.filter(F.col("o_orderdate") >= m2),
        ]
        acc = _full(parts[0])
        for p in parts[1:]:
            acc = merge_aggregates(
                acc, _full(p), KEYS,
                sum_cols=["total"], min_cols=["first_order"], max_cols=["last_order"],
            )
        assert _rows(acc) == _rows(_full(orders))
