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


class TestRetractions:
    """merge_with_retractions == one-shot recompute over the post-delta
    state, including the cases the additive path cannot see: a deleted
    maximum and a fully-emptied group."""

    def _roll(self, df):
        return {
            r["k"]: (r["n"], r["s"], r["mx"])
            for r in df.groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx"))
            .collect()
        }

    def test_merge_equals_recompute_with_deletes(self, spark):
        from iceberg_evolve_spark.operators.incremental import (
            aggregate_delta,
            merge_with_retractions,
        )

        base = spark.createDataFrame(
            [(1, "a", 10), (2, "a", 99), (3, "b", 5), (4, "b", 7), (5, "c", 1)],
            "id long, k string, v long",
        )
        # delete the CURRENT MAX of group a (99), all of group c, insert into b
        delta = spark.createDataFrame(
            [(2, "a", 99, -1), (5, "c", 1, -1), (6, "b", 50, 1)],
            "id long, k string, v long, op int",
        )
        base_agg = aggregate_delta(
            base, ["k"], sum_cols={"v": "s"}, max_cols={"v": "mx"}
        )
        merged = merge_with_retractions(
            base_agg,
            delta,
            base,
            ["k"],
            row_key="id",
            sum_cols={"v": "s"},
            max_cols={"v": "mx"},
        )
        got = {r["k"]: (r["n"], r["s"], r["mx"]) for r in merged.collect()}
        final = spark.createDataFrame(
            [(1, "a", 10), (3, "b", 5), (4, "b", 7), (6, "b", 50)],
            "id long, k string, v long",
        )
        assert got == self._roll(final)
        assert got["a"][2] == 10  # the deleted max 99 is GONE (not additive)
        assert "c" not in got  # emptied group disappears

    def test_sum_count_only_never_touches_base_data(self, spark):
        from iceberg_evolve_spark.operators.incremental import (
            aggregate_delta,
            merge_with_retractions,
        )

        base = spark.createDataFrame(
            [(1, "a", 10), (2, "a", 20)], "id long, k string, v long"
        )
        delta = spark.createDataFrame(
            [(1, "a", 10, -1), (9, "a", 5, 1)], "id long, k string, v long, op int"
        )
        base_agg = aggregate_delta(base, ["k"], sum_cols={"v": "s"})
        poisoned = base.filter(F.lit(False))  # would yield wrong repair rows
        merged = merge_with_retractions(
            base_agg, delta, poisoned, ["k"], row_key="id", sum_cols={"v": "s"}
        )
        ((k, n, s),) = [(r["k"], r["n"], r["s"]) for r in merged.collect()]
        assert (k, n, s) == ("a", 2, 25)  # signed merge alone is exact

    def test_deleted_max_gone_even_when_survivors_are_null(self, spark):
        """Review fix: a delete-touched group whose surviving rows are all
        NULL in the max column must NOT keep the deleted maximum — repair
        is keyed on an explicit touched marker, not value nullability."""
        from iceberg_evolve_spark.operators.incremental import (
            aggregate_delta,
            merge_with_retractions,
        )

        base = spark.createDataFrame(
            [(1, "a", 10), (2, "a", None)], "id long, k string, v long"
        )
        delta = spark.createDataFrame(
            [(1, "a", 10, -1)], "id long, k string, v long, op int"
        )
        base_agg = aggregate_delta(base, ["k"], sum_cols={"v": "s"}, max_cols={"v": "mx"})
        merged = merge_with_retractions(
            base_agg, delta, base, ["k"], row_key="id",
            sum_cols={"v": "s"}, max_cols={"v": "mx"},
        )
        ((k, n, mx),) = [(r["k"], r["n"], r["mx"]) for r in merged.collect()]
        assert (k, n) == ("a", 1)
        assert mx is None  # the deleted max 10 is GONE, not kept additively

    def test_null_grouping_key_max_repair(self, spark):
        """Review fix (r6): the MAX-repair path joins must be null-SAFE — a
        NULL-keyed group whose maximum is deleted must get the repaired max,
        not keep the stale additive one (the main merge was already
        eqNullSafe; the repair semi/left joins were not)."""
        from iceberg_evolve_spark.operators.incremental import (
            aggregate_delta,
            merge_with_retractions,
        )

        base = spark.createDataFrame(
            [(1, None, 99), (2, None, 10), (3, "a", 7)],
            "id long, k string, v long",
        )
        # delete the NULL group's current max (99)
        delta = spark.createDataFrame(
            [(1, None, 99, -1)], "id long, k string, v long, op int"
        )
        base_agg = aggregate_delta(
            base, ["k"], sum_cols={"v": "s"}, max_cols={"v": "mx"}
        )
        merged = merge_with_retractions(
            base_agg, delta, base, ["k"], row_key="id",
            sum_cols={"v": "s"}, max_cols={"v": "mx"},
        )
        got = {r["k"]: (r["n"], r["s"], r["mx"]) for r in merged.collect()}
        final = spark.createDataFrame(
            [(2, None, 10), (3, "a", 7)], "id long, k string, v long"
        )
        assert got == self._roll(final)
        assert got[None] == (1, 10, 10)  # deleted max repaired under NULL key
