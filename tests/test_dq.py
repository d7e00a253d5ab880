"""Declarative DQ expectations (`functions/dq.py`): violation counting per
check kind on engineered frames, the single-pass claim, and FK anti-join."""

import pytest

from iceberg_evolve_spark.functions.dq import (
    accepted_values,
    foreign_key,
    in_range,
    matches,
    not_null,
    run_checks,
    unique,
)


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0, "1-URGENT"),
            (2, "b", 20.0, "5-LOW"),
            (2, None, -3.0, "9-BAD"),
            (4, "z", 999.0, None),
            (5, "a", None, "2-HIGH"),
        ],
        "id long, status string, price double, prio string",
    )


class TestRowLocalChecks:
    def test_counts(self, frame):
        got = {
            (k, c): (n, v, p)
            for k, c, n, v, p in run_checks(
                frame,
                [
                    not_null("status"),
                    unique("id"),
                    unique("status"),
                    in_range("price", 0.0, 100.0),
                    accepted_values("status", ["a", "b"]),
                    matches("prio", r"^[1-5]-[A-Z]+$"),
                ],
            )
        }
        assert got[("not_null", "status")] == (5, 1, False)
        assert got[("unique", "id")] == (5, 1, False)  # id=2 twice -> 1 extra
        # statuses non-null: a,b,z,a -> 4 rows, 3 distinct -> 1 extra
        assert got[("unique", "status")] == (5, 1, False)
        # price: -3 and 999 out of range; NULL not counted
        assert got[("in_range", "price")] == (5, 2, False)
        assert got[("accepted_values", "status")] == (5, 1, False)  # 'z'
        assert got[("matches", "prio")] == (5, 1, False)  # '9-BAD'

    def test_all_green(self, spark):
        df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, s string")
        res = run_checks(df, [not_null("id"), unique("id"), not_null("s")])
        assert all(p for *_, p in res)
        assert all(v == 0 for _, _, _, v, _ in res)

    def test_single_pass_for_local_checks(self, spark, sf_dir):
        """All row-local checks (incl. unique) compile into ONE scan of the
        input — the property that makes piling on expectations free."""
        from iceberg_evolve_spark.functions.dq import local_check_aggregate

        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        agg = local_check_aggregate(
            orders,
            [
                not_null("o_orderkey"),
                unique("o_orderkey"),
                unique("o_custkey"),
                in_range("o_totalprice", 0.0, 400000.0),
                accepted_values("o_orderstatus", ["F", "O", "P"]),
            ],
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Scan parquet") == 1, plan


class TestForeignKey:
    def test_orphans_counted(self, spark):
        fact = spark.createDataFrame(
            [(1,), (2,), (7,), (None,)], "fk long"
        )
        dim = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
        ((kind, col, n, v, p),) = run_checks(
            fact, [foreign_key("fk", dim, "pk")]
        )
        assert (kind, col, n) == ("foreign_key", "fk", 4)
        assert v == 1 and p is False  # only fk=7 is an orphan; NULL skipped

    def test_clean_fk_passes(self, spark):
        fact = spark.createDataFrame([(1,), (2,)], "fk long")
        dim = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
        ((*_, v, p),) = run_checks(fact, [foreign_key("fk", dim, "pk")])
        assert v == 0 and p is True
