"""Bucketed co-located join: the shuffle moves to write time, the join plan
has NO Exchange. This is the 100 TB fact-fact join strategy (PLANS.md)."""

import pytest
from pyspark.sql import functions as F

from iceberg_evolve_spark.sources.bucketing import bucketed_join, write_bucketed
from iceberg_evolve_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("warehouse")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice", "o_orderstatus"
    )
    write_bucketed(li, "li_b", "l_orderkey", n_buckets=4, path=str(warehouse / "li_b"))
    write_bucketed(
        orders, "ord_b", "l_orderkey", n_buckets=4, path=str(warehouse / "ord_b")
    )
    yield "li_b", "ord_b"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")


class TestBucketedJoin:
    def test_join_has_no_exchange(self, spark, bucketed_tables):
        left, right = bucketed_tables
        # disable broadcast so the co-location (not a broadcast) must kill the
        # shuffle, as it would at fact-fact scale
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bucketed_join(spark, left, right, on="l_orderkey")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_join_result_matches_unbucketed(self, spark, sf_dir, bucketed_tables):
        left, right = bucketed_tables
        got = bucketed_join(spark, left, right, on="l_orderkey").count()
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders")
        expected = li.join(
            orders, li.l_orderkey == orders.o_orderkey, "inner"
        ).count()
        assert got == expected

    def test_bucketed_agg_has_no_exchange(self, spark, bucketed_tables):
        left, _ = bucketed_tables
        agg = (
            spark.table(left)
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
