"""CSV/JSON sources with model schemas; partitioned writer with pruning."""

import pytest
from pyspark.sql import functions as F

from iceberg_evolve_spark.schema import Schema
from iceberg_evolve_spark.sources.formats import read_csv, read_json, write_partitioned
from iceberg_evolve_spark.sources.tables import load_table


def _shape(schema):
    return [(f.name, f.dataType, f.nullable) for f in schema.fields]


@pytest.fixture(scope="module")
def customer(spark, sf_dir):
    return load_table(spark, sf_dir, "customer")


class TestFormats:
    def test_csv_roundtrip_with_model_schema(self, spark, customer, tmp_path_factory):
        d = str(tmp_path_factory.mktemp("csv"))
        customer.write.mode("overwrite").option("header", "true").csv(d)
        schema = Schema.from_spark_struct(customer.schema)
        back = read_csv(spark, d, schema=schema)
        # exact types, no inference drift (metadata may carry iceberg.id)
        assert _shape(back.schema) == _shape(customer.schema)
        assert back.count() == customer.count()
        assert back.agg(F.sum("c_custkey")).collect() == customer.agg(
            F.sum("c_custkey")
        ).collect()

    def test_json_roundtrip_with_model_schema(self, spark, customer, tmp_path_factory):
        d = str(tmp_path_factory.mktemp("json"))
        customer.write.mode("overwrite").json(d)
        schema = Schema.from_spark_struct(customer.schema)
        back = read_json(spark, d, schema=schema)
        # JSON re-orders nothing under an explicit schema; values survive
        assert _shape(back.schema) == _shape(customer.schema)
        assert sorted(r.c_custkey for r in back.select("c_custkey").collect()) == sorted(
            r.c_custkey for r in customer.select("c_custkey").collect()
        )

    def test_partitioned_write_prunes(self, spark, customer, tmp_path_factory):
        d = str(tmp_path_factory.mktemp("lake"))
        write_partitioned(customer, d, ["c_nationkey"])
        back = spark.read.parquet(d)
        assert back.count() == customer.count()
        one = back.filter(F.col("c_nationkey") == 3)
        plan = one._jdf.queryExecution().executedPlan().toString()
        # the filter must become a PartitionFilter (directory pruning), not a
        # post-scan data filter
        assert "PartitionFilters: [isnotnull(c_nationkey" in plan
        expected = customer.filter(F.col("c_nationkey") == 3).count()
        assert one.count() == expected

    def test_sorted_write_disjoint_ranges(self, spark, customer, tmp_path_factory):
        import glob as g

        import pyarrow.parquet as pq

        from iceberg_evolve_spark.sources.formats import write_sorted

        d = str(tmp_path_factory.mktemp("sorted"))
        write_sorted(customer, d, ["c_custkey"], n_files=4)
        ranges = []
        for f in g.glob(f"{d}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            col = md.row_group(0).column(0)
            assert col.path_in_schema == "c_custkey"
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(0).statistics
                mins.append(st.min)
                maxs.append(st.max)
            ranges.append((min(mins), max(maxs)))
        ranges.sort()
        assert len(ranges) >= 2
        # file ranges must be disjoint → selective scans skip whole files
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 < lo2
