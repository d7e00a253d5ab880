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


class TestQuarantine:
    def test_json_quarantine_splits_good_and_bad(self, spark, tmp_path_factory):
        from iceberg_evolve_spark.sources.formats import read_json_quarantine

        d = tmp_path_factory.mktemp("dlq")
        f = d / "data.jsonl"
        f.write_text(
            '{"id": 1, "name": "ok"}\n'
            'this is not json at all\n'
            '{"id": 2, "name": "also ok"}\n'
            '{"id": "NaNaNaN", "name": 3}\n'  # type mismatch → corrupt
        )
        from iceberg_evolve_spark.model import Field, PrimitiveType, StructType
        from iceberg_evolve_spark.schema import Schema

        schema = Schema(
            StructType(
                [
                    Field(1, "id", PrimitiveType("long")),
                    Field(2, "name", PrimitiveType("string")),
                ]
            )
        )
        good, bad = read_json_quarantine(spark, str(d), schema)
        assert sorted(r.id for r in good.collect()) == [1, 2]
        raws = [r.raw for r in bad.collect()]
        assert len(raws) == 2
        assert any("not json" in r for r in raws)

    def test_json_quarantine_all_good(self, spark, tmp_path_factory):
        from iceberg_evolve_spark.sources.formats import read_json_quarantine
        from iceberg_evolve_spark.model import Field, PrimitiveType, StructType
        from iceberg_evolve_spark.schema import Schema

        d = tmp_path_factory.mktemp("dlq2")
        (d / "ok.jsonl").write_text('{"id": 7, "name": "x"}\n')
        schema = Schema(
            StructType(
                [
                    Field(1, "id", PrimitiveType("long")),
                    Field(2, "name", PrimitiveType("string")),
                ]
            )
        )
        good, bad = read_json_quarantine(spark, str(d), schema)
        assert good.count() == 1 and bad.count() == 0


class TestOrc:
    def test_roundtrip_preserves_values(self, spark, tmp_path_factory):
        from iceberg_evolve_spark.sources.formats import read_orc, write_orc

        d = str(tmp_path_factory.mktemp("orc") / "t")
        df = spark.createDataFrame(
            [(i, f"n{i}", i * 1.5) for i in range(500)], "id long, name string, v double"
        )
        write_orc(df, d, sort_cols=["id"])
        back = read_orc(spark, d)
        assert sorted(tuple(r) for r in back.collect()) == sorted(
            tuple(r) for r in df.collect()
        )

    def test_filter_and_pruning_push_into_orc_scan(self, spark, tmp_path_factory):
        from iceberg_evolve_spark.sources.formats import read_orc, write_orc

        d = str(tmp_path_factory.mktemp("orc2") / "t")
        df = spark.createDataFrame(
            [(i, f"n{i}", i * 1.5) for i in range(500)], "id long, name string, v double"
        )
        write_orc(df, d, sort_cols=["id"])
        q = read_orc(spark, d).filter("id > 400").select("id", "v")
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [IsNotNull(id), GreaterThan(id,400)]" in plan
        assert "name" not in plan.split("ReadSchema")[1][:120]

    def test_avro_absence_is_documented(self):
        from iceberg_evolve_spark.sources.formats import avro_unavailable_reason

        assert "spark-avro" in avro_unavailable_reason()
