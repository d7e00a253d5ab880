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


class TestAvroCodec:
    """Driver-side primitives of the from-scratch Avro implementation
    (`sources/avro.py`) — spec byte vectors, container round-trips, and the
    corrupt-input failure battery."""

    def test_varint_spec_vectors(self):
        # the worked examples from the Avro spec's binary-encoding section
        from iceberg_evolve_spark.sources.avro import read_long, write_long

        vectors = {
            0: b"\x00", -1: b"\x01", 1: b"\x02", -2: b"\x03", 2: b"\x04",
            -64: b"\x7f", 64: b"\x80\x01", -65: b"\x81\x01",
        }
        for n, want in vectors.items():
            out = bytearray()
            write_long(out, n)
            assert bytes(out) == want, n
        for n in (0, 1, -1, 2**62, -(2**63), 2**63 - 1, 12345678901234):
            out = bytearray()
            write_long(out, n)
            v, pos = read_long(out, 0)
            assert v == n and pos == len(out)

    def _schema_and_rows(self):
        import datetime
        from decimal import Decimal

        schema = {
            "type": "record", "name": "t", "fields": [
                {"name": "a", "type": "long"},
                {"name": "b", "type": ["null", "string"], "default": None},
                {"name": "c", "type": {"type": "array", "items": "float"}},
                {"name": "d", "type": {"type": "long",
                                       "logicalType": "local-timestamp-micros"}},
                {"name": "e", "type": ["null", {
                    "type": "bytes", "logicalType": "decimal",
                    "precision": 10, "scale": 2}], "default": None},
                {"name": "f", "type": "boolean"},
                {"name": "g", "type": {"type": "int", "logicalType": "date"}},
                {"name": "h", "type": ["null", "bytes"], "default": None},
                {"name": "i", "type": {"type": "record", "name": "sub",
                                       "fields": [{"name": "x", "type": "int"}]}},
            ],
        }
        rows = [
            {"a": -5, "b": None, "c": [1.5, -2.25],
             "d": datetime.datetime(1969, 12, 31, 23, 59, 59, 999999),
             "e": Decimal("-12.34"), "f": True,
             "g": datetime.date(1970, 1, 4), "h": b"\x00\xff", "i": {"x": 7}},
            {"a": 2**62, "b": "héllo", "c": [],
             "d": datetime.datetime(2026, 8, 15, 1, 2, 3, 4),
             "e": None, "f": False,
             "g": datetime.date(1969, 12, 30), "h": None, "i": {"x": -1}},
        ]
        return schema, rows

    def test_container_roundtrip_both_codecs(self):
        from decimal import Decimal

        from iceberg_evolve_spark.sources.avro import (
            decode_container, encode_container,
        )

        schema, rows = self._schema_and_rows()
        for codec in ("null", "deflate"):
            data = encode_container(schema, rows, codec=codec,
                                    records_per_block=1)  # multi-block
            s2, back = decode_container(data)
            assert s2 == schema
            # logical types decode to their storage ints (arrow units)
            assert back[0]["d"] == -1  # 1 µs before epoch
            assert back[0]["g"] == 3 and back[1]["g"] == -2  # days
            assert back[0]["e"] == Decimal("-12.34") and back[1]["e"] is None
            assert back[0]["a"] == -5 and back[1]["a"] == 2**62
            assert back[1]["b"] == "héllo" and back[0]["b"] is None
            assert back[0]["c"] == [1.5, -2.25] and back[1]["c"] == []
            assert back[0]["h"] == b"\x00\xff" and back[0]["i"] == {"x": 7}

    def test_corrupt_sync_marker_fails_loudly(self):
        from iceberg_evolve_spark.sources.avro import (
            decode_container, encode_container,
        )

        schema, rows = self._schema_and_rows()
        data = bytearray(encode_container(schema, rows))
        data[-3] ^= 0xFF  # flip a byte inside the trailing sync marker
        with pytest.raises(ValueError, match="sync marker mismatch"):
            decode_container(bytes(data))

    def test_truncated_and_malformed_inputs_fail_loudly(self):
        from iceberg_evolve_spark.sources.avro import (
            decode_container, encode_container,
        )

        schema, rows = self._schema_and_rows()
        data = encode_container(schema, rows)
        with pytest.raises(ValueError, match="bad magic"):
            decode_container(b"PAR1" + data[4:])
        with pytest.raises(ValueError, match="corrupt block"):
            decode_container(data[:-20])  # cuts into the last block

    def test_unsupported_schema_shapes_rejected(self):
        from pyspark.sql import types as T

        from iceberg_evolve_spark.sources.avro import (
            avro_schema_of_struct, spark_struct_of_avro,
        )

        with pytest.raises(TypeError, match="unions"):
            spark_struct_of_avro(["null", "long", "string"])
        # Avro maps are string-keyed by spec: other key types fail loudly
        with pytest.raises(TypeError, match="string-keyed"):
            avro_schema_of_struct(
                T.StructType([
                    T.StructField("m", T.MapType(T.LongType(), T.LongType()))
                ])
            )

    def test_schema_mapping_roundtrip(self):
        from pyspark.sql import types as T

        from iceberg_evolve_spark.sources.avro import (
            avro_schema_of_struct, spark_struct_of_avro,
        )

        st = T.StructType([
            T.StructField("a", T.LongType(), False),
            T.StructField("b", T.StringType(), True),
            T.StructField("c", T.ArrayType(T.FloatType(), False), True),
            T.StructField("d", T.TimestampNTZType(), True),
            T.StructField("e", T.DecimalType(10, 2), True),
            T.StructField("f", T.StructType([
                T.StructField("x", T.IntegerType(), True)]), True),
        ])
        assert spark_struct_of_avro(avro_schema_of_struct(st)) == st


class TestAvro:
    """Distributed writer/reader (`write_avro`/`read_avro`)."""

    def test_spark_roundtrip_orders(self, spark, sf_dir, tmp_path_factory):
        from iceberg_evolve_spark.sources.avro import read_avro, write_avro

        d = str(tmp_path_factory.mktemp("avro") / "orders")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        stats = write_avro(orders.repartition(4), d, codec="deflate")
        assert len(stats) == 4 and sum(s[1] for s in stats) == orders.count()
        back = read_avro(spark, d)
        assert back.schema == orders.schema
        assert sorted(map(tuple, back.collect())) == sorted(
            map(tuple, orders.collect())
        )

    def test_spark_roundtrip_nulls_and_arrays(self, spark, tmp_path_factory):
        from iceberg_evolve_spark.sources.avro import read_avro, write_avro

        d = str(tmp_path_factory.mktemp("avro2") / "t")
        df = spark.createDataFrame(
            [(1, None, [1.0, 2.0], float("nan")), (2, "x", [], None),
             (3, "y", None, -0.0)],
            "id long, s string, v array<double>, f double",
        )
        write_avro(df, d, codec="null")
        back = read_avro(spark, d)
        got = {r["id"]: (r["s"], r["v"], str(r["f"])) for r in back.collect()}
        # NaN survives as NaN, null as null — never conflated
        assert got[1][0] is None and got[1][1] == [1.0, 2.0] and got[1][2] == "nan"
        assert got[2][1] == [] and got[2][2] == "None"
        assert got[3][1] is None and got[3][2] == "-0.0"

    def test_empty_partitions_write_no_files(self, spark, tmp_path_factory):
        from iceberg_evolve_spark.sources.avro import write_avro

        d = str(tmp_path_factory.mktemp("avro3") / "t")
        df = spark.createDataFrame([(1,)], "id long").repartition(8)
        stats = write_avro(df, d)
        assert len(stats) == 1  # 7 empty partitions → no header-only litter
        import os

        assert len([f for f in os.listdir(d) if f.endswith(".avro")]) == 1


class TestAvroComplexTypes:
    """Round-8 Avro completion: maps, enums, fixed (VERDICT r7 task 4)."""

    def test_map_codec_roundtrip(self):
        from iceberg_evolve_spark.sources.avro import (
            decode_container, encode_container,
        )

        schema = {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "m", "type": {"type": "map", "values": "long"}},
                {
                    "name": "mn",
                    "type": ["null", {"type": "map", "values": ["null", "string"]}],
                    "default": None,
                },
            ],
        }
        rows = [
            {"id": 1, "m": {"a": 1, "b": 2}, "mn": {"x": None, "y": "z"}},
            {"id": 2, "m": {}, "mn": None},
        ]
        got_schema, got = decode_container(encode_container(schema, rows))
        assert got == rows

    def test_enum_codec_roundtrip_and_validation(self):
        import pytest as _pytest

        from iceberg_evolve_spark.sources.avro import (
            decode_container, encode_container,
        )

        enum = {"type": "enum", "name": "status", "symbols": ["OPEN", "CLOSED", "HELD"]}
        schema = {
            "type": "record",
            "name": "r",
            "fields": [{"name": "s", "type": enum}],
        }
        rows = [{"s": "CLOSED"}, {"s": "OPEN"}, {"s": "HELD"}]
        _s, got = decode_container(encode_container(schema, rows))
        assert got == rows
        with _pytest.raises(ValueError, match="not a symbol"):
            encode_container(schema, [{"s": "NOPE"}])

    def test_fixed_codec_roundtrip_and_size_check(self):
        import pytest as _pytest

        from iceberg_evolve_spark.sources.avro import (
            decode_container, encode_container,
        )

        schema = {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "f", "type": {"type": "fixed", "name": "md5", "size": 4}}
            ],
        }
        rows = [{"f": b"\x01\x02\x03\x04"}, {"f": b"\xff\x00\xff\x00"}]
        _s, got = decode_container(encode_container(schema, rows))
        assert got == rows
        with _pytest.raises(ValueError, match="exactly 4 bytes"):
            encode_container(schema, [{"f": b"\x01"}])

    def test_enum_and_fixed_map_to_spark_types(self):
        from pyspark.sql import types as T

        from iceberg_evolve_spark.sources.avro import spark_struct_of_avro

        st = spark_struct_of_avro(
            {
                "type": "record",
                "name": "r",
                "fields": [
                    {"name": "e", "type": {"type": "enum", "name": "x", "symbols": ["A"]}},
                    {"name": "f", "type": {"type": "fixed", "name": "y", "size": 8}},
                    {"name": "m", "type": {"type": "map", "values": "double"}},
                ],
            }
        )
        assert st == T.StructType([
            T.StructField("e", T.StringType(), False),
            T.StructField("f", T.BinaryType(), False),
            T.StructField("m", T.MapType(T.StringType(), T.DoubleType(), False), False),
        ])

    def test_spark_map_column_roundtrip(self, spark, tmp_path):
        """A Spark map<string,long> column survives write_avro → read_avro."""
        from pyspark.sql import functions as F

        from iceberg_evolve_spark.sources.avro import read_avro, write_avro

        df = (
            spark.range(0, 50)
            .withColumn(
                "m",
                F.create_map(
                    F.lit("id"), F.col("id"), F.lit("sq"), F.col("id") * F.col("id")
                ),
            )
            .repartition(3)
        )
        d = str(tmp_path / "avmap")
        write_avro(df, d)
        back = read_avro(spark, d)
        got = {r["id"]: r["m"] for r in back.collect()}
        assert len(got) == 50
        assert got[7] == {"id": 7, "sq": 49}

    def test_enum_file_readable_by_spark(self, spark, tmp_path):
        """A container written with an enum schema (by another system) reads
        into Spark with the symbols as strings."""
        from iceberg_evolve_spark.sources.avro import encode_container, read_avro

        schema = {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "id", "type": "long"},
                {
                    "name": "s",
                    "type": {
                        "type": "enum", "name": "st", "symbols": ["A", "B", "C"]
                    },
                },
            ],
        }
        rows = [{"id": i, "s": "ABC"[i % 3]} for i in range(30)]
        d = tmp_path / "aven"
        d.mkdir()
        (d / "x.avro").write_bytes(encode_container(schema, rows))
        got = sorted(
            (r["id"], r["s"]) for r in read_avro(spark, str(d)).collect()
        )
        assert got == [(i, "ABC"[i % 3]) for i in range(30)]


class TestAvroSplitRead:
    """Round-8 sync-marker byte-range splits: one large container file
    parallelizes; results identical to the whole-file read."""

    def _one_big_file(self, tmp_path, n=5000, records_per_block=100):
        from iceberg_evolve_spark.sources.avro import encode_container

        schema = {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "txt", "type": "string"},
            ],
        }
        rows = [{"id": i, "txt": f"row-{i}-" + "x" * (i % 37)} for i in range(n)]
        d = tmp_path / "avsplit"
        d.mkdir()
        fp = d / "big.avro"
        fp.write_bytes(
            encode_container(schema, rows, records_per_block=records_per_block)
        )
        return str(d), str(fp), rows

    def test_ranges_partition_blocks_exactly_once(self, tmp_path):
        """Pure-python check: ANY byte partition of the post-header range
        yields every record exactly once."""
        from iceberg_evolve_spark.sources.avro import (
            plan_avro_splits, read_container_range,
        )

        _d, fp, rows = self._one_big_file(tmp_path, n=1200, records_per_block=50)
        for split_bytes in (1000, 4096, 10**9):
            got = []
            for f, lo, hi in plan_avro_splits(fp, split_bytes):
                _s, part = read_container_range(f, lo, hi)
                got.extend(part)
            assert sorted(r["id"] for r in got) == [r["id"] for r in rows], (
                split_bytes
            )

    def test_split_read_matches_whole_read_with_parallelism(self, spark, tmp_path):
        from iceberg_evolve_spark.sources.avro import plan_avro_splits, read_avro

        d, fp, rows = self._one_big_file(tmp_path)
        splits = plan_avro_splits(fp, 16384)
        assert len(splits) > 1  # one file, MANY tasks — the point
        whole = read_avro(spark, d)
        split = read_avro(spark, d, split_bytes=16384)
        assert split.rdd.getNumPartitions() > 1
        a = sorted((r["id"], r["txt"]) for r in whole.collect())
        b = sorted((r["id"], r["txt"]) for r in split.collect())
        assert a == b
        assert len(a) == len(rows)

    def test_split_read_deflate_and_uncompressed(self, spark, tmp_path):
        from iceberg_evolve_spark.sources.avro import encode_container, read_avro

        schema = {
            "type": "record",
            "name": "r",
            "fields": [{"name": "id", "type": "long"}],
        }
        rows = [{"id": i} for i in range(2000)]
        for codec in ("null", "deflate"):
            d = tmp_path / f"avc_{codec}"
            d.mkdir()
            (d / "f.avro").write_bytes(
                encode_container(schema, rows, codec=codec, records_per_block=64)
            )
            got = read_avro(spark, str(d), split_bytes=2048).collect()
            assert sorted(r["id"] for r in got) == list(range(2000)), codec


class TestAvroSyncSafety:
    """ADVICE r8: an all-zero sync marker can collide with a zero run in an
    uncompressed payload and validate a spurious block boundary. The default
    marker is now content-addressed, and split reads refuse zero markers."""

    _SCHEMA = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "id", "type": "long"}],
    }

    def test_default_sync_is_not_zeros(self):
        from iceberg_evolve_spark.sources.avro import (
            SYNC_SIZE, encode_container, read_header,
        )

        buf = encode_container(self._SCHEMA, [{"id": 1}])
        _schema, _codec, sync, _pos = read_header(buf)
        assert sync != b"\x00" * SYNC_SIZE

    def test_zero_sync_roundtrips_whole_but_rejected_for_splits(self, tmp_path):
        from iceberg_evolve_spark.sources.avro import (
            SYNC_SIZE, decode_container, encode_container, read_container_range,
        )

        buf = encode_container(
            self._SCHEMA,
            [{"id": i} for i in range(10)],
            codec="null",
            sync=b"\x00" * SYNC_SIZE,
        )
        _s, rows = decode_container(buf)  # sequential read: still fine
        assert [r["id"] for r in rows] == list(range(10))
        fp = tmp_path / "zero.avro"
        fp.write_bytes(buf)
        with pytest.raises(ValueError, match="all-zero sync"):
            read_container_range(str(fp), 0, len(buf))

    def test_header_only_file_yields_empty_df_under_splits(self, spark, tmp_path):
        from iceberg_evolve_spark.sources.avro import encode_container, read_avro

        d = tmp_path / "hdr"
        d.mkdir()
        (d / "empty.avro").write_bytes(encode_container(self._SCHEMA, []))
        df = read_avro(spark, str(d), split_bytes=4096)
        assert df.count() == 0
        assert [f.name for f in df.schema.fields] == ["id"]


class TestAvroSchemaOverride:
    """write_avro(avro_schema=) lets a distributed write target Avro types
    Spark lacks (enum from a string column, fixed from binary)."""

    def test_enum_fixed_write_read_roundtrip(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from iceberg_evolve_spark.sources.avro import read_avro, write_avro

        df = spark.range(0, 20).select(
            F.col("id"),
            F.element_at(
                F.array(F.lit("A"), F.lit("B")), (F.col("id") % 2 + 1).cast("int")
            ).alias("e"),
            F.expr("unhex(lpad(hex(id), 4, '0'))").alias("fx"),
        )
        schema = {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "id", "type": "long"},
                {
                    "name": "e",
                    "type": {"type": "enum", "name": "ab", "symbols": ["A", "B"]},
                },
                {
                    "name": "fx",
                    "type": {"type": "fixed", "name": "f2", "size": 2},
                },
            ],
        }
        d = str(tmp_path / "ovr")
        write_avro(df, d, avro_schema=schema)
        got = sorted(
            (r["id"], r["e"], r["fx"]) for r in read_avro(spark, d).collect()
        )
        assert got == [
            (i, "AB"[i % 2], i.to_bytes(2, "big")) for i in range(20)
        ]

    def test_mismatched_override_rejected(self, spark, tmp_path):
        from iceberg_evolve_spark.sources.avro import write_avro

        df = spark.range(3)
        bad = {"type": "record", "name": "r",
               "fields": [{"name": "nope", "type": "long"}]}
        with pytest.raises(ValueError, match="must match df columns"):
            write_avro(df, str(tmp_path / "bad"), avro_schema=bad)


class TestAvroSplitProperties:
    """Property-based proof of the split-ownership invariant: for ANY byte
    partition of the post-header range, every record decodes exactly once
    — including adversarial payloads full of zero runs and sync-marker
    byte patterns embedded in string values."""

    def test_any_byte_partition_decodes_exactly_once(self, tmp_path):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from iceberg_evolve_spark.sources.avro import (
            encode_container, read_container_range, read_header,
        )

        schema = {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "payload", "type": "bytes"},
            ],
        }

        @settings(max_examples=25, deadline=None)
        @given(
            n=st.integers(min_value=1, max_value=400),
            rpb=st.integers(min_value=1, max_value=64),
            codec=st.sampled_from(["null", "deflate"]),
            cuts=st.lists(
                st.integers(min_value=0, max_value=10**6),
                min_size=0,
                max_size=12,
            ),
            data=st.data(),
        )
        def check(n, rpb, codec, cuts, data):
            # Adversarial payloads: zero runs (the spurious-boundary class
            # the content-addressed sync exists for) and a MARKER-FORGERY
            # attempt — embed the marker this exact (rows, rpb, codec)
            # encoding WOULD have, followed by well-formed fake block
            # framing (count/size varints + trailing marker), the attack
            # ADVICE r9 named. Computing the probe from the REAL row count
            # and block size (the r9 test used a 1-row probe, so its bytes
            # never matched the file's marker) makes this a fixed-point
            # hunt: embedding the probe marker changes the payload bytes,
            # so the final file's marker differs — asserted below — which
            # is precisely why the marker is derived from content bytes.
            kind = data.draw(
                st.sampled_from(["zeros", "forge", "text", "empty"])
            )
            if kind == "forge":
                from iceberg_evolve_spark.sources.avro import write_long

                probe_rows = [
                    {"id": i, "payload": b"\x00" * 16} for i in range(n)
                ]
                probe = encode_container(
                    schema, probe_rows, codec=codec, records_per_block=rpb
                )
                _s, _c, probe_sync, _p = read_header(probe)
                fake = bytearray(probe_sync)
                write_long(fake, 1)   # fake block: 1 record,
                write_long(fake, 2)   # 2 payload bytes,
                fake.extend(b"\x02\x04")
                fake.extend(probe_sync)  # trailing marker "validates" it
                payload = bytes(fake)
            else:
                payload = {
                    "zeros": b"\x00" * 40, "text": b"ab" * 10, "empty": b""
                }[kind]
            rows = [{"id": i, "payload": payload} for i in range(n)]
            buf = encode_container(
                schema, rows, codec=codec, records_per_block=rpb
            )
            fp = tmp_path / f"prop_{n}_{rpb}_{codec}.avro"
            fp.write_bytes(buf)
            _s2, _c2, sync2, header_end = read_header(buf)
            if kind == "forge":
                # unforgeable-by-content: embedding a predicted marker
                # changed the marker (md5 fixed point required to win)
                assert sync2 != payload[:16]
            # arbitrary byte partition: header_end < c1 < ... < size
            size = len(buf)
            points = sorted(
                {header_end, size}
                | {header_end + c % max(1, size - header_end) for c in cuts}
            )
            got = []
            for lo, hi in zip(points, points[1:]):
                _sc, part = read_container_range(str(fp), lo, hi)
                got.extend(r["id"] for r in part)
            assert sorted(got) == list(range(n)), (n, rpb, codec, points)

        check()

    def test_marker_is_content_addressed_and_deterministic(self):
        """Task-retry determinism AND unforgeability both hang on the same
        property: the default marker is a function of the encoded block
        BYTES — identical rows re-encode to the identical marker, any
        payload change moves it."""
        from iceberg_evolve_spark.sources.avro import (
            encode_container, read_header,
        )

        schema = {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "payload", "type": "bytes"},
            ],
        }

        def marker(rows, **kw):
            return read_header(encode_container(schema, rows, **kw))[2]

        rows = [{"id": 1, "payload": b"x"}, {"id": 2, "payload": b"y"}]
        assert marker(rows) == marker(rows)  # retry-identical
        bumped = [{"id": 1, "payload": b"x"}, {"id": 2, "payload": b"z"}]
        assert marker(rows) != marker(bumped)  # content-addressed
        # block layout is part of the content address too
        assert marker(rows, records_per_block=1) != marker(
            rows, records_per_block=2
        )


class TestAvroVectorizedEncoder:
    """The columnar (numpy) encode fast path must be BYTE-IDENTICAL to the
    row-at-a-time encoder — the row path stays as the reference
    implementation and the fallback for complex types (r13 optimization)."""

    def _tricky(self):
        import datetime

        import pyarrow as pa

        schema = {
            "type": "record",
            "name": "t",
            "fields": [
                {"name": "a", "type": ["null", "long"], "default": None},
                {"name": "b", "type": ["null", "string"], "default": None},
                {"name": "c", "type": "double"},
                {
                    "name": "d",
                    "type": [
                        "null",
                        {"type": "long", "logicalType": "timestamp-micros"},
                    ],
                    "default": None,
                },
                {
                    "name": "g",
                    "type": ["null", {"type": "int", "logicalType": "date"}],
                    "default": None,
                },
                {"name": "h", "type": ["null", "bytes"], "default": None},
                {"name": "i", "type": "boolean"},
                {"name": "j", "type": ["null", "float"], "default": None},
                {"name": "k", "type": "int"},
                {
                    # tz-AWARE stamps (Spark attaches the session tz to
                    # TimestampType arrays): both paths must store UTC epoch
                    # micros regardless of the attached zone (ADVICE r13)
                    "name": "l",
                    "type": [
                        "null",
                        {"type": "long", "logicalType": "timestamp-micros"},
                    ],
                    "default": None,
                },
            ],
        }
        base = [
            # negatives, unicode, -0.0, epoch-adjacent stamps, empty payloads
            (-5, "héllo", -0.0, -1, 3, b"\x00\xff", True, 1.5, -(2**31)),
            (2**62, None, float("nan"), None, None, None, False, None,
             2**31 - 1),
            (None, "", 1e308, 1234567890123456, -719162, b"", True, -0.0, 0),
            (0, "x" * 3000, 2.5, 0, 0, b"abc", False, 3.14, 7),
        ] * 13  # 52 rows → multi-block at small records_per_block
        tbl = pa.table(
            {
                "a": pa.array([r[0] for r in base], pa.int64()),
                "b": pa.array([r[1] for r in base], pa.string()),
                "c": pa.array([r[2] for r in base], pa.float64()),
                "d": pa.array([r[3] for r in base], pa.timestamp("us")),
                "g": pa.array(
                    [
                        datetime.date.fromordinal(r[4] + 719163)
                        if r[4] is not None
                        else None
                        for r in base
                    ],
                    pa.date32(),
                ),
                "h": pa.array([r[5] for r in base], pa.binary()),
                "i": pa.array([r[6] for r in base], pa.bool_()),
                "j": pa.array([r[7] for r in base], pa.float32()),
                "k": pa.array([r[8] for r in base], pa.int32()),
                "l": pa.array(
                    [r[3] for r in base],
                    pa.timestamp("us", tz="America/Los_Angeles"),
                ),
            }
        )
        return schema, tbl

    def test_byte_identical_to_row_encoder(self):
        from iceberg_evolve_spark.sources.avro import (
            encode_container, encode_container_arrow,
        )

        schema, tbl = self._tricky()
        rows = tbl.to_pylist()
        for codec in ("null", "deflate"):
            for rpb in (5, 64, 4096):
                b_row = encode_container(
                    schema, rows, codec=codec, records_per_block=rpb
                )
                b_vec = encode_container_arrow(
                    schema, tbl, codec=codec, records_per_block=rpb
                )
                assert b_vec is not None
                assert b_vec == b_row, (codec, rpb)

    def test_ns_timestamps_normalized_to_micros(self):
        # a pandas-built table carries ns-unit stamps; the vector path must
        # encode micros exactly like the row path does from datetimes
        import pyarrow as pa

        from iceberg_evolve_spark.sources.avro import (
            decode_container, encode_container_arrow,
        )

        schema = {
            "type": "record",
            "name": "t",
            "fields": [
                {
                    "name": "ts",
                    "type": {
                        "type": "long",
                        "logicalType": "timestamp-micros",
                    },
                }
            ],
        }
        tbl = pa.table(
            {"ts": pa.array([1_700_000_000_123_456_000], pa.timestamp("ns"))}
        )
        data = encode_container_arrow(schema, tbl, codec="null")
        _s, back = decode_container(data)
        assert back[0]["ts"] == 1_700_000_000_123_456  # micros, not nanos
        # sub-microsecond ns precision TRUNCATES (matching the row path,
        # where datetime carries only micros) instead of raising (ADVICE r13)
        tbl2 = pa.table(
            {"ts": pa.array([1_700_000_000_123_456_789], pa.timestamp("ns"))}
        )
        data2 = encode_container_arrow(schema, tbl2, codec="null")
        _s2, back2 = decode_container(data2)
        assert back2[0]["ts"] == 1_700_000_000_123_456

    def test_complex_schemas_fall_back(self):
        import pyarrow as pa

        from iceberg_evolve_spark.sources.avro import encode_container_arrow

        for t in (
            {"type": "map", "values": "string"},
            {"type": "enum", "name": "e", "symbols": ["A"]},
            {"type": "fixed", "name": "f", "size": 2},
            {"type": "array", "items": "long"},
            {
                "type": "bytes",
                "logicalType": "decimal",
                "precision": 10,
                "scale": 2,
            },
        ):
            schema = {
                "type": "record",
                "name": "t",
                "fields": [{"name": "x", "type": t}],
            }
            assert (
                encode_container_arrow(schema, pa.table({"x": [None]})) is None
            )

    def test_nulls_in_non_nullable_field_fail_loudly(self):
        import pyarrow as pa
        import pytest as _pytest

        from iceberg_evolve_spark.sources.avro import encode_container_arrow

        schema = {
            "type": "record",
            "name": "t",
            "fields": [{"name": "x", "type": "long"}],
        }
        tbl = pa.table({"x": pa.array([1, None], pa.int64())})
        with _pytest.raises(TypeError, match="non-nullable"):
            encode_container_arrow(schema, tbl)


class TestAvroVectorizedDecoder:
    """The columnar decode fast path must be VALUE-IDENTICAL to the
    row-at-a-time decoder — the row path stays as the reference
    implementation and the fallback for complex types and non-minimal
    union-branch varints (r14 optimization, VERDICT r13 task 1)."""

    def _tricky(self):
        # same value classes the encoder battery pins: negatives, unicode,
        # NaN/-0.0, epoch-adjacent stamps, empty payloads, 2^62, nulls
        schema = {
            "type": "record",
            "name": "t",
            "fields": [
                {"name": "a", "type": ["null", "long"], "default": None},
                {"name": "b", "type": ["null", "string"], "default": None},
                {"name": "c", "type": "double"},
                {
                    "name": "d",
                    "type": [
                        "null",
                        {"type": "long", "logicalType": "timestamp-micros"},
                    ],
                    "default": None,
                },
                {
                    "name": "g",
                    "type": ["null", {"type": "int", "logicalType": "date"}],
                    "default": None,
                },
                {"name": "h", "type": ["null", "bytes"], "default": None},
                {"name": "i", "type": "boolean"},
                {"name": "j", "type": ["null", "float"], "default": None},
                {"name": "k", "type": "int"},
            ],
        }
        base = [
            (-5, "héllo", -0.0, -1, 3, b"\x00\xff", True, 1.5, -(2**31)),
            (2**62, None, float("nan"), None, None, None, False, None,
             2**31 - 1),
            (None, "", 1e308, 1234567890123456, -719162, b"", True, -0.0, 0),
            (0, "x" * 3000, 2.5, 0, 0, b"abc", False, 3.14159, 7),
        ] * 13  # 52 rows → multi-block at small records_per_block
        names = ["a", "b", "c", "d", "g", "h", "i", "j", "k"]
        rows = [dict(zip(names, r)) for r in base]
        return schema, rows

    @staticmethod
    def _float32(v):
        import struct as _struct

        return _struct.unpack("<f", _struct.pack("<f", v))[0]

    def test_value_identical_to_row_decoder(self):
        import math

        import pyarrow as pa

        from iceberg_evolve_spark.sources.avro import (
            decode_container, decode_container_arrow, encode_container,
        )

        schema, rows = self._tricky()
        for codec in ("null", "deflate"):
            for rpb in (5, 64, 4096):
                data = encode_container(
                    schema, rows, codec=codec, records_per_block=rpb
                )
                _s, back_rows = decode_container(data)
                out = decode_container_arrow(data)
                assert out is not None, (codec, rpb)
                _s2, n, cols = out
                assert n == len(back_rows) == len(rows)
                names = [f["name"] for f in schema["fields"]]
                got = pa.table(dict(zip(names, cols))).to_pylist()
                for g, r in zip(got, back_rows):
                    for k in names:
                        gv, rv = g[k], r[k]
                        if k == "d" and gv is not None:
                            gv = int(gv.timestamp() * 1e6)
                        if k == "g" and gv is not None:
                            gv = gv.toordinal() - 719163
                        if isinstance(rv, float) and math.isnan(rv):
                            assert math.isnan(gv), (codec, rpb, k)
                        else:
                            assert gv == rv, (codec, rpb, k, gv, rv)

    def test_arrow_types_and_nulls(self):
        import pyarrow as pa

        from iceberg_evolve_spark.sources.avro import (
            decode_container_arrow, encode_container,
        )

        schema, rows = self._tricky()
        data = encode_container(schema, rows)
        _s, _n, cols = decode_container_arrow(data)
        types = [c.type for c in cols]
        assert types == [
            pa.int64(), pa.string(), pa.float64(),
            pa.timestamp("us", tz="UTC"), pa.date32(), pa.binary(),
            pa.bool_(), pa.float32(), pa.int32(),
        ]
        # nulls stay nulls (never NaN/zero-conflated)
        assert cols[0].null_count == 13  # 'a' null in 1 of 4 row templates
        assert cols[1].null_count == 13
        assert cols[3].null_count == 13

    def test_complex_schemas_fall_back(self):
        from iceberg_evolve_spark.sources.avro import (
            decode_container_arrow, encode_container,
        )

        cases = [
            ({"type": "map", "values": "string"}, {"x": {"k": "v"}}),
            ({"type": "enum", "name": "e", "symbols": ["A"]}, {"x": "A"}),
            ({"type": "fixed", "name": "f", "size": 2}, {"x": b"ab"}),
            ({"type": "array", "items": "long"}, {"x": [1, 2]}),
            (
                {
                    "type": "bytes",
                    "logicalType": "decimal",
                    "precision": 10,
                    "scale": 2,
                },
                {"x": __import__("decimal").Decimal("1.25")},
            ),
        ]
        for t, row in cases:
            schema = {
                "type": "record",
                "name": "t",
                "fields": [{"name": "x", "type": t}],
            }
            data = encode_container(schema, [row])
            assert decode_container_arrow(data) is None, t

    def test_non_minimal_branch_varint_falls_back(self):
        """A foreign writer may legally emit the union branch index as a
        multi-byte varint; the scanner bails to the row decoder (returns
        None) instead of mis-parsing."""
        from iceberg_evolve_spark.sources.avro import (
            decode_container, decode_container_arrow, encode_container,
            read_header,
        )

        schema = {
            "type": "record",
            "name": "t",
            "fields": [{"name": "x", "type": ["null", "long"], "default": None}],
        }
        data = encode_container(schema, [{"x": 7}], codec="null")
        _s, _codec, sync, pos = read_header(data)
        buf = bytearray(data)
        # block layout after header: count varint, size varint, payload
        from iceberg_evolve_spark.sources.avro import read_long

        count, p = read_long(buf, pos)
        size, p = read_long(buf, p)
        assert buf[p] == 0x02  # branch=1 (value), minimal form
        # rewrite branch as the NON-minimal 2-byte varint 0x82 0x00 and fix
        # the block size; read_long accepts both forms
        payload = bytes([0x82, 0x00]) + bytes(buf[p + 1 : p + size])
        new = bytearray(data[:pos])
        from iceberg_evolve_spark.sources.avro import write_long

        write_long(new, count)
        write_long(new, len(payload))
        new += payload
        new += sync
        _s2, rows = decode_container(bytes(new))  # row path accepts it
        assert rows == [{"x": 7}]
        assert decode_container_arrow(bytes(new)) is None  # fast path bails

    def test_empty_and_invalid_utf8(self):
        import pyarrow as pa
        import pytest as _pytest

        from iceberg_evolve_spark.sources.avro import (
            decode_container_arrow, encode_container,
        )

        schema = {
            "type": "record",
            "name": "t",
            "fields": [{"name": "s", "type": "string"}],
        }
        # empty container → zero-length arrays, not None
        _s, n, cols = decode_container_arrow(encode_container(schema, []))
        assert n == 0 and len(cols[0]) == 0
        # invalid utf-8 in a string field raises (row path raises too)
        data = bytearray(encode_container(schema, [{"s": "AB"}], codec="null"))
        idx = bytes(data).rfind(b"AB")
        data[idx] = 0xFF
        with _pytest.raises(pa.ArrowInvalid):
            decode_container_arrow(bytes(data))

    def test_split_range_blocks_feed_columnar(self, tmp_path):
        """_range_blocks + _blocks_to_columns equals read_container_range."""
        from iceberg_evolve_spark.sources.avro import (
            _blocks_to_columns, _range_blocks, encode_container,
            plan_avro_splits, read_container_range,
        )

        schema = {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "txt", "type": ["null", "string"], "default": None},
            ],
        }
        rows = [
            {"id": i, "txt": None if i % 7 == 0 else f"v{i}"}
            for i in range(500)
        ]
        fp = tmp_path / "f.avro"
        fp.write_bytes(encode_container(schema, rows, records_per_block=64))
        got = []
        for f, lo, hi in plan_avro_splits(str(fp), 2048):
            sch, blocks = _range_blocks(f, lo, hi)
            want = read_container_range(f, lo, hi)[1]
            cols = _blocks_to_columns(sch, blocks)
            assert cols is not None
            import pyarrow as pa

            part = pa.table({"id": cols[0], "txt": cols[1]}).to_pylist()
            assert part == want
            got.extend(part)
        assert sorted(r["id"] for r in got) == [r["id"] for r in rows]
