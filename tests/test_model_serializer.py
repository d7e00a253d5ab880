"""Model + serializer tests (reference test_serializer.py / test_utils.py semantics)."""

import json

import pytest

from iceberg_evolve_spark.exceptions import SchemaParseError
from iceberg_evolve_spark.model import (
    DecimalType,
    Field,
    IDAllocator,
    ListType,
    MapType,
    PrimitiveType,
    StructType,
    parse_decimal,
)
from iceberg_evolve_spark.serializer import (
    schema_from_json,
    schema_to_json,
    type_from_json,
    type_to_json,
)
from iceberg_evolve_spark.sqltypes import parse_sql_type, split_top_level

from conftest import load_fixture


class TestPrimitives:
    def test_aliases(self):
        assert PrimitiveType("integer").name == "int"
        assert PrimitiveType("bool").name == "boolean"

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            PrimitiveType("not_a_type")

    def test_decimal_parse(self):
        assert parse_decimal("decimal(5, 2)") == DecimalType(5, 2)
        assert parse_decimal("decimal(38,10)") == DecimalType(38, 10)
        assert parse_decimal("decimal") is None


class TestIcebergJsonRoundTrip:
    def test_fixture_round_trip(self):
        data = load_fixture("users_current.iceberg.json")
        struct, schema_id = schema_from_json(data)
        assert schema_id == 0
        out = schema_to_json(struct, schema_id)
        assert out == data

    def test_all_fixtures_parse(self):
        for name in (
            "users_current.iceberg.json",
            "users_new.iceberg.json",
            "users_renamed.iceberg.json",
            "users_renamed_and_changed.iceberg.json",
            "users_union_candidate.iceberg.json",
        ):
            struct, _ = schema_from_json(load_fixture(name))
            assert len(struct.fields) > 0

    def test_decimal_serializes_as_string(self):
        assert type_to_json(DecimalType(5, 2)) == "decimal(5, 2)"
        assert type_from_json("decimal(5, 2)") == DecimalType(5, 2)

    def test_nested_types(self):
        t = type_from_json(
            {
                "type": "map",
                "key-id": 1,
                "key": "string",
                "value-id": 2,
                "value": {"type": "list", "element-id": 3, "element": "int"},
                "value-required": True,
            }
        )
        assert isinstance(t, MapType)
        assert t.value_required is True
        assert isinstance(t.value, ListType)
        assert type_from_json(type_to_json(t)) == t

    # Malformed inputs (FIXTURES.md A.7 / reference test_integration.py:246-279)
    def test_unknown_type_string_raises(self):
        with pytest.raises(SchemaParseError):
            type_from_json("not_a_type")

    def test_uuid_unsupported(self):
        with pytest.raises(SchemaParseError):
            type_from_json("uuid")

    def test_field_missing_id_raises(self):
        with pytest.raises(SchemaParseError):
            schema_from_json(
                {"type": "struct", "fields": [{"name": "x", "type": "string"}]}
            )

    def test_schema_missing_fields_raises(self):
        with pytest.raises(SchemaParseError):
            schema_from_json({"type": "struct"})

    def test_list_missing_element_id_raises(self):
        with pytest.raises(SchemaParseError):
            type_from_json({"type": "list", "element": "int"})


class TestSqlTypeParser:
    def test_split_top_level(self):
        assert split_top_level("a: int, b: struct<c: int, d: string>") == [
            "a: int",
            "b: struct<c: int, d: string>",
        ]
        assert split_top_level("decimal(5, 2), int") == ["decimal(5, 2)", "int"]

    @pytest.mark.parametrize(
        "s,expected",
        [
            ("string", PrimitiveType("string")),
            ("INT", PrimitiveType("int")),
            ("integer", PrimitiveType("int")),
            ("decimal(5, 2)", DecimalType(5, 2)),
            ("boolean", PrimitiveType("boolean")),
        ],
    )
    def test_primitives(self, s, expected):
        assert parse_sql_type(s) == expected

    def test_struct(self):
        t = parse_sql_type("struct<foo: string, bar: int>")
        assert isinstance(t, StructType)
        assert [f.name for f in t.fields] == ["foo", "bar"]
        assert [f.field_id for f in t.fields] == [1, 2]

    def test_array_and_list(self):
        for kw in ("array", "list"):
            t = parse_sql_type(f"{kw}<struct<x: int>>")
            assert isinstance(t, ListType)
            assert isinstance(t.element, StructType)

    def test_map(self):
        t = parse_sql_type("map<string, array<int>>")
        assert isinstance(t, MapType)
        assert t.key == PrimitiveType("string")
        assert isinstance(t.value, ListType)

    def test_unsupported_raises(self):
        with pytest.raises(SchemaParseError):
            parse_sql_type("tuple<int>")

    def test_allocator_continuity(self):
        alloc = IDAllocator(next_id=100)
        t = parse_sql_type("struct<a: int, b: string>", alloc)
        assert [f.field_id for f in t.fields] == [100, 101]
        assert alloc.next_id == 102
