"""Widening lattice, canonicalization, equivalence (reference test_utils.py)."""

import pytest

from iceberg_evolve_spark.canonical import (
    canonicalize_type,
    clean_type_str,
    is_engine_legal_promotion,
    is_narrower_than,
    types_equivalent,
)
from iceberg_evolve_spark.model import (
    DecimalType,
    Field,
    PrimitiveType,
    StructType,
)

P = PrimitiveType


class TestWideningLattice:
    """Reference lattice (utils.py:112-129): int→{long,float,double,decimal} etc."""

    @pytest.mark.parametrize(
        "a,b",
        [
            ("int", "long"),
            ("int", "float"),
            ("int", "double"),
            ("long", "float"),
            ("long", "double"),
            ("float", "double"),
        ],
    )
    def test_widening(self, a, b):
        assert is_narrower_than(P(a), P(b))
        assert not is_narrower_than(P(b), P(a))

    @pytest.mark.parametrize("a", ["int", "long", "float", "double"])
    def test_to_decimal(self, a):
        assert is_narrower_than(P(a), DecimalType(38, 10))

    def test_equal_not_narrower(self):
        assert not is_narrower_than(P("int"), P("int"))

    def test_string_never_narrower(self):
        assert not is_narrower_than(P("string"), P("int"))
        assert not is_narrower_than(P("int"), P("string"))

    def test_date_to_timestamp(self):
        assert is_narrower_than(P("date"), P("timestamp"))

    def test_decimal_widening(self):
        assert is_narrower_than(DecimalType(5, 2), DecimalType(10, 2))
        assert not is_narrower_than(DecimalType(10, 2), DecimalType(5, 2))
        # shrinking integral digits is narrowing even if precision grows
        assert not is_narrower_than(DecimalType(10, 2), DecimalType(11, 9))

    def test_engine_legal_stricter_than_lattice(self):
        # reference claims int→float non-breaking; Iceberg DDL disallows it
        assert is_narrower_than(P("int"), P("float"))
        assert not is_engine_legal_promotion(P("int"), P("float"))
        assert is_engine_legal_promotion(P("int"), P("long"))
        assert is_engine_legal_promotion(P("float"), P("double"))
        # date→timestamp is a widening per the reference fixtures, but Iceberg
        # format v2 rejects the in-place promotion (v3-only) — must not compile.
        assert is_narrower_than(P("date"), P("timestamp"))
        assert not is_engine_legal_promotion(P("date"), P("timestamp"))


class TestCanonicalization:
    def test_struct_sorted_by_id_docs_stripped(self):
        a = StructType(
            [
                Field(2, "b", P("int"), doc="two"),
                Field(1, "a", P("string"), doc="one"),
            ]
        )
        b = StructType(
            [
                Field(1, "a", P("string")),
                Field(2, "b", P("int")),
            ]
        )
        assert canonicalize_type(a) == canonicalize_type(b)
        assert types_equivalent(a, b)

    def test_different_ids_not_equivalent(self):
        a = StructType([Field(1, "a", P("string"))])
        b = StructType([Field(2, "a", P("string"))])
        assert not types_equivalent(a, b)

    def test_clean_type_str(self):
        t = StructType(
            [
                Field(1, "a", P("string")),
                Field(2, "b", DecimalType(5, 2)),
            ]
        )
        assert clean_type_str(t) == "struct<a: string, b: decimal(5, 2)>"
