"""Schema compiler: parity with reference schema_enforcer.py error cases
(SURVEY §1.2/1.3) + rebuild extensions (array/map/decimal/nested)."""

import pytest
from pyspark.sql import types as T

from metadata_driven_data_pipeline_spark.schema import build_struct_type, struct_type_to_doc


def field(name="f", type_="string", nullable=True, **kw):
    return {"name": name, "type": type_, "nullable": nullable, **kw}


def doc(*fields):
    return {"type": "struct", "fields": list(fields)}


class TestPrimitives:
    @pytest.mark.parametrize(
        "name,expected",
        [
            ("string", T.StringType()),
            ("integer", T.IntegerType()),
            ("long", T.LongType()),
            ("double", T.DoubleType()),
            ("float", T.FloatType()),
            ("boolean", T.BooleanType()),
            ("timestamp", T.TimestampType()),
            ("date", T.DateType()),
        ],
    )
    def test_the_eight_reference_primitives(self, name, expected):
        st = build_struct_type(doc(field(type_=name)))
        assert st.fields[0].dataType == expected

    def test_nullable_preserved(self):
        st = build_struct_type(doc(field(nullable=False)))
        assert st.fields[0].nullable is False

    def test_metadata_description_is_documentation_only(self):
        st = build_struct_type(
            doc(field(metadata={"description": "doc only"}))
        )
        assert st.fields[0].dataType == T.StringType()


class TestExtensions:
    def test_array(self):
        st = build_struct_type(doc(field(type_="array<float>")))
        assert st.fields[0].dataType == T.ArrayType(T.FloatType())

    def test_map(self):
        st = build_struct_type(doc(field(type_="map<string,array<string>>")))
        assert st.fields[0].dataType == T.MapType(
            T.StringType(), T.ArrayType(T.StringType())
        )

    def test_decimal(self):
        st = build_struct_type(doc(field(type_="decimal(12,2)")))
        assert st.fields[0].dataType == T.DecimalType(12, 2)

    def test_nested_struct(self):
        st = build_struct_type(
            doc(field(type_=doc(field(name="inner", type_="long"))))
        )
        assert isinstance(st.fields[0].dataType, T.StructType)

    def test_binary(self):
        st = build_struct_type(doc(field(type_="binary")))
        assert st.fields[0].dataType == T.BinaryType()


class TestStrictness:
    """Error behavior parity: schema_enforcer.py:47-118."""

    def test_not_a_dict(self):
        with pytest.raises(ValueError):
            build_struct_type([])

    def test_wrong_top_type(self):
        with pytest.raises(ValueError, match="struct"):
            build_struct_type({"type": "record", "fields": [field()]})

    def test_empty_fields(self):
        with pytest.raises(ValueError, match="non-empty"):
            build_struct_type({"type": "struct", "fields": []})

    def test_missing_name(self):
        with pytest.raises(ValueError, match="name"):
            build_struct_type(doc({"type": "string", "nullable": True}))

    def test_missing_type(self):
        with pytest.raises(ValueError, match="type"):
            build_struct_type(doc({"name": "f", "nullable": True}))

    def test_nullable_not_bool(self):
        with pytest.raises(ValueError, match="nullable"):
            build_struct_type(doc(field(nullable="yes")))

    def test_unknown_type(self):
        with pytest.raises(ValueError, match="Unsupported field type"):
            build_struct_type(doc(field(type_="varchar")))

    def test_duplicate_field(self):
        with pytest.raises(ValueError, match="more than once"):
            build_struct_type(doc(field(name="a"), field(name="a")))


def test_round_trip():
    d = doc(
        field(name="a", type_="long", nullable=False),
        field(name="b", type_="array<string>"),
        field(name="c", type_="map<string,double>"),
    )
    st = build_struct_type(d)
    assert build_struct_type(struct_type_to_doc(st)) == st
