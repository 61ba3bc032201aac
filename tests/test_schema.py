"""StreamSchema tests — mirrors the reference's
``tests/unit/decodable/client/test_schema.py:33-165`` obligations:
JSON round-trip, field-kind factory, watermarks, primary keys; plus the
Spark-side additions (StructType materialization, watermark delay parse)."""

import pytest
from pyspark.sql import types as T

from dbt_decodable_spark.schema import SchemaError, SchemaField, StreamSchema, Watermark

SCHEMA_JSON = {
    "fields": [
        {"kind": "physical", "name": "value", "type": "STRING"},
        {"kind": "metadata", "name": "ts", "type": "TIMESTAMP_LTZ(3)", "key": "timestamp"},
        {"kind": "computed", "name": "value_len", "expression": "CHAR_LENGTH(value)"},
    ],
    "watermarks": [{"name": "ts", "expression": "`ts` - INTERVAL '0.001' SECOND"}],
    "constraints": {"primary_key": ["value"]},
}


class TestSerde:
    def test_json_round_trip(self):
        s = StreamSchema.from_dict(SCHEMA_JSON)
        assert s.to_dict() == SCHEMA_JSON
        assert StreamSchema.from_dict(s.to_dict()) == s

    def test_field_kinds(self):
        s = StreamSchema.from_dict(SCHEMA_JSON)
        kinds = [f.kind for f in s.fields]
        assert kinds == ["physical", "metadata", "computed"]

    def test_physical_requires_type(self):
        with pytest.raises(SchemaError):
            SchemaField(name="x", kind="physical")

    def test_metadata_requires_key(self):
        with pytest.raises(SchemaError):
            SchemaField(name="x", kind="metadata", type="STRING")

    def test_computed_requires_expression(self):
        with pytest.raises(SchemaError):
            SchemaField(name="x", kind="computed")

    def test_unknown_kind(self):
        with pytest.raises(SchemaError):
            SchemaField(name="x", kind="virtual", type="STRING")


class TestStructType:
    def test_physical_only(self):
        s = StreamSchema.from_dict(SCHEMA_JSON)
        st = s.to_struct_type()
        assert st == T.StructType([T.StructField("value", T.StringType())])

    def test_with_metadata(self):
        s = StreamSchema.from_dict(SCHEMA_JSON)
        st = s.to_struct_type(include_metadata=True)
        assert [f.name for f in st.fields] == ["value", "ts"]
        assert st.fields[1].dataType == T.TimestampType()

    def test_not_null_field(self):
        s = StreamSchema(fields=(SchemaField(name="k", type="INT NOT NULL"),))
        assert s.to_struct_type().fields[0].nullable is False

    def test_from_spark_round_trip(self):
        st = T.StructType(
            [
                T.StructField("a", T.LongType(), False),
                T.StructField("b", T.StringType(), True),
            ]
        )
        s = StreamSchema.from_spark(st, primary_key=["a"])
        assert s.to_struct_type() == st
        assert s.primary_key == ("a",)


class TestWatermark:
    def test_fractional_second(self):
        # http_events.sql:9 shape
        wm = Watermark("ts", "`ts` - INTERVAL '0.001' SECOND")
        assert wm.delay() == ("ts", "1 milliseconds")

    def test_whole_units(self):
        assert Watermark("ts", "ts - INTERVAL '5' MINUTE").delay() == ("ts", "5 minutes")
        assert Watermark("ts", "`ts` - INTERVAL '2' HOUR").delay() == ("ts", "2 hours")

    def test_events_count_shape(self):
        # events_count.sql:8: min_timestamp - interval '0.100' SECOND
        wm = Watermark("min_timestamp", "min_timestamp - interval '0.100' SECOND")
        assert wm.delay() == ("min_timestamp", "100 milliseconds")

    def test_rejects_arbitrary_expression(self):
        with pytest.raises(SchemaError):
            Watermark("ts", "ts + ts").delay()
