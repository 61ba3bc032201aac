"""Type parser/printer/converter tests — mirrors the reference's judgments in
``tests/unit/decodable/client/test_types.py:21-80`` (see FIXTURES.md §7)."""

import pytest
from pyspark.sql import types as T

from dbt_decodable_spark import ftypes
from dbt_decodable_spark.ftypes import FlinkTypeError, parse, to_spark


class TestParseRoundTrip:
    @pytest.mark.parametrize(
        "s",
        [
            "CHAR(15)",
            "VARCHAR(255)",
            "STRING",
            "BINARY(10)",
            "VARBINARY(100)",
            "BYTES",
            "DECIMAL(10, 2)",
            "DEC(5)",
            "NUMERIC(12, 4)",
            "TINYINT",
            "SMALLINT",
            "INT",
            "BIGINT",
            "FLOAT",
            "DOUBLE",
            "DATE",
            "TIME(3)",
            "TIMESTAMP(3)",
            "TIMESTAMP_LTZ(3)",
            "ARRAY<INT>",
            "MAP<STRING, INT>",
            "BOOLEAN",
            "INT NOT NULL",
            "STRING PRIMARY KEY",
            "ROW<a INT, b STRING>",
            "MULTISET",
            "ARRAY<DECIMAL(10, 0)>",
            "INT ARRAY",
        ],
    )
    def test_round_trip(self, s):
        assert repr(parse(s)) == s

    def test_case_sensitive_rejects_lowercase(self):
        # test_schema.py:38-41 / test_types.py:28-29
        with pytest.raises(FlinkTypeError):
            parse("string")
        with pytest.raises(FlinkTypeError):
            parse("Char(10)")

    def test_char_requires_argument_when_parenthesized(self):
        with pytest.raises(FlinkTypeError):
            parse("CHAR()")

    def test_trailing_garbage_rejected(self):
        with pytest.raises(FlinkTypeError):
            parse("INT INT")

    def test_empty_rejected(self):
        with pytest.raises(FlinkTypeError):
            parse("")


class TestSynonymEquality:
    def test_decimal_defaults(self):
        # test_types.py:51-58
        assert parse("DECIMAL") == parse("DECIMAL(10)") == parse("DECIMAL(10, 0)")

    def test_decimal_synonyms(self):
        assert parse("DECIMAL") == parse("DEC") == parse("NUMERIC")
        assert parse("DECIMAL(5, 2)") == parse("NUMERIC(5, 2)")
        assert parse("DECIMAL(5, 2)") != parse("NUMERIC(5, 3)")

    def test_varchar_max_is_string(self):
        assert parse("VARCHAR(2147483647)") == parse("STRING")
        assert parse("VARCHAR(255)") != parse("STRING")

    def test_varbinary_max_is_bytes(self):
        assert parse("VARBINARY(2147483647)") == parse("BYTES")

    def test_float_double_quirk(self):
        # reference treats FLOAT ≡ DOUBLE (types.py:433-435)
        assert parse("FLOAT") == parse("DOUBLE")

    def test_timestamp_ltz_synonyms(self):
        assert parse("TIMESTAMP(3) WITH LOCAL TIME ZONE") == parse("TIMESTAMP_LTZ(3)")
        assert parse("TIMESTAMP(3) WITH TIME ZONE") == parse("TIMESTAMP_LTZ(3)")
        assert parse("TIMESTAMP(3) WITHOUT TIME ZONE") == parse("TIMESTAMP(3)")
        assert parse("TIMESTAMP(3)") != parse("TIMESTAMP_LTZ(3)")

    def test_array_forms(self):
        # ARRAY<DECIMAL> ≡ DECIMAL ARRAY ≡ ARRAY<NUMERIC> (test_types.py:60-80)
        assert parse("ARRAY<DECIMAL>") == parse("DECIMAL ARRAY") == parse("ARRAY<NUMERIC>")

    def test_nested_synonym_equality(self):
        # NotNull(Array(Dec())) == NotNull(TArray(Decimal())) — test_types.py:73-76
        assert parse("ARRAY<DEC> NOT NULL") == parse("DECIMAL ARRAY NOT NULL")
        assert parse("ARRAY<DEC> NOT NULL") != parse("ARRAY<DEC>")

    def test_integer_synonym(self):
        assert parse("INTEGER") == parse("INT")


class TestSparkMapping:
    @pytest.mark.parametrize(
        ("s", "expected"),
        [
            ("STRING", T.StringType()),
            ("BOOLEAN", T.BooleanType()),
            ("TINYINT", T.ByteType()),
            ("SMALLINT", T.ShortType()),
            ("INT", T.IntegerType()),
            ("BIGINT", T.LongType()),
            ("FLOAT", T.FloatType()),
            ("DOUBLE", T.DoubleType()),
            ("DATE", T.DateType()),
            ("BYTES", T.BinaryType()),
            ("VARBINARY(10)", T.BinaryType()),
            ("DECIMAL(12, 3)", T.DecimalType(12, 3)),
            ("DECIMAL", T.DecimalType(10, 0)),
            ("TIMESTAMP(3)", T.TimestampNTZType()),
            ("TIMESTAMP_LTZ(3)", T.TimestampType()),
            ("TIMESTAMP(3) WITH LOCAL TIME ZONE", T.TimestampType()),
            ("TIME(3)", T.LongType()),  # nanos-of-day encoding, SURVEY §7.3
            ("ARRAY<INT>", T.ArrayType(T.IntegerType())),
            ("MAP<STRING, BIGINT>", T.MapType(T.StringType(), T.LongType())),
            ("INTERVAL DAY TO SECOND", T.DayTimeIntervalType()),
            ("INTERVAL YEAR TO MONTH", T.YearMonthIntervalType()),
            (
                "ROW<a INT, b STRING>",
                T.StructType(
                    [
                        T.StructField("a", T.IntegerType()),
                        T.StructField("b", T.StringType()),
                    ]
                ),
            ),
            ("MULTISET<STRING>", T.MapType(T.StringType(), T.IntegerType(), False)),
        ],
    )
    def test_to_spark(self, s, expected):
        assert to_spark(s) == expected

    def test_not_null_nullability(self):
        t = parse("INT NOT NULL")
        assert not t.nullable
        assert t.to_spark() == T.IntegerType()

    def test_primary_key_flag(self):
        t = parse("STRING PRIMARY KEY")
        assert t.primary_key
        assert not t.nullable

    def test_array_of_not_null(self):
        st = to_spark("ARRAY<INT NOT NULL>")
        assert st == T.ArrayType(T.IntegerType(), containsNull=False)


class TestFromSpark:
    @pytest.mark.parametrize(
        "dt",
        [
            T.StringType(),
            T.IntegerType(),
            T.LongType(),
            T.DoubleType(),
            T.DecimalType(12, 3),
            T.DateType(),
            T.BinaryType(),
            T.ArrayType(T.IntegerType()),
            T.MapType(T.StringType(), T.LongType()),
            T.StructType([T.StructField("a", T.IntegerType(), False)]),
        ],
    )
    def test_round_trip_through_flink(self, dt):
        s = ftypes.from_spark(dt)
        assert to_spark(s) == dt
