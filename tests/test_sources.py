"""Source/connector tests: file formats (parquet/CSV/JSON), TIME-of-day
helpers, kinesis gating."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from dbt_decodable_spark.functions import time_of_day as tod
from dbt_decodable_spark.schema import SchemaField, StreamSchema
from dbt_decodable_spark.sources.kinesis import KinesisUnavailable, kinesis_stream


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="dds_src_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


class TestFileFormats:
    def test_json_source(self, spark, tmpdir):
        """§2.1 file formats: JSON-lines read with a declared stream schema."""
        path = f"{tmpdir}/events.jsonl"
        with open(path, "w") as f:
            f.write('{"id": 1, "v": "a"}\n{"id": 2, "v": null}\n')
        schema = StreamSchema(
            fields=(SchemaField(name="id", type="BIGINT"), SchemaField(name="v", type="STRING"))
        )
        df = spark.read.schema(schema.to_struct_type()).json(path)
        assert {tuple(r) for r in df.collect()} == {(1, "a"), (2, None)}

    def test_csv_roundtrip(self, spark, tmpdir):
        out = f"{tmpdir}/csv_out"
        spark.createDataFrame([(1, "x")], "id int, v string").write.option(
            "header", True
        ).csv(out)
        back = spark.read.option("header", True).csv(out)
        assert back.collect()[0]["v"] == "x"


class TestTimeOfDay:
    def test_parse_format_roundtrip(self, spark):
        df = spark.createDataFrame(
            [("01:02:03",), ("23:59:59.123",), ("bad",)], "t string"
        ).select(
            tod.time_from_string("t").alias("nanos"),
        )
        rows = df.select("nanos", tod.time_to_string("nanos").alias("s")).collect()
        assert rows[0]["nanos"] == (1 * 3600 + 2 * 60 + 3) * 10**9
        assert rows[0]["s"] == "01:02:03.000"
        assert rows[1]["s"] == "23:59:59.123"
        assert rows[2]["nanos"] is None

    def test_time_from_timestamp(self, spark):
        df = spark.sql("SELECT TIMESTAMP '2024-05-01 12:30:15.5' AS ts").select(
            tod.time_from_timestamp("ts").alias("n")
        )
        assert df.collect()[0]["n"] == ((12 * 3600 + 30 * 60 + 15) * 10**9 + 500_000_000)

    def test_time_add_wraps_midnight(self, spark):
        near_midnight = (23 * 3600 + 59 * 60) * 10**9
        df = spark.createDataFrame([(near_midnight,)], "t long").select(
            tod.time_add("t", 2 * 60 * 10**9).alias("n")
        )
        assert df.collect()[0]["n"] == 60 * 10**9  # 00:01:00

    def test_flink_time_type_maps_to_long(self):
        from dbt_decodable_spark import ftypes
        from pyspark.sql import types as T

        assert ftypes.to_spark("TIME(3)") == T.LongType()


class TestKinesisGating:
    def test_unavailable_raises_cleanly(self, spark):
        schema = StreamSchema(fields=(SchemaField(name="id", type="BIGINT"),))
        with pytest.raises(KinesisUnavailable):
            kinesis_stream(spark, "s", "us-east-1", schema)


class TestSchemaEvolution:
    def test_merge_schema_unions_columns_across_files(self, spark, tmp_path):
        """Lake reality: a table's parquet files drift columns over time.
        mergeSchema reconciles the union schema; rows from files missing a
        column read as nulls — no rewrite of historical files."""
        from pyspark.sql import functions as F

        path = str(tmp_path / "evolving")
        spark.range(3).select("id", F.lit("a").alias("v1")).write.parquet(
            path + "/batch=1"
        )
        spark.range(3, 6).select(
            "id", F.lit("b").alias("v1"), F.lit(7).alias("v2")
        ).write.parquet(path + "/batch=2")
        df = spark.read.option("mergeSchema", True).parquet(path)
        assert set(df.columns) == {"id", "v1", "v2", "batch"}
        rows = {r["id"]: (r["v1"], r["v2"]) for r in df.collect()}
        assert rows[0] == ("a", None) and rows[5] == ("b", 7)


class TestCompaction:
    def test_small_files_compact_to_target(self, spark, tmp_path):
        from dbt_decodable_spark.operators.maintenance import compact_path
        import glob

        path = str(tmp_path / "smallfiles")
        # simulate a drip-fed streaming sink: 40 one-row files
        spark.range(40).repartition(40).write.parquet(path)
        n_before = len(glob.glob(path + "/part-*"))
        assert n_before >= 20  # empty partitions write no file
        compact_path(spark, path, max_records_per_file=25, target_files=2)
        n_after = len(glob.glob(path + "/part-*"))
        assert n_after <= 4
        assert spark.read.parquet(path).count() == 40
        assert {r["id"] for r in spark.read.parquet(path).collect()} == set(range(40))

    def test_crash_between_renames_recovers_on_next_run(self, spark, tmp_path):
        # simulate a crash AFTER path->old but BEFORE tmp->path: the table
        # dir is gone; the next invocation must restore old, not delete it
        import os
        from dbt_decodable_spark.operators.maintenance import compact_path

        path = str(tmp_path / "t2")
        spark.range(50).write.parquet(path)
        os.rename(path, path + ".__compact_old__")
        os.makedirs(path + ".__compact_tmp__")  # half-written leftover
        compact_path(spark, path, max_records_per_file=100)
        assert spark.read.parquet(path).count() == 50
        siblings = sorted(p.name for p in tmp_path.iterdir())
        assert siblings == ["t2"]

    def test_compaction_leaves_no_staging_dirs(self, spark, tmp_path):
        from dbt_decodable_spark.operators.maintenance import compact_path
        import os

        path = str(tmp_path / "t")
        spark.range(10).repartition(10).write.parquet(path)
        compact_path(spark, path, max_records_per_file=100)
        siblings = os.listdir(str(tmp_path))
        assert siblings == ["t"]  # no .__compact_tmp__/.__compact_old__ left
        assert spark.read.parquet(path).count() == 10


class TestKafkaContract:
    """Contract-level evidence for the kafka connector (SURVEY §2.1) — the
    sandbox has no broker, so assert (a) the exact reader options the
    connector is configured with and (b) the value-decode / metadata-field /
    computed-field pipeline, driven through a bounded kafka-shaped frame."""

    def test_reader_options_match_survey_mapping(self):
        from dbt_decodable_spark.sources.datagen import kafka_reader_options

        opts = kafka_reader_options("broker1:9092,broker2:9092", "http_events")
        assert opts == {
            "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
            "subscribe": "http_events",
            "startingOffsets": "earliest",
        }
        # reference StartPositionTag (api.py:20-24) -> startingOffsets
        assert (
            kafka_reader_options("b:9092", "t", "latest")["startingOffsets"]
            == "latest"
        )
        with pytest.raises(ValueError):
            kafka_reader_options("b:9092", "t", "timestamp:123")

    def test_value_decode_and_metadata_mapping(self, spark):
        from dbt_decodable_spark.sources.datagen import parse_kafka_raw

        schema = StreamSchema(
            fields=(
                SchemaField(name="id", type="BIGINT"),
                SchemaField(name="v", type="STRING"),
                SchemaField(name="kts", kind="metadata", key="timestamp",
                            type="TIMESTAMP(3)"),
                SchemaField(name="v_len", kind="computed",
                            expression="CHAR_LENGTH(v)"),
            )
        )
        # bounded stand-in with the kafka reader's column shape
        raw = spark.sql(
            "SELECT CAST('{\"id\": 7, \"v\": \"abc\"}' AS BINARY) AS value, "
            "TIMESTAMP '2024-01-01 00:00:05' AS timestamp"
        )
        out = parse_kafka_raw(raw, schema)
        assert set(out.columns) == {"id", "v", "kts", "v_len"}
        row = out.collect()[0]
        assert (row["id"], row["v"], row["v_len"]) == (7, "abc", 3)
        assert row["kts"].second == 5  # reader pseudo-column -> metadata field


class TestKinesisContract:
    """Same contract-level evidence as TestKafkaContract, for kinesis
    (no connector jar in the sandbox)."""

    def test_reader_options_and_start_position_mapping(self):
        from dbt_decodable_spark.sources.kinesis import kinesis_reader_options

        assert kinesis_reader_options("clicks", "us-east-1") == {
            "streamName": "clicks",
            "region": "us-east-1",
            "startingPosition": "TRIM_HORIZON",
        }
        # reference StartPositionTag (api.py:20-24) -> kinesis spellings
        assert (
            kinesis_reader_options("s", "r", "earliest")["startingPosition"]
            == "TRIM_HORIZON"
        )
        assert (
            kinesis_reader_options("s", "r", "latest")["startingPosition"]
            == "LATEST"
        )
        with pytest.raises(ValueError):
            kinesis_reader_options("s", "r", "AT_TIMESTAMP")

    def test_data_decode_pipeline(self, spark):
        from dbt_decodable_spark.sources.kinesis import parse_kinesis_raw

        schema = StreamSchema(
            fields=(
                SchemaField(name="id", type="BIGINT"),
                SchemaField(name="v", type="STRING"),
                SchemaField(name="v_up", kind="computed", expression="UPPER(v)"),
            )
        )
        raw = spark.sql(
            "SELECT CAST('{\"id\": 3, \"v\": \"ok\"}' AS BINARY) AS data"
        )
        out = parse_kinesis_raw(raw, schema)
        assert set(out.columns) == {"id", "v", "v_up"}
        assert tuple(out.collect()[0]) == (3, "ok", "OK")
