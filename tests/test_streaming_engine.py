"""Engine-level streaming: pipelines over parquet-backed streams run as
Structured Streaming queries (appends to sources flow into sinks), and
watermarked stream-stream interval joins work end-to-end."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from dbt_decodable_spark.catalog import Engine
from dbt_decodable_spark.schema import SchemaField, StreamSchema, Watermark
from dbt_decodable_spark.sources.datagen import file_stream


@pytest.fixture()
def wh_engine(spark):
    d = tempfile.mkdtemp(prefix="dds_wh_")
    eng = Engine(spark, namespace="st", warehouse_dir=d)
    yield eng
    eng.cleanup()
    shutil.rmtree(d, ignore_errors=True)


class TestStreamingPipeline:
    def test_appends_flow_to_sink(self, wh_engine, spark):
        eng = wh_engine
        src = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
        eng.create_stream("src", data=src)
        eng.create_pipeline("out", "select id, upper(v) as vu from st__src", activate=True)
        assert eng.read_stream("out").count() == 2  # batch activation

        q = eng.activate_pipeline_streaming("out")
        q.awaitTermination(60)
        first = {tuple(r) for r in spark.read.parquet(eng.streams["st__out"].path).collect()}
        assert first == {(1, "A"), (2, "B")}

        # append to the source; a new availableNow run picks up only/also the new rows
        spark.createDataFrame([(3, "c")], "id long, v string").write.mode("append").parquet(
            eng.streams["st__src"].path
        )
        q2 = eng.activate_pipeline_streaming("out")
        q2.awaitTermination(60)
        after = {tuple(r) for r in spark.read.parquet(eng.streams["st__out"].path).collect()}
        assert (3, "C") in after and len(after) == 3

    def test_streaming_requires_warehouse(self, spark):
        eng = Engine(spark, namespace="nowh")
        src = spark.createDataFrame([(1,)], "id long")
        eng.create_stream("s", data=src)
        eng.create_pipeline("p", "select id from nowh__s", activate=True)
        from dbt_decodable_spark.catalog import CatalogError

        with pytest.raises(CatalogError):
            eng.activate_pipeline_streaming("p")
        eng.cleanup()


class TestStreamStreamJoin:
    def test_watermarked_interval_join(self, spark):
        """§2.3 interval join, streaming twin: two watermarked file streams
        joined on key + time bound (the Flink stream-stream join shape)."""
        import pandas as pd

        d = tempfile.mkdtemp(prefix="dds_ssj_")
        try:
            clicks = pd.DataFrame(
                {
                    "user": [1, 1, 2],
                    "cts": pd.to_datetime(
                        ["2024-01-01 10:00:00", "2024-01-01 11:00:00", "2024-01-01 10:30:00"]
                    ),
                }
            )
            buys = pd.DataFrame(
                {
                    "user": [1, 2],
                    "bts": pd.to_datetime(["2024-01-01 10:20:00", "2024-01-01 12:00:00"]),
                }
            )
            spark.createDataFrame(clicks).coalesce(1).write.parquet(f"{d}/clicks")
            spark.createDataFrame(buys).coalesce(1).write.parquet(f"{d}/buys")

            cs = StreamSchema(
                fields=(SchemaField(name="user", type="BIGINT"), SchemaField(name="cts", type="TIMESTAMP_LTZ(6)")),
                watermarks=(Watermark("cts", "`cts` - INTERVAL '1' MINUTE"),),
            )
            bs = StreamSchema(
                fields=(SchemaField(name="user", type="BIGINT"), SchemaField(name="bts", type="TIMESTAMP_LTZ(6)")),
                watermarks=(Watermark("bts", "`bts` - INTERVAL '1' MINUTE"),),
            )
            c = file_stream(spark, f"{d}/clicks", cs).withColumnRenamed("user", "cuser")
            b = file_stream(spark, f"{d}/buys", bs)
            # buy within 1h after click
            j = c.join(
                b,
                (F.col("cuser") == F.col("user"))
                & (F.col("bts") >= F.col("cts"))
                & (F.col("bts") <= F.col("cts") + F.expr("INTERVAL 1 HOURS")),
            ).select("cuser", "cts", "bts")
            q = (
                j.writeStream.format("memory")
                .queryName("ssj")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(60)
            got = {(r["cuser"], r["cts"].hour, r["bts"].hour) for r in spark.table("ssj").collect()}
            # click@10:00 user1 → buy@10:20 ✓; click@11:00 → no later buy ≤1h;
            # user2 click@10:30 → buy@12:00 outside the hour
            assert got == {(1, 10, 10)}
        finally:
            shutil.rmtree(d, ignore_errors=True)
