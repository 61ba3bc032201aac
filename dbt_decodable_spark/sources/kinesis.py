"""``kinesis`` connector (reference enum ``decodable/client/api.py:41``).

Spark has no first-party Kinesis structured-streaming source; deployments use
the spark-sql-kinesis connector (or Kinesis→Firehose→S3 file drops, which the
``file_stream`` reader already covers). This module gates the connector
behind an import/availability check so environments without the package get
a clear error instead of a classpath crash, and documents the file-drop
emulation path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dbt_decodable_spark.schema import StreamSchema

KINESIS_FORMAT = "aws-kinesis"  # spark-sql-kinesis connector format name


class KinesisUnavailable(RuntimeError):
    pass


def kinesis_stream(
    spark: SparkSession,
    stream_name: str,
    region: str,
    schema: StreamSchema,
    starting_position: str = "TRIM_HORIZON",  # ≈ earliest (api.py:22-35)
) -> DataFrame:
    """Kinesis source via the spark-sql-kinesis connector (classpath
    required). ``starting_position``: TRIM_HORIZON ≡ earliest, LATEST ≡
    latest — the reference's start positions."""
    try:
        reader = (
            spark.readStream.format(KINESIS_FORMAT)
            .option("streamName", stream_name)
            .option("region", region)
            .option("startingPosition", starting_position)
        )
        raw = reader.load()
    except Exception as e:  # connector jar absent in this environment
        raise KinesisUnavailable(
            "kinesis connector not on the classpath; use the file-drop "
            "emulation (Kinesis→Firehose→S3 + sources.datagen.file_stream) "
            f"or add spark-sql-kinesis: {e}"
        ) from e
    from pyspark.sql import functions as F

    parsed = raw.select(
        F.from_json(F.col("data").cast("string"), schema.to_struct_type()).alias("r")
    ).select("r.*")
    parsed = schema.apply_computed_fields(parsed)
    return schema.apply_watermarks(parsed)
