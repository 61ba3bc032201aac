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


def kinesis_reader_options(
    stream_name: str,
    region: str,
    starting_position: str = "TRIM_HORIZON",
) -> dict[str, str]:
    """The exact option dict the kinesis reader is configured with — pure
    function so the connector contract is unit-testable without the jar.
    Start-position mapping from the reference's tags
    (``decodable/client/api.py:22-35``): earliest ≡ TRIM_HORIZON,
    latest ≡ LATEST (both spellings accepted)."""
    pos = {
        "earliest": "TRIM_HORIZON",
        "latest": "LATEST",
        "TRIM_HORIZON": "TRIM_HORIZON",
        "LATEST": "LATEST",
    }.get(starting_position)
    if pos is None:
        raise ValueError(
            f"start position must be earliest/latest (or TRIM_HORIZON/LATEST), "
            f"got {starting_position!r}"
        )
    return {"streamName": stream_name, "region": region, "startingPosition": pos}


def parse_kinesis_raw(raw: DataFrame, schema: StreamSchema) -> DataFrame:
    """Decode a kinesis-shaped frame (binary ``data`` column) against the
    stream schema: JSON parse, computed fields, watermarks. Works on a
    bounded frame with the same columns — how the contract test drives it
    without the connector jar."""
    from pyspark.sql import functions as F

    parsed = raw.select(
        F.from_json(F.col("data").cast("string"), schema.to_struct_type()).alias("r")
    ).select("r.*")
    parsed = schema.apply_computed_fields(parsed)
    return schema.apply_watermarks(parsed)


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
        reader = spark.readStream.format(KINESIS_FORMAT)
        for k, v in kinesis_reader_options(stream_name, region, starting_position).items():
            reader = reader.option(k, v)
        raw = reader.load()
    except Exception as e:  # connector jar absent in this environment
        raise KinesisUnavailable(
            "kinesis connector not on the classpath; use the file-drop "
            "emulation (Kinesis→Firehose→S3 + sources.datagen.file_stream) "
            f"or add spark-sql-kinesis: {e}"
        ) from e
    return parse_kinesis_raw(raw, schema)
