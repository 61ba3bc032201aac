"""``datagen`` connector (reference enum ``decodable/client/api.py:39``):
synthetic streaming source built on Spark's ``rate`` source, with declarative
column generators derived from the stream schema.

Also hosts the file/kafka streaming readers (``api.py:40-43``): a connection
binds (connector, type, stream) — here that's a thin dispatch to the right
``readStream`` with the stream's schema and watermark applied.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from dbt_decodable_spark.schema import StreamSchema


def _synth_column(field_name: str, dt: T.DataType):
    """Deterministic per-row value synthesized from the rate source's
    (timestamp, value) columns."""
    v = F.col("value")
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return v.cast(dt)
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return (v * 1.5).cast(dt)
    if isinstance(dt, T.DecimalType):
        return v.cast(dt)
    if isinstance(dt, T.StringType):
        return F.concat(F.lit(field_name + "_"), (v % 10).cast("string"))
    if isinstance(dt, T.TimestampType):
        return F.col("timestamp")
    if isinstance(dt, T.BooleanType):
        return (v % 2 == 0)
    return F.lit(None).cast(dt)


def datagen_stream(
    spark: SparkSession,
    schema: StreamSchema,
    rows_per_second: int = 100,
) -> DataFrame:
    """Unbounded synthetic stream matching ``schema``'s physical fields, with
    computed fields and the watermark applied."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    cols = [
        _synth_column(f.name, f.spark_field().dataType).alias(f.name)
        for f in schema.physical_fields()
    ]
    df = rate.select(*cols) if cols else rate
    df = schema.apply_computed_fields(df)
    return schema.apply_watermarks(df)


def file_stream(
    spark: SparkSession,
    path: str,
    schema: StreamSchema,
    fmt: str = "parquet",
    options: dict[str, str] | None = None,
) -> DataFrame:
    """File-drop source (the ``s3`` connector shape: the same reader works on
    ``s3a://`` URIs on a real cluster). ``path`` must be a directory; use
    ``options={"pathGlobFilter": "x.parquet"}`` to select files within it."""
    reader = spark.readStream.format(fmt).schema(schema.to_struct_type())
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    df = reader.load(path)
    df = schema.apply_computed_fields(df)
    return schema.apply_watermarks(df)


def kafka_reader_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> dict[str, str]:
    """The exact option dict the kafka reader is configured with — split out
    as a pure function so the connector contract is unit-testable without a
    broker (the sandbox has none). Maps the reference's start-position tags
    (``decodable/client/api.py:22-35`` — earliest/latest) straight onto the
    Spark kafka source's ``startingOffsets``.
    """
    if starting_offsets not in ("earliest", "latest"):
        raise ValueError(
            f"start position must be 'earliest' or 'latest' "
            f"(api.py StartPositionTag), got {starting_offsets!r}"
        )
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }


def parse_kafka_raw(raw: DataFrame, schema: StreamSchema) -> DataFrame:
    """Decode a kafka-shaped frame (binary ``value`` + reader ``timestamp``
    pseudo-column) against the stream schema: JSON value parse, metadata
    fields (kind=metadata, key=timestamp → kafka timestamp,
    ``schema.py:74-83``), computed fields, watermarks. Works identically on
    a bounded frame with the same columns — which is how the contract test
    drives it without a broker."""
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), schema.to_struct_type()).alias("r"),
        F.col("timestamp").alias("__kafka_ts"),
    )
    out = parsed.select("r.*", "__kafka_ts")
    for f in schema.fields:
        if f.kind == "metadata" and f.key == "timestamp":
            out = out.withColumn(f.name, F.col("__kafka_ts"))
    out = schema.apply_computed_fields(out.drop("__kafka_ts"))
    return schema.apply_watermarks(out)


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    schema: StreamSchema,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Kafka source: JSON-shaped values parsed against the stream schema;
    metadata fields (kind=metadata) map to the reader's pseudo-columns
    (``schema.py:74-83`` — e.g. key=timestamp → kafka timestamp column).

    Requires the spark-sql-kafka package on the classpath; built lazily so
    environments without it can still import this module.
    """
    reader = spark.readStream.format("kafka")
    for k, v in kafka_reader_options(bootstrap_servers, topic, starting_offsets).items():
        reader = reader.option(k, v)
    return parse_kafka_raw(reader.load(), schema)
