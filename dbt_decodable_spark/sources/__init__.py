"""Sources: connectors binding external data to streams.

Reference analogue: connections with ``Connector ∈ {datagen, kafka, kinesis,
rest, s3}`` (``decodable/client/api.py:38-48``). Spark-side: file readers
(parquet/csv/json — the s3 connector is the same reader over ``s3a://``),
``rate`` for datagen, ``kafka`` for Kafka, and in-memory ingest for REST/seeds.
"""

from dbt_decodable_spark.sources.tables import TESTDATA_TABLES, register_testdata

__all__ = ["TESTDATA_TABLES", "register_testdata"]
