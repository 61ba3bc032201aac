"""Register the driver's parquet test tables as Spark temp views.

These are the stream scans of the engine (reference: ``FROM <stream>`` reads a
named stream, ``example_project/.../http_events.sql:46``): every query sees
``region nation customer supplier part orders lineitem events documents
embeddings`` as relations, exactly the set the DuckDB oracle pre-registers.

Scale note: views are thin wrappers over ``spark.read.parquet`` — Catalyst
pushes filters/projections into the scan, so at 100 TB the same registration
works unchanged (parquet footer pruning + predicate pushdown + partition
pruning if the lake is partitioned).

The ``events`` table needs special care: the driver has generated it with
either (a) nanosecond int64 parquet timestamps, which Spark refuses by
default (PARQUET_TYPE_ILLEGAL) — we flip
``spark.sql.legacy.parquet.nanosAsLong`` and expose ``ts`` via
integer-division ``ts div 1000`` → ``timestamp_micros`` (floor truncation,
matching DuckDB's ns→us behavior); or (b) ``timestamp[us]`` without a
timezone annotation, which Spark infers as TIMESTAMP_NTZ — we cast every
TIMESTAMP_NTZ column to TIMESTAMP (LTZ) under a UTC session, which is
value-preserving (same epoch micros) and restores the type that every
time-arithmetic builtin (``unix_micros``, watermarks, ``window``) accepts.
DuckDB reads the same column as naive TIMESTAMP, so the oracle comparison
sees identical wall-clock values either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ensure_read_confs(spark: SparkSession) -> None:
    """Idempotent session-level pins table reads need under the driver's
    VANILLA SparkSession (no custom conf):

    - ``parquet.inferTimestampNTZ.enabled=false``: un-annotated parquet
      timestamps (orders.o_orderdate, lineitem.l_shipdate, events.ts in
      the µs generation) read as TIMESTAMP (LTZ, UTC epoch) STRAIGHT FROM
      THE SCAN. The alternative — NTZ inference + a cast expression —
      blocks range-predicate pushdown (``PushedFilters`` loses the
      shipdate/orderdate bounds: the measured round-6 TPC-H regression,
      +0.3-0.6 s/query at sf0.1);
    - ``nanosAsLong``: without it Spark refuses ns-encoded parquet
      timestamps outright (PARQUET_TYPE_ILLEGAL) — no per-read option
      exists, so it must be a session conf, set before the read;
    - ``session.timeZone=UTC``: ``collect()`` renders TIMESTAMP values in
      the session tz; the driver compares them against DuckDB's naive-UTC
      read, so a non-UTC session would shift every collected value.

    All three are deliberate session-wide pins (documented here rather than
    hidden as a side effect): exactly the confs ``session.get_spark`` also
    sets, applied lazily for sessions we did not construct.
    Set-if-different so repeated reads never churn conf state.
    """
    for key, want in (
        ("spark.sql.parquet.inferTimestampNTZ.enabled", "false"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        if spark.conf.get(key, None) != want:
            spark.conf.set(key, want)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table; normalizes timestamp encodings (see module doc)."""
    _ensure_read_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns → µs timestamp; integer div keeps full precision.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Normally dead: with inferTimestampNTZ disabled the scan never yields
    # NTZ. Kept as a correctness net for externally-overridden sessions —
    # NOTE this cast path blocks parquet range-predicate pushdown, which is
    # exactly why the conf pin above is the primary mechanism. The
    # convert_timezone pins the wall-clock→epoch mapping to UTC inside the
    # expression, so even the fallback is session-tz-independent.
    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, T.TimestampNTZType)]
    if ntz:
        df = df.withColumns(
            {
                c: F.convert_timezone(
                    F.lit("UTC"), F.current_timezone(), F.col(c)
                ).cast("timestamp")
                for c in ntz
            }
        )
    return df


def register_testdata(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Register every test table as a temp view; returns name → DataFrame."""
    out: dict[str, DataFrame] = {}
    for name in tables:
        df = read_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
