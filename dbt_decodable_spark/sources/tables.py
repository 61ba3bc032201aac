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


def _ensure_events_read_confs(spark: SparkSession) -> None:
    """Idempotent session-level pins the events table needs under the
    driver's VANILLA SparkSession (no custom conf):

    - ``nanosAsLong``: without it Spark refuses ns-encoded parquet
      timestamps outright (PARQUET_TYPE_ILLEGAL) — there is no per-read
      option for it, so it must be a session conf, set before the read;
    - ``session.timeZone=UTC``: ``collect()`` renders TIMESTAMP values in
      the session tz; the driver compares them against DuckDB's naive-UTC
      read, so a non-UTC session would shift every collected value.

    Both are deliberate session-wide pins (documented here rather than
    hidden as a side effect): they are exactly the two confs
    ``session.get_spark`` also sets, applied lazily for sessions we did
    not construct. Set-if-different so repeated reads never churn conf
    state, and timestamp *semantics inside the plan* no longer depend on
    them — see the ``convert_timezone`` cast in :func:`read_table`.
    """
    for key, want in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        if spark.conf.get(key, None) != want:
            spark.conf.set(key, want)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table; normalizes timestamp encodings (see module doc)."""
    if name == "events":
        _ensure_events_read_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns → µs timestamp; integer div keeps full precision.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, T.TimestampNTZType)]
    if ntz:
        # NTZ→LTZ pinned to UTC *inside the expression*: stored wall-clock
        # is declared UTC via convert_timezone, so the epoch mapping is
        # identical under ANY session timezone (a bare cast("timestamp")
        # would reinterpret in the session tz — a silent global dependency).
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
