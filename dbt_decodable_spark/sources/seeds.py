"""Seed ingest: CSV → typed stream (the reference's ``dbt seed`` path,
``dbt/adapters/decodable/impl.py:502-574``).

Reference semantics reproduced:

- column types inferred with the reference's fixed defaults
  (``impl.py:150-172``): text→``STRING``, number→``DECIMAL(10, 0)``,
  boolean→``BOOLEAN``, datetime→``TIMESTAMP_LTZ(3)``, date→``DATE``,
  time→``TIME(3)``;
- per-column overrides from a ``column_types`` config, falling back to the
  inferred type when the override fails to parse (``impl.py:516-531``);
- every value is **stringified before send** and coerced to the declared
  schema on ingest (``impl.py:560-566``) — we reproduce that by reading CSV
  as strings and casting, so coercion behavior is platform-identical;
- ingest verification: loaded row count must equal source row count
  (``impl.py:568-572``).
"""

from __future__ import annotations

import csv
import datetime as dt
from typing import Any

from pyspark.sql import DataFrame

from dbt_decodable_spark import ftypes
from dbt_decodable_spark.catalog import Engine
from dbt_decodable_spark.schema import SchemaField, StreamSchema


def infer_flink_type(values: list[str]) -> str:
    """Reference's agate-type → Flink-type defaults (impl.py:150-172)."""
    non_null = [v for v in values if v not in ("", None)]
    if not non_null:
        return "STRING"
    if all(_is_bool(v) for v in non_null):
        return "BOOLEAN"
    if all(_is_number(v) for v in non_null):
        return "DECIMAL(10, 0)"
    if all(_parses(v, "%Y-%m-%d") for v in non_null):
        return "DATE"
    if all(_is_datetime(v) for v in non_null):
        return "TIMESTAMP_LTZ(3)"
    if all(_parses(v, "%H:%M:%S") for v in non_null):
        return "TIME(3)"
    return "STRING"


def _is_bool(v: str) -> bool:
    return v.lower() in ("true", "false")


def _is_number(v: str) -> bool:
    try:
        float(v)
        return True
    except ValueError:
        return False


def _parses(v: str, fmt: str) -> bool:
    try:
        dt.datetime.strptime(v, fmt)
        return True
    except ValueError:
        return False


def _is_datetime(v: str) -> bool:
    try:
        dt.datetime.fromisoformat(v)
        return True
    except ValueError:
        return False


def seed_from_rows(
    engine: Engine,
    name: str,
    header: list[str],
    rows: list[list[Any]],
    column_types: dict[str, str] | None = None,
) -> DataFrame:
    """Create a seed stream from already-parsed rows (REST-connection path:
    rows posted as stringified events, ``impl.py:548-574``)."""
    str_rows = [[None if v is None else str(v) for v in r] for r in rows]
    cols: dict[str, str] = {}
    for i, col in enumerate(header):
        inferred = infer_flink_type([r[i] for r in str_rows if r[i] is not None])
        override = (column_types or {}).get(col)
        if override:
            try:  # fallback-on-parse-failure (impl.py:516-531)
                ftypes.parse(override)
                inferred = override
            except ftypes.FlinkTypeError:
                pass
        cols[col] = inferred

    schema = StreamSchema(
        fields=tuple(SchemaField(name=c, type=t) for c, t in cols.items())
    )
    # the reference's seed path: create a REST source connection (which also
    # creates the bound stream), activate it, then POST the stringified rows
    # as events (impl.py:537-546 create+activate, impl.py:548-574 send);
    # Engine.send_events does the stringify-then-coerce ingest (impl.py:560-566)
    conn = engine.create_connection(name, connector="rest", schema=schema)
    engine.activate_connection(conn.name)
    # dbt seed is full-refresh: a re-run must REPLACE the stream contents.
    # send_events appends, so an existing stream is truncated first —
    # without this, re-seeding doubles the rows and the sent==loaded
    # verification below aborts every re-run.
    engine.truncate_stream(conn.stream)
    sent = engine.send_events(
        conn.name, [dict(zip(header, r)) for r in str_rows]
    )
    out = engine.read_stream(name)
    loaded = out.count()
    if loaded != sent:  # ingest verification (impl.py:568-572)
        raise RuntimeError(f"seed {name!r}: sent {sent} rows, loaded {loaded}")
    return out


def seed_from_csv(
    engine: Engine,
    name: str,
    csv_path: str,
    column_types: dict[str, str] | None = None,
) -> DataFrame:
    with open(csv_path, newline="") as f:
        reader = csv.reader(f)
        header = next(reader)
        rows = [list(r) for r in reader]
    return seed_from_rows(engine, name, header, rows, column_types)
