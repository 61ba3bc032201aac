"""Query registry: every operator from SURVEY.md §2 gets a named query with a
DuckDB oracle (the driver's correctness gate, ``/root/repo/__spark_entry__.py``).

Conventions (driver contract):

- each query fn takes ``(spark, sf_dir)`` and returns a DataFrame;
- every computed/aggregate column is aliased identically in the Spark code
  and the oracle SQL (the driver sorts columns by name before hashing);
- money/float aggregates are made *deterministic* via the exact integer-unit
  policy of :mod:`dbt_decodable_spark.queries.money` (scale the 2-decimal
  values to BIGINT units per row, sum exactly, convert to DOUBLE once at the
  end) — the same double comes out of Spark and DuckDB bit-for-bit, and no
  query emits a DECIMAL output column;
- queries whose semantics aren't ANSI-SQL-expressible register
  ``oracle=None`` → the driver records a weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def load_all() -> dict[str, QueryDef]:
    """Import every query module (side effect: fills REGISTRY)."""
    from dbt_decodable_spark.queries import (  # noqa: F401
        aggregates,
        extensions,
        joins,
        relational,
        relational2,
        scalar_functions,
        streaming_q,
        tpch,
        tpch2,
        windows,
    )

    return REGISTRY
