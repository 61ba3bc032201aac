"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship smoke query at sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2,
backed by :mod:`dbt_decodable_spark.queries` (each callable takes
``(spark, sf_dir)`` and returns a DataFrame).
``oracle_sql()`` — matching DuckDB SQL for the correctness gate; queries
with engine-specific semantics (approximate algorithms, bit-level hashing)
omit the oracle and get the weaker rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dbt_decodable_spark.queries import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (the reference's events_count model) on sf0.001."""
    registry = load_all()
    return registry["events_count"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
