"""Scalar-function layer: the reference's must-pass functions (SURVEY §2.8)
that Spark lacks under the Flink name, plus the ``grok`` platform builtin.

Spark-native policy: everything here compiles to built-in JVM expressions
(``F.*`` / ``F.expr``) — no row-at-a-time Python UDFs in the hot path.
"""

from dbt_decodable_spark.functions.grok import GROK_PATTERNS, compile_pattern, grok_columns, grok_map
from dbt_decodable_spark.functions.flink_compat import (
    register_flink_functions,
    to_timestamp_ltz,
    translate_timestamp_format,
)

__all__ = [
    "GROK_PATTERNS",
    "compile_pattern",
    "grok_columns",
    "grok_map",
    "register_flink_functions",
    "to_timestamp_ltz",
    "translate_timestamp_format",
]
