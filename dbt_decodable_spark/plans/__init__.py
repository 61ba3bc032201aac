"""Plans: pipeline execution, bounded previews, dbt-style data tests
(SURVEY §3)."""

from dbt_decodable_spark.plans.preview import Preview, backoff_schedule
from dbt_decodable_spark.plans.tests_sql import (
    accepted_values_sql,
    get_test_sql,
    not_null_sql,
    relationships_sql,
    run_test,
    unique_sql,
)

__all__ = [
    "Preview",
    "backoff_schedule",
    "get_test_sql",
    "not_null_sql",
    "unique_sql",
    "accepted_values_sql",
    "relationships_sql",
    "run_test",
]
