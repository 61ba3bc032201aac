"""dbt-style data tests (SURVEY §3.2, M5): the test-SQL wrapper and the four
standard generic-test generators, executed through the preview path exactly
as the reference does (``dbt/include/decodable/macros/materializations/test/
test.sql:17-76``, ``get_test_sql.sql:17-20``).

Wrapper semantics (dbt's ``default__get_test_sql`` as invoked by the
reference):

    SELECT <fail_calc> AS failures,
           <fail_calc> <warn_if> AS should_warn,
           <fail_calc> <error_if> AS should_error
    FROM (<test sql> [LIMIT n]) dbt_internal_test

with the ``!=`` → ``<>`` dialect rewrite applied to the *condition* strings
(``impl.py:637-639``). ``materialize_tests`` persists the test query as a
stream+pipeline pair instead of previewing (``test_as_table.sql:17-49``).
"""

from __future__ import annotations

from dataclasses import dataclass

from dbt_decodable_spark.catalog import Engine
from dbt_decodable_spark.dialect import normalize
from dbt_decodable_spark.plans.preview import Preview


def get_test_sql(
    main_sql: str,
    fail_calc: str = "count(*)",
    warn_if: str = "!= 0",
    error_if: str = "!= 0",
    limit: int | None = None,
) -> str:
    """dbt's test wrapper with the reference's dialect rewrite applied."""
    limit_clause = f" limit {limit}" if limit is not None else ""
    sql = (
        f"select {fail_calc} as failures, "
        f"{fail_calc} {warn_if} as should_warn, "
        f"{fail_calc} {error_if} as should_error "
        f"from ({main_sql}{limit_clause}) dbt_internal_test"
    )
    return normalize(sql)


# --- generic test generators (dbt's four standard tests) --------------------


def not_null_sql(model: str, column: str) -> str:
    """fixtures.py:30-39 shape: failing rows are the NULLs."""
    return f"select {column} from {model} where {column} is null"


def unique_sql(model: str, column: str) -> str:
    return (
        f"select {column} as unique_field, count(*) as n_records "
        f"from {model} where {column} is not null "
        f"group by {column} having count(*) > 1"
    )


def accepted_values_sql(model: str, column: str, values: list[str]) -> str:
    # escape embedded quotes — a value like O'Brien must not break (or
    # rewrite) the generated SQL
    quoted = ", ".join("'{}'".format(str(v).replace("'", "''")) for v in values)
    return (
        f"select {column} as value_field, count(*) as n_records "
        f"from {model} group by {column} "
        f"having {column} not in ({quoted})"
    )


def relationships_sql(model: str, column: str, to_model: str, to_column: str) -> str:
    return (
        f"select child.{column} as from_field "
        f"from (select {column} from {model} where {column} is not null) child "
        f"left join {to_model} parent on child.{column} = parent.{to_column} "
        f"where parent.{to_column} is null"
    )


@dataclass
class TestResult:
    failures: int
    should_warn: bool
    should_error: bool

    @property
    def status(self) -> str:
        if self.should_error:
            return "fail"
        if self.should_warn:
            return "warn"
        return "pass"


def run_test(
    engine: Engine,
    main_sql: str,
    fail_calc: str = "count(*)",
    warn_if: str = "!= 0",
    error_if: str = "!= 0",
    limit: int | None = None,
    materialize: bool = False,
    name: str = "dbt_test",
) -> TestResult:
    """Execute a test via preview (the reference's default) or persist it as
    a stream+pipeline pair (``materialize_tests: true``, connections.py:44)."""
    wrapped = get_test_sql(main_sql, fail_calc, warn_if, error_if, limit)
    if materialize:
        engine.create_pipeline(name, wrapped, sink=name)
        rows = [tuple(r) for r in engine.read_stream(name).collect()]
    else:
        rows = Preview(engine.spark).run(wrapped)
    if not rows:
        rows = Preview.seed_fake_results()  # handler.py:99-100
    failures, should_warn, should_error = rows[0]
    return TestResult(int(failures), bool(should_warn), bool(should_error))
