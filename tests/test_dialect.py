"""Dialect shim tests: the Flink spellings from the reference's models must
parse and evaluate in Spark after normalization."""

import pytest

from dbt_decodable_spark.dialect import normalize, rewrite_grok


class TestNormalize:
    def test_neq_rewrite(self):
        # impl.py:637-639 parity
        assert normalize("select * from t where a != 1") == "select * from t where a <> 1"

    def test_to_timestamp_ltz(self):
        out = normalize("select TO_TIMESTAMP_LTZ(`timestamp`, 3) from t")
        assert "timestamp_millis(CAST(`timestamp` AS BIGINT))" in out

    def test_to_timestamp_ltz_seconds(self):
        out = normalize("select to_timestamp_ltz(x, 0) from t")
        assert "timestamp_seconds" in out

    def test_datenow(self):
        assert "current_date()" in normalize("select datenow()")

    def test_bad_format_rejected(self):
        with pytest.raises(ValueError):
            normalize("select TO_TIMESTAMP(x, 'QQQQ') from t")

    def test_good_format_passthrough(self):
        # http_events.sql:23 pattern (after SQL-literal unquoting)
        sql = "select TO_TIMESTAMP(x, 'yyyy-MM-dd''T''HH:mm:ss''Z''') from t"
        assert normalize(sql) == sql


class TestGrokRewrite:
    def test_rewrites_to_regexp_extract(self):
        out = rewrite_grok("select grok(value, '%{INT:n} %{WORD:w}') as m from t")
        assert "regexp_extract" in out and "map(" in out and "'n'" in out and "'w'" in out

    def test_evaluates_in_spark(self, spark):
        df = spark.sql(
            normalize(
                "SELECT grok(line, '%{INT:num} %{WORD:word}') AS m "
                "FROM (SELECT '42 hello' AS line UNION ALL SELECT 'nope' AS line) t"
            )
        )
        rows = {r["m"]["num"] if r["m"] else None for r in df.collect()}
        assert rows == {"42", None}

    def test_flagship_model_sql_runs(self, spark):
        """The reference's events_count model SQL (events_count.sql:18-25),
        verbatim modulo stream names, runs through the shim."""
        spark.sql(
            "SELECT 1 AS `timestamp`, 'a' AS resource_type, 'b' AS audit_event_type"
        ).createOrReplaceTempView("_events_fixture")
        sql = """
            select
                coalesce(resource_type, '__UNKNOWN__') as resource_type,
                coalesce(audit_event_type, '__UNKNOWN__') as audit_event_type,
                count(1) as count_observed,
                to_timestamp_ltz(min(`timestamp`), 3) as min_timestamp,
                to_timestamp_ltz(max(`timestamp`), 3) as max_timestamp
            from (select * from _events_fixture)
            group by resource_type, audit_event_type
        """
        rows = spark.sql(normalize(sql)).collect()
        assert rows[0]["count_observed"] == 1
