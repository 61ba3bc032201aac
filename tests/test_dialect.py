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


class TestWindowTVFRewrite:
    """Flink windowing-TVF spellings (platform surface: models ship verbatim
    to Flink) must run after normalization and match the DataFrame
    window()/session_window() operators exactly."""

    def _events(self, spark):
        from dbt_decodable_spark.sources.tables import read_table

        df = read_table(spark, "/root/testdata/sf0.001", "events")
        df.createOrReplaceTempView("tvf_events")
        return df

    def test_tumble_tvf_matches_window_groupby(self, spark):
        from pyspark.sql import functions as F

        df = self._events(spark)
        sql = normalize(
            "SELECT window_start, window_end, COUNT(*) AS cnt "
            "FROM TABLE(TUMBLE(TABLE tvf_events, DESCRIPTOR(ts), "
            "INTERVAL '10' MINUTES)) "
            "GROUP BY window_start, window_end"
        )
        got = {tuple(r) for r in spark.sql(sql).collect()}
        want = {
            tuple(r)
            for r in df.groupBy(F.window("ts", "10 minutes"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(
                F.col("window.start").alias("window_start"),
                F.col("window.end").alias("window_end"),
                "cnt",
            )
            .collect()
        }
        assert got == want and len(got) > 0

    def test_hop_tvf_arg_order_and_rows(self, spark):
        from pyspark.sql import functions as F

        df = self._events(spark)
        # Flink HOP arg order: (slide, size)
        sql = normalize(
            "SELECT window_start, COUNT(*) AS cnt "
            "FROM TABLE(HOP(TABLE tvf_events, DESCRIPTOR(ts), "
            "INTERVAL '5' MINUTES, INTERVAL '10' MINUTES)) "
            "GROUP BY window_start"
        )
        got = {tuple(r) for r in spark.sql(sql).collect()}
        want = {
            tuple(r)
            for r in df.groupBy(F.window("ts", "10 minutes", "5 minutes"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.col("window.start").alias("window_start"), "cnt")
            .collect()
        }
        assert got == want and len(got) > 0

    def test_session_tvf_matches_session_window(self, spark):
        from pyspark.sql import functions as F

        df = self._events(spark)
        sql = normalize(
            "SELECT user_id, window_start, window_end, COUNT(*) AS cnt "
            "FROM TABLE(SESSION(TABLE tvf_events PARTITION BY user_id, "
            "DESCRIPTOR(ts), INTERVAL '30' MINUTES)) "
            "GROUP BY user_id, window_start, window_end"
        )
        got = {tuple(r) for r in spark.sql(sql).collect()}
        want = {
            tuple(r)
            for r in df.groupBy("user_id", F.session_window("ts", "30 minutes"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(
                "user_id",
                F.col("session_window.start").alias("window_start"),
                F.col("session_window.end").alias("window_end"),
                "cnt",
            )
            .collect()
        }
        assert got == want and len(got) > 0

    def test_cumulate_tvf_matches_dataframe_operator(self, spark):
        from pyspark.sql import functions as F

        df = self._events(spark)
        # Flink arg order: (step, size) = (1 hour, 4 hours)
        sql = normalize(
            "SELECT window_start, window_end, COUNT(*) AS n "
            "FROM TABLE(CUMULATE(TABLE tvf_events, DESCRIPTOR(ts), "
            "INTERVAL '1' HOUR, INTERVAL '4' HOURS)) "
            "GROUP BY window_start, window_end"
        )
        got = {tuple(r) for r in spark.sql(sql).collect()}
        base = df.select(
            "ts", F.window("ts", "4 hours").start.alias("win_start")
        )
        steps = spark.range(1, 5).select(F.col("id").alias("k"))
        want = {
            tuple(r)
            for r in base.join(
                F.broadcast(steps),
                F.col("ts") < F.col("win_start") + F.col("k") * F.expr("INTERVAL 1 HOURS"),
            )
            .groupBy(
                F.col("win_start").alias("window_start"),
                (F.col("win_start") + F.col("k") * F.expr("INTERVAL 1 HOURS")).alias(
                    "window_end"
                ),
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == want and len(got) > 0

    def test_tvf_inside_comment_untouched(self):
        sql = "-- TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts), INTERVAL '1' MINUTE))\nSELECT 1"
        assert normalize(sql) == sql


class TestFlinkStringRewrites:
    def test_split_index_regex_quoted(self):
        from dbt_decodable_spark.dialect import normalize

        out = normalize("SELECT SPLIT_INDEX(col, '|', 2) FROM t")
        assert "split(col, concat('\\\\Q', '|', '\\\\E'))[2]" in out

    def test_str_to_map_default_delims_injected(self):
        from dbt_decodable_spark.dialect import normalize

        assert "str_to_map(s, ',', '=')" in normalize("SELECT STR_TO_MAP(s) FROM t")
        # explicit delimiters pass through untouched
        assert "str_to_map(s, ';', ':')" in normalize(
            "SELECT STR_TO_MAP(s, ';', ':') FROM t"
        )

    def test_base64_pair(self):
        from dbt_decodable_spark.dialect import normalize

        out = normalize("SELECT FROM_BASE64(TO_BASE64(x)) FROM t")
        assert out.count("base64(x)") == 1
        assert "CAST(unbase64(base64(x)) AS STRING)" in out

    def test_pipe_delimiter_splits_literally(self, spark):
        from dbt_decodable_spark.dialect import normalize

        row = spark.sql(
            normalize("SELECT SPLIT_INDEX('a|b|c', '|', 1) AS x")
        ).collect()[0]
        assert row["x"] == "b"

    def test_str_to_map_flink_defaults_evaluate(self, spark):
        from dbt_decodable_spark.dialect import normalize

        row = spark.sql(
            normalize("SELECT STR_TO_MAP('a=1,b=2')['b'] AS v")
        ).collect()[0]
        assert row["v"] == "2"


class TestJsonValueRewrite:
    def test_rewritten_to_get_json_object(self):
        from dbt_decodable_spark.dialect import normalize

        out = normalize("SELECT JSON_VALUE(props, '$.k') FROM t")
        assert "get_json_object(props, '$.k')" in out

    def test_returning_clause_rejected(self):
        import pytest as _pytest

        from dbt_decodable_spark.dialect import normalize

        with _pytest.raises(ValueError):
            normalize("SELECT JSON_VALUE(props, '$.k' RETURNING INT) FROM t")


class TestRewriteLiteralSafety:
    def test_function_name_inside_literal_untouched(self):
        from dbt_decodable_spark.dialect import normalize

        sql = "SELECT 'docs: SPLIT_INDEX(a, b, c) usage' AS help, SPLIT_INDEX(x, ',', 0) AS v FROM t"
        out = normalize(sql)
        assert "'docs: SPLIT_INDEX(a, b, c) usage'" in out  # literal preserved
        assert out.count("split(x") == 1  # real call rewritten

    def test_function_name_inside_comment_untouched(self):
        from dbt_decodable_spark.dialect import normalize

        sql = "SELECT x -- TO_BASE64(y) explained here\nFROM t"
        out = normalize(sql)
        assert "-- TO_BASE64(y) explained here" in out


class TestNestedAndLiteralRewrites:
    def test_nested_split_index_fully_rewritten(self, spark):
        from dbt_decodable_spark.dialect import normalize

        sql = "SELECT SPLIT_INDEX(SPLIT_INDEX('a|b#c', '|', 1), '#', 0) AS v"
        out = normalize(sql)
        assert "SPLIT_INDEX" not in out.upper().replace("SPLIT(", "")
        [r] = spark.sql(out).collect()
        assert r.v == "b"

    def test_nested_from_base64(self, spark):
        import base64
        from dbt_decodable_spark.dialect import normalize

        inner = base64.b64encode(b"hi").decode()
        outer = base64.b64encode(inner.encode()).decode()
        sql = f"SELECT CAST(FROM_BASE64(FROM_BASE64('{outer}')) AS STRING) AS v"
        [r] = spark.sql(normalize(sql)).collect()
        assert r.v == "hi"

    def test_grok_inside_string_literal_is_data(self, spark):
        from dbt_decodable_spark.dialect import normalize

        sql = "SELECT 'see grok(a,b) docs' AS note"
        out = normalize(sql)
        assert "grok(a,b)" in out  # untouched
        [r] = spark.sql(out).collect()
        assert r.note == "see grok(a,b) docs"

    def test_tvf_spelling_inside_literal_is_data(self, spark):
        from dbt_decodable_spark.dialect import normalize

        sql = "SELECT 'TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts)))' AS doc"
        out = normalize(sql)
        [r] = spark.sql(out).collect()
        assert r.doc.startswith("TABLE(TUMBLE(")
