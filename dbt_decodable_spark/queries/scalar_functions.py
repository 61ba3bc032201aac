"""Scalar functions (SURVEY §2.8): the reference's must-pass set
(grok, TO_TIMESTAMP/_LTZ, COALESCE, CHAR_LENGTH, CAST, interval arithmetic,
datenow) plus the platform string/date/math/array/map/json surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dbt_decodable_spark.functions.grok import compile_pattern
from dbt_decodable_spark.queries import register
from dbt_decodable_spark.sources.tables import read_table


@register(
    "func_string",
    oracle="""
        SELECT c_custkey,
               upper(c_name) AS name_u,
               lower(c_mktsegment) AS seg_l,
               length(c_name) AS name_len,
               substr(c_name, 1, 8) AS name_pre,
               concat(c_name, '#', c_mktsegment) AS name_seg,
               trim(c_name) AS name_trim,
               replace(c_name, 'Customer', 'Cust') AS name_repl,
               reverse(c_mktsegment) AS seg_rev
        FROM customer
    """,
    doc="§2.8 string functions: upper/lower/length/substr/concat/trim/replace/reverse",
)
def func_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_u"),
        F.lower("c_mktsegment").alias("seg_l"),
        F.length("c_name").cast("long").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_pre"),
        F.concat_ws("#", "c_name", "c_mktsegment").alias("name_seg"),
        F.trim("c_name").alias("name_trim"),
        F.regexp_replace("c_name", "Customer", "Cust").alias("name_repl"),
        F.reverse("c_mktsegment").alias("seg_rev"),
    )


@register(
    "func_char_length_not_null",
    oracle="""
        SELECT length(c_name) AS name_length
        FROM customer WHERE length(c_name) IS NOT NULL
    """,
    doc="§2.8 CHAR_LENGTH + not_null test shape (fixtures.py:25-39: "
    "`select CHAR_LENGTH(name) as name_length from my_seed`)",
)
def func_char_length_not_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    c.createOrReplaceTempView("customer")
    # CHAR_LENGTH is Spark-native; BIGINT-cast to match DuckDB's length type.
    return spark.sql(
        "SELECT CAST(CHAR_LENGTH(c_name) AS BIGINT) AS name_length "
        "FROM customer WHERE CHAR_LENGTH(c_name) IS NOT NULL"
    )


@register(
    "func_coalesce_nullif",
    oracle="""
        SELECT event_id,
               coalesce(nullif(event_type, 'error'), '__UNKNOWN__') AS etype,
               coalesce(NULL, event_type, 'x') AS etype2
        FROM events
    """,
    doc="§2.8 COALESCE (events_count.sql:19-20) + NULLIF",
)
def func_coalesce_nullif(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.coalesce(F.nullif(F.col("event_type"), F.lit("error")), F.lit("__UNKNOWN__")).alias(
            "etype"
        ),
        F.coalesce(F.lit(None), F.col("event_type"), F.lit("x")).alias("etype2"),
    )


@register(
    "func_math",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               abs(l_discount - 0.05) AS abs_d,
               round(l_extendedprice, 1) AS round_p,
               CAST(floor(l_quantity) AS BIGINT) AS floor_q,
               CAST(ceil(l_quantity / 7) AS BIGINT) AS ceil_q,
               CAST(power(l_linenumber, 2) AS DOUBLE) AS pow_ln,
               sqrt(l_quantity) AS sqrt_q,
               mod(l_orderkey, 7) AS mod_k,
               CAST(sign(l_discount - 0.05) AS DOUBLE) AS sign_d
        FROM lineitem WHERE l_orderkey <= 200
    """,
    doc="§2.8 math functions",
)
def func_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_d"),
        F.round("l_extendedprice", 1).alias("round_p"),
        F.floor("l_quantity").alias("floor_q"),
        F.ceil(F.col("l_quantity") / 7).alias("ceil_q"),
        F.pow("l_linenumber", 2).alias("pow_ln"),
        F.sqrt("l_quantity").alias("sqrt_q"),
        # ln/exp are libm-dependent (last-ulp differs between JVM and C) —
        # excluded from the oracle surface; sqrt is IEEE-exact so it stays.
        (F.col("l_orderkey") % 7).alias("mod_k"),
        F.signum(F.col("l_discount") - 0.05).alias("sign_d"),
    )


@register(
    "func_datetime",
    oracle="""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INT) AS y,
               CAST(month(o_orderdate) AS INT) AS m,
               CAST(day(o_orderdate) AS INT) AS d,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
               o_orderdate + INTERVAL 30 DAY AS due_date,
               o_orderdate - INTERVAL 1 HOUR AS wm_ts,
               CAST(o_orderdate AS DATE) AS odate
        FROM orders WHERE o_orderkey <= 1000
    """,
    doc="§2.8 date/time: extract, date_trunc, interval literal arithmetic "
    "(watermark expression shape, http_events.sql:9)",
)
def func_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        (F.col("o_orderdate") - F.expr("INTERVAL 1 HOURS")).alias("wm_ts"),
        F.col("o_orderdate").cast("date").alias("odate"),
    )


@register(
    "func_to_timestamp",
    oracle="""
        SELECT o_orderkey,
               strptime(strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S'), '%Y-%m-%dT%H:%M:%S') AS parsed_ts
        FROM orders WHERE o_orderkey <= 500
    """,
    doc="§2.8 TO_TIMESTAMP(str, fmt) with Flink Java-style format "
    "yyyy-MM-dd'T'HH:mm:ss (http_events.sql:23), round-tripped through a string",
)
def func_to_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_decodable_spark.functions.flink_compat import translate_timestamp_format

    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    fmt = translate_timestamp_format("yyyy-MM-dd'T'HH:mm:ss")
    return o.select(
        "o_orderkey",
        F.to_timestamp(F.date_format("o_orderdate", fmt), fmt).alias("parsed_ts"),
    )


@register(
    "func_timestamp_ltz",
    oracle="""
        SELECT event_id,
               epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_millis,
               CAST(to_timestamp(epoch_ms(CAST(ts AS TIMESTAMP)) / 1000) AS TIMESTAMP) AS ts_rt
        FROM events WHERE event_id < 300
    """,
    doc="§2.8 TO_TIMESTAMP_LTZ(millis, 3) ↔ unix_millis round-trip "
    "(events_count.sql:22-23)",
)
def func_timestamp_ltz(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_decodable_spark.functions.flink_compat import to_timestamp_ltz

    e = read_table(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    millis = F.unix_millis("ts")
    return e.select(
        "event_id",
        millis.alias("ts_millis"),
        to_timestamp_ltz(millis, 3).alias("ts_rt"),
    )


@register(
    "func_json",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
               json_extract_string(props, '$.missing') AS missing_val
        FROM events
    """,
    doc="§2.8 JSON access over the events.props column (JSON_VALUE analogue)",
)
def func_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
        F.get_json_object("props", "$.missing").alias("missing_val"),
    )


@register(
    "func_array",
    oracle="""
        SELECT vec_id,
               CAST(len(embedding) AS INT) AS dim,
               CAST(embedding[1] AS DOUBLE) AS first_elem,
               CAST(embedding[len(embedding)] AS DOUBLE) AS last_elem
        FROM embeddings WHERE vec_id < 100
    """,
    doc="§2.8 array functions: cardinality + element access (1-based in both "
    "Flink and DuckDB; Spark element_at is also 1-based)",
)
def func_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_elem"),
        F.element_at("embedding", F.size("embedding")).cast("double").alias("last_elem"),
    )


@register(
    "func_array_explode",
    oracle="""
        SELECT vec_id, CAST(e AS DOUBLE) AS elem
        FROM (SELECT vec_id, unnest(embedding) AS e FROM embeddings WHERE vec_id < 20) t
    """,
    doc="§2.8 UNNEST / explode",
)
def func_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    return e.select("vec_id", F.explode("embedding").alias("elem")).withColumn(
        "elem", F.col("elem").cast("double")
    )


@register(
    "func_map",
    oracle="""
        SELECT event_id,
               'type' AS k1,
               event_type AS v1,
               CAST(2 AS BIGINT) AS map_size
        FROM events WHERE event_id < 100
    """,
    doc="§2.8 map construction + element access m['key'] "
    "(http_events.sql:23-37); map exploded to scalar columns for the oracle",
)
def func_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("val"), F.col("value").cast("string")
    )
    return e.select(
        "event_id",
        F.lit("type").alias("k1"),
        m["type"].alias("v1"),  # map element access, identical syntax in SQL
        F.size(m).cast("long").alias("map_size"),
    )


# --- grok -------------------------------------------------------------------

# Envoy-ish access-log grok pattern (http_events.sql:44 subset, over lines we
# synthesize deterministically from `events` per FIXTURES.md §8).
ENVOY_GROK = (
    r"\[%{TIMESTAMP_ISO8601:timestamp}\] "
    r'"%{WORD:method} %{NOTSPACE:path} %{NOTSPACE:protocol}" '
    r"%{INT:response_code} - %{INT:bytes_sent} %{INT:user}"
)


def _envoy_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize envoy_raw-style lines from events (FIXTURES.md §8 bridge).

    fan_out first: the events parquet is one ~MB-scale file → one input
    partition, which would serialize the downstream per-row regex work onto
    a single core. At 100 TB the source is already thousands of partitions
    and the rebalance is a cheap row-size-bounded shuffle."""
    from dbt_decodable_spark.operators.dedup import fan_out

    e = fan_out(read_table(spark, sf_dir, "events"))
    return e.select(
        "event_id",
        F.concat(
            F.lit("["),
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"),
            F.lit('Z] "'),
            F.upper("event_type"),
            F.lit(' /api/v1 HTTP/1.1" 200 - '),
            F.round(F.col("value") * 100).cast("bigint").cast("string"),
            F.lit(" "),
            F.col("user_id").cast("string"),
        ).alias("line"),
    )

_ENVOY_LINE_DUCK = (
    "concat('[', strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S'), 'Z] \"', "
    "upper(event_type), ' /api/v1 HTTP/1.1\" 200 - ', "
    "CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR), ' ', "
    "CAST(user_id AS VARCHAR))"
)

_ENVOY_REGEX, _ENVOY_FIELDS = compile_pattern(ENVOY_GROK)


@register(
    "func_grok",
    oracle=f"""
        SELECT event_id,
               regexp_extract(line, '{_ENVOY_REGEX}', 1) AS ts_str,
               regexp_extract(line, '{_ENVOY_REGEX}', 2) AS method,
               regexp_extract(line, '{_ENVOY_REGEX}', 4) AS protocol,
               CAST(regexp_extract(line, '{_ENVOY_REGEX}', 5) AS INT) AS response_code,
               CAST(regexp_extract(line, '{_ENVOY_REGEX}', 6) AS INT) AS bytes_sent
        FROM (SELECT event_id, {_ENVOY_LINE_DUCK} AS line FROM events) t
        WHERE regexp_matches(line, '{_ENVOY_REGEX}')
    """,
    doc="§2.8 grok(value, pattern) → extracted fields, compiled to native "
    "regexp_extract (http_events.sql:42-45; no Python UDF — SURVEY §7.5)",
)
def func_grok(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_decodable_spark.functions.grok import grok_extract

    lines = _envoy_lines(spark, sf_dir)
    # grok_extract = rlike filter + ONE group-rewrite regex per row
    g = grok_extract(lines, "line", ENVOY_GROK)
    # project extracted fields (CASTs mirror http_events.sql:22-37)
    return g.select(
        "event_id",
        F.col("timestamp").alias("ts_str"),
        "method",
        "protocol",
        F.col("response_code").cast("int").alias("response_code"),
        F.col("bytes_sent").cast("int").alias("bytes_sent"),
    )


@register(
    "func_grok_agg",
    oracle=f"""
        SELECT method, CAST(SUM(bytes_sent) AS BIGINT) AS total_bytes_sent
        FROM (
            SELECT regexp_extract(line, '{_ENVOY_REGEX}', 2) AS method,
                   CAST(regexp_extract(line, '{_ENVOY_REGEX}', 6) AS INT) AS bytes_sent
            FROM (SELECT {_ENVOY_LINE_DUCK} AS line FROM events) t
            WHERE regexp_matches(line, '{_ENVOY_REGEX}')
        ) g GROUP BY method
    """,
    doc="§2.8+§2.4 http_events_bytes_sent.sql:13-23 shape: grok → CAST → "
    "SUM GROUP BY map-access (the reference's change-stream aggregate)",
)
def func_grok_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_decodable_spark.functions.grok import grok_extract

    lines = _envoy_lines(spark, sf_dir)
    g = grok_extract(lines, "line", ENVOY_GROK)
    return (
        g.select("method", F.col("bytes_sent").cast("int").alias("bytes_sent"))
        .groupBy("method")
        # bytes_sent is INT → Spark SUM gives LONG; DuckDB SUM(INT) promotes to
        # HUGEINT, so the oracle casts back to BIGINT — both exact integers
        .agg(F.sum("bytes_sent").alias("total_bytes_sent"))
    )


SYSLOG_GROK = (
    r"%{IP:client} %{WORD:service}:%{INT:port} %{NUMBER:dur} %{LOGLEVEL:level}"
)
_SYSLOG_REGEX, _SYSLOG_FIELDS = compile_pattern(SYSLOG_GROK)
# the compiled regex is interpolated into the DuckDB oracle as a
# single-quoted SQL literal — escape quotes so a future GROK_PATTERNS entry
# containing one corrupts nothing at judge time (ADVICE r8); RE2
# compatibility of every base pattern is pinned by
# tests/test_round9.py::TestGrokOracleSafety
_SYSLOG_REGEX_SQL = _SYSLOG_REGEX.replace("'", "''")

_SYSLOG_LINE_DUCK = (
    "concat('10.', CAST(user_id % 256 AS VARCHAR), '.0.', "
    "CAST(event_id % 256 AS VARCHAR), ' svc', CAST(user_id % 7 AS VARCHAR), "
    "':', CAST(8000 + user_id % 100 AS VARCHAR), ' ', "
    "CAST(CAST(round(value * 100) AS BIGINT) // 100 AS VARCHAR), '.', "
    "lpad(CAST(CAST(round(value * 100) AS BIGINT) % 100 AS VARCHAR), 2, '0'), "
    "' ', CASE event_type WHEN 'click' THEN 'INFO' WHEN 'error' THEN 'ERROR' "
    "WHEN 'purchase' THEN 'WARN' WHEN 'signup' THEN 'DEBUG' "
    "ELSE 'TRACE' END)"
)


def _syslog_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize syslog-ish lines from events exercising the IP / WORD /
    INT / NUMBER / LOGLEVEL corners of the grok pattern library (the
    breadth beyond the Envoy example-model set)."""
    from dbt_decodable_spark.operators.dedup import fan_out

    e = fan_out(read_table(spark, sf_dir, "events"))
    cents = F.round(F.col("value") * 100).cast("bigint")
    level = (
        F.when(F.col("event_type") == "click", F.lit("INFO"))
        .when(F.col("event_type") == "error", F.lit("ERROR"))
        .when(F.col("event_type") == "purchase", F.lit("WARN"))
        .when(F.col("event_type") == "signup", F.lit("DEBUG"))
        .otherwise(F.lit("TRACE"))
    )
    return e.select(
        "event_id",
        F.concat(
            F.lit("10."),
            (F.col("user_id") % 256).cast("string"),
            F.lit(".0."),
            (F.col("event_id") % 256).cast("string"),
            F.lit(" svc"),
            (F.col("user_id") % 7).cast("string"),
            F.lit(":"),
            (F.lit(8000) + F.col("user_id") % 100).cast("string"),
            F.lit(" "),
            # FLOOR division to match DuckDB's `//` (Spark `div` truncates
            # toward zero — divergent for negative cents; same ADVICE-r7
            # hazard class as the retention/zorder day math): subtract pmod
            # first so div lands on an exact multiple. The `%` remainder is
            # truncation-semantics in BOTH engines, so it needs no shim.
            F.expr(
                "cast((cast(round(value * 100) as bigint)"
                " - pmod(cast(round(value * 100) as bigint), 100))"
                " div 100 as string)"
            ),
            F.lit("."),
            F.lpad((cents % 100).cast("string"), 2, "0"),
            F.lit(" "),
            level,
        ).alias("line"),
    )


@register(
    "func_grok_patterns",
    oracle=f"""
        SELECT event_id,
               regexp_extract(line, '{_SYSLOG_REGEX_SQL}', 1) AS client,
               regexp_extract(line, '{_SYSLOG_REGEX_SQL}', 2) AS service,
               CAST(regexp_extract(line, '{_SYSLOG_REGEX_SQL}', 3) AS INT) AS port,
               regexp_extract(line, '{_SYSLOG_REGEX_SQL}', 4) AS dur,
               regexp_extract(line, '{_SYSLOG_REGEX_SQL}', 5) AS level
        FROM (SELECT event_id, {_SYSLOG_LINE_DUCK} AS line FROM events) t
        WHERE regexp_matches(line, '{_SYSLOG_REGEX_SQL}')
    """,
    doc="§2.8 grok pattern-library breadth — IP, WORD, INT, NUMBER and "
    "LOGLEVEL base patterns (functions/grok.py GROK_PATTERNS) beyond the "
    "Envoy example-model subset (http_events.sql:44): a syslog-shaped "
    "line parsed back to five typed fields with the same compile-once → "
    "native regexp machinery as func_grok (two regex executions per row, "
    "zero Python UDFs). The identical compiled regex string runs in the "
    "DuckDB oracle, so every base pattern's translation is value-proven, "
    "not just unit-tested.",
)
def func_grok_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_decodable_spark.functions.grok import grok_extract

    lines = _syslog_lines(spark, sf_dir)
    g = grok_extract(lines, "line", SYSLOG_GROK)
    return g.select(
        "event_id",
        "client",
        "service",
        F.col("port").cast("int").alias("port"),
        "dur",
        "level",
    )


@register(
    "func_url",
    oracle="""
        WITH u AS (
            SELECT doc_id,
                   'https://corpus.example.com/docs/' || CAST(doc_id AS VARCHAR)
                   || '?lang=' || lang || '&src=' || source AS url
            FROM documents WHERE doc_id < 200
        )
        SELECT doc_id,
               regexp_extract(url, 'https?://([^/]+)', 1) AS host,
               regexp_extract(url, 'https?://[^/]+(/[^?]*)', 1) AS path,
               regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param
        FROM u
    """,
    doc="§2.8 URL parsing (Flink PARSE_URL): host/path/query-param "
    "extraction via Spark's native parse_url — JVM-side; the oracle "
    "reproduces the same fields with anchored regexps",
)
def func_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    url = F.concat(
        F.lit("https://corpus.example.com/docs/"), F.col("doc_id").cast("string"),
        F.lit("?lang="), F.col("lang"), F.lit("&src="), F.col("source"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@register(
    "func_unicode_nfc",
    oracle="""
        SELECT s,
               nfc_normalize(s) AS nfc,
               CAST(length(nfc_normalize(s)) AS BIGINT) AS nfc_len,
               CAST(length(s) AS BIGINT) AS raw_len
        FROM (VALUES
            ('e' || chr(769) || 'cole'),
            ('Am' || chr(233) || 'lie'),
            (chr(64257) || 'le'),
            ('a' || chr(776)),
            ('plain ascii')
        ) AS t(s)
    """,
    doc="§2.8 Unicode NFC normalization: no Spark builtin exists, so this "
    "is a documented Arrow-batched pandas_udf map (functions/"
    "unicode_norm.py) — combining sequences compose (e+U+0301 → é), "
    "ligatures stay (NFC, not NFKC). Inputs are inline VALUES with real "
    "denormalized sequences because the test corpus is ASCII-only.",
)
def func_unicode_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_decodable_spark.functions.unicode_norm import nfc

    rows = [
        ("e\u0301cole",),      # e + combining acute (oracle: chr(769))
        ("Am\u00e9lie",),      # precomposed e-acute (oracle: chr(233))
        ("\ufb01le",),         # fi ligature (oracle: chr(64257))
        ("a\u0308",),          # a + combining diaeresis (oracle: chr(776))
        ("plain ascii",),
    ]
    df = spark.createDataFrame(rows, "s string")
    return df.select(
        "s",
        nfc("s").alias("nfc"),
        F.length(nfc("s")).cast("long").alias("nfc_len"),
        F.length("s").cast("long").alias("raw_len"),
    )


@register(
    "func_string_flink",
    oracle="""
        SELECT c_custkey,
               string_split(c_name, '#')[2] AS key_part,
               c_mktsegment AS seg_from_map,
               base64(encode(c_name)) AS name_b64,
               c_name AS name_rt,
               lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS key_pad,
               repeat('-', 3) || c_mktsegment AS seg_dashed,
               strpos(c_name, '1') AS one_pos
        FROM customer WHERE c_custkey <= 500
    """,
    doc="§2.8 Flink string builtins through the dialect shim "
    "(dialect.normalize → spark.sql): SPLIT_INDEX (plain-string delim, "
    "0-based — rewritten to \\Q-quoted regex split), STR_TO_MAP (Flink "
    "default ,/= delimiters injected — Spark's default is ,/: — map "
    "probed by key so no map-typed output reaches the driver canon), "
    "TO_BASE64/FROM_BASE64 (→ base64/unbase64+CAST) round-trip, and the "
    "name-compatible LOCATE/LPAD/REPEAT passthroughs.",
)
def func_string_flink(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_decodable_spark.dialect import normalize

    read_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    flink_sql = """
        SELECT c_custkey,
               SPLIT_INDEX(c_name, '#', 1) AS key_part,
               STR_TO_MAP(concat('seg=', c_mktsegment, ',key=', c_custkey))['seg']
                   AS seg_from_map,
               TO_BASE64(c_name) AS name_b64,
               FROM_BASE64(TO_BASE64(c_name)) AS name_rt,
               LPAD(CAST(c_custkey AS STRING), 12, '0') AS key_pad,
               concat(REPEAT('-', 3), c_mktsegment) AS seg_dashed,
               CAST(LOCATE('1', c_name) AS BIGINT) AS one_pos
        FROM customer WHERE c_custkey <= 500
    """
    return spark.sql(normalize(flink_sql))


@register(
    "func_datetime_flink",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_json,
               CAST(date_diff('day', CAST(ts AS TIMESTAMP),
                              CAST(ts AS TIMESTAMP) + INTERVAL 90 DAY)
                    AS BIGINT) AS dd,
               CAST(date_diff('hour', CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP),
                              CAST(ts AS TIMESTAMP)) AS BIGINT) AS hours_into_day,
               CAST(ts AS TIMESTAMP) + INTERVAL 36 HOUR AS ts_plus,
               strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H') AS fmt
        FROM events WHERE event_id < 500
    """,
    doc="§2.8 Flink temporal builtins through the dialect shim: "
    "TIMESTAMPDIFF/TIMESTAMPADD (name-compatible with Spark ≥3.3 — parity "
    "proven, not assumed), JSON_VALUE → get_json_object rewrite, "
    "DATE_FORMAT with a Java pattern (translated per-engine in the "
    "oracle). Runs as full Flink-SQL text via dialect.normalize.",
)
def func_datetime_flink(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_decodable_spark.dialect import normalize

    read_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    flink_sql = """
        SELECT event_id,
               CAST(JSON_VALUE(props, '$.k') AS BIGINT) AS k_json,
               CAST(TIMESTAMPDIFF(DAY, ts, TIMESTAMPADD(DAY, 90, ts)) AS BIGINT) AS dd,
               CAST(TIMESTAMPDIFF(HOUR, date_trunc('day', ts), ts) AS BIGINT)
                   AS hours_into_day,
               TIMESTAMPADD(HOUR, 36, ts) AS ts_plus,
               DATE_FORMAT(ts, 'yyyy-MM-dd HH') AS fmt
        FROM events WHERE event_id < 500
    """
    return spark.sql(normalize(flink_sql))
