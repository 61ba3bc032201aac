"""End-to-end parity: the reference's example project model SQL runs
VERBATIM through this engine (Jinja config blocks map to engine arguments,
exactly as the dbt adapter maps them to stream/pipeline specs).

Sources: ``/root/reference/example_project/example/models/example/
{http_events,events_count,http_events_bytes_sent}.sql`` — the SQL bodies
below are byte-identical to the model bodies (whitespace included), and the
config blocks' watermark / primary_key settings are asserted through the
schema model.
"""

import pytest

from dbt_decodable_spark.catalog import Engine
from dbt_decodable_spark.schema import Watermark

HTTP_EVENTS_SQL = r"""SELECT
  TO_TIMESTAMP(CAST(envoy['timestamp'] AS STRING), 'yyyy-MM-dd''T''HH:mm:ss''Z''') AS `timestamp`,
  CAST(envoy['method']            AS STRING) AS `method`,
  CAST(envoy['original_path']     AS STRING) AS original_path,
  CAST(envoy['protocol']          AS STRING) AS protocol,
  CAST(envoy['response_code']     AS INT)    AS response_code,
  CAST(envoy['response_flags']    AS STRING) AS response_flags,
  CAST(envoy['bytes_rcvd']        AS INT)    AS bytes_rcvd,
  CAST(envoy['bytes_sent']        AS INT)    AS bytes_sent,
  CAST(envoy['duration']          AS INT)    AS duration,
  CAST(envoy['upstream_svc_time'] AS INT)    AS upstream_svc_time,
  CAST(envoy['x_forwarded_for']   AS STRING) AS x_forwarded_for,
  CAST(envoy['useragent']         AS STRING) AS useragent,
  CAST(envoy['request_id']        AS STRING) AS request_id,
  CAST(envoy['authority']         AS STRING) AS authority,
  CAST(envoy['upstream_host']     AS STRING) AS upstream_host
FROM (
    -- Match and parse Envoy records in the value field of the envoy_raw stream.
    -- grok() produces a map<field name, value> we call envoy.
    SELECT
      grok(
        `value`,
        '\[%{TIMESTAMP_ISO8601:timestamp}\] "%{DATA:method} %{DATA:original_path} %{DATA:protocol}" %{DATA:response_code} %{DATA:response_flags} %{NUMBER:bytes_rcvd} %{NUMBER:bytes_sent} %{NUMBER:duration} %{DATA:upstream_svc_time} "%{DATA:x_forwarded_for}" "%{DATA:useragent}" "%{DATA:request_id}" "%{DATA:authority}" "%{DATA:upstream_host}"'
      ) AS envoy
    FROM envoy_raw
)"""

EVENTS_COUNT_SQL = r"""select
    coalesce(resource_type, '__UNKNOWN__') as resource_type,
    coalesce(audit_event_type, '__UNKNOWN__') as audit_event_type,
    count(1) as count_observed,
    min(to_timestamp_ltz(`timestamp`, 3)) as min_timestamp,
    max(to_timestamp_ltz(`timestamp`, 3)) as max_timestamp
from (select * from _events)
group by resource_type, audit_event_type"""

BYTES_SENT_SQL = r"""SELECT coalesce(CAST(envoy['method'] AS STRING), '__UNKNOWN__')  AS `method`,
       SUM(CAST(envoy['bytes_sent'] AS INT)) AS `total_bytes_sent`
FROM (
         -- Match and parse Envoy records in the value field of the envoy_raw stream.
         -- grok() produces a map<field name, value> we call envoy.
         SELECT grok(
                        `value`,
                        '\[%{TIMESTAMP_ISO8601:timestamp}\] "%{DATA:method} %{DATA:original_path} %{DATA:protocol}" %{DATA:response_code} %{DATA:response_flags} %{NUMBER:bytes_rcvd} %{NUMBER:bytes_sent} %{NUMBER:duration} %{DATA:upstream_svc_time} "%{DATA:x_forwarded_for}" "%{DATA:useragent}" "%{DATA:request_id}" "%{DATA:authority}" "%{DATA:upstream_host}"'
                    ) AS envoy
         FROM envoy_raw)
GROUP BY envoy['method']"""

ENVOY_LINES = [
    '[2023-01-15T10:30:00Z] "GET /api/shoes HTTP/1.1" 200 - 432 1234 12 11 '
    '"10.0.0.1" "curl/7.85" "r-1" "shop.local" "10.9.8.7:443"',
    '[2023-01-15T10:30:05Z] "GET /api/hats HTTP/1.1" 404 NR 10 20 3 2 '
    '"10.0.0.2" "Mozilla/5.0" "r-2" "shop.local" "10.9.8.7:443"',
    '[2023-01-15T10:30:09Z] "POST /api/cart HTTP/2" 201 - 900 40 8 7 '
    '"10.0.0.1" "curl/7.85" "r-3" "shop.local" "10.9.8.8:443"',
    "this line is not an envoy access log",
]


@pytest.fixture()
def ex_engine(spark):
    # the example project uses bare stream names (no dbt namespace prefix)
    eng = Engine(spark, namespace="")
    yield eng
    eng.cleanup()


class TestHttpEvents:
    def test_model_runs_verbatim(self, ex_engine, spark):
        df = spark.createDataFrame([(x,) for x in ENVOY_LINES], "value string")
        ex_engine.create_stream("envoy_raw", data=df)
        ex_engine.create_pipeline("http_events", HTTP_EVENTS_SQL)
        out = ex_engine.read_stream("http_events")
        assert out.columns == [
            "timestamp", "method", "original_path", "protocol", "response_code",
            "response_flags", "bytes_rcvd", "bytes_sent", "duration",
            "upstream_svc_time", "x_forwarded_for", "useragent", "request_id",
            "authority", "upstream_host",
        ]
        rows = {r["request_id"]: r for r in out.collect()}
        r1 = rows["r-1"]
        assert str(r1["timestamp"]) == "2023-01-15 10:30:00"
        assert (r1["method"], r1["original_path"], r1["protocol"]) == (
            "GET", "/api/shoes", "HTTP/1.1",
        )
        assert (r1["response_code"], r1["response_flags"]) == (200, "-")
        assert (r1["bytes_rcvd"], r1["bytes_sent"], r1["duration"]) == (432, 1234, 12)
        assert (r1["upstream_svc_time"], r1["x_forwarded_for"]) == (11, "10.0.0.1")
        assert (r1["useragent"], r1["authority"], r1["upstream_host"]) == (
            "curl/7.85", "shop.local", "10.9.8.7:443",
        )
        # the non-matching line survives as an all-null record (grok → NULL map)
        nulls = rows[None]
        assert nulls["method"] is None and nulls["response_code"] is None

    def test_config_watermark_parses(self):
        # config block: `timestamp` - INTERVAL '0.001' SECOND (http_events.sql:9)
        wm = Watermark("timestamp", "`timestamp` - INTERVAL '0.001' SECOND")
        assert wm.delay() == ("timestamp", "1 milliseconds")


class TestEventsCount:
    def test_model_runs_verbatim(self, ex_engine, spark):
        df = spark.createDataFrame(
            [
                ("stream", "create", 1673778600000),
                ("stream", "create", 1673778605000),
                ("pipeline", None, 1673778610000),
                (None, "delete", 1673778615000),
            ],
            "resource_type string, audit_event_type string, timestamp bigint",
        )
        ex_engine.create_stream("_events", data=df)
        ex_engine.create_pipeline(
            "events_count",
            EVENTS_COUNT_SQL,
            primary_key=["resource_type", "audit_event_type"],
        )
        out = {
            (r["resource_type"], r["audit_event_type"]): r
            for r in ex_engine.read_stream("events_count").collect()
        }
        assert out[("stream", "create")]["count_observed"] == 2
        assert str(out[("stream", "create")]["min_timestamp"]) == "2023-01-15 10:30:00"
        assert str(out[("stream", "create")]["max_timestamp"]) == "2023-01-15 10:30:05"
        assert out[("pipeline", "__UNKNOWN__")]["count_observed"] == 1
        assert out[("__UNKNOWN__", "delete")]["count_observed"] == 1
        # config block: PK constraint lands on the sink stream schema
        sink = ex_engine.get_stream("events_count")
        assert sink.schema.primary_key == ("resource_type", "audit_event_type")

    def test_config_watermark_parses(self):
        # config block: min_timestamp - interval '0.100' SECOND (events_count.sql:8)
        wm = Watermark("min_timestamp", "min_timestamp - INTERVAL '0.100' SECOND")
        assert wm.delay() == ("min_timestamp", "100 milliseconds")


class TestHttpEventsBytesSent:
    def test_model_runs_verbatim(self, ex_engine, spark):
        df = spark.createDataFrame([(x,) for x in ENVOY_LINES], "value string")
        ex_engine.create_stream("envoy_raw", data=df)
        ex_engine.create_pipeline(
            "http_events_bytes_sent", BYTES_SENT_SQL, primary_key=["method"]
        )
        out = {
            r["method"]: r["total_bytes_sent"]
            for r in ex_engine.read_stream("http_events_bytes_sent").collect()
        }
        assert out == {"GET": 1254, "POST": 40, "__UNKNOWN__": None}
