"""Aggregations (SURVEY §2.4): GROUP BY on columns and expressions, global
aggregates, distinct, statistics, ROLLUP/CUBE/GROUPING SETS, HAVING.

Reference surface: ``GROUP BY`` + count/min/max (``events_count.sql:18-25``),
``sum`` over casted map values + GROUP BY expression
(``http_events_bytes_sent.sql:13-23``), grand-total count in the test wrapper
(``macros/materializations/test/test.sql:68-72``), distinct/rollup/cube from
the Flink SQL platform surface.

Float determinism: per-row integer scaling (exact cents), exact BIGINT
accumulation, one final int64→double conversion — identical bits from Spark
and DuckDB. See queries/money.py for the full policy and its rationale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dbt_decodable_spark.queries import register
from dbt_decodable_spark.queries.money import (
    cents,
    charge_units,
    disc_price_units,
    money_sum,
    sql_cents,
    sql_charge_units,
    sql_disc_price_units,
    sql_money_sum,
)
from dbt_decodable_spark.sources.tables import read_table


@register(
    "events_count",
    oracle="""
        SELECT coalesce(event_type, '__UNKNOWN__') AS resource_type,
               coalesce(json_extract_string(props, '$.k'), '__UNKNOWN__') AS audit_event_type,
               count(*) AS count_observed,
               CAST(to_timestamp(epoch_ms(CAST(min(ts) AS TIMESTAMP)) / 1000) AS TIMESTAMP) AS min_timestamp,
               CAST(to_timestamp(epoch_ms(CAST(max(ts) AS TIMESTAMP)) / 1000) AS TIMESTAMP) AS max_timestamp
        FROM (SELECT * FROM events) e
        GROUP BY coalesce(event_type, '__UNKNOWN__'),
                 coalesce(json_extract_string(props, '$.k'), '__UNKNOWN__')
    """,
    doc="FLAGSHIP — the reference's events_count model (events_count.sql:18-25): "
    "coalesce keys, count(1), to_timestamp_ltz(min/max, 3), GROUP BY, derived-table "
    "subquery; PK (resource_type, audit_event_type) ⇒ change-stream output",
)
def events_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_decodable_spark.functions.flink_compat import to_timestamp_ltz

    e = read_table(spark, sf_dir, "events")
    sub = e.select("*")  # derived-table subquery per the reference model
    min_ms = F.unix_millis(F.min("ts"))
    max_ms = F.unix_millis(F.max("ts"))
    return (
        sub.groupBy(
            F.coalesce(F.col("event_type"), F.lit("__UNKNOWN__")).alias("resource_type"),
            F.coalesce(F.get_json_object("props", "$.k"), F.lit("__UNKNOWN__")).alias(
                "audit_event_type"
            ),
        )
        .agg(
            F.count(F.lit(1)).alias("count_observed"),
            to_timestamp_ltz(min_ms, 3).alias("min_timestamp"),
            to_timestamp_ltz(max_ms, 3).alias("max_timestamp"),
        )
    )


@register(
    "agg_groupby_q1",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {sql_money_sum(sql_cents('l_quantity'), 'sum_qty')},
               {sql_money_sum(sql_cents('l_extendedprice'), 'sum_base_price')},
               {sql_money_sum(sql_disc_price_units(), 'sum_disc_price', scale=4)},
               {sql_money_sum(sql_charge_units(), 'sum_charge', scale=6)},
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    doc="§2.4 TPC-H Q1 shape: hash agg w/ partial+final, 8-col agg over 2 keys; "
    "exact integer-cent accumulation → DOUBLE output (queries/money.py)",
)
def agg_groupby_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum(cents("l_quantity"), "sum_qty"),
            money_sum(cents("l_extendedprice"), "sum_base_price"),
            money_sum(disc_price_units(), "sum_disc_price", scale=4),
            money_sum(charge_units(), "sum_charge", scale=6),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_global",
    oracle="""
        SELECT count(*) AS n_rows,
               count(l_returnflag) AS n_flags,
               CAST(min(l_shipdate) AS TIMESTAMP) AS min_ship,
               CAST(max(l_shipdate) AS TIMESTAMP) AS max_ship
        FROM lineitem
    """,
    doc="§2.4 grand-total aggregate, no GROUP BY (test.sql:68-72 wrapper shape)",
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("l_returnflag").alias("n_flags"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )


@register(
    "agg_groupby_expression",
    oracle=f"""
        SELECT CAST(year(o_orderdate) AS INT) AS order_year,
               count(*) AS n_orders,
               {sql_money_sum(sql_cents('o_totalprice'), 'total_price')}
        FROM orders
        GROUP BY CAST(year(o_orderdate) AS INT)
    """,
    doc="§2.4 GROUP BY expression (http_events_bytes_sent.sql:23 pattern)",
)
def agg_groupby_expression(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum(cents("o_totalprice"), "total_price"),
        )
    )


@register(
    "agg_distinct",
    oracle="""
        SELECT l_returnflag,
               count(DISTINCT l_partkey) AS distinct_parts,
               count(DISTINCT l_suppkey) AS distinct_supps
        FROM lineitem GROUP BY l_returnflag
    """,
    doc="§2.4 count(DISTINCT) — expand+two-phase agg in Spark",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_supps"),
    )


@register(
    "agg_stats",
    oracle="""
        SELECT l_linestatus,
               CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)
                   / count(l_quantity) AS avg_qty,
               sqrt(
                 (CAST(SUM(CAST(round(l_quantity * l_quantity) AS BIGINT)) AS DOUBLE)
                  - CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)
                    * CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)
                    / count(l_quantity))
                 / (count(l_quantity) - 1)
               ) AS stddev_qty
        FROM lineitem GROUP BY l_linestatus
    """,
    doc="§2.4 avg/stddev: exact integer sums (l_quantity is integral), then "
    "identical double arithmetic on both engines — deterministic to the bit",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    sum_q = F.sum(F.round(q).cast("long")).cast("double")
    sum_q2 = F.sum(F.round(q * q).cast("long")).cast("double")
    n = F.count("l_quantity")
    return li.groupBy("l_linestatus").agg(
        (sum_q / n).alias("avg_qty"),
        F.sqrt((sum_q2 - sum_q * sum_q / n) / (n - 1)).alias("stddev_qty"),
    )


@register(
    "agg_having",
    oracle="""
        SELECT l_partkey, count(*) AS n
        FROM lineitem
        GROUP BY l_partkey
        HAVING count(*) > 40
    """,
    doc="§2.4 HAVING (dbt unique-test compiles to group-by+having)",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 40)


@register(
    "agg_rollup",
    oracle="""
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="§2.4 ROLLUP",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(F.count(F.lit(1)).alias("n"))


@register(
    "agg_cube",
    oracle="""
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="§2.4 CUBE",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(F.count(F.lit(1)).alias("n"))


@register(
    "agg_grouping_sets",
    oracle="""
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
    doc="§2.4 GROUPING SETS",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@register(
    "agg_minmax_by",
    oracle="""
        SELECT l_returnflag,
               min_by(l_orderkey, l_extendedprice) AS cheapest_order,
               max_by(l_orderkey, l_extendedprice) AS priciest_order
        FROM (
          SELECT l_returnflag, l_orderkey, l_extendedprice,
                 row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice, l_orderkey) AS rn_a,
                 row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice DESC, l_orderkey DESC) AS rn_d
          FROM lineitem
        ) t
        WHERE rn_a = 1 OR rn_d = 1
        GROUP BY l_returnflag
    """,
    doc="§2.4 min_by/max_by (deterministic: unique extremum enforced via tie-broken rownum)",
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    # min_by with ties is nondeterministic in both engines; restrict to the
    # tie-broken extremum rows first so the answer is unique.
    li = read_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               min_by(l_orderkey, l_extendedprice) AS cheapest_order,
               max_by(l_orderkey, l_extendedprice) AS priciest_order
        FROM (
          SELECT l_returnflag, l_orderkey, l_extendedprice,
                 row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice, l_orderkey) AS rn_a,
                 row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice DESC, l_orderkey DESC) AS rn_d
          FROM lineitem
        ) t
        WHERE rn_a = 1 OR rn_d = 1
        GROUP BY l_returnflag
        """
    )


@register(
    "agg_approx_distinct",
    oracle=None,  # approximate algorithms differ across engines → rows-only check
    doc="§2.4 approx_count_distinct (HLL++); scale path for 100 TB distincts",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.agg(F.approx_count_distinct("l_partkey").alias("approx_parts"))


@register(
    "agg_percentile",
    oracle="""
        SELECT l_returnflag,
               CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE) AS median_qty,
               CAST(quantile_cont(l_quantity, 0.9) AS DOUBLE) AS p90_qty
        FROM lineitem GROUP BY l_returnflag
    """,
    doc="§2.4 exact percentiles (continuous interpolation matches quantile_cont)",
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.expr("percentile(l_quantity, 0.9)").alias("p90_qty"),
    )


@register(
    "agg_salted_skew",
    oracle="""
        SELECT l_returnflag,
               count(*) AS n,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS price_units
        FROM lineitem GROUP BY l_returnflag
    """,
    doc="§2.4 skew-resistant two-phase aggregation: lineitem's "
    "l_returnflag has 3 hot keys carrying ~2M rows each at sf1 — a naive "
    "groupBy sends every hot-key row to one reducer. Phase 1 groups by "
    "(key, salt=xxhash64(id)%32) so each hot key spreads over 32 "
    "reducers; phase 2 merges the ≤32·k tiny partials. The merge is exact "
    "because count and integer-cent sums are associative — the same "
    "mergeability contract as the KMV sketches. (AQE's skew handling "
    "covers sort-merge JOINS, not aggregations — hash aggs already do "
    "map-side partials, but a true hot-key REDUCE still bottlenecks one "
    "task; explicit salting is the portable fix and composes with "
    "non-decomposable finals like exact medians.) Result is byte-identical "
    "to the plain groupBy the oracle runs.",
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    partial = (
        li.select(
            "l_returnflag",
            F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(32)).alias("__salt"),
            cents("l_extendedprice").alias("__units"),
        )
        .groupBy("l_returnflag", "__salt")
        .agg(F.count(F.lit(1)).alias("__n"), F.sum("__units").alias("__u"))
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("__n").alias("n"), F.sum("__u").alias("price_units")
    )


@register(
    "events_retention_cohorts",
    oracle="""
        WITH act AS (
            SELECT DISTINCT user_id,
                   (epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) // 7
                       AS week
            FROM events
        ),
        cohort AS (SELECT user_id, min(week) AS cohort_week FROM act GROUP BY user_id)
        SELECT c.cohort_week,
               a.week - c.cohort_week AS week_offset,
               count(*) AS n_users
        FROM act a JOIN cohort c ON a.user_id = c.user_id
        GROUP BY 1, 2
    """,
    doc="§2.4/§2.12 weekly cohort retention — the canonical product-"
    "analytics rollup (the reference's users run exactly this class of "
    "model over event streams): cohort = a user's first active epoch-week "
    "(exact integer week index, no calendar ambiguity), retention cell "
    "(cohort_week, week_offset) counts users active offset weeks later. "
    "Shapes: one (user, week) distinct, one per-user min, one broadcast-"
    "able join back (cohort table is |users| rows — at 100 TB it still "
    "shuffles on user_id once and the rollup is tiny). act is DISTINCT so "
    "n_users is exact without COUNT(DISTINCT) in the final agg.",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    # FLOOR division, not Spark's truncate-toward-zero `div`: DuckDB's `//`
    # floors, so the pair would diverge on pre-1970 timestamps (ADVICE r7).
    # (x - pmod(x, b)) is an exact multiple of b, so `div` equals floor;
    # floordiv(floordiv(x, 86400e6), 7) == floordiv(x, 604800e6) exactly.
    us = "unix_micros(ts)"
    act = e.select(
        "user_id",
        F.expr(f"(({us}) - pmod(({us}), 604800000000)) div 604800000000").alias("week"),
    ).distinct()
    cohort = act.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        act.join(cohort, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
