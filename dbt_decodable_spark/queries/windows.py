"""OVER-window functions (SURVEY §2.5): ranking, analytic lag/lead/first/last,
aggregates over ROWS/RANGE frames, top-k per group (Flink's top-N idiom).
Platform surface only in the reference (no model uses OVER), mapped to Spark
``Window`` specs. Deterministic ordering: every ORDER BY includes a unique
tie-break key.

Scale note: a window over PARTITION BY k is one shuffle on k; within-partition
sort is spill-aware. Top-k per group stays fully distributed (no driver
collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from dbt_decodable_spark.queries import register
from dbt_decodable_spark.sources.tables import read_table


@register(
    "window_topk_per_group",
    oracle="""
        SELECT c_custkey, o_orderkey, o_totalprice, rn
        FROM (
            SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS rn
            FROM orders
        ) t WHERE rn <= 3
    """,
    doc="§2.5/§2.6 top-k per group: row_number + filter (Flink top-N idiom)",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "window_rank_dense",
    oracle="""
        SELECT o_orderkey,
               rank() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
               dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY year(o_orderdate)) AS drnk
        FROM orders WHERE o_orderkey <= 2000
    """,
    doc="§2.5 rank/dense_rank",
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    w1 = W.partitionBy("o_orderstatus").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    w2 = W.partitionBy("o_orderstatus").orderBy(F.year("o_orderdate"))
    return o.select(
        "o_orderkey",
        F.rank().over(w1).alias("rnk"),
        F.dense_rank().over(w2).alias("drnk"),
    )


@register(
    "window_lag_lead",
    oracle="""
        SELECT o_orderkey,
               lag(o_orderkey) OVER w AS prev_order,
               lead(o_orderkey) OVER w AS next_order
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="§2.5 lag/lead analytic functions",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
    )


@register(
    "window_first_last",
    oracle="""
        SELECT o_orderkey,
               first_value(o_orderkey) OVER w AS first_order,
               last_value(o_orderkey) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS last_order
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="§2.5 first_value/last_value (full-frame last_value)",
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(wfull).alias("last_order"),
    )


@register(
    "window_rows_frame",
    oracle="""
        SELECT o_orderkey,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) / 100.0 AS running_total
        FROM orders
    """,
    doc="§2.5 aggregate over ROWS frame (running total); exact integer-cent "
    "prefix sums over a unique ordering → deterministic DOUBLE "
    "(queries/money.py)",
)
def window_rows_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_decodable_spark.queries.money import cents

    o = read_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        (F.sum(cents("o_totalprice")).over(w).cast("double") / F.lit(100.0)).alias(
            "running_total"
        ),
    )


@register(
    "window_range_frame",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               count(*) OVER (
                   PARTITION BY l_orderkey ORDER BY l_linenumber
                   RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING
               ) AS n_near
        FROM lineitem WHERE l_orderkey <= 500
    """,
    doc="§2.5 RANGE frame over an integer ordering column",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 500)
    w = W.partitionBy("l_orderkey").orderBy("l_linenumber").rangeBetween(-1, 1)
    return li.select("l_orderkey", "l_linenumber", F.count(F.lit(1)).over(w).alias("n_near"))


@register(
    "window_ntile_cume",
    oracle="""
        SELECT o_orderkey,
               ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile,
               CAST(percent_rank() OVER (ORDER BY o_totalprice, o_orderkey) AS DOUBLE) AS pct_rank,
               CAST(cume_dist() OVER (ORDER BY o_totalprice, o_orderkey) AS DOUBLE) AS cume
        FROM orders WHERE o_orderkey <= 1000
    """,
    doc="§2.5 ntile/percent_rank/cume_dist (global window — bounded input only; "
    "unbounded global sort is the documented anti-pattern at scale)",
)
def window_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    w = W.orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).cast("double").alias("pct_rank"),
        F.cume_dist().over(w).cast("double").alias("cume"),
    )


@register(
    "window_dedup_latest",
    oracle="""
        SELECT user_id, event_id AS latest_event
        FROM (
            SELECT user_id, event_id,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        ) t WHERE rn = 1
    """,
    doc="§2.5 latest-row-per-key dedup (Flink dedup idiom; also the change-stream "
    "last-image fold of handler.py:89-94 in batch form)",
)
def window_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_id").alias("latest_event"))
    )
