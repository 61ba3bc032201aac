"""Joins (SURVEY §2.3): inner/left/right/full equi-joins, semi/anti, theta,
as-of. The reference reaches joins through the Flink SQL platform surface and
dbt ``relationships`` tests (``macros/materializations/test/test.sql:62-72``);
our engine maps them to Spark joins and lets Catalyst pick the physical
strategy (broadcast for the small dims here — region/nation/supplier are
classic broadcast sides; at 100 TB lineitem⋈orders stays a shuffle join on
the join key with AQE skew splitting).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession, functions as F

from dbt_decodable_spark.queries import register
from dbt_decodable_spark.queries.money import (
    cents,
    money_sum,
    revenue,
    sql_cents,
    sql_money_sum,
    sql_revenue,
)
from dbt_decodable_spark.sources.tables import read_table


@register(
    "join_inner",
    oracle=f"""
        SELECT n_name,
               count(*) AS n_customers,
               {sql_money_sum(sql_cents('c_acctbal'), 'total_bal')}
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    doc="§2.3 inner equi-join; nation is broadcast (25 rows); "
    "exact integer-cent accumulation → DOUBLE output (queries/money.py)",
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "inner")
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            money_sum(cents("c_acctbal"), "total_bal"),
        )
    )


@register(
    "join_left_outer",
    oracle="""
        SELECT c_custkey, count(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey
    """,
    doc="§2.3 left outer join (customers with zero orders kept)",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_right_outer",
    oracle="""
        SELECT c_custkey, o_orderkey
        FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        WHERE c_acctbal < 0
    """,
    doc="§2.3 right outer join",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0)
    o = read_table(spark, sf_dir, "orders")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select("c_custkey", "o_orderkey")


@register(
    "join_full_outer",
    oracle="""
        SELECT n_nationkey, r_regionkey
        FROM (SELECT n_nationkey, n_regionkey FROM nation WHERE n_nationkey < 10) n
        FULL JOIN (SELECT r_regionkey FROM region WHERE r_regionkey > 1) r
          ON n.n_regionkey = r.r_regionkey
    """,
    doc="§2.3 full outer join with unmatched rows on both sides",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = read_table(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 10)
    r = read_table(spark, sf_dir, "region").filter(F.col("r_regionkey") > 1)
    return (
        n.select("n_nationkey", "n_regionkey")
        .join(r.select("r_regionkey"), F.col("n_regionkey") == F.col("r_regionkey"), "full")
        .select("n_nationkey", "r_regionkey")
    )


@register(
    "join_semi",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000
        )
    """,
    doc="§2.3 left semi join (EXISTS)",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="§2.3 left anti join (NOT EXISTS — dbt relationships-test shape)",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_theta",
    oracle="""
        SELECT r_regionkey, count(*) AS n_bigger
        FROM region JOIN nation ON n_regionkey > r_regionkey
        GROUP BY r_regionkey
    """,
    doc="§2.3 theta (non-equi) join → BroadcastNestedLoopJoin on the small side",
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = read_table(spark, sf_dir, "region")
    n = read_table(spark, sf_dir, "nation")
    return (
        r.join(n, n.n_regionkey > r.r_regionkey)
        .groupBy("r_regionkey")
        .agg(F.count(F.lit(1)).alias("n_bigger"))
    )


@register(
    "join_three_way",
    oracle="""
        SELECT r_name, count(*) AS n_suppliers
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    doc="§2.3 multi-join chain; Catalyst join reordering + broadcast of both dims",
)
def join_three_way(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )


@register(
    "join_asof",
    oracle="""
        SELECT e.event_id, max(o.o_orderdate) AS last_order_date
        FROM events e
        JOIN orders o
          ON o.o_custkey = e.user_id AND o.o_orderdate <= CAST(e.ts AS TIMESTAMP)
        GROUP BY e.event_id
    """,
    doc="§2.3 as-of join (latest order at event time) — equi-key shuffle join + "
    "max-aggregate; the scalable alternative to FOR SYSTEM_TIME AS OF (SURVEY §7.6)",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    o = read_table(spark, sf_dir, "orders")
    return (
        e.join(o, (o.o_custkey == e.user_id) & (o.o_orderdate <= e.ts))
        .groupBy("event_id")
        .agg(F.max("o_orderdate").alias("last_order_date"))
    )


@register(
    "join_lookup_broadcast",
    oracle="""
        SELECT o_orderkey, c.c_mktsegment AS segment
        FROM orders JOIN customer c ON o_custkey = c_custkey
        WHERE o_totalprice > 250000
    """,
    doc="§2.3 lookup join: dimension snapshot broadcast against the fact stream",
)
def join_lookup_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    c = read_table(spark, sf_dir, "customer")
    return o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey", F.col("c_mktsegment").alias("segment")
    )


@register(
    "join_salted_skew",
    oracle=f"""
        SELECT s_name,
               {sql_revenue()},
               count(*) AS n_items
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_name
    """,
    doc="§2.3 + SCALING: salted equi-join (hot keys scattered over salt "
    "buckets, small side replicated) — result-identical to the plain join; "
    "the planned skew fix where AQE's runtime split can't reach",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_decodable_spark.operators.skew import salted_join

    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    # 100 suppliers × 600k lineitems at sf0.1 → every key is "hot" relative
    # to a by-key shuffle; salting spreads each over 16 buckets
    return (
        salted_join(
            li.withColumnRenamed("l_suppkey", "suppkey"),
            s.withColumnRenamed("s_suppkey", "suppkey"),
            on=["suppkey"],
            salt=16,
        )
        .groupBy("s_name")
        .agg(
            revenue(),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@contextmanager
def _aqe_skew_conf(spark: SparkSession, threshold: str, advisory: str):
    """Force AQE's runtime skew-split on for the enclosed execution.

    ``forceOptimizeSkewedJoin`` keeps the split on even when it adds a
    shuffle for the downstream aggregation; ``autoBroadcastJoinThreshold=-1``
    stops the small supplier side from broadcasting, which would bypass the
    shuffle being demonstrated (the broadcast IS the right plan at this
    size — join_lookup_broadcast covers it; this path deliberately
    exercises the skewed-shuffle join a 100 TB fact⋈fact join is stuck
    with). Confs restore on exit; AQE reads them at execution time, so
    callers must materialize inside the context."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": threshold,
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": advisory,
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # AQE splits a skewed reduce partition at MAP-output granularity —
        # a single-file local read is ONE map task, leaving nothing to
        # split. Small read splits emulate the thousands of map tasks a
        # 100 TB scan has naturally; the coalesce knob stays default so the
        # non-skewed partitions still merge back.
        "spark.sql.files.maxPartitionBytes": advisory,
    }
    saved: dict[str, str | None] = {}
    for k, v in confs.items():
        # get(k, None) — NOT bare get(k): for registered SQL confs the
        # bare form returns the DEFAULT instead of raising, which would
        # make restore pin previously-unset confs to explicit values
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _skew_join_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_decodable_spark.operators.dedup import fan_out

    # fan_out: the testdata parquet is one row group → ONE map task, and
    # AQE splits skewed reduce partitions at map-output granularity, so a
    # single-map shuffle has nothing to split. At 100 TB the scan is
    # thousands of row groups and this rebalance is a no-op-ish shuffle.
    li = fan_out(read_table(spark, sf_dir, "lineitem"))
    s = read_table(spark, sf_dir, "supplier")
    return li.join(s, li["l_suppkey"] == s["s_suppkey"]).select(
        "s_name", "l_extendedprice", "l_discount"
    )


def skew_aqe_rollup(
    spark: SparkSession,
    sf_dir: str,
    threshold: str = "256KB",
    advisory: str = "128KB",
) -> DataFrame:
    """The join_salted_skew rollup computed the OTHER way: a plain shuffled
    join with AQE's runtime skew-split doing the scattering (the twin the
    salted operator's docstring defers to for sort-merge JOIN skew).

    The JOIN is materialized on its own, then aggregated: AQE's
    OptimizeSkewedJoin only fires when nothing but simple wrappers sit
    between the join and its stage boundary — a partial HashAggregate
    planned into the same stage suppresses the split even under
    ``forceOptimizeSkewedJoin`` (verified empirically on this Spark; the
    salted twin exists precisely because AQE's skew handling cannot reach
    every shape). Cutting the lineage with a localCheckpoint between join
    and rollup keeps the split live where it matters — the skewed join
    stage — at the cost of materializing the join output once; at 100 TB
    the equivalent is a persisted intermediate or simply accepting the
    partial-agg plan, which map-side-combines away the skew for
    decomposable aggregates anyway (that case needs no skew fix at all).
    """
    with _aqe_skew_conf(spark, threshold, advisory):
        joined = _skew_join_frame(spark, sf_dir).localCheckpoint(eager=True)
        return (
            joined.groupBy("s_name")
            .agg(
                revenue(),
                F.count(F.lit(1)).alias("n_items"),
            )
            .localCheckpoint(eager=True)
        )


def skew_aqe_plan(
    spark: SparkSession, sf_dir: str, threshold: str, advisory: str
) -> str:
    """Execute the skewed join under forced confs and return the FINAL
    adaptive physical plan string (for plan assertions — the registered
    query returns a checkpointed frame whose lineage is already cut)."""
    with _aqe_skew_conf(spark, threshold, advisory):
        df = _skew_join_frame(spark, sf_dir)
        df.collect()
        return df._jdf.queryExecution().executedPlan().toString()


@register(
    "join_skew_aqe",
    oracle=f"""
        SELECT s_name,
               {sql_revenue()},
               count(*) AS n_items
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_name
    """,
    doc="§2.3 + SCALING: AQE runtime skew-split join — the twin of "
    "join_salted_skew demonstrating Spark's built-in answer to JOIN-side "
    "skew (AQE splits oversized shuffle partitions at runtime from map "
    "output stats; salting remains the fix for skewed REDUCE "
    "aggregations, which AQE does not cover). Identical rollup, identical "
    "oracle — both skew strategies are proven result-equivalent to the "
    "plain join. Plan shape (AQEShuffleRead with skew splits under forced "
    "thresholds) is pinned in tests/test_plans.py.",
)
def join_skew_aqe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return skew_aqe_rollup(spark, sf_dir)
