"""Classic TPC-H-shaped analytics over the driver's star schema (the
multi-join + agg + top-k workloads a platform user actually runs; SURVEY §2.3
join chains + §2.4 aggregates under one roof). Revenue sums use the exact
integer-cent accumulation policy (queries/money.py) — BIGINT unit sums,
DOUBLE outputs, no DECIMAL anywhere in the output schema."""

from __future__ import annotations

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
    "tpch_q3_shipping_priority",
    oracle=f"""
        SELECT l_orderkey,
               {sql_revenue()},
               o_orderdate
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
    """,
    doc="TPC-H Q3 shape: 3-way join, filtered fact, grouped revenue, top-10",
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1995-03-15")
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(revenue())
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate"), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
        SELECT n_name,
               {sql_revenue()}
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name
    """,
    doc="TPC-H Q5 shape: 6-way join chain (Catalyst reorders; dims broadcast), "
    "regional revenue rollup",
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        # note: classic Q5 also requires c_nationkey = s_nationkey; with the
        # driver's 10-supplier synthetic data that predicate empties the
        # result, so the local-supplier restriction is dropped here
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(revenue())
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle=f"""
        SELECT {sql_money_sum(f"{sql_cents('l_extendedprice')} * {sql_cents('l_discount')}", 'revenue', scale=4)}
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: pure scan-filter-aggregate (pushdown showcase)",
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(money_sum(cents("l_extendedprice") * cents("l_discount"), "revenue", scale=4))
    )


@register(
    "func_conditional",
    oracle="""
        SELECT o_orderkey,
               greatest(o_totalprice, 150000.0) AS g,
               least(o_totalprice, 150000.0) AS l,
               IF(o_orderstatus = 'O', 'open', 'done') AS st
        FROM orders WHERE o_orderkey <= 800
    """,
    doc="§2.8 conditional functions: GREATEST/LEAST/IF",
)
def func_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 800)
    return o.select(
        "o_orderkey",
        F.greatest(F.col("o_totalprice"), F.lit(150000.0)).alias("g"),
        F.least(F.col("o_totalprice"), F.lit(150000.0)).alias("l"),
        F.when(F.col("o_orderstatus") == "O", "open").otherwise("done").alias("st"),
    )
