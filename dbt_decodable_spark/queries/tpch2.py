"""TPC-H-shaped coverage, second batch: the subquery-heavy query classes
(EXISTS / IN / correlated-scalar / anti-join) plus distribution and ratio
reports, adapted to the driver's star schema (no partsupp table, no
l_commitdate/l_receiptdate/l_shipmode columns — predicates substituted with
same-shaped conditions over the columns that exist).

Spark-first stance: every correlated subquery is written in its decorrelated
join form (semi/anti join, per-key aggregate join, broadcast scalar), which
is exactly the plan Catalyst would rewrite to — but stated explicitly so the
intent survives at 100 TB (no accidental BroadcastNestedLoop on a correlated
predicate). Money arithmetic follows the exact integer-cent policy of
queries/money.py: BIGINT unit accumulation, DOUBLE outputs, no DECIMAL
output columns (division, where unavoidable, is the same IEEE double op in
both engines over identical exact inputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dbt_decodable_spark.queries import register
from dbt_decodable_spark.queries.money import (
    cents,
    disc_price_units,
    money_sum,
    revenue as _rev,
    sql_cents,
    sql_disc_price_units,
    sql_money_sum,
    sql_revenue,
)
from dbt_decodable_spark.sources.tables import read_table


@register(
    "tpch_q4_order_priority",
    oracle="""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: EXISTS correlated subquery → left-semi join with "
    "non-equi extra condition (l_commitdate/receiptdate absent: shipdate "
    "after orderdate stands in)",
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = read_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q7_volume_shipping",
    oracle=f"""
        SELECT supp_nation, cust_nation, l_year,
               {sql_money_sum('volume_units', 'revenue', scale=4)}
        FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 year(l_shipdate) AS l_year,
                 {sql_disc_price_units()} AS volume_units
          FROM supplier
          JOIN lineitem ON s_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: self-joined dim (nation twice, both broadcast), "
    "nation-pair OR predicate, year rollup. The two-nation restriction is "
    "pushed into each dim scan (inner broadcast joins against the filtered "
    "dims prune both fact sides before the fact-fact shuffle); the OR pair "
    "filter after the joins only removes the same-nation combinations",
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    pair_nations = ["NATION_1", "NATION_2"]
    s = read_table(spark, sf_dir, "supplier")
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n1 = (
        read_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(pair_nations))
        .select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    )
    n2 = (
        read_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(pair_nations))
        .select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        F.col("supp_nation") == "NATION_2"
    ) & (F.col("cust_nation") == "NATION_1")
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_rev())
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q10_returned_items",
    oracle=f"""
        SELECT c_custkey, c_name,
               {sql_revenue()},
               c_acctbal, n_name
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    doc="TPC-H Q10 shape: returned-item revenue ranking, top-20 customers "
    "(fact-fact join + broadcast dim + TakeOrdered)",
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = read_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_rev())
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "tpch_q13_customer_distribution",
    oracle="""
        SELECT c_count, count(*) AS custdist
        FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey
        ) c_orders
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 shape: left-outer join with join-time predicate, "
    "double aggregation (per-customer count → count histogram)",
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "tpch_q14_promo_revenue",
    oracle=f"""
        SELECT {sql_money_sum(f"CASE WHEN p_type = 'PROMO' THEN {sql_disc_price_units()} ELSE 0 END", 'promo_revenue', scale=4)},
               {sql_revenue(alias='total_revenue')}
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    """,
    doc="TPC-H Q14 shape: conditional aggregate revenue split (promo vs "
    "total; the ratio is the caller's IEEE division — kept out of the "
    "oracle-compared output to avoid engine-specific decimal casts)",
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-09-01") & (F.col("l_shipdate") < "1996-10-01")
    )
    p = read_table(spark, sf_dir, "part")
    units = disc_price_units()
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            money_sum(
                F.when(F.col("p_type") == "PROMO", units).otherwise(F.lit(0)),
                "promo_revenue",
                scale=4,
            ),
            _rev(alias="total_revenue"),
        )
    )


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 {sql_revenue(alias='total_revenue')}
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s_suppkey
    """,
    doc="TPC-H Q15 shape: scalar subquery over an aggregate CTE (max revenue "
    "supplier; equality over identical exact-integer-derived doubles, "
    "broadcast scalar)",
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    s = read_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _rev(alias="total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("__max_rev"))
    return (
        s.join(revenue, s.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(top), F.col("total_revenue") == F.col("__max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q17_small_quantity_revenue",
    oracle=f"""
        SELECT CAST(SUM({sql_cents('l_extendedprice')}) AS DOUBLE) / 100.0 / 7.0 AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#23'
          AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                            FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    doc="TPC-H Q17 shape: correlated scalar AVG subquery, decorrelated to a "
    "per-part aggregate join (l_quantity is integer-valued → exact avg)",
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    per_part = li.groupBy(F.col("l_partkey").alias("pp_key")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(per_part, li.l_partkey == F.col("pp_key"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.sum(cents("l_extendedprice")).cast("double") / F.lit(100.0) / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "tpch_q18_large_volume_customer",
    oracle="""
        SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
               CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                             GROUP BY l_orderkey HAVING SUM(l_quantity) > 150)
        GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    doc="TPC-H Q18 shape: IN over GROUP BY + HAVING subquery → semi join on "
    "the qualifying-key aggregate; top-100 by order value",
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 150)
        .select("l_orderkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li.withColumnRenamed("l_orderkey", "li_orderkey"), F.col("o_orderkey") == F.col("li_orderkey"))
        .join(big, F.col("o_orderkey") == big.l_orderkey, "left_semi")
        # l_quantity is integer-valued; round→BIGINT sum is exact in both engines
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.round("l_quantity").cast("long")).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "tpch_q19_discounted_revenue",
    oracle=f"""
        SELECT {sql_revenue()}
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape: OR of multi-column predicate bundles across the "
    "join (Catalyst extracts the common join key; no cartesian)",
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    bundle = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 30))
    )
    return j.filter(bundle).agg(_rev())


@register(
    "tpch_q22_sales_opportunity",
    oracle=f"""
        WITH pos AS (SELECT {sql_cents('c_acctbal')} AS bal_cents
                     FROM customer WHERE c_acctbal > 0.0),
        thresh AS (SELECT CAST(SUM(bal_cents) AS BIGINT) AS total, count(*) AS n FROM pos)
        SELECT cntrycode, count(*) AS numcust,
               {sql_money_sum(sql_cents('c_acctbal'), 'totacctbal')}
        FROM (
          SELECT c_nationkey % 5 AS cntrycode, c_acctbal, c_custkey
          FROM customer, thresh
          WHERE {sql_cents('c_acctbal')} * n > total
        ) cust
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        GROUP BY cntrycode
        ORDER BY cntrycode
    """,
    doc="TPC-H Q22 shape: above-average balance (exact integer-cent "
    "cross-multiply instead of an avg division) + NOT EXISTS anti join (no "
    "orders since 1999 — every customer has SOME order in this data); "
    "cntrycode from nationkey (no phone column)",
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    bal_cents = cents("c_acctbal")
    thresh = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(F.sum(bal_cents).alias("total"), F.count(F.lit(1)).alias("n"))
    )
    # avg comparison as an exact cross-multiply: cents * n > total_cents (all
    # BIGINT — no division, no decimal scale rules, identical in both engines)
    rich = (
        c.join(F.broadcast(thresh))
        .filter(bal_cents * F.col("n") > F.col("total"))
        .select((F.col("c_nationkey") % 5).alias("cntrycode"), "c_acctbal", "c_custkey")
    )
    recent = o.filter(F.col("o_orderdate") >= "1999-01-01")
    return (
        rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(F.count(F.lit(1)).alias("numcust"), money_sum(cents("c_acctbal"), "totacctbal"))
        .orderBy("cntrycode")
    )


@register(
    "tpch_q8_national_market_share",
    oracle=f"""
        SELECT EXTRACT(year FROM o_orderdate) AS o_year,
               {sql_money_sum(f"CASE WHEN n2.n_name = 'NATION_3' THEN {sql_disc_price_units()} ELSE 0 END", 'nation_volume', scale=4)},
               {sql_money_sum(sql_disc_price_units(), 'total_volume', scale=4)}
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA'
          AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          AND p_type = 'ECONOMY'
        GROUP BY o_year
        ORDER BY o_year
    """,
    doc="TPC-H Q8 shape: 8-way join with the nation dim joined TWICE "
    "(customer side restricts the market region, supplier side names the "
    "share-holder), conditional volume split per order year. The market "
    "share itself is the caller's IEEE division over the two exact "
    "integer-unit sums (same policy as Q14). Only the genuinely small dims "
    "(nation/region) are force-broadcast; part and supplier scale with sf, "
    "so AQE decides their join strategy — a forced broadcast there would "
    "OOM the executors at the 100 TB target. Classic form: TPC-H spec Q8 "
    "(reference has no local execution; platform SQL surface per "
    "decodable/client/client.py:364-373).",
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    c = read_table(spark, sf_dir, "customer")
    n1 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_nationkey"), F.col("n_regionkey").alias("n1_regionkey")
    )
    n2 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_nationkey"), F.col("n_name").alias("supp_nation")
    )
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    units = disc_price_units()
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_nationkey"))
        .join(F.broadcast(r), F.col("n1_regionkey") == r.r_regionkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_nationkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            money_sum(
                F.when(F.col("supp_nation") == "NATION_3", units).otherwise(F.lit(0)),
                "nation_volume",
                scale=4,
            ),
            money_sum(units, "total_volume", scale=4),
        )
        .orderBy("o_year")
    )
