"""TPC-H-shaped coverage, third batch: the partsupp-class queries (Q2, Q9,
Q11, Q16, Q20) plus the late-shipment reports (Q12, Q21), completing the
22-query battery in adapted form.

The driver's star schema has no partsupp table, so the part↔supplier
relationship is derived from lineitem: ``SELECT DISTINCT l_partkey,
l_suppkey`` is the partsupp key-space, ``min(l_extendedprice / l_quantity)``
per pair is the supply-cost stand-in (an IEEE double division over identical
inputs — bit-identical in Spark and DuckDB, and MIN only ever *selects* one
of those exact values, so equality joins against the minimum are
deterministic). The missing l_commitdate/l_receiptdate lateness predicates
become ``l_shipdate > o_orderdate + INTERVAL``.

Money arithmetic follows queries/money.py (exact BIGINT unit accumulation,
DOUBLE outputs, no DECIMAL output columns); count-style outputs are BIGINT
in both engines (DuckDB's INT128 sums are cast back explicitly).

Spark-first stance (100 TB): every correlated EXISTS / IN / scalar-min
subquery is written in its decorrelated join form — per-key aggregates
joined back on the key (same shuffle partitioning reused), semi/anti joins
for membership, broadcast for the genuinely small sides (nation, region,
the 100-row supplier dim, single-row totals). part scales with sf and is
never force-broadcast; AQE decides. Reference: the platform ships these
query classes verbatim to Flink SQL (decodable/client/client.py:364-373);
no local execution exists there, so the decorrelation strategy is ours.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dbt_decodable_spark.queries import register
from dbt_decodable_spark.queries.money import (
    cents,
    disc_price_units,
    money_sum,
    sql_cents,
    sql_disc_price_units,
    sql_money_sum,
)
from dbt_decodable_spark.sources.tables import read_table


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
        WITH supply AS (
          SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                 min(l_extendedprice / l_quantity) AS ps_supplycost
          FROM lineitem GROUP BY l_partkey, l_suppkey
        ),
        eu AS (
          SELECT s_suppkey, s_acctbal, s_name, n_name
          FROM supplier
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE'
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, ps_supplycost AS supply_cost
        FROM part
        JOIN supply ON p_partkey = ps_partkey
        JOIN eu ON ps_suppkey = s_suppkey
        WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'
          AND ps_supplycost = (SELECT min(s2.ps_supplycost)
                               FROM supply s2 JOIN eu e2 ON s2.ps_suppkey = e2.s_suppkey
                               WHERE s2.ps_partkey = p_partkey)
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    doc="TPC-H Q2 shape: min-cost supplier per part via correlated scalar MIN "
    "subquery, decorrelated to a per-part MIN aggregate joined back on "
    "(partkey, cost). Supply cost = min unit price over lineitem (no "
    "partsupp table); equality on doubles is safe because both sides SELECT "
    "the same IEEE division result rather than recomputing it",
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "LARGE")
    )
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    # 100-row supplier dim × 25-row nation × filtered region: broadcast side
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    # partsupp stand-in: one row per (part, supplier) with its min unit price;
    # restricted to EUROPE suppliers before both aggregates so the per-part
    # MIN and the joined rows see the same population
    supply = (
        li.join(F.broadcast(eu), li.l_suppkey == eu.s_suppkey)
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"))
    )
    # per-part minimum as a window over the one supply aggregate (a separate
    # groupBy would recompute the whole lineitem lineage — two full scans at
    # 100 TB); the window repartitions by ps_partkey only, which the part
    # join below then reuses
    from pyspark.sql.window import Window

    per_part = Window.partitionBy("ps_partkey")
    return (
        supply.withColumn("best_cost", F.min("ps_supplycost").over(per_part))
        .filter(F.col("ps_supplycost") == F.col("best_cost"))
        .join(p, F.col("ps_partkey") == p.p_partkey)
        .join(F.broadcast(eu), F.col("ps_suppkey") == eu.s_suppkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey",
            F.col("ps_supplycost").alias("supply_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q9_product_type_profit",
    oracle=f"""
        SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
               {sql_money_sum(
                   f"{sql_disc_price_units()} - {sql_cents('p_retailprice')}"
                   " * CAST(round(l_quantity) AS BIGINT) * 100",
                   'sum_profit', scale=4)}
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%gear%'
        GROUP BY n_name, o_year
        ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape: profit by supplier nation and order year over parts "
    "matching a name pattern. Cost stand-in (no ps_supplycost) is "
    "p_retailprice × quantity; profit = revenue − cost in exact scale-4 "
    "integer units (cents × 100 × integral quantity), summed as BIGINT",
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = read_table(spark, sf_dir, "supplier")
    o = read_table(spark, sf_dir, "orders")
    n = read_table(spark, sf_dir, "nation")
    # cost in scale-4 units: cents(retailprice) × 100 → scale 4, × integer qty
    cost_units = cents("p_retailprice") * F.round("l_quantity").cast("long") * F.lit(100)
    profit_units = disc_price_units() - cost_units
    return (
        li.join(p, li.l_partkey == p.p_partkey)  # part scales with sf: AQE decides
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(money_sum(profit_units, "sum_profit", scale=4))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "tpch_q11_important_part_value",
    oracle=f"""
        WITH val AS (
          SELECT l_partkey AS v_partkey,
                 CAST(SUM({sql_cents('l_extendedprice')}) AS BIGINT) AS value_cents
          FROM lineitem
          WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                              JOIN nation ON s_nationkey = n_nationkey
                              WHERE n_name = 'NATION_9')
          GROUP BY l_partkey
        ),
        total AS (SELECT CAST(SUM(value_cents) AS BIGINT) AS total_cents FROM val)
        SELECT v_partkey AS p_partkey,
               CAST(value_cents AS DOUBLE) / 100.0 AS part_value
        FROM val, total
        WHERE value_cents * 1000 > total_cents
        ORDER BY part_value DESC, p_partkey
    """,
    doc="TPC-H Q11 shape: parts whose traded value through one nation's "
    "suppliers exceeds 0.1% of the total — the fraction-of-global-sum "
    "scalar subquery as an exact BIGINT cross-multiply (value×1000 > total) "
    "against a broadcast single-row total; no division until the output",
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_9")
    nat_supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    val = (
        li.join(F.broadcast(nat_supp), li.l_suppkey == nat_supp.s_suppkey, "left_semi")
        .groupBy(F.col("l_partkey").alias("v_partkey"))
        .agg(F.sum(cents("l_extendedprice")).alias("value_cents"))
    )
    total = val.agg(F.sum("value_cents").alias("total_cents"))
    return (
        val.join(F.broadcast(total))
        .filter(F.col("value_cents") * 1000 > F.col("total_cents"))
        .select(
            F.col("v_partkey").alias("p_partkey"),
            (F.col("value_cents").cast("double") / F.lit(100.0)).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )


@register(
    "tpch_q12_late_shipment_priority",
    oracle="""
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_linestatus
        ORDER BY l_linestatus
    """,
    doc="TPC-H Q12 shape: priority split of late shipments (no l_shipmode/"
    "l_receiptdate: linestatus groups, shipped ≥60 days after order date "
    "stands in for late receipt). Pure integer conditional counts",
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "tpch_q16_supplier_part_count",
    oracle="""
        SELECT p_brand, p_type, p_size,
               count(DISTINCT ps_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
              FROM lineitem) partsupp
        JOIN part ON p_partkey = ps_partkey
        WHERE p_brand <> 'Brand#23' AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 9, 16, 25, 36, 49)
          AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape: distinct supplier count per part class, excluding "
    "one brand/type and flagged suppliers (negative balance stands in for "
    "the complaints LIKE — no s_comment column). partsupp = DISTINCT "
    "(l_partkey, l_suppkey); NOT IN → broadcast anti join",
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#23")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad_supp = read_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    partsupp = li.select(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).distinct()
    return (
        partsupp.join(F.broadcast(bad_supp), partsupp.ps_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(p, F.col("ps_partkey") == p.p_partkey)  # part scales with sf: AQE decides
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "tpch_q20_excess_shipments",
    oracle="""
        SELECT s_name, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND s_suppkey IN (
            SELECT l_suppkey FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
              AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY l_suppkey, l_partkey
            HAVING SUM(l_quantity) > 50
          )
        ORDER BY s_name
    """,
    doc="TPC-H Q20 shape: suppliers who shipped a large volume of a "
    "name-matched part in one year (nested IN subqueries → semi-join "
    "chain; availqty threshold stands in as a shipped-quantity HAVING). "
    "l_quantity is integral so the double SUM is exact in both engines",
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    small_parts = read_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    heavy = (
        li.join(small_parts, li.l_partkey == small_parts.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@register(
    "tpch_q21_suppliers_kept_waiting",
    oracle="""
        SELECT s_name, count(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL 30 DAY)
          AND n_name = 'NATION_9'
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
    """,
    doc="TPC-H Q21 shape: the sole-late-supplier-in-a-multi-supplier-order "
    "EXISTS/NOT-EXISTS pair, decorrelated into one per-order aggregate "
    "(distinct suppliers ≥ 2 AND distinct LATE suppliers = 1 — given the "
    "probe row is late, the late one is necessarily it). One groupBy on "
    "orderkey replaces two correlated lineitem self-joins; lateness = "
    "shipped >30 days after order date (no l_commitdate/l_receiptdate)",
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_9")
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = read_table(spark, sf_dir, "lineitem")
    # one pass over lineitem⋈orders computes lateness for every line
    lo = li.join(
        o.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey")
    ).withColumn(
        "__late",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).cast("int"),
    )
    # per-order distinct-supplier stats in two cheap hash aggs (one
    # countDistinct pair would Expand every lineitem row 3×; collapsing to
    # (order, supplier) first shuffles each pair once, and the second agg's
    # orderkey partitioning is exactly what the join below needs)
    per_pair = lo.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("__late").alias("__supp_late")
    )
    order_stats = per_pair.groupBy(F.col("l_orderkey").alias("os_orderkey")).agg(
        F.count(F.lit(1)).alias("__n_supp"),
        F.sum("__supp_late").alias("__n_late"),
    )
    qualifying = order_stats.filter((F.col("__n_supp") >= 2) & (F.col("__n_late") == 1))
    nat_supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "s_name"
    )
    return (
        lo.filter(F.col("__late") == 1)
        .join(qualifying, F.col("l_orderkey") == F.col("os_orderkey"))
        .join(F.broadcast(nat_supp), F.col("l_suppkey") == nat_supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
