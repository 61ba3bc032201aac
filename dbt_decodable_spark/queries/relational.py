"""Scans, projections, filters, predicates, sorts/limits, set ops
(SURVEY §2.1, §2.2, §2.6, §2.7).

Reference surface: projections with aliases + CAST + map access
(``example_project/.../http_events.sql:22-37``), derived-table subqueries
(``http_events.sql:38-47``), WHERE/IS NULL via generated test SQL
(``tests/functional/adapter/simple/fixtures.py:31-38``), ``<>`` dialect rule
(``dbt/adapters/decodable/impl.py:637-639``), LIMIT threading
(``macros/materializations/test/test.sql:70``), ORDER BY/set ops via the
platform SQL surface (Flink SQL, ``README.md:7``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dbt_decodable_spark.queries import register
from dbt_decodable_spark.sources.tables import read_table


@register(
    "scan_project_filter",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_shipdate < TIMESTAMP '1995-01-01 00:00:00' AND l_quantity > 45
    """,
    doc="§2.1 stream scan + §2.2 projection/filter; filter+projection push into the parquet scan",
)
def scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") < "1995-01-01") & (F.col("l_quantity") > 45)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@register(
    "projection_cast_alias",
    oracle="""
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) / 100.0 AS price_dec,
               CAST(o_orderkey AS VARCHAR) AS key_str,
               upper(o_orderstatus) AS status_u
        FROM orders WHERE o_orderkey <= 1000
    """,
    doc="§2.2 SELECT aliases + CAST (http_events.sql:22-37). The 2-decimal "
    "money projection goes through exact integer cents → DOUBLE "
    "(queries/money.py) instead of CAST(double AS DECIMAL), whose rounding "
    "differs between Spark and DuckDB",
)
def projection_cast_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_decodable_spark.queries.money import cents

    o = read_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") <= 1000).select(
        "o_orderkey",
        (cents("o_totalprice") / F.lit(100.0)).alias("price_dec"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.upper("o_orderstatus").alias("status_u"),
    )


@register(
    "where_predicates",
    oracle="""
        SELECT l_orderkey, l_linenumber
        FROM lineitem
        WHERE l_returnflag <> 'A'
          AND l_quantity BETWEEN 10 AND 20
          AND l_linestatus IN ('O', 'F')
          AND l_returnflag IS NOT NULL
    """,
    doc="§2.2 predicates: <> (impl.py:637-639 dialect rule), BETWEEN, IN, IS NOT NULL",
)
def where_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_returnflag") != "A")
        & F.col("l_quantity").between(10, 20)
        & F.col("l_linestatus").isin("O", "F")
        & F.col("l_returnflag").isNotNull()
    ).select("l_orderkey", "l_linenumber")


@register(
    "like_predicate",
    oracle="""
        SELECT p_partkey, p_name FROM part
        WHERE p_name LIKE '%gold%' OR p_type LIKE 'SMALL%'
    """,
    doc="§2.2 LIKE patterns",
)
def like_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_table(spark, sf_dir, "part")
    return p.filter(F.col("p_name").like("%gold%") | F.col("p_type").like("SMALL%")).select(
        "p_partkey", "p_name"
    )


@register(
    "derived_table_subquery",
    oracle="""
        SELECT status_u, count(*) AS n
        FROM (
            SELECT upper(o_orderstatus) AS status_u FROM orders
            WHERE o_totalprice > 100000
        ) t
        GROUP BY status_u
    """,
    doc="§2.2 derived-table subquery (http_events.sql:38-47 pattern)",
)
def derived_table_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT status_u, count(*) AS n
        FROM (
            SELECT upper(o_orderstatus) AS status_u FROM orders
            WHERE o_totalprice > 100000
        ) t
        GROUP BY status_u
        """
    )


@register(
    "case_when",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_totalprice > 200000 THEN 'big'
                    WHEN o_totalprice > 100000 THEN 'mid'
                    ELSE 'small' END AS size_band
        FROM orders
    """,
    doc="§2.2 CASE expression",
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("size_band"),
    )


@register(
    "order_by_limit",
    oracle="""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
    doc="§2.6 ORDER BY + LIMIT (top-k, deterministic tie-break on unique key)",
)
def order_by_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    # TakeOrderedAndProject: per-partition top-k then merge — no full sort/shuffle.
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


@register(
    "union_all",
    oracle="""
        SELECT c_nationkey AS nationkey, c_acctbal AS acctbal FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey, s_acctbal AS acctbal FROM supplier
    """,
    doc="§2.7 UNION ALL",
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    return c.select(
        F.col("c_nationkey").alias("nationkey"), F.col("c_acctbal").alias("acctbal")
    ).unionAll(s.select(F.col("s_nationkey").alias("nationkey"), F.col("s_acctbal").alias("acctbal")))


@register(
    "union_distinct",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="§2.7 UNION (distinct)",
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    return (
        c.select(F.col("c_nationkey").alias("nationkey"))
        .union(s.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


@register(
    "intersect_except",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="§2.7 INTERSECT",
)
def intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    return c.select(F.col("c_nationkey").alias("nationkey")).intersect(
        s.select(F.col("s_nationkey").alias("nationkey"))
    )


@register(
    "except_all",
    oracle="""
        SELECT n_regionkey AS regionkey FROM nation
        EXCEPT ALL
        SELECT r_regionkey AS regionkey FROM region
    """,
    doc="§2.7 EXCEPT ALL (multiset difference)",
)
def except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    return n.select(F.col("n_regionkey").alias("regionkey")).exceptAll(
        r.select(F.col("r_regionkey").alias("regionkey"))
    )


@register(
    "values_inline",
    oracle="""
        SELECT * FROM (VALUES ('Adam', 31), ('George', 27), ('Lily', 59)) AS t(name, age)
    """,
    doc="§2.1 inline VALUES relation (seed fixture shape, FIXTURES.md §1)",
)
def values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql("SELECT * FROM VALUES ('Adam', 31), ('George', 27), ('Lily', 59) AS t(name, age)")


@register(
    "source_csv_roundtrip",
    oracle="SELECT r_regionkey, r_name FROM region",
    doc="§2.1 file formats: region written as quoted CSV to scratch and "
    "read back through the csv reader with an explicit schema — the "
    "s3/file connector's CSV path, driver-gated (header round-trip)",
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    df = read_table(spark, sf_dir, "region")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"/tmp/spark_csv_src_{tag}"
    df.write.mode("overwrite").option("header", True).csv(path)
    return (
        spark.read.schema(df.schema)
        .option("header", True)
        .csv(path)
        .select("r_regionkey", "r_name")
    )


@register(
    "source_json_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    doc="§2.1 file formats: nation written as JSON-lines to scratch and "
    "read back with an explicit schema — the s3/file connector's JSON "
    "path, driver-gated",
)
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    df = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"/tmp/spark_json_src_{tag}"
    df.write.mode("overwrite").json(path)
    return spark.read.schema(df.schema).json(path)


@register(
    "source_orc_roundtrip",
    oracle="""
        SELECT s_suppkey, s_name, s_nationkey,
               CAST(round(s_acctbal * 100) AS BIGINT) AS acctbal_cents
        FROM supplier
    """,
    doc="§2.1 file formats: supplier written as ORC to scratch and read "
    "back through the native orc reader with an explicit schema — the "
    "columnar non-parquet lake format path (money column carried as exact "
    "integer cents across the round-trip, per the engine's money policy)",
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    from dbt_decodable_spark.queries.money import cents

    df = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_name",
        "s_nationkey",
        cents("s_acctbal").alias("acctbal_cents"),
    )
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"/tmp/spark_orc_src_{tag}"
    df.write.mode("overwrite").orc(path)
    return spark.read.schema(df.schema).orc(path)


@register(
    "source_text_roundtrip",
    oracle="SELECT text FROM documents WHERE doc_id < 200 AND strpos(text, chr(10)) = 0",
    doc="§2.1 file formats: raw text-lines round-trip (the classic corpus "
    "interchange format at 100 TB — one document per line) through "
    "spark.read/write.text; newline-bearing docs are excluded on both "
    "sides because the format cannot carry them (the reason parquet is "
    "the engine's default)",
)
def source_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    df = (
        read_table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < 200) & (~F.col("text").contains("\n")))
        .select("text")
    )
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"/tmp/spark_text_src_{tag}"
    df.write.mode("overwrite").text(path)
    return spark.read.text(path).select(F.col("value").alias("text"))


@register(
    "source_parquet_zstd_roundtrip",
    oracle="""
        SELECT p_partkey, p_name, p_brand,
               CAST(round(p_retailprice * 100) AS BIGINT) AS retail_cents
        FROM part
    """,
    doc="§2.1 file formats: part written as zstd-compressed parquet and "
    "read back — the cold-tier codec choice at 100 TB (zstd ≈ gzip ratio "
    "at lz4-class decode speed); money carried as exact integer cents",
)
def source_parquet_zstd_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    from dbt_decodable_spark.queries.money import cents

    df = read_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand", cents("p_retailprice").alias("retail_cents")
    )
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"/tmp/spark_zstd_src_{tag}"
    df.write.mode("overwrite").option("compression", "zstd").parquet(path)
    return spark.read.schema(df.schema).parquet(path)


@register(
    "source_partitioned_pruned",
    oracle="""
        SELECT event_id, user_id,
               CAST(round(value * 100) AS BIGINT) AS value_cents
        FROM events WHERE event_type = 'click'
    """,
    doc="§2.1 partitioned lake layout: events written partitionBy("
    "event_type), read back with an equality filter — the filter resolves "
    "to DIRECTORY pruning (PartitionFilters, zero data-file reads outside "
    "the partition), the layout that turns a 100 TB scan into a 20 TB "
    "one; plan-asserted in tests/test_bucketing.TestPartitionPruning",
)
def source_partitioned_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    from dbt_decodable_spark.queries.money import cents

    df = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", cents("value").alias("value_cents"), "event_type"
    )
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"/tmp/spark_part_src_{tag}"
    df.write.mode("overwrite").partitionBy("event_type").parquet(path)
    return (
        spark.read.parquet(path)
        .filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "value_cents")
    )


@register(
    "source_time_of_day_roundtrip",
    oracle="""
        SELECT event_id,
               t_nanos,
               strftime(ts, '%H:%M:%S.%f') AS t_str,
               (t_nanos + 5400000000000) % 86400000000000 AS t_shifted_nanos
        FROM (
            SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
                   CAST((hour(CAST(ts AS TIMESTAMP)) * 3600
                         + minute(CAST(ts AS TIMESTAMP)) * 60
                         + second(CAST(ts AS TIMESTAMP)))
                        AS BIGINT) * 1000000000
                   + (extract('microseconds' FROM CAST(ts AS TIMESTAMP))
                      % 1000000) * 1000
                       AS t_nanos
            FROM events WHERE event_id < 500
        )
    """,
    doc="§1.4 TIME(p) type mapping (reference "
    "decodable/client/types.py:498-512 — Flink TIME(p); Spark has no "
    "time-of-day type): the engine's nanos-of-day LongType encoding "
    "(functions/time_of_day.py) round-tripped through parquet scratch, "
    "then formatted back to 'HH:mm:ss.ffffff' and shifted +90min with "
    "midnight wrap — parse, storage, format, and arithmetic on one row. "
    "All pure JVM expressions; the encoding is a plain BIGINT so "
    "predicate pushdown/stats work unchanged at 100 TB.",
)
def source_time_of_day_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    from dbt_decodable_spark.functions import time_of_day as tod

    df = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 500)
        .select(
            "event_id",
            tod.time_from_timestamp(F.col("ts")).alias("t_nanos"),
        )
    )
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"/tmp/spark_time_src_{tag}"
    df.write.mode("overwrite").parquet(path)
    back = spark.read.schema(df.schema).parquet(path)
    return back.select(
        "event_id",
        "t_nanos",
        tod.time_to_string(F.col("t_nanos"), precision=6).alias("t_str"),
        tod.time_add(F.col("t_nanos"), 90 * 60 * tod.NANOS_PER_SECOND)
        .cast("long")
        .alias("t_shifted_nanos"),
    )


@register(
    "source_schema_evolution",
    oracle="""
        SELECT CAST(1 AS INT) AS gen, n_nationkey, n_name,
               CAST(NULL AS BIGINT) AS n_regionkey
        FROM nation
        UNION ALL
        SELECT CAST(2 AS INT) AS gen, n_nationkey, n_name, n_regionkey
        FROM nation
    """,
    doc="§2.1 schema evolution across file generations — the lake reality "
    "at 100 TB (a column added mid-corpus must not force a rewrite of "
    "petabytes of old files): generation 1 written WITHOUT n_regionkey, "
    "generation 2 WITH it, both under one table root partitioned by gen; "
    "a mergeSchema read unions the footers and back-fills NULL for the "
    "missing column in old files. Reader-side evolution only — additive "
    "columns; renames/type-changes still need a rewrite (or a view).",
)
def source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    n = read_table(spark, sf_dir, "nation")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"/tmp/spark_evo_src_{tag}"
    n.select("n_nationkey", "n_name").write.mode("overwrite").parquet(
        f"{root}/gen=1"
    )
    n.select("n_nationkey", "n_name", "n_regionkey").write.mode(
        "overwrite"
    ).parquet(f"{root}/gen=2")
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(root)
        .select("gen", "n_nationkey", "n_name", "n_regionkey")
    )


@register(
    "source_multiset_roundtrip",
    oracle="""
        WITH per AS (
            SELECT user_id, event_type, count(*) AS cnt
            FROM events GROUP BY 1, 2
        )
        SELECT user_id,
               '{' || string_agg('"' || event_type || '":'
                                 || CAST(cnt AS VARCHAR),
                                 ',' ORDER BY event_type) || '}'
                   AS multiset_json,
               CAST(SUM(cnt) AS BIGINT) AS n_elements
        FROM per GROUP BY user_id
    """,
    doc="§1.4 MULTISET type mapping (reference decodable/client/"
    "types.py:795-807 — the bare-keyword MULTISET the reference parses but "
    "never finished typing): the engine's count-map encoding "
    "MapType(elem, INT) (ftypes.Multiset) built per user over event_type "
    "bags, CAST through the ftypes-declared Spark type, round-tripped "
    "through parquet scratch, then read back and both decoded legs "
    "emitted — the deterministic JSON serialization (entries pre-sorted "
    "by key, so Spark's map order and the oracle's ORDER BY agree) and "
    "the multiset cardinality folded JVM-side from map_values. Count-maps "
    "keep multiset columns groupable/joinable and parquet-dictionary-"
    "friendly at 100 TB where a repeated-element array would bloat "
    "storage by the duplication factor.",
)
def source_multiset_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from dbt_decodable_spark import ftypes

    e = read_table(spark, sf_dir, "events")
    per = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("int").alias("cnt")
    )
    ms_type = ftypes.to_spark("MULTISET<STRING>")  # MapType(string, int)
    ms = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "cnt")))
        )
        .cast(ms_type)
        .alias("ms")
    )
    # mkdtemp (not a deterministic /tmp tag): concurrent runs against the
    # same sf_dir must not share scratch; materialize before cleanup so the
    # returned frame doesn't lazily read the removed dir (ADVICE r8)
    path = tempfile.mkdtemp(prefix="spark_multiset_src_")
    ms.write.mode("overwrite").parquet(path)
    back = spark.read.schema(ms.schema).parquet(path)
    out = back.select(
        "user_id",
        F.to_json("ms").alias("multiset_json"),
        F.aggregate(
            F.map_values("ms"), F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("n_elements"),
    ).localCheckpoint(eager=True)
    shutil.rmtree(path, ignore_errors=True)
    return out
