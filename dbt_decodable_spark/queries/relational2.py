"""Second relational battery: subqueries, CTEs, pivot, interval join,
merge-technique as-of join, extra string functions, boolean/string
aggregates, cumulate windows, token histograms (SURVEY §2 coverage
completion)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dbt_decodable_spark.operators import asof
from dbt_decodable_spark.queries import register
from dbt_decodable_spark.sources.tables import read_table


@register(
    "subquery_scalar_correlated",
    oracle="""
        SELECT c_custkey, c_acctbal
        FROM customer c
        WHERE c_acctbal > (
            SELECT avg(c_acctbal) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey
        )
    """,
    doc="§2.2 correlated scalar subquery (Catalyst decorrelates to an agg+join)",
)
def subquery_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    read_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal
        FROM customer c
        WHERE c_acctbal > (
            SELECT avg(c_acctbal) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey
        )
        """
    )


@register(
    "subquery_in",
    oracle="""
        SELECT o_orderkey FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        ) AND o_totalprice > 150000
    """,
    doc="§2.2 IN subquery → left semi join",
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    read_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT o_orderkey FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        ) AND o_totalprice > 150000
        """
    )


@register(
    "cte_chain",
    oracle="""
        WITH big_orders AS (
            SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 100000
        ),
        per_cust AS (
            SELECT o_custkey, count(*) AS n_big
            FROM big_orders GROUP BY o_custkey
        )
        SELECT n_big, count(*) AS n_customers FROM per_cust GROUP BY n_big
    """,
    doc="§2.2 WITH / CTE chain",
)
def cte_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        WITH big_orders AS (
            SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 100000
        ),
        per_cust AS (
            SELECT o_custkey, count(*) AS n_big
            FROM big_orders GROUP BY o_custkey
        )
        SELECT n_big, count(*) AS n_customers FROM per_cust GROUP BY n_big
        """
    )


@register(
    "pivot_status_by_year",
    oracle="""
        SELECT CAST(year(o_orderdate) AS INT) AS order_year,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS status_F,
               count(*) FILTER (WHERE o_orderstatus = 'O') AS status_O,
               count(*) FILTER (WHERE o_orderstatus = 'P') AS status_P
        FROM orders GROUP BY 1
    """,
    doc="§2.4 pivot (groupBy().pivot() in Spark ≡ FILTERed counts)",
)
def pivot_status_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    p = (
        o.groupBy(F.year("o_orderdate").alias("order_year"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return p.select(
        "order_year",
        F.coalesce(F.col("F"), F.lit(0)).alias("status_F"),
        F.coalesce(F.col("O"), F.lit(0)).alias("status_O"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_P"),
    )


@register(
    "unpivot_stack",
    oracle="""
        SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
        UNION ALL
        SELECT p_partkey, 'price' AS metric, p_retailprice AS val FROM part
    """,
    doc="§2.4 unpivot via stack()",
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_table(spark, sf_dir, "part")
    return p.selectExpr(
        "p_partkey",
        "stack(2, 'size', CAST(p_size AS DOUBLE), 'price', p_retailprice) AS (metric, val)",
    )


@register(
    "join_interval",
    oracle="""
        SELECT e1.event_id AS id_a, e2.event_id AS id_b
        FROM events e1 JOIN events e2
          ON e1.user_id = e2.user_id
         AND e2.ts > e1.ts
         AND CAST(e2.ts AS TIMESTAMP) <= CAST(e1.ts AS TIMESTAMP) + INTERVAL 10 MINUTE
    """,
    doc="§2.3 interval (time-bounded) join — the stream-stream join shape; "
    "equi-key shuffle + time-range filter",
)
def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    e1 = e.select(F.col("event_id").alias("id_a"), F.col("user_id").alias("u1"), F.col("ts").alias("t1"))
    e2 = e.select(F.col("event_id").alias("id_b"), F.col("user_id").alias("u2"), F.col("ts").alias("t2"))
    return (
        e1.join(
            e2,
            (F.col("u1") == F.col("u2"))
            & (F.col("t2") > F.col("t1"))
            & (F.col("t2") <= F.col("t1") + F.expr("INTERVAL 10 MINUTES")),
        )
        .select("id_a", "id_b")
    )


@register(
    "join_asof_merge",
    oracle="""
        SELECT e.event_id, o.o_orderkey AS last_order_key
        FROM events e
        LEFT JOIN LATERAL (
            SELECT o_orderkey FROM orders
            WHERE o_custkey = e.user_id AND o_orderdate <= CAST(e.ts AS TIMESTAMP)
            ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1
        ) o ON true
    """,
    doc="§2.3 as-of join via the union+window merge technique (operators/asof.py) "
    "— one shuffle, no theta join; ties broken by latest (o_orderdate, o_orderkey)",
)
def join_asof_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = (
        read_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderdate", "o_orderkey")
        .withColumnRenamed("o_custkey", "user_id")
    )
    joined = asof.asof_join(
        e,
        o.withColumnRenamed("o_orderdate", "ots"),
        on="user_id",
        left_ts="ts",
        right_ts="ots",
        value_cols=["o_orderkey"],
        # the oracle's LATERAL picks ORDER BY o_orderdate DESC,
        # o_orderkey DESC LIMIT 1 — same-day orders for one customer
        # MUST break the tie by the key or the comparison is luck
        tiebreak_cols=["o_orderkey"],
    )
    return joined.select("event_id", F.col("o_orderkey").alias("last_order_key"))


@register(
    "func_string_extra",
    oracle="""
        SELECT c_custkey,
               lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
               rpad(c_mktsegment, 12, '.') AS rpadded,
               split_part(c_name, '#', 1) AS name_head,
               split_part(c_name, '#', 2) AS name_tail,
               CAST(strpos(c_name, '#') AS INT) AS hash_pos,
               left(c_name, 4) AS name_left,
               right(c_name, 3) AS name_right,
               repeat(c_mktsegment, 2) AS seg_twice,
               CAST(ascii(c_mktsegment) AS INT) AS first_ascii
        FROM customer
    """,
    doc="§2.8 string functions round 2: pad/split_part/position/left/right/repeat/ascii",
)
def func_string_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.rpad("c_mktsegment", 12, ".").alias("rpadded"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(1)).alias("name_head"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_tail"),
        F.instr(F.col("c_name"), "#").alias("hash_pos"),
        F.substring("c_name", 1, 4).alias("name_left"),
        F.substring(F.col("c_name"), -3, 3).alias("name_right"),
        F.repeat(F.col("c_mktsegment"), 2).alias("seg_twice"),
        F.ascii("c_mktsegment").alias("first_ascii"),
    )


@register(
    "agg_bool_string",
    oracle="""
        SELECT l_returnflag,
               bool_and(l_quantity > 0) AS all_positive,
               bool_or(l_quantity > 49) AS any_maxed,
               min(l_linestatus) AS min_status,
               max(l_linestatus) AS max_status
        FROM lineitem GROUP BY l_returnflag
    """,
    doc="§2.4 boolean aggregates (every/any) + string min/max",
)
def agg_bool_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive"),
        F.bool_or(F.col("l_quantity") > 49).alias("any_maxed"),
        F.min("l_linestatus").alias("min_status"),
        F.max("l_linestatus").alias("max_status"),
    )


@register(
    "stream_cumulate_window",
    oracle="""
        WITH p AS (
            SELECT CAST(ts AS TIMESTAMP) AS ts,
                   time_bucket(INTERVAL 4 HOUR, CAST(ts AS TIMESTAMP)) AS win_start
            FROM events
        ),
        steps AS (SELECT unnest(range(1, 5)) AS k)
        SELECT win_start,
               win_start + INTERVAL 1 HOUR * k AS win_end,
               count(*) AS n
        FROM p JOIN steps ON ts < win_start + INTERVAL 1 HOUR * k
        GROUP BY win_start, win_end
    """,
    doc="§2.9 cumulate window (Flink CUMULATE TVF): 4h max size, 1h step — "
    "each row lands in every not-yet-closed step of its window",
)
def stream_cumulate_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    base = e.select(
        F.col("ts"), F.date_trunc("hour", F.col("ts")).alias("h")
    ).withColumn(
        "win_start",
        F.timestamp_seconds((F.unix_timestamp("h") / 14400).cast("long") * 14400),
    )
    steps = spark.range(1, 5).select(F.col("id").alias("k"))
    return (
        base.join(
            F.broadcast(steps),
            F.col("ts")
            < F.col("win_start") + F.col("k") * F.expr("INTERVAL 1 HOURS"),
        )
        .groupBy(
            "win_start",
            (F.col("win_start") + F.col("k") * F.expr("INTERVAL 1 HOURS")).alias("win_end"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "text_token_histogram",
    oracle="""
        SELECT token, count(*) AS n
        FROM (
            SELECT unnest(list_filter(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '), t -> t <> '')) AS token
            FROM documents
        ) t
        GROUP BY token
    """,
    doc="§2.12 corpus token histogram (explode+count — the wordcount of "
    "training-data statistics; map-side partial agg keeps the shuffle tiny)",
)
def text_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_decodable_spark.operators.dedup import fan_out, tokens

    d = fan_out(read_table(spark, sf_dir, "documents"))
    return (
        d.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "embedding_normalize",
    oracle="""
        SELECT vec_id,
               CAST(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS DOUBLE) AS sq_norm
        FROM embeddings WHERE vec_id < 50
    """,
    doc="§2.12 vector math: squared L2 norm via sequential fold (same "
    "summation order both engines)",
)
def embedding_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    sq = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select("vec_id", sq.alias("sq_norm"))


def _zspread(x: str, shl: str) -> str:
    """Morton 'magic bits' spread of a 16-bit value to even bit positions.
    ``shl`` formats a left shift — ``"shiftleft({v}, {n})"`` for Spark SQL,
    ``"({v} << {n})"`` for DuckDB — everything else (&, |) is shared."""
    v = x
    for n, mask in ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)):
        v = f"(({v} | {shl.format(v=v, n=n)}) & {mask})"
    return v


def _zkey(x: str, y: str, shl: str) -> str:
    return f"({_zspread(x, shl)} | {shl.format(v=_zspread(y, shl), n=1)})"


_Z_SPARK_SHL = "shiftleft({v}, {n})"
_Z_DUCK_SHL = "({v} << {n})"


@register(
    "layout_zorder_stats",
    oracle=f"""
        WITH base AS (
            SELECT user_id % 256 AS ux,
                   (epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) % 256
                       AS dy
            FROM events
        ),
        z AS (SELECT ux, dy, {_zkey('ux', 'dy', _Z_DUCK_SHL)} AS zkey FROM base)
        SELECT zkey // 64 AS zbucket,
               count(*) AS n,
               min(ux) AS u_min, max(ux) AS u_max,
               min(dy) AS d_min, max(dy) AS d_max
        FROM z GROUP BY 1
    """,
    doc="§2.12 Z-order (Morton) layout key for multi-dimensional data "
    "skipping — the lakehouse technique for pruning a 100 TB table on "
    "EITHER of two dims: interleave the bits of (user_id, event-day) with "
    "the magic-bits spread (pure integer shifts/masks, whole-stage "
    "codegen), sort/range-partition by zkey at write time, and every "
    "file's min/max stats stay tight on BOTH columns — a filter on either "
    "dim prunes ~sqrt-fraction of files instead of reading everything. "
    "The query emits per-zbucket (64-wide key ranges — 1024 buckets over "
    "the 16-bit z space) row counts and "
    "min/max of both dims — exactly the footer stats a writer would get. "
    "Deterministic bit math, value-oracle-able; no sampling-based "
    "repartitionByRange nondeterminism anywhere.",
)
def layout_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    # FLOOR division for the day index (Spark `div` truncates toward zero,
    # DuckDB `//` floors — divergent pre-1970; ADVICE r7): subtract pmod
    # first so `div` lands on an exact multiple and equals floor.
    us = "unix_micros(ts)"
    base = e.select(
        (F.col("user_id") % 256).alias("ux"),
        (F.expr(f"(({us}) - pmod(({us}), 86400000000)) div 86400000000") % 256).alias("dy"),
    )
    z = base.select(
        "ux", "dy", F.expr(_zkey("ux", "dy", _Z_SPARK_SHL)).alias("zkey")
    )
    return (
        z.groupBy(F.expr("zkey div 64").alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("ux").alias("u_min"),
            F.max("ux").alias("u_max"),
            F.min("dy").alias("d_min"),
            F.max("dy").alias("d_max"),
        )
    )


@register(
    "table_checksum_shards",
    oracle="""
        WITH canon AS (
            SELECT md5(concat_ws('|',
                       CAST(event_id AS VARCHAR),
                       CAST(user_id AS VARCHAR),
                       event_type,
                       CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR)))
                   AS h
            FROM events
        ),
        v AS (
            SELECT CAST('0x' || substr(h, 1, 5) AS BIGINT) AS v1,
                   CAST('0x' || substr(h, 6, 5) AS BIGINT) AS v2
            FROM canon
        )
        SELECT v1 % 64 AS shard,
               count(*) AS cnt,
               CAST(SUM(v1) AS BIGINT) AS s1,
               CAST(SUM(v2) AS BIGINT) AS s2
        FROM v GROUP BY 1
    """,
    doc="§2.12 order-independent table checksum — the cross-cluster data "
    "validation primitive (did the 100 TB migration/replication land "
    "byte-identically?): md5 over a canonical per-row serialization, two "
    "independent 20-bit chunks summed per 64-way shard. Sums are "
    "commutative so partitioning/order never matters; 20-bit values keep "
    "BIGINT sums overflow-free to ~8.8e12 rows per shard; 64 shards x two "
    "sums + counts give a ~2.6k-bit fingerprint — a single flipped row "
    "flips its shard with probability 1 against both chunks. Fully "
    "engine-portable (md5 + hex→int are exact both sides). Map + one "
    "64-key groupBy, no data movement beyond the 64-row rollup.",
)
def table_checksum_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_decodable_spark.queries.money import cents

    e = read_table(spark, sf_dir, "events")
    canon = e.select(
        F.md5(
            F.concat_ws(
                "|",
                F.col("event_id").cast("string"),
                F.col("user_id").cast("string"),
                F.col("event_type"),
                cents("value").cast("string"),
            )
        ).alias("h")
    )
    v = canon.select(
        F.expr("CAST(conv(substr(h, 1, 5), 16, 10) AS BIGINT)").alias("v1"),
        F.expr("CAST(conv(substr(h, 6, 5), 16, 10) AS BIGINT)").alias("v2"),
    )
    return (
        v.groupBy((F.col("v1") % 64).alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("v1").alias("s1"),
            F.sum("v2").alias("s2"),
        )
    )


@register(
    "snapshot_diff_status",
    oracle="""
        WITH old AS (
            SELECT user_id,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                       AS units, count(*) AS n
            FROM events WHERE event_id < 8000 GROUP BY user_id
        ),
        new AS (
            SELECT user_id,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                       AS units, count(*) AS n
            FROM events GROUP BY user_id
        )
        SELECT coalesce(o.user_id, n.user_id) AS user_id,
               CASE WHEN o.user_id IS NULL THEN 'added'
                    WHEN n.user_id IS NULL THEN 'removed'
                    WHEN o.units <> n.units OR o.n <> n.n THEN 'changed'
                    ELSE 'unchanged' END AS status,
               o.units AS old_units, n.units AS new_units
        FROM old o FULL OUTER JOIN new n ON o.user_id = n.user_id
    """,
    doc="§2.11/§2.12 snapshot diff — the reconciliation report behind the "
    "reference's apply-diff plan surface (impl.py:402-417 computes a "
    "create/update/delete plan before touching resources; this is the same "
    "classification pushed down to ROW level at table scale): two "
    "snapshot aggregates full-outer-joined on the key, each row labeled "
    "added/removed/changed/unchanged by comparing exact integer state. At "
    "100 TB both sides shuffle once on the join key (or zero times if the "
    "snapshots are bucketed by key at write time — the bucketing path "
    "test_bucketing pins); the checksum-shard twin (table_checksum_shards) "
    "answers 'did anything change' in O(64) before this row-level pass "
    "runs at all.",
)
def snapshot_diff_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_decodable_spark.queries.money import cents

    e = read_table(spark, sf_dir, "events")

    def snap(df):
        return df.groupBy("user_id").agg(
            F.sum(cents("value")).alias("units"), F.count(F.lit(1)).alias("n")
        )

    old = snap(e.filter(F.col("event_id") < 8000)).alias("o")
    new = snap(e).alias("n")
    joined = old.join(new, F.col("o.user_id") == F.col("n.user_id"), "full_outer")
    status = (
        F.when(F.col("o.user_id").isNull(), F.lit("added"))
        .when(F.col("n.user_id").isNull(), F.lit("removed"))
        .when(
            (F.col("o.units") != F.col("n.units")) | (F.col("o.n") != F.col("n.n")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        F.coalesce(F.col("o.user_id"), F.col("n.user_id")).alias("user_id"),
        status.alias("status"),
        F.col("o.units").alias("old_units"),
        F.col("n.units").alias("new_units"),
    )


@register(
    "maintenance_compaction_roundtrip",
    oracle="""
        SELECT o_orderpriority,
               count(*) AS n,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS price_units
        FROM orders GROUP BY o_orderpriority
    """,
    doc="§2.1/§2.11 small-file compaction round-trip — the maintenance "
    "operation every streaming sink needs at 100 TB (file-open overhead "
    "and footer-per-tiny-file kill scan throughput): a copy of orders is "
    "deliberately shattered into 48 small files, compact_path rewrites it "
    "crash-safely (tmp → row-count verify → rename-aside swap, "
    "operators/maintenance.py — reference parity: the platform owns "
    "storage layout; nearest surface is stream clear/truncate), and the "
    "query returns the per-priority exact-cents rollup FROM THE COMPACTED "
    "COPY. The oracle computes the same rollup from the source table, so "
    "a hash-green row proves compaction moved every row and every value "
    "losslessly; the file-count collapse itself (48 → 4) is pinned by "
    "pytest where the scale is controlled. maxRecordsPerFile bounds file "
    "size without a count pass; target_files rebalances in one "
    "round-robin shuffle — both scale-safe (no driver-side data).",
)
def maintenance_compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import shutil

    from dbt_decodable_spark.operators.maintenance import compact_path
    from dbt_decodable_spark.queries.money import cents

    o = read_table(spark, sf_dir, "orders")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"/tmp/spark_compact_src_{tag}"
    # shatter: 48 near-empty files, the shape a per-minute streaming sink
    # leaves behind
    o.repartition(48).write.mode("overwrite").parquet(path)
    compact_path(spark, path, max_records_per_file=100_000, target_files=4)
    out = (
        spark.read.parquet(path)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents("o_totalprice")).alias("price_units"),
        )
        .localCheckpoint(eager=True)  # materialize before scratch cleanup
    )
    shutil.rmtree(path, ignore_errors=True)
    return out
