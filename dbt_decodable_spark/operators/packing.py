"""Token-budget shard packing for training-data pipelines (SURVEY §2.12).

Training corpora are shipped as shards of roughly equal token counts. The
primitive underneath is an exact *global running sum* of token weights in a
deterministic document order — which naive Spark expresses as
``sum(w).over(Window.orderBy(id))``: a single-task global sort that cannot
scale (every row funnels through one partition).

``global_running_sum`` computes the identical result with the classic
two-phase distributed prefix sum:

1. range-repartition on the order key (P ordered ranges, Spark's
   ``repartitionByRange`` — boundary sampling is cheap and the result is
   *invariant* to where the boundaries land, see below);
2. partition-local running sum (window partitioned by the range id — P
   concurrent tasks, no global sort);
3. per-range totals → exclusive prefix offsets (a P-row aggregate — tiny,
   one task) broadcast-joined back.

Step 3's offsets are computed from the *actual* per-range sums, so the
final ``local_cum + offset`` equals the global ordered cumsum no matter
how the sampled range boundaries fell — nondeterministic partitioning,
deterministic result. The ranged projection is snapshotted
(``localCheckpoint``) so the local-cumsum branch and the totals branch see
the same partition assignment; on a multi-node cluster use
``persist(DISK_ONLY)``/``checkpoint()`` for the same guarantee with fault
tolerance.

``pack_by_budget`` then assigns ``shard_id = floor(cum_before / budget)``:
a document opens in the shard where its token interval starts, giving
shards of >= ``budget`` tokens (the last document of a shard spills its
tail over the boundary — the standard greedy packing, exact and
order-stable).

The reference (decodableco/dbt-decodable) has no packing surface; this is
part of the training-data extension set the driver mandates. All outputs
are integers — oracle-checkable bit-for-bit against DuckDB's
``SUM(...) OVER (ORDER BY ...)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def grouped_running_sum(
    df: DataFrame,
    order_cols: list[str],
    weight_col: str,
    out_col: str = "cum",
    group_cols: list[str] | tuple[str, ...] = (),
    partitions: int | None = None,
) -> DataFrame:
    """df + ``out_col``: exact running sum of ``weight_col`` in ascending
    ``order_cols`` order — globally, or within each ``group_cols`` group
    (without funnelling a whole group through one window task: the range
    partitioning spans (group, order), so a large group spreads over many
    ranges and the per-group offsets stitch the local cumsums back
    together; the offsets table is ≤ P·|groups| rows, broadcast). The
    combined (group, order) key must be unique per row; with duplicates the
    intra-tie order — and thus the cumsum — would be engine-dependent."""
    group_cols = list(group_cols)
    p = partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(p, *[F.col(c) for c in (*group_cols, *order_cols)])
        .withColumn("__pid", F.spark_partition_id())
        # snapshot: both consumers below must observe the same boundaries
        .localCheckpoint(eager=True)
    )
    local_w = (
        W.partitionBy("__pid", *group_cols)
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = ranged.withColumn("__local_cum", F.sum(weight_col).over(local_w))

    totals = ranged.groupBy("__pid", *group_cols).agg(F.sum(weight_col).alias("__tot"))
    # exclusive prefix over ≤ P·|groups| rows — deliberately tiny windows
    off_base = W.partitionBy(*group_cols) if group_cols else W
    off_w = off_base.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid",
        *group_cols,
        F.coalesce(F.sum("__tot").over(off_w), F.lit(0)).alias("__off"),
    )

    return (
        local.join(F.broadcast(offsets), ["__pid", *group_cols])
        .withColumn(out_col, F.col("__local_cum") + F.col("__off"))
        .drop("__pid", "__local_cum", "__off")
    )


def global_running_sum(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    out_col: str = "cum",
    partitions: int | None = None,
) -> DataFrame:
    """Single-group convenience over :func:`grouped_running_sum`."""
    return grouped_running_sum(
        df, [order_col], weight_col, out_col=out_col, partitions=partitions
    )


def pack_by_budget(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    budget: int,
    cum_col: str = "cum_weight",
    shard_col: str = "shard_id",
) -> DataFrame:
    """Assign each row a shard id so consecutive rows (by ``id_col``) fill
    ~``budget`` weight per shard. Greedy interval packing off the exact
    global running sum: shard = floor((cum - w) / budget)."""
    cum = global_running_sum(df, id_col, weight_col, out_col=cum_col)
    # BIGINT `div`, not `/`+floor: long/long is DOUBLE division in Spark,
    # and past 2^53 cumulative weight the coercion misplaces boundary
    # rows — the same exactness rule mixing.temperature_quotas follows
    return cum.withColumn(
        shard_col,
        F.expr(
            f"(cast(`{cum_col}` as bigint) - cast(`{weight_col}` as bigint))"
            f" div {int(budget)}"
        ).cast("long"),
    )


def length_bucket_thresholds(
    df: DataFrame, length_col: str, n_buckets: int = 8
) -> DataFrame:
    """Exact quantile thresholds for sequence-length bucketing WITHOUT a
    global sort: ``(bucket, upper_len)`` where bucket b (1-based) covers
    lengths up to the smallest length whose cumulative count reaches
    ``ceil(b·N/B)``.

    The trick that scales: aggregate to the LENGTH HISTOGRAM first
    (``groupBy(length).count()``) — its size is bounded by the number of
    distinct lengths (≤ max sequence length, thousands), not by corpus
    rows — then do the cumulative/threshold work on that tiny table. The
    one unpartitioned window here runs over the histogram, never the
    corpus; the corpus-side cost is a single partial-agg'd groupBy. All
    arithmetic is BIGINT (ceil via ``(b·N + B−1) div B``), so the
    thresholds are engine-exact.
    """
    hist = df.groupBy(F.col(length_col).alias("__len")).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    w = W.orderBy("__len").rowsBetween(W.unboundedPreceding, 0)
    cum = hist.withColumn("__cum", F.sum("__cnt").over(w))
    # N comes from the tiny histogram — re-counting df would be a second
    # full corpus pass for a number the first aggregate already holds
    total = hist.agg(F.sum("__cnt").alias("__N"))
    spark = df.sparkSession
    buckets = spark.createDataFrame(
        [(b,) for b in range(1, n_buckets + 1)], "bucket long"
    )
    return (
        cum.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(buckets))
        .filter(
            F.col("__cum")
            >= F.expr(f"(bucket * __N + {n_buckets - 1}) div {n_buckets}")
        )
        .groupBy("bucket")
        .agg(F.min("__len").alias("upper_len"))
    )


def assign_length_buckets(
    df: DataFrame, id_col: str, length_col: str, n_buckets: int = 8
) -> DataFrame:
    """Per-row bucket assignment for length-batched training/inference:
    ``(id, length, bucket)`` with bucket = smallest b whose threshold
    covers the row's length. Rows of similar length land in the same
    bucket, so a batch drawn within a bucket wastes minimal padding.

    The threshold table (B rows) is broadcast; assignment is a
    B-comparison nested-loop per row folded with ``min(bucket)`` — a
    map-side join, no corpus shuffle beyond the id re-group (AQE
    coalesces it)."""
    thr = length_bucket_thresholds(df, length_col, n_buckets)
    lens = df.select(F.col(id_col).alias("id"), F.col(length_col).alias("length"))
    return (
        lens.join(F.broadcast(thr), F.col("length") <= F.col("upper_len"), "inner")
        .groupBy("id", "length")
        .agg(F.min("bucket").alias("bucket"))
    )
