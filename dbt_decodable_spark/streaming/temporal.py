"""Streaming temporal join — the ``FOR SYSTEM_TIME AS OF`` surface on a
stream (SURVEY §2.3/§7.6; reference ships arbitrary Flink SQL through
``decodable/client/client.py:364-373``, which includes temporal table
joins).

Spark Structured Streaming has no native temporal-table join. The
Spark-idiomatic emulation is ``foreachBatch``: each micro-batch is a bounded
DataFrame, so the *batch* as-of join (:func:`~dbt_decodable_spark.operators.
asof.asof_join` — merge-technique, one key shuffle, no per-key quadratic)
runs against the dimension changelog as of that batch. Semantics match
Flink's event-time temporal join exactly when the dimension changelog the
provider returns contains every version up to the stream's watermark: each
stream row picks the dim version with the greatest ``dim_ts <= stream_ts``
for its key. The provider is re-invoked per batch, so a dim that accretes
versions between batches is picked up — Flink's processing-time temporal
join shape — while a static changelog gives the reproducible event-time
form (what the bounded tests and the driver oracle check).

At 100 TB: the stream side arrives micro-batch-bounded (no full-corpus
materialization); the dim changelog read is a normal batch scan that prunes
on the join keys' partitions; the as-of itself is the same single-shuffle
merge join as the batch operator. State stays in the dim table, not in
Spark state stores — the right trade when the changelog is already a lake
table (the common case for slowly-changing dims).
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from dbt_decodable_spark.operators.asof import asof_join


def temporal_asof_stream(
    stream: DataFrame,
    dim_provider: Callable[[], DataFrame] | DataFrame,
    on: str,
    stream_ts: str,
    dim_ts: str,
    value_cols: list[str],
    out_path: str,
    tolerance: str | None = None,
    checkpoint_path: str | None = None,
    tiebreak_cols: list[str] | None = None,
):
    """Start the temporal join as a streaming query writing parquet batches
    to ``out_path``; returns the StreamingQuery. ``dim_provider`` may be a
    static DataFrame (event-time semantics over a complete changelog) or a
    zero-arg callable re-evaluated per micro-batch (processing-time
    semantics over an accreting changelog). ``tiebreak_cols`` picks the
    winner among several dim versions at the same ``(key, dim_ts)``
    instant (greatest wins) — without it such ties are partition-order
    nondeterministic, the same class the batch operator's r10 fix covers;
    changelogs with unique version timestamps don't need it."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        dim = dim_provider() if callable(dim_provider) else dim_provider
        joined = asof_join(
            batch_df, dim, on, stream_ts, dim_ts, value_cols,
            tolerance=tolerance, tiebreak_cols=tiebreak_cols,
        )
        # foreachBatch is at-least-once: after a failure the checkpointed
        # query REPLAYS the last batch. Partition the sink by batch_id and
        # overwrite only that partition, so a replay rewrites its own
        # partition instead of appending duplicates (idempotent exactly-once
        # sink semantics, the standard dynamic-partition-overwrite trick).
        spark = joined.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                joined.withColumn("__batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .partitionBy("__batch_id")
                .parquet(out_path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    writer = stream.writeStream.foreachBatch(process).trigger(availableNow=True)
    if checkpoint_path:
        writer = writer.option("checkpointLocation", checkpoint_path)
    return writer.start()


def run_temporal_asof_bounded(
    spark: SparkSession,
    stream: DataFrame,
    dim_provider: Callable[[], DataFrame] | DataFrame,
    on: str,
    stream_ts: str,
    dim_ts: str,
    value_cols: list[str],
    tolerance: str | None = None,
    timeout: int = 300,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Bounded-run convenience: drain the stream (availableNow), then return
    the joined result read back from the per-batch parquet output (the
    ``__batch_id`` sink-partition column is dropped — it is idempotence
    plumbing, not part of the join result). A stream that yields zero
    batches never creates the output directory; return an empty frame with
    the join's schema instead of letting ``read.parquet`` throw. The
    result is materialized (eager local checkpoint) so the scratch output
    dir can be deleted before returning — the pre-r11 shape leaked one
    /tmp parquet dir per bounded run."""
    import shutil

    out = os.path.join("/tmp", f"temporal_join_{uuid.uuid4().hex}")
    try:
        q = temporal_asof_stream(
            stream, dim_provider, on, stream_ts, dim_ts, value_cols,
            out_path=out, tolerance=tolerance, tiebreak_cols=tiebreak_cols,
        )
        finished = q.awaitTermination(timeout)
        if not finished:
            q.stop()
            # stop() is asynchronous: in-flight tasks may still be writing
            # into the scratch dir when the finally-block rmtree runs, and a
            # partially-recreated dir after deletion would leak (ADVICE
            # r11). Block until the query has fully terminated before the
            # cleanup path can touch the directory.
            q.awaitTermination()
            raise TimeoutError(
                f"bounded temporal join did not drain within {timeout}s — "
                "partial output discarded"
            )
        if not os.path.exists(out):
            dim = dim_provider() if callable(dim_provider) else dim_provider
            empty_stream = spark.createDataFrame([], stream.schema)
            return asof_join(
                empty_stream, dim, on, stream_ts, dim_ts, value_cols,
                tolerance=tolerance, tiebreak_cols=tiebreak_cols,
            )
        return (
            spark.read.parquet(out)
            .drop("__batch_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
