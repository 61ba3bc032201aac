"""Driver-checked queries for the incremental-view-maintenance layer — the
maintained materializations behind ``catalog.activate_pipeline_incremental``
(aggregate arm), ``activate_pipeline_join_incremental`` (join arm) and
``activate_pipeline_dag_incremental`` (the two-stage cascade), i.e. the
Spark-first equivalent of the reference platform's continuously-maintained
pipelines (``/root/reference/decodable/apply/handler.py:89-94`` last-image
fold over ``primary_key`` change streams,
``decodable/client/schema.py:109-111``).

Both queries drive the REAL maintenance state machines (delta-log init /
append / compact / read; the cascade adds the watermarked change-log
consumption of :mod:`..operators.ivm_dag`) over deterministic micro-batch
splits of the test tables, then return the maintained view. The oracle is
the declarative recompute in ANSI SQL — last-image fold, join, GROUP BY —
so a hash-green row proves the incremental path lands on exactly the
recompute, deletes/updates/retractions included. The bounded-streaming
lifecycle around the same state machines (checkpoints, availableNow runs,
crash markers) is pinned by ``tests/test_ivm_log.py`` /
``test_ivm_join.py`` / ``test_ivm_dag.py``; these rows carry the value
evidence.

Scale note: the per-batch upstream snapshots here are recomputed folds —
fine for a correctness vehicle; the production arms maintain them as
bucketed merge-on-read logs (O(|batch|) appends, state-side shuffle-free
merges, plan-pinned in the ivm test suites)."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from dbt_decodable_spark.queries import register
from dbt_decodable_spark.queries.money import cents, sql_cents
from dbt_decodable_spark.sources.tables import read_table


@register(
    "ivm_agg_maintained",
    oracle=f"""
        WITH ranked AS (
            SELECT user_id, event_type,
                   {sql_cents('value')} AS cents,
                   (event_id % 20 = 0) AS is_delete,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC
                   ) AS rn
            FROM events
        ), live AS (
            SELECT * FROM ranked WHERE rn = 1 AND NOT is_delete
        )
        SELECT event_type,
               count(*) AS n_users,
               CAST(SUM(cents) AS DOUBLE) / 100 AS sum_value,
               min(cents) AS min_cents,
               max(cents) AS max_cents,
               count(DISTINCT cents) AS n_distinct_cents
        FROM live
        GROUP BY event_type
    """,
    doc="§2.12 continuously-maintained GROUP BY view (the aggregate IVM "
    "arm behind activate_pipeline_incremental — the execution model of "
    "the reference's pipelines over primary_key change streams, "
    "handler.py:89-94): events replayed as a keyed upsert/tombstone "
    "stream (PK user_id, order (ts, event_id), delete marker every 20th "
    "event_id — the stream_cdc_merge conventions) through FOUR delta-log "
    "maintenance batches split by event_id%4 — deliberately NOT "
    "time-ordered, so stale-image no-ops and out-of-order winners are "
    "exercised — with a mid-run ivm_log_compact (generation publish + "
    "max_tag replay floor). count(*)/sum ride signed counter deltas; "
    "min/max/count(distinct) ride (group,value,multiplicity) support "
    "tables (retraction-exact under the tombstones). The oracle is the "
    "declarative recompute: last image per user, drop tombstones, GROUP "
    "BY — hash-equality proves the maintained state IS the recompute. "
    "Scale: appends are O(|batch| + touched-group support slices), "
    "state-side shuffle-free on the bucketed layout (plan-pinned in "
    "tests/test_ivm_log.py); compaction is the amortized O(|state|) "
    "step on a pending-delta trigger.",
)
def ivm_agg_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_decodable_spark.operators.ivm import AggViewSpec
    from dbt_decodable_spark.operators.ivm_log import (
        ivm_log_append,
        ivm_log_compact,
        ivm_log_init,
        ivm_log_read,
    )
    from dbt_decodable_spark.streaming.changelog import fold_last_image

    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        cents("value").alias("cents"),
        (F.pmod("event_id", F.lit(20)) == 0).alias("is_delete"),
        F.col("ts").alias("ts_event"),
        "event_id",
    )
    keys = ["user_id"]
    order = [F.col("ts_event"), F.col("event_id")]
    spec = AggViewSpec(
        group_cols=("event_type",),
        count_star="n_users",
        sums={"sum_cents": "cents"},
        mins={"min_cents": "cents"},
        maxs={"max_cents": "cents"},
        count_distincts={"n_distinct_cents": "cents"},
        output_order=(
            "event_type", "n_users", "sum_cents", "min_cents",
            "max_cents", "n_distinct_cents",
        ),
    )
    batches = [ev.filter(F.pmod("event_id", F.lit(4)) == k) for k in range(4)]
    root = tempfile.mkdtemp(prefix="ivm_agg_q_")
    try:
        snap = fold_last_image(batches[0], keys, order)
        ivm_log_init(spark, root, snap, spec, delete_col="is_delete")
        seen = batches[0]
        for k, b in enumerate(batches[1:], start=1):
            # snapshot the batch merges into, BEFORE it lands (the module
            # ordering contract); recomputed fold here — the production
            # arm maintains it as a bucketed log (module docstring)
            ivm_log_append(
                spark, root, fold_last_image(seen, keys, order), b,
                keys, order, spec, tag=str(k),
            )
            seen = seen.unionByName(b)
            if k == 2:
                ivm_log_compact(spark, root, spec)
        out = ivm_log_read(spark, root, spec).select(
            "event_type",
            "n_users",
            (F.col("sum_cents").cast("double") / 100).alias("sum_value"),
            "min_cents",
            "max_cents",
            "n_distinct_cents",
        )
        rows = out.collect()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


@register(
    "ivm_join_agg_dag",
    oracle=f"""
        WITH cust AS (
            SELECT c_custkey,
                   CASE WHEN c_custkey % 10 = 0 THEN 'UPD'
                        ELSE c_mktsegment END AS mktsegment
            FROM customer
        ), live AS (
            SELECT o_orderkey, o_custkey,
                   {sql_cents('o_totalprice')} AS cents
            FROM orders
            WHERE o_orderkey % 37 <> 0
        )
        SELECT c.mktsegment AS mktsegment,
               count(*) AS n_orders,
               CAST(SUM(o.cents) AS DOUBLE) / 100 AS sum_total,
               min(o.cents) AS min_cents,
               max(o.cents) AS max_cents
        FROM live o JOIN cust c ON o.o_custkey = c.c_custkey
        GROUP BY c.mktsegment
    """,
    doc="§2.12 two-stage maintained model DAG (the cascade behind "
    "activate_pipeline_dag_incremental — the reference's "
    "pipeline-per-model graph where one model's sink stream is the next "
    "model's source, impl.py:419-447): an orders⟕customer lookup-join "
    "view maintained under change streams on BOTH sides "
    "(maintain_join_with_changes), whose emitted change stream feeds a "
    "downstream GROUP-BY-mktsegment aggregate through the REAL on-disk "
    "view delta log and the ivm_dag watermark protocol — init floor, "
    "seq-tagged consumption, one step deliberately consuming TWO pending "
    "deltas (telescoping), downstream compaction mid-run. Churn covers "
    "the hard retraction case: a dim payload update (every 10th custkey "
    "→ segment 'UPD') MIGRATES thousands of facts between downstream "
    "groups, and late fact tombstones (every 37th orderkey) retract "
    "sums/counts and re-derive group extremes from the support tables. "
    "Oracle = the declarative two-stage recompute. Scale: the join arm "
    "shuffles O(|batch| + dim-update fanout) per batch, the downstream "
    "consumes O(|view changes|) — never a view recompute (plan/slope "
    "evidence: tests/test_ivm_join.py, test_ivm_dag.py, SCALING.md).",
)
def ivm_join_agg_dag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_decodable_spark.operators import ivm_dag
    from dbt_decodable_spark.operators.ivm import AggViewSpec
    from dbt_decodable_spark.operators.ivm_join import (
        JoinViewSpec,
        JoinViewState,
        init_join_state,
        maintain_join_with_changes,
    )
    from dbt_decodable_spark.operators.ivm_log import ivm_log_read
    from dbt_decodable_spark.streaming.changelog import (
        append_delta,
        write_hash_partitioned,
    )

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        cents("o_totalprice").alias("cents"),
        F.lit(0).cast("long").alias("ver"),
        F.lit(False).alias("deleted"),
    )
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_mktsegment").alias("seg"),
        F.lit(0).cast("long").alias("dver"),
    )
    spec = JoinViewSpec(
        fact_keys=("o_orderkey",),
        fk_cols=("o_custkey",),
        dim_keys=("c_custkey",),
        dim_payload={"mktsegment": "seg"},
    )
    agg_spec = AggViewSpec(
        group_cols=("mktsegment",),
        count_star="n_orders",
        sums={"sum_cents": "cents"},
        mins={"min_cents": "cents"},
        maxs={"max_cents": "cents"},
        output_order=(
            "mktsegment", "n_orders", "sum_cents", "min_cents", "max_cents",
        ),
    )
    ford = [F.col("ver"), F.col("o_orderkey")]
    dord = [F.col("dver"), F.col("c_custkey")]
    f0 = orders.filter(F.pmod("o_orderkey", F.lit(3)) == 0)
    f1 = orders.filter(F.pmod("o_orderkey", F.lit(3)) == 1)
    f2 = orders.filter(F.pmod("o_orderkey", F.lit(3)) == 2)
    # late tombstones for already-inserted keys: ver=1 beats the insert
    f3 = orders.filter(F.pmod("o_orderkey", F.lit(37)) == 0).withColumns(
        {"ver": F.lit(1).cast("long"), "deleted": F.lit(True)}
    )
    # dim payload update: migrates every matching fact between groups
    d2 = cust.filter(F.pmod("c_custkey", F.lit(10)) == 0).withColumns(
        {"seg": F.lit("UPD"), "dver": F.lit(1).cast("long")}
    )
    empty_d = spark.createDataFrame([], cust.schema)

    tmp = tempfile.mkdtemp(prefix="ivm_dag_q_")
    view_log = os.path.join(tmp, "view")
    droot = os.path.join(tmp, "down")
    try:
        state = init_join_state(f0, cust, spec, "deleted", None)
        v0 = (
            state.view
            .withColumn("__seq", F.lit(0).cast("long"))
            .withColumn("__deleted", F.lit(False))
        )
        write_hash_partitioned(v0, view_log, ["o_orderkey"], 8)
        ivm_dag.init_downstream(
            spark, droot, view_log, ["o_orderkey"], agg_spec
        )
        rounds = [(f1, empty_d), (f2, d2), (f3, empty_d)]
        for seq, (fb, db) in enumerate(rounds, start=1):
            state, changes = maintain_join_with_changes(
                state, fb, db, ford, dord, spec, seq=seq,
                fact_delete_col="deleted", dim_delete_col=None,
            )
            append_delta(spark, view_log, changes, tag=str(seq))
            # keep the in-memory state's plan bounded across rounds (the
            # engine arm persists state as bucketed logs instead)
            state = JoinViewState(
                fact=state.fact.localCheckpoint(eager=True),
                dim=state.dim.localCheckpoint(eager=True),
                view=state.view.localCheckpoint(eager=True),
            )
            if seq != 2:
                # seq 2 is deliberately left pending so the seq-3 step
                # consumes TWO deltas in one telescoped append
                ivm_dag.maintain_downstream(
                    spark, droot, view_log, ["o_orderkey"], agg_spec,
                    compact_every=2,
                )
        out = ivm_log_read(spark, droot, agg_spec).select(
            "mktsegment",
            "n_orders",
            (F.col("sum_cents").cast("double") / 100).alias("sum_total"),
            "min_cents",
            "max_cents",
        )
        rows = out.collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)
