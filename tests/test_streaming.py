"""Structured-Streaming twins of the batch semantics (SURVEY §2.9):
watermarked windowed aggregation over a real stream converges to the batch
answer; change-stream folding via foreachBatch; datagen/rate source;
activate/deactivate lifecycle; dropDuplicatesWithinWatermark."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from dbt_decodable_spark.schema import SchemaField, StreamSchema, Watermark
from dbt_decodable_spark.sources.datagen import datagen_stream, file_stream
from dbt_decodable_spark.sources.tables import read_table
from dbt_decodable_spark.streaming.changelog import apply_changes_batch
from dbt_decodable_spark.streaming.runner import StreamRunner

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="dds_stream_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture()
def runner(spark):
    r = StreamRunner(spark)
    yield r
    r.deactivate_all()


EVENTS_SCHEMA = StreamSchema(
    fields=(
        SchemaField(name="event_id", type="BIGINT"),
        SchemaField(name="ts", type="TIMESTAMP_LTZ(6)"),
        SchemaField(name="user_id", type="BIGINT"),
        SchemaField(name="event_type", type="STRING"),
        SchemaField(name="value", type="DOUBLE"),
        SchemaField(name="props", type="STRING"),
    ),
    watermarks=(Watermark("ts", "`ts` - INTERVAL '1' MINUTE"),),
)


def _events_parquet(spark, tmpdir: str) -> str:
    path = f"{tmpdir}/events_in"
    read_table(spark, SF_DIR, "events").write.mode("overwrite").parquet(path)
    return path


class TestFileStreamWindowedAgg:
    def test_stream_matches_batch(self, spark, tmpdir, runner):
        """availableNow tumbling-window agg over a file stream == batch
        groupBy(window) — the M6 semantics gate."""
        path = _events_parquet(spark, tmpdir)
        stream = file_stream(spark, path, EVENTS_SCHEMA)
        assert stream.isStreaming
        agg = (
            stream.groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("window.start").alias("ws"), "event_type", "n")
        )
        runner.activate_memory("win_agg", agg, output_mode="append")
        runner.wait("win_agg")
        got = {tuple(r) for r in spark.table("win_agg").collect()}

        batch = (
            read_table(spark, SF_DIR, "events")
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("window.start").alias("ws"), "event_type", "n")
        )
        want = {tuple(r) for r in batch.collect()}
        # watermark may hold back the final (open) windows in append mode;
        # everything emitted must match the batch result exactly
        assert got <= want
        assert len(got) >= len(want) - len({r[1] for r in want})  # ≤1 open window per type

    def test_watermark_drops_late_rows(self, spark, tmpdir, runner):
        """Late data beyond the watermark is dropped in windowed agg —
        matching the reference's late-data semantics (SURVEY §2.9)."""
        import pandas as pd

        early = pd.DataFrame(
            {"ts": pd.to_datetime(["2024-01-01 10:00:00", "2024-01-01 12:00:00"]), "k": ["a", "a"]}
        )
        late = pd.DataFrame(  # 10:05 arrives after the 12:00 watermark advanced
            {"ts": pd.to_datetime(["2024-01-01 10:05:00"]), "k": ["a"]}
        )
        in_dir = f"{tmpdir}/late_in"
        spark.createDataFrame(early).coalesce(1).write.mode("append").parquet(in_dir)

        schema = StreamSchema(
            fields=(
                SchemaField(name="ts", type="TIMESTAMP_LTZ(6)"),
                SchemaField(name="k", type="STRING"),
            ),
            watermarks=(Watermark("ts", "`ts` - INTERVAL '1' MINUTE"),),
        )
        stream = file_stream(spark, in_dir, schema)
        agg = (
            stream.groupBy(F.window("ts", "1 hour"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("window.start").alias("ws"), "n")
        )
        # first drain: watermark advances past 10:xx
        q = (
            agg.writeStream.format("memory")
            .queryName("late_agg")
            .outputMode("append")
            .option("checkpointLocation", f"{tmpdir}/late_ckpt")
            .start()
        )
        q.processAllAvailable()
        # late row lands in a window already finalized
        spark.createDataFrame(late).coalesce(1).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
        q.stop()
        rows = {(r["ws"].isoformat(), r["n"]) for r in spark.table("late_agg").collect()}
        # the 10:00 window was emitted with n=1 (late row dropped, not recounted)
        assert ("2024-01-01T10:00:00", 1) in rows


class TestChangeStreamMerge:
    def test_foreach_batch_merge(self, spark, tmpdir, runner):
        """Change-stream upsert via foreachBatch MERGE: last image per key,
        null-after deletes (handler.py:89-94 streaming form)."""
        in_dir = f"{tmpdir}/chg_in"
        spark.createDataFrame(
            [(1, "k1", 10, False), (2, "k1", 20, False), (3, "k2", 5, False)],
            "seq long, key string, v long, is_delete boolean",
        ).coalesce(1).write.mode("append").parquet(in_dir)

        schema = StreamSchema(
            fields=(
                SchemaField(name="seq", type="BIGINT"),
                SchemaField(name="key", type="STRING"),
                SchemaField(name="v", type="BIGINT"),
                SchemaField(name="is_delete", type="BOOLEAN"),
            ),
            primary_key=("key",),
        )
        stream = file_stream(spark, in_dir, schema)
        state = {"df": spark.createDataFrame([], "seq long, key string, v long")}

        def merge(batch_df, epoch_id):
            state["df"] = apply_changes_batch(
                state["df"],
                batch_df,
                keys=["key"],
                order=["seq"],
                delete_col="is_delete",
            ).localCheckpoint()

        runner.activate_foreach_batch("chg", stream, merge, available_now=True)
        runner.wait("chg")
        snap1 = {(r["key"], r["v"]) for r in state["df"].collect()}
        assert snap1 == {("k1", 20), ("k2", 5)}

        # second micro-batch: update k2, delete k1
        spark.createDataFrame(
            [(4, "k2", 50, False), (5, "k1", 0, True)],
            "seq long, key string, v long, is_delete boolean",
        ).coalesce(1).write.mode("append").parquet(in_dir)
        runner.deactivate("chg")
        runner.activate_foreach_batch("chg2", file_stream(spark, in_dir, schema), merge, available_now=True)
        # fresh checkpoint-less run reprocesses everything into an empty state
        state["df"] = spark.createDataFrame([], "seq long, key string, v long")
        runner.wait("chg2")
        snap2 = {(r["key"], r["v"]) for r in state["df"].collect()}
        assert snap2 == {("k2", 50)}


class TestDatagenAndLifecycle:
    def test_datagen_schema_and_lifecycle(self, spark, runner):
        """datagen connector emits the declared schema; activate/deactivate
        mirrors client.py:381-393."""
        schema = StreamSchema(
            fields=(
                SchemaField(name="id", type="BIGINT"),
                SchemaField(name="label", type="STRING"),
                SchemaField(name="amount", type="DOUBLE"),
                SchemaField(name="id2", kind="computed", expression="id * 2"),
            )
        )
        stream = datagen_stream(spark, schema, rows_per_second=500)
        assert stream.isStreaming
        assert [f.name for f in stream.schema.fields] == ["id", "label", "amount", "id2"]
        runner.activate_memory("dg", stream, available_now=False)
        assert runner.states()["dg"] == "RUNNING"
        runner.running["dg"].query.processAllAvailable()
        runner.deactivate("dg")
        assert "dg" not in runner.running

    def test_streaming_exact_dedup(self, spark, tmpdir, runner):
        """dropDuplicatesWithinWatermark — the streaming exact-dedup path
        (SURVEY §2.12 row 1)."""
        in_dir = f"{tmpdir}/dedup_in"
        import pandas as pd

        pdf = pd.DataFrame(
            {
                "ts": pd.to_datetime(["2024-01-01 10:00:00"] * 3 + ["2024-01-01 10:30:00"]),
                "doc": ["x", "x", "y", "x"],
            }
        )
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(in_dir)
        schema = StreamSchema(
            fields=(
                SchemaField(name="ts", type="TIMESTAMP_LTZ(6)"),
                SchemaField(name="doc", type="STRING"),
            ),
            watermarks=(Watermark("ts", "`ts` - INTERVAL '1' HOUR"),),
        )
        stream = file_stream(spark, in_dir, schema).dropDuplicatesWithinWatermark(["doc"])
        runner.activate_memory("dd", stream)
        runner.wait("dd")
        docs = sorted(r["doc"] for r in spark.table("dd").collect())
        assert docs == ["x", "y"]


class TestStatefulSessionize:
    def test_sessions_close_by_data_and_watermark(self, spark, tmpdir, runner):
        """applyInPandasWithState sessionization: sessions closed by a
        later event always emit; the final open session emits only when the
        watermark (max_ts - delay) passes session_end + gap."""
        import pandas as pd

        from dbt_decodable_spark.streaming.stateful import sessionize_stateful

        in_dir = f"{tmpdir}/sess_in"
        # user 1: two events 1 min apart (session A), then one 30 min later
        #   (session B, closed by watermark: global max is user 2's event).
        # user 2: one event far in the future (session open at end → NOT
        #   emitted) — it also drives the watermark that closes B.
        pdf = pd.DataFrame(
            {
                "ts": pd.to_datetime(
                    [
                        "2024-01-01 10:00:00",
                        "2024-01-01 10:01:00",
                        "2024-01-01 10:31:00",
                        "2024-01-02 09:00:00",
                    ]
                ),
                "user_id": [1, 1, 1, 2],
                "cents": [100, 200, 400, 800],
            }
        )
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(in_dir)
        schema = StreamSchema(
            fields=(
                SchemaField(name="ts", type="TIMESTAMP_LTZ(6)"),
                SchemaField(name="user_id", type="BIGINT"),
                SchemaField(name="cents", type="BIGINT"),
            ),
            watermarks=(Watermark("ts", "`ts` - INTERVAL '1' MINUTE"),),
        )
        stream = file_stream(spark, in_dir, schema)
        sessions = sessionize_stateful(stream, "user_id", "ts", "cents", gap_seconds=600)
        runner.activate_memory("sess", sessions)
        runner.wait("sess")
        rows = sorted(
            (
                (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"], r["total_cents"])
                for r in spark.table("sess").collect()
            )
        )
        assert rows == [
            (1, "2024-01-01 10:00:00", "2024-01-01 10:01:00", 2, 300),
            (1, "2024-01-01 10:31:00", "2024-01-01 10:31:00", 1, 400),
        ]


class TestStreamStaticJoin:
    def test_stream_static_broadcast_lookup(self, spark, tmpdir, runner):
        """Stream-static join — the streaming form of the reference's lookup
        join (SURVEY §2.3 'lookup join'): each micro-batch joins against a
        broadcast snapshot of the dimension."""
        import pandas as pd

        in_dir = f"{tmpdir}/ss_in"
        pdf = pd.DataFrame({"k": [1, 2, 3, 2], "v": [10.0, 20.0, 30.0, 40.0]})
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(in_dir)
        dim = spark.createDataFrame(
            [(1, "one"), (2, "two"), (3, "three")], "k long, name string"
        )
        schema = StreamSchema(
            fields=(
                SchemaField(name="k", type="BIGINT"),
                SchemaField(name="v", type="DOUBLE"),
            )
        )
        stream = file_stream(spark, in_dir, schema)
        joined = stream.join(F.broadcast(dim), "k").select("name", "v")
        runner.activate_memory("ss_join", joined)
        runner.wait("ss_join")
        rows = sorted(map(tuple, spark.table("ss_join").collect()))
        assert rows == [("one", 10.0), ("three", 30.0), ("two", 20.0), ("two", 40.0)]


class TestTemporalJoin:
    """Streaming FOR SYSTEM_TIME AS OF emulation (streaming/temporal.py)."""

    def test_bounded_stream_matches_batch_asof(self, spark):
        from dbt_decodable_spark.operators.asof import asof_join
        from dbt_decodable_spark.queries.streaming_q import events_file_stream
        from dbt_decodable_spark.sources.tables import read_table
        from dbt_decodable_spark.streaming.temporal import run_temporal_asof_bounded
        from pyspark.sql import functions as F

        sf = "/root/testdata/sf0.001"
        e = read_table(spark, sf, "events")
        dim = (
            e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("hour_events"))
            .select("event_type", F.col("w.start").alias("valid_from"), "hour_events")
        )
        stream = events_file_stream(spark, sf).select(
            "event_id", "event_type", "ts_event"
        )
        streamed = run_temporal_asof_bounded(
            spark, stream, dim, on="event_type", stream_ts="ts_event",
            dim_ts="valid_from", value_cols=["hour_events"],
        )
        batch = asof_join(
            e.select("event_id", "event_type", F.col("ts").alias("ts_event")),
            dim, on="event_type", left_ts="ts_event", right_ts="valid_from",
            value_cols=["hour_events"],
        )
        got = {tuple(r) for r in streamed.select("event_id", "hour_events").collect()}
        want = {tuple(r) for r in batch.select("event_id", "hour_events").collect()}
        assert got == want and len(got) == e.count()

    def test_callable_provider_reevaluated_per_batch(self, spark):
        from dbt_decodable_spark.queries.streaming_q import events_file_stream
        from dbt_decodable_spark.streaming.temporal import run_temporal_asof_bounded
        from pyspark.sql import functions as F

        sf = "/root/testdata/sf0.001"
        calls = []

        def provider():
            calls.append(1)
            return spark.createDataFrame(
                [("page_view", "1970-01-01 00:00:00", 1)],
                "event_type string, valid_from string, v int",
            ).withColumn("valid_from", F.col("valid_from").cast("timestamp"))

        stream = events_file_stream(spark, sf).select(
            "event_id", "event_type", "ts_event"
        )
        out = run_temporal_asof_bounded(
            spark, stream, provider, on="event_type", stream_ts="ts_event",
            dim_ts="valid_from", value_cols=["v"],
        )
        assert len(calls) >= 1  # provider re-read per micro-batch
        assert out.filter(F.col("event_type") == "page_view").filter(
            F.col("v").isNull()
        ).count() == 0


class TestBucketedStateful:
    def test_bucketed_matches_per_key(self, spark):
        from dbt_decodable_spark.queries.streaming_q import events_file_stream
        from dbt_decodable_spark.streaming.stateful import (
            sessionize_stateful,
            sessionize_stateful_bucketed,
        )

        sf = "/root/testdata/sf0.001"
        results = []
        for name, form in (
            ("snk_perkey", sessionize_stateful),
            ("snk_bucketed", sessionize_stateful_bucketed),
        ):
            stream = events_file_stream(spark, sf)
            sessions = form(stream, "user_id", "ts_event", "cents", gap_seconds=21600)
            q = (
                sessions.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)
            results.append({tuple(r) for r in spark.table(name).collect()})
        assert results[0] == results[1] and len(results[0]) > 0


class TestScd2:
    def test_half_open_intervals_tile_each_key(self, spark):
        from dbt_decodable_spark.streaming.changelog import scd2_from_changelog
        from pyspark.sql import functions as F

        rows = [
            (1, "2024-01-01 00:00:00", "a"),
            (1, "2024-01-02 00:00:00", "b"),
            (1, "2024-01-03 00:00:00", "c"),
            (2, "2024-01-05 00:00:00", "x"),
        ]
        df = spark.createDataFrame(rows, "k long, ts string, v string").withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        out = scd2_from_changelog(df, keys=["k"], ts_col="ts").collect()
        by_key = {}
        for r in out:
            by_key.setdefault(r["k"], []).append(r)
        k1 = sorted(by_key[1], key=lambda r: r["valid_from"])
        # each version's valid_to is the next version's valid_from
        assert [r["valid_to"] for r in k1[:-1]] == [r["valid_from"] for r in k1[1:]]
        # exactly one current version per key
        for rs in by_key.values():
            assert sum(r["is_current"] for r in rs) == 1
            assert max(rs, key=lambda r: r["valid_from"])["is_current"]


class TestOuterIntervalJoin:
    def test_null_emission_follows_watermark_eviction(self, spark, tmp_path):
        """Left-outer stream-stream interval join: an unmatched left row
        emits its null exactly when the watermark passes t1 + upper bound
        (state eviction); later unmatched rows stay in state. Cutoff here:
        max ts 12:00 − 10 min delay − 5 min bound → t1 < 11:45."""
        from pyspark.sql import functions as F

        src = str(tmp_path / "oj_src")
        rows = [(i, 1000 + i, f"2024-01-01 11:{m:02d}:00")
                for i, m in enumerate([0, 20, 42, 47])]
        rows.append((99, 99, "2024-01-01 12:00:00"))
        spark.createDataFrame(
            rows, "id long, k long, ts string"
        ).selectExpr("id", "k", "CAST(ts AS TIMESTAMP) AS ts").write.mode(
            "overwrite"
        ).parquet(src)

        def side(a, b, c):
            return (
                spark.readStream.schema("id long, k long, ts timestamp")
                .parquet(src)
                .withWatermark("ts", "10 minutes")
                .selectExpr(f"id AS {a}", f"k AS {b}", f"ts AS {c}")
            )

        j = side("id_a", "k1", "t1").join(
            side("id_b", "k2", "t2"),
            (F.col("k1") == F.col("k2"))
            & (F.col("t2") > F.col("t1"))
            & (F.col("t2") <= F.col("t1") + F.expr("INTERVAL 5 MINUTES")),
            "leftOuter",
        ).select("id_a", "id_b")
        q = (
            j.writeStream.format("memory")
            .queryName("oj_test_sink")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = {(r["id_a"], r["id_b"]) for r in spark.table("oj_test_sink").collect()}
        # rows at 11:00/11:20/11:42 are past eviction → nulls emitted;
        # 11:47 and 12:00 remain in state → absent
        assert out == {(0, None), (1, None), (2, None)}


class TestTransformWithState:
    def test_processor_accumulation_contract(self):
        """The processor's state arithmetic, driven directly with a stub
        state (runs everywhere — no TWS runner needed)."""
        import pandas as pd

        from dbt_decodable_spark.streaming.twstate import RunningCountProcessor

        class StubState:
            def __init__(self):
                self.v = None
            def exists(self):
                return self.v is not None
            def get(self):
                return self.v
            def update(self, v):
                self.v = v

        p = RunningCountProcessor()
        p._state = StubState()
        out1 = list(p.handleInputRows(
            (7,), iter([pd.DataFrame({"cents": [100, 250]})]), None
        ))[0]
        out2 = list(p.handleInputRows(
            (7,), iter([pd.DataFrame({"cents": [50]})]), None
        ))[0]
        assert out1.iloc[0]["n_events"] == 2 and out1.iloc[0]["total_cents"] == 350
        # state carried across calls: totals accumulate
        assert out2.iloc[0]["n_events"] == 3 and out2.iloc[0]["total_cents"] == 400

    def test_real_streaming_run_when_available(self, spark, tmp_path):
        """End-to-end TWS streaming run — skipped where the runner can't
        start (this sandbox ships no protobuf; see twstate.py)."""
        from dbt_decodable_spark.streaming.twstate import (
            running_count_stream,
            tws_available,
        )

        if not tws_available():
            import pytest
            pytest.skip("protobuf absent: TWS python runner cannot start here")

        src = str(tmp_path / "tws_src")
        spark.createDataFrame(
            [(1, 100), (1, 200), (2, 50)], "user_id long, cents long"
        ).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema("user_id long, cents long").parquet(src)
        q = (
            running_count_stream(stream, "user_id")
            .writeStream.format("memory")
            .queryName("tws_real_sink")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["user_id"], r["n_events"], r["total_cents"])
            for r in spark.table("tws_real_sink").collect()
        }
        assert got == {(1, 2, 300), (2, 1, 50)}


class TestCheckpointRecovery:
    """Restart-with-same-checkpoint semantics: the file source's processed-
    files log must survive a query restart, so a second run ingests ONLY
    files that arrived since — the exactly-once property every production
    sink chain (foreachBatch MERGE, batch-id-partitioned parquet) builds
    on."""

    def _run_stream(self, spark, inp, out, ckpt):
        q = (
            spark.readStream.schema("id long, v string")
            .parquet(inp)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def test_restart_processes_only_new_files(self, spark, tmpdir):
        inp, out, ckpt = (f"{tmpdir}/{d}" for d in ("in", "out", "ckpt"))
        spark.createDataFrame(
            [(i, f"a{i}") for i in range(10)], "id long, v string"
        ).coalesce(1).write.mode("append").parquet(inp)

        self._run_stream(spark, inp, out, ckpt)
        assert spark.read.parquet(out).count() == 10

        # restart with NO new data: nothing reprocessed
        self._run_stream(spark, inp, out, ckpt)
        assert spark.read.parquet(out).count() == 10

        # new files arrive; restart ingests exactly those
        spark.createDataFrame(
            [(i, f"b{i}") for i in range(10, 15)], "id long, v string"
        ).coalesce(1).write.mode("append").parquet(inp)
        self._run_stream(spark, inp, out, ckpt)
        got = spark.read.parquet(out)
        assert got.count() == 15
        assert got.select("id").distinct().count() == 15  # no duplicates


class TestStreamStaticEnrich:
    """stream_static_enrich: a bounded stream-static broadcast join run
    converges to the batch two-join answer (queries/streaming_q.py)."""

    def test_matches_batch_join(self, spark):
        from dbt_decodable_spark.queries import load_all
        from dbt_decodable_spark.sources.tables import read_table

        sf = "/root/testdata/sf0.001"
        reg = load_all()
        got = sorted(
            map(tuple, reg["stream_static_enrich"].fn(spark, sf).collect())
        )
        e = read_table(spark, sf, "events")
        c = read_table(spark, sf, "customer")
        n = read_table(spark, sf, "nation")
        want = sorted(
            map(
                tuple,
                e.join(c, e["user_id"] == c["c_custkey"])
                .join(n, c["c_nationkey"] == n["n_nationkey"])
                .select(
                    "event_id",
                    "user_id",
                    F.col("c_name").alias("cust_name"),
                    F.col("n_name").alias("nation_name"),
                )
                .collect(),
            )
        )
        assert got and got == want
