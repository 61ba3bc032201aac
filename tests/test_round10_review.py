"""Round-10 review regressions on the IVM activation arms (catalog.py).

Four crash/lifecycle holes found by a line-by-line review of the r10 diff,
each pinned here against the fixed behavior:

1. A DAG downstream built with ``emit_changes=True`` must keep emitting on
   EVERY activation — a non-emitting re-activation used to consume view
   seqs silently, punching a permanent gap into the out log that a later
   emitting activation papered over (fold(out) returned stale images with
   no error). The emission choice is now persisted in the root and
   validated like the join arm's ``_n_buckets``.
2. Join-arm init completion used to be gated on ``isdir(view_log)`` — a
   directory Spark creates BEFORE the v0 write commits. A crash mid-write
   was mistaken for completed init: offsets already advanced, partial or
   empty base adopted, keys silently lost. Now a marker written last gates
   init; committed pre-marker roots are adopted via ``view/_SUCCESS``.
3. The aggregate arm's pre-marker adoption only required the ``agg``
   generation — but ``ivm_log_init`` publishes agg first, then the
   ``sup_<col>`` tables, so a crash between the publishes left a root that
   adoption wedged permanently (every append dies on the missing support
   generation). Adoption now requires EVERY state table's generation and
   clears half-published roots for a clean re-init.
4. The aggregate arm's fire-before-write guard only rejected ``__bucket``;
   a source column named ``__g``/``__k``/``__gbucket``/``__mult`` passed
   init and wedged on the first maintenance batch — after the root and
   checkpoint offsets existed.
"""

import pytest as _pytest_tier

# Slow tier (VERDICT r13 item 1): crash/lifecycle sweeps over the IVM
# activation arms — multi-minute file; deselected from the default fast
# tier by tests/conftest.py, run via SPARK_GRAFT_RUN_SLOW=1 or -m slow.
pytestmark = _pytest_tier.mark.slow

import os
import shutil

import pytest
from pyspark.sql import functions as F

from dbt_decodable_spark.catalog import CatalogError, Engine
from dbt_decodable_spark.schema import StreamSchema
from dbt_decodable_spark.streaming.changelog import fold_last_image

FACT_DDL = "pk long, fk long, qty long, ts long, deleted boolean"
DIM_DDL = "dk long, name string, tier long, ts long, deleted boolean"


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )


def _mk_engine(spark, tmp_path, ns):
    eng = Engine(spark, namespace=ns, warehouse_dir=str(tmp_path / "wh"))
    os.makedirs(eng.warehouse_dir, exist_ok=True)
    return eng


def _mk_join(spark, tmp_path, ns, f1, d1, with_rollup=False):
    eng = _mk_engine(spark, tmp_path, ns)
    eng.create_stream(
        "fact",
        schema=StreamSchema.from_spark(
            spark.createDataFrame(f1, FACT_DDL).schema, primary_key=["pk"]
        ),
        data=spark.createDataFrame(f1, FACT_DDL),
    )
    eng.create_stream(
        "dim",
        schema=StreamSchema.from_spark(
            spark.createDataFrame(d1, DIM_DDL).schema, primary_key=["dk"]
        ),
        data=spark.createDataFrame(d1, DIM_DDL),
    )
    eng.create_pipeline(
        "enriched",
        f"select f.*, d.name as dim_name, d.tier as dim_tier "
        f"from {ns}__fact f left join {ns}__dim d on f.fk = d.dk",
        activate=False,
    )
    if with_rollup:
        eng.create_pipeline(
            "rollup",
            f"select dim_tier, count(*) as n_rows, sum(qty) as sum_qty, "
            f"min(qty) as min_qty "
            f"from {ns}__enriched group by dim_tier",
            activate=False,
        )
    return eng


def _join_want(spark, f_rows, d_rows):
    from dbt_decodable_spark.operators.ivm_join import (
        JoinViewSpec,
        compute_join_view,
    )

    spec = JoinViewSpec(
        fact_keys=("pk",), fk_cols=("fk",), dim_keys=("dk",),
        dim_payload={"dim_name": "name", "dim_tier": "tier"},
    )
    ff = fold_last_image(
        spark.createDataFrame(f_rows, FACT_DDL), ["pk"],
        [F.col("ts"), F.col("pk")],
    )
    dd = fold_last_image(
        spark.createDataFrame(d_rows, DIM_DDL), ["dk"],
        [F.col("ts"), F.col("dk")],
    )
    return _rows(compute_join_view(ff, dd, spec, "deleted", "deleted"))


F1 = [(1, 10, 5, 1, False), (2, 20, 7, 1, False), (3, 20, 9, 1, False)]
D1 = [(10, "a", 1, 1, False), (20, "b", 2, 1, False)]


class TestEmitFlagPersisted:
    def _activate(self, eng, **kw):
        eng.activate_pipeline_dag_incremental(
            "rollup", "enriched",
            fact_order=["ts"], dim_order=["ts"],
            fact_delete_col="deleted", dim_delete_col="deleted",
            n_buckets=4, **kw,
        )

    def test_non_emitting_reactivation_raises_not_gaps(self, spark, tmp_path):
        """An emit-enabled root must reject a non-emitting activation —
        the old behavior silently consumed view seqs without emitting
        (a permanent, undetectable gap in the out log)."""
        eng = _mk_join(spark, tmp_path, "r10e", F1, D1, with_rollup=True)
        try:
            self._activate(eng, emit_changes=True)
            f2 = [(4, 10, 1, 2, False)]
            spark.createDataFrame(f2, FACT_DDL).write.mode("append").parquet(
                eng.streams["r10e__fact"].path
            )
            eng.refresh_stream("fact")
            with pytest.raises(CatalogError, match="keep emitting"):
                self._activate(eng)  # emit_changes defaults to False
            # the rejected activation consumed nothing: an emitting
            # re-activation still sees the pending change, and the out log
            # folds to the live rollup (no gap)
            self._activate(eng, emit_changes=True)
            folded = (
                fold_last_image(
                    eng.read_pipeline_changes("rollup"),
                    ["dim_tier"], [F.col("__seq")],
                )
                .filter(~F.col("__deleted"))
                .drop("__seq", "__deleted")
            )
            assert _rows(folded) == _rows(eng.read_stream("rollup"))
        finally:
            eng.cleanup()

    def test_pre_flag_root_is_inferred_and_pinned(self, spark, tmp_path):
        """A root initialized before the flag existed carries no
        _emit_changes record — the activation infers it from the out log's
        presence, persists the answer, and enforces it from then on."""
        eng = _mk_join(spark, tmp_path, "r10f", F1, D1, with_rollup=True)
        try:
            self._activate(eng, emit_changes=True)
            droot = os.path.join(eng.warehouse_dir, "_ivmd_r10f__rollup")
            os.remove(os.path.join(droot, "_emit_changes"))  # legacy root
            with pytest.raises(CatalogError, match="keep emitting"):
                self._activate(eng)
            with open(os.path.join(droot, "_emit_changes")) as fh:
                assert fh.read().strip() == "1"
        finally:
            eng.cleanup()

    def test_non_emitting_root_still_rejects_late_enable(self, spark, tmp_path):
        eng = _mk_join(spark, tmp_path, "r10g", F1, D1, with_rollup=True)
        try:
            self._activate(eng)
            with pytest.raises(CatalogError, match="FIRST activation"):
                self._activate(eng, emit_changes=True)
            self._activate(eng)  # staying non-emitting is fine
        finally:
            eng.cleanup()


class TestJoinInitMarker:
    def _activate(self, eng, **kw):
        eng.activate_pipeline_join_incremental(
            "enriched", fact_order=["ts"], dim_order=["ts"],
            fact_delete_col="deleted", dim_delete_col="deleted",
            n_buckets=4, **kw,
        )

    def test_crash_mid_v0_write_redoes_init(self, spark, tmp_path):
        """A root whose v0 write never committed (view dir without
        _SUCCESS, no marker, offsets already advanced) is re-initialized —
        the old isdir gate adopted the broken base and silently lost every
        key the crash cut off."""
        eng = _mk_join(spark, tmp_path, "r10j", F1, D1)
        try:
            self._activate(eng)
            root = os.path.join(eng.warehouse_dir, "_ivmj_r10j__enriched")
            # simulate the crash state: marker absent, v0 uncommitted
            # (partial part files), checkpoints already advanced
            os.remove(os.path.join(root, "_init_done"))
            view = os.path.join(root, "view")
            os.remove(os.path.join(view, "_SUCCESS"))
            for d in os.listdir(view):
                if d.startswith("__bucket="):
                    shutil.rmtree(os.path.join(view, d))
                    break  # a PARTIAL base: some buckets written, some not
            self._activate(eng)
            assert _rows(eng.read_stream("enriched")) == _join_want(spark, F1, D1)
        finally:
            eng.cleanup()

    def test_committed_pre_marker_root_is_adopted(self, spark, tmp_path):
        """A pre-marker root whose v0 COMMITTED must be adopted, not
        re-initialized — its deltas' __seq values outrank a fresh v0, so a
        re-init would let stale delta images out-fold the recomputed
        snapshot."""
        eng = _mk_join(spark, tmp_path, "r10k", F1, D1)
        try:
            self._activate(eng)
            f2 = [(2, 10, 8, 2, False)]  # an update, landing as a delta
            spark.createDataFrame(f2, FACT_DDL).write.mode("append").parquet(
                eng.streams["r10k__fact"].path
            )
            eng.refresh_stream("fact")
            self._activate(eng)
            root = os.path.join(eng.warehouse_dir, "_ivmj_r10k__enriched")
            os.remove(os.path.join(root, "_init_done"))  # legacy root
            self._activate(eng)
            assert os.path.exists(os.path.join(root, "_init_done"))
            assert _rows(eng.read_stream("enriched")) == _join_want(
                spark, F1 + f2, D1
            )
        finally:
            eng.cleanup()

    def test_uncommitted_base_with_deltas_raises(self, spark, tmp_path):
        """Deltas over a headless base (an old-code crash that later
        activations appended onto) are unrecoverable in place — the
        activation must say so instead of silently re-initializing under
        the stranded delta seqs."""
        eng = _mk_join(spark, tmp_path, "r10l", F1, D1)
        try:
            self._activate(eng)
            f2 = [(4, 10, 1, 2, False)]
            spark.createDataFrame(f2, FACT_DDL).write.mode("append").parquet(
                eng.streams["r10l__fact"].path
            )
            eng.refresh_stream("fact")
            self._activate(eng)  # lands a fact delta + a view delta
            root = os.path.join(eng.warehouse_dir, "_ivmj_r10l__enriched")
            os.remove(os.path.join(root, "_init_done"))
            os.remove(os.path.join(root, "view", "_SUCCESS"))
            with pytest.raises(CatalogError, match="delete the root"):
                self._activate(eng)
        finally:
            eng.cleanup()


SRC_DDL = "pk long, grp string, val long, ts long"


def _mk_agg(spark, tmp_path, ns, rows, ddl=SRC_DDL, sql_cols=None):
    eng = _mk_engine(spark, tmp_path, ns)
    src = spark.createDataFrame(rows, ddl)
    eng.create_stream(
        "src",
        schema=StreamSchema.from_spark(src.schema, primary_key=["pk"]),
        data=src,
    )
    eng.create_pipeline(
        "agg",
        sql_cols
        or (
            f"select grp, count(*) as n, sum(val) as sum_val, "
            f"min(val) as min_val from {ns}__src group by grp"
        ),
        activate=False,
    )
    return eng


ROWS1 = [(i, "g%d" % (i % 3), i * 10, 1) for i in range(9)]


def _agg_want(spark, all_rows):
    folded = fold_last_image(
        spark.createDataFrame(all_rows, SRC_DDL), ["pk"],
        [F.col("ts"), F.col("pk")],
    )
    return _rows(
        folded.groupBy("grp").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("val").alias("sum_val"),
            F.min("val").alias("min_val"),
        )
    )


class TestAggAdoptionRequiresAllTables:
    def test_half_published_root_reinits_not_wedges(self, spark, tmp_path):
        """agg generation committed, support table's missing (a crash
        between ivm_log_init's per-table publishes): the old adoption
        wrote the marker and every later batch died on
        _latest_gen(sup_val) — now the root is cleared and re-initialized,
        and the view is correct."""
        eng = _mk_agg(spark, tmp_path, "r10m", ROWS1)
        try:
            eng.activate_pipeline_incremental("agg", order=["ts"])
            root = os.path.join(eng.warehouse_dir, "_ivm_r10m__agg")
            os.remove(os.path.join(root, "_init_done"))
            shutil.rmtree(os.path.join(root, "sup_val"))  # the crash state
            rows2 = [(0, "g9", 5, 2), (100, "g9", 7, 2)]
            spark.createDataFrame(rows2, SRC_DDL).write.mode("append").parquet(
                eng.streams["r10m__src"].path
            )
            eng.refresh_stream("src")
            eng.activate_pipeline_incremental("agg", order=["ts"])
            got = _rows(eng.read_stream("agg"))
            assert got == _agg_want(spark, ROWS1 + rows2)
        finally:
            eng.cleanup()

    def test_complete_pre_marker_root_still_adopted(self, spark, tmp_path):
        """A fully-published pre-marker root keeps its adoption path: no
        re-init (the generation set is untouched), correct maintenance."""
        import glob as _glob

        eng = _mk_agg(spark, tmp_path, "r10n", ROWS1)
        try:
            eng.activate_pipeline_incremental("agg", order=["ts"])
            root = os.path.join(eng.warehouse_dir, "_ivm_r10n__agg")
            gens_before = sorted(_glob.glob(os.path.join(root, "agg", "v=*")))
            os.remove(os.path.join(root, "_init_done"))
            eng.activate_pipeline_incremental("agg", order=["ts"])
            assert os.path.exists(os.path.join(root, "_init_done"))
            assert sorted(_glob.glob(os.path.join(root, "agg", "v=*"))) == (
                gens_before
            ), "adoption must not republish generation 0"
            assert _rows(eng.read_stream("agg")) == _agg_want(spark, ROWS1)
        finally:
            eng.cleanup()


class SimulatedCrash(RuntimeError):
    pass


class _CrashPlan:
    """Raise at the k-th durable-write call — enumerating k sweeps every
    between-step crash point of an init sequence."""

    def __init__(self, crash_at):
        self.crash_at = crash_at
        self.n = 0

    def tick(self):
        self.n += 1
        if self.crash_at is not None and self.n == self.crash_at:
            raise SimulatedCrash(f"simulated crash at write #{self.n}")

    def wrap(self, fn):
        def wrapped(*a, **kw):
            self.tick()
            return fn(*a, **kw)

        return wrapped


def _inject(monkeypatch, plan):
    """Instrument every durable-write primitive the activation arms use.
    write_hash_partitioned/append_delta are imported at call time inside
    the activation functions, so patching their home module reaches them;
    _advance_stream_offsets/_write_atomic/_publish_gen are module globals
    at their call sites."""
    from dbt_decodable_spark import catalog as cat
    from dbt_decodable_spark.operators import ivm_dag as idg
    from dbt_decodable_spark.operators import ivm_log as il
    from dbt_decodable_spark.streaming import changelog as cl

    monkeypatch.setattr(cat, "_advance_stream_offsets",
                        plan.wrap(cat._advance_stream_offsets))
    monkeypatch.setattr(cat, "_write_atomic", plan.wrap(cat._write_atomic))
    monkeypatch.setattr(cl, "write_hash_partitioned",
                        plan.wrap(cl.write_hash_partitioned))
    monkeypatch.setattr(cl, "append_delta", plan.wrap(cl.append_delta))
    monkeypatch.setattr(il, "_publish_gen", plan.wrap(il._publish_gen))
    monkeypatch.setattr(idg, "_write_floor", plan.wrap(idg._write_floor))


class TestInitCrashSweep:
    """Fault-injection sweep: crash the FIRST activation at every durable
    write boundary in turn, then re-activate cleanly and require the exact
    declarative recompute — the 'crash mid-init redoes it' contract all
    three arms claim, proven at every point instead of the two
    hand-picked ones."""

    def test_join_arm_every_init_crash_point_recovers(
        self, spark, tmp_path, monkeypatch
    ):
        k = 1
        while True:
            eng = _mk_join(spark, tmp_path / f"j{k}", f"cj{k}", F1, D1)
            try:
                plan = _CrashPlan(k)
                with monkeypatch.context() as mp:
                    _inject(mp, plan)
                    try:
                        eng.activate_pipeline_join_incremental(
                            "enriched", fact_order=["ts"], dim_order=["ts"],
                            fact_delete_col="deleted",
                            dim_delete_col="deleted", n_buckets=4,
                        )
                        crashed = False
                    except SimulatedCrash:
                        crashed = True
                # recovery: a clean re-activation must land the exact view
                eng.activate_pipeline_join_incremental(
                    "enriched", fact_order=["ts"], dim_order=["ts"],
                    fact_delete_col="deleted", dim_delete_col="deleted",
                    n_buckets=4,
                )
                assert _rows(eng.read_stream("enriched")) == _join_want(
                    spark, F1, D1
                ), f"crash point {k} did not recover"
            finally:
                eng.cleanup()
            if not crashed:
                assert k > 5, "sweep ended before reaching the init writes"
                break
            k += 1

    def test_agg_arm_every_init_crash_point_recovers(
        self, spark, tmp_path, monkeypatch
    ):
        k = 1
        while True:
            eng = _mk_agg(spark, tmp_path / f"a{k}", f"ca{k}", ROWS1)
            try:
                plan = _CrashPlan(k)
                with monkeypatch.context() as mp:
                    _inject(mp, plan)
                    try:
                        eng.activate_pipeline_incremental("agg", order=["ts"])
                        crashed = False
                    except SimulatedCrash:
                        crashed = True
                eng.activate_pipeline_incremental("agg", order=["ts"])
                assert _rows(eng.read_stream("agg")) == _agg_want(
                    spark, ROWS1
                ), f"crash point {k} did not recover"
            finally:
                eng.cleanup()
            if not crashed:
                assert k > 4, "sweep ended before reaching the init writes"
                break
            k += 1

    def test_dag_arm_every_init_crash_point_recovers(
        self, spark, tmp_path, monkeypatch
    ):
        """The full two-stage DAG with emission enabled — the longest init
        sequence (join init + downstream init + out-log init image + flag +
        marker). Every crash point must recover to fold(out) == rollup."""
        k = 1
        while True:
            eng = _mk_join(
                spark, tmp_path / f"d{k}", f"cd{k}", F1, D1, with_rollup=True
            )
            try:
                plan = _CrashPlan(k)

                def activate():
                    eng.activate_pipeline_dag_incremental(
                        "rollup", "enriched",
                        fact_order=["ts"], dim_order=["ts"],
                        fact_delete_col="deleted", dim_delete_col="deleted",
                        n_buckets=4, emit_changes=True,
                    )

                with monkeypatch.context() as mp:
                    _inject(mp, plan)
                    try:
                        activate()
                        crashed = False
                    except SimulatedCrash:
                        crashed = True
                activate()
                live = _rows(eng.read_stream("rollup"))
                folded = (
                    fold_last_image(
                        eng.read_pipeline_changes("rollup"),
                        ["dim_tier"], [F.col("__seq")],
                    )
                    .filter(~F.col("__deleted"))
                    .drop("__seq", "__deleted")
                )
                assert _rows(folded) == live, f"crash point {k}: out-log gap"
            finally:
                eng.cleanup()
            if not crashed:
                assert k > 8, "sweep ended before reaching the init writes"
                break
            k += 1


class TestChangeLogCompactionSemantics:
    """Direct unit tests of ``compact_change_log`` over hand-built logs —
    the two holes a review found in its first cut, pinned:

    1. The floor must PARTITION the log by sequence. A retained delta may
       hold rows below a max-based floor (append_delta's commute contract
       allows out-of-order seqs across files); folding past such a row
       would drop the tombstone that supersedes it — resurrecting the key.
    2. A late delta appended AFTER a compaction, whose rows sit below the
       committed floor, must fold into the next floor — a tag-keyed retry
       recognition deleted it unfolded when the floors coincided.
    """

    DDL = "k long, v string, __seq long, __deleted boolean"

    def _log(self, spark, tmp_path, batches):
        from dbt_decodable_spark.streaming.changelog import append_delta

        log = str(tmp_path / "log")
        os.makedirs(log, exist_ok=True)
        spark.createDataFrame([], self.DDL).write.mode("overwrite").parquet(log)
        for rows in batches:
            append_delta(spark, log, spark.createDataFrame(rows, self.DDL))
        return log

    def _fold(self, spark, log):
        from dbt_decodable_spark.streaming.changelog import list_deltas

        df = spark.read.parquet(*list_deltas(log))
        return _rows(
            fold_last_image(df, ["k"], [F.col("__seq")])
            .filter(~F.col("__deleted"))
            .drop("__seq", "__deleted")
        )

    def test_straddling_delta_blocks_unsafe_floor(self, spark, tmp_path):
        from dbt_decodable_spark.streaming.changelog import (
            compact_change_log,
            list_deltas,
        )

        # A: K2 tombstone at seq 5; C: K1 upsert at seq 1;
        # B: K2 upsert at seq 2 AND K3 at seq 10 — B straddles any floor
        # that would fold A, so upto_seq=5 must refuse (folding A would
        # drop K2's tombstone while B still holds K2's seq-2 upsert)
        log = self._log(
            spark, tmp_path,
            [
                [(2, "dead", 5, True)],
                [(1, "a", 1, False)],
                [(2, "old", 2, False), (3, "c", 10, False)],
            ],
        )
        before = self._fold(spark, log)
        assert all(r[0] != 2 for r in before), "K2 is deleted pre-compaction"
        out = compact_change_log(spark, log, ["k"], upto_seq=5)
        assert out["floor"] is None, "no seq-partitioning floor ≤ 5 exists"
        assert self._fold(spark, log) == before
        # unbounded: everything folds, K2 stays gone, K1/K3 live
        out = compact_change_log(spark, log, ["k"])
        assert out["floor"] == 10
        assert len(list_deltas(log)) == 1
        assert self._fold(spark, log) == before

    def test_late_low_seq_delta_survives_second_compaction(
        self, spark, tmp_path
    ):
        from dbt_decodable_spark.streaming.changelog import (
            append_delta,
            compact_change_log,
            list_deltas,
        )

        log = self._log(
            spark, tmp_path,
            [
                [(1, "a", 5, False)],
                [(2, "b", 3, False)],
            ],
        )
        assert compact_change_log(spark, log, ["k"])["floor"] == 5
        # a replay-window straggler lands BELOW the committed floor
        append_delta(
            spark, log,
            spark.createDataFrame([(9, "late", 4, False)], self.DDL),
        )
        out = compact_change_log(spark, log, ["k"])
        assert out["floor"] == 5 and out["live_rows"] == 3
        assert len(list_deltas(log)) == 1
        got = self._fold(spark, log)
        assert (9, "late") in got, "the late delta must fold in, not vanish"
        assert got == [(1, "a"), (2, "b"), (9, "late")]

    def test_null_delete_flag_is_live(self, spark, tmp_path):
        from dbt_decodable_spark.streaming.changelog import (
            compact_change_log,
            list_deltas,
        )

        log = self._log(
            spark, tmp_path,
            [
                [(1, "a", 1, None)],  # NULL flag = not a delete (module
                [(2, "b", 2, False)],  # convention: coalesce to False)
            ],
        )
        out = compact_change_log(spark, log, ["k"])
        assert out["live_rows"] == 2
        got = sorted(
            r["k"] for r in spark.read.parquet(*list_deltas(log)).collect()
        )
        assert got == [1, 2]


class TestCommitProtocolHardening:
    """Review findings in the pre-existing storage layer, pinned."""

    def test_success_marker_required_loudly(self, spark, tmp_path):
        """Every commit protocol here treats _SUCCESS as proof of commit
        and sweeps unmarked dirs as crash debris — on a cluster with
        success markers disabled that silently destroys committed data,
        so the first stage write must fail loudly instead."""
        from dbt_decodable_spark.operators.versions import (
            require_success_marker,
        )
        from dbt_decodable_spark.streaming.changelog import append_delta

        d = tmp_path / "stage"
        d.mkdir()
        with pytest.raises(RuntimeError, match="marksuccessfuljobs"):
            require_success_marker(str(d))
        assert not d.exists(), "the unprovable stage is cleaned up"
        # end-to-end: disable the marker, the append refuses to commit
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        key = "mapreduce.fileoutputcommitter.marksuccessfuljobs"
        old = hconf.get(key)
        try:
            hconf.set(key, "false")
            with pytest.raises(RuntimeError, match="marksuccessfuljobs"):
                append_delta(
                    spark, str(tmp_path / "log"),
                    spark.createDataFrame([(1,)], "k long"),
                )
        finally:
            hconf.set(key, old if old is not None else "true")
        from dbt_decodable_spark.streaming.changelog import list_deltas

        assert list_deltas(str(tmp_path / "log")) == []

    def test_strict_read_merged_survives_widen_gap(self, spark, tmp_path):
        """Pending deltas written BEFORE widen_snapshot_schema lack the
        new column; the default (strict) read must NULL-fill it like
        compaction does instead of erroring until the next compaction —
        but a delta missing a KEY column still fails loudly."""
        from dbt_decodable_spark.streaming.changelog import (
            append_delta,
            read_merged,
            widen_snapshot_schema,
            write_hash_partitioned,
        )

        snap = str(tmp_path / "snap")
        write_hash_partitioned(
            spark.createDataFrame([(1, "a", 1)], "k long, v string, ts long"),
            snap, ["k"], n_buckets=2,
        )
        append_delta(
            spark, snap,
            spark.createDataFrame([(2, "b", 2)], "k long, v string, ts long"),
        )  # a pre-widen delta
        widen_snapshot_schema(
            spark, snap, {"extra": "string"}, ["k"], n_buckets=2,
        )
        got = _rows(
            read_merged(spark, snap, ["k"], [F.col("ts"), F.col("k")])
        )
        assert got == [(1, "a", 1, None), (2, "b", 2, None)]
        # key-less delta: never NULL-fill the fold key
        import shutil as _sh

        bad = str(tmp_path / "badlog")
        write_hash_partitioned(
            spark.createDataFrame([(1, "a", 1)], "k long, v string, ts long"),
            bad, ["k"], n_buckets=2,
        )
        deltas_dir = bad + ".__deltas__"
        os.makedirs(deltas_dir, exist_ok=True)
        stage = os.path.join(deltas_dir, "delta-00000000")
        spark.createDataFrame([("x", 9)], "v string, ts long").write.parquet(
            stage
        )
        with pytest.raises(Exception, match="key column"):
            read_merged(spark, bad, ["k"], [F.col("ts"), F.col("k")]).collect()
        _sh.rmtree(deltas_dir)

    def test_null_partition_expr_rejected(self, spark, tmp_path):
        """A custom partition_expr that yields NULL bucket ids would write
        __HIVE_DEFAULT_PARTITION__ directories no merge or compaction can
        address (isin never matches NULL) — both the writer and the merge
        must refuse up front."""
        from dbt_decodable_spark.streaming.changelog import (
            merge_into_hash_partitioned,
            write_hash_partitioned,
        )

        df = spark.createDataFrame(
            [(1, 10, 1), (None, 20, 1)], "k long, v long, ts long"
        )
        with pytest.raises(ValueError, match="NULL bucket"):
            write_hash_partitioned(
                df, str(tmp_path / "s1"), ["k"], n_buckets=2,
                partition_expr=F.col("k") % 2,
            )
        snap = str(tmp_path / "s2")
        write_hash_partitioned(
            df.filter(F.col("k").isNotNull()), snap, ["k"], n_buckets=2,
            partition_expr=F.coalesce(F.col("k") % 2, F.lit(-1)),
        )
        with pytest.raises(ValueError, match="NULL bucket"):
            merge_into_hash_partitioned(
                spark, snap, df, ["k"], [F.col("ts"), F.col("k")],
                n_buckets=2, partition_expr=F.col("k") % 2,
            )

    def test_purge_string_id_column_with_int_ids(self, spark, tmp_path):
        """The kept-filter must compare at the COLUMN's type (anti-join
        against the cast doomed frame): a raw isin() coerced a string id
        column to int, turned 'abc' into NULL, dropped it from kept and
        aborted the purge with a count mismatch on every run."""
        from dbt_decodable_spark.operators.maintenance import (
            delete_rows_partitioned,
        )

        path = str(tmp_path / "t")
        spark.createDataFrame(
            [("4", "en", 1), ("abc", "en", 2), ("7", "de", 3)],
            "doc_id string, lang string, n long",
        ).write.partitionBy("lang").parquet(path)
        deleted = delete_rows_partitioned(spark, path, "lang", "doc_id", [4])
        assert deleted == {"en": 1}
        left = sorted(
            r["doc_id"] for r in spark.read.parquet(path).collect()
        )
        assert left == ["7", "abc"], "non-castable ids must survive"

    def test_purge_refreshes_zonemap(self, spark, tmp_path):
        """Every maintenance writer refreshes the pruning manifest it
        invalidated; the purge path didn't — after it, the manifest's
        inventory pointed at vanished files (verify_inventory=False
        readers error; default readers lose pruning forever)."""
        from dbt_decodable_spark.operators.maintenance import (
            delete_rows_partitioned,
        )
        from dbt_decodable_spark.operators.zonemap import (
            _list_data_files,
            read_pruned,
            write_zonemap,
        )

        path = str(tmp_path / "t")
        spark.createDataFrame(
            [(i, "en" if i % 2 else "de", i * 10) for i in range(20)],
            "doc_id long, lang string, n long",
        ).write.partitionBy("lang").parquet(path)
        write_zonemap(spark, path, ["n"])
        delete_rows_partitioned(spark, path, "lang", "doc_id", [3, 5])
        import json as _json

        with open(os.path.join(path, "_zonemap.json")) as fh:
            manifest = _json.load(fh)
        assert sorted(tuple(e) for e in manifest["inventory"]) == sorted(
            (n, s) for n, s in _list_data_files(path)
        ), "manifest inventory must match the rewritten files"
        df, stats = read_pruned(
            spark, path, [("n", 100, 120)], verify_inventory=False
        )
        got = sorted(r["doc_id"] for r in df.collect())
        assert got == [10, 11, 12]


class TestDagRecoveryAndGuards:
    """Second review pass over the DAG core, pinned."""

    def test_engine_rebuild_preserves_emission(self, spark, tmp_path):
        """rebuild_pipeline_downstream honors the root's persisted
        emission choice: the out log (destroyed with the root) is
        re-seeded with the new floor image and fold(out) == rollup holds
        through the recovery and the next emitting activation."""
        from dbt_decodable_spark.streaming.changelog import compact_and_vacuum

        eng = _mk_join(spark, tmp_path, "r10y", F1, D1, with_rollup=True)

        def activate():
            eng.activate_pipeline_dag_incremental(
                "rollup", "enriched",
                fact_order=["ts"], dim_order=["ts"],
                fact_delete_col="deleted", dim_delete_col="deleted",
                n_buckets=4, emit_changes=True,
            )

        def fold_out():
            ch = eng.read_pipeline_changes("rollup")
            return _rows(
                fold_last_image(ch, ["dim_tier"], [F.col("__seq")])
                .filter(~F.col("__deleted"))
                .drop("__seq", "__deleted")
            )

        try:
            activate()
            # advance ONLY the join stage, then compact its view log —
            # the downstream never consumed those deltas → lag
            f2 = [(4, 10, 1, 2, False)]
            spark.createDataFrame(f2, FACT_DDL).write.mode("append").parquet(
                eng.streams["r10y__fact"].path
            )
            eng.refresh_stream("fact")
            eng.activate_pipeline_join_incremental(
                "enriched", fact_order=["ts"], dim_order=["ts"],
                fact_delete_col="deleted", dim_delete_col="deleted",
                n_buckets=4, compact=False,
            )
            jroot = os.path.join(eng.warehouse_dir, "_ivmj_r10y__enriched")
            compact_and_vacuum(
                spark, os.path.join(jroot, "view"), ["pk"],
                [F.col("__seq")], 4,
            )
            from dbt_decodable_spark.operators.ivm_dag import (
                DownstreamLagError,
            )

            with pytest.raises(DownstreamLagError):
                activate()
            eng.rebuild_pipeline_downstream("rollup", "enriched")
            assert fold_out() == _rows(eng.read_stream("rollup"))
            # and the rebuilt root keeps emitting
            f3 = [(5, 20, 9, 3, False)]
            spark.createDataFrame(f3, FACT_DDL).write.mode("append").parquet(
                eng.streams["r10y__fact"].path
            )
            eng.refresh_stream("fact")
            activate()
            assert fold_out() == _rows(eng.read_stream("rollup"))
        finally:
            eng.cleanup()

    def test_duplicate_output_alias_rejected(self):
        from dbt_decodable_spark.operators.ivm import agg_spec_from_sql

        with pytest.raises(ValueError, match="duplicate"):
            agg_spec_from_sql(
                "select g, sum(a) as x, sum(b) as x from t group by g"
            )

    def test_dag_rejects_mult_view_column(self, spark, tmp_path):
        """__mult is the contributions multiplicity the maintenance
        stacks over the view image — a sink column of that name would be
        silently overwritten with ±1; the DAG guard must reject it before
        any write (it passed the join arm's own reserved set)."""
        ddl = "pk long, fk long, `__mult` long, ts long, deleted boolean"
        f1 = [(1, 10, 5, 1, False)]
        d1 = [(10, "a", 1, 1, False)]
        eng = _mk_engine(spark, tmp_path, "r10z")
        try:
            eng.create_stream(
                "fact",
                schema=StreamSchema.from_spark(
                    spark.createDataFrame(f1, ddl).schema, primary_key=["pk"]
                ),
                data=spark.createDataFrame(f1, ddl),
            )
            eng.create_stream(
                "dim",
                schema=StreamSchema.from_spark(
                    spark.createDataFrame(d1, DIM_DDL).schema,
                    primary_key=["dk"],
                ),
                data=spark.createDataFrame(d1, DIM_DDL),
            )
            eng.create_pipeline(
                "enriched",
                "select f.*, d.tier as dim_tier "
                "from r10z__fact f left join r10z__dim d on f.fk = d.dk",
                activate=False,
            )
            eng.create_pipeline(
                "rollup",
                "select dim_tier, count(*) as n "
                "from r10z__enriched group by dim_tier",
                activate=False,
            )
            with pytest.raises(CatalogError, match="reserved"):
                eng.activate_pipeline_dag_incremental(
                    "rollup", "enriched",
                    fact_order=["ts"], dim_order=["ts"],
                )
            assert not os.path.exists(
                os.path.join(eng.warehouse_dir, "_ivmj_r10z__enriched")
            ), "guard must fire before any write"
        finally:
            eng.cleanup()


class TestAsofNullAndTieSemantics:
    """Review pass 3: the as-of joins must match merge_asof / LATERAL-<=
    semantics on NULLs and break same-timestamp ties deterministically."""

    L_DDL = "k long, ts timestamp, tag string"
    R_DDL = "k long, rts timestamp, v long"

    def _ts(self, s):
        import datetime

        return datetime.datetime.fromisoformat(s)

    def _run(self, spark, fn, left, right, **kw):
        from dbt_decodable_spark.operators import asof

        ldf = spark.createDataFrame(left, self.L_DDL)
        rdf = spark.createDataFrame(right, self.R_DDL)
        out = getattr(asof, fn)(
            ldf, rdf, on="k", left_ts="ts", right_ts="rts",
            value_cols=["v"], **kw,
        )
        return {r["tag"]: r["v"] for r in out.collect()}

    @pytest.mark.parametrize("fn", ["asof_join", "asof_join_pandas"])
    def test_null_timestamp_quote_never_matches(self, spark, fn):
        """A NULL right_ts can never satisfy right_ts <= left_ts — the
        window path used to sort it FIRST (nulls-first) and return its
        values; the pandas path crashed outright in merge_asof."""
        got = self._run(
            spark, fn,
            left=[(1, self._ts("2026-01-02 00:00:00"), "probe")],
            right=[(1, None, 42)],
        )
        assert got == {"probe": None}

    @pytest.mark.parametrize("fn", ["asof_join", "asof_join_pandas"])
    def test_null_key_never_matches(self, spark, fn):
        got = self._run(
            spark, fn,
            left=[(None, self._ts("2026-01-02 00:00:00"), "probe")],
            right=[(None, self._ts("2026-01-01 00:00:00"), 9)],
        )
        assert got == {"probe": None}

    @pytest.mark.parametrize("fn", ["asof_join", "asof_join_pandas"])
    def test_null_left_ts_gets_null_values(self, spark, fn):
        got = self._run(
            spark, fn,
            left=[(1, None, "nullprobe"),
                  (1, self._ts("2026-01-02 00:00:00"), "probe")],
            right=[(1, self._ts("2026-01-01 00:00:00"), 7)],
        )
        assert got == {"nullprobe": None, "probe": 7}

    @pytest.mark.parametrize("fn", ["asof_join", "asof_join_pandas"])
    def test_tiebreak_picks_greatest(self, spark, fn):
        """Two quotes at the SAME (key, ts): tiebreak_cols must pick the
        greatest deterministically (the window path was partition-order
        nondeterministic without it)."""
        t = self._ts("2026-01-01 00:00:00")
        got = self._run(
            spark, fn,
            left=[(1, self._ts("2026-01-02 00:00:00"), "probe")],
            right=[(1, t, 1), (1, t, 2)],
            tiebreak_cols=["v"],
        )
        assert got == {"probe": 2}


class TestZonemapHardening:
    """Review pass 3 over the pruning layer: hidden-dir blind spots,
    rendering-sensitive bloom keys, NaN envelopes, same-size rewrites."""

    def test_hidden_dirs_excluded_from_inventory(self, spark, tmp_path):
        """A killed job's _temporary staging (non-hidden files under a
        hidden dir) must not enter the manifest or any pruned read —
        reading uncommitted duplicates is silent wrong data."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from dbt_decodable_spark.operators import zonemap as zm

        path = str(tmp_path / "t")
        spark.range(100).selectExpr("id", "id * 2 as v").write.parquet(path)
        zm.write_zonemap(spark, path, ["id"])
        staging = os.path.join(path, "_temporary", "0")
        os.makedirs(staging)
        pq.write_table(
            pa.table({"id": [999_999], "v": [0]}),
            os.path.join(staging, "part-uncommitted.parquet"),
        )
        assert all(
            "_temporary" not in n for n, _ in zm._list_data_files(path)
        )
        m = zm.refresh_zonemap_appended(spark, path)
        assert all("_temporary" not in e["file"] for e in m["files"])
        df, info = zm.read_pruned(spark, path, [("id", 0, 1_000_000)])
        assert df.filter(F.col("id") == 999_999).count() == 0

    def test_bloom_refuses_boolean_keys(self, spark, tmp_path):
        from dbt_decodable_spark.operators import zonemap as zm

        path = str(tmp_path / "t")
        spark.range(10).selectExpr("id", "id % 2 = 0 as flag").write.parquet(
            path
        )
        zm.write_zonemap(spark, path, ["id"])
        with pytest.raises(ValueError, match="boolean"):
            zm.add_bloom_sidecar(spark, path, "flag")

    def test_minmax_nan_is_spark_consistent(self, spark, tmp_path):
        """An all-NaN file's stored stats must not flip the global
        envelope with iteration order: min skips NaN (Spark: NaN sorts
        greatest), max is NaN iff any file holds one."""
        import math

        from dbt_decodable_spark.operators import zonemap as zm

        path = str(tmp_path / "t")
        spark.createDataFrame(
            [(float("nan"),)] * 5, "v double"
        ).repartition(1).write.parquet(path)
        spark.createDataFrame(
            [(1.0,), (2.0,)], "v double"
        ).repartition(1).write.mode("append").parquet(path)
        zm.write_zonemap(spark, path, ["v"])
        lo, hi = zm.minmax_from_zonemap(path, "v")
        assert lo == 1.0, "min must skip the all-NaN file"
        assert math.isnan(hi), "max must be NaN when any file holds one"

    def test_same_size_rewrite_is_restatted(self, spark, tmp_path):
        """(name, size) identity cannot see an in-place rewrite that
        preserves the byte count; entries now record mtime and the
        appended-refresh re-stats on a mismatch."""
        import time as _time

        import pyarrow as pa
        import pyarrow.parquet as pq

        from dbt_decodable_spark.operators import zonemap as zm

        path = str(tmp_path / "t")
        spark.createDataFrame(
            [(i,) for i in range(100)], "id long"
        ).repartition(1).write.parquet(path)
        zm.write_zonemap(spark, path, ["id"])
        (name, size), = zm._list_data_files(path)
        full = os.path.join(path, name)
        _time.sleep(0.02)
        # in-place rewrite with a shifted value range; if the byte count
        # happens to differ the size check catches it anyway — the mtime
        # arm is what this pins when sizes collide
        pq.write_table(
            pa.table({"id": pa.array(range(10_000, 10_100), pa.int64())}),
            full + ".tmp",
        )
        os.replace(full + ".tmp", full)
        # drop Hadoop's local-FS checksum sidecar, stale after the rewrite
        # (a test-harness artifact: HDFS/S3 keep no client-side .crc)
        crc = os.path.join(
            os.path.dirname(full), "." + os.path.basename(full) + ".crc"
        )
        if os.path.exists(crc):
            os.remove(crc)
        zm.refresh_zonemap_appended(spark, path)
        df, info = zm.read_pruned(spark, path, [("id", 10_050, 10_060)])
        assert df.count() == 11, "stale stats pruned the rewritten file"

    def test_sharded_write_refuses_nested_stray_data(self, spark, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from dbt_decodable_spark.operators import zonemap as zm

        path = str(tmp_path / "t")
        spark.createDataFrame(
            [(1, 10)], "id long, day long"
        ).write.partitionBy("day").parquet(path)
        os.makedirs(os.path.join(path, "staging"))
        pq.write_table(
            pa.table({"id": [99]}),
            os.path.join(path, "staging", "part-0.parquet"),
        )
        with pytest.raises(ValueError, match="outside any partition shard"):
            zm.write_zonemap_sharded(spark, path, ["id"])

    def test_sharded_prune_skips_hidden_roots(self, spark, tmp_path):
        from dbt_decodable_spark.operators import zonemap as zm

        path = str(tmp_path / "t")
        spark.createDataFrame(
            [(i, i % 2) for i in range(20)], "id long, day long"
        ).write.partitionBy("day").parquet(path)
        zm.write_zonemap_sharded(spark, path, ["id"])
        meta = os.path.join(path, "_spark_metadata")
        os.makedirs(meta)
        with open(os.path.join(meta, "0"), "w") as fh:
            fh.write('{"not": "parquet"}')
        report = zm.prune_files_sharded(path, [("id", 0, 100)])
        assert all("_spark_metadata" not in f for f in report["files"])
        got, _ = zm.read_pruned_sharded(spark, path, [("id", 0, 100)])
        assert got.count() == 20


class TestSamplingMixingHardening:
    """Review pass 4 over the sampling/packing/mixing/bloom family."""

    def test_importance_sample_fractional_weights(self, spark):
        """cast('long') truncated fractional weights — weight 0.9 at
        scale 1 kept NOTHING instead of ~90%; the decimal cross-multiply
        keeps the exact h < w/scale gate."""
        import hashlib

        from dbt_decodable_spark.operators.sampling import importance_sample

        rows = [(f"doc{i}", 0.9) for i in range(400)]
        df = spark.createDataFrame(rows, "doc_id string, w double")
        kept = {
            r["doc_id"]
            for r in importance_sample(df, "doc_id", "w", scale=1).collect()
        }
        want = {
            k
            for k, w in rows
            if int(hashlib.md5(k.encode()).hexdigest()[:6], 16) * 1
            < 16**6 * 0.9
        }
        assert kept == want and 0 < len(kept) < 400

    def test_importance_sample_huge_scale_no_overflow(self, spark):
        """h·scale wrapped 64-bit for scale ≥ ~2^39 (random keep/drop);
        decimal never wraps, and out-of-range scales raise."""
        from dbt_decodable_spark.operators.sampling import importance_sample

        df = spark.createDataFrame(
            [(f"doc{i}", 2**40) for i in range(50)], "doc_id string, w long"
        )
        # weight == scale → keep probability 1: every row survives
        assert importance_sample(df, "doc_id", "w", scale=2**40).count() == 50
        with pytest.raises(ValueError, match="scale"):
            importance_sample(df, "doc_id", "w", scale=10**15)
        with pytest.raises(ValueError, match="scale"):
            importance_sample(df, "doc_id", "w", scale=0)

    def test_deterministic_sample_keeps_null_keys_at_full_fraction(
        self, spark
    ):
        from dbt_decodable_spark.operators.sampling import (
            deterministic_sample,
            stratified_sample,
        )

        df = spark.createDataFrame(
            [("a", "en"), (None, "en"), ("b", "de")],
            "doc_id string, lang string",
        )
        assert deterministic_sample(df, "doc_id", 1.0).count() == 3
        got = stratified_sample(
            df, "lang", "doc_id", {"en": 1.0, "de": 1.0}
        ).count()
        assert got == 3

    def test_sql_stratified_filter_escapes_quotes(self):
        from dbt_decodable_spark.operators.sampling import (
            sql_stratified_filter,
        )

        frag = sql_stratified_filter("src", "doc_id", {"pe't": 0.5})
        assert "WHEN 'pe''t' THEN" in frag
        import duckdb

        con = duckdb.connect()
        con.sql("CREATE VIEW t AS SELECT 'pe''t' AS src, 'x' AS doc_id")
        con.sql(f"SELECT * FROM t WHERE {frag}")  # must parse

    def test_temperature_quotas_all_zero_weights(self, spark):
        """Every stratum weightless: a defined zero allocation, not NULL
        quotas (non-ANSI) or DIVIDE_BY_ZERO (ANSI)."""
        from dbt_decodable_spark.operators.mixing import temperature_quotas

        df = spark.createDataFrame(
            [("a", 0), ("b", 0)], "src string, n long"
        )
        got = temperature_quotas(df, "src", "n", budget=100)
        assert sorted((r["stratum"], r["quota"]) for r in got.collect()) == [
            ("a", 0), ("b", 0),
        ]

    def test_pack_by_budget_exact_past_double_precision(self, spark):
        """long/long is DOUBLE division in Spark: past 2^53 the coerced
        quotient misplaces boundary rows — BIGINT div is exact."""
        from dbt_decodable_spark.operators.packing import pack_by_budget

        big = 2**53 + 1
        df = spark.createDataFrame(
            [(1, big), (2, big)], "id long, w long"
        )
        got = {
            r["id"]: r["shard_id"]
            for r in pack_by_budget(df, "id", "w", budget=big).collect()
        }
        assert got == {1: 0, 2: 1}

    def test_bloom_duplicate_id_does_not_mask_seen_key(self, spark):
        """min(hit) folded per id alone: a seen key sharing an id with a
        fresh key inherited the fresh key's unset bit and skipped the
        exact check — folding per (id, key) keeps them apart."""
        from dbt_decodable_spark.operators.bloom import (
            build_bloom,
            check_membership,
        )

        hist = spark.createDataFrame([("seen",)], "key string")
        bloom = build_bloom(hist, "key")
        batch = spark.createDataFrame(
            [(1, "seen"), (1, "definitely-new-key")], "id long, key string"
        )
        got = {
            (r["id"], r["key"]): r["maybe_seen"]
            for r in check_membership(batch, bloom, "key", "id").collect()
        }
        assert got[(1, "seen")] == 1, "the seen key must route to the exact check"

    def test_bloom_large_filter_not_force_broadcast(self, spark, monkeypatch):
        """The explicit broadcast hint must respect the module's own
        2^27-bit line: past it, forcing the hint collects ~m/32 rows to
        the driver (the doc's 1-billion-bit example is ~500 MB) — the
        word table must join as a plain table and let Catalyst decide."""
        import dbt_decodable_spark.operators.bloom as bl
        from dbt_decodable_spark.operators.bloom import (
            build_bloom,
            check_membership,
        )

        hist = spark.createDataFrame([("k1",), ("k2",)], "key string")
        batch = spark.createDataFrame(
            [(1, "k1"), (2, "zzz")], "id long, key string"
        )
        calls: list[int] = []
        real_bc = bl.F.broadcast

        def spy(df):
            calls.append(1)
            return real_bc(df)

        with monkeypatch.context() as mp:
            mp.setattr(bl.F, "broadcast", spy)
            small = build_bloom(hist, "key", m_bits=1 << 16)
            got = {
                r["id"]: r["maybe_seen"]
                for r in check_membership(
                    batch, small, "key", "id", m_bits=1 << 16
                ).collect()
            }
            assert got[1] == 1 and got[2] == 0
            assert calls, "small filters keep the explicit broadcast hint"
            calls.clear()
            big = build_bloom(hist, "key", m_bits=1 << 28)
            got = {
                r["id"]: r["maybe_seen"]
                for r in check_membership(
                    batch, big, "key", "id", m_bits=1 << 28
                ).collect()
            }
            assert got[1] == 1 and got[2] == 0
            assert not calls, "past 2^27 bits the hint must not be forced"


class TestDedupHardening:
    """Review pass 5 over the dedup/graph core."""

    def test_exact_dedup_null_text_stays_singleton(self, spark):
        """md5(NULL) is NULL and groupBy merges NULL keys — 500 failed
        extractions used to collapse into one 'duplicate' cluster."""
        from dbt_decodable_spark.operators.dedup import exact_dedup

        df = spark.createDataFrame(
            [(1, "same"), (2, "same"), (3, None), (4, None)],
            "doc_id long, text string",
        )
        got = sorted(
            (r["doc_id"], r["n_copies"])
            for r in exact_dedup(df, "text", "doc_id").collect()
        )
        assert got == [(1, 2), (3, 1), (4, 1)]

    def test_paragraph_mode_drops_whitespace_segments(self, spark):
        from dbt_decodable_spark.operators.dedup import paragraph_rows

        df = spark.createDataFrame(
            [(1, "alpha beta\n\n \n\ngamma")], "doc_id long, text string"
        )
        segs = paragraph_rows(df, "doc_id", "text", seg_tokens=None).collect()
        assert len(segs) == 2, "the whitespace-only fragment is not a segment"

    def test_unknown_pair_method_raises(self, spark):
        from dbt_decodable_spark.operators.dedup import shingle_pairs_jaccard

        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        with pytest.raises(ValueError, match="unknown method"):
            shingle_pairs_jaccard(
                df, "doc_id", "text", threshold=0.5, method="invered"
            )

    def test_component_column_collision_raises(self, spark):
        from dbt_decodable_spark.operators.graph import dedup_by_components

        pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        df = spark.createDataFrame(
            [(1, 7), (2, 7)], "doc_id long, component long"
        )
        with pytest.raises(ValueError, match="component"):
            dedup_by_components(df, pairs, "doc_id")


class TestSimilarityHardening:
    """Review pass 6 over the ANN/clustering operators."""

    def test_zero_norm_vector_emits_no_threshold_pairs(self, spark):
        """cos(0⃗, x) is NaN and Spark's NaN compares GREATER than any
        threshold — one degenerate embedding used to pair with the whole
        corpus and suppress every higher-id document downstream."""
        from dbt_decodable_spark.operators.similarity import (
            threshold_join_chunked,
        )

        df = spark.createDataFrame(
            [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [1.0, 0.01])],
            "vec_id long, embedding array<double>",
        )
        pairs = threshold_join_chunked(df, threshold=0.9).collect()
        got = sorted((r["neighbor_id"], r["query_id"]) for r in pairs)
        assert got == [(2, 3)], "only the genuinely similar pair survives"

    def test_empty_query_set_returns_empty(self, spark):
        from dbt_decodable_spark.operators.similarity import brute_force_topk

        corpus = spark.createDataFrame(
            [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
        )
        empty_q = corpus.filter(F.col("vec_id") < 0)
        assert brute_force_topk(corpus, empty_q, k=3).count() == 0

    def test_string_ids_through_ivf_and_semantic_dedup(self, spark):
        """The mapInPandas schemas hard-coded `long` ids while the scorer
        deliberately supports string ids — an Arrow serialization crash."""
        from dbt_decodable_spark.operators.similarity import (
            ivf_assign,
            ivf_centroids,
            semantic_dedup,
        )

        df = spark.createDataFrame(
            [(f"d{i}", [float(i), 1.0]) for i in range(6)],
            "vec_id string, embedding array<double>",
        )
        cents = ivf_centroids(df, n_lists=2, stride=97)
        assigned = ivf_assign(df, cents)
        assert assigned.count() == 6
        clusters = semantic_dedup(df, n_lists=2, stride=97, threshold=0.999)
        assert clusters.count() >= 1

    def test_zero_norm_centroid_does_not_swallow_corpus(self, spark):
        """numpy argmax returns the first NaN index: a zero-norm centroid
        (NaN sims column) used to claim EVERY vector."""
        from dbt_decodable_spark.operators.similarity import ivf_assign

        cents = spark.createDataFrame(
            [(0, [0.0, 0.0]), (1, [1.0, 0.0])],
            "centroid_id long, centroid_vec array<double>",
        )
        df = spark.createDataFrame(
            [(i, [1.0, float(i) / 10]) for i in range(1, 5)],
            "vec_id long, embedding array<double>",
        )
        got = {r["vec_id"]: r["centroid_id"] for r in ivf_assign(df, cents).collect()}
        assert set(got.values()) == {1}, "the degenerate centroid wins nothing"

    def test_kmeans_seeds_fall_back_when_mod_misses(self, spark):
        from dbt_decodable_spark.operators.clustering import kmeans_fit

        # ids 1..5 with init_mod=61: no multiple of 61 — the seeding used
        # to come back empty and every row silently vanished
        df = spark.createDataFrame(
            [(i, [float(i), 1.0]) for i in range(1, 6)],
            "vec_id long, embedding array<double>",
        )
        cents, assigned = kmeans_fit(df, k=2, iters=1, init_mod=61)
        assert cents.count() == 2
        assert assigned.count() == 5


class TestAggReservedColumns:
    @pytest.mark.parametrize("bad", ["__g", "__k", "__gbucket", "__mult"])
    def test_state_machinery_names_rejected_before_write(
        self, spark, tmp_path, bad
    ):
        """A source column the ivm_log machinery stacks over must fire at
        activation entry — rejected only in the first maintenance batch, it
        would fire AFTER the root and checkpoint offsets existed."""
        ddl = f"pk long, grp string, `{bad}` long, ts long"
        rows = [(1, "a", 1, 1)]
        eng = _mk_agg(
            spark, tmp_path, "r10r", rows, ddl=ddl,
            sql_cols="select grp, count(*) as n from r10r__src group by grp",
        )
        try:
            with pytest.raises(CatalogError, match="reserved"):
                eng.activate_pipeline_incremental("agg", order=["ts"])
            root = os.path.join(eng.warehouse_dir, "_ivm_r10r__agg")
            assert not os.path.exists(root), "guard must fire before writes"
        finally:
            eng.cleanup()
