"""Incremental view maintenance (operators/ivm.py).

Ground truth is always a full recompute (`compute_agg_view`) over the merged
snapshot; the incremental path must match it exactly (integer columns, so no
float-reassociation noise) after every micro-batch — including deletes that
remove a group's current extreme, updates that move a row between groups,
NULL group keys, NULL aggregate values, tombstone resurrection, and stale
out-of-order batch rows. A hypothesis sweep drives randomized op sequences
through random micro-batch splits. A plan pin asserts the state-side joins
of a bucketed maintenance round run shuffle-free (the 100 TB cost model)."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F, types as T

from dbt_decodable_spark.operators.bucketing import (
    materialize_bucketed,
    scan_shuffle_free,
)
from dbt_decodable_spark.operators.ivm import (
    AggViewSpec,
    agg_spec_from_sql,
    change_pairs,
    check_invariants,
    compute_agg_view,
    init_state,
    maintain,
    read_view,
)
from dbt_decodable_spark.streaming.changelog import merge_changes_ordered

SCHEMA = T.StructType(
    [
        T.StructField("pk", T.LongType(), False),
        T.StructField("grp", T.StringType(), True),
        T.StructField("val", T.LongType(), True),
        T.StructField("price", T.LongType(), True),
        T.StructField("ts", T.LongType(), False),
        T.StructField("deleted", T.BooleanType(), True),
    ]
)

SPEC = AggViewSpec(
    group_cols=("grp",),
    count_star="n",
    sums={"sum_val": "val"},
    avgs={"avg_val": "val"},
    mins={"min_val": "val"},
    maxs={"max_price": "price"},
    count_distincts={"nd_val": "val"},
)

KEYS = ["pk"]
ORDER = ["ts"]


def _df(spark, rows):
    return spark.createDataFrame(
        [tuple(r) for r in rows], SCHEMA
    )


def _snap0(spark):
    return spark.createDataFrame([], SCHEMA)


def _rows(df):
    out = []
    for r in df.collect():
        t = []
        for v in r:
            t.append(round(v, 9) if isinstance(v, float) else v)
        out.append(tuple(t))
    return sorted(out, key=lambda t: tuple((v is None, v) for v in t))


def _assert_view_matches(snapshot, state, spec=SPEC):
    want = _rows(compute_agg_view(snapshot, spec, delete_col="deleted"))
    got = _rows(read_view(state, spec))
    assert got == want


def _step(snapshot, state, batch_rows, spark):
    batch = _df(spark, batch_rows)
    new_state = maintain(
        state, snapshot, batch, KEYS, ORDER, SPEC, delete_col="deleted"
    )
    new_snapshot = merge_changes_ordered(snapshot, batch, KEYS, ORDER)
    # truncate lineage between micro-batches (stands in for the state
    # persistence a real deployment does) — keeps multi-batch test chains
    # from re-executing the full join cascade per assertion
    new_state = type(new_state)(
        agg=new_state.agg.localCheckpoint(eager=True),
        supports={
            c: df.localCheckpoint(eager=True)
            for c, df in new_state.supports.items()
        },
    )
    return new_snapshot.localCheckpoint(eager=True), new_state


class TestIvmScenarios:
    def test_inserts_then_view_matches(self, spark):
        snap, state = _snap0(spark), init_state(_snap0(spark), SPEC, "deleted")
        snap, state = _step(
            snap,
            state,
            [
                (1, "a", 10, 5, 1, False),
                (2, "a", 20, 7, 2, False),
                (3, "b", None, 9, 3, False),
                (4, None, 4, None, 4, False),
            ],
            spark,
        )
        _assert_view_matches(snap, state)
        got = {r["grp"]: r.asDict() for r in read_view(state, SPEC).collect()}
        assert got["a"]["n"] == 2 and got["a"]["sum_val"] == 30
        assert got["b"]["sum_val"] is None and got["b"]["nd_val"] == 0
        assert got[None]["n"] == 1 and got[None]["max_price"] is None

    def test_delete_removes_extreme_and_group(self, spark):
        snap, state = _snap0(spark), init_state(_snap0(spark), SPEC, "deleted")
        snap, state = _step(
            snap,
            state,
            [
                (1, "a", 10, 5, 1, False),
                (2, "a", 20, 7, 2, False),
                (3, "b", 3, 1, 3, False),
            ],
            spark,
        )
        # delete the max-val row of 'a' and the only row of 'b'
        snap, state = _step(
            snap, state, [(2, "a", 20, 7, 10, True), (3, "b", 3, 1, 11, True)], spark
        )
        _assert_view_matches(snap, state)
        rows = {r["grp"]: r.asDict() for r in read_view(state, SPEC).collect()}
        assert set(rows) == {"a"}  # group b vanished
        assert rows["a"]["min_val"] == 10 and rows["a"]["max_price"] == 5
        assert rows["a"]["sum_val"] == 10 and rows["a"]["nd_val"] == 1
        assert not check_invariants(state, SPEC)

    def test_update_moves_row_between_groups(self, spark):
        snap, state = _snap0(spark), init_state(_snap0(spark), SPEC, "deleted")
        snap, state = _step(
            snap, state, [(1, "a", 10, 5, 1, False), (2, "b", 9, 2, 2, False)], spark
        )
        snap, state = _step(snap, state, [(1, "b", 11, 6, 3, False)], spark)
        _assert_view_matches(snap, state)
        rows = {r["grp"]: r.asDict() for r in read_view(state, SPEC).collect()}
        assert set(rows) == {"b"} and rows["b"]["n"] == 2
        assert rows["b"]["sum_val"] == 20 and rows["b"]["max_price"] == 6

    def test_stale_out_of_order_row_is_noop(self, spark):
        snap, state = _snap0(spark), init_state(_snap0(spark), SPEC, "deleted")
        snap, state = _step(snap, state, [(1, "a", 10, 5, 100, False)], spark)
        before = _rows(read_view(state, SPEC))
        snap, state = _step(snap, state, [(1, "zzz", 99, 99, 50, False)], spark)
        assert _rows(read_view(state, SPEC)) == before
        _assert_view_matches(snap, state)

    def test_tombstone_resurrection(self, spark):
        snap, state = _snap0(spark), init_state(_snap0(spark), SPEC, "deleted")
        snap, state = _step(snap, state, [(1, "a", 10, 5, 1, False)], spark)
        snap, state = _step(snap, state, [(1, "a", 10, 5, 2, True)], spark)
        assert read_view(state, SPEC).count() == 0
        snap, state = _step(snap, state, [(1, "c", 7, 7, 3, False)], spark)
        _assert_view_matches(snap, state)
        rows = read_view(state, SPEC).collect()
        assert len(rows) == 1 and rows[0]["grp"] == "c" and rows[0]["n"] == 1

    def test_empty_and_duplicate_key_batches(self, spark):
        snap, state = _snap0(spark), init_state(_snap0(spark), SPEC, "deleted")
        snap, state = _step(snap, state, [], spark)
        assert read_view(state, SPEC).count() == 0
        # two changes to the same key in one batch: only the last image lands
        snap, state = _step(
            snap, state, [(1, "a", 1, 1, 1, False), (1, "a", 50, 2, 2, False)], spark
        )
        _assert_view_matches(snap, state)
        r = read_view(state, SPEC).collect()[0]
        assert r["sum_val"] == 50 and r["n"] == 1

    def test_init_from_nonempty_snapshot(self, spark):
        base = _df(
            spark,
            [
                (1, "a", 1, 1, 1, False),
                (2, "a", 2, 2, 2, False),
                (3, "b", 3, 3, 3, True),  # tombstone in the base snapshot
            ],
        )
        state = init_state(base, SPEC, "deleted")
        _assert_view_matches(base, state)
        snap, state = _step(base, state, [(3, "b", 30, 1, 9, False)], spark)
        _assert_view_matches(snap, state)


_OPS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),  # pk
        st.sampled_from([None, "a", "b"]),  # grp
        st.sampled_from([None, 0, 1, 2]),  # val
        st.sampled_from([None, 0, 1]),  # price
        st.booleans(),  # deleted
    ),
    min_size=1,
    max_size=14,
)


class TestIvmProperty:
    # Slow tier (VERDICT r13 item 1): ~100 s hypothesis endurance run —
    # the file's plan-pin guard (test_bucketed_state_side_joins_are_
    # shuffle_free) deliberately stays in the default fast tier.
    @pytest.mark.slow
    @given(ops=_OPS, splits=st.lists(st.integers(0, 3), min_size=14, max_size=14))
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_random_op_sequences_match_recompute(self, spark, ops, splits):
        rows = [
            (pk, grp, val, price, ts, deleted)
            for ts, (pk, grp, val, price, deleted) in enumerate(ops)
        ]
        # split the op stream into up to 4 micro-batches by the split tags;
        # within a batch arrival order is irrelevant (order column decides)
        batches: dict[int, list] = {}
        for row, tag in zip(rows, splits):
            batches.setdefault(tag, []).append(row)
        snap, state = _snap0(spark), init_state(_snap0(spark), SPEC, "deleted")
        for tag in sorted(batches):
            snap, state = _step(snap, state, batches[tag], spark)
        _assert_view_matches(snap, state)
        assert not check_invariants(state, SPEC)


DERIVED_SPEC = AggViewSpec(
    group_cols=("vbucket",),
    count_star="n",
    sums={"sum_price": "price"},
    mins={"min_val": "val"},
    group_exprs={"vbucket": "val div 20"},
)


class TestIvmDerivedGroups:
    def test_derived_group_retraction_moves_rows(self, spark):
        """A value update changes the DERIVED group (val div 20): the old
        image must retract from its old bucket and the new image land in
        the new one — the case that breaks if group expressions are not
        applied identically to both images."""
        snap = _snap0(spark)
        state = init_state(snap, DERIVED_SPEC, "deleted")
        batch = _df(
            spark, [(1, "a", 10, 5, 1, False), (2, "a", 30, 7, 2, False)]
        )
        state = maintain(state, snap, batch, KEYS, ORDER, DERIVED_SPEC, "deleted")
        snap = merge_changes_ordered(snap, batch, KEYS, ORDER).localCheckpoint(True)
        want = _rows(compute_agg_view(snap, DERIVED_SPEC, "deleted"))
        assert _rows(read_view(state, DERIVED_SPEC)) == want
        assert want == [(0, 1, 5, 10), (1, 1, 7, 30)]
        # move pk=1 from bucket 0 to bucket 1; delete pk=2
        batch2 = _df(
            spark, [(1, "a", 25, 6, 10, False), (2, "a", 30, 7, 11, True)]
        )
        state = maintain(state, snap, batch2, KEYS, ORDER, DERIVED_SPEC, "deleted")
        snap = merge_changes_ordered(snap, batch2, KEYS, ORDER).localCheckpoint(True)
        want = _rows(compute_agg_view(snap, DERIVED_SPEC, "deleted"))
        assert _rows(read_view(state, DERIVED_SPEC)) == want
        assert want == [(1, 1, 6, 25)]  # bucket 0 emptied, bucket 1 replaced

    def test_nondeterministic_group_expr_rejected(self, spark):
        bad = AggViewSpec(
            group_cols=("r",), count_star="n", group_exprs={"r": "rand()"}
        )
        import pytest

        with pytest.raises(ValueError, match="pure function"):
            init_state(_snap0(spark), bad, "deleted")

    def test_colliding_group_expr_rejected(self, spark):
        bad = AggViewSpec(
            group_cols=("grp",), count_star="n", group_exprs={"grp": "upper(grp)"}
        )
        import pytest

        with pytest.raises(ValueError, match="collides"):
            init_state(_snap0(spark), bad, "deleted")


class TestIvmSqlFrontDoor:
    def test_parse_supported_shape(self):
        spec, tbl = agg_spec_from_sql(
            "SELECT grp, count(*) AS n, sum(val) AS sum_val, avg(val) AS avg_val, "
            "min(val) AS min_val, max(price) AS max_price, "
            "count(distinct val) AS nd_val FROM events GROUP BY grp"
        )
        assert tbl == "events"
        assert spec.group_cols == ("grp",) and spec.count_star == "n"
        assert spec.sums == {"sum_val": "val"} and spec.maxs == {"max_price": "price"}
        assert spec.count_distincts == {"nd_val": "val"}
        assert spec.outputs() == (
            "grp", "n", "sum_val", "avg_val", "min_val", "max_price", "nd_val",
        )

    def test_parsed_spec_runs_end_to_end(self, spark):
        spec, _ = agg_spec_from_sql(
            "select grp, count(*) as n, sum(val) as sum_val from t group by grp"
        )
        snap = _df(spark, [(1, "a", 3, 1, 1, False), (2, "a", 4, 1, 2, False)])
        state = init_state(snap, spec, "deleted")
        got = _rows(read_view(state, spec))
        want = _rows(compute_agg_view(snap, spec, "deleted"))
        assert got == want == [("a", 2, 7)]

    @pytest.mark.parametrize(
        "bad",
        [
            "SELECT grp, sum(val) FROM t",  # no GROUP BY
            "SELECT grp, sum(val + 1) AS s FROM t GROUP BY grp",  # agg expression
            "SELECT grp, other, sum(val) AS s FROM t GROUP BY grp",  # stray col
            "SELECT sum(val) AS s FROM t GROUP BY grp",  # group col not selected
            "SELECT grp, median(val) AS m FROM t GROUP BY grp",  # unsupported fn
        ],
    )
    def test_rejects_unsupported_shapes(self, bad):
        with pytest.raises(ValueError):
            agg_spec_from_sql(bad)

    def test_parses_derived_group_expression(self):
        spec, tbl = agg_spec_from_sql(
            "SELECT date_trunc('day', ts2) AS day, count(*) AS n, "
            "sum(val) AS sum_val FROM events GROUP BY day"
        )
        assert tbl == "events"
        assert spec.group_cols == ("day",)
        assert spec.group_exprs == {"day": "date_trunc('day', ts2)"}
        assert spec.outputs() == ("day", "n", "sum_val")

    def test_derived_group_spec_runs_end_to_end(self, spark):
        spec, _ = agg_spec_from_sql(
            "select val div 20 as vbucket, count(*) as n, "
            "sum(price) as sum_price from t group by vbucket"
        )
        snap = _df(
            spark, [(1, "a", 10, 5, 1, False), (2, "a", 30, 7, 2, False)]
        )
        state = init_state(snap, spec, "deleted")
        got = _rows(read_view(state, spec))
        assert got == _rows(compute_agg_view(snap, spec, "deleted"))
        assert got == [(0, 1, 5), (1, 1, 7)]


class TestIvmPlan:
    def test_bucketed_state_side_joins_are_shuffle_free(self, spark, tmp_path):
        """The 100 TB contract: with the snapshot bucketed on the primary key
        and the aggregate state bucketed on the group columns, a maintenance
        round shuffles only batch-derived rows — every state-side scan feeds
        its join with no Exchange above it."""
        snap = _df(
            spark,
            [(i, "g%d" % (i % 7), i, i, 1, False) for i in range(200)],
        )
        materialize_bucketed(
            snap, "ivm_snap_b", ["pk"], 4, path=str(tmp_path / "snap")
        )
        snap_b = spark.table("ivm_snap_b")
        state = init_state(snap_b, SPEC, "deleted")
        materialize_bucketed(
            state.agg, "ivm_agg_b", ["__g"], 4, path=str(tmp_path / "agg")
        )
        sup_b = {}
        for c, sup in state.supports.items():
            materialize_bucketed(
                sup, f"ivm_sup_{c}_b", ["__k"], 4, path=str(tmp_path / f"sup_{c}")
            )
            sup_b[c] = spark.table(f"ivm_sup_{c}_b")
        state_b = type(state)(agg=spark.table("ivm_agg_b"), supports=sup_b)

        batch = _df(spark, [(5, "g5", 99, 99, 9, False)])
        pairs = change_pairs(snap_b, batch, KEYS, ORDER)
        assert scan_shuffle_free(pairs, "ivm_snap_b")

        new_state = maintain(
            state_b, snap_b, batch, KEYS, ORDER, SPEC, delete_col="deleted"
        )
        # the support MERGE is state-side shuffle-free on the composite key
        for c in state_b.supports:
            assert scan_shuffle_free(new_state.supports[c], f"ivm_sup_{c}_b")
        # the aggregate merge + extreme patch never shuffle the agg state;
        # the only exchanges above support scans in this plan move the
        # touched groups' slice (bounded by the batch), by design
        assert scan_shuffle_free(new_state.agg, "ivm_agg_b")
        # correctness unaffected by the bucketed layout
        merged = merge_changes_ordered(snap_b, batch, KEYS, ORDER)
        want = _rows(compute_agg_view(merged, SPEC, "deleted"))
        assert _rows(read_view(new_state, SPEC)) == want
        for c in state_b.supports:
            spark.sql(f"DROP TABLE IF EXISTS ivm_sup_{c}_b")
        spark.sql("DROP TABLE IF EXISTS ivm_snap_b")
        spark.sql("DROP TABLE IF EXISTS ivm_agg_b")
