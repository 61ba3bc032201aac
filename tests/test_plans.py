"""Physical-plan assertions: the scale-critical properties the engine
promises (SURVEY §4 / the 100 TB design stance) must be visible in
``explain`` output — filters/projections reach the parquet scan, small dims
broadcast, aggregates run partial+final, hot paths stay JVM-side."""

import pytest

from dbt_decodable_spark.queries import load_all

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def registry():
    return load_all()


def plan_of(spark, registry, name: str) -> str:
    df = registry[name].fn(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


class TestPushdown:
    def test_filter_pushed_to_scan(self, spark, registry):
        plan = plan_of(spark, registry, "scan_project_filter")
        assert "PushedFilters: [" in plan
        assert "IsNotNull(l_shipdate)" in plan or "LessThan(l_shipdate" in plan

    def test_column_pruning(self, spark, registry):
        plan = plan_of(spark, registry, "scan_project_filter")
        # ReadSchema carries only the four projected + filter columns
        rs = plan.split("ReadSchema:")[1].splitlines()[0]
        assert "l_extendedprice" in rs and "l_tax" not in rs and "l_returnflag" not in rs

    def test_agg_partial_final(self, spark, registry):
        plan = plan_of(spark, registry, "agg_groupby_q1")
        # two-phase hash aggregation (map-side combine before the shuffle)
        assert plan.count("HashAggregate") >= 2
        assert "partial" in plan.lower()


class TestJoinStrategies:
    def test_small_dim_broadcasts(self, spark, registry):
        assert "BroadcastHashJoin" in plan_of(spark, registry, "join_inner")

    def test_semi_join_is_semi(self, spark, registry):
        assert "LeftSemi" in plan_of(spark, registry, "join_semi")

    def test_anti_join_is_anti(self, spark, registry):
        assert "LeftAnti" in plan_of(spark, registry, "join_anti")

    def test_theta_join_nested_loop_on_small_side(self, spark, registry):
        assert "BroadcastNestedLoopJoin" in plan_of(spark, registry, "join_theta")

    def test_asof_merge_has_no_nested_loop(self, spark, registry):
        """The merge-technique as-of join must not degenerate into a
        nested-loop/cartesian plan — that's its whole point."""
        plan = plan_of(spark, registry, "join_asof_merge")
        assert "NestedLoop" not in plan and "Cartesian" not in plan
        assert "Window" in plan


class TestJvmHotPath:
    def test_grok_is_jvm_side(self, spark, registry):
        plan = plan_of(spark, registry, "func_grok")
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        # exactly one group-rewrite regex in the projection + one rlike match
        # test (pushed to the scan) — not one regexp_extract per field
        assert plan.count("regexp_replace") == 1
        assert "regexp_extract" not in plan

    def test_dedup_exact_is_jvm_side(self, spark, registry):
        plan = plan_of(spark, registry, "dedup_exact")
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_topk_uses_take_ordered(self, spark, registry):
        assert "TakeOrderedAndProject" in plan_of(spark, registry, "order_by_limit")

    def test_similarity_uses_arrow_not_row_python(self, spark, registry):
        plan = plan_of(spark, registry, "similarity_bruteforce_topk")
        assert "MapInPandas" in plan  # Arrow-batched, not BatchEvalPython
        assert "BatchEvalPython" not in plan


class TestDialectPlans:
    def test_flink_sql_compiles_to_scan(self, spark):
        """The reference's model SQL, normalized, produces an ordinary
        Catalyst plan over the registered stream."""
        from dbt_decodable_spark.dialect import normalize
        from dbt_decodable_spark.sources.tables import register_testdata

        register_testdata(spark, SF_DIR, ("events",))
        df = spark.sql(
            normalize(
                "select coalesce(event_type, '__UNKNOWN__') as k, count(1) as n "
                "from (select * from events) group by k"
            )
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "HashAggregate" in plan
