"""Bucketed materialization (operators/bucketing.py): the bucketed⋈bucketed
join must plan WITHOUT any Exchange — the co-located-join contract that
removes the per-run shuffle at 100 TB."""

import pytest
from pyspark.sql import functions as F

from dbt_decodable_spark.operators.bucketing import (
    bucketed_join,
    materialize_bucketed,
    plan_has_no_exchange,
)


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("lv")
    )
    right = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("rv")
    )
    materialize_bucketed(left, "t_bleft", ["k"], 4, path=str(tmp_path / "l"))
    materialize_bucketed(right, "t_bright", ["k"], 4, path=str(tmp_path / "r"))
    yield "t_bleft", "t_bright"
    spark.sql("DROP TABLE IF EXISTS t_bleft")
    spark.sql("DROP TABLE IF EXISTS t_bright")


class TestBucketedJoin:
    def test_no_exchange_in_plan(self, spark, bucketed_pair):
        lt, rt = bucketed_pair
        joined = bucketed_join(spark, lt, rt, ["k"])
        assert plan_has_no_exchange(joined), joined._jdf.queryExecution().executedPlan().toString()

    def test_join_results_correct(self, spark, bucketed_pair):
        lt, rt = bucketed_pair
        rows = bucketed_join(spark, lt, rt, ["k"]).collect()
        assert len(rows) == 500
        assert all(r.lv == 2 * r.k and r.rv == 3 * r.k for r in rows)

    def test_unbucketed_join_does_shuffle(self, spark):
        # control: the same join without bucketing has Exchanges
        left = spark.range(0, 1000).select(F.col("id").alias("k"))
        right = spark.range(0, 500).select(F.col("id").alias("k"), F.lit(1).alias("v"))
        # range sources are splittable without shuffle; force a real case via parquet-less join on distinct keys
        joined = left.repartition(5).join(right.repartition(7), "k")
        assert not plan_has_no_exchange(joined)

    def test_aggregation_on_bucket_key_has_no_exchange(self, spark, bucketed_pair):
        lt, _ = bucketed_pair
        agg = spark.table(lt).groupBy("k").agg(F.sum("lv").alias("s"))
        assert plan_has_no_exchange(agg)


class TestPartitionPruning:
    def test_partitioned_write_prunes_at_read(self, spark, tmp_path):
        """The 100 TB lake layout: facts partitioned by event date. A
        date-filtered read must prune partitions at planning time (the scan
        lists only matching directories), visible as a partition filter in
        the plan and a partition-count drop."""
        from dbt_decodable_spark.sources.tables import read_table
        from pyspark.sql import functions as F

        path = str(tmp_path / "events_by_day")
        e = read_table(spark, "/root/testdata/sf0.001", "events")
        e.withColumn("event_date", F.to_date("ts")).write.partitionBy(
            "event_date"
        ).mode("overwrite").parquet(path)

        all_days = spark.read.parquet(path)
        one_day = all_days.filter(F.col("event_date") == "2024-01-05")
        plan = one_day._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "event_date" in plan.split(
            "PartitionFilters"
        )[1][:200]
        n_all = all_days.select("event_date").distinct().count()
        assert n_all > 1
        assert 0 < one_day.count() < all_days.count()
        # the pruned filter is a partition (directory) filter, NOT a data
        # filter: nothing about event_date may appear in PushedFilters
        pushed = plan.split("PushedFilters")[1][:200] if "PushedFilters" in plan else ""
        assert "event_date" not in pushed
