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


class TestTargetedDeletion:
    def _build(self, spark, tmp_path):
        path = str(tmp_path / "corpus")
        df = spark.createDataFrame(
            [(i, f"lang{i % 3}", f"text {i}") for i in range(90)],
            "doc_id long, lang string, text string",
        )
        df.write.partitionBy("lang").parquet(path)
        return path

    def _inodes(self, pdir):
        import os
        return {
            f: os.stat(os.path.join(pdir, f)).st_ino
            for f in os.listdir(pdir)
            if f.endswith(".parquet")
        }

    def test_deletes_only_affected_partitions(self, spark, tmp_path):
        import os
        from dbt_decodable_spark.operators.maintenance import delete_rows_partitioned

        path = self._build(spark, tmp_path)
        # doc_ids 0 and 3 are both lang0; lang1/lang2 untouched
        before_l1 = self._inodes(os.path.join(path, "lang=lang1"))
        before_l2 = self._inodes(os.path.join(path, "lang=lang2"))
        deleted = delete_rows_partitioned(
            spark, path, "lang", "doc_id", [0, 3]
        )
        assert deleted == {"lang0": 2}
        left = spark.read.parquet(path)
        assert left.count() == 88
        assert left.filter("doc_id in (0, 3)").count() == 0
        # untouched partitions keep their exact files (same inodes)
        assert self._inodes(os.path.join(path, "lang=lang1")) == before_l1
        assert self._inodes(os.path.join(path, "lang=lang2")) == before_l2

    def test_idempotent_and_multi_partition(self, spark, tmp_path):
        from dbt_decodable_spark.operators.maintenance import delete_rows_partitioned

        path = self._build(spark, tmp_path)
        deleted = delete_rows_partitioned(
            spark, path, "lang", "doc_id", [1, 2, 4]
        )
        assert deleted == {"lang1": 2, "lang2": 1}
        again = delete_rows_partitioned(spark, path, "lang", "doc_id", [1, 2, 4])
        assert again == {}
        assert spark.read.parquet(path).count() == 87

    def test_duplicate_ids_null_ids_and_escaped_partitions(self, spark, tmp_path):
        from dbt_decodable_spark.operators.maintenance import delete_rows_partitioned

        path = str(tmp_path / "corpus2")
        rows = [(0, "a b", "x"), (1, "a b", "x"), (None, "a b", "keepme"),
                (2, "plain", "x"), (3, "plain", "x")]
        spark.createDataFrame(rows, "doc_id long, lang string, text string") \
            .write.partitionBy("lang").parquet(path)
        # duplicate ids must not inflate the doomed count; 'a b' partition
        # dir is Hive-escaped on disk; the NULL-id row must survive
        deleted = delete_rows_partitioned(
            spark, path, "lang", "doc_id", [0, 0, 2]
        )
        assert deleted == {"a b": 1, "plain": 1}
        left = spark.read.parquet(path)
        assert left.count() == 3
        assert left.filter("doc_id is null").count() == 1
        assert sorted(
            r.doc_id for r in left.filter("doc_id is not null").collect()
        ) == [1, 3]

    def test_typed_id_columns_date_and_decimal(self, spark, tmp_path):
        """ADVICE r7: the doomed-id frame must work for DATE and DECIMAL id
        columns — values go in string-typed and CAST to the table's dtype
        (createDataFrame's verifier rejects raw Python values otherwise)."""
        from datetime import date
        from decimal import Decimal

        from dbt_decodable_spark.operators.maintenance import delete_rows_partitioned

        dpath = str(tmp_path / "corpus_date")
        spark.createDataFrame(
            [(date(2024, 1, i + 1), f"lang{i % 2}", "x") for i in range(6)],
            "did date, lang string, text string",
        ).write.partitionBy("lang").parquet(dpath)
        deleted = delete_rows_partitioned(
            spark, dpath, "lang", "did", [date(2024, 1, 1), date(2024, 1, 2)]
        )
        assert sum(deleted.values()) == 2
        assert spark.read.parquet(dpath).count() == 4

        cpath = str(tmp_path / "corpus_dec")
        spark.createDataFrame(
            [(Decimal(f"{i}.50"), f"lang{i % 2}", "x") for i in range(6)],
            "did decimal(10,2), lang string, text string",
        ).write.partitionBy("lang").parquet(cpath)
        deleted = delete_rows_partitioned(
            spark, cpath, "lang", "did", [Decimal("0.50"), Decimal("3.50")]
        )
        assert sum(deleted.values()) == 2
        left = spark.read.parquet(cpath)
        assert left.count() == 4
        assert left.filter("did in (0.50, 3.50)").count() == 0
