"""Distributed prefix sum + shard packing (operators/packing.py): the
two-phase range-partitioned cumsum must equal the naive single-window
cumsum exactly, across partition counts."""

from pyspark.sql import Window as W, functions as F

from dbt_decodable_spark.operators.packing import global_running_sum, pack_by_budget


def _naive_cumsum(df, order_col, weight_col):
    w = W.orderBy(order_col).rowsBetween(W.unboundedPreceding, W.currentRow)
    return {
        r["id"]: r["cum"]
        for r in df.withColumn("cum", F.sum(weight_col).over(w)).collect()
    }


class TestGlobalRunningSum:
    def test_matches_naive_window(self, spark):
        # deterministic LCG weights, ids deliberately unsorted in input
        x, rows = 11, []
        for i in range(300):
            x = (x * 48271) % 2147483647
            rows.append(((i * 7919) % 1000, x % 50 + 1))
        df = spark.createDataFrame(rows, "id long, w long")
        expected = _naive_cumsum(df, "id", "w")
        for p in (1, 4, 13):
            got = {
                r["id"]: r["cum"]
                for r in global_running_sum(df, "id", "w", partitions=p).collect()
            }
            assert got == expected, f"partitions={p}"

    def test_uses_multiple_range_partitions(self, spark):
        df = spark.createDataFrame([(i, 1) for i in range(100)], "id long, w long")
        ranged = df.repartitionByRange(8, F.col("id")).withColumn(
            "pid", F.spark_partition_id()
        )
        assert ranged.select("pid").distinct().count() > 1

    def test_preserves_other_columns(self, spark):
        df = spark.createDataFrame(
            [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")], "id long, w long, tag string"
        )
        out = global_running_sum(df, "id", "w", partitions=2)
        assert sorted((r.id, r.w, r.tag, r.cum) for r in out.collect()) == [
            (1, 10, "a", 10),
            (2, 20, "b", 30),
            (3, 30, "c", 60),
        ]


class TestPackByBudget:
    def test_greedy_shard_assignment(self, spark):
        df = spark.createDataFrame(
            [(1, 40), (2, 40), (3, 40), (4, 100), (5, 10)], "id long, w long"
        )
        out = {r.id: r.shard_id for r in pack_by_budget(df, "id", "w", budget=100).collect()}
        # cum_before: 0, 40, 80, 120, 220 → shards 0,0,0,1,2
        assert out == {1: 0, 2: 0, 3: 0, 4: 1, 5: 2}

    def test_every_shard_reaches_budget_except_last(self, spark):
        x, rows = 3, []
        for i in range(200):
            x = (x * 48271) % 2147483647
            rows.append((i, x % 90 + 10))
        df = spark.createDataFrame(rows, "id long, w long")
        out = pack_by_budget(df, "id", "w", budget=500).collect()
        per_shard = {}
        for r in out:
            per_shard[r.shard_id] = per_shard.get(r.shard_id, 0) + r.w
        last = max(per_shard)
        # a boundary-spilling document shifts the next shard's start by up to
        # (max weight - 1), so non-last shards hold > budget - max_weight
        assert all(tot > 500 - 99 for s, tot in per_shard.items() if s != last)
        assert set(per_shard) == set(range(last + 1))  # contiguous shard ids


class TestGroupedRunningSum:
    def test_matches_per_group_window(self, spark):
        from dbt_decodable_spark.operators.packing import grouped_running_sum
        from pyspark.sql import Window as W, functions as F

        df = spark.range(2000).select(
            F.col("id"),
            (F.col("id") % 3).cast("string").alias("g"),
            (F.pmod(F.xxhash64("id"), F.lit(50)) + 1).alias("w"),
        )
        got = grouped_running_sum(
            df, order_cols=["id"], weight_col="w", out_col="cum", group_cols=["g"]
        )
        w = W.partitionBy("g").orderBy("id").rowsBetween(W.unboundedPreceding, W.currentRow)
        want = df.withColumn("cum", F.sum("w").over(w))
        cols = ["id", "g", "w", "cum"]
        assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
            map(tuple, want.select(*cols).collect())
        )

    def test_mix_by_token_budget_prefix_property(self, spark):
        from dbt_decodable_spark.operators.mixing import mix_by_token_budget
        from pyspark.sql import functions as F

        df = spark.range(500).select(
            F.col("id"),
            F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("s"),
            F.lit(10).alias("w"),
        )
        out = mix_by_token_budget(df, "s", "id", "w", {"a": 100, "b": 40})
        rows = out.collect()
        by_s = {}
        for r in rows:
            by_s.setdefault(r["s"], []).append(r)
        # each stratum fills to >= budget with the minimal prefix: 10 docs of
        # weight 10 for budget 100, 4 for budget 40
        assert len(by_s["a"]) == 10 and len(by_s["b"]) == 4
        assert max(r["cum_weight"] for r in by_s["a"]) == 100
        # strata without a budget are dropped; kept rows' cum starts in-budget
        assert all(r["cum_weight"] - r["w"] < {"a": 100, "b": 40}[r["s"]] for r in rows)


class TestLengthBuckets:
    def test_exact_quantile_assignment(self, spark):
        from dbt_decodable_spark.operators.packing import (
            assign_length_buckets,
            length_bucket_thresholds,
        )

        # 8 rows, lengths 1..8, 4 buckets → thresholds 2,4,6,8
        df = spark.createDataFrame(
            [(i, i) for i in range(1, 9)], "id long, n long"
        )
        thr = {r["bucket"]: r["upper_len"] for r in length_bucket_thresholds(df, "n", 4).collect()}
        assert thr == {1: 2, 2: 4, 3: 6, 4: 8}
        out = {r["id"]: r["bucket"] for r in assign_length_buckets(df, "id", "n", 4).collect()}
        assert out == {1: 1, 2: 1, 3: 2, 4: 2, 5: 3, 6: 3, 7: 4, 8: 4}

    def test_skewed_duplicates_cover_everything(self, spark):
        from dbt_decodable_spark.operators.packing import assign_length_buckets

        # heavy duplication: 90 rows of length 5, tail of longer ones
        rows = [(i, 5) for i in range(90)] + [(100 + i, 50 + i) for i in range(10)]
        df = spark.createDataFrame(rows, "id long, n long")
        out = assign_length_buckets(df, "id", "n", 8)
        assert out.count() == 100  # every row assigned exactly once
        got = {r["id"]: r["bucket"] for r in out.collect()}
        # all length-5 rows share one bucket (same length → same bucket)
        assert len({got[i] for i in range(90)}) == 1
        # longest row lands in the top occupied bucket, ordering holds
        assert got[109] == max(got.values())
