"""Versioned snapshot publication (``operators/versions.py``): atomic
_SUCCESS-gated generations, time travel, retention, crash behavior."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from dbt_decodable_spark.operators import versions as V


def _vals(df):
    return sorted(r["v"] for r in df.collect())


class TestPublishAndTimeTravel:
    def test_generations_accumulate_and_travel(self, spark, tmp_path):
        root = str(tmp_path / "t")
        for gen in range(3):
            n = V.publish_version(
                spark.range(5).select((F.col("id") + 100 * gen).alias("v")),
                root,
            )
            assert n == gen
        assert V.list_versions(root) == [0, 1, 2]
        assert _vals(V.read_version(spark, root)) == [200, 201, 202, 203, 204]
        assert _vals(V.read_version(spark, root, 0)) == [0, 1, 2, 3, 4]

    def test_missing_generation_raises_with_inventory(self, spark, tmp_path):
        root = str(tmp_path / "t")
        V.publish_version(spark.range(1).select(F.col("id").alias("v")), root)
        with pytest.raises(FileNotFoundError, match=r"generation 9 .*\[0\]"):
            V.read_version(spark, root, 9)
        with pytest.raises(FileNotFoundError, match="no committed"):
            V.read_version(spark, str(tmp_path / "empty"))


class TestCrashAndRetention:
    def test_uncommitted_generation_is_invisible_and_swept(self, spark, tmp_path):
        root = str(tmp_path / "t")
        V.publish_version(spark.range(3).select(F.col("id").alias("v")), root)
        # fabricate a crashed publish: data, no _SUCCESS
        crash = os.path.join(root, "v=00000005")
        spark.range(9).select(F.col("id").alias("v")).write.parquet(crash)
        os.unlink(os.path.join(crash, "_SUCCESS"))
        assert V.list_versions(root) == [0]
        assert _vals(V.read_version(spark, root)) == [0, 1, 2]
        n = V.publish_version(
            spark.range(2).select(F.col("id").alias("v")), root
        )
        assert n == 1  # numbered from committed max, not the crashed dir
        assert not os.path.exists(crash)  # swept

    def test_vacuum_keeps_newest_k(self, spark, tmp_path):
        root = str(tmp_path / "t")
        for gen in range(5):
            V.publish_version(
                spark.range(2).select((F.col("id") + gen).alias("v")), root
            )
        deleted = V.vacuum_versions(root, keep_last=2)
        assert deleted == [0, 1, 2]
        assert V.list_versions(root) == [3, 4]
        assert _vals(V.read_version(spark, root, 3)) == [3, 4]
        with pytest.raises(FileNotFoundError):
            V.read_version(spark, root, 0)
        # next publish continues the sequence past the vacuumed range
        assert V.publish_version(
            spark.range(1).select(F.col("id").alias("v")), root
        ) == 5

    def test_vacuum_never_deletes_latest(self, spark, tmp_path):
        root = str(tmp_path / "t")
        V.publish_version(spark.range(1).select(F.col("id").alias("v")), root)
        assert V.vacuum_versions(root, keep_last=1) == []
        assert V.list_versions(root) == [0]
        with pytest.raises(ValueError):
            V.vacuum_versions(root, keep_last=0)

    def test_vacuum_sweeps_uncommitted(self, spark, tmp_path):
        root = str(tmp_path / "t")
        V.publish_version(spark.range(1).select(F.col("id").alias("v")), root)
        junk = os.path.join(root, "v=00000009")
        os.makedirs(junk)
        V.vacuum_versions(root, keep_last=1)
        assert not os.path.exists(junk)


class TestPublishWithLayout:
    def test_clustered_zonemapped_generation(self, spark, tmp_path):
        from dbt_decodable_spark.operators import zonemap as zm

        root = str(tmp_path / "t")
        df = spark.range(1000).select(F.col("id"), (F.col("id") * 2).alias("v"))
        n = V.publish_version(
            df, root, cluster_by=["id"], stats_cols=["id"], n_files=4
        )
        gen_dir = V._vdir(root, n)
        assert os.path.exists(os.path.join(gen_dir, zm.MANIFEST_NAME))
        # the generation is independently file-skippable
        got, info = zm.read_pruned(spark, gen_dir, [("id", 0, 249)])
        assert info["fallback"] is None and info["pruned"] >= 2
        assert got.count() == 250
        # and still reads whole through the versioned API
        assert V.read_version(spark, root).count() == 1000
        # vacuum removes the generation and its map together
        V.publish_version(df, root)
        V.vacuum_versions(root, keep_last=1)
        assert not os.path.exists(gen_dir)

    def test_layout_options_require_parquet(self, spark, tmp_path):
        with pytest.raises(ValueError, match="require parquet"):
            V.publish_version(
                spark.range(1), str(tmp_path / "t"), fmt="orc",
                cluster_by=["id"],
            )


class TestDiffVersions:
    def _publish(self, spark, root, rows):
        return V.publish_version(
            spark.createDataFrame(rows, "k long, v long"), root
        )

    def test_default_diffs_latest_against_predecessor(self, spark, tmp_path):
        root = str(tmp_path / "t")
        self._publish(spark, root, [(1, 10), (2, 20), (3, 30)])
        self._publish(spark, root, [(1, 10), (2, 99), (4, 40)])
        d = V.diff_versions(spark, root, ["k"])
        got = {r["k"]: r["status"] for r in d.collect()}
        assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}
        row2 = {r["k"]: r for r in d.collect()}[2]
        assert row2["old"]["v"] == 20 and row2["new"]["v"] == 99

    def test_explicit_pair_and_common_core(self, spark, tmp_path):
        root = str(tmp_path / "t")
        self._publish(spark, root, [(1, 10)])
        self._publish(spark, root, [(1, 11)])
        # generation 2 gains a column: diff on the common core still works
        V.publish_version(
            spark.createDataFrame([(1, 11, "x")], "k long, v long, w string"),
            root,
        )
        d02 = V.diff_versions(spark, root, ["k"], a=0, b=2)
        assert d02.collect()[0]["status"] == "changed"
        d12 = V.diff_versions(spark, root, ["k"], a=1, b=2)
        assert d12.collect()[0]["status"] == "unchanged"  # v same; w not common

    def test_no_predecessor_raises(self, spark, tmp_path):
        root = str(tmp_path / "t")
        self._publish(spark, root, [(1, 10)])
        with pytest.raises(FileNotFoundError, match="no predecessor"):
            V.diff_versions(spark, root, ["k"])
