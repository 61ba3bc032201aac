"""End-to-end lakehouse lifecycle: every storage-layer piece composed in
one realistic story. This is the "a user could switch" proof for the
layout/maintenance surface — each step is the documented API, and every
invariant checked here is one a production pipeline would rely on.

    1. materialize a range-partitioned CDC snapshot with a zone map
    2. ingest a multi-batch change stream (foreachBatch → tagged deltas,
       threshold compaction inside the handler)
    3. verify the merge-on-read view converged to the global fold
    4. verify the zone map stayed transactionally fresh through the
       partial-rewrite compactions (no fallback, pruning live)
    5. answer a count from metadata + boundary files only
    6. publish the converged view as a clustered, zone-mapped generation;
       publish a second generation after more changes; diff them
    7. time-travel to the first generation; vacuum down to one
    8. race two uncoordinated publishers into consecutive generations
"""

import os

from pyspark.sql import functions as F

from dbt_decodable_spark.operators import versions as V
from dbt_decodable_spark.operators import zonemap as zm
from dbt_decodable_spark.streaming import changelog as cl

DDL = "k long, seq long, v long, is_delete boolean"
PEXPR = "k div 100"  # range layout: CDC key locality preserved


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_full_lifecycle(spark, tmp_path):
    base = str(tmp_path / "table")

    # 1. snapshot: 1000 keys, range-partitioned, zone-mapped on the PK
    init = spark.createDataFrame(
        [(i, 0, i * 10, False) for i in range(1000)], DDL
    )
    cl.write_hash_partitioned(
        init, base, ["k"], 10, partition_expr=F.expr(PEXPR)
    )
    zm.write_zonemap(spark, base, ["k", "v"])

    # 2. change stream: 6 micro-batches, updates + tombstones, keys local
    src = str(tmp_path / "src")
    all_changes = []
    for j in range(6):
        rows = [
            (100 * (j % 3) + i, j + 1, 100_000 * (j + 1) + i, i % 7 == 0)
            for i in range(40)
        ]
        all_changes.extend(rows)
        spark.createDataFrame(rows, DDL).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(DDL).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        cl.stream_append_deltas(
            stream, base, ["k"], [F.col("seq")], 10,
            partition_expr=F.expr(PEXPR), compact_every=3,
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert len(cl.list_deltas(base)) < 6  # compaction fired at least once

    # 3. converged view == batch fold of snapshot ∪ every change
    want = cl.fold_last_image(
        init.unionByName(spark.createDataFrame(all_changes, DDL)),
        ["k"], [F.col("seq")],
    ).filter("NOT is_delete")
    view = cl.read_merged(spark, base, ["k"], [F.col("seq")])
    assert _rows(view) == _rows(want)

    # 4. zone map survived the in-handler compactions: fresh + selective
    got, info = zm.read_pruned(spark, base, [("k", 0, 99)])
    assert info["fallback"] is None
    assert info["pruned"] >= info["total"] - 3
    want_slice = spark.read.parquet(base).filter("k between 0 and 99")
    assert _rows(got.drop("__bucket")) == _rows(want_slice.drop("__bucket"))

    # 5. metadata count: untouched interior partitions never scanned
    n, cinfo = zm.count_pruned(spark, base, [("k", 500, 799)])
    assert n == 300  # keys 500-799 were never changed (snapshot rows)
    assert cinfo["files_metadata_only"] >= 1

    # 6. publish the converged view as generation 0, mutate, publish 1
    pub = str(tmp_path / "published")
    v0 = V.publish_version(
        view.drop("__bucket") if "__bucket" in view.columns else view,
        pub, cluster_by=["k"], stats_cols=["k"], n_files=4,
    )
    # k=0 ended tombstoned (absent from gen 0) → its update is a
    # resurrection; k=50 was never touched by the stream → changed;
    # k=2000 is brand new
    late = spark.createDataFrame(
        [(0, 99, 1, False), (50, 99, 2, False), (2000, 1, 5, False)], DDL
    )
    cl.append_delta(spark, base, late, tag="late")
    view2 = cl.read_merged(spark, base, ["k"], [F.col("seq")])
    v1 = V.publish_version(view2, pub)
    d = V.diff_versions(spark, pub, ["k"])
    got_status = {r["k"]: r["status"] for r in d.collect() if r["status"] != "unchanged"}
    assert got_status == {0: "added", 50: "changed", 2000: "added"}

    # generation 0 is itself file-skippable (published zone map)
    _, pinfo = zm.read_pruned(spark, V._vdir(pub, v0), [("k", 0, 249)])
    assert pinfo["fallback"] is None and pinfo["pruned"] >= 2

    # 7. time travel, then retention
    assert V.read_version(spark, pub, v0).count() == want.count()
    assert V.vacuum_versions(pub, keep_last=1) == [v0]
    assert V.list_versions(pub) == [v1]
    assert not os.path.exists(V._vdir(pub, v0))

    # 8. two uncoordinated publishers race the next slot: the rename
    # commit serializes them into consecutive generations — none lost,
    # none torn, latest = whoever claimed the higher slot
    import threading

    landed = []

    def racer(tag):
        df = view2.withColumn("v", F.col("v") + tag)
        landed.append((tag, V.publish_version(df, pub)))

    ts = [threading.Thread(target=racer, args=(t,)) for t in (1, 2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert sorted(n for _t, n in landed) == [v1 + 1, v1 + 2]
    assert V.list_versions(pub) == [v1, v1 + 1, v1 + 2]
    for _t, n in landed:
        assert V.read_version(spark, pub, n).count() == view2.count()
