"""Empirical scale probe: replicate the sf0.1 documents corpus N× into
/tmp and measure the heavy §2.12 pipelines at both sizes on the same
session. The point is the RATIO: a linear-time operator at 20× data on
fixed cores should cost ≈20× task-time (≈20× wall on a saturated
local[32]); anything super-linear (a quadratic pair join, a global sort)
shows up immediately as a ratio far above the replication factor.

Replicas get distinct doc_ids (offset per replica) and 4 of every 5
replicas get a per-replica suffix token appended — so the scaled corpus
carries a realistic mix of exact duplicates (the unsuffixed fifth) and
near-duplicates (suffixed, Jaccard just below 1), exercising the dedup
paths' worst case (duplicate-dense data → maximal candidate-pair load).

Usage: python tools/scale_probe.py [replication=20]
Prints one JSON line: {"n_docs": ..., "base": {...}, "scaled": {...},
"ratio": {...}}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
SCALED_DIR = "/tmp/spark_scale_probe"


def build_scaled(spark, rep: int) -> str:
    from pyspark.sql import functions as F

    out = f"{SCALED_DIR}/documents.parquet"
    if os.path.exists(out):
        shutil.rmtree(SCALED_DIR, ignore_errors=True)
    d = spark.read.parquet(f"{BASE}/documents.parquet")
    reps = spark.range(rep).withColumnRenamed("id", "__r")
    scaled = (
        d.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("__r") * 1_000_000).alias("doc_id"),
            F.when(
                F.col("__r") % 5 == 0, F.col("text")
            ).otherwise(
                F.concat(F.col("text"), F.lit(" rvar"), F.col("__r").cast("string"))
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        .repartition(32)
    )
    scaled.write.mode("overwrite").parquet(out)
    return SCALED_DIR


def probes(spark, sf_dir: str) -> dict[str, float]:
    """Run each heavy pipeline to a noop sink and time it."""
    from pyspark.sql import functions as F

    from dbt_decodable_spark.operators import bloom, bpe, dedup, text

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    jobs = {
        "exact_dedup": lambda: run(dedup.exact_dedup(d, "text", "doc_id")),
        "minhash_lsh": lambda: run(
            dedup.minhash_lsh_candidates(d, "doc_id", "text", n=3, num_hashes=6)
        ),
        "span_ngram": lambda: run(
            dedup.duplicate_ngram_spans(d, "doc_id", "text", n=8)
        ),
        "bloom_build": lambda: run(
            bloom.build_bloom(
                d.select(F.md5(dedup.normalize_text("text")).alias("k")),
                "k",
                m_bits=1 << 22,
                k=4,
            )
        ),
        "gopher_gate": lambda: run(
            d.select("doc_id", text.gopher_pass("text").alias("p"))
        ),
        "token_count": lambda: run(
            d.select("doc_id", F.size(dedup.tokens("text")).alias("n"))
        ),
        # one BPE round: pair-count + winner + merge application (the
        # driver-side 1-row collect is part of the cost, as in production)
        "bpe_round": lambda: run(
            bpe.learn_merges(d, "text", rounds=1, max_chars=64)[1]
        ),
        # r7 reconciliation operators — all expected ~linear:
        # order-independent checksum: map + 64-key rollup
        "checksum_shards": lambda: run(
            d.select(
                F.expr(
                    "CAST(conv(substr(md5(concat_ws('|', CAST(doc_id AS STRING),"
                    " text)), 1, 5), 16, 10) AS BIGINT)"
                ).alias("v1")
            )
            .groupBy((F.col("v1") % 64).alias("shard"))
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("v1").alias("s1"))
        ),
        # two-phase salted aggregation over the skewed lang column
        "salted_agg": lambda: run(
            d.select(
                "lang",
                F.pmod(F.xxhash64("doc_id"), F.lit(32)).alias("__salt"),
                F.col("n_chars").cast("long").alias("__v"),
            )
            .groupBy("lang", "__salt")
            .agg(F.count(F.lit(1)).alias("__n"), F.sum("__v").alias("__s"))
            .groupBy("lang")
            .agg(F.sum("__n").alias("n"), F.sum("__s").alias("chars"))
        ),
        # row-level snapshot diff: one key shuffle on doc_id (full outer)
        "snapshot_diff": lambda: run(
            d.filter(F.col("doc_id") % 10 != 0)
            .select("doc_id", F.col("n_chars").alias("old_n"))
            .join(
                d.select("doc_id", F.col("n_chars").alias("new_n")),
                "doc_id",
                "full_outer",
            )
            .select(
                "doc_id",
                F.when(F.col("old_n").isNull(), "added")
                .when(F.col("new_n").isNull(), "removed")
                .when(F.col("old_n") != F.col("new_n"), "changed")
                .otherwise("unchanged")
                .alias("status"),
            )
        ),
    }

    # r8 operators — both expected ~linear:
    # order-aware CDC merge: one key-shuffle over |state| + |batch|
    # (batch = 10% of keys updated, 1% tombstoned — the lakehouse MERGE load)
    from dbt_decodable_spark.streaming.changelog import merge_changes_ordered

    state = d.select(
        "doc_id",
        F.lit(0).cast("long").alias("seq"),
        F.col("n_chars").cast("long").alias("v"),
        F.lit(False).alias("is_delete"),
    )
    batch = (
        d.filter(F.col("doc_id") % 10 == 0)
        .select(
            "doc_id",
            F.lit(1).cast("long").alias("seq"),
            (F.col("n_chars") + 1).cast("long").alias("v"),
            (F.col("doc_id") % 100 == 0).alias("is_delete"),
        )
    )
    jobs["cdc_merge"] = lambda: run(
        merge_changes_ordered(state, batch, keys=["doc_id"], order=["seq"])
    )
    # r9: the bucketed-snapshot MERGE (merge_changes_keyed over a state
    # table bucketed on the PK — no Exchange on the state side, only the
    # batch shuffles). Setup (one bucketing write) is outside the timed
    # job, like production where the snapshot is already bucketed on disk.
    import hashlib
    import tempfile

    from dbt_decodable_spark.operators.bucketing import materialize_bucketed
    from dbt_decodable_spark.streaming.changelog import (
        merge_changes_keyed,
        write_hash_partitioned,
    )

    snap_tbl = "probe_cdc_snap_" + hashlib.md5(sf_dir.encode()).hexdigest()[:6]
    snap_dir = tempfile.mkdtemp(prefix="probe_cdc_")
    spark.sql(f"DROP TABLE IF EXISTS {snap_tbl}")
    materialize_bucketed(state, snap_tbl, ["doc_id"], 32, path=f"{snap_dir}/s")
    jobs["cdc_merge_bucketed"] = lambda: run(
        merge_changes_keyed(
            spark.table(snap_tbl), batch, keys=["doc_id"], order=["seq"]
        )
    )
    # grok parse: two regex executions per row, map-only (func_grok_patterns
    # hot path over synthesized lines)
    from dbt_decodable_spark.functions.grok import grok_extract

    lines = d.select(
        "doc_id",
        F.concat(
            F.lit("10."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".0.1 svc"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(":8080 1.00 INFO"),
        ).alias("line"),
    )
    jobs["grok_parse"] = lambda: run(
        grok_extract(
            lines,
            "line",
            r"%{IP:client} %{WORD:service}:%{INT:port} %{NUMBER:dur} %{LOGLEVEL:level}",
        )
    )

    # r9: zone-map file skipping. Setup (clustered copy + manifest) is
    # outside the timed jobs, like production where the layout is written
    # once. File size is held ~constant (file COUNT grows with data — the
    # honest 100 TB model), and the predicate selects a fixed ~1% of the
    # key range: the pruned read should stay ~flat across the replication
    # while the full-scan control grows with the corpus.
    from dbt_decodable_spark.operators import zonemap as zm

    zdir = tempfile.mkdtemp(prefix="probe_zm_")
    zpath = f"{zdir}/docs"
    n_docs_z = d.count()
    zm.write_with_zonemap(
        d.select("doc_id", "n_chars", "text"),
        zpath,
        ["doc_id"],
        cluster_by=["doc_id"],
        n_files=max(16, n_docs_z // 20_000),
    )
    zb = d.agg(F.min("doc_id"), F.max("doc_id")).first()
    z_lo, z_hi = zb[0], zb[0] + max(1, (zb[1] - zb[0]) // 100)
    jobs["zonemap_pruned_read"] = lambda: run(
        zm.read_pruned(spark, zpath, [("doc_id", z_lo, z_hi)])[0]
    )
    jobs["zonemap_full_read"] = lambda: run(
        spark.read.parquet(zpath).filter(
            (F.col("doc_id") >= z_lo) & (F.col("doc_id") <= z_hi)
        )
    )

    # late r9: bloom sidecar point lookup on a column the layout does NOT
    # cluster (a content fingerprint in a doc_id-clustered table). The
    # interval map keeps every file here; the bloom keeps ~the one file
    # that holds the fingerprint — so the pruned lookup should stay ~flat
    # across the replication while the full-scan control grows. Sidecar
    # build is setup (one-time, like the layout), outside the timed jobs.
    zpath_fp = f"{zdir}/docs_fp"
    zm.write_with_zonemap(
        d.select("doc_id", F.xxhash64("text").alias("fp"), "text"),
        zpath_fp,
        ["doc_id"],
        cluster_by=["doc_id"],
        n_files=max(16, n_docs_z // 20_000),
    )
    zm.add_bloom_sidecar(spark, zpath_fp, "fp", m_bits=1 << 18, k=4)
    probe_fp = (
        spark.read.parquet(zpath_fp).select("fp").limit(1).first()["fp"]
    )
    jobs["bloom_point_lookup"] = lambda: run(
        zm.read_pruned_eq(spark, zpath_fp, "fp", [probe_fp])[0]
    )
    jobs["bloom_fullscan_control"] = lambda: run(
        spark.read.parquet(zpath_fp).filter(F.col("fp") == probe_fp)
    )

    # late r9: incremental view maintenance. The claim under test is that
    # maintaining a GROUP BY materialization costs O(|batch| + touched
    # groups' support rows) — so with a FIXED-size batch (~5k changes) and
    # bounded groups (grp = doc_id div 50, count grows with data, ~50
    # support rows each), the maintain wall should stay ~flat across the
    # replication while the recompute control grows with the corpus. All
    # state setup (bucketed snapshot/agg/support) is one-time, outside the
    # timed jobs, like production.
    from dbt_decodable_spark.operators import ivm

    ivm_dir = tempfile.mkdtemp(prefix="probe_ivm_")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:6]
    isnap_tbl, iagg_tbl, isup_tbl = (
        f"probe_ivm_snap_{tag}", f"probe_ivm_agg_{tag}", f"probe_ivm_sup_{tag}"
    )
    for t_ in (isnap_tbl, iagg_tbl, isup_tbl):
        spark.sql(f"DROP TABLE IF EXISTS {t_}")
    istate = state.withColumn("grp", F.expr("doc_id div 50"))
    p_mod = max(1, n_docs_z // 5000)
    ibatch = (
        d.filter(F.col("doc_id") % p_mod == 0)
        .select(
            "doc_id",
            F.lit(1).cast("long").alias("seq"),
            (F.col("n_chars") + 1).cast("long").alias("v"),
            (F.col("doc_id") % (7 * p_mod) == 0).alias("is_delete"),
        )
        .withColumn("grp", F.expr("doc_id div 50"))
    )
    ispec = ivm.AggViewSpec(
        group_cols=("grp",),
        count_star="n",
        sums={"sum_v": "v"},
        mins={"min_v": "v"},
        maxs={"max_v": "v"},
        count_distincts={"nd_v": "v"},
    )
    materialize_bucketed(istate, isnap_tbl, ["doc_id"], 32, path=f"{ivm_dir}/snap")
    _st0 = ivm.init_state(spark.table(isnap_tbl), ispec, "is_delete")
    materialize_bucketed(_st0.agg, iagg_tbl, ["__g"], 32, path=f"{ivm_dir}/agg")
    materialize_bucketed(
        _st0.supports["v"], isup_tbl, ["__k"], 32, path=f"{ivm_dir}/sup"
    )
    ist = ivm.IvmState(
        agg=spark.table(iagg_tbl), supports={"v": spark.table(isup_tbl)}
    )
    jobs["ivm_maintain"] = lambda: run(
        ivm.maintain(
            ist, spark.table(isnap_tbl), ibatch, ["doc_id"], ["seq"], ispec,
            delete_col="is_delete",
        ).agg
    )
    jobs["ivm_recompute_control"] = lambda: run(
        ivm.compute_agg_view(spark.table(isnap_tbl), ispec, "is_delete")
    )

    # late r9: merge-on-read IVM — appends instead of state rewrites. The
    # production-shaped load: a locality-bearing CDC batch (5k contiguous
    # keys), the snapshot range-partitioned on the key, and the IVM state
    # partitioned by a right-sized group-range bucket_expr. Expected ~flat
    # append wall across the replication (measured 3.8→4.5 s over 25×
    # state in the r9 probes) while ivm_maintain above carries the
    # state-scan term. Layout sizing matters and is measured in SCALING.md:
    # a scattered batch or a hash bucket layout defeats pruning; an
    # over-fine group-range expr (tiny directories) blows up listing cost.
    from dbt_decodable_spark.operators import ivm_log as il

    ivmlog_dir = tempfile.mkdtemp(prefix="probe_ivmlog_")
    lb = (
        d.filter((F.col("doc_id") >= 0) & (F.col("doc_id") < 5000))
        .select(
            "doc_id",
            F.lit(1).cast("long").alias("seq"),
            (F.col("n_chars") + 1).cast("long").alias("v"),
            (F.col("doc_id") % 700 == 0).alias("is_delete"),
        )
        .withColumn("grp", F.expr("doc_id div 50"))
        .localCheckpoint(eager=True)
    )
    ivmlog_snap = f"{ivmlog_dir}/snap"
    write_hash_partitioned(
        istate, ivmlog_snap, ["doc_id"], 64,
        partition_expr=F.expr("doc_id div 20000"),
    )
    ivmlog_view = f"{ivmlog_dir}/view"
    il.ivm_log_init(
        spark, ivmlog_view,
        spark.read.parquet(ivmlog_snap).drop("__bucket"), ispec,
        delete_col="is_delete", bucket_expr="__g.grp div 500",
    )

    def _ivmlog_snap_slice():
        tb = [
            r[0]
            for r in lb.select(F.expr("doc_id div 20000").alias("__b"))
            .distinct()
            .collect()
        ]
        return (
            spark.read.parquet(ivmlog_snap)
            .filter(F.col("__bucket").isin(tb))
            .drop("__bucket")
            .select("doc_id", "seq", "v", "is_delete", "grp")
        )

    _ivmlog_tag = {"n": 0}

    def _ivmlog_append():
        _ivmlog_tag["n"] += 1
        il.ivm_log_append(
            spark, ivmlog_view, _ivmlog_snap_slice(), lb,
            ["doc_id"], ["seq"], ispec, tag=str(_ivmlog_tag["n"]),
        )

    jobs["ivmlog_append"] = _ivmlog_append
    jobs["ivmlog_read"] = lambda: run(il.ivm_log_read(spark, ivmlog_view, ispec))

    out: dict[str, float] = {}
    try:
        for name, job in jobs.items():
            job()  # warm (JIT/codegen) — scale ratios must not include compile cost
            t = time.time()
            job()
            out[name] = round(time.time() - t, 2)
    finally:
        for t_ in (snap_tbl, isnap_tbl, iagg_tbl, isup_tbl):
            spark.sql(f"DROP TABLE IF EXISTS {t_}")
        shutil.rmtree(snap_dir, ignore_errors=True)
        shutil.rmtree(zdir, ignore_errors=True)
        shutil.rmtree(ivm_dir, ignore_errors=True)
        shutil.rmtree(ivmlog_dir, ignore_errors=True)
    return out


def build_scaled_embeddings(spark, rep: int) -> str:
    """Replicate embeddings rep× with a tiny deterministic per-replica
    perturbation on one dimension (keeps vectors near-duplicates — the
    ANN paths' densest-bucket case — without changing norms much)."""
    from pyspark.sql import functions as F

    out = f"{SCALED_DIR}/embeddings.parquet"
    e = spark.read.parquet(f"{BASE}/embeddings.parquet")
    reps = spark.range(rep).withColumnRenamed("id", "__r")
    scaled = (
        e.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") + F.col("__r") * 1_000_000).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: F.when(i == 0, x + F.col("__r") * 0.001).otherwise(x),
            ).alias("embedding"),
            "label",
        )
        .repartition(32)
    )
    scaled.write.mode("overwrite").parquet(out)
    return out


def probes_sim(spark, path: str) -> dict[str, float]:
    from pyspark.sql import functions as F

    from dbt_decodable_spark.operators import clustering, similarity

    e = spark.read.parquet(path).withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    def quantized():
        scale_expr, _ = similarity.quantize_int8(F.col("embedding"))
        staged = e.select("vec_id", "embedding", scale_expr.alias("scale"))
        _, q = similarity.quantize_int8(F.col("embedding"), scale=F.col("scale"))
        return staged.select("vec_id", "scale", q.alias("qvec"))

    jobs = {
        "ivf_assign": lambda: run(
            similarity.ivf_assign(e, similarity.ivf_centroids(e))
        ),
        "quantize_int8": lambda: run(quantized()),
        # one full Lloyd round over the scaled vectors (assignment + update
        # + final assignment): the iterative-operator family's per-round cost
        "kmeans_round": lambda: run(
            clustering.kmeans_lloyd(e, k=8, iters=1, init_mod=61)
        ),
    }
    out: dict[str, float] = {}
    for name, job in jobs.items():
        job()
        t = time.time()
        job()
        out[name] = round(time.time() - t, 2)
    return out


def probe_ivmjoin(spark) -> dict:
    """Join-view maintenance slope probe (``python tools/scale_probe.py
    ivmjoin``): fixed 5k-row fact batch against 100k and 2.5M-row fact
    snapshots (25x state growth), fact/view bucketed on the PK.

    Two arms pin the cost model O(|batch| + dim-update fan-out):

    - ``fact_only``  — no dim changes: wall should stay ~flat across 25x
      state (per-batch work is batch-sized; the bucketed state sides plan
      shuffle-free);
    - ``with_fanout`` — 5 of 1000 dim keys change: adds the irreducible
      fan-out term (N/200 facts re-enriched), so wall grows with the
      fan-out row count, NOT with |fact| wholesale.

    A full-recompute control shows the wall the incremental path avoids.
    """
    import tempfile
    import time

    from pyspark.sql import functions as F

    from dbt_decodable_spark.operators.bucketing import materialize_bucketed
    from dbt_decodable_spark.operators.ivm_join import (
        JoinViewSpec,
        JoinViewState,
        compute_join_view,
        init_join_state,
        maintain_join,
    )

    spec = JoinViewSpec(
        fact_keys=("pk",), fk_cols=("fk",), dim_keys=("dk",),
        dim_payload={"dim_name": "name", "dim_tier": "tier"},
    )
    dim = (
        spark.range(1000)
        .select(
            F.col("id").alias("dk"),
            F.concat(F.lit("d"), F.col("id")).alias("name"),
            (F.col("id") % 7).alias("tier"),
            F.lit(1).cast("long").alias("ts"),
            F.lit(False).alias("deleted"),
        )
        .localCheckpoint(eager=True)
    )
    batch_fact = (
        spark.range(5000)
        .select(
            F.col("id").alias("pk"),
            (F.col("id") % 1000).alias("fk"),
            (F.col("id") * 3).alias("qty"),
            F.lit(2).cast("long").alias("ts"),
            (F.col("id") % 700 == 0).alias("deleted"),
        )
        .localCheckpoint(eager=True)
    )
    batch_dim = (
        spark.range(5)
        .select(
            (F.col("id") * 200).alias("dk"),
            F.concat(F.lit("d2_"), F.col("id")).alias("name"),
            F.lit(9).cast("long").alias("tier"),
            F.lit(2).cast("long").alias("ts"),
            F.lit(False).alias("deleted"),
        )
        .localCheckpoint(eager=True)
    )
    empty_fact = batch_fact.filter("pk < 0").localCheckpoint(eager=True)
    empty_dim = batch_dim.filter("dk < 0").localCheckpoint(eager=True)

    out: dict = {}
    for label, n in (("100k", 100_000), ("2.5M", 2_500_000)):
        fact = spark.range(n).select(
            F.col("id").alias("pk"),
            (F.col("id") % 1000).alias("fk"),
            F.col("id").alias("qty"),
            F.lit(1).cast("long").alias("ts"),
            F.lit(False).alias("deleted"),
        )
        tmp = tempfile.mkdtemp(prefix=f"probe_ivmjoin_{label}_")
        st = init_join_state(fact, dim, spec, "deleted", "deleted")
        materialize_bucketed(st.fact, f"pij_fact_{label[0]}", ["pk"], 32,
                             path=f"{tmp}/fact")
        materialize_bucketed(st.view, f"pij_view_{label[0]}", ["pk"], 32,
                             path=f"{tmp}/view")
        bstate = JoinViewState(
            fact=spark.table(f"pij_fact_{label[0]}"),
            dim=st.dim,
            view=spark.table(f"pij_view_{label[0]}"),
        )
        jobs = {
            "fact_only": lambda: maintain_join(
                bstate, batch_fact, empty_dim, ["ts"], ["ts"], spec,
                "deleted", "deleted").view.count(),
            "with_fanout": lambda: maintain_join(
                bstate, batch_fact, batch_dim, ["ts"], ["ts"], spec,
                "deleted", "deleted").view.count(),
            "recompute": lambda: compute_join_view(
                bstate.fact, bstate.dim, spec, "deleted", "deleted"
            ).count(),
        }
        res = {}
        for k, job in jobs.items():
            job()  # warm
            t = time.time()
            job()
            res[k] = round(time.time() - t, 2)
        out[label] = res
        spark.sql(f"DROP TABLE IF EXISTS pij_fact_{label[0]}")
        spark.sql(f"DROP TABLE IF EXISTS pij_view_{label[0]}")
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def probe_ivmdag(spark) -> dict:
    """Cascade downstream-step slope probe (``python tools/scale_probe.py
    ivmdag``): a fixed 5k-key pending view-change slice consumed into a
    downstream aggregate against 100k- and 2.5M-key view bases (25x state
    growth). Pins the cost model of ``ivm_dag.maintain_downstream``:

    - ``step``      — the real downstream step (broadcast-semi-join slice of
      the base, fold of the slice, one ivm_log_append): wall should stay
      ~flat across 25x — the base SCANS but never shuffles;
    - ``full_fold`` — the control: reconstructing the full as-of view state
      (fold of the whole base) as a pre-slice design would — the
      O(|view|)-shuffle-per-step cost the slice avoids;
    - ``recompute`` — aggregating the whole view from scratch (what the
      maintained view never has to do).
    """
    import tempfile
    import time

    from pyspark.sql import functions as F

    from dbt_decodable_spark.operators import ivm_dag
    from dbt_decodable_spark.operators.ivm import AggViewSpec
    from dbt_decodable_spark.streaming.changelog import (
        append_delta,
        fold_last_image,
        write_hash_partitioned,
    )

    spec = AggViewSpec(
        group_cols=("grp",),
        count_star="n_rows",
        sums={"sum_val": "val"},
        mins={"min_val": "val"},
        maxs={"max_val": "val"},
    )
    out: dict = {}
    for label, n in (("100k", 100_000), ("2.5M", 2_500_000)):
        tmp = tempfile.mkdtemp(prefix=f"probe_ivmdag_{label}_")
        view_log = f"{tmp}/view"
        droot = f"{tmp}/down"
        base = spark.range(n).select(
            F.col("id").alias("pk"),
            (F.col("id") % 97).cast("string").alias("grp"),
            (F.col("id") % 1000).alias("val"),
            F.lit(0).cast("long").alias("__seq"),
            F.lit(False).alias("__deleted"),
        )
        write_hash_partitioned(base, view_log, ["pk"], 32)
        ivm_dag.init_downstream(spark, droot, view_log, ["pk"], spec)
        changes = spark.range(5000).select(
            (F.col("id") * (n // 5000)).alias("pk"),  # spread over the base
            (F.col("id") % 91).cast("string").alias("grp"),
            (F.col("id") % 777).alias("val"),
            F.lit(10).cast("long").alias("__seq"),
            (F.col("id") % 700 == 0).alias("__deleted"),
        )
        append_delta(spark, view_log, changes, tag="10")
        res = {}
        bdf, _ = ivm_dag._view_rows(spark, view_log)
        t = time.time()
        fold_last_image(bdf, ["pk"], [F.col("__seq")]).count()
        res["full_fold"] = round(time.time() - t, 2)
        t = time.time()
        bdf.filter(~F.col("__deleted")).groupBy("grp").agg(
            F.count(F.lit(1)), F.sum("val"), F.min("val"), F.max("val")
        ).count()
        res["recompute"] = round(time.time() - t, 2)
        t = time.time()
        ivm_dag.maintain_downstream(spark, droot, view_log, ["pk"], spec)
        res["step"] = round(time.time() - t, 2)
        out[label] = res
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def probe_dag(spark, big_n: int = 2_000_000) -> dict:
    """Full N-node ENGINE chain slope probe (``python tools/scale_probe.py
    dag [big_n]``): the depth-3 project graph (join → rollup → band
    rollup) through ``catalog.activate_project_incremental``, measured at
    a 100k-fact and a ``big_n``-fact base with the SAME fixed churn batch
    (5k fact rows + 50 dim updates). Reported walls:

    - ``init`` — the first activation (O(|base|) by design: snapshot
      writes + change-log seeds; grows with the base, honestly);
    - ``step`` — the second activation consuming the fixed batch through
      all three stages (join micro-batch, view-log slice fold, out-log
      slice fold + deferred compactions): the O(|batch| + touched) claim —
      expect ~flat across the ≥20× state growth, bounded by the fixed
      Structured-Streaming machinery plus the base SCANS (never shuffles)
      in the old-image slices.
    """
    import tempfile
    import time

    from pyspark.sql import functions as F

    from dbt_decodable_spark.catalog import Engine
    from dbt_decodable_spark.schema import StreamSchema

    out: dict = {}
    for label, n in (("100k", 100_000), (f"{big_n // 1000}k", big_n)):
        tmp = tempfile.mkdtemp(prefix=f"probe_dag_{label}_")
        ns = f"pd{label.replace('.', '')}"
        eng = Engine(spark, namespace=ns, warehouse_dir=f"{tmp}/wh")
        os.makedirs(eng.warehouse_dir, exist_ok=True)
        facts = spark.range(n).select(
            F.col("id").alias("pk"),
            (F.col("id") % 1000).alias("fk"),
            (F.col("id") % 777).alias("qty"),
            F.lit(0).cast("long").alias("ver"),
            F.lit(False).alias("deleted"),
        )
        dims = spark.range(1000).select(
            F.col("id").alias("dk"),
            (F.col("id") % 37).cast("string").alias("seg"),
            F.lit(0).cast("long").alias("dver"),
        )
        eng.create_stream(
            "fact",
            schema=StreamSchema.from_spark(facts.schema, primary_key=["pk"]),
            data=facts,
        )
        eng.create_stream(
            "dim",
            schema=StreamSchema.from_spark(dims.schema, primary_key=["dk"]),
            data=dims,
        )
        eng.create_pipeline(
            "enriched",
            f"select f.*, d.seg as seg from {ns}__fact f "
            f"join {ns}__dim d on f.fk = d.dk",
            activate=False,
        )
        eng.create_pipeline(
            "rollup",
            f"select seg, count(*) as n_rows, sum(qty) as sum_qty "
            f"from {ns}__enriched group by seg",
            activate=False,
        )
        eng.create_pipeline(
            "summary",
            f"select length(seg) % 2 as band, count(*) as n_segs, "
            f"sum(sum_qty) as total "
            f"from {ns}__rollup group by band",
            activate=False,
        )
        nodes = {
            "enriched": dict(
                fact_order=["ver"], dim_order=["dver"],
                fact_delete_col="deleted",
            ),
            "rollup": {},
            "summary": {},
        }
        res = {}
        t = time.time()
        eng.activate_project_incremental(nodes, n_buckets=32)
        res["init"] = round(time.time() - t, 2)
        batch = spark.range(5000).select(
            (F.col("id") * (n // 5000)).alias("pk"),
            (F.col("id") % 1000).alias("fk"),
            (F.col("id") % 555).alias("qty"),
            F.lit(1).cast("long").alias("ver"),
            (F.col("id") % 500 == 0).alias("deleted"),
        )
        dbatch = spark.range(50).select(
            (F.col("id") * 20).alias("dk"),
            F.lit("UPD").alias("seg"),
            F.lit(1).cast("long").alias("dver"),
        )
        batch.write.mode("append").parquet(eng.streams[f"{ns}__fact"].path)
        dbatch.write.mode("append").parquet(eng.streams[f"{ns}__dim"].path)
        eng.refresh_stream("fact")
        eng.refresh_stream("dim")
        t = time.time()
        eng.activate_project_incremental(nodes, n_buckets=32)
        res["step"] = round(time.time() - t, 2)
        out[label] = res
        eng.cleanup()
        shutil.rmtree(tmp, ignore_errors=True)
    labels = list(out)
    out["step_ratio"] = (
        round(out[labels[1]]["step"] / out[labels[0]]["step"], 2)
        if out[labels[0]]["step"] > 0.05
        else None
    )
    return out


def probe_rawdag(spark, big_n: int = 2_000_000) -> dict:
    """Raw-rooted engine chain slope probe (``python tools/scale_probe.py
    rawdag [big_n]``): the r12 aggregate-over-raw-stream node kind —
    GROUP-BY rollup over the raw fact stream (EMITTING via the fused
    single-pass append) → band rollup consuming the out log — through
    ``catalog.activate_project_incremental``, at a 100k-fact and a
    ``big_n``-fact base with the SAME fixed 5k-row churn batch. ``step``
    is the O(|batch| + touched) claim for the new emission path: with
    ``prune_fold``/``prune_target`` the fact state is scanned, never
    shuffled, per micro-batch — expect ~flat."""
    import tempfile
    import time

    from pyspark.sql import functions as F

    from dbt_decodable_spark.catalog import Engine
    from dbt_decodable_spark.schema import StreamSchema

    out: dict = {}
    for label, n in (("100k", 100_000), (f"{big_n // 1000}k", big_n)):
        tmp = tempfile.mkdtemp(prefix=f"probe_rawdag_{label}_")
        ns = f"prd{label.replace('.', '')}"
        eng = Engine(spark, namespace=ns, warehouse_dir=f"{tmp}/wh")
        os.makedirs(eng.warehouse_dir, exist_ok=True)
        facts = spark.range(n).select(
            F.col("id").alias("pk"),
            (F.col("id") % 997).alias("grp"),
            (F.col("id") % 777).alias("qty"),
            F.lit(0).cast("long").alias("ver"),
            F.lit(False).alias("deleted"),
        )
        eng.create_stream(
            "fact",
            schema=StreamSchema.from_spark(facts.schema, primary_key=["pk"]),
            data=facts,
        )
        eng.create_pipeline(
            "rawroll",
            f"select grp, count(*) as n_rows, sum(qty) as sum_qty "
            f"from {ns}__fact group by grp",
            activate=False,
        )
        eng.create_pipeline(
            "rawband",
            f"select grp % 2 as band, count(*) as n_grps, "
            f"sum(sum_qty) as total "
            f"from {ns}__rawroll group by band",
            activate=False,
        )
        nodes = {
            "rawroll": dict(order=["ver"], delete_col="deleted"),
            "rawband": {},
        }
        res = {}
        t = time.time()
        eng.activate_project_incremental(nodes, n_buckets=32)
        res["init"] = round(time.time() - t, 2)
        batch = spark.range(5000).select(
            (F.col("id") * (n // 5000)).alias("pk"),
            (F.col("id") % 997).alias("grp"),
            (F.col("id") % 555).alias("qty"),
            F.lit(1).cast("long").alias("ver"),
            (F.col("id") % 500 == 0).alias("deleted"),
        )
        batch.write.mode("append").parquet(eng.streams[f"{ns}__fact"].path)
        eng.refresh_stream("fact")
        t = time.time()
        eng.activate_project_incremental(nodes, n_buckets=32)
        res["step"] = round(time.time() - t, 2)
        out[label] = res
        eng.cleanup()
        shutil.rmtree(tmp, ignore_errors=True)
    labels = list(out)
    out["step_ratio"] = (
        round(out[labels[1]]["step"] / out[labels[0]]["step"], 2)
        if out[labels[0]]["step"] > 0.05
        else None
    )
    return out


def probe_midjoin(spark, big_n: int = 2_000_000) -> dict:
    """Mid-graph JOIN stage slope probe (``python tools/scale_probe.py
    midjoin [big_n]``): the r13 composition — GROUP-BY rollup over the
    raw fact stream (emitting) → enrich-JOIN whose fact side consumes the
    rollup's change log → band rollup over the join's view log — through
    ``catalog.activate_project_incremental``, at a 100k-fact and a
    ``big_n``-fact base with the SAME fixed 5k-row churn batch. The
    O(|changes|)-per-edge claim: the join stage's pending read is
    delta-only, its state reads are prune_fold scans, and the churn
    touches a fixed number of groups — expect ``step`` ~flat while
    ``init`` scales with the base."""
    import tempfile
    import time

    from pyspark.sql import functions as F

    from dbt_decodable_spark.catalog import Engine
    from dbt_decodable_spark.schema import StreamSchema

    out: dict = {}
    for label, n in (("100k", 100_000), (f"{big_n // 1000}k", big_n)):
        tmp = tempfile.mkdtemp(prefix=f"probe_midjoin_{label}_")
        ns = f"pmj{label.replace('.', '')}"
        eng = Engine(spark, namespace=ns, warehouse_dir=f"{tmp}/wh")
        os.makedirs(eng.warehouse_dir, exist_ok=True)
        facts = spark.range(n).select(
            F.col("id").alias("pk"),
            (F.col("id") % 997).alias("grp"),
            (F.col("id") % 777).alias("qty"),
            F.lit(0).cast("long").alias("ver"),
            F.lit(False).alias("deleted"),
        )
        eng.create_stream(
            "fact",
            schema=StreamSchema.from_spark(facts.schema, primary_key=["pk"]),
            data=facts,
        )
        dim = spark.range(997).select(
            F.col("id").alias("dk"),
            (F.col("id") % 7).alias("tier"),
            F.lit(0).cast("long").alias("ver"),
            F.lit(False).alias("deleted"),
        )
        eng.create_stream(
            "dim",
            schema=StreamSchema.from_spark(dim.schema, primary_key=["dk"]),
            data=dim,
        )
        eng.create_pipeline(
            "rawroll",
            f"select grp, count(*) as n_rows, sum(qty) as sum_qty "
            f"from {ns}__fact group by grp",
            activate=False,
        )
        eng.create_pipeline(
            "enrich",
            f"select f.*, d.tier as tier "
            f"from {ns}__rawroll f join {ns}__dim d on f.grp = d.dk",
            activate=False,
        )
        eng.create_pipeline(
            "band",
            f"select tier, count(*) as n_grps, sum(sum_qty) as total "
            f"from {ns}__enrich group by tier",
            activate=False,
        )
        nodes = {
            "rawroll": dict(order=["ver"], delete_col="deleted"),
            "enrich": dict(dim_order=["ver"], dim_delete_col="deleted"),
            "band": {},
        }
        res = {}
        t = time.time()
        eng.activate_project_incremental(nodes, n_buckets=32)
        res["init"] = round(time.time() - t, 2)
        batch = spark.range(5000).select(
            (F.col("id") * (n // 5000)).alias("pk"),
            (F.col("id") % 997).alias("grp"),
            (F.col("id") % 555).alias("qty"),
            F.lit(1).cast("long").alias("ver"),
            (F.col("id") % 500 == 0).alias("deleted"),
        )
        batch.write.mode("append").parquet(eng.streams[f"{ns}__fact"].path)
        eng.refresh_stream("fact")
        t = time.time()
        eng.activate_project_incremental(nodes, n_buckets=32)
        res["step"] = round(time.time() - t, 2)
        out[label] = res
        eng.cleanup()
        shutil.rmtree(tmp, ignore_errors=True)
    labels = list(out)
    out["step_ratio"] = (
        round(out[labels[1]]["step"] / out[labels[0]]["step"], 2)
        if out[labels[0]]["step"] > 0.05
        else None
    )
    return out


def probe_temporaldag(spark, big_n: int = 1_000_000) -> dict:
    """Temporal-node engine chain slope probe (``python tools/scale_probe.py
    temporaldag [big_n]``): the r12 FOR SYSTEM_TIME AS OF node kind —
    temporal join (fact × versioned dim) → rollup consuming its view log
    — through ``catalog.activate_project_incremental``, at a 100k-fact
    and a ``big_n``-fact base with the SAME fixed churn batch (5k fact
    rows + 50 new dim versions). ``step`` pins the O(|batch| + fanout)
    claim: the fact state is probed map-side (broadcast semi) and read
    via ``prune_fold`` — expect near-flat."""
    import tempfile
    import time

    from pyspark.sql import functions as F

    from dbt_decodable_spark.catalog import Engine
    from dbt_decodable_spark.schema import StreamSchema

    out: dict = {}
    for label, n in (("100k", 100_000), (f"{big_n // 1000}k", big_n)):
        tmp = tempfile.mkdtemp(prefix=f"probe_tdag_{label}_")
        ns = f"ptd{label.replace('.', '')}"
        eng = Engine(spark, namespace=ns, warehouse_dir=f"{tmp}/wh")
        os.makedirs(eng.warehouse_dir, exist_ok=True)
        facts = spark.range(n).select(
            F.col("id").alias("pk"),
            (F.col("id") % 1000).alias("fk"),
            (F.col("id") % 777).alias("qty"),
            (F.col("id") % 100).alias("ts"),
            F.lit(False).alias("deleted"),
        )
        dims = spark.range(1000).select(
            F.col("id").alias("dk"),
            (F.col("id") % 37).cast("string").alias("seg"),
            F.lit(0).cast("long").alias("vfrom"),
        )
        eng.create_stream(
            "fact",
            schema=StreamSchema.from_spark(facts.schema, primary_key=["pk"]),
            data=facts,
        )
        eng.create_stream(
            "dim",
            schema=StreamSchema.from_spark(dims.schema, primary_key=["dk"]),
            data=dims,
        )
        eng.create_pipeline(
            "asof",
            f"select f.*, d.seg as seg_at_ts from {ns}__fact f "
            f"left join {ns}__dim for system_time as of f.ts as d "
            f"on f.fk = d.dk",
            activate=False,
        )
        eng.create_pipeline(
            "troll",
            f"select seg_at_ts, count(*) as n_rows, sum(qty) as sum_qty "
            f"from {ns}__asof group by seg_at_ts",
            activate=False,
        )
        nodes = {
            "asof": dict(
                fact_order=["ts"], fact_delete_col="deleted",
                dim_valid_from="vfrom",
            ),
            "troll": {},
        }
        res = {}
        t = time.time()
        eng.activate_project_incremental(nodes, n_buckets=32)
        res["init"] = round(time.time() - t, 2)
        batch = spark.range(5000).select(
            (F.col("id") * (n // 5000)).alias("pk"),
            (F.col("id") % 1000).alias("fk"),
            (F.col("id") % 555).alias("qty"),
            F.lit(150).cast("long").alias("ts"),
            (F.col("id") % 500 == 0).alias("deleted"),
        )
        dbatch = spark.range(50).select(
            (F.col("id") * 20).alias("dk"),
            F.lit("UPD").alias("seg"),
            F.lit(120).cast("long").alias("vfrom"),
        )
        batch.write.mode("append").parquet(eng.streams[f"{ns}__fact"].path)
        dbatch.write.mode("append").parquet(eng.streams[f"{ns}__dim"].path)
        eng.refresh_stream("fact")
        eng.refresh_stream("dim")
        t = time.time()
        eng.activate_project_incremental(nodes, n_buckets=32)
        res["step"] = round(time.time() - t, 2)
        out[label] = res
        eng.cleanup()
        shutil.rmtree(tmp, ignore_errors=True)
    labels = list(out)
    out["step_ratio"] = (
        round(out[labels[1]]["step"] / out[labels[0]]["step"], 2)
        if out[labels[0]]["step"] > 0.05
        else None
    )
    return out


def probe_temporaldim(spark, big_v: int = 1_000_000) -> dict:
    """Dim-HISTORY-axis slope probe for the temporal node kind (``python
    tools/scale_probe.py temporaldim [big_versions]``): fixed 100k facts
    and a fixed churn batch, dim version history grown 10k → ``big_v``
    rows (1000 keys × many versions). Pins the r12 touched-key SCD2
    prune: per-batch dim cost is O(touched keys' history), so the step
    should stay ~flat while the history grows 100× — without the prune
    every micro-batch re-folds the whole history through the SCD2
    window."""
    import tempfile
    import time

    from pyspark.sql import functions as F

    from dbt_decodable_spark.catalog import Engine
    from dbt_decodable_spark.schema import StreamSchema

    out: dict = {}
    n = 100_000
    for label, nv in (("10k", 10_000), (f"{big_v // 1000}k", big_v)):
        tmp = tempfile.mkdtemp(prefix=f"probe_tdim_{label}_")
        ns = f"ptv{label.replace('.', '')}"
        eng = Engine(spark, namespace=ns, warehouse_dir=f"{tmp}/wh")
        os.makedirs(eng.warehouse_dir, exist_ok=True)
        facts = spark.range(n).select(
            F.col("id").alias("pk"),
            (F.col("id") % 1000).alias("fk"),
            (F.col("id") % 777).alias("qty"),
            (F.col("id") % 100).alias("ts"),
            F.lit(False).alias("deleted"),
        )
        # nv versions over 1000 keys, valid_from strictly increasing per
        # key (the scd2 contract) and NORMALIZED to the same 0..~1000
        # range at both scales so the churn's affected-fact fanout is
        # identical — only the history SIZE varies
        vstep = max(1, 1000 // (nv // 1000))
        dims = spark.range(nv).select(
            (F.col("id") % 1000).alias("dk"),
            (F.col("id") % 37).cast("string").alias("seg"),
            (F.expr("id div 1000") * vstep).cast("long").alias("vfrom"),
        )
        eng.create_stream(
            "fact",
            schema=StreamSchema.from_spark(facts.schema, primary_key=["pk"]),
            data=facts,
        )
        eng.create_stream(
            "dim",
            schema=StreamSchema.from_spark(dims.schema, primary_key=["dk"]),
            data=dims,
        )
        eng.create_pipeline(
            "asof",
            f"select f.*, d.seg as seg_at_ts from {ns}__fact f "
            f"left join {ns}__dim for system_time as of f.ts as d "
            f"on f.fk = d.dk",
            activate=False,
        )
        nodes = {
            "asof": dict(
                fact_order=["ts"], fact_delete_col="deleted",
                dim_valid_from="vfrom",
            ),
        }
        res = {}
        t = time.time()
        eng.activate_project_incremental(nodes, n_buckets=32)
        res["init"] = round(time.time() - t, 2)
        batch = spark.range(5000).select(
            (F.col("id") * (n // 5000)).alias("pk"),
            (F.col("id") % 1000).alias("fk"),
            (F.col("id") % 555).alias("qty"),
            F.lit(10 ** 9).cast("long").alias("ts"),
            (F.col("id") % 500 == 0).alias("deleted"),
        )
        dbatch = spark.range(50).select(
            (F.col("id") * 20).alias("dk"),
            F.lit("UPD").alias("seg"),
            F.lit(2000).cast("long").alias("vfrom"),
        )
        batch.write.mode("append").parquet(eng.streams[f"{ns}__fact"].path)
        dbatch.write.mode("append").parquet(eng.streams[f"{ns}__dim"].path)
        eng.refresh_stream("fact")
        eng.refresh_stream("dim")
        t = time.time()
        eng.activate_project_incremental(nodes, n_buckets=32)
        res["step"] = round(time.time() - t, 2)
        out[label] = res
        eng.cleanup()
        shutil.rmtree(tmp, ignore_errors=True)
    labels = list(out)
    out["step_ratio"] = (
        round(out[labels[1]]["step"] / out[labels[0]]["step"], 2)
        if out[labels[0]]["step"] > 0.05
        else None
    )
    return out


def probe_temporal(spark, big_n: int = 2_000_000) -> dict:
    """SCD2-temporal IVM slope probe (``python tools/scale_probe.py
    temporal [big_n]``): one :func:`ivm_temporal.maintain_temporal_join`
    step with a FIXED churn batch (5k fact upserts + a 50-key dim version
    batch whose fanout is bounded by construction) against 100k- and
    ``big_n``-fact snapshots. Pins the O(|batch| + version fanout) claim
    for the VIEW work: the fact snapshot is only broadcast-probed
    (semi/anti joins — scans, never shuffles) and the AS-OF recompute
    shuffles the touched slice. Rows:

    - ``view_step`` — the step with a caller-advanced snapshot
      (``snapshot_after``, the production contract): should stay ~flat
      across the ≥20× state growth;
    - ``step_fold`` — the convenience fallback that folds the whole
      snapshot ∪ batch: an O(|fact|) key shuffle per batch, measured
      here precisely so the difference is on record (the first probe run
      caught it costing MORE than the recompute — the reason
      ``snapshot_after`` exists);
    - ``recompute`` — the from-base control (full SCD2 rebuild + AS-OF
      join of ALL facts) a non-incremental design would pay per batch."""
    import time

    from pyspark.sql import functions as F

    from dbt_decodable_spark.operators.ivm_temporal import (
        TemporalJoinSpec,
        init_temporal_join_state,
        maintain_temporal_join,
        recompute_temporal_view,
    )

    spec = TemporalJoinSpec(
        fact_keys=("pk",), fk_col="fk", dim_key="dk",
        fact_ts="ts", valid_from="vfrom",
        payload={"seg_at_ts": "seg"},
    )
    order = ["ver", "pk"]
    out: dict = {}
    for label, n in (("100k", 100_000), (f"{big_n // 1000}k", big_n)):
        facts = spark.range(n).select(
            F.col("id").alias("pk"),
            (F.col("id") % 1000).alias("fk"),
            (F.col("id") % 777).alias("qty"),
            (F.col("id") % 500_000).alias("ts"),
            F.lit(0).cast("long").alias("ver"),
            F.lit(False).alias("deleted"),
        )
        dims = spark.range(1000).select(
            F.col("id").alias("dk"),
            (F.col("id") % 37).cast("string").alias("seg"),
            F.lit(0).cast("long").alias("vfrom"),
        )
        st = init_temporal_join_state(
            facts, dims, spec, fact_delete_col="deleted"
        )
        st = type(st)(
            fact=st.fact.localCheckpoint(eager=True),
            dim_versions=st.dim_versions.localCheckpoint(eager=True),
            view=st.view.localCheckpoint(eager=True),
        )
        fb = spark.range(5000).select(
            (F.col("id") * (n // 5000)).alias("pk"),
            (F.col("id") % 1000).alias("fk"),
            (F.col("id") % 555).alias("qty"),
            (F.col("id") % 500_000).alias("ts"),
            F.lit(1).cast("long").alias("ver"),
            (F.col("id") % 500 == 0).alias("deleted"),
        )
        # 50 dim keys get a LATE version (vfrom near the ts ceiling) so
        # the range fanout stays bounded — the production shape; the
        # bulk low-vfrom backfill case is the broadcast_touched=False path
        db = spark.range(50).select(
            (F.col("id") * 20).alias("dk"),
            F.lit("UPD").alias("seg"),
            F.lit(499_000).cast("long").alias("vfrom"),
        )
        # the production contract: the caller's MERGE advanced the
        # snapshot (bucketed partition-overwrite at scale); here the
        # merged result is pre-materialized so the timed step carries
        # only the VIEW work
        from dbt_decodable_spark.streaming.changelog import fold_last_image

        snap_after = fold_last_image(
            st.fact.unionByName(fb), ["pk"], order
        ).localCheckpoint(eager=True)
        res = {}
        t = time.time()
        st2 = maintain_temporal_join(
            st, fb, db, order, spec, fact_delete_col="deleted",
            snapshot_after=snap_after,
        )
        st2.view.write.format("noop").mode("overwrite").save()
        res["view_step"] = round(time.time() - t, 2)
        t = time.time()
        st3 = maintain_temporal_join(
            st, fb, db, order, spec, fact_delete_col="deleted"
        )
        st3.view.write.format("noop").mode("overwrite").save()
        res["step_fold"] = round(time.time() - t, 2)
        t = time.time()
        recompute_temporal_view(
            facts.unionByName(fb),
            dims.unionByName(db),
            spec, order, fact_delete_col="deleted",
        ).write.format("noop").mode("overwrite").save()
        res["recompute"] = round(time.time() - t, 2)
        out[label] = res
    labels = list(out)
    out["view_step_ratio"] = (
        round(out[labels[1]]["view_step"] / out[labels[0]]["view_step"], 2)
        if out[labels[0]]["view_step"] > 0.05
        else None
    )
    return out


def probe_outlog(spark) -> dict:
    """Out-log compaction slope probe (``python tools/scale_probe.py
    outlog``): ``compact_change_log`` over emitted-change logs of 20 and
    400 batch files (20x history, same 50k live keys). Pins the cost
    model: compaction is one fold of the folded-file set — O(|log|) in
    the history it retires, not O(|keys|²) or worse — and a fresh
    consumer's bootstrap read drops from O(history) to O(live keys)."""
    import tempfile
    import time

    from pyspark.sql import functions as F

    from dbt_decodable_spark.streaming.changelog import (
        append_delta,
        compact_change_log,
        list_deltas,
    )

    out: dict = {}
    for label, n_batches in (("20f", 20), ("400f", 400)):
        tmp = tempfile.mkdtemp(prefix=f"probe_outlog_{label}_")
        log = f"{tmp}/out"
        per = 50_000 // 20  # 2.5k keys churned per batch, 50k key space
        for b in range(n_batches):
            batch = spark.range(per).select(
                (F.col("id") + (b % 20) * per).alias("k"),
                (F.col("id") * b % 1000).alias("v"),
                F.lit(b).cast("long").alias("__seq"),
                ((F.col("id") + b) % 50 == 0).alias("__deleted"),
            )
            append_delta(spark, log, batch, tag=str(b))
        res = {"files": len(list_deltas(log))}
        t = time.time()
        stats = compact_change_log(spark, log, ["k"])
        res["compact_s"] = round(time.time() - t, 2)
        res["live_rows"] = stats["live_rows"]
        t = time.time()
        spark.read.parquet(*list_deltas(log)).count()
        res["bootstrap_s"] = round(time.time() - t, 2)
        out[label] = res
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def probe_ivminit(spark, n: int = 1_000_000) -> dict:
    """Aggregate-arm first-activation probe (``python tools/scale_probe.py
    ivminit [n]``): measures (a) first activation under the r10 init
    protocol (no-op offset advance + snapshot fold, NO maintenance replay)
    and (b) a source-sized maintenance pass — the term the old init paid a
    second time by leaving the checkpoint fresh. The old first activation
    cost ≈ (a) + (b); the eliminated term scales with |source|."""
    import tempfile
    import time

    from pyspark.sql import functions as F

    from dbt_decodable_spark.catalog import Engine
    from dbt_decodable_spark.schema import StreamSchema

    tmp = tempfile.mkdtemp(prefix="probe_ivminit_")
    eng = Engine(spark, namespace="pri", warehouse_dir=f"{tmp}/wh")
    os.makedirs(eng.warehouse_dir, exist_ok=True)

    def rows(ts):
        return spark.range(n).select(
            F.col("id").alias("pk"),
            (F.col("id") % 1000).cast("string").alias("grp"),
            ((F.col("id") + ts) % 97).alias("val"),
            F.lit(ts).cast("long").alias("ts"),
        )

    src = rows(1)
    eng.create_stream(
        "src",
        schema=StreamSchema.from_spark(src.schema, primary_key=["pk"]),
        data=src,
    )
    eng.create_pipeline(
        "agg",
        "select grp, count(*) as n, sum(val) as sum_val "
        "from pri__src group by grp",
        activate=False,
    )
    t0 = time.time()
    eng.activate_pipeline_incremental("agg", order=["ts"])
    t_init = time.time() - t0
    rows(2).write.mode("append").parquet(eng.streams["pri__src"].path)
    eng.refresh_stream("src")
    t0 = time.time()
    eng.activate_pipeline_incremental("agg", order=["ts"])
    t_pass = time.time() - t0
    eng.cleanup()
    shutil.rmtree(tmp, ignore_errors=True)
    return {
        "n_rows": n,
        "first_activation_s": round(t_init, 2),
        "source_sized_maintenance_pass_s": round(t_pass, 2),
        "old_first_activation_est_s": round(t_init + t_pass, 2),
    }


def main() -> None:
    from dbt_decodable_spark.session import get_spark

    if len(sys.argv) > 1 and sys.argv[1] == "ivmjoin":
        spark = get_spark(app_name="scale_probe_ivmjoin")
        print(json.dumps({"ivmjoin": probe_ivmjoin(spark)}))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "ivmdag":
        spark = get_spark(app_name="scale_probe_ivmdag")
        print(json.dumps({"ivmdag": probe_ivmdag(spark)}))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "dag":
        spark = get_spark(app_name="scale_probe_dag")
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
        print(json.dumps({"dag": probe_dag(spark, n)}))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "rawdag":
        spark = get_spark(app_name="scale_probe_rawdag")
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
        print(json.dumps({"rawdag": probe_rawdag(spark, n)}))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "midjoin":
        spark = get_spark(app_name="scale_probe_midjoin")
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
        print(json.dumps({"midjoin": probe_midjoin(spark, n)}))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "temporaldag":
        spark = get_spark(app_name="scale_probe_temporaldag")
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
        print(json.dumps({"temporaldag": probe_temporaldag(spark, n)}))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "temporaldim":
        spark = get_spark(app_name="scale_probe_temporaldim")
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
        print(json.dumps({"temporaldim": probe_temporaldim(spark, n)}))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "temporal":
        spark = get_spark(app_name="scale_probe_temporal")
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
        print(json.dumps({"temporal": probe_temporal(spark, n)}))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "outlog":
        spark = get_spark(app_name="scale_probe_outlog")
        print(json.dumps({"outlog": probe_outlog(spark)}))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "ivminit":
        spark = get_spark(app_name="scale_probe_ivminit")
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
        print(json.dumps({"ivminit": probe_ivminit(spark, n)}))
        return
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    spark = get_spark(app_name="scale_probe")
    scaled_dir = build_scaled(spark, rep)
    emb_scaled = build_scaled_embeddings(spark, rep)
    n_docs = spark.read.parquet(f"{scaled_dir}/documents.parquet").count()
    base = probes(spark, BASE)
    scaled = probes(spark, scaled_dir)
    base.update(probes_sim(spark, f"{BASE}/embeddings.parquet"))
    scaled.update(probes_sim(spark, emb_scaled))
    ratio = {
        k: (round(scaled[k] / base[k], 1) if base[k] > 0.05 else None)
        for k in base
    }
    print(json.dumps(
        {"replication": rep, "n_docs": n_docs, "base_s": base,
         "scaled_s": scaled, "ratio": ratio}
    ))


if __name__ == "__main__":
    main()
