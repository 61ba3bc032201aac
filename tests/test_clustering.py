"""Exact-integer k-means (operators/clustering.py), epoch upsampling, and
per-stratum reservoir sampling: cross-checked against independent Python
reference implementations, plus determinism/partition-independence."""

import math

import pytest

from dbt_decodable_spark.operators.clustering import kmeans_lloyd, quantize_to_grid
from dbt_decodable_spark.operators.mixing import epoch_upsample
from dbt_decodable_spark.operators.sampling import reservoir_per_stratum
from dbt_decodable_spark.sources.tables import read_table

SF = "/root/testdata/sf0.001"


def _py_kmeans(vecs: dict, k: int, iters: int, init_mod: int):
    """Reference Lloyd on quantized integer grids, pure Python."""
    q = {
        i: [math.floor(float(x) * 1024 + 0.5) + 1024 for x in v]
        for i, v in vecs.items()
    }
    seeds = sorted(i for i in q if i % init_mod == 0)[:k]
    cents = {c: q[i] for c, i in enumerate(seeds)}

    def assign():
        out = {}
        for i, v in q.items():
            best = min(
                (sum((a - b) ** 2 for a, b in zip(v, cv)), cid)
                for cid, cv in cents.items()
            )
            out[i] = best  # (dist2, cid)
        return out

    for _ in range(iters):
        a = assign()
        sums, counts = {}, {}
        for i, (_, cid) in a.items():
            counts[cid] = counts.get(cid, 0) + 1
            s = sums.setdefault(cid, [0] * len(q[i]))
            for d, v in enumerate(q[i]):
                s[d] += v
        cents = {
            cid: [(2 * s[d] + counts[cid]) // (2 * counts[cid]) for d in range(len(s))]
            for cid, s in sums.items()
        }
    return assign()


class TestKmeansLloyd:
    @pytest.fixture(scope="class")
    def emb(self, spark):
        return read_table(spark, SF, "embeddings").select("vec_id", "embedding")

    def test_matches_python_reference(self, spark, emb):
        rows = {r.vec_id: list(r.embedding) for r in emb.collect()}
        # small sf has few ids divisible by 61 — use a denser seed predicate
        ref = _py_kmeans(rows, k=4, iters=2, init_mod=7)
        got = {
            r.vec_id: (r.dist2, r.centroid_id)
            for r in kmeans_lloyd(emb, k=4, iters=2, init_mod=7).collect()
        }
        assert got == ref

    def test_partition_independent(self, spark, emb):
        a = sorted(map(tuple, kmeans_lloyd(emb, k=4, iters=1, init_mod=7).collect()))
        b = sorted(
            map(
                tuple,
                kmeans_lloyd(emb.repartition(13), k=4, iters=1, init_mod=7).collect(),
            )
        )
        assert a == b

    def test_every_vector_assigned_once(self, spark, emb):
        n = emb.count()
        out = kmeans_lloyd(emb, k=4, iters=1, init_mod=7)
        assert out.count() == n
        assert out.select("vec_id").distinct().count() == n
        assert out.select("centroid_id").distinct().count() <= 4

    def test_quantization_exact(self, spark):
        df = spark.createDataFrame([([0.5, -0.25, 0.0009765625],)], "v array<float>")
        [r] = df.select(quantize_to_grid("v").alias("q")).collect()
        # 0.5*1024=512(+.5 floor→512)+1024; -0.25*1024=-256+1024; 1/1024→1+1024
        assert r.q == [1536, 768, 1025]


class TestEpochUpsample:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        return read_table(spark, SF, "documents").select("doc_id", "lang")

    def test_copy_counts_bounded(self, spark, docs):
        out = epoch_upsample(docs, "lang", "doc_id", {"en": 2.25}, default_epochs=1.0)
        per = {
            (r.doc_id, r.lang): r.cnt
            for r in out.groupBy("doc_id", "lang").count().withColumnRenamed("count", "cnt").collect()
        }
        for (_, lang), c in per.items():
            assert c in (2, 3) if lang == "en" else c == 1

    def test_copy_indices_contiguous(self, spark, docs):
        out = epoch_upsample(docs, "lang", "doc_id", {"en": 2.5}, default_epochs=1.0)
        bad = (
            out.groupBy("doc_id")
            .agg({"epoch_copy": "max", "*": "count"})
            .where("`max(epoch_copy)` != `count(1)` - 1")
        )
        assert bad.count() == 0

    def test_nested_under_rate_increase(self, spark, docs):
        lo = epoch_upsample(docs, "lang", "doc_id", {"en": 1.2}, default_epochs=0.5)
        hi = epoch_upsample(docs, "lang", "doc_id", {"en": 1.3}, default_epochs=0.6)
        lo_set = {(r.doc_id, r.epoch_copy) for r in lo.collect()}
        hi_set = {(r.doc_id, r.epoch_copy) for r in hi.collect()}
        assert lo_set <= hi_set

    def test_zero_epochs_drops_stratum(self, spark, docs):
        out = epoch_upsample(docs, "lang", "doc_id", {"en": 0.0}, default_epochs=1.0)
        assert out.filter("lang = 'en'").count() == 0


class TestReservoirPerStratum:
    def test_exact_size_and_stability(self, spark):
        docs = read_table(spark, SF, "documents").select("doc_id", "source")
        out = reservoir_per_stratum(docs, "source", "doc_id", n=3)
        sizes = {
            r.source: r.cnt
            for r in out.groupBy("source").count().withColumnRenamed("count", "cnt").collect()
        }
        pop = {
            r.source: r.cnt
            for r in docs.groupBy("source").count().withColumnRenamed("count", "cnt").collect()
        }
        assert sizes == {s: min(3, c) for s, c in pop.items()}
        re = reservoir_per_stratum(docs.repartition(11), "source", "doc_id", n=3)
        assert sorted(map(tuple, out.collect())) == sorted(map(tuple, re.collect()))


class TestIvfKmeans:
    def test_recall_vs_bruteforce(self, spark):
        from dbt_decodable_spark.operators.clustering import ivf_topk_kmeans
        from dbt_decodable_spark.operators.similarity import cosine
        from pyspark.sql import Window, functions as F

        e = read_table(spark, SF, "embeddings").select("vec_id", "embedding")
        q = e.filter("vec_id < 5")
        ann = ivf_topk_kmeans(e, q, k=5, n_clusters=4, n_probe=2, iters=1, init_mod=7)
        got = {(r.query_id, r.neighbor_id) for r in ann.collect()}
        # exact brute-force top-5 per query
        bf = (
            q.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
            .crossJoin(e.select(F.col("vec_id").alias("nid"), F.col("embedding").alias("nv")))
            .filter("query_id != nid")
            .withColumn("s", cosine(F.col("qv"), F.col("nv")))
        )
        w = Window.partitionBy("query_id").orderBy(F.col("s").desc(), F.col("nid"))
        exact = {
            (r.query_id, r.nid)
            for r in bf.withColumn("rk", F.row_number().over(w)).filter("rk <= 5").collect()
        }
        recall = len(got & exact) / len(exact)
        assert recall >= 0.4  # 2-of-4 probe: at least the local cells agree
        assert ann.groupBy("query_id").count().filter("count > 5").count() == 0

    def test_partition_independent(self, spark):
        from dbt_decodable_spark.operators.clustering import ivf_topk_kmeans

        e = read_table(spark, SF, "embeddings").select("vec_id", "embedding")
        q = e.filter("vec_id < 5")
        a = sorted(map(tuple, ivf_topk_kmeans(e, q, k=3, n_clusters=4, n_probe=2, iters=1, init_mod=7).collect()))
        b = sorted(map(tuple, ivf_topk_kmeans(e.repartition(9), q, k=3, n_clusters=4, n_probe=2, iters=1, init_mod=7).collect()))
        assert a == b


class TestImportanceSample:
    def test_weight_semantics(self, spark):
        from dbt_decodable_spark.operators.sampling import importance_sample

        df = spark.createDataFrame(
            [(i, w) for i in range(300) for w in (0, 500, 1000, 2000, 5000)],
            "id long, w long",
        )
        kept = importance_sample(df, "id", "w", scale=2000)
        per_w = {r.w: r.cnt for r in kept.groupBy("w").count().withColumnRenamed("count", "cnt").collect()}
        assert 0 not in per_w                       # zero weight never kept
        assert per_w[2000] == 300 and per_w[5000] == 300  # >= scale always kept
        assert 0 < per_w[500] < per_w[1000] < 300   # monotone in weight
        # nested: a doc kept at w is kept at any w' > w
        k500 = {r.id for r in kept.filter("w = 500").collect()}
        k1000 = {r.id for r in kept.filter("w = 1000").collect()}
        assert k500 <= k1000


class TestOutlierFilter:
    """cluster_outlier_filter: keep each cluster's closer-than-median half
    of the exact-integer Lloyd assignment (queries/extensions3.py)."""

    @pytest.fixture(scope="class")
    def parts(self, spark):
        from dbt_decodable_spark.queries import load_all

        reg = load_all()
        kept = reg["cluster_outlier_filter"].fn(spark, SF)
        emb = read_table(spark, SF, "embeddings").select("vec_id", "embedding")
        assigned = kmeans_lloyd(emb, k=8, iters=2, init_mod=61)
        return (
            {r.vec_id: (r.centroid_id, r.dist2) for r in kept.collect()},
            {r.vec_id: (r.centroid_id, r.dist2) for r in assigned.collect()},
        )

    def test_subset_of_assignment(self, parts):
        kept, assigned = parts
        assert kept
        for vid, row in kept.items():
            assert assigned[vid] == row

    def test_per_cluster_median_cut(self, parts):
        kept, assigned = parts
        by_cluster: dict = {}
        for vid, (cid, d2) in assigned.items():
            by_cluster.setdefault(cid, []).append((d2, vid))
        for cid, members in by_cluster.items():
            members.sort()
            n = len(members)
            thr = members[(n + 1) // 2 - 1][0]  # value at rank ceil(n/2)
            expect = {vid for d2, vid in members if d2 <= thr}
            got = {vid for vid, (c, _) in kept.items() if c == cid}
            assert got == expect
