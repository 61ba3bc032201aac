"""Round-13 optimization pins: every change in this round is a
lineage/materialization change that must NOT alter results. Each test
pins the optimized path against the naive recompute of the same math.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

# Uses the shared session fixture from conftest.py. A module-local
# get_spark() here would getOrCreate() AGAINST the already-running test
# session and re-apply its default shuffle_partitions (max(cpus,32)) to
# it, silently overriding conftest's 4 for every later test file — this
# broke test_round9's bucketed co-partition plan pin in the full run.


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestKmeansCheckpoint:
    def test_fit_matches_uncheckpointed_recurrence(self, spark):
        """kmeans_fit's centroid localCheckpoint (r13) must return exactly
        the centroids/assignments of the plain unrolled recurrence."""
        from dbt_decodable_spark.operators.clustering import (
            _assign,
            _update,
            init_centroids,
            kmeans_fit,
            quantize_to_grid,
        )

        vecs = spark.range(60).select(
            F.col("id").alias("vec_id"),
            F.array(
                (F.col("id") % 7).cast("float"),
                (F.col("id") % 11).cast("float"),
                (F.col("id") % 3).cast("float"),
            ).alias("embedding"),
        )
        cent, assigned = kmeans_fit(vecs, k=4, iters=2, init_mod=5)

        # naive recurrence, no checkpoint
        q = vecs.select(
            F.col("vec_id").cast("long").alias("vec_id"),
            quantize_to_grid(F.col("embedding")).alias("qv"),
        )
        c = init_centroids(q, 4, 5)
        for _ in range(2):
            c = _update(_assign(q, c))
        assert _rows(cent) == _rows(c)
        assert _rows(assigned) == _rows(_assign(q, c))


class TestMinhashSplitHelpers:
    def test_signatures_from_shingles_equals_direct(self, spark):
        from dbt_decodable_spark.operators.dedup import (
            minhash_signatures,
            minhash_signatures_from_shingles,
            shingle_strings,
        )

        docs = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "the quick brown fox jumps over a lazy dog"),
                (3, "completely different text with no overlap at all"),
                (4, ""),
            ],
            "doc_id long, text string",
        )
        direct = minhash_signatures(docs, "doc_id", "text", n=3, num_hashes=4)
        sh = shingle_strings(docs, "doc_id", "text", 3)
        via = minhash_signatures_from_shingles(
            sh.select("id", "shingle"), num_hashes=4
        )
        assert _rows(direct) == _rows(via)

    def test_lsh_pairs_from_signatures_equals_candidates(self, spark):
        from dbt_decodable_spark.operators.dedup import (
            lsh_pairs_from_signatures,
            minhash_lsh_candidates,
            minhash_signatures,
        )

        docs = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon zeta"),
                (2, "alpha beta gamma delta epsilon eta"),
                (3, "one two three four five six"),
                (4, "one two three four five seven"),
            ],
            "doc_id long, text string",
        )
        direct = minhash_lsh_candidates(docs, "doc_id", "text", 3, 4)
        sig = minhash_signatures(docs, "doc_id", "text", 3, 4).localCheckpoint(
            eager=True
        )
        for link in ("pairs", "star"):
            want = _rows(
                minhash_lsh_candidates(docs, "doc_id", "text", 3, 4, link=link)
            )
            got = _rows(lsh_pairs_from_signatures(sig, link=link))
            assert got == want
        assert _rows(direct)  # non-empty: the near-dup pairs exist

    def test_verified_pairs_matches_manual_jaccard(self, spark):
        """The r13 single-materialization verify path must produce the
        exact jaccard of the shingle sets."""
        from dbt_decodable_spark.operators.dedup import (
            minhash_verified_pairs,
            shingle_strings,
        )

        docs = spark.createDataFrame(
            [
                (1, "w1 w2 w3 w4 w5 w6"),
                (2, "w1 w2 w3 w4 w5 zz"),
                (3, "a b c d e f"),
            ],
            "doc_id long, text string",
        )
        out = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in minhash_verified_pairs(
                docs, "doc_id", "text", n=3, num_hashes=6, threshold=0.0
            ).collect()
        }
        sh = {
            i: {
                r["shingle"]
                for r in shingle_strings(docs, "doc_id", "text", 3)
                .filter(F.col("id") == i)
                .collect()
            }
            for i in (1, 2, 3)
        }
        if (1, 2) in out:
            inter = len(sh[1] & sh[2])
            union = len(sh[1] | sh[2])
            assert out[(1, 2)] == pytest.approx(inter / union)
        # docs 1/3 share nothing — never verified
        assert (1, 3) not in out


class TestTextMaterializeOnce:
    def test_bigram_commonness_preagg_equals_occurrence_sum(self, spark):
        """bigram_commonness's r13 (id, gram, n) pre-aggregate must produce
        the exact integers of the per-occurrence plan: cf summed over
        occurrences, n_bigrams as the occurrence count, NULL commonness for
        <2-token docs."""
        from dbt_decodable_spark.operators.text import (
            bigram_commonness,
            ngrams_from_tokens,
        )
        from dbt_decodable_spark.operators.dedup import tokens

        docs = spark.createDataFrame(
            [
                (1, "a b a b a"),      # repeated bigrams within one doc
                (2, "a b c"),
                (3, "single"),          # 1 token -> no bigrams, NULL score
                (4, ""),
                (5, "c a b c a"),
            ],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: (r["n_bigrams"], r["total_cf"], r["commonness"])
            for r in bigram_commonness(docs, "doc_id", "text").collect()
        }
        # naive per-occurrence recompute
        grams = docs.select(
            "doc_id",
            F.explode(ngrams_from_tokens(tokens("text"), 2)).alias("gram"),
        )
        cf = {
            r["gram"]: r["cf"]
            for r in grams.groupBy("gram").agg(F.count(F.lit(1)).alias("cf")).collect()
        }
        occ = grams.collect()
        want: dict = {}
        for r in occ:
            n, t = want.get(r["doc_id"], (0, 0))
            want[r["doc_id"]] = (n + 1, t + cf[r["gram"]])
        for did in (1, 2, 3, 4, 5):
            n, t = want.get(did, (0, 0))
            exp = (n, t, (t / n) if n else None)
            assert got[did] == pytest.approx(exp) if n else got[did] == (0, 0, None)

    def test_salient_terms_rank_stable(self, spark):
        """salient_terms' r13 tf checkpoint must not change scores/ranks."""
        from dbt_decodable_spark.operators.text import salient_terms

        docs = spark.createDataFrame(
            [
                (1, "x x y z"),
                (2, "y z z w"),
                (3, "w w w q"),
            ],
            "doc_id long, text string",
        )
        rows = {
            (r["doc_id"], r["rank"]): (r["term"], r["tf"], r["score"])
            for r in salient_terms(docs, "doc_id", "text", k=2).collect()
        }
        # doc 1: x tf=2 df=1 -> score 2*(3-1)=4; y tf=1 df=2 -> 1; z tf=1 df=2 -> 1
        assert rows[(1, 1)] == ("x", 2, 4)
        assert rows[(1, 2)] == ("y", 1, 1)  # tie with z broken by term asc
        # doc 3: w tf=3 df=2 -> 3; q tf=1 df=1 -> 2
        assert rows[(3, 1)] == ("w", 3, 3)
        assert rows[(3, 2)] == ("q", 1, 2)


class TestTemporalRoundCheckpoint:
    def test_round_equals_recompute_after_checkpoint(self, spark):
        """_temporal_round's r13 lazy checkpoints (fold fallback + touched
        set) must leave the maintained view equal to the from-base
        recompute, including tombstones and out-of-order churn."""
        from dbt_decodable_spark.operators.ivm_temporal import (
            TemporalJoinSpec,
            init_temporal_join_state,
            maintain_temporal_join,
            recompute_temporal_view,
        )

        spec = TemporalJoinSpec(
            fact_keys=("pk",),
            fk_col="fk",
            dim_key="dk",
            fact_ts="ts",
            valid_from="vf",
            payload={"pay": "val"},
        )
        fact0 = spark.createDataFrame(
            [(1, 10, 5, 0, False), (2, 20, 7, 0, False)],
            "pk long, fk long, ts long, ver long, deleted boolean",
        )
        dim0 = spark.createDataFrame(
            [(10, 1, "a"), (20, 1, "b")], "dk long, vf long, val string"
        )
        st = init_temporal_join_state(fact0, dim0, spec, fact_delete_col="deleted")
        batch = spark.createDataFrame(
            [
                (3, 10, 9, 0, False),   # new fact
                (1, 20, 6, 1, False),   # fk migration, later version wins
                (2, 20, 7, 1, True),    # tombstone
            ],
            "pk long, fk long, ts long, ver long, deleted boolean",
        )
        dimb = spark.createDataFrame([(10, 8, "a2")], "dk long, vf long, val string")
        st2 = maintain_temporal_join(
            st, batch, dimb, ["ver", "pk"], spec, fact_delete_col="deleted"
        )
        want = recompute_temporal_view(
            st2.fact, dim0.unionByName(dimb), spec, ["ver", "pk"],
            fact_delete_col="deleted",
        )
        assert _rows(st2.view.select(*want.columns)) == _rows(want)
