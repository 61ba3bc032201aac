"""Unit tests for the [X] extension operators on controlled synthetic data —
known near-dups, known neighbors — so semantic properties (recall, exactness,
determinism) are asserted directly rather than only via the oracle."""

import pytest
from pyspark.sql import functions as F

from dbt_decodable_spark.operators import asof, dedup, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
        (3, "THE  QUICK   brown fox jumps over the lazy dog"),  # exact dup of 1 (normalized)
        (4, "completely different words entirely unrelated content here"),
        (5, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestExactDedup:
    def test_normalized_exact_groups(self, docs):
        out = {(r["doc_id"], r["n_copies"]) for r in dedup.exact_dedup(docs, "text", "doc_id").collect()}
        # 1, 3, 5 normalize to the same text → representative min id 1, 3 copies
        assert (1, 3) in out and (2, 1) in out and (4, 1) in out


class TestJaccard:
    def test_near_dup_pair_found(self, docs):
        pairs = dedup.shingle_pairs_jaccard(docs, "doc_id", "text", n=3, threshold=0.5)
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        # the exact-dup triplet pairs and the near-dup pair must all clear 0.5
        assert {(1, 3), (1, 5), (3, 5), (1, 2)} <= got
        assert not any(4 in p for p in got)

    def test_prefix_and_inverted_agree(self, docs):
        a = dedup.shingle_pairs_jaccard(docs, "doc_id", "text", threshold=0.5, method="prefix")
        b = dedup.shingle_pairs_jaccard(docs, "doc_id", "text", threshold=0.5, method="inverted")
        ra = {(r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in a.collect()}
        rb = {(r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in b.collect()}
        assert ra == rb

    def test_jaccard_value_exact(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c d e"), (2, "a b c d x")], "doc_id long, text string"
        )
        # 3-shingles: {abc,bcd,cde} vs {abc,bcd,cdx} → inter 2, union 4 → 0.5
        rows = dedup.shingle_pairs_jaccard(df, "doc_id", "text", threshold=0.4).collect()
        assert len(rows) == 1 and rows[0]["jaccard"] == 0.5


class TestCosineDedup:
    def test_min_id_wins_pairwise_suppression(self, spark):
        corpus = spark.createDataFrame(
            [(i, [1.0, 0.0]) for i in (1, 2, 3)] + [(4, [0.0, 1.0])],
            "vec_id long, embedding array<double>",
        )
        # near-dup pairs (id_a < id_b): 1-2, 1-3, 2-3 → 2 and 3 suppressed
        pairs = spark.createDataFrame(
            [(1, 2), (1, 3), (2, 3)], "id_a long, id_b long"
        )
        kept = {r["vec_id"] for r in similarity.cosine_dedup(corpus, pairs).collect()}
        assert kept == {1, 4}


class TestShingleSessionIsolation:
    def test_excluded_rules_do_not_leak_to_caller_session(self, docs, spark):
        # VERDICT r2 #4: shingle pipelines exclude InferFiltersFromGenerate,
        # which must be scoped to the dedicated child session — the caller's
        # session optimizer conf must be untouched after a dedup query runs.
        key = "spark.sql.optimizer.excludedRules"
        before = spark.conf.get(key, None)
        dedup.shingle_pairs_jaccard(docs, "doc_id", "text", threshold=0.5).collect()
        assert spark.conf.get(key, None) == before
        # and the child session actually carries the exclusion
        child = spark._shingle_session
        assert "InferFiltersFromGenerate" in child.conf.get(key)


class TestDecontaminate:
    def test_overlap_flags_and_counts(self, docs, spark):
        # benchmark = doc 1; docs 2 (near-dup), 3/5 (exact dups) share 3-gram
        # shingles with it; doc 4 shares none
        bench = docs.filter(F.col("doc_id") == 1)
        train = docs.filter(F.col("doc_id") != 1)
        out = {r["id"]: (r["n_shared"], r["contaminated"])
               for r in dedup.decontaminate(train, bench, "doc_id", "text",
                                            n=3, min_shared=3).collect()}
        assert set(out) == {2, 3, 4, 5}          # one row per training doc
        assert out[3][0] == 7 and out[3][1]      # exact dup: all 7 shingles shared
        assert out[5] == out[3]
        assert out[2][0] == 6 and out[2][1]      # near-dup: all but the last
        assert out[4] == (0, False)              # clean doc kept, not flagged


class TestMinHash:
    def test_exact_dups_always_candidates(self, docs):
        cand = {
            (r["id_a"], r["id_b"])
            for r in dedup.minhash_lsh_candidates(docs, "doc_id", "text").collect()
        }
        # identical shingle sets → identical signatures → guaranteed candidates
        assert {(1, 3), (1, 5), (3, 5)} <= cand

    def test_signatures_deterministic(self, docs):
        s1 = sorted(map(tuple, dedup.minhash_signatures(docs, "doc_id", "text").collect()))
        s2 = sorted(map(tuple, dedup.minhash_signatures(docs, "doc_id", "text").collect()))
        assert s1 == s2


class TestSimHash:
    def test_exact_dups_same_fingerprint(self, docs, spark):
        fp = {
            r["doc_id"]: r["f"]
            for r in docs.select("doc_id", dedup.simhash("text", bits=16).alias("f")).collect()
        }
        assert fp[1] == fp[3] == fp[5]
        assert fp[1] != fp[4]


class TestSimilarity:
    @pytest.fixture(scope="class")
    def vecs(self, spark):
        rows = [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.99, 0.1, 0.0]),   # closest to 0
            (2, [0.0, 1.0, 0.0]),
            (3, [0.0, 0.95, 0.3]),   # closest to 2
            (4, [-1.0, 0.0, 0.0]),   # opposite of 0
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_bruteforce_topk_ranks(self, vecs):
        out = similarity.brute_force_topk(vecs, vecs.filter(F.col("vec_id") == 0), k=2)
        got = [(r["neighbor_id"], r["rank"]) for r in out.orderBy("rank").collect()]
        assert got[0] == (1, 1)  # nearest neighbor of 0 is 1

    def test_cosine_value(self, vecs, spark):
        df = spark.createDataFrame(
            [([1.0, 0.0], [0.0, 1.0]), ([1.0, 0.0], [1.0, 0.0])], "a array<double>, b array<double>"
        )
        vals = [r[0] for r in df.select(similarity.cosine(F.col("a"), F.col("b"))).collect()]
        assert vals == [0.0, 1.0]

    def test_lsh_bucket_deterministic(self, vecs):
        b1 = sorted(map(tuple, vecs.select("vec_id", similarity.lsh_bucket(F.col("embedding"), 3).alias("b")).collect()))
        b2 = sorted(map(tuple, vecs.select("vec_id", similarity.lsh_bucket(F.col("embedding"), 3).alias("b")).collect()))
        assert b1 == b2

    def test_ivf_assigns_nearest_centroid(self, vecs, spark):
        cents = spark.createDataFrame(
            [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
            "centroid_id long, centroid_vec array<double>",
        )
        out = {r["vec_id"]: r["centroid_id"] for r in similarity.ivf_assign(vecs, cents).collect()}
        assert out[0] == 0 and out[1] == 0 and out[2] == 1 and out[3] == 1


class TestAsof:
    def test_merge_asof_semantics(self, spark):
        left = spark.createDataFrame(
            [(1, 1, 100), (2, 1, 250), (3, 2, 50)], "id long, k long, t long"
        )
        right = spark.createDataFrame(
            [(1, 90, "a"), (1, 200, "b"), (1, 300, "c"), (2, 60, "d")],
            "k long, rt long, v string",
        )
        out = asof.asof_join(left, right, on="k", left_ts="t", right_ts="rt", value_cols=["v"])
        got = {(r["id"], r["v"]) for r in out.collect()}
        # id1@100 → 'a' (90), id2@250 → 'b' (200), id3@50 → no prior quote
        assert got == {(1, "a"), (2, "b"), (3, None)}

    def test_equal_timestamps_match(self, spark):
        left = spark.createDataFrame([(1, 1, 100)], "id long, k long, t long")
        right = spark.createDataFrame([(1, 100, "x")], "k long, rt long, v string")
        out = asof.asof_join(left, right, on="k", left_ts="t", right_ts="rt", value_cols=["v"])
        assert out.collect()[0]["v"] == "x"  # <= semantics


class TestText:
    def test_langid_markers(self, spark):
        df = spark.createDataFrame(
            [
                (1, "the cat is on the mat and the dog"),
                (2, "el gato es de la casa que es grande"),
                (3, "der hund ist und die katze das haus"),
                (4, "zzz qqq www"),
            ],
            "id long, text string",
        )
        out = {r["id"]: r["l"] for r in df.select("id", text.lang_id("text").alias("l")).collect()}
        assert out == {1: "en", 2: "es", 3: "de", 4: "und"}

    def test_token_counts(self, spark):
        df = spark.createDataFrame([("hello world, 42!",)], "t string")
        r = df.select(
            text.whitespace_token_count("t").alias("ws"),
            text.bpe_token_count("t").alias("bpe"),
        ).collect()[0]
        assert r["ws"] == 3
        assert r["bpe"] == 5  # hello / world / , / 42 / !

    def test_fingerprint_order_invariant(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "gamma alpha beta"), (3, "alpha beta delta")],
            "id long, text string",
        )
        fp = {r["id"]: r["f"] for r in df.select("id", text.fingerprint("text").alias("f")).collect()}
        assert fp[1] == fp[2] != fp[3]

    def test_quality_score_bounds(self, spark):
        df = spark.createDataFrame(
            [("the and of is a good long sentence with many words",), ("!!!???",)],
            "t string",
        )
        vals = [r[0] for r in df.select(text.quality_score("t")).collect()]
        assert all(0.0 <= v <= 1.0 for v in vals)
        assert vals[0] > vals[1]  # prose beats punctuation soup


class TestRepetitionAndPii:
    def test_repetition_fractions(self, spark):
        rows = [(1, "a a a a"), (2, "w x y z")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["id"]: r for r in
               text.repetition_metrics(df, "doc_id", "text").collect()}
        # doc 1: 4 tokens, 1 distinct -> dup 0.75; bigrams ['a a']*3 -> top 1.0
        assert out[1]["dup_token_frac"] == 0.75
        assert out[1]["top_bigram_frac"] == 1.0
        # doc 2: all distinct -> dup 0.0; 3 distinct bigrams -> top 1/3
        assert out[2]["dup_token_frac"] == 0.0
        assert abs(out[2]["top_bigram_frac"] - 1 / 3) < 1e-12

    def test_pii_redaction_and_counts(self, spark):
        s = "mail a@b.io and c.d@e.org, call 555-123-4567, host 192.168.0.1 v1.2"
        df = spark.createDataFrame([(s,)], "text string")
        row = df.select(
            text.redact_pii("text").alias("red"),
            *[c.alias(k) for k, c in text.pii_counts("text").items()],
        ).collect()[0]
        assert row["red"] == "mail <EMAIL> and <EMAIL>, call <PHONE>, host <IP> v1.2"
        assert (row["n_email"], row["n_phone"], row["n_ipv4"]) == (2, 1, 1)


class TestChunking:
    def test_chunks_with_overlap(self, spark):
        df = spark.createDataFrame([(1, "t0 t1 t2 t3 t4 t5 t6"), (2, "")],
                                   "doc_id long, text string")
        out = sorted(
            (r["id"], r["chunk_id"], r["chunk_text"], r["n_chunk_tokens"])
            for r in text.chunk_tokens(df, "doc_id", "text",
                                       chunk_size=4, stride=3).collect())
        # doc 1: starts 0,3,6 -> [t0..t3], [t3..t6], [t6]. doc 2: the empty
        # string tokenizes to [] (tokens() filters empties — mirrored in the
        # oracle's _TOKS), so it yields NO chunks
        assert out == [
            (1, 0, "t0 t1 t2 t3", 4),
            (1, 1, "t3 t4 t5 t6", 4),
            (1, 2, "t6", 1),
        ]

    def test_invalid_params_raise(self, spark):
        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        import pytest as _pytest
        with _pytest.raises(ValueError):
            text.chunk_tokens(df, "doc_id", "text", chunk_size=0)


class TestQualityGate:
    def test_keeps_top_fraction_per_stratum(self, spark):
        rows = [("en", i, float(i)) for i in range(10)] + [("de", 100, 5.0), ("de", 101, 4.0)]
        df = spark.createDataFrame(rows, "lang string, doc_id long, q double")
        out = text.quality_quantile_gate(df, "lang", "q", "doc_id", keep_frac=0.5)
        kept = {(r["lang"], r["doc_id"]) for r in out.collect()}
        # en: 10 rows, cut = floor(0.5*10) = 5 -> keep q >= 5 (ids 5..9)
        assert {d for l, d in kept if l == "en"} == {5, 6, 7, 8, 9}
        # de: 2 rows, cut = 1 -> keep the higher-scored row only
        assert {d for l, d in kept if l == "de"} == {100}

    def test_keep_all_and_invalid(self, spark):
        df = spark.createDataFrame([("en", 1, 0.5)], "lang string, doc_id long, q double")
        assert text.quality_quantile_gate(df, "lang", "q", "doc_id", 1.0).count() == 1
        import pytest as _pytest
        with _pytest.raises(ValueError):
            text.quality_quantile_gate(df, "lang", "q", "doc_id", 0.0)


class TestSaltedJoin:
    def test_matches_plain_join(self, spark):
        from dbt_decodable_spark.operators.skew import salted_join
        from dbt_decodable_spark.sources.tables import read_table

        li = read_table(spark, "/root/testdata/sf0.001", "lineitem").withColumnRenamed(
            "l_suppkey", "suppkey"
        )
        s = read_table(spark, "/root/testdata/sf0.001", "supplier").withColumnRenamed(
            "s_suppkey", "suppkey"
        )
        plain = li.join(s, "suppkey").groupBy("s_name").count()
        salted = salted_join(li, s, on=["suppkey"], salt=8).groupBy("s_name").count()
        assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))

    def test_left_join_unmatched_rows_survive_once(self, spark):
        from dbt_decodable_spark.operators.skew import salted_join

        big = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
        small = spark.createDataFrame([(1, "x")], "k int, w string")
        out = salted_join(big, small, on=["k"], how="left", salt=4)
        rows = sorted(map(tuple, out.select("k", "v", "w").collect()))
        assert rows == [(1, "a", "x"), (2, "b", None), (3, "c", None)]

    def test_rejects_unsalted_safe_modes(self, spark):
        import pytest as _pytest

        from dbt_decodable_spark.operators.skew import salted_join

        df = spark.range(1)
        with _pytest.raises(ValueError):
            salted_join(df, df, on=["id"], how="full")


class TestIvf:
    def test_ivf_recall_against_bruteforce(self, spark):
        from dbt_decodable_spark.operators import similarity
        from dbt_decodable_spark.sources.tables import read_table

        e = read_table(spark, "/root/testdata/sf0.001", "embeddings")
        q = e.filter(F.col("vec_id") < 10)
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in similarity.brute_force_topk(e, q, k=5).collect()
        }
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in similarity.ivf_topk(e, q, k=5, n_lists=16, n_probe=4).collect()
        }
        n_q = q.count()
        assert len(approx) == 5 * n_q  # probing always yields a full top-k here
        recall = len(exact & approx) / len(exact)
        # 4-of-16 probe on random embeddings: recall well above the 4/16
        # floor because near neighbors concentrate in near lists
        assert recall >= 0.3, recall

    def test_lsh_recall_against_bruteforce(self, spark):
        # the LSH path is rows-only in the oracle gate (bucketing recall is
        # algorithm-specific), so its quality signal lives here: recall@5 vs
        # the exact scorer must clear a floor at test scale.
        from dbt_decodable_spark.operators import similarity
        from dbt_decodable_spark.sources.tables import read_table

        e = read_table(spark, "/root/testdata/sf0.001", "embeddings")
        q = e.filter(F.col("vec_id") < 10)
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in similarity.brute_force_topk(e, q, k=5).collect()
        }
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in similarity.lsh_topk(
                e, q, dim=64, k=5, n_planes=3, n_bands=8
            ).collect()
        }
        recall = len(exact & approx) / len(exact)
        # 8 OR-ed 3-bit bands: recall = 1-(1-p^3)^8 ≈ 0.84 measured on this
        # corpus (single-sketch 6-plane LSH sat at 0.10 — the banded
        # construction is what buys the recall)
        assert recall >= 0.6, recall

    def test_chunked_threshold_join_matches_single_pass(self, spark):
        from dbt_decodable_spark.operators import similarity
        from dbt_decodable_spark.sources.tables import read_table

        e = read_table(spark, "/root/testdata/sf0.001", "embeddings")
        one = {
            (r["query_id"], r["neighbor_id"])
            for r in similarity.threshold_join_chunked(e, 0.4, chunk_rows=10**9).collect()
        }
        many = {
            (r["query_id"], r["neighbor_id"])
            for r in similarity.threshold_join_chunked(e, 0.4, chunk_rows=16).collect()
        }
        assert one == many
        assert len(one) > 0

    def test_chunked_threshold_join_empty_corpus(self, spark):
        from dbt_decodable_spark.operators import similarity

        empty = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
        out = similarity.threshold_join_chunked(empty, 0.4)
        assert out.columns == ["query_id", "neighbor_id", "cos_sim"]
        assert out.count() == 0

    def test_chunked_threshold_join_sparse_clustered_ids(self, spark):
        """xxhash64 chunking must bound per-chunk size for id spaces where
        pmod(id, n) would pile everything into one chunk."""
        from dbt_decodable_spark.operators import similarity
        from dbt_decodable_spark.sources.tables import read_table

        e = read_table(spark, "/root/testdata/sf0.001", "embeddings")
        # every id ≡ 0 (mod 8): modulus chunking would put ALL rows in one
        # chunk; results must still match the single-chunk reference
        sparse = e.selectExpr("vec_id * 8 AS vec_id", "embedding")
        one = {
            (r["query_id"], r["neighbor_id"])
            for r in similarity.threshold_join_chunked(sparse, 0.4, chunk_rows=10**9).collect()
        }
        many = {
            (r["query_id"], r["neighbor_id"])
            for r in similarity.threshold_join_chunked(sparse, 0.4, chunk_rows=16).collect()
        }
        assert one == many and len(one) > 0

    def test_every_vector_lands_in_exactly_one_list(self, spark):
        from dbt_decodable_spark.operators import similarity
        from dbt_decodable_spark.sources.tables import read_table

        e = read_table(spark, "/root/testdata/sf0.001", "embeddings")
        cent = similarity.ivf_centroids(e)
        lists = similarity.ivf_assign(e, cent)
        assert lists.count() == e.count()
        assert lists.select("vec_id").distinct().count() == e.count()


class TestQuantization:
    def test_int8_roundtrip_error_bound(self, spark):
        from dbt_decodable_spark.operators import similarity
        from dbt_decodable_spark.sources.tables import read_table

        e = read_table(spark, "/root/testdata/sf0.001", "embeddings")
        scale, q = similarity.quantize_int8(F.col("embedding"))
        deq = e.select(
            "vec_id", "embedding", scale.alias("s"),
            similarity.dequantize_int8(q, scale).alias("deq"),
        )
        # |x - deq(q(x))| <= scale/2 per dimension, and q stays in [-127,127]
        bad = deq.select(
            F.array_max(
                F.zip_with(
                    F.transform("embedding", lambda x: x.cast("double")),
                    F.col("deq"),
                    lambda a, b: F.abs(a - b),
                )
            ).alias("max_err"),
            (F.col("s") / 2 * 1.000001).alias("bound"),
        ).filter(F.col("max_err") > F.col("bound"))
        assert bad.count() == 0


class TestParagraphDedup:
    def test_cross_doc_segments_removed(self, spark):
        df = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon unique one two three four"),
                (2, "alpha beta gamma delta epsilon other words go here now"),
                (3, "totally distinct content with no shared window at all"),
            ],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r
            for r in dedup.remove_duplicate_segments(
                df, "doc_id", "text", seg_tokens=5, min_docs=2
            ).collect()
        }
        # the first 5-token window of docs 1 and 2 is identical → removed
        # from BOTH; each doc had 2 segments, keeps its distinct second one
        assert out[1]["n_segments"] == 2 and out[1]["n_removed"] == 1
        assert out[1]["clean_text"] == "unique one two three four"
        assert out[2]["clean_text"] == "other words go here now"
        assert out[3]["n_removed"] == 0
        assert out[3]["clean_text"] == df.collect()[2]["text"]

    def test_order_preserved_and_empty_doc(self, spark):
        df = spark.createDataFrame(
            [(1, "x y"), (2, "x y"), (3, "a b x y c d")],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r
            for r in dedup.remove_duplicate_segments(
                df, "doc_id", "text", seg_tokens=2, min_docs=2
            ).collect()
        }
        # docs 1/2 reduce to nothing; doc 3's middle segment 'x y' drops,
        # surviving segments keep original order
        assert out[1]["clean_text"] == "" and out[1]["n_removed"] == 1
        assert out[3]["clean_text"] == "a b c d"

    def test_paragraph_mode_splits_on_blank_lines(self, spark):
        df = spark.createDataFrame(
            [(1, "first para\n\nshared boiler\n\nlast"), (2, "shared boiler\n\nown text")],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r["clean_text"]
            for r in dedup.remove_duplicate_segments(
                df, "doc_id", "text", seg_tokens=None, min_docs=2
            ).collect()
        }
        assert out[1] == "first para last"
        assert out[2] == "own text"


class TestKeepBest:
    def test_best_scoring_member_kept(self, spark):
        from dbt_decodable_spark.operators.graph import keep_best_representative

        df = spark.createDataFrame(
            [(1, 10), (2, 99), (3, 50), (4, 7)],
            "doc_id long, n_chars long",
        )
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3)], "id_a long, id_b long"
        )
        rows = {r["doc_id"]: r for r in keep_best_representative(
            df, pairs, "doc_id", "n_chars"
        ).collect()}
        # cluster {1,2,3}: 2 has the highest score → only 2 kept
        assert rows[2]["keep"] and not rows[1]["keep"] and not rows[3]["keep"]
        # singleton 4 is its own component and kept
        assert rows[4]["keep"] and rows[4]["component"] == 4

    def test_tie_breaks_on_min_id(self, spark):
        from dbt_decodable_spark.operators.graph import keep_best_representative

        df = spark.createDataFrame(
            [(5, 10), (6, 10)], "doc_id long, n_chars long"
        )
        pairs = spark.createDataFrame([(5, 6)], "id_a long, id_b long")
        rows = {r["doc_id"]: r["keep"] for r in keep_best_representative(
            df, pairs, "doc_id", "n_chars"
        ).collect()}
        assert rows[5] and not rows[6]


class TestSemanticDedup:
    def test_within_cluster_suppression_only(self, spark):
        # centroids: ids 0 and 97 (stride 97). vectors near axis-0 cluster
        # with centroid 0, near axis-1 with centroid 97.
        rows = [
            (0, [1.0, 0.0]),
            (97, [0.0, 1.0]),
            (5, [0.99, 0.14]),   # cluster 0, cosine to id 0 ≈ 0.99 → suppressed
            (98, [0.1, 0.995]),  # cluster 97, similar to 97 → suppressed
            (50, [0.7, -0.71]),  # cluster 0 but dissimilar → kept
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = {r["vec_id"]: r["cluster"] for r in similarity.semantic_dedup(
            df, n_lists=2, stride=97, threshold=0.9
        ).collect()}
        assert set(out) == {0, 97, 50}
        assert out[0] == 0 and out[97] == 97 and out[50] == 0


class TestSalientTerms:
    def test_rarity_weighted_ranking(self, spark):
        df = spark.createDataFrame(
            [
                (1, "common rare rare"),
                (2, "common other"),
                (3, "common thing"),
            ],
            "doc_id long, text string",
        )
        rows = text.salient_terms(df, "doc_id", "text", k=1).collect()
        top = {r["doc_id"]: (r["term"], r["score"]) for r in rows}
        # 'common' appears in all 3 docs → score 0; doc-unique terms win
        assert top[1] == ("rare", 2 * (3 - 1))
        assert top[2][0] == "other" and top[3][0] == "thing"

    def test_rank_is_total_and_bounded(self, spark):
        df = spark.createDataFrame(
            [(1, "b a c a b"), (2, "z z y")], "doc_id long, text string"
        )
        rows = text.salient_terms(df, "doc_id", "text", k=2).collect()
        per_doc = {}
        for r in rows:
            per_doc.setdefault(r["doc_id"], []).append((r["rank"], r["term"]))
        for doc, rs in per_doc.items():
            assert sorted(r for r, _ in rs) == list(range(1, len(rs) + 1))
            assert len(rs) <= 2


class TestStreamingDedup:
    def test_bounded_run_matches_distinct(self, spark, tmp_path):
        from dbt_decodable_spark.streaming.dedupe import dedup_within_watermark

        src = str(tmp_path / "src")
        spark.createDataFrame(
            [
                (1, "a", "2024-01-01 00:00:00"),
                (1, "a", "2024-01-01 00:10:00"),
                (2, "b", "2024-01-01 00:20:00"),
                (1, "a", "2024-01-01 00:30:00"),
            ],
            "user_id long, event_type string, ts string",
        ).selectExpr(
            "user_id", "event_type", "CAST(ts AS TIMESTAMP) AS ts"
        ).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(
            "user_id long, event_type string, ts timestamp"
        ).parquet(src)
        deduped = dedup_within_watermark(
            stream, ["user_id", "event_type"], ts_col="ts", delay="1 hour"
        ).select("user_id", "event_type")
        q = (
            deduped.writeStream.format("memory")
            .queryName("dedupe_test_sink")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["user_id"], r["event_type"])
            for r in spark.table("dedupe_test_sink").collect()
        }
        assert got == {(1, "a"), (2, "b")}


class TestWinnowing:
    def test_shared_fingerprint_for_long_overlap(self, spark):
        # two docs sharing a 12-token run: winnowing (k=4, w=4) guarantees
        # >= 1 shared fingerprint for any overlap of length >= w + k - 1 = 7
        shared = "one two three four five six seven eight nine ten eleven twelve"
        df = spark.createDataFrame(
            [(1, "aa bb " + shared), (2, shared + " zz yy xx")],
            "doc_id long, text string",
        )
        rows = text.winnow_fingerprints(df, "doc_id", "text", k=4, w=4).collect()
        fps = {}
        for r in rows:
            fps.setdefault(r["doc_id"], set()).add(r["fp"])
        assert fps[1] & fps[2]

    def test_density_guarantee(self, spark):
        # every w-window of gram hashes contributes its min → consecutive
        # selected positions are at most w apart
        df = spark.createDataFrame(
            [(1, " ".join(f"t{i}" for i in range(40)))], "doc_id long, text string"
        )
        pos = sorted(
            r["pos"] for r in text.winnow_fingerprints(df, "doc_id", "text", k=4, w=4).collect()
        )
        assert all(b - a <= 4 for a, b in zip(pos, pos[1:]))
        assert pos[0] <= 3


class TestUnicodeNorm:
    def test_nfc_composes_and_nfkc_folds(self, spark):
        from dbt_decodable_spark.functions.unicode_norm import nfc, nfkc

        df = spark.createDataFrame(
            [("école",), ("ﬁle",)], "s string"
        )
        out = {r["s"]: (r["c"], r["k"]) for r in df.select(
            "s", nfc("s").alias("c"), nfkc("s").alias("k")
        ).collect()}
        assert out["école"][0] == "école"        # NFC composes
        assert out["ﬁle"][0] == "ﬁle"             # NFC keeps ligature
        assert out["ﬁle"][1] == "file"                 # NFKC folds it


class TestBigramCommonness:
    def test_common_collocations_score_higher(self, spark):
        df = spark.createDataFrame(
            [
                (1, "the cat sat"),     # bigrams: "the cat", "cat sat"
                (2, "the cat ran"),     # shares "the cat"
                (3, "zq xv bn"),        # all unique bigrams
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in text.bigram_commonness(
            df, "doc_id", "text"
        ).collect()}
        # "the cat" cf=2, others cf=1 → docs 1/2 avg 1.5, doc 3 avg 1.0
        assert out[1]["commonness"] == 1.5 == out[2]["commonness"]
        assert out[3]["commonness"] == 1.0
        assert out[1]["n_bigrams"] == 2

    def test_short_doc_null_commonness(self, spark):
        df = spark.createDataFrame([(1, "word")], "doc_id long, text string")
        r = text.bigram_commonness(df, "doc_id", "text").collect()[0]
        assert r["n_bigrams"] == 0 and r["commonness"] is None


class TestQuantizedIvf:
    def test_quantized_recall_against_exact_ivf(self, spark, sf001_embeddings=None):
        from dbt_decodable_spark.sources.tables import read_table

        e = read_table(spark, "/root/testdata/sf0.001", "embeddings")
        q = e.filter(F.col("vec_id") < 5)
        exact = similarity.ivf_topk(e, q, k=5, n_lists=8, n_probe=3, stride=97)
        quant = similarity.ivf_topk_quantized(
            e, q, k=5, n_lists=8, n_probe=3, stride=97
        )
        ex = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
        qz = {(r["query_id"], r["neighbor_id"]) for r in quant.collect()}
        # int8 error is <= scale/2 per dim — top-5 sets should overlap heavily
        assert len(ex & qz) / len(ex) >= 0.8


class TestBloomFilter:
    def test_no_false_negatives_and_new_keys_pass(self, spark):
        from dbt_decodable_spark.operators import bloom

        hist = spark.createDataFrame(
            [(f"key{i}",) for i in range(200)], "k string"
        )
        batch = spark.createDataFrame(
            [(i, f"key{i}") for i in range(190, 210)], "id long, k string"
        )
        out = {
            r["id"]: r["maybe_seen"]
            for r in bloom.bloom_prefilter_new_keys(
                hist, batch, "k", "id", m_bits=1 << 14, k=4
            ).collect()
        }
        # Bloom guarantee: every historical key MUST flag maybe_seen=1
        assert all(out[i] == 1 for i in range(190, 200))
        # 10 genuinely-new keys in a 2^14-bit filter holding 200 keys:
        # fp rate ~ (800/16384)^4 ≈ 6e-6 — all must come back 0
        assert all(out[i] == 0 for i in range(200, 210))

    def test_word_table_is_bounded(self, spark):
        from dbt_decodable_spark.operators import bloom

        hist = spark.createDataFrame([(f"k{i}",) for i in range(500)], "k string")
        words = bloom.build_bloom(hist, "k", m_bits=1 << 10, k=4)
        assert words.count() <= (1 << 10) // 32


class TestDuplicateSpans:
    def test_cross_doc_span_detected_and_merged(self, spark):
        shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        df = spark.createDataFrame(
            [
                (1, f"one two three {shared} four five six"),
                (2, f"seven eight {shared} nine ten"),
                (3, "completely disjoint words with no overlap at all here"),
            ],
            "doc_id long, text string",
        )
        spans = {
            r["id"]: (r["span_start"], r["span_end"])
            for r in dedup.duplicate_ngram_spans(df, "doc_id", "text", n=8).collect()
        }
        # shared block is 10 tokens → three 8-gram windows per doc, all
        # overlapping → ONE merged span of exactly the shared range
        assert spans[1] == (3, 12)  # tokens 3..12 in doc 1
        assert spans[2] == (2, 11)  # tokens 2..11 in doc 2
        assert 3 not in spans

    def test_within_doc_repeat_not_flagged(self, spark):
        rep = "a b c d e f g h"
        df = spark.createDataFrame(
            [(1, f"{rep} x y z {rep}"), (2, "totally different content in here ok yes")],
            "doc_id long, text string",
        )
        # the 8-gram repeats only WITHIN doc 1 → min(id)=max(id) → no span
        assert dedup.duplicate_ngram_spans(df, "doc_id", "text", n=8).count() == 0

    def test_remove_spans_cuts_exactly_the_duplicated_tokens(self, spark):
        shared = "alpha beta gamma delta epsilon zeta eta theta"
        df = spark.createDataFrame(
            [(1, f"one two {shared}"), (2, f"{shared} nine ten")],
            "doc_id long, text string",
        )
        out = {
            r["id"]: (r["clean_text"], r["n_tokens_removed"])
            for r in dedup.remove_duplicate_spans(df, "doc_id", "text", n=8).collect()
        }
        assert out[1] == ("one two", 8)
        assert out[2] == ("nine ten", 8)


class TestGopherGates:
    def test_metrics_exact_on_known_doc(self, spark):
        doc = "the cat and the dog have fun with all of that stuff ok"
        df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
        m = text.gopher_metrics("text")
        row = df.select(
            m["n_words"].alias("w"),
            m["mean_word_len"].alias("mwl"),
            m["frac_alpha_words"].alias("fa"),
            m["n_stopword_hits"].alias("st"),
        ).collect()[0]
        assert row["w"] == 13
        assert row["mwl"] == pytest.approx((len(doc) - 12) / 13)
        assert row["fa"] == 1.0
        # stopword hits: the, and, the, have, with, of, that → 7
        assert row["st"] == 7

    def test_pass_gate_bounds(self, spark):
        good = " ".join(["the of and that have with word" ] * 10)  # 70 words
        short = "the of and"  # < 50 words
        symbols = " ".join(["###"] * 60)  # no alpha, all symbols
        df = spark.createDataFrame(
            [(1, good), (2, short), (3, symbols)], "doc_id long, text string"
        )
        out = {
            r["doc_id"]: r["p"]
            for r in df.select("doc_id", text.gopher_pass("text").alias("p")).collect()
        }
        assert out == {1: 1, 2: 0, 3: 0}


class TestTemperatureQuotas:
    def test_quota_sums_to_budget_and_upweights_tail(self, spark):
        from dbt_decodable_spark.operators import mixing

        df = spark.createDataFrame(
            [("big", 9000), ("mid", 900), ("small", 100)],
            "src string, n long",
        )
        rows = {r["stratum"]: r for r in mixing.temperature_quotas(df, "src", "n", 1000).collect()}
        assert sum(r["quota"] for r in rows.values()) == 1000
        # τ=0.5: weights are sqrt-scaled → small gets 10/ (94+30+10) ≈ 7.5%
        # of budget instead of the proportional 1%
        assert rows["small"]["quota"] >= 70
        assert rows["big"]["quota"] <= 720

    def test_deterministic_tie_break(self, spark):
        from dbt_decodable_spark.operators import mixing

        df = spark.createDataFrame(
            [("a", 100), ("b", 100), ("c", 100)], "src string, n long"
        )
        r1 = sorted(mixing.temperature_quotas(df, "src", "n", 100).collect())
        r2 = sorted(mixing.temperature_quotas(df, "src", "n", 100).collect())
        assert r1 == r2
        assert sum(r["quota"] for r in r1) == 100


class TestTrainValTestSplit:
    def test_partition_independent_and_complete(self, spark):
        from dbt_decodable_spark.operators import sampling

        df = spark.range(0, 2000).withColumnRenamed("id", "k")
        a = {r["k"]: r["split"] for r in sampling.train_val_test_split(df, "k").collect()}
        b = {
            r["k"]: r["split"]
            for r in sampling.train_val_test_split(df.repartition(7), "k").collect()
        }
        assert a == b
        from collections import Counter

        c = Counter(a.values())
        # 98/1/1 targets on 2000 keys: val+test each ~20 ± binomial noise
        assert 5 <= c["val"] <= 45 and 5 <= c["test"] <= 45
        assert c["train"] + c["val"] + c["test"] == 2000


class TestStripMarkup:
    def test_tags_entities_whitespace(self, spark):
        df = spark.createDataFrame(
            [(1, '<div id="x">Hello &amp; <b>world</b></div>\n\n&lt;tag&gt; &#39;q&#39;')],
            "id long, html string",
        )
        out = df.select(text.strip_markup("html").alias("c")).collect()[0]["c"]
        assert out == "Hello & world <tag> 'q'"

    def test_amp_decoded_last_no_double_decode(self, spark):
        # &amp;lt; is literal "&lt;" — must NOT become "<"
        df = spark.createDataFrame([(1, "a &amp;lt; b")], "id long, html string")
        out = df.select(text.strip_markup("html").alias("c")).collect()[0]["c"]
        assert out == "a &lt; b"


class TestCanonicalUrl:
    def test_variants_collapse(self, spark):
        urls = [
            "https://www.Example.com/Page/",
            "http://example.com/page",
            "HTTPS://EXAMPLE.COM/page#section",
            "https://example.com/page?utm_source=x",
        ]
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        got = {r["c"] for r in df.select(text.canonical_url("url").alias("c")).collect()}
        assert got == {"example.com/page"}

    def test_real_query_params_survive(self, spark):
        df = spark.createDataFrame(
            [("https://example.com/p?id=7&utm_campaign=x",)], "url string"
        )
        out = df.select(text.canonical_url("url").alias("c")).collect()[0]["c"]
        assert out == "example.com/p?id=7"


class TestNoveltyScores:
    def test_shared_vs_unique_shingles(self, spark):
        df = spark.createDataFrame(
            [
                (1, "a b c d e"),          # shingles abc bcd cde
                (2, "a b c x y"),          # shares abc
                (3, "p q r s t"),          # fully novel
            ],
            "doc_id long, text string",
        )
        out = {r["id"]: r for r in text.novelty_scores(df, "doc_id", "text", n=3).collect()}
        assert out[3]["novelty"] == 1.0
        assert out[1]["n_shingles"] == 3 and out[1]["n_novel"] == 2
        assert out[1]["novelty"] == pytest.approx(2 / 3)


class TestStratumQuantiles:
    def test_exact_rank_values(self, spark):
        rows = [("a", i) for i in range(1, 11)] + [("b", 5)]
        df = spark.createDataFrame(rows, "src string, n long")
        out = {
            r["stratum"]: r
            for r in text.stratum_length_quantiles(df, "src", "n", (50, 90)).collect()
        }
        # stratum a: n=10 → q50 at rank 5 → value 5; q90 at rank 9 → 9
        assert out["a"]["q50"] == 5 and out["a"]["q90"] == 9
        assert out["b"]["n_rows"] == 1 and out["b"]["q50"] == 5 and out["b"]["q90"] == 5


class TestOovRate:
    def test_fractions(self, spark):
        df = spark.createDataFrame(
            [(1, "the cat sat"), (2, "zzz qqq the")], "doc_id long, text string"
        )
        out = {
            r["id"]: r
            for r in text.oov_rate(df, "doc_id", "text", ["the", "cat", "sat"]).collect()
        }
        assert out[1]["n_oov"] == 0 and out[1]["oov_frac"] == 0.0
        assert out[2]["n_oov"] == 2 and out[2]["oov_frac"] == pytest.approx(2 / 3)


class TestMinhashVerified:
    def test_verified_pairs_subset_of_exact(self, docs):
        """LSH-verified pairs must be a subset of exact all-pairs Jaccard at
        the same threshold, with IDENTICAL jaccard values where present."""
        exact = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in dedup.shingle_pairs_jaccard(
                docs, "doc_id", "text", n=3, threshold=0.5
            ).collect()
        }
        verified = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in dedup.minhash_verified_pairs(
                docs, "doc_id", "text", n=3, num_hashes=6, threshold=0.5
            ).collect()
        }
        assert set(verified) <= set(exact)
        for k, v in verified.items():
            assert v == exact[k]
        # the exact-dup triplet always collides in every band → present
        assert {(1, 3), (1, 5), (3, 5)} <= set(verified)


class TestStarLinking:
    def test_star_components_equal_pairs_components(self, spark):
        from dbt_decodable_spark.operators.graph import connected_components

        rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(1, 6)]
        rows += [(10 + i, "completely different text block with unique words here") for i in range(3)]
        rows += [(99, "isolated loner document with nothing shared at all ok")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = dedup.minhash_lsh_candidates(df, "doc_id", "text", link="pairs")
        star = dedup.minhash_lsh_candidates(df, "doc_id", "text", link="star")
        # star emits strictly fewer (or equal) edges...
        assert star.count() <= pairs.count()
        # ...but identical connected components
        cp = {(r["id"], r["component"]) for r in connected_components(pairs, "id_a", "id_b").collect()}
        cs = {(r["id"], r["component"]) for r in connected_components(star, "id_a", "id_b").collect()}
        assert cp == cs

    def test_star_output_linear_in_bucket_size(self, spark):
        # 30 exact copies: pairs mode emits C(30,2)=435, star emits 29
        df = spark.createDataFrame(
            [(i, "same text in every copy of this document forever") for i in range(30)],
            "doc_id long, text string",
        )
        assert dedup.minhash_lsh_candidates(df, "doc_id", "text", link="star").count() == 29
        assert dedup.minhash_lsh_candidates(df, "doc_id", "text", link="pairs").count() == 435


class TestOperatorReviewRegressions:
    """Pins for the session-3 operator review fixes."""

    def test_tokens_empty_doc_is_empty_array(self, spark):
        from dbt_decodable_spark.operators.dedup import tokens
        from pyspark.sql import functions as F

        df = spark.createDataFrame([("",), ("   ",), ("a b",)], "text string")
        got = [r.n for r in df.select(F.size(tokens("text")).alias("n")).collect()]
        assert got == [0, 0, 2]

    def test_dedup_by_components_with_id_named_id(self, spark):
        from dbt_decodable_spark.operators.graph import dedup_by_components

        docs = spark.createDataFrame([(1,), (2,), (3,)], "id long")
        pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        out = dedup_by_components(docs, pairs, "id")
        comp = {r.id: r.component for r in out.collect()}
        assert comp == {1: 1, 2: 1, 3: 3}

    def test_connected_components_raises_when_budget_exhausted(self, spark):
        from dbt_decodable_spark.operators.graph import connected_components
        import pytest as _pytest

        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(1, 9)], "src long, dst long"
        )
        with _pytest.raises(RuntimeError, match="did not converge"):
            connected_components(edges, max_iter=1, smallgraph_edges=0)

    def test_ivf_centroids_fallback_when_stride_misses(self, spark):
        from dbt_decodable_spark.operators.similarity import ivf_topk

        e = spark.createDataFrame(
            [(i, [float(i), 1.0]) for i in range(1, 20)],
            "vec_id long, embedding array<float>",
        )
        q = e.filter("vec_id = 1")
        out = ivf_topk(e, q, k=3, n_lists=4, n_probe=2, stride=97)
        assert out.count() > 0  # previously crashed on the empty centroid set

    def test_zero_norm_vectors_excluded_from_topk(self, spark):
        from dbt_decodable_spark.operators.similarity import brute_force_topk

        e = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.0, 1.0]), (4, [1.0, 1.0])],
            "vec_id long, embedding array<float>",
        )
        q = e.filter("vec_id = 1")
        out = brute_force_topk(e, q, k=3)
        ids = {r.neighbor_id for r in out.collect()}
        assert 2 not in ids and ids == {3, 4}

    def test_multimodal_bins_non_power_of_two(self, spark):
        from dbt_decodable_spark.operators.multimodal import (
            attach_binary_payload,
            extract_features_pandas,
        )

        df = spark.createDataFrame([(1, "abcxyz")], "doc_id long, text string")
        out = extract_features_pandas(
            attach_binary_payload(df, "text"), n_bins=10, normalize=False
        )
        [r] = out.collect()
        assert len(r.features) == 10 and sum(r.features) == 6  # all bytes binned

    def test_bloom_membership_keeps_null_ids(self, spark):
        from dbt_decodable_spark.operators.bloom import build_bloom, check_membership

        hist = spark.createDataFrame([("seen",)], "k string")
        bloom = build_bloom(hist, "k", m_bits=1 << 12, k=2)
        batch = spark.createDataFrame(
            [(1, "seen"), (2, "new"), (None, "whatever")],
            "doc_id long, k string",
        )
        out = check_membership(batch, bloom, "k", "doc_id", m_bits=1 << 12, k=2)
        assert out.count() == 3  # NULL-id row must not vanish
        flags = {r.doc_id: r.maybe_seen for r in out.collect()}
        assert flags[1] == 1 and flags[2] == 0


class TestSaltedSkewAgg:
    def test_matches_plain_groupby(self, spark):
        from dbt_decodable_spark.queries import load_all
        from dbt_decodable_spark.queries.money import cents
        from dbt_decodable_spark.sources.tables import read_table
        from pyspark.sql import functions as F

        sf = "/root/testdata/sf0.001"
        reg = load_all()
        got = {
            r.l_returnflag: (r.n, r.price_units)
            for r in reg["agg_salted_skew"].fn(spark, sf).collect()
        }
        want = {
            r.l_returnflag: (r.n, r.price_units)
            for r in read_table(spark, sf, "lineitem")
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(cents("l_extendedprice")).alias("price_units"),
            )
            .collect()
        }
        assert got and got == want


class TestZorderKey:
    def _py_spread(self, x: int) -> int:
        for n, mask in ((8, 0x00FF00FF), (4, 0x0F0F0F0F),
                        (2, 0x33333333), (1, 0x55555555)):
            x = (x | (x << n)) & mask
        return x

    def test_interleave_matches_python(self, spark):
        from dbt_decodable_spark.queries.relational2 import _zkey, _Z_SPARK_SHL
        from pyspark.sql import functions as F

        pts = [(0, 0), (1, 0), (0, 1), (255, 255), (170, 85), (37, 201)]
        df = spark.createDataFrame(pts, "ux long, dy long")
        got = {
            (r.ux, r.dy): r.z
            for r in df.select(
                "ux", "dy", F.expr(_zkey("ux", "dy", _Z_SPARK_SHL)).alias("z")
            ).collect()
        }
        for ux, dy in pts:
            assert got[(ux, dy)] == self._py_spread(ux) | (self._py_spread(dy) << 1)

    def test_zkey_locality(self, spark):
        # consecutive (ux, dy) cells share high z-bits: the 2x2 block
        # (0,0),(1,0),(0,1),(1,1) must occupy z 0..3 — the property that
        # makes min/max file stats tight on both dims after a z-sort
        from dbt_decodable_spark.queries.relational2 import _zkey, _Z_SPARK_SHL
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(x, y) for x in range(2) for y in range(2)], "ux long, dy long"
        )
        zs = sorted(
            r.z
            for r in df.select(
                F.expr(_zkey("ux", "dy", _Z_SPARK_SHL)).alias("z")
            ).collect()
        )
        assert zs == [0, 1, 2, 3]


class TestTableChecksum:
    def test_order_and_partition_invariant(self, spark):
        from dbt_decodable_spark.queries import load_all

        sf = "/root/testdata/sf0.001"
        reg = load_all()
        fn = reg["table_checksum_shards"].fn
        a = sorted(map(tuple, fn(spark, sf).collect()))
        b = sorted(map(tuple, fn(spark, sf).collect()))  # fresh lineage
        assert a and a == b

    def test_detects_single_row_change(self, spark):
        from pyspark.sql import functions as F
        from dbt_decodable_spark.queries.money import cents

        def checksum(df):
            canon = df.select(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("event_id").cast("string"),
                        F.col("user_id").cast("string"),
                        F.col("event_type"),
                        cents("value").cast("string"),
                    )
                ).alias("h")
            )
            v = canon.select(
                F.expr("CAST(conv(substr(h, 1, 5), 16, 10) AS BIGINT)").alias("v1"),
                F.expr("CAST(conv(substr(h, 6, 5), 16, 10) AS BIGINT)").alias("v2"),
            )
            out = v.groupBy((F.col("v1") % 64).alias("shard")).agg(
                F.sum("v1").alias("s1"), F.sum("v2").alias("s2")
            )
            return sorted(map(tuple, out.collect()))

        rows = [(i, i % 7, "click", float(i)) for i in range(200)]
        schema = "event_id long, user_id long, event_type string, value double"
        base = spark.createDataFrame(rows, schema)
        mutated = spark.createDataFrame(
            [r if r[0] != 117 else (117, 3, "click", 999.0) for r in rows], schema
        )
        assert checksum(base) != checksum(mutated)
        assert checksum(base) == checksum(spark.createDataFrame(rows[::-1], schema))


class TestSnapshotDiff:
    def test_statuses(self, spark):
        from dbt_decodable_spark.queries import load_all
        from dbt_decodable_spark.queries.money import cents
        from dbt_decodable_spark.sources.tables import read_table
        from pyspark.sql import functions as F

        sf = "/root/testdata/sf0.001"
        reg = load_all()
        got = {r.user_id: r.status for r in reg["snapshot_diff_status"].fn(spark, sf).collect()}
        e = read_table(spark, sf, "events")

        def snap(df):
            return {
                r.user_id: (r.units, r.n)
                for r in df.groupBy("user_id")
                .agg(F.sum(cents("value")).alias("units"), F.count(F.lit(1)).alias("n"))
                .collect()
            }

        old, new = snap(e.filter(F.col("event_id") < 8000)), snap(e)
        for uid in set(old) | set(new):
            expect = (
                "added" if uid not in old
                else "removed" if uid not in new
                else "changed" if old[uid] != new[uid]
                else "unchanged"
            )
            assert got[uid] == expect
