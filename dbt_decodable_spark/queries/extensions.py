"""[X] driver-mandated extension queries (SURVEY §2.12): dedup family,
similarity search, text analysis, multimodal plumbing — each over the
``documents`` / ``embeddings`` tables with a DuckDB oracle where the
semantics are SQL-expressible (md5-keyed hashing makes even MinHash
oracle-able); approximate/structural ops register oracle=None → rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dbt_decodable_spark.operators import dedup, similarity, text
from dbt_decodable_spark.queries import register
from dbt_decodable_spark.sources.tables import read_table

# DuckDB equivalents of the shared normalizations (kept in lockstep with
# operators/dedup.py — both sides lower, collapse whitespace, split on ' ')
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
# the empty-token filter mirrors operators/dedup.tokens: a blank document
# tokenizes to [] on both engines, not [''] (string_split('', ' ') = [''])
_TOKS = f"list_filter(string_split({_NORM}, ' '), t -> t <> '')"


@register(
    "dedup_exact",
    oracle=f"""
        SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        FROM documents
        GROUP BY coalesce(md5({_NORM}),
                          '__null#' || CAST(doc_id AS VARCHAR))
    """,
    doc="§2.12 exact dedup: hash-groupBy on normalized text, min-id representative",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return dedup.exact_dedup(d, "text", "doc_id")


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
        WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        sh AS (
            SELECT DISTINCT id, shingle FROM (
                SELECT doc_id AS id,
                       unnest(list_transform(
                           generate_series(1, len(toks) - 2),
                           i -> array_to_string(toks[i:i+2], ' '))) AS shingle
                FROM base
            )
        ),
        sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
        inter AS (
            SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               n_inter / (sa.n + sb.n - n_inter) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.id = id_a
        JOIN sizes sb ON sb.id = id_b
        WHERE n_inter / (sa.n + sb.n - n_inter) >= 0.2
    """,
    doc="§2.12 n-gram Jaccard near-dup: shingle inverted index, exact Jaccard "
    "(bucket-local quadratic only — the scalable exact method)",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return dedup.shingle_pairs_jaccard(d, "doc_id", "text", n=3, threshold=0.2)


# MinHash signature + band-bucket candidate pairs as reusable CTE text
# (shared by dedup_minhash_lsh and dedup_connected_components)
_MINHASH_PAIRS_CTES = f"""base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        sh AS (
            SELECT DISTINCT id, shingle FROM (
                SELECT doc_id AS id,
                       unnest(list_transform(
                           generate_series(1, len(toks) - 2),
                           i -> array_to_string(toks[i:i+2], ' '))) AS shingle
                FROM base
            )
        ),
        sig AS (
            SELECT id, band, min(md5(CAST(band AS VARCHAR) || '#' || shingle)) AS minhash
            FROM sh, (SELECT unnest(range(6)) AS band)
            GROUP BY id, band
        ),
        pairs AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b
            FROM sig a JOIN sig b
              ON a.band = b.band AND a.minhash = b.minhash AND a.id < b.id
        )"""


@register(
    "dedup_minhash_lsh",
    oracle=f"""
        WITH {_MINHASH_PAIRS_CTES}
        SELECT id_a, id_b FROM pairs
    """,
    doc="§2.12 MinHash-LSH candidate pairs: 6 md5-keyed min-hashes, "
    "band-bucket join (deterministic, so even the LSH step is oracle-able)",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_candidates(d, "doc_id", "text", n=3, num_hashes=6)


@register(
    "dedup_connected_components",
    oracle=f"""
        WITH RECURSIVE {_MINHASH_PAIRS_CTES},
        sym AS (
            SELECT id_a AS s, id_b AS d FROM pairs
            UNION SELECT id_b, id_a FROM pairs
        ),
        reach AS (
            SELECT s AS id, d AS r FROM sym
            UNION
            SELECT reach.id, sym.d FROM reach JOIN sym ON reach.r = sym.s
        ),
        comp AS (SELECT id, LEAST(id, MIN(r)) AS component FROM reach GROUP BY id)
        SELECT d.doc_id,
               COALESCE(c.component, d.doc_id) AS component,
               (COALESCE(c.component, d.doc_id) = d.doc_id) AS is_representative
        FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
    """,
    doc="§2.12 dedup clustering: MinHash-LSH candidate pairs → connected "
    "components (alternating large-star/small-star, operators/graph.py) → "
    "one canonical representative (min doc_id) per near-dup cluster. The "
    "oracle computes the same components via a recursive-CTE transitive "
    "closure — tractable at test scale, while the Spark side is the "
    "O(log n)-round 100 TB path.",
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_decodable_spark.operators.graph import dedup_by_components

    d = read_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_candidates(d, "doc_id", "text", n=3, num_hashes=6)
    return dedup_by_components(d, pairs, "doc_id").select(
        "doc_id", "component", "is_representative"
    )


@register(
    "decontaminate_against_benchmark",
    oracle=f"""
        WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        sh AS (
            SELECT DISTINCT id, shingle FROM (
                SELECT doc_id AS id,
                       unnest(list_transform(
                           generate_series(1, len(toks) - 2),
                           i -> array_to_string(toks[i:i+2], ' '))) AS shingle
                FROM base
            )
        ),
        bench AS (SELECT DISTINCT shingle FROM sh WHERE id % 37 = 0),
        shared AS (
            SELECT id, count(*) AS n_shared
            FROM sh JOIN bench USING (shingle)
            WHERE id % 37 <> 0
            GROUP BY id
        )
        SELECT doc_id AS id,
               COALESCE(n_shared, 0) AS n_shared,
               COALESCE(n_shared, 0) >= 3 AS contaminated
        FROM documents LEFT JOIN shared ON doc_id = id
        WHERE doc_id % 37 <> 0
    """,
    doc="§2.12 benchmark decontamination: flag training docs sharing ≥3 "
    "distinct 3-gram shingles with the eval subset (doc_id % 37 = 0 stands "
    "in for the benchmark corpus); broadcast bench-shingle set, one corpus "
    "scan (GPT-3-style overlap removal)",
)
def decontaminate_against_benchmark(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 37 == 0)
    train = d.filter(F.col("doc_id") % 37 != 0)
    return dedup.decontaminate(train, bench, "doc_id", "text", n=3, min_shared=3)


@register(
    "dedup_simhash",
    oracle=f"""
        WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        tok AS (SELECT doc_id, unnest(toks) AS t FROM base),
        th AS (SELECT doc_id, md5(t) AS h FROM tok),
        bits AS (
            SELECT doc_id, b,
                   SUM(CASE WHEN ((strpos('0123456789abcdef',
                                          h[8 - b // 4]) - 1)
                                  >> (b % 4)) & 1 = 1
                        THEN 1 ELSE -1 END) AS contrib
            FROM th, (SELECT unnest(range(16)) AS b)
            GROUP BY doc_id, b
        ),
        fp AS (
            SELECT doc_id,
                   SUM(CASE WHEN contrib > 0 THEN 1 << b ELSE 0 END) AS fingerprint
            FROM bits GROUP BY doc_id
        )
        SELECT CAST(fingerprint AS BIGINT) AS fingerprint,
               count(*) AS n_docs, min(doc_id) AS min_doc_id
        FROM fp GROUP BY fingerprint
    """,
    doc="§2.12 SimHash fingerprint groups (sign-of-weighted-bits). The "
    "Spark side is one fused JVM bit fold over md5-prefix token hashes; "
    "because the hash is md5-derived, the SAME bits are reachable in SQL "
    "(hex-digit decode via strpos, shift, mask) — upgraded from rows-only "
    "to a full value oracle. bits=16 = the low 4 hex digits of each hash.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = dedup.fan_out(read_table(spark, sf_dir, "documents"))
    return (
        d.withColumn("fingerprint", dedup.simhash("text", bits=16))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
    )


@register(
    "similarity_bruteforce_topk",
    oracle="""
        WITH q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10),
        scored AS (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   list_cosine_similarity(q.q_vec, c.embedding) AS cos_sim
            FROM embeddings c, q WHERE c.vec_id <> q.query_id
        )
        SELECT query_id, neighbor_id, rank FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
                   ) AS rank
            FROM scored
        ) t WHERE rank <= 5
    """,
    doc="§2.12 brute-force cosine top-k (exact ANN baseline); rank-only output "
    "so float formula differences between engines can't flip the hash",
)
def similarity_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return similarity.brute_force_topk(e, q, k=5).select("query_id", "neighbor_id", "rank")


def _lsh_oracle_sql(dim: int = 64, n_planes: int = 4, n_bands: int = 6) -> str:
    """The LSH pipeline is fully deterministic (seeded-LCG hyperplanes,
    driver-side constants), so even the BUCKETING step is SQL-expressible:
    inline the same plane constants as literal DOUBLE arrays and rebuild
    sketch → bucket-join → exact re-rank in DuckDB. Upgrades the ANN query
    from rows-only to a value oracle."""
    from dbt_decodable_spark.operators.similarity import _hyperplane

    rows = []
    for b in range(n_bands):
        for p in range(n_planes):
            vals = ", ".join(repr(v) for v in _hyperplane(dim, seed=b * n_planes + p + 1))
            rows.append(f"({b}, {1 << p}, [{vals}]::DOUBLE[])")
    planes_values = ",\n              ".join(rows)
    return f"""
        WITH planes(band, w, plane) AS (
            VALUES {planes_values}
        ),
        sk AS (
            SELECT e.vec_id, e.embedding, p.band,
                   SUM(CASE WHEN list_dot_product(
                           CAST(e.embedding AS DOUBLE[]), p.plane) > 0
                        THEN p.w ELSE 0 END) AS bucket
            FROM embeddings e, planes p
            GROUP BY e.vec_id, e.embedding, p.band
        ),
        cand AS (
            SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
            FROM sk q JOIN sk c ON q.band = c.band AND q.bucket = c.bucket
            WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
        ),
        scored AS (
            SELECT cand.query_id, cand.neighbor_id,
                   list_cosine_similarity(eq.embedding, ec.embedding) AS cos_sim
            FROM cand
            JOIN embeddings eq ON eq.vec_id = cand.query_id
            JOIN embeddings ec ON ec.vec_id = cand.neighbor_id
        )
        SELECT query_id, neighbor_id, rank FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos_sim DESC, neighbor_id) AS rank
            FROM scored) t WHERE rank <= 5
    """


@register(
    "similarity_lsh_topk",
    oracle=_lsh_oracle_sql(),
    doc="§2.12 LSH-bucketed ANN top-k (banded random-hyperplane sketches, "
    "(band,bucket) hash join, exact re-rank — the 100 TB scale path; "
    "recall floor asserted in tests/test_operators.py). Deterministic "
    "seeded-LCG planes make even the bucketing oracle-able: the oracle "
    "inlines the identical plane constants as literal arrays.",
)
def similarity_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return similarity.lsh_topk(e, q, dim=64, k=5, n_planes=4, n_bands=6).select(
        "query_id", "neighbor_id", "rank"
    )


@register(
    "similarity_threshold_join",
    oracle="""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding, b.embedding) > 0.4
    """,
    doc="§2.12 embedding-cosine near-dup pairs (threshold self-join)",
)
def similarity_threshold_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings")
    # chunked-broadcast exact sweep: driver memory bounded at chunk_rows·dim
    # regardless of corpus size (the old form collected the whole table)
    return similarity.threshold_join_chunked(e, threshold=0.4).select(
        F.col("neighbor_id").alias("id_a"), F.col("query_id").alias("id_b")
    )


@register(
    "dedup_embedding_cosine",
    oracle="""
        SELECT v.vec_id
        FROM embeddings v
        WHERE NOT EXISTS (
            SELECT 1 FROM embeddings a
            WHERE a.vec_id < v.vec_id
              AND list_cosine_similarity(a.embedding, v.embedding) > 0.4
        )
    """,
    doc="§2.12 embedding-cosine near-dup DEDUP: min-id-wins pairwise "
    "suppression over the thresholded cosine pairs (the same pair source as "
    "similarity_threshold_join; at 100 TB the pairs come LSH-blocked)",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings")
    pairs = similarity.threshold_join_chunked(e, threshold=0.4).select(
        F.col("neighbor_id").alias("id_a"), F.col("query_id").alias("id_b")
    )
    return similarity.cosine_dedup(e, pairs)


@register(
    "text_token_count",
    oracle=f"""
        SELECT doc_id,
               CAST(len({_TOKS}) AS BIGINT) AS ws_tokens,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)
                   AS bpe_tokens
        FROM documents
    """,
    doc="§2.12 token counting: whitespace + BPE-ish regex",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        text.whitespace_token_count("text").alias("ws_tokens"),
        text.bpe_token_count("text").alias("bpe_tokens"),
    )


@register(
    "text_quality",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, text, {_TOKS} AS toks,
                   CAST(length(text) AS BIGINT) AS n_chars
            FROM documents
        )
        SELECT doc_id, n_chars,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               len(list_filter(toks, x -> list_contains(
                   ['the','a','of','and','is','el','la','de','que','es',
                    'der','die','das','und','ist','le','et','est'], x)))
                   / len(toks) AS stopword_ratio
        FROM t
    """,
    doc="§2.12 quality signals: char/token counts + stopword ratio "
    "(deterministic integer-derived ratios)",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    m = text.quality_metrics("text")
    return d.select(
        "doc_id",
        m["n_chars"].alias("n_chars"),
        m["n_tokens"].alias("n_tokens"),
        m["stopword_ratio"].alias("stopword_ratio"),
    )


@register(
    "text_quality_quantile_gate",
    oracle=f"""
        WITH t AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents),
        scored AS (
            SELECT doc_id, lang,
                   len(list_filter(toks, x -> list_contains(
                       ['the','a','of','and','is','el','la','de','que','es',
                        'der','die','das','und','ist','le','et','est'], x)))
                       / len(toks) AS q
            FROM t
        )
        SELECT doc_id, lang, q FROM (
            SELECT doc_id, lang, q,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY q ASC, doc_id ASC) AS rn,
                   count(*) OVER (PARTITION BY lang) AS n
            FROM scored
        )
        WHERE rn > floor(n * 400000 / 1000000)
    """,
    doc="§2.12 per-stratum quality gate: keep the top 60% of docs per "
    "language by stopword-ratio score — exact discrete-quantile semantics "
    "via integer rank arithmetic (row_number > floor((1-keep)·n)), no "
    "float quantile interpolation; rank and count share one Window "
    "partitioning (single shuffle on lang)",
)
def text_quality_quantile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    m = text.quality_metrics("text")
    scored = d.select("doc_id", "lang", m["stopword_ratio"].alias("q"))
    return text.quality_quantile_gate(
        scored, "lang", "q", "doc_id", keep_frac=0.6
    ).select("doc_id", "lang", "q")


@register(
    "text_langid",
    oracle="""
        WITH scores AS (
            SELECT doc_id,
                   len(list_filter(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
                       x -> list_contains(['the','a','of','and','is'], x))) AS s_en,
                   len(list_filter(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
                       x -> list_contains(['el','la','de','que','es'], x))) AS s_es,
                   len(list_filter(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
                       x -> list_contains(['der','die','das','und','ist'], x))) AS s_de,
                   len(list_filter(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
                       x -> list_contains(['le','la','de','et','est'], x))) AS s_fr
            FROM documents
        )
        SELECT doc_id,
               CASE
                 WHEN s_fr > greatest(s_en, s_es, s_de, 0) THEN 'fr'
                 WHEN s_de > greatest(s_en, s_es, 0) THEN 'de'
                 WHEN s_es > greatest(s_en, 0) THEN 'es'
                 WHEN s_en > 0 THEN 'en'
                 ELSE 'und'
               END AS pred_lang
        FROM scores
    """,
    doc="§2.12 language ID: marker-token argmax (later language wins ties "
    "above zero — mirrors the sequential when-chain in operators/text.py)",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    # two-step projection: tokenize ONCE, then score per language off the
    # materialized array (multi-reference stops CollapseProject from inlining
    # the tokenizer back into each language's filter)
    toks = d.select("doc_id", dedup.tokens("text").alias("__toks"))
    return toks.select("doc_id", text.lang_id_from_tokens(F.col("__toks")).alias("pred_lang"))


@register(
    "text_fingerprint",
    oracle=f"""
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct({_TOKS})), ' ')) AS fp
        FROM documents
    """,
    doc="§2.12 document fingerprint: md5 over sorted distinct tokens",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return d.select("doc_id", text.fingerprint("text").alias("fp"))


@register(
    "text_repetition_filter",
    oracle=f"""
        WITH base AS (SELECT doc_id AS id, {_TOKS} AS toks FROM documents),
        per_doc AS (
            SELECT id, CAST(len(toks) AS BIGINT) AS n_tokens,
                   CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
                   list_transform(generate_series(1, len(toks) - 1),
                                  i -> array_to_string(toks[i:i+1], ' ')) AS grams
            FROM base
        ),
        gram_rows AS (SELECT id, unnest(grams) AS gram FROM per_doc),
        top AS (
            SELECT id, max(c) AS top_c, CAST(SUM(c) AS BIGINT) AS total_c FROM (
                SELECT id, gram, count(*) AS c FROM gram_rows GROUP BY id, gram
            ) GROUP BY id
        )
        SELECT id, n_tokens,
               1.0 - CAST(n_distinct AS DOUBLE) / n_tokens AS dup_token_frac,
               COALESCE(CAST(top_c AS DOUBLE) / total_c, 0.0) AS top_bigram_frac
        FROM per_doc LEFT JOIN top USING (id)
    """,
    doc="§2.12 Gopher-style repetition signals: duplicate-token fraction "
    "(array arithmetic, no shuffle) + top-bigram fraction (explode + "
    "two-level agg on id — the shuffle carries (id, bigram), never text)",
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return text.repetition_metrics(d, "doc_id", "text")


@register(
    "text_redact_pii",
    oracle="""
        WITH seeded AS (
            SELECT doc_id,
                text || ' reach me: user' || doc_id || '@example.com or 555-01' ||
                    CAST(doc_id % 10 AS VARCHAR) || '-' ||
                    CAST(1000 + doc_id % 9000 AS VARCHAR) || ' ip 10.0.' ||
                    CAST(doc_id % 256 AS VARCHAR) || '.7' AS s
            FROM documents
        )
        SELECT doc_id,
            regexp_replace(regexp_replace(regexp_replace(s,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b', '<PHONE>', 'g'),
                '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g')
                AS redacted,
            CAST(len(regexp_extract_all(s,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
                AS n_email,
            CAST(len(regexp_extract_all(s,
                '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b')) AS BIGINT) AS n_phone,
            CAST(len(regexp_extract_all(s,
                '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT)
                AS n_ipv4
        FROM seeded
    """,
    doc="§2.12 PII scrubbing: chained JVM regexp_replace (email → phone → "
    "IPv4, RE2-safe patterns, no UDF). The corpus is synthetic word-soup "
    "with no PII, so each doc gets a deterministic PII suffix appended "
    "in-query; both engines then redact the identical string",
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    seeded = F.concat(
        F.col("text"),
        F.lit(" reach me: user"), F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-01"), (F.col("doc_id") % 10).cast("string"),
        F.lit("-"), (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
        F.lit(" ip 10.0."), (F.col("doc_id") % 256).cast("string"), F.lit(".7"),
    )
    counts = text.pii_counts(seeded)
    return d.select(
        "doc_id",
        text.redact_pii(seeded).alias("redacted"),
        counts["n_email"].alias("n_email"),
        counts["n_phone"].alias("n_phone"),
        counts["n_ipv4"].alias("n_ipv4"),
    )


@register(
    "text_chunk_windows",
    oracle=f"""
        WITH base AS (SELECT doc_id AS id, {_TOKS} AS toks FROM documents)
        SELECT id,
               CAST((start - 1) // 6 AS BIGINT) AS chunk_id,
               array_to_string(toks[start:start+7], ' ') AS chunk_text,
               CAST(len(toks[start:start+7]) AS BIGINT) AS n_chunk_tokens
        FROM (SELECT id, toks, unnest(generate_series(1, len(toks), 6)) AS start
              FROM base WHERE len(toks) > 0)
    """,
    doc="§2.12 context-window chunking: documents → 8-token chunks every 6 "
    "tokens (overlap 2) — one materialized token array per doc, explode, "
    "no shuffle (chunking is a map)",
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return text.chunk_tokens(d, "doc_id", "text", chunk_size=8, stride=6)


@register(
    "multimodal_metadata",
    oracle="""
        SELECT doc_id,
               CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
               'text/plain' AS mime,
               CAST(n_chars % 512 AS INT) AS fake_width,
               CAST(n_chars % 384 AS INT) AS fake_height
        FROM documents
    """,
    doc="§2.12 multimodal column plumbing: binary payload + typed metadata; "
    "decode is stubbed deterministically (see operators/multimodal.py)",
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_decodable_spark.operators.multimodal import attach_binary_payload, fake_decode_meta

    d = read_table(spark, sf_dir, "documents")
    with_bin = attach_binary_payload(d, "text")
    return fake_decode_meta(with_bin).select(
        "doc_id", "n_bytes", "mime", "fake_width", "fake_height"
    )


@register(
    "multimodal_features",
    oracle="""
        WITH codes AS (
            SELECT doc_id,
                   list_transform(generate_series(1, length(text)),
                                  i -> unicode(text[i])) AS cs
            FROM documents
        )
        SELECT doc_id,
               to_json(list_transform(generate_series(0, 15),
                   b -> len(list_filter(cs, c -> c // 16 = b)))) AS features
        FROM codes
    """,
    doc="§2.12 multimodal feature extraction: byte histogram over binary "
    "payloads (Arrow-batched mapInPandas + numpy — a real extractor, and "
    "the drop-in plumbing slot for a CNN/CLIP embedder). The driver-gated "
    "query emits the RAW BIGINT bin counts (bit-exact across engines — "
    "upgraded from rows-only to a value oracle: the payload is the utf-8 "
    "text, and on this ASCII corpus byte == codepoint, so DuckDB rebuilds "
    "the same histogram from character codes); the operator's default "
    "remains the L1-normalized float32 form, exactness unit-tested in "
    "tests/test_multimodal.py. to_json serialization because the driver's "
    "pandas canon sorts every output column (arrays are unhashable there).",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_decodable_spark.operators.multimodal import (
        attach_binary_payload,
        extract_features_pandas,
    )

    d = read_table(spark, sf_dir, "documents")
    feats = extract_features_pandas(
        attach_binary_payload(d, "text"), n_bins=16, normalize=False
    )
    return feats.select("doc_id", F.to_json(F.col("features")).alias("features"))


@register(
    "similarity_ivf_topk",
    oracle="""
        WITH cent AS (
          SELECT vec_id AS centroid_id, embedding AS centroid_vec
          FROM embeddings WHERE vec_id % 97 = 0 ORDER BY vec_id LIMIT 16
        ),
        assigned AS (
          SELECT vec_id, embedding, centroid_id FROM (
            SELECT c.vec_id, c.embedding, ct.centroid_id,
                   row_number() OVER (PARTITION BY c.vec_id
                     ORDER BY list_cosine_similarity(c.embedding, ct.centroid_vec) DESC,
                              ct.centroid_id) AS rn
            FROM embeddings c, cent ct) t WHERE rn = 1
        ),
        q AS (SELECT vec_id AS query_id, embedding AS q_vec
              FROM embeddings WHERE vec_id < 10),
        probes AS (
          SELECT query_id, q_vec, centroid_id FROM (
            SELECT q.query_id, q.q_vec, ct.centroid_id,
                   row_number() OVER (PARTITION BY q.query_id
                     ORDER BY list_cosine_similarity(q.q_vec, ct.centroid_vec) DESC,
                              ct.centroid_id) AS rn
            FROM q, cent ct) t WHERE rn <= 4
        ),
        cand AS (
          SELECT p.query_id, a.vec_id AS neighbor_id,
                 list_cosine_similarity(p.q_vec, a.embedding) AS cos_sim
          FROM probes p JOIN assigned a USING (centroid_id)
          WHERE a.vec_id <> p.query_id
        )
        SELECT query_id, neighbor_id, rank FROM (
          SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos_sim DESC, neighbor_id) AS rank
          FROM cand) t WHERE rank <= 5
    """,
    doc="§2.12 IVF-Flat ANN top-k: deterministic sampled coarse quantizer, "
    "inverted-list assignment, 4-of-16 probe, exact re-rank. The whole index "
    "is reproducible, so even the ANN path is oracle-checked (rank-only "
    "output). At scale the lists are partition-pruned parquet.",
)
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return similarity.ivf_topk(e, q, k=5, n_lists=16, n_probe=4, stride=97).select(
        "query_id", "neighbor_id", "rank"
    )


@register(
    "pack_token_shards",
    oracle=f"""
        WITH w AS (
            SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens FROM documents
        ),
        c AS (
            SELECT doc_id, n_tokens,
                   SUM(n_tokens) OVER (ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) AS cum_tokens
            FROM w
        )
        SELECT doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens,
               CAST(FLOOR((cum_tokens - n_tokens) / 2000) AS BIGINT) AS shard_id
        FROM c
    """,
    doc="§2.12 token-budget shard packing: exact global running token count "
    "via the two-phase distributed prefix sum (operators/packing.py — no "
    "single-task global window), then greedy ~2000-token shard assignment. "
    "All-integer outputs; the oracle is the naive SUM() OVER (ORDER BY).",
)
def pack_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_decodable_spark.operators import packing

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", text.whitespace_token_count("text").alias("n_tokens")
    )
    return packing.pack_by_budget(
        d, "doc_id", "n_tokens", budget=2000, cum_col="cum_tokens"
    ).select("doc_id", "n_tokens", "cum_tokens", "shard_id")


_SAMPLE_FRACTIONS = {"en": 0.5, "zh": 0.25, "es": 0.25}
from dbt_decodable_spark.operators.sampling import sql_stratified_filter as _ssf  # noqa: E402


@register(
    "sample_uniform",
    oracle="""
        SELECT doc_id, lang FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) < '333333'
    """,
    doc="§2.12 deterministic uniform sampling: md5-prefix hash gate at "
    "fraction 0.2 (0.2·16^6 = 0x333333) — map-side filter, no shuffle, "
    "reproducible across engines/partitionings",
)
def sample_uniform(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_decodable_spark.operators.sampling import deterministic_sample

    d = read_table(spark, sf_dir, "documents")
    return deterministic_sample(d, "doc_id", 0.2).select("doc_id", "lang")


@register(
    "sample_stratified",
    oracle=f"""
        SELECT doc_id, lang FROM documents
        WHERE {_ssf('lang', 'doc_id', _SAMPLE_FRACTIONS, 0.1)}
    """,
    doc="§2.12 deterministic stratified sampling: per-language hash-gate "
    "(md5-prefix threshold, operators/sampling.py) — partition-independent, "
    "reproducible across engines/runs, nested keep-sets across rates, "
    "broadcast threshold table so the 100 TB scan filters map-side.",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_decodable_spark.operators.sampling import stratified_sample

    d = read_table(spark, sf_dir, "documents")
    return stratified_sample(
        d, "lang", "doc_id", _SAMPLE_FRACTIONS, default_fraction=0.1
    ).select("doc_id", "lang")


_MIX_BUDGETS = {"en": 20000, "zh": 8000, "es": 8000}


@register(
    "mix_token_budget",
    oracle=f"""
        WITH w AS (
            SELECT doc_id, lang, CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
                   substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS pr
            FROM documents
        ),
        c AS (
            SELECT doc_id, lang, n_tokens,
                   SUM(n_tokens) OVER (PARTITION BY lang ORDER BY pr, doc_id
                                       ROWS UNBOUNDED PRECEDING) AS cum
            FROM w
        ),
        b AS (SELECT * FROM (VALUES ('en', 20000), ('es', 8000), ('zh', 8000))
              AS t(lang, budget))
        SELECT doc_id, lang, n_tokens, CAST(cum AS BIGINT) AS cum_tokens
        FROM c JOIN b USING (lang)
        WHERE cum - n_tokens < budget
    """,
    doc="§2.12 source-mix construction: per-language token budgets filled "
    "in deterministic md5-priority order via the stratum-partitioned "
    "two-phase distributed prefix sum (operators/mixing.py — no "
    "whole-stratum window task)",
)
def mix_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_decodable_spark.operators.mixing import mix_by_token_budget

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", text.whitespace_token_count("text").alias("n_tokens")
    )
    return mix_by_token_budget(
        d, stratum_col="lang", key_col="doc_id", weight_col="n_tokens",
        budgets=_MIX_BUDGETS, cum_col="cum_tokens",
    ).select("doc_id", "lang", "n_tokens", "cum_tokens")


@register(
    "text_vocab_topk",
    oracle=f"""
        WITH t AS (SELECT doc_id, unnest({_TOKS}) AS token FROM documents)
        SELECT token, count(*) AS cf, count(DISTINCT doc_id) AS df
        FROM t GROUP BY token
        ORDER BY cf DESC, token LIMIT 100
    """,
    doc="§2.12 vocabulary statistics: collection + document frequency per "
    "token, top-100 by cf (explode -> one groupBy with map-side partial "
    "aggs -> TakeOrderedAndProject; no global sort materializes)",
)
def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(dedup.tokens("text")).alias("token"))
    vocab = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("cf"),
        F.countDistinct("doc_id").alias("df"),
    )
    return vocab.orderBy(F.col("cf").desc(), "token").limit(100)


@register(
    "embedding_quantize_int8",
    oracle="""
        WITH s AS (
            SELECT vec_id,
                   list_max(list_transform(embedding,
                       x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale,
                   embedding
            FROM embeddings
        )
        SELECT vec_id, scale,
               array_to_string(
                 list_transform(embedding, x -> CASE WHEN scale = 0 THEN 0
                     ELSE CAST(greatest(-127, least(127,
                          floor(CAST(x AS DOUBLE) / scale + 0.5))) AS INT) END),
                 ',') AS qvec
        FROM s
    """,
    doc="§2.12 symmetric int8 embedding quantization (4x index shrink): "
    "scale = max|v|/127, floor(x/scale + 0.5) rounding (engine-portable, "
    "bit-exact oracle); pure JVM map, no shuffle. The registered query "
    "serializes qvec to a CSV string (driver's pandas canon sorts all "
    "output columns — raw arrays are unhashable there); the operator API "
    "(operators/similarity.quantize_int8) keeps the array form.",
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings")
    # two-step projection: materialize the scale so the per-element lambda
    # references a plain column, not an O(dim) subexpression (see
    # quantize_int8's PERF note)
    scale_expr, _ = similarity.quantize_int8(F.col("embedding"))
    staged = e.select("vec_id", "embedding", scale_expr.alias("scale"))
    _, q = similarity.quantize_int8(F.col("embedding"), scale=F.col("scale"))
    return staged.select(
        "vec_id",
        "scale",
        F.concat_ws(",", q.cast("array<string>")).alias("qvec"),
    )


@register(
    "dedup_incremental_minhash",
    oracle=f"""
        WITH {_MINHASH_PAIRS_CTES}
        SELECT id_a, id_b FROM pairs
        WHERE id_a % 10 >= 8 OR id_b % 10 >= 8
    """,
    doc="§2.12 incremental near-dup detection: candidate pairs touching the "
    "new ingest batch (doc_id % 10 >= 8 stands in for today's increment) — "
    "only new docs are hashed against the stored signature index at scale "
    "(operators/dedup.py minhash_incremental_candidates)",
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    new_batch = d.filter(F.col("doc_id") % 10 >= 8)
    return dedup.minhash_incremental_candidates(d, new_batch, "doc_id", "text")


@register(
    "corpus_stats_by_source",
    oracle=f"""
        SELECT source, lang,
               count(*) AS n_docs,
               CAST(SUM(CAST(len({_TOKS}) AS BIGINT)) AS BIGINT) AS total_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               min(n_chars) AS min_chars, max(n_chars) AS max_chars
        FROM documents GROUP BY source, lang
    """,
    doc="§2.12 corpus summary statistics per (source, lang): doc/token/char "
    "totals — the dataset-card numbers every training-data pipeline "
    "publishes; one groupBy with map-side partial aggs",
)
def corpus_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(text.whitespace_token_count("text")).alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "dedup_paragraph_exact",
    oracle=f"""
        WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        idx AS (
            SELECT doc_id, toks,
                   unnest(generate_series(1, CAST(ceil(len(toks) / 5.0) AS BIGINT))) AS i
            FROM base
        ),
        segs AS (
            SELECT doc_id, i - 1 AS seg_idx,
                   array_to_string(toks[(i - 1) * 5 + 1 : i * 5], ' ') AS segment
            FROM idx
            WHERE len(array_to_string(toks[(i - 1) * 5 + 1 : i * 5], ' ')) > 0
        ),
        dups AS (
            SELECT segment FROM segs GROUP BY segment
            HAVING count(DISTINCT doc_id) >= 2
        ),
        totals AS (SELECT doc_id, count(*) AS n_segments FROM segs GROUP BY doc_id),
        kept AS (
            SELECT * FROM segs WHERE segment NOT IN (SELECT segment FROM dups)
        ),
        rebuilt AS (
            SELECT doc_id,
                   string_agg(segment, ' ' ORDER BY seg_idx) AS clean_text,
                   count(*) AS n_kept
            FROM kept GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(r.clean_text, '') AS clean_text,
               COALESCE(t.n_segments, 0) AS n_segments,
               COALESCE(t.n_segments, 0) - COALESCE(r.n_kept, 0) AS n_removed
        FROM documents d
        LEFT JOIN totals t ON t.doc_id = d.doc_id
        LEFT JOIN rebuilt r ON r.doc_id = d.doc_id
    """,
    doc="§2.12 paragraph-level exact dedup (FineWeb/RefinedWeb boilerplate "
    "pass): segment every document (5-token windows here; '\\n\\n' "
    "paragraphs on corpora with layout), drop segments shared by >=2 "
    "distinct documents from all of them, reassemble in order. One "
    "groupBy(segment) shuffle + broadcast anti join + one groupBy(id).",
)
def dedup_paragraph_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return dedup.remove_duplicate_segments(
        d, "doc_id", "text", seg_tokens=5, min_docs=2
    )


@register(
    "dedup_cluster_keep_best",
    oracle=f"""
        WITH RECURSIVE {_MINHASH_PAIRS_CTES},
        sym AS (
            SELECT id_a AS s, id_b AS d FROM pairs
            UNION SELECT id_b, id_a FROM pairs
        ),
        reach AS (
            SELECT s AS id, d AS r FROM sym
            UNION
            SELECT reach.id, sym.d FROM reach JOIN sym ON reach.r = sym.s
        ),
        comp AS (SELECT id, LEAST(id, MIN(r)) AS component FROM reach GROUP BY id),
        labeled AS (
            SELECT d.doc_id, d.n_chars,
                   COALESCE(c.component, d.doc_id) AS component
            FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
        )
        SELECT doc_id, n_chars, component,
               (row_number() OVER (
                    PARTITION BY component
                    ORDER BY n_chars DESC, doc_id ASC) = 1) AS keep
        FROM labeled
    """,
    doc="§2.12 keep-best cluster dedup: same MinHash-LSH pair source and "
    "connected components as dedup_connected_components, but the cluster "
    "representative is the HIGHEST-QUALITY member (n_chars desc, id asc "
    "tie-break) — the keep-longest-copy policy training pipelines use. "
    "Per-component arg-max is one window shuffle on the component key.",
)
def dedup_cluster_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_decodable_spark.operators.graph import keep_best_representative

    d = read_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_candidates(d, "doc_id", "text", n=3, num_hashes=6)
    return keep_best_representative(d, pairs, "doc_id", "n_chars")


@register(
    "dedup_semantic_clusters",
    oracle="""
        WITH cent AS (
          SELECT vec_id AS centroid_id, embedding AS centroid_vec
          FROM embeddings WHERE vec_id % 97 = 0 ORDER BY vec_id LIMIT 16
        ),
        assigned AS (
          SELECT vec_id, embedding, centroid_id FROM (
            SELECT c.vec_id, c.embedding, ct.centroid_id,
                   row_number() OVER (PARTITION BY c.vec_id
                     ORDER BY list_cosine_similarity(c.embedding, ct.centroid_vec) DESC,
                              ct.centroid_id) AS rn
            FROM embeddings c, cent ct) t WHERE rn = 1
        )
        SELECT a.vec_id, a.centroid_id AS cluster
        FROM assigned a
        WHERE NOT EXISTS (
            SELECT 1 FROM assigned b
            WHERE b.centroid_id = a.centroid_id
              AND b.vec_id < a.vec_id
              AND list_cosine_similarity(a.embedding, b.embedding) > 0.4
        )
    """,
    doc="§2.12 semantic dedup (SemDeDup shape): coarse-quantizer clusters "
    "(same deterministic sampled centroids as similarity_ivf_topk), then "
    "suppress any vector cosine-similar (>0.4) to an earlier member of its "
    "own cluster. Within-cluster pairs only — the clustering bounds the "
    "quadratic term; at 100 TB raise n_lists so clusters stay executor-sized.",
)
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings")
    return similarity.semantic_dedup(
        e, n_lists=16, stride=97, threshold=0.4
    )


@register(
    "text_salient_terms",
    oracle=f"""
        WITH term_rows AS (
            SELECT doc_id, unnest({_TOKS}) AS term FROM documents
        ),
        tf AS (
            SELECT doc_id, term, count(*) AS tf
            FROM term_rows WHERE len(term) > 0 GROUP BY 1, 2
        ),
        dfc AS (SELECT term, count(*) AS dfc FROM tf GROUP BY term),
        n AS (SELECT count(*) AS n_docs FROM documents)
        SELECT doc_id, term, tf, score, rank FROM (
            SELECT tf.doc_id, tf.term, tf.tf,
                   tf.tf * (n.n_docs - dfc.dfc) AS score,
                   row_number() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY tf.tf * (n.n_docs - dfc.dfc) DESC, tf.term
                   ) AS rank
            FROM tf JOIN dfc USING (term), n
        ) t WHERE rank <= 3
    """,
    doc="§2.12 per-document salient terms: top-3 by the integer-exact "
    "rarity weight tf × (N − df) — TF-IDF's ranking shape without the "
    "libm-dependent log, so the whole ranking is oracle-comparable. "
    "Shuffles move (term, count) pairs only; N broadcasts as one scalar.",
)
def text_salient_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return text.salient_terms(d, "doc_id", "text", k=3)


@register(
    "text_winnowing",
    oracle=f"""
        WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        grams AS (
            SELECT doc_id,
                   list_transform(
                       generate_series(1, greatest(len(toks) - 3, 1)),
                       i -> md5(array_to_string(toks[i:i+3], ' '))) AS h
            FROM base
        ),
        idx AS (
            SELECT doc_id, h,
                   unnest(generate_series(1, greatest(len(h) - 3, 1))) AS j
            FROM grams
        )
        SELECT DISTINCT doc_id,
               CAST(j + list_position(h[j:j+3], list_min(h[j:j+3])) - 2 AS INT) AS pos,
               list_min(h[j:j+3]) AS fp
        FROM idx
    """,
    doc="§2.12 winnowing fingerprints (MOSS, SIGMOD'03): md5 over 4-token "
    "grams, leftmost-min of each 4-hash window with its gram position — "
    "guarantees a shared fingerprint for any ≥7-token exact overlap. Pure "
    "per-document JVM array arithmetic; no shuffle before the distinct.",
)
def text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return text.winnow_fingerprints(d, "doc_id", "text", k=4, w=4)


@register(
    "text_bigram_commonness",
    oracle=f"""
        WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        grams AS (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, greatest(len(toks) - 1, 1)),
                       i -> array_to_string(toks[i:i+1], ' '))) AS gram
            FROM base
            WHERE len(toks) >= 2
        ),
        counts AS (SELECT gram, count(*) AS cf FROM grams GROUP BY gram),
        per_doc AS (
            SELECT g.doc_id, count(*) AS n_bigrams, SUM(c.cf) AS total_cf
            FROM grams g JOIN counts c USING (gram)
            GROUP BY g.doc_id
        )
        SELECT d.doc_id,
               COALESCE(p.n_bigrams, 0) AS n_bigrams,
               CAST(COALESCE(p.total_cf, 0) AS BIGINT) AS total_cf,
               CAST(p.total_cf AS DOUBLE) / p.n_bigrams AS commonness
        FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
    """,
    doc="§2.12 bigram-commonness quality score: average corpus frequency "
    "of a document's bigram occurrences — the integer-exact stand-in for "
    "LM perplexity (log-prob sums are libm-dependent and not oracle-"
    "comparable). One groupBy(gram) + key join + one groupBy(id); "
    "shuffles carry (gram, count) pairs only.",
)
def text_bigram_commonness(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return text.bigram_commonness(d, "doc_id", "text")


@register(
    "similarity_ivf_quantized_topk",
    oracle="""
        WITH cent AS (
          SELECT vec_id AS centroid_id, embedding AS centroid_vec
          FROM embeddings WHERE vec_id % 97 = 0 ORDER BY vec_id LIMIT 16
        ),
        assigned AS (
          SELECT vec_id, embedding, centroid_id FROM (
            SELECT c.vec_id, c.embedding, ct.centroid_id,
                   row_number() OVER (PARTITION BY c.vec_id
                     ORDER BY list_cosine_similarity(c.embedding, ct.centroid_vec) DESC,
                              ct.centroid_id) AS rn
            FROM embeddings c, cent ct) t WHERE rn = 1
        ),
        quant AS (
          SELECT vec_id, centroid_id, embedding,
                 list_max(list_transform(embedding,
                     x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
          FROM assigned
        ),
        deq AS (
          SELECT vec_id, centroid_id,
                 list_transform(embedding,
                     x -> CASE WHEN scale = 0 THEN 0.0
                          ELSE CAST(greatest(-127, least(127,
                               floor(CAST(x AS DOUBLE) / scale + 0.5))) AS DOUBLE)
                               * scale END) AS dvec
          FROM quant
        ),
        q AS (SELECT vec_id AS query_id, embedding AS q_vec
              FROM embeddings WHERE vec_id < 10),
        probes AS (
          SELECT query_id, q_vec, centroid_id FROM (
            SELECT q.query_id, q.q_vec, ct.centroid_id,
                   row_number() OVER (PARTITION BY q.query_id
                     ORDER BY list_cosine_similarity(q.q_vec, ct.centroid_vec) DESC,
                              ct.centroid_id) AS rn
            FROM q, cent ct) t WHERE rn <= 4
        ),
        cand AS (
          SELECT p.query_id, d.vec_id AS neighbor_id,
                 list_cosine_similarity(p.q_vec, d.dvec) AS cos_sim
          FROM probes p JOIN deq d USING (centroid_id)
          WHERE d.vec_id <> p.query_id
        )
        SELECT query_id, neighbor_id, rank FROM (
          SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos_sim DESC, neighbor_id) AS rank
          FROM cand) t WHERE rank <= 5
    """,
    doc="§2.12 IVF ANN over the INT8-QUANTIZED index: the inverted lists "
    "store (qvec, scale) — 4x smaller, the in-memory-at-100TB form — and "
    "candidates are scored on exactly-dequantized values (q_i x scale is "
    "exact IEEE), so even the quantized search path is oracle-checkable. "
    "Full-precision queries, same probe/re-rank plan as similarity_ivf_topk.",
)
def similarity_ivf_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return similarity.ivf_topk_quantized(
        e, q, k=5, n_lists=16, n_probe=4, stride=97
    )
