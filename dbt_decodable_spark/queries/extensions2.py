"""Round-6 extension queries (SURVEY §2.12 continued): Bloom-filter
incremental-dedup pre-filter, exact-substring duplicate spans, Gopher
quality gates, temperature-scaled source mixing, deterministic
train/val/test splits, and windowed streaming top-k — each with a DuckDB
value oracle (md5-keyed hashing and integer-exact arithmetic keep every
operator engine-portable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dbt_decodable_spark.operators import bloom, dedup, mixing, sampling, text
from dbt_decodable_spark.queries import register
from dbt_decodable_spark.queries.extensions import (
    _MINHASH_PAIRS_CTES,
    _NORM,
    _TOKS,
)
from dbt_decodable_spark.sources.tables import read_table

# ------------------------------------------------------------ bloom filter

_BLOOM_M = 1 << 16
_BLOOM_K = 4


@register(
    "dedup_bloom_filter",
    oracle=f"""
        WITH hist AS (
            SELECT md5({_NORM}) AS key FROM documents WHERE doc_id % 10 < 8
        ),
        batch AS (
            SELECT doc_id, md5({_NORM}) AS key FROM documents
            WHERE doc_id % 10 >= 8
        ),
        hp AS (
            SELECT CAST('0x' || substr(md5(CAST(j AS VARCHAR) || '#' || key), 1, 15)
                        AS BIGINT) % {_BLOOM_M} AS pos
            FROM hist CROSS JOIN unnest(range({_BLOOM_K})) AS t(j)
        ),
        words AS (
            SELECT pos // 32 AS word_idx,
                   bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits
            FROM hp GROUP BY 1
        ),
        bp AS (
            SELECT doc_id,
                   CAST('0x' || substr(md5(CAST(j AS VARCHAR) || '#' || key), 1, 15)
                        AS BIGINT) % {_BLOOM_M} AS pos
            FROM batch CROSS JOIN unnest(range({_BLOOM_K})) AS t(j)
        ),
        hit AS (
            SELECT doc_id,
                   CASE WHEN (coalesce(bits, 0) >> CAST(pos % 32 AS INT)) & 1 = 1
                        THEN 1 ELSE 0 END AS h
            FROM bp LEFT JOIN words ON words.word_idx = bp.pos // 32
        )
        SELECT doc_id, CAST(min(h) AS INT) AS maybe_seen
        FROM hit GROUP BY doc_id
    """,
    doc="§2.12 Bloom-filter incremental-dedup pre-filter: 2^16-bit filter "
    "built distributed over the 80% history partition (groupBy(word_idx) + "
    "bit_or — map-side partial OR, filter is m/32 rows, never a driver "
    "object), broadcast to the 20% batch scan; maybe_seen=0 rows are "
    "certainly new and skip the exact index entirely (operators/bloom.py)",
)
def dedup_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5(dedup.normalize_text("text")).alias("key")
    )
    history = d.filter(F.col("doc_id") % 10 < 8)
    batch = d.filter(F.col("doc_id") % 10 >= 8)
    out = bloom.bloom_prefilter_new_keys(
        history, batch, "key", "doc_id", m_bits=_BLOOM_M, k=_BLOOM_K
    )
    return out.select("doc_id", F.col("maybe_seen").cast("int").alias("maybe_seen"))


# ----------------------------------------------------- duplicate n-gram spans

_SPAN_N = 8


@register(
    "dedup_span_ngram",
    oracle=f"""
        WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        wins AS (
            SELECT doc_id, i - 1 AS pos,
                   md5(array_to_string(toks[i:i+{_SPAN_N - 1}], ' ')) AS gh
            FROM base CROSS JOIN
                 unnest(generate_series(1, greatest(len(toks) - {_SPAN_N - 1}, 0)))
                 AS t(i)
        ),
        cross_doc AS (
            SELECT gh FROM wins GROUP BY gh HAVING min(doc_id) <> max(doc_id)
        ),
        dup AS (
            SELECT doc_id, pos FROM wins WHERE gh IN (SELECT gh FROM cross_doc)
        ),
        run AS (
            SELECT doc_id, pos,
                   max(pos + {_SPAN_N - 1}) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS prev_end
            FROM dup
        ),
        isl AS (
            SELECT doc_id, pos,
                   sum(CASE WHEN prev_end IS NULL OR pos > prev_end + 1
                            THEN 1 ELSE 0 END) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS UNBOUNDED PRECEDING
                   ) AS g
            FROM run
        )
        SELECT doc_id, min(pos) AS span_start,
               max(pos) + {_SPAN_N - 1} AS span_end,
               count(*) AS n_windows
        FROM isl GROUP BY doc_id, g
    """,
    doc="§2.12 exact-substring duplicate spans (Lee et al. ACL'22 suffix-"
    "array dedup, re-expressed as an 8-token-window inverted index): "
    "cross-doc grams via groupBy(gh).min/max(id) — no countDistinct, no "
    "quadratic step; span merge is per-doc gaps-and-islands "
    "(operators/dedup.py::duplicate_ngram_spans)",
)
def dedup_span_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return dedup.duplicate_ngram_spans(d, "doc_id", "text", n=_SPAN_N).select(
        F.col("id").alias("doc_id"),
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_end").cast("long").alias("span_end"),
        "n_windows",
    )


# ------------------------------------------------------------ Gopher gates

_GOPHER_STOP_SQL = "['" + "', '".join(text.GOPHER_STOPWORDS) + "']"
_GOPHER_STOP_SQL_E2E = _GOPHER_STOP_SQL


@register(
    "text_gopher_quality",
    oracle=f"""
        WITH m AS (
            SELECT doc_id,
                   CAST(len(toks) AS BIGINT) AS n_words,
                   (CAST(length(norm) AS BIGINT) - (len(toks) - 1))
                       / nullif(len(toks), 0) AS mean_word_len,
                   CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
                        AS BIGINT) / nullif(len(toks), 0) AS frac_alpha_words,
                   CAST(len(list_filter(toks,
                        t -> list_contains({_GOPHER_STOP_SQL}, t)))
                        AS BIGINT) AS n_stopword_hits,
                   CAST(len(regexp_extract_all(text, '#')) +
                        len(regexp_extract_all(text, '\\.\\.\\.'))
                        AS BIGINT) / nullif(len(toks), 0) AS symbol_ratio
            FROM (SELECT doc_id, text, {_NORM} AS norm, {_TOKS} AS toks
                  FROM documents)
        )
        SELECT doc_id, n_words, mean_word_len, frac_alpha_words,
               n_stopword_hits,
               CASE WHEN n_words >= 50 AND n_words <= 100000
                         AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                         AND frac_alpha_words >= 0.8
                         AND n_stopword_hits >= 2
                         AND symbol_ratio <= 0.1
                    THEN 1 ELSE 0 END AS gopher_pass
        FROM m
    """,
    doc="§2.12 Gopher/MassiveText quality gates (Rae et al. 2021 A1.1): "
    "word-count bounds, mean word length, alphabetic-word fraction, "
    "stopword presence, symbol ratio — all JVM expressions, ratios are "
    "single divisions of exact BIGINT counts (operators/text.py)",
)
def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    m = text.gopher_metrics("text")
    return d.select(
        "doc_id",
        m["n_words"].alias("n_words"),
        m["mean_word_len"].alias("mean_word_len"),
        m["frac_alpha_words"].alias("frac_alpha_words"),
        m["n_stopword_hits"].alias("n_stopword_hits"),
        text.gopher_pass("text").alias("gopher_pass"),
    )


# ------------------------------------------------- temperature-scaled mixing

_TEMP_BUDGET = 10_000


@register(
    "mix_temperature_quota",
    oracle=f"""
        WITH per AS (
            SELECT source AS stratum,
                   CAST(sum(len({_TOKS})) AS BIGINT) AS n_tokens
            FROM documents GROUP BY 1
        ),
        w AS (
            SELECT stratum, n_tokens,
                   CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS weight
            FROM per
        ),
        t AS (SELECT CAST(sum(weight) AS BIGINT) AS tw FROM w),
        b AS (
            SELECT stratum, n_tokens, weight,
                   ({_TEMP_BUDGET} * weight) // tw AS q0,
                   ({_TEMP_BUDGET} * weight) % tw AS rem
            FROM w CROSS JOIN t
        ),
        lo AS (SELECT CAST({_TEMP_BUDGET} - sum(q0) AS BIGINT) AS leftover FROM b),
        r AS (
            SELECT *, row_number() OVER (ORDER BY rem DESC, stratum ASC) AS rk
            FROM b
        )
        SELECT stratum, n_tokens, weight,
               CAST(q0 + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
                   AS quota
        FROM r CROSS JOIN lo
    """,
    doc="§2.12 temperature-scaled source mixing (τ=0.5, Conneau & Lample "
    "2019 / mT5 sampling rule): budget split ∝ sqrt(source tokens) — sqrt "
    "is IEEE-correctly-rounded so floor(sqrt(n)) is engine-exact; quotas "
    "by largest-remainder apportionment in pure BIGINT arithmetic, "
    "sum(quota) == budget exactly (operators/mixing.py)",
)
def mix_temperature_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        F.col("source"), F.size(dedup.tokens("text")).cast("long").alias("n_tok")
    )
    return mixing.temperature_quotas(toks, "source", "n_tok", _TEMP_BUDGET)


# ------------------------------------------------------ train/val/test split


@register(
    "sample_split_assign",
    oracle="""
        SELECT doc_id,
               CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                         AS BIGINT) % 100 < 1 THEN 'test'
                    WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                         AS BIGINT) % 100 < 2 THEN 'val'
                    ELSE 'train' END AS split
        FROM documents
    """,
    doc="§2.12 deterministic train/val/test split: 60 md5 bits mod 100 → "
    "98/1/1; partition-independent and stable under corpus growth, so "
    "val/test never leak into train across re-runs "
    "(operators/sampling.py::train_val_test_split); map-only, no shuffle",
)
def sample_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return sampling.train_val_test_split(d, "doc_id", val_pct=1, test_pct=1).select(
        "doc_id", "split"
    )


# -------------------------------------------------- streaming windowed top-k


@register(
    "stream_window_topk",
    oracle="""
        WITH counts AS (
            SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP))
                       AS window_start,
                   event_type, count(*) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT window_start, event_type, n, CAST(rk AS BIGINT) AS rk
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY window_start ORDER BY n DESC, event_type ASC
            ) AS rk
            FROM counts
        ) t WHERE rk <= 2
    """,
    doc="§2.9/§2.12 windowed top-k: tumbling 1h event-time windows → "
    "per-window top-2 event types (rank by count, deterministic "
    "tie-break). Streaming shape: the windowed count is an UPDATE-mode "
    "streaming agg; the rank is the per-window-close fold (same split as "
    "stream_change_fold). Batch plan: partial-agg'd window count + one "
    "bounded per-window TakeOrdered — no global sort.",
)
def stream_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = read_table(spark, sf_dir, "events")
    counts = (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("window_start"), "event_type", "n")
    )
    rk = F.row_number().over(
        W.partitionBy("window_start").orderBy(F.col("n").desc(), F.col("event_type"))
    )
    return counts.withColumn("rk", rk.cast("long")).filter(F.col("rk") <= 2)


# ----------------------------------------------------------- markup strip


@register(
    "text_strip_markup",
    oracle=f"""
        WITH h AS (
            SELECT doc_id,
                   '<p class="d">' || substr(text, 1, 40)
                   || '</p> <a href="/d/' || CAST(doc_id AS VARCHAR)
                   || '">link&amp;more</a> &lt;raw ' || lang || '&gt;' AS html
            FROM documents WHERE doc_id < 300
        )
        SELECT doc_id,
               trim(regexp_replace(
                   replace(replace(replace(replace(replace(
                       regexp_replace(html, '<[^>]*>', ' ', 'g'),
                       '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                       '&#39;', ''''), '&amp;', '&'),
                   '\\s+', ' ', 'g')) AS clean,
               CAST(length(html) AS BIGINT) AS raw_len
        FROM h
    """,
    doc="§2.12 markup stripping (the C4/FineWeb HTML-cleanup pass): tag "
    "removal + ordered entity decode (&amp; last) + whitespace collapse — "
    "one map-only regexp_replace/replace chain (operators/text.py::"
    "strip_markup). Markup is synthesized around real document text "
    "because the test corpus is plain-text.",
)
def text_strip_markup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    html = F.concat(
        F.lit('<p class="d">'), F.substring("text", 1, 40),
        F.lit('</p> <a href="/d/'), F.col("doc_id").cast("string"),
        F.lit('">link&amp;more</a> &lt;raw '), F.col("lang"), F.lit("&gt;"),
    )
    return d.select(
        "doc_id",
        text.strip_markup(html).alias("clean"),
        F.length(html).cast("long").alias("raw_len"),
    )


# ------------------------------------------------------- URL canonical dedup


@register(
    "dedup_url_canonical",
    oracle="""
        WITH u AS (
            SELECT doc_id,
                   CASE CAST(doc_id % 4 AS INT)
                     WHEN 0 THEN 'https://www.Corpus.example/pages/'
                                 || CAST(doc_id // 4 AS VARCHAR) || '/'
                     WHEN 1 THEN 'http://corpus.example/pages/'
                                 || CAST(doc_id // 4 AS VARCHAR)
                                 || '?utm_source=feed'
                     WHEN 2 THEN 'https://CORPUS.example/pages/'
                                 || CAST(doc_id // 4 AS VARCHAR) || '#frag'
                     ELSE 'https://corpus.example/pages/'
                                 || CAST(doc_id // 4 AS VARCHAR)
                                 || '?id=7&utm_campaign=x'
                   END AS url
            FROM documents
        ),
        c AS (
            SELECT doc_id,
                   regexp_replace(regexp_replace(regexp_replace(
                       regexp_replace(regexp_replace(regexp_replace(
                       regexp_replace(regexp_replace(
                           lower(url), '#.*$', ''), '^https?://', ''),
                           '^www\\.', ''), '&utm_[^&]*', '', 'g'),
                           '\\?utm_[^&]*&', '?'), '\\?utm_[^&]*$', ''),
                           '\\?$', ''), '/$', '') AS curl
            FROM u
        )
        SELECT curl, min(doc_id) AS doc_id, count(*) AS n_variants
        FROM c GROUP BY curl
    """,
    doc="§2.12 URL canonicalization dedup (crawl pipeline): scheme/www/"
    "fragment/utm-param/trailing-slash variants of a page collapse to one "
    "key before exact dedup (operators/text.py::canonical_url — regex "
    "pipeline, no capture-group replacements for engine portability). "
    "URLs synthesized from doc_id so each page has 3-4 colliding "
    "spellings; ?id=7 survives, utm_* does not.",
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    base = F.concat(F.expr("CAST(doc_id div 4 AS STRING)"))
    url = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("https://www.Corpus.example/pages/"), base, F.lit("/")),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(
                F.lit("http://corpus.example/pages/"), base, F.lit("?utm_source=feed")
            ),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.lit("https://CORPUS.example/pages/"), base, F.lit("#frag")),
        )
        .otherwise(
            F.concat(
                F.lit("https://corpus.example/pages/"), base,
                F.lit("?id=7&utm_campaign=x"),
            )
        )
    )
    return (
        d.select("doc_id", text.canonical_url(url).alias("curl"))
        .groupBy("curl")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_variants"))
    )


# ------------------------------------------------------ length bucketing

_LB_B = 8


@register(
    "pack_length_buckets",
    oracle=f"""
        WITH l AS (
            SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS length
            FROM documents
        ),
        hist AS (SELECT length AS len, count(*) AS cnt FROM l GROUP BY 1),
        cum AS (
            SELECT len, sum(cnt) OVER (ORDER BY len ROWS UNBOUNDED PRECEDING) AS c
            FROM hist
        ),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM l),
        b AS (SELECT CAST(unnest(range(1, {_LB_B + 1})) AS BIGINT) AS bucket),
        thr AS (
            SELECT bucket, min(len) AS upper_len
            FROM cum CROSS JOIN tot CROSS JOIN b
            WHERE c >= (bucket * n + {_LB_B - 1}) // {_LB_B}
            GROUP BY bucket
        )
        SELECT doc_id, length, CAST(min(bucket) AS BIGINT) AS bucket
        FROM l JOIN thr ON l.length <= thr.upper_len
        GROUP BY doc_id, length
    """,
    doc="§2.12 sequence-length bucketing for batched training/inference: "
    "exact B-quantile thresholds computed on the LENGTH HISTOGRAM "
    "(bounded by distinct lengths, never corpus rows — the no-global-sort "
    "exact quantile), broadcast, then a B-comparison map-side assignment "
    "(operators/packing.py::assign_length_buckets). Minimizes padding "
    "waste inside a batch; all BIGINT arithmetic.",
)
def pack_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_decodable_spark.operators.packing import assign_length_buckets

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(dedup.tokens("text")).cast("long").alias("n_tok")
    )
    return assign_length_buckets(d, "doc_id", "n_tok", _LB_B).select(
        F.col("id").alias("doc_id"), "length", "bucket"
    )


# ----------------------------------------------------- novelty / quantiles / OOV

_SHINGLE_CTES = f"""base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        sh AS (
            SELECT DISTINCT id, shingle FROM (
                SELECT doc_id AS id,
                       unnest(list_transform(
                           generate_series(1, len(toks) - 2),
                           i -> array_to_string(toks[i:i+2], ' '))) AS shingle
                FROM base
            )
        )"""


@register(
    "text_novelty_score",
    oracle=f"""
        WITH {_SHINGLE_CTES},
        dfq AS (SELECT shingle, count(*) AS dfc FROM sh GROUP BY 1)
        SELECT id AS doc_id,
               CAST(count(*) AS BIGINT) AS n_shingles,
               CAST(sum(CASE WHEN dfc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
               CAST(sum(CASE WHEN dfc = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   / count(*) AS novelty
        FROM sh JOIN dfq USING (shingle)
        GROUP BY id
    """,
    doc="§2.12 n-gram novelty scoring: fraction of a doc's distinct "
    "3-gram shingles occurring in NO other document — the diversity "
    "up-weighting signal (inverse of duplication). Shingle inverted index "
    "+ document-frequency agg, no pair join (operators/text.py::"
    "novelty_scores).",
)
def text_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return text.novelty_scores(d, "doc_id", "text", n=3).select(
        F.col("id").alias("doc_id"), "n_shingles", "n_novel", "novelty"
    )


@register(
    "corpus_length_quantiles",
    oracle=f"""
        WITH l AS (
            SELECT source AS stratum, CAST(len({_TOKS}) AS BIGINT) AS ln
            FROM documents
        ),
        r AS (
            SELECT stratum, ln,
                   row_number() OVER (PARTITION BY stratum ORDER BY ln ASC) AS rn
            FROM l
        ),
        c AS (SELECT stratum, CAST(max(rn) AS BIGINT) AS n_rows FROM r GROUP BY 1)
        SELECT stratum, n_rows,
               CAST(max(CASE WHEN rn = (n_rows * 50 + 99) // 100 THEN ln END)
                    AS BIGINT) AS q50,
               CAST(max(CASE WHEN rn = (n_rows * 90 + 99) // 100 THEN ln END)
                    AS BIGINT) AS q90
        FROM r JOIN c USING (stratum)
        GROUP BY stratum, n_rows
    """,
    doc="§2.12 per-source exact length quantiles (curation reporting): "
    "value at integer rank ceil(q·n/100) within each stratum — the "
    "engine-exact discrete-quantile rule of quality_quantile_gate; one "
    "window shuffle PARTITIONED BY STRATUM, never a global sort. The "
    "value at a rank is unique under tied lengths even though the tie "
    "permutation differs per engine (operators/text.py::"
    "stratum_length_quantiles).",
)
def corpus_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents").select(
        "source", F.size(dedup.tokens("text")).cast("long").alias("n_tok")
    )
    return text.stratum_length_quantiles(d, "source", "n_tok", (50, 90))


_OOV_VOCAB_K = 50


@register(
    "text_oov_rate",
    oracle=f"""
        WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        tok AS (SELECT doc_id, unnest(toks) AS t FROM base),
        voc AS (
            SELECT t FROM (SELECT t, count(*) AS c FROM tok GROUP BY t)
            ORDER BY c DESC, t ASC LIMIT {_OOV_VOCAB_K}
        ),
        vl AS (SELECT list(t) AS vs FROM voc)
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(len(list_filter(toks, x -> NOT list_contains(vs, x)))
                    AS BIGINT) AS n_oov,
               CAST(len(list_filter(toks, x -> NOT list_contains(vs, x)))
                    AS BIGINT) / nullif(len(toks), 0) AS oov_frac
        FROM base CROSS JOIN vl
    """,
    doc="§2.12 OOV-rate against the corpus top-50 vocabulary (tokenizer-"
    "fit metric): vocab = TakeOrdered(count desc, token asc — total, "
    "deterministic under boundary ties), collected (50 rows, bounded by "
    "definition) and shipped as an array literal → the scan stays "
    "map-only, no join (operators/text.py::oov_rate).",
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(dedup.tokens("text")).alias("t"))
    vocab_rows = (
        tok.groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("t").asc())
        .limit(_OOV_VOCAB_K)
        .collect()
    )
    vocab = [r["t"] for r in vocab_rows]
    return text.oov_rate(d, "doc_id", "text", vocab).select(
        F.col("id").alias("doc_id"), "n_tokens", "n_oov", "oov_frac"
    )


# --------------------------------------------------------------- KMV sketch

_KMV_K = 64
_KMV_SPACE = 16 ** 15  # 60-bit hash space (15 hex chars)


@register(
    "agg_kmv_distinct",
    oracle=f"""
        WITH h AS (
            SELECT DISTINCT CAST('0x' || substr(md5(trim(regexp_replace(
                       lower(text), '\\s+', ' ', 'g'))), 1, 15) AS BIGINT) AS hv
            FROM documents
        ),
        kmin AS (SELECT hv FROM h ORDER BY hv ASC LIMIT {_KMV_K}),
        agg AS (SELECT CAST(max(hv) AS BIGINT) AS hk,
                       CAST(count(*) AS BIGINT) AS n_seen
                FROM kmin)
        SELECT n_seen,
               hk,
               CASE WHEN n_seen < {_KMV_K} THEN CAST(n_seen AS DOUBLE)
                    ELSE ({_KMV_K} - 1) * CAST({_KMV_SPACE} AS DOUBLE) / hk
               END AS est_distinct
        FROM agg
    """,
    doc="§2.4/§2.12 KMV (k-minimum-values) distinct-count sketch, "
    "Bar-Yossef et al. 2002: estimate = (k−1)/h_k over md5-hashed keys. "
    "Unlike HLL (agg_approx_distinct — rows-only, engine-specific "
    "registers), KMV with a DETERMINISTIC hash is engine-exact: the k "
    "smallest 60-bit hashes are a set property of the data, so the "
    "*approximate* estimate itself value-matches any oracle. Distributed "
    "shape: per-partition top-k via TakeOrdered (no global sort), "
    "16-byte shuffle keys; mergeable across shards by unioning k-min "
    "sets — the sketch property that makes it a groupBy-able aggregate "
    "at 100 TB.",
)
def agg_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    hv = (
        F.conv(F.substring(F.md5(dedup.normalize_text("text")), 1, 15), 16, 10)
        .cast("long")
        .alias("hv")
    )
    kmin = d.select(hv).distinct().orderBy(F.col("hv").asc()).limit(_KMV_K)
    agg = kmin.agg(
        F.max("hv").alias("hk"), F.count(F.lit(1)).alias("n_seen")
    )
    est = F.when(
        F.col("n_seen") < _KMV_K, F.col("n_seen").cast("double")
    ).otherwise(F.lit(float(_KMV_K - 1)) * F.lit(float(_KMV_SPACE)) / F.col("hk"))
    return agg.select("n_seen", "hk", est.alias("est_distinct"))


# ------------------------------------------------------------- funnel stages


@register(
    "events_funnel_stages",
    oracle="""
        WITH v AS (
            SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t_view
            FROM events WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t_click
            FROM events e JOIN v ON v.user_id = e.user_id
            WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.t_view
            GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t_purchase
            FROM events e JOIN c ON c.user_id = e.user_id
            WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.t_click
            GROUP BY e.user_id
        )
        SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
        FROM v LEFT JOIN c ON c.user_id = v.user_id
               LEFT JOIN p ON p.user_id = v.user_id
    """,
    doc="§2.12 sequential funnel (MATCH_RECOGNIZE-lite): per user, first "
    "'view', first 'click' strictly after it, first 'purchase' strictly "
    "after that — the ordered-progression semantics CEP engines sell, "
    "expressed as three conditional min-aggregates chained by joins. "
    "Every stage is a partial-agg'd groupBy(user_id) on the SAME shuffle "
    "key, so AQE reuses the partitioning; no window over a user's whole "
    "history, no row-by-row state.",
)
def events_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return v.join(c, "user_id", "left").join(p, "user_id", "left").select(
        "user_id", "t_view", "t_click", "t_purchase"
    )


# ----------------------------------------------------- end-to-end pipeline


@register(
    "pipeline_curation_end2end",
    oracle=f"""
        WITH gated AS (
            SELECT doc_id, {_NORM} AS norm,
                   CAST(len({_TOKS}) AS BIGINT) AS n_words,
                   CAST(len(list_filter({_TOKS},
                        t -> list_contains({_GOPHER_STOP_SQL_E2E}, t)))
                        AS BIGINT) AS n_stop
            FROM documents
        ),
        passed AS (
            SELECT doc_id, norm, n_words FROM gated
            WHERE n_words >= 50 AND n_words <= 100000 AND n_stop >= 2
        ),
        deduped AS (
            SELECT min(doc_id) AS doc_id, max(n_words) AS n_words,
                   count(*) AS n_copies
            FROM passed GROUP BY md5(norm)
        )
        SELECT doc_id, n_words, n_copies,
               CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                         AS BIGINT) % 100 < 1 THEN 'test'
                    WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                         AS BIGINT) % 100 < 2 THEN 'val'
                    ELSE 'train' END AS split
        FROM deduped
    """,
    doc="§2.12 capstone: the standard curation pipeline — quality gate "
    "(Gopher word-count + stopword rules) → exact dedup (min-id "
    "representative) → leakage-stable train/val/test split — composed as "
    "ONE DataFrame lineage, so Catalyst fuses the gate into the scan "
    "(predicate pushdown), the dedup is the only shuffle, and the split "
    "is a map over its output. The operators compose without "
    "materialization barriers — the property that makes the library a "
    "pipeline engine rather than a bag of jobs.",
)
def pipeline_curation_end2end(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    m = text.gopher_metrics("text")
    gated = d.select(
        "doc_id",
        dedup.normalize_text("text").alias("norm"),
        m["n_words"].alias("n_words"),
        m["n_stopword_hits"].alias("n_stop"),
    ).filter(
        (F.col("n_words") >= 50) & (F.col("n_words") <= 100_000)
        & (F.col("n_stop") >= 2)
    )
    deduped = gated.groupBy(F.md5("norm")).agg(
        F.min("doc_id").alias("doc_id"),
        F.max("n_words").alias("n_words"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    return sampling.train_val_test_split(deduped, "doc_id").select(
        "doc_id", "n_words", "n_copies", "split"
    )


@register(
    "agg_kmv_by_source",
    oracle=f"""
        WITH h AS (
            SELECT DISTINCT source,
                   CAST('0x' || substr(md5(trim(regexp_replace(
                       lower(text), '\\s+', ' ', 'g'))), 1, 15) AS BIGINT) AS hv
            FROM documents
        ),
        r AS (
            SELECT source, hv,
                   row_number() OVER (PARTITION BY source ORDER BY hv ASC) AS rn
            FROM h
        ),
        kmin AS (SELECT source, hv, rn FROM r WHERE rn <= {_KMV_K})
        SELECT source,
               CAST(max(rn) AS BIGINT) AS n_seen,
               CAST(max(hv) AS BIGINT) AS hk,
               CASE WHEN max(rn) < {_KMV_K} THEN CAST(max(rn) AS DOUBLE)
                    ELSE ({_KMV_K} - 1) * CAST({_KMV_SPACE} AS DOUBLE) / max(hv)
               END AS est_distinct
        FROM kmin GROUP BY source
    """,
    doc="§2.4/§2.12 KMV as a GROUP BY-able aggregate: per-source distinct "
    "estimates from per-stratum k-min sets — the mergeability property "
    "(union + re-top-k) that lets the sketch roll up across shards/"
    "partitions at 100 TB. One stratum-partitioned window (bounded per "
    "stratum), deterministic md5 hashes → the approximate estimates "
    "value-match the oracle exactly.",
)
def agg_kmv_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = read_table(spark, sf_dir, "documents")
    hv = (
        F.conv(F.substring(F.md5(dedup.normalize_text("text")), 1, 15), 16, 10)
        .cast("long")
        .alias("hv")
    )
    h = d.select("source", hv).distinct()
    rn = F.row_number().over(W.partitionBy("source").orderBy(F.col("hv").asc()))
    kmin = h.withColumn("rn", rn).filter(F.col("rn") <= _KMV_K)
    est = F.when(
        F.max("rn") < _KMV_K, F.max("rn").cast("double")
    ).otherwise(
        F.lit(float(_KMV_K - 1)) * F.lit(float(_KMV_SPACE)) / F.max("hv")
    )
    return kmin.groupBy("source").agg(
        F.max("rn").cast("long").alias("n_seen"),
        F.max("hv").alias("hk"),
        est.alias("est_distinct"),
    )


@register(
    "dedup_span_removal",
    oracle=f"""
        WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        wins AS (
            SELECT doc_id, i - 1 AS pos,
                   md5(array_to_string(toks[i:i+{_SPAN_N - 1}], ' ')) AS gh
            FROM base CROSS JOIN
                 unnest(generate_series(1, greatest(len(toks) - {_SPAN_N - 1}, 0)))
                 AS t(i)
        ),
        cross_doc AS (
            SELECT gh FROM wins GROUP BY gh HAVING min(doc_id) <> max(doc_id)
        ),
        dup AS (
            SELECT doc_id, pos FROM wins WHERE gh IN (SELECT gh FROM cross_doc)
        ),
        run AS (
            SELECT doc_id, pos,
                   max(pos + {_SPAN_N - 1}) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS prev_end
            FROM dup
        ),
        isl AS (
            SELECT doc_id, pos,
                   sum(CASE WHEN prev_end IS NULL OR pos > prev_end + 1
                            THEN 1 ELSE 0 END) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS UNBOUNDED PRECEDING
                   ) AS g
            FROM run
        ),
        spans AS (
            SELECT doc_id, min(pos) AS s, max(pos) + {_SPAN_N - 1} AS e
            FROM isl GROUP BY doc_id, g
        ),
        tokpos AS (
            SELECT doc_id, i - 1 AS pos, toks[i] AS tok
            FROM base CROSS JOIN unnest(generate_series(1, len(toks))) AS t(i)
        ),
        kept AS (
            SELECT tp.doc_id,
                   array_to_string(list(tp.tok ORDER BY tp.pos), ' ') AS ct,
                   count(*) AS n_kept
            FROM tokpos tp
            WHERE NOT EXISTS (
                SELECT 1 FROM spans sp
                WHERE sp.doc_id = tp.doc_id AND tp.pos BETWEEN sp.s AND sp.e)
            GROUP BY tp.doc_id
        )
        SELECT b.doc_id,
               coalesce(k.ct, '') AS clean_text,
               CAST(len(b.toks) - coalesce(k.n_kept, 0) AS BIGINT)
                   AS n_tokens_removed
        FROM base b LEFT JOIN kept k USING (doc_id)
    """,
    doc="§2.12 duplicate-span REMOVAL (the second half of Lee et al. "
    "ACL'22): cut every cross-document duplicated token range and "
    "reassemble the remainder in order — the Spark side filters the "
    "materialized token array against the doc's folded span list (1:1 "
    "join, JVM exists lambda); the oracle rebuilds via explode + "
    "anti-exists + ordered list() (operators/dedup.py::"
    "remove_duplicate_spans).",
)
def dedup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return dedup.remove_duplicate_spans(d, "doc_id", "text", n=_SPAN_N).select(
        F.col("id").alias("doc_id"), "clean_text", "n_tokens_removed"
    )


@register(
    "dedup_minhash_verified",
    oracle=f"""
        WITH {_MINHASH_PAIRS_CTES},
        sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
        inter AS (
            SELECT p.id_a, p.id_b, count(*) AS ni
            FROM pairs p
            JOIN sh a ON a.id = p.id_a
            JOIN sh b ON b.id = p.id_b AND b.shingle = a.shingle
            GROUP BY p.id_a, p.id_b
        )
        SELECT id_a, id_b, ni / (sa.n + sb.n - ni) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.id = id_a
        JOIN sizes sb ON sb.id = id_b
        WHERE ni / (sa.n + sb.n - ni) >= 0.2
    """,
    doc="§2.12 LSH-then-verify (the full production near-dup pipeline): "
    "MinHash band candidates → EXACT Jaccard computed on candidates only "
    "→ threshold. Exact all-pairs is quadratic and LSH alone has false "
    "positives; verifying just the bucket-local candidate set costs "
    "O(candidates·shingles) and never touches the corpus "
    "(operators/dedup.py::minhash_verified_pairs).",
)
def dedup_minhash_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return dedup.minhash_verified_pairs(
        d, "doc_id", "text", n=3, num_hashes=6, threshold=0.2
    )


@register(
    "dedup_cc_star_edges",
    oracle=f"""
        WITH RECURSIVE {_MINHASH_PAIRS_CTES},
        star AS (
            SELECT h.hub AS id_a, s.id AS id_b
            FROM sig s JOIN (
                SELECT band, minhash, min(id) AS hub
                FROM sig GROUP BY band, minhash
            ) h ON h.band = s.band AND h.minhash = s.minhash
            WHERE s.id <> h.hub
        ),
        sym AS (
            SELECT id_a AS s, id_b AS d FROM star
            UNION SELECT id_b, id_a FROM star
        ),
        reach AS (
            SELECT s AS id, d AS r FROM sym
            UNION
            SELECT reach.id, sym.d FROM reach JOIN sym ON reach.r = sym.s
        )
        SELECT id, LEAST(id, MIN(r)) AS component FROM reach GROUP BY id
    """,
    doc="§2.12 star-linked LSH clustering at driver level: connected "
    "components over the O(members)-per-bucket star edge set "
    "(minhash_lsh_candidates(link='star')). The oracle builds the SAME "
    "star edges in SQL and closes them with a recursive CTE — its "
    "components must (and do) equal the all-pairs components, proving "
    "the linear-output mode is clustering-equivalent end-to-end, not "
    "just in pytest.",
)
def dedup_cc_star_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_decodable_spark.operators.graph import connected_components

    d = read_table(spark, sf_dir, "documents")
    star = dedup.minhash_lsh_candidates(d, "doc_id", "text", n=3, num_hashes=6, link="star")
    return connected_components(star, "id_a", "id_b")
