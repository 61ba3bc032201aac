"""Similarity search over embedding columns (SURVEY §2.12).

- **Brute-force cosine top-k** — the exact baseline: query-set × corpus join,
  dot product via ``F.zip_with`` + ``F.aggregate`` (JVM higher-order
  functions, no Python), ranked with a window. Corpus side stays distributed;
  the query side is broadcast.
- **LSH-bucketed (random-hyperplane) ANN** — the 100 TB path: sign-bit
  sketches from deterministic hyperplanes bucket the corpus; candidates are
  bucket-joined then exactly re-ranked. Recall < 1 by construction; the
  deterministic hyperplanes (seeded per-dimension constants, no RNG at
  runtime) make results reproducible.
- **IVF-style partition pruning** — assign each vector to the nearest of k
  deterministic centroids; a query probes only its centroid's partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def _to_double_array(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product — deterministic summation order."""
    return F.aggregate(
        F.zip_with(_to_double_array(a), _to_double_array(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_to_double_array(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def _scoreable(col: Column) -> Column:
    """Zero-norm vectors make cosine 0/0 → NaN (numpy) or NULL (JVM
    divide); either would pollute top-k slots with meaningless neighbors.
    Filter predicate: keep only real scores."""
    return col.isNotNull() & ~F.isnan(col)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def score_pairs_numpy(
    corpus: DataFrame,
    queries_local,  # list[(id, list[float])] — the broadcastable query set
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Cosine scores of every (corpus row × query) pair via Arrow-batched
    numpy matmul — the vectorized scale path (one narrow map over the
    corpus, no shuffle; the query matrix rides inside the closure like a
    broadcast variable).

    Returns a DataFrame (query_id, neighbor_id, cos_sim) with cos_sim in
    float64.
    """
    import numpy as np
    import pandas as pd

    # ids pass through untouched — derive the output id dtype from the
    # corpus schema instead of hard-coding long (string/int ids must yield
    # the same schema the empty-corpus fallback in threshold_join_chunked
    # declares)
    id_type = corpus.schema[id_col].dataType.simpleString()
    if not queries_local:
        # (q_mat*q_mat).sum(axis=1) on an empty array raises AxisError on
        # the DRIVER — an empty query set is an empty result, not a crash
        return corpus.sparkSession.createDataFrame(
            [], f"query_id {id_type}, neighbor_id {id_type}, cos_sim double"
        )
    q_ids = [i for i, _ in queries_local]
    q_mat = np.array([v for _, v in queries_local], dtype="float64")
    q_norm = np.sqrt((q_mat * q_mat).sum(axis=1))

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c_mat = np.array([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
            c_ids = pdf[id_col].to_numpy()
            c_norm = np.sqrt((c_mat * c_mat).sum(axis=1))
            sims = (c_mat @ q_mat.T) / np.outer(c_norm, q_norm)
            n_c, n_q = sims.shape
            yield pd.DataFrame(
                {
                    "query_id": np.tile(np.asarray(q_ids, dtype=object), n_c)
                    if id_type == "string"
                    else np.repeat(
                        np.asarray(q_ids, dtype="int64")[None, :], n_c, axis=0
                    ).ravel(),
                    "neighbor_id": np.repeat(c_ids, n_q),
                    "cos_sim": sims.ravel(),
                }
            )

    n_par = corpus.sparkSession.sparkContext.defaultParallelism
    return (
        corpus.select(id_col, vec_col)
        .repartition(n_par)  # single-file inputs arrive as 1 partition
        .mapInPandas(
            score,
            schema=f"query_id {id_type}, neighbor_id {id_type}, cos_sim double",
        )
    )


def cosine_dedup(
    corpus: DataFrame,
    pairs: DataFrame,
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-dup DEDUP: given near-dup ``pairs``
    (id_a < id_b, already thresholded), suppress every row whose id appears
    as the HIGHER member of a pair — the standard min-id-wins single-pass
    near-dup removal (pairwise suppression, not transitive clustering: a doc
    survives iff no lower-id near-dup exists).

    At 100 TB the pairs come from an LSH-blocked join (:func:`lsh_bucket` →
    bucket-local scoring) rather than all-pairs; this function is agnostic —
    it's one distinct + one left-anti join on the id, both broadcastable
    when the duplicate fraction is small.
    """
    suppressed = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return corpus.select(id_col).join(suppressed, id_col, "left_anti")


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, rank, cos_sim).

    Scoring is numpy-matmul over Arrow batches (10-100× the JVM
    expression path for wide vectors); ranking is a distributed window with
    deterministic tie-break on neighbor id. The query set is collected to
    the driver (it is small by definition — the corpus side never is).
    """
    q_local = [
        (r[0], list(r[1])) for r in queries.select(id_col, vec_col).collect()
    ]
    scored = score_pairs_numpy(corpus, q_local, id_col, vec_col).filter(
        (F.col("query_id") != F.col("neighbor_id"))
        & _scoreable(F.col("cos_sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def threshold_join_chunked(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    chunk_rows: int = 4096,
) -> DataFrame:
    """Exact cosine threshold self-join (id_a < id_b, cos_sim > threshold)
    with BOUNDED driver memory: the query side is swept in id-hash chunks of
    ≤ ``chunk_rows`` vectors — each chunk is collected (O(chunk·dim) driver
    bytes, independent of corpus size), scored against the distributed corpus
    with the Arrow/numpy matmul scorer, and the per-chunk pair streams are
    unioned. Replaces the previous full-corpus ``.collect()`` (OOM at scale).

    Work is inherently O(n²/p) for the *exact* semantic — at 100 TB you run
    the sublinear :func:`lsh_topk`/:func:`lsh_bucket` blocking instead and
    accept recall < 1; this operator is the exact oracle-matched form.

    Chunks are formed by ``xxhash64(id) % n_chunks`` (not ``id %
    n_chunks``): the hash spreads sparse or clustered id spaces uniformly,
    so the ≤ ``chunk_rows``-per-chunk driver-memory bound holds in
    expectation for ANY id distribution, not just dense sequential ids.
    """
    n = corpus.count()
    n_chunks = max(1, -(-n // chunk_rows))
    parts = []
    for i in range(n_chunks):
        chunk = corpus.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_chunks)) == i)
        q_local = [(r[0], list(r[1])) for r in chunk.select(id_col, vec_col).collect()]
        if not q_local:
            continue
        parts.append(
            score_pairs_numpy(corpus, q_local, id_col, vec_col).filter(
                (F.col("neighbor_id") < F.col("query_id"))
                & (F.col("cos_sim") > threshold)
                # zero-norm vectors score NaN, and Spark's NaN compares
                # GREATER than any threshold — without this filter one
                # degenerate embedding pairs with the whole corpus
                & _scoreable(F.col("cos_sim"))
            )
        )
    if not parts:  # empty corpus: contract schema with the REAL id dtype
        id_type = corpus.schema[id_col].dataType.simpleString()
        return corpus.sparkSession.createDataFrame(
            [], f"query_id {id_type}, neighbor_id {id_type}, cos_sim double"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def quantize_int8(
    vec: Column,
    scale: Column | None = None,
) -> tuple[Column, Column]:
    """Symmetric per-vector int8 quantization: ``scale = max|v| / 127``,
    ``q_i = clamp(floor(v_i/scale + 0.5), -127, 127)``. Returns
    ``(scale, qvec)`` columns. 4× smaller embedding storage — at 100 TB the
    difference between an index that fits the cluster and one that doesn't;
    brute-force/LSH re-ranking works directly on dequantized values.

    ``floor(x + 0.5)`` instead of ``round`` because round-half behavior
    differs across engines while ``floor`` is exact IEEE everywhere — the
    whole op is oracle-checkable bit-for-bit.

    PERF: expressions referenced inside a higher-order-function lambda are
    re-evaluated PER ELEMENT (no subexpression elimination — the shingle
    pitfall, dedup.shingles_from_tokens). The default inline scale is an
    O(dim) expression, making the transform O(dim²)/row; materialize the
    scale in a prior projection and pass it as ``scale`` (a plain column
    reference) for the O(dim) path — measured 2× on the registered query.
    """
    dvec = _to_double_array(vec)
    if scale is None:
        scale = F.array_max(F.transform(dvec, F.abs)) / F.lit(127.0)
    q = F.transform(
        dvec,
        lambda x: F.when(scale == 0, F.lit(0))
        .otherwise(
            F.greatest(
                F.lit(-127),
                F.least(F.lit(127), F.floor(x / scale + F.lit(0.5)).cast("int")),
            )
        )
        .cast("int"),
    )
    return scale, q


def dequantize_int8(qvec: Column, scale: Column) -> Column:
    """Inverse of :func:`quantize_int8` (lossy: |err| ≤ scale/2 per dim)."""
    return F.transform(qvec, lambda q: q.cast("double") * scale)


# --- deterministic random-hyperplane LSH -----------------------------------


def _hyperplane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from a seeded LCG
    (no numpy at runtime on executors; constants are computed driver-side)."""
    vals: list[float] = []
    state = (seed * 6364136223846793005 + 1442695040888963407) & (2**64 - 1)
    for _ in range(dim):
        state = (state * 6364136223846793005 + 1442695040888963407) & (2**64 - 1)
        # map to [-1, 1)
        vals.append((state >> 11) / float(2**53) * 2.0 - 1.0)
    return vals


def lsh_bucket(vec: Column, dim: int, n_planes: int = 8, band: int = 0) -> Column:
    """Sign-bit sketch: n_planes-bit integer bucket id. ``band`` selects an
    independent plane family (seed offset) for banded/OR-amplified LSH."""
    out = F.lit(0).cast("long")
    dvec = _to_double_array(vec)
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(dim, seed=band * n_planes + p + 1)])
        proj = F.aggregate(
            F.zip_with(dvec, plane, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        out = out + F.when(proj > 0, F.lit(1 << p)).otherwise(0).cast("long")
    return out


def lsh_buckets(vec: Column, dim: int, n_planes: int, n_bands: int) -> Column:
    """Array of ``n_bands`` independent sketch buckets (banded LSH): a pair
    is a candidate if ANY band matches — the OR-construction that dials
    recall up at the cost of more candidates (recall = 1-(1-p^b)^L)."""
    return F.array(*[lsh_bucket(vec, dim, n_planes, band=b) for b in range(n_bands)])


def lsh_sketch(
    df: DataFrame,
    dim: int,
    n_planes: int,
    n_bands: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Banded sign-sketch as ONE narrow Arrow/numpy map: (id, vec) →
    (id, vec, band, bucket) × n_bands. The plane matrix (n_bands·n_planes ×
    dim, same deterministic :func:`_hyperplane` constants as the JVM
    expression form) rides in the closure; per batch the whole sketch is a
    single matmul + sign + bit-pack. Constants-identical, but SUMMATION
    ORDER is not: BLAS's blocked accumulation can round a projection
    within one ulp of zero to the opposite sign of the JVM fold's
    sequential sum — a bucket bit may differ from the expression form on
    such knife-edge vectors, so don't pin a bit-exact equality between
    the two forms (recall comparisons are the right assertion). Inlining
    n_bands·n_planes 64-literal arrays into the plan (the expression
    form) is codegen-bound at ~24
    planes — the matmul form is O(batch) with a constant-size plan, and at
    100 TB it's the same one-scan, zero-shuffle shape."""
    import numpy as np
    import pandas as pd

    planes = np.array(
        [
            _hyperplane(dim, seed=b * n_planes + p + 1)
            for b in range(n_bands)
            for p in range(n_planes)
        ],
        dtype="float64",
    )  # (n_bands*n_planes, dim)
    weights = (1 << np.arange(n_planes, dtype="int64"))
    vec_type = dict(df.dtypes)[vec_col]

    def sketch(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.array([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
            proj = (m @ planes.T) > 0  # (n, n_bands*n_planes)
            buckets = (
                proj.reshape(len(pdf), n_bands, n_planes) * weights
            ).sum(axis=2)  # (n, n_bands)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), n_bands),
                    vec_col: np.repeat(pdf[vec_col].to_numpy(), n_bands),
                    "band": np.tile(np.arange(n_bands, dtype="int32"), len(pdf)),
                    "bucket": buckets.ravel(),
                }
            )

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, vec_col).mapInPandas(
        sketch,
        schema=f"{id_col} {id_type}, {vec_col} {vec_type}, band int, bucket long",
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    n_bands: int = 1,
) -> DataFrame:
    """ANN top-k: candidates from a bucket-join on banded hyperplane
    sketches (a pair qualifies if ANY of the ``n_bands`` independent
    ``n_planes``-bit sketches collides), then exact cosine re-rank.

    The (n_planes, n_bands) pair is the recall/cost dial: recall ≈
    1-(1-p^b)^L for per-plane agreement p, candidate volume ≈
    corpus·L/2^b per query. At 100 TB the corpus sketches are precomputed
    and bucket-partitioned, so a query touches only its candidate lists;
    the (band, bucket) key makes the candidate join a plain broadcast HASH
    join (both sides sketch map-side via :func:`lsh_sketch` — no shuffle),
    and pairs colliding in several bands are de-duped before scoring."""
    c = lsh_sketch(corpus, dim, n_planes, n_bands, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        "band",
        "bucket",
    )
    q = lsh_sketch(queries, dim, n_planes, n_bands, id_col, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        "band",
        "bucket",
    )
    cand = (
        c.join(F.broadcast(q), on=["band", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "q_vec", "c_vec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = (
        cand.withColumn("cos_sim", cosine(F.col("q_vec"), F.col("c_vec")))
        .filter(_scoreable(F.col("cos_sim")))
        .select("query_id", "neighbor_id", "cos_sim")
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (IVF list). ``centroids``:
    (centroid_id, centroid_vec) — bounded at ``n_lists`` rows by contract, so
    it is collected and inlined as literal arrays: the assignment becomes a
    PURE MAP over the corpus (argmax over an inlined sim array), zero
    shuffle. The previous version cross-joined corpus × centroids and ranked
    with a Window partitioned by ``id_col`` — a full shuffle of a 16×
    expanded frame, the exact anti-pattern this engine bans at 100 TB.

    Tie-break: numpy ``argmax`` takes the first max in centroid_id order —
    i.e. the lowest centroid_id among equal sims, matching the oracle's
    ``ORDER BY sim DESC, centroid_id`` window rule. The assignment runs as
    one Arrow/numpy matmul map (constant-size plan; inlining n_lists
    64-literal centroid arrays as JVM expressions was codegen-bound).
    """
    import numpy as np
    import pandas as pd

    cents = centroids.select("centroid_id", "centroid_vec").orderBy("centroid_id").collect()
    # centroid ids are corpus ids — keep them at their own type (an int()
    # coercion crashed string-id corpora)
    cid_dt = dict(centroids.dtypes)["centroid_id"]
    c_ids = (
        np.array([int(r["centroid_id"]) for r in cents], dtype="int64")
        if cid_dt in ("tinyint", "smallint", "int", "bigint")
        else np.array([r["centroid_id"] for r in cents], dtype=object)
    )
    c_mat = np.array([list(r["centroid_vec"]) for r in cents], dtype="float64")
    c_norm = np.sqrt((c_mat * c_mat).sum(axis=1))
    vec_type = dict(corpus.dtypes)[vec_col]

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.array([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
            v_norm = np.sqrt((m * m).sum(axis=1))
            sims = (m @ c_mat.T) / np.outer(v_norm, c_norm)
            # numpy argmax treats NaN as the maximum: one zero-norm
            # CENTROID (NaN column everywhere) would swallow the entire
            # corpus into a single inverted list — NaN scores can never
            # win a list assignment
            sims = np.where(np.isnan(sims), -np.inf, sims)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    vec_col: pdf[vec_col],
                    "centroid_id": c_ids[np.argmax(sims, axis=1)],
                }
            )

    # centroid ids ARE corpus ids (ivf_centroids aliases them), so both
    # id columns take the corpus id dtype — string ids crash an Arrow
    # serialization against a hard-coded long
    id_type = dict(corpus.dtypes)[id_col]
    return corpus.select(id_col, vec_col).mapInPandas(
        assign,
        schema=(
            f"{id_col} {id_type}, {vec_col} {vec_type}, centroid_id {id_type}"
        ),
    )


def ivf_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    stride: int = 97,
) -> DataFrame:
    """Deterministic coarse quantizer: a strided sample of corpus vectors
    (``id % stride == 0``, first ``n_lists`` by id). A Lloyd refinement would
    sharpen the lists but makes centroids float-sum-order dependent; the
    sampled quantizer keeps the whole index reproducible bit-for-bit.
    If the stride predicate matches nothing (small/sparse id spaces), the
    ``n_lists`` smallest ids seed the quantizer instead — still
    deterministic, and assignment would otherwise crash on an empty
    centroid matrix."""
    # integer ids stride arithmetically (the oracle-paired form); any
    # other id type (string ids are supported end-to-end) strides on its
    # 64-bit hash — a plain `id % stride` would throw CAST_INVALID_INPUT
    id_dt = dict(corpus.dtypes)[id_col]
    key = (
        F.col(id_col)
        if id_dt in ("tinyint", "smallint", "int", "bigint")
        else F.xxhash64(F.col(id_col))
    )
    strided = (
        corpus.filter(F.pmod(key, F.lit(stride)) == 0)
        .orderBy(id_col)
        .limit(n_lists)
        .select(
            F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid_vec")
        )
    )
    if strided.head(1):
        return strided
    return (
        corpus.orderBy(id_col)
        .limit(n_lists)
        .select(
            F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid_vec")
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    stride: int = 97,
) -> DataFrame:
    """IVF-Flat ANN top-k: assign the corpus to inverted lists once, probe
    each query's ``n_probe`` nearest lists, exact re-rank inside them.

    At 100 TB: the corpus is written PARTITIONED BY centroid_id (one-time
    shuffle); a query then scans ~n_probe/n_lists of the data — partition
    pruning does the skipping, the broadcast centroid table is KB-sized.
    Fully deterministic (sampled quantizer + tie-broken ranks), so the same
    algorithm is SQL-expressible for the oracle."""
    cent = ivf_centroids(corpus, id_col, vec_col, n_lists, stride)
    lists = ivf_assign(corpus, cent, id_col, vec_col)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    probe_w = W.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("centroid_id")
    )
    probes = (
        q.join(F.broadcast(cent))
        .withColumn("sim", cosine(F.col("q_vec"), F.col("centroid_vec")))
        .withColumn("rn", F.row_number().over(probe_w))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "q_vec", "centroid_id")
    )
    cand = probes.join(lists, "centroid_id").filter(
        F.col("query_id") != F.col(id_col)
    )
    scored = cand.withColumn(
        "cos_sim", cosine(F.col("q_vec"), F.col(vec_col))
    ).filter(_scoreable(F.col("cos_sim")))
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", F.col(id_col).alias("neighbor_id"), "rank", "cos_sim"
        )
    )


def semantic_dedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    stride: int = 97,
    threshold: float = 0.4,
) -> DataFrame:
    """Semantic dedup (the SemDeDup shape, Abbas et al. 2023): cluster the
    embedding space with a coarse quantizer, then suppress any vector whose
    cosine similarity to an EARLIER (lower-id) member of the same cluster
    exceeds ``threshold``. Only within-cluster pairs are ever scored — the
    clustering is what makes semantic dedup sub-quadratic.

    Output: ``(id, cluster)`` for the surviving vectors.

    Scale shape: deterministic sampled centroids (KB-sized, collected and
    inlined — see :func:`ivf_assign`), assignment as one Arrow/numpy map
    with zero shuffle, then ONE hash shuffle on cluster id for the
    within-cluster self-join. Quadratic cost is bounded per cluster: at
    100 TB raise ``n_lists`` so clusters stay ~executor-sized (the paper
    uses 50k clusters for 5B embeddings). Fully deterministic, so the
    whole pipeline — including the clustering — is SQL-expressible.
    """
    import numpy as np
    import pandas as pd

    cent = ivf_centroids(corpus, id_col, vec_col, n_lists, stride)
    lists = ivf_assign(corpus, cent, id_col, vec_col)

    # per-cluster suppression as ONE Arrow batch per cluster: an in-cluster
    # numpy matmul beats the pair-exploded JVM cosine (interpreted
    # higher-order functions over ~|cluster|²/2 pairs) by ~3× at sf0.1; the
    # groupBy shuffle on centroid_id is the same either way. Each cluster
    # must fit one task — the n_lists sizing rule above.
    def cluster_suppress(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        m = np.array(
            [np.asarray(v, dtype="float64") for v in pdf[vec_col]]
        )
        norms = np.sqrt((m * m).sum(axis=1))
        sims = (m @ m.T) / np.outer(norms, norms)
        # row i suppressed iff an EARLIER (lower-id) row is similar
        tri = np.tril(sims > threshold, k=-1)
        keep = ~tri.any(axis=1)
        out = pdf.loc[keep, [id_col, "centroid_id"]]
        return out.rename(columns={"centroid_id": "cluster"})

    id_type = dict(corpus.dtypes)[id_col]
    return lists.groupBy("centroid_id").applyInPandas(
        cluster_suppress, schema=f"{id_col} {id_type}, cluster {id_type}"
    )


def ivf_topk_quantized(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    stride: int = 97,
) -> DataFrame:
    """IVF-Flat ANN over the INT8-QUANTIZED index: the search-time use of
    :func:`quantize_int8`. The corpus inverted lists store (qvec, scale) —
    4× smaller than float32, the difference between an in-memory index and
    a spilled one at 100 TB — and candidate scoring runs on the
    dequantized values (``q_i × scale`` is exact IEEE, so the whole
    pipeline stays oracle-expressible). Queries stay full-precision.

    Same plan shape as :func:`ivf_topk`: broadcast centroid probe, list
    join, per-query top-k window. The dequantized vector is materialized
    as a projection BEFORE the cosine (lambda-CSE rule: the transform
    would otherwise re-run per element inside dot/norm).
    """
    cent = ivf_centroids(corpus, id_col, vec_col, n_lists, stride)
    lists = ivf_assign(corpus, cent, id_col, vec_col)
    scale_expr, _ = quantize_int8(F.col(vec_col))
    staged = lists.select(
        id_col, "centroid_id", F.col(vec_col).alias("__v"),
        scale_expr.alias("__scale"),
    )
    _, qv = quantize_int8(F.col("__v"), scale=F.col("__scale"))
    quantized = staged.select(
        id_col, "centroid_id", qv.alias("qvec"), "__scale"
    )
    # the stored index: (id, centroid_id, qvec int8, scale). Dequantize as
    # a materialized projection for scoring.
    deq = quantized.select(
        id_col, "centroid_id",
        dequantize_int8(F.col("qvec"), F.col("__scale")).alias("__dvec"),
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    probe_w = W.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("centroid_id")
    )
    probes = (
        q.join(F.broadcast(cent))
        .withColumn("sim", cosine(F.col("q_vec"), F.col("centroid_vec")))
        .withColumn("rn", F.row_number().over(probe_w))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "q_vec", "centroid_id")
    )
    cand = probes.join(deq, "centroid_id").filter(
        F.col("query_id") != F.col(id_col)
    )
    scored = cand.withColumn(
        "cos_sim", cosine(F.col("q_vec"), F.col("__dvec"))
    ).filter(_scoreable(F.col("cos_sim")))
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "rank")
    )
