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

    q_ids = np.array([int(i) for i, _ in queries_local], dtype="int64")
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
                    "query_id": np.repeat(q_ids[None, :], n_c, axis=0).ravel(),
                    "neighbor_id": np.repeat(c_ids, n_q),
                    "cos_sim": sims.ravel(),
                }
            )

    n_par = corpus.sparkSession.sparkContext.defaultParallelism
    return (
        corpus.select(id_col, vec_col)
        .repartition(n_par)  # single-file inputs arrive as 1 partition
        .mapInPandas(score, schema="query_id long, neighbor_id long, cos_sim double")
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
        F.col("query_id") != F.col("neighbor_id")
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


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


def lsh_bucket(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Sign-bit sketch: n_planes-bit integer bucket id."""
    out = F.lit(0).cast("long")
    dvec = _to_double_array(vec)
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(dim, seed=p + 1)])
        proj = F.aggregate(
            F.zip_with(dvec, plane, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        out = out + F.when(proj > 0, F.lit(1 << p)).otherwise(0).cast("long")
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
) -> DataFrame:
    """ANN top-k: bucket-join on the hyperplane sketch, exact re-rank inside
    the bucket. At 100 TB the corpus is pre-bucketed and bucket-partitioned,
    so a query touches ~corpus/2^n_planes vectors."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        lsh_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        lsh_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", cosine(F.col("q_vec"), F.col("c_vec")))
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
    (centroid_id, centroid_vec) — broadcast; one pass over the corpus."""
    scored = corpus.join(F.broadcast(centroids)).withColumn(
        "sim", cosine(F.col(vec_col), F.col("centroid_vec"))
    )
    w = W.partitionBy(id_col).orderBy(F.col("sim").desc(), F.col("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, vec_col, "centroid_id")
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
    sampled quantizer keeps the whole index reproducible bit-for-bit."""
    return (
        corpus.filter(F.pmod(F.col(id_col), F.lit(stride)) == 0)
        .orderBy(id_col)
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
    scored = cand.withColumn("cos_sim", cosine(F.col("q_vec"), F.col(vec_col)))
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", F.col(id_col).alias("neighbor_id"), "rank", "cos_sim"
        )
    )
