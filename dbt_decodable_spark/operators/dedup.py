"""Deduplication operators for training-data pipelines (SURVEY §2.12).

Four tiers, all shuffle-architected for 100 TB:

- **exact**: hash-groupBy on the dedup key (one shuffle; at scale, pre-hash
  the text to a 128-bit key so the shuffle moves 16 bytes, not documents);
- **n-gram Jaccard**: exact near-dup via a shingle inverted index —
  explode shingles, self-join on shingle, count intersections, filter by
  Jaccard. Quadratic only within a shingle bucket, never globally;
- **MinHash-LSH**: k deterministic min-hashes (md5-keyed) per doc; docs
  sharing any band bucket become candidates, then exact-Jaccard verified.
  Shuffle cost O(k·docs), candidate join is bucket-local — the 100 TB path;
- **SimHash**: 32-bit sign-of-weighted-bits fingerprint; near-dups share
  fingerprint (or differ in few bits). Pure JVM bit arithmetic.

Everything is deterministic (md5-based hashing, no RNG) so results are
reproducible across engines and runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def fan_out(df: DataFrame, *cols: str) -> DataFrame:
    """Spread rows across the cluster before CPU-heavy per-row work.

    Small inputs (one parquet file) arrive as one partition; tokenizing /
    hashing them would then run on a single core. One round-robin/hash
    shuffle up front buys full parallelism for everything downstream. At
    100 TB inputs are already many partitions and this is a cheap no-op-ish
    rebalance on the id key.
    """
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *cols) if cols else df.repartition(n)


def normalize_text(col: Column | str) -> Column:
    """lower + collapse whitespace — the canonical pre-dedup normalization."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens(col: Column | str) -> Column:
    return F.split(normalize_text(col), " ")


def shingles(col: Column | str, n: int = 3) -> Column:
    """Token n-gram shingles as an array of strings (distinct)."""
    toks = tokens(col)
    # slide a window of n over the token array: JVM-side transform, no UDF
    return F.array_distinct(
        F.filter(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
                lambda i: F.when(
                    F.size(toks) >= n,
                    F.concat_ws(" ", F.slice(toks, i + 1, n)),
                ),
            ),
            lambda x: x.isNotNull(),
        )
    )


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: keep the minimum id per distinct normalized text.

    At 100 TB: groupBy(md5(text)) shuffles 16-byte keys; the min-id
    representative selection is a map-side partial aggregate.
    """
    return (
        fan_out(df)
        .withColumn("__fp", F.md5(normalize_text(text_col)))
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .drop("__fp")
    )


def shingle_pairs_jaccard(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.2
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs via a shingle inverted index.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.
    Jaccard = |∩| / (|A| + |B| - |∩|) — computed from exact integers, so the
    double division is bit-identical across engines.
    """
    # join on a 64-bit shingle hash, not the string: the shuffle moves 8
    # bytes per shingle and the join compares longs (collision odds across
    # distinct shingles are ~n²/2^65 — irrelevant to the result)
    sh = fan_out(df).select(
        F.col(id_col).alias("id"), F.explode(shingles(text_col, n)).alias("shingle")
    ).select("id", F.xxhash64("shingle").alias("sh64"))
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh64") == F.col("b.sh64")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_shingles").alias("size_b"))
    jac = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("size_a") + F.col("size_b") - F.col("n_inter")),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, num_hashes: int = 6
) -> DataFrame:
    """k deterministic min-hashes per document: hash_i(doc) = min over
    shingles of md5(i || shingle). Returns (id, band, minhash).

    Single pass: shingles are computed once and each shingle row emits its
    ``num_hashes`` (band, hash) pairs via one inline explode — k× cheaper
    than unioning per-band scans, and the min() is a map-side partial
    aggregate before the one shuffle on (id, band).
    """
    sh = fan_out(df).select(
        F.col(id_col).alias("id"), F.explode(shingles(text_col, n)).alias("shingle")
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.md5(F.concat(F.lit(str(i) + "#"), F.col("shingle"))).alias("h"),
            )
            for i in range(num_hashes)
        ]
    )
    return (
        sh.select("id", F.explode(bands).alias("bh"))
        .groupBy("id", F.col("bh.band").alias("band"))
        .agg(F.min("bh.h").alias("minhash"))
    )


def minhash_lsh_candidates(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, num_hashes: int = 6
) -> DataFrame:
    """Candidate near-dup pairs: documents agreeing on any min-hash band.
    Distinct (id_a, id_b) with id_a < id_b."""
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes)
    a, b = sig.alias("a"), sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.minhash") == F.col("b.minhash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def simhash(col: Column | str, bits: int = 32) -> Column:
    """SimHash fingerprint: per token take md5 bits, sum ±1 per bit position,
    keep the sign bit. Pure JVM expressions (conv + bit ops).

    Token hashes are materialized once into an array column, then each bit
    aggregates over the longs — one md5 per token rather than one per
    (token × bit)."""
    # token → 32-bit int from md5 prefix (conv hex→dec, JVM-side), computed once
    hashes = F.transform(
        tokens(col), lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
    )
    out = F.lit(0).cast("long")
    for b in range(bits):
        mask = 1 << b
        contrib = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(F.lit(mask)) != 0, 1).otherwise(-1),
        )
        out = out + F.when(contrib > 0, F.lit(mask)).otherwise(0).cast("long")
    return out
