"""Deterministic sampling for training-data pipelines (SURVEY §2.12).

Training-data mixes are built by sampling sources/languages at different
rates ("50% of English web text, 10% of everything else"). Spark's
``df.sample``/``sampleBy`` draw from a seeded RNG whose stream depends on
partitioning — re-running on a repartitioned input changes the sample, and
no external system can reproduce it.

These operators sample by *hashing the row key* instead: keep a row iff
``md5(key)``'s first 6 hex digits, read as a number, fall below
``fraction * 16^6``. Properties:

- **deterministic & partition-independent** — membership depends only on
  the key, so the sample is stable across runs, partitionings, engines,
  and incremental re-processing (a re-ingested document gets the same
  verdict);
- **uniform** — md5 is uniform on the 24-bit prefix; realized rates
  converge to the target at ~1/sqrt(n·f) like any Bernoulli sample;
- **consistent across rates** — the keep-sets are nested (a 10% sample is
  a subset of the 50% sample), which makes down-sampling reruns cheap;
- **JVM-only hot path** — one md5 + substring compare per row, no RNG
  state, trivially whole-stage-codegen'd; the comparison is done on the
  hex *string* (fixed 6 lowercase chars, so lexicographic = numeric) to
  stay portable to any SQL oracle.

Stratified sampling joins a broadcast (stratum → threshold) table: at
100 TB the fact side streams through map-side, no shuffle at all.

The reference (decodableco/dbt-decodable) has no sampling surface; part of
the driver-mandated training-data extension set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_HEX_SPACE = 16**6


def _threshold_hex(fraction: float) -> str:
    """6-lowercase-hex threshold for a [0,1) fraction; >=1 keeps all."""
    if fraction >= 1.0:
        return "g"  # lexicographically above every hex digit → keep all
    if fraction <= 0.0:
        return "000000"
    return format(int(fraction * _HEX_SPACE), "06x")


def _key_hash(key: Column) -> Column:
    # NULL keys hash as the empty string — a deterministic bucket, not a
    # silent drop (md5(NULL) is NULL, NULL < threshold is NULL, filter()
    # discards NULL — so even fraction=1.0 'keep all' lost NULL-key rows)
    return F.substring(F.md5(F.coalesce(key.cast("string"), F.lit(""))), 1, 6)


def deterministic_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Uniform hash-based sample: keep iff md5(key)[:6] < fraction·16^6."""
    return df.filter(_key_hash(F.col(key_col)) < F.lit(_threshold_hex(fraction)))


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum hash sampling: each stratum keeps its configured
    fraction; strata not in ``fractions`` keep ``default_fraction``.

    The (stratum, threshold) table is broadcast — the scan side filters
    map-side with no shuffle."""
    spark = df.sparkSession
    thr = spark.createDataFrame(
        [(s, _threshold_hex(f)) for s, f in sorted(fractions.items())],
        f"{stratum_col} string, __thr string",
    )
    return (
        df.join(F.broadcast(thr), stratum_col, "left")
        .withColumn(
            "__thr", F.coalesce(F.col("__thr"), F.lit(_threshold_hex(default_fraction)))
        )
        .filter(_key_hash(F.col(key_col)) < F.col("__thr"))
        .drop("__thr")
    )


def sql_stratified_filter(
    stratum_col: str, key_col: str, fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> str:
    """The equivalent DuckDB WHERE fragment (for oracle pairing)."""
    whens = " ".join(
        # escape embedded quotes — a free-text stratum label with an
        # apostrophe would otherwise break (or alter) the generated SQL
        f"WHEN '{s.replace(chr(39), chr(39) * 2)}' THEN '{_threshold_hex(f)}'"
        for s, f in sorted(fractions.items())
    )
    case = f"CASE {stratum_col} {whens} ELSE '{_threshold_hex(default_fraction)}' END"
    return (
        f"substr(md5(coalesce(CAST({key_col} AS VARCHAR), '')), 1, 6) < {case}"
    )


def train_val_test_split(
    df: DataFrame, key_col: str, val_pct: int = 1, test_pct: int = 1
) -> DataFrame:
    """Deterministic train/val/test assignment: bucket = 60 md5 bits of the
    key mod 100; ``test`` takes buckets [0, test_pct), ``val`` the next
    ``val_pct``, ``train`` the rest. Same hash-membership properties as
    :func:`deterministic_sample` — partition-independent, reproducible in
    any engine (DuckDB: ``CAST('0x' || substr(md5(k), 1, 15) AS BIGINT) %
    100``), and a document never migrates between splits as the corpus
    grows (no leakage of val/test into train across re-runs).

    Map-only: one md5 + mod per row, no shuffle, codegen'd.
    """
    bucket = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(bucket < test_pct, F.lit("test"))
        .when(bucket < test_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn("split", split)


def reservoir_per_stratum(
    df: DataFrame, stratum_col: str, key_col: str, n: int, salt: str = "rsv"
) -> DataFrame:
    """Deterministic fixed-size sample of ``n`` rows per stratum: rank rows
    by ``md5(salt || key)`` within the stratum and keep the ``n`` smallest.

    The hash order is a uniform random permutation of each stratum, so this
    is a reservoir sample with the reservoir property made *stable*:
    membership depends only on (key, salt, the stratum's other members'
    hashes), never on arrival order or partitioning — and unlike a true
    streaming reservoir, re-running on the same corpus reproduces the
    sample exactly in any engine.

    Scale shape: one hash per row map-side, then a per-stratum top-n.
    Spark plans the rank filter as a ``WindowGroupLimit`` push-down
    (partial top-n inside each map task before the stratum shuffle), so
    the shuffle carries ~n rows per (stratum, input-partition), not the
    stratum's full population. Output: input columns + ``rk`` (1-based
    hash rank within the stratum).
    """
    h = F.md5(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= n)
    )


def importance_sample(
    df: DataFrame, key_col: str, weight_col: str, scale: int
) -> DataFrame:
    """Weight-proportional deterministic sampling: keep a row with
    probability ``min(1, weight/scale)`` — the quality-weighted corpus
    thinning step ("keep high-scoring docs more often") — decided by the
    same md5 hash gate as :func:`deterministic_sample`, so membership is
    reproducible and partition-independent.

    The comparison is exactly cross-multiplied (``h·scale <
    16^6·min(w, scale)``) in DECIMAL rather than a float division, so any
    engine computes the identical keep-set. DECIMAL, not BIGINT: a
    ``cast('long')`` of the weight silently truncated fractional weights
    (0.9 → 0: the whole sub-unit population dropped instead of kept at
    90%), and ``h·scale`` overflowed 64 bits for scale ≥ ~2^39 — decimal
    keeps up to 9 fractional weight digits exactly and never wraps. Rows
    with ``weight >= scale`` always survive; ``weight <= 0`` (or NULL)
    never does. Map-only, one hash + two multiplies per row, codegen'd."""
    if not 0 < scale <= 10**14:
        raise ValueError(
            f"scale must be in (0, 10^14], got {scale} — the decimal "
            "cross-multiply is sized for 14 integer digits"
        )
    # h ≤ 16^6-1 fits decimal(8,0); h·scale ≤ decimal(23,0); 16^6·w ≤
    # decimal(33,9) — every product stays inside decimal(38) exactly
    h = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 6), 16, 10)
        .cast("decimal(8,0)")
    )
    sc = F.lit(int(scale)).cast("decimal(14,0)")
    w = F.least(F.col(weight_col).cast("decimal(24,9)"), sc.cast("decimal(24,9)"))
    return df.filter(h * sc < F.lit(_HEX_SPACE).cast("decimal(8,0)") * w)
