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

from pyspark.sql import Column, DataFrame, Window as W, functions as F


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
    """Whitespace tokens of the normalized text. Empty / whitespace-only
    input yields an EMPTY array — a bare ``split('', ' ')`` returns
    ``['']``, which silently counts every blank document as one token
    through every downstream consumer (token counts, OOV rates, chunking).
    Inner empties can't occur (normalize collapses whitespace runs), so the
    filter only changes the blank-document case."""
    return F.filter(F.split(normalize_text(col), " "), lambda x: x != "")


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Token n-gram shingles (distinct) from an ALREADY-MATERIALIZED token
    array column. ``toks`` must be a plain column reference: expressions
    referenced inside a higher-order-function lambda are re-evaluated per
    element (no subexpression elimination inside lambdas), so passing
    ``tokens(text)`` directly here would re-run the regex tokenizer once per
    shingle position — O(tokens²) per document. See :func:`shingles`.
    """
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


def shingles(col: Column | str, n: int = 3) -> Column:
    """Token n-gram shingles as an array of strings (distinct).

    NOTE: as a single expression this re-tokenizes per shingle position
    (see :func:`shingles_from_tokens`); prefer the two-step projection
    (``select(tokens(x).alias("__toks"))`` then ``shingles_from_tokens``)
    in anything performance-sensitive — :func:`_shingle_rows` does this.
    """
    return shingles_from_tokens(tokens(col), n)


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: keep the minimum id per distinct normalized text.

    At 100 TB: groupBy(md5(text)) shuffles 16-byte keys; the min-id
    representative selection is a map-side partial aggregate. A NULL text
    (failed extraction) is NOT the same document as another NULL text —
    groupBy treats NULL keys as equal, which would silently merge every
    NULL-text row into one cluster, so NULL fingerprints fall back to a
    per-row identity and pass through as singletons.
    """
    return (
        fan_out(df)
        .withColumn(
            "__fp",
            F.coalesce(
                F.md5(normalize_text(text_col)),
                F.concat(F.lit("__null#"), F.col(id_col).cast("string")),
            ),
        )
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .drop("__fp")
    )


def _shingle_session_df(df: DataFrame, name: str = "__dedup_shingle_input") -> DataFrame:
    """Rebind ``df`` into a dedicated child SparkSession whose optimizer
    excludes ``InferFiltersFromGenerate``.

    Why: that rule synthesizes ``size(<whole shingle expr>) > 0`` from the
    explode and pushes it below the fan-out exchange — re-running the entire
    shingle computation on the unparallelized scan. The exclusion only saves
    skipping empty arrays, which explode handles anyway. Because DataFrames
    optimize lazily (at action time, long after this function returns),
    set-and-restore around this call would not scope the conf — so the
    exclusion lives in a child session (same SparkContext, cloned conf) that
    ONLY shingle pipelines execute in; the caller's session conf is never
    touched. The handoff goes through a global temp view (the one
    cross-session-visible relation kind)."""
    parent = df.sparkSession
    child = getattr(parent, "_shingle_session", None)
    if child is None:
        child = parent.newSession()
        child.conf.set(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        parent._shingle_session = child
    df.createOrReplaceGlobalTempView(name)
    # spark.table() analyzes EAGERLY, so the returned DataFrame captures the
    # view definition as of now — later re-registrations of the same name
    # don't retroactively change it (callers rely on this for multi-input
    # compositions like decontaminate)
    return child.table(f"global_temp.{name}")


def shingle_strings(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, n_sh, shingle): distinct shingles per doc as strings, with the
    per-doc shingle count riding along. Two-step projection: tokenize once,
    then slide the shingle window over the materialized token array (the
    multi-reference to ``__toks`` stops CollapseProject from inlining the
    tokenizer back into the lambda). Runs in the shingle child session —
    see :func:`_shingle_session_df`."""
    base = fan_out(_shingle_session_df(df)).select(
        F.col(id_col).alias("id"), tokens(text_col).alias("__toks")
    )
    sh_arr = base.select("id", shingles_from_tokens(F.col("__toks"), n).alias("sh_arr"))
    return sh_arr.select(
        "id", F.size("sh_arr").alias("n_sh"), F.explode("sh_arr").alias("shingle")
    )


def _shingle_rows(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, n_sh, sh64): distinct 64-bit-hashed shingles per doc."""
    return shingle_strings(df, id_col, text_col, n).select(
        "id", "n_sh", F.xxhash64("shingle").alias("sh64")
    )


def shingle_pairs_jaccard(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.2,
    method: str = "auto",
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs: (id_a, id_b, jaccard) with
    id_a < id_b and jaccard >= threshold.

    Two exact strategies (identical results, different shuffle economics):

    - ``inverted`` — shingle inverted-index self-join: every co-occurring
      shingle yields a pair row; one exchange feeds both join sides
      (shuffle_hash hint → ReusedExchange). Best at low thresholds, where
      prefix filtering can't prune.
    - ``prefix`` — prefix filtering (PPJoin family): order shingles globally
      rarest-first, index only each doc's first ``|A| - ceil(t*|A|) + 1``
      shingles (any pair with J >= t must collide inside those prefixes),
      length-filter, then exact-verify the candidates. The prefix is
      ``~(1-t)·|A|``, so this wins at high thresholds (t >= 0.5) — the
      realistic near-dup setting at 100 TB, where it shrinks shuffle volume
      by the same factor.

    ``auto`` picks by threshold. Jaccard = |∩| / (|A| + |B| - |∩|) from
    exact integers — the double division is bit-identical across engines.
    """
    if method == "auto":
        method = "prefix" if threshold >= 0.5 else "inverted"
    if method not in ("inverted", "prefix"):
        # a typo would otherwise silently fall through to the prefix path —
        # the strategy the caller may be explicitly avoiding
        raise ValueError(
            f"unknown method {method!r} — use 'inverted' or 'prefix'"
        )
    # materialize the shingle pipeline ONCE: it feeds 2 consumers in
    # inverted mode and 4 in prefix mode (freq, both prefix-join sides, and
    # both verification sides) — the module's materialize-once rule
    sh = _shingle_rows(df, id_col, text_col, n).localCheckpoint(eager=True)
    # integer-exact threshold arithmetic: floating ceil(t·n) overshoots for
    # many (t, n) pairs (0.54·450 = 243.0000…3 → ceil 244), silently
    # shrinking the prefix and dropping qualifying pairs
    t_micro = round(threshold * 1_000_000)

    if method == "inverted":
        a, b = sh.alias("a"), sh.hint("shuffle_hash").alias("b")
        inter = (
            a.join(
                b,
                (F.col("a.sh64") == F.col("b.sh64")) & (F.col("a.id") < F.col("b.id")),
            )
            .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .agg(
                F.count(F.lit(1)).alias("n_inter"),
                F.first("a.n_sh").alias("size_a"),
                F.first("b.n_sh").alias("size_b"),
            )
        )
        jac = inter.withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("size_a") + F.col("size_b") - F.col("n_inter")),
        )
        return jac.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")

    # global rarest-first order: frequency, ties by hash (total, deterministic)
    freq = sh.groupBy("sh64").agg(F.count(F.lit(1)).alias("df_freq"))
    ranked = (
        sh.join(freq, "sh64")
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("id").orderBy(F.col("df_freq"), F.col("sh64"))
            ),
        )
    )
    ceil_tn = F.expr(f"({t_micro}L * n_sh + 999999) div 1000000")
    prefix_len = F.col("n_sh") - ceil_tn + 1
    prefix = ranked.filter(F.col("rn") <= prefix_len).select("id", "n_sh", "sh64")

    a, b = prefix.alias("a"), prefix.hint("shuffle_hash").alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.sh64") == F.col("b.sh64"))
            & (F.col("a.id") < F.col("b.id"))
            # length filter: J >= t requires t·|A| <= |B| and t·|B| <= |A|
            # (integer cross-multiplied — same exactness rule as prefix_len)
            & (F.col("b.n_sh") * t_micro <= F.col("a.n_sh") * 1_000_000)
            & (F.col("a.n_sh") * t_micro <= F.col("b.n_sh") * 1_000_000),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_sh").alias("size_a"),
            F.col("b.n_sh").alias("size_b"),
        )
        .distinct()
    )

    # exact verification of the (small) candidate set
    sa = sh.select(F.col("id").alias("id_a"), F.col("sh64").alias("ha"))
    sb = sh.select(F.col("id").alias("idb2"), F.col("sh64").alias("hb"))
    inter = (
        cand.join(sa, "id_a")
        .join(sb, (F.col("id_b") == F.col("idb2")) & (F.col("ha") == F.col("hb")))
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("n_inter"),
            F.first("size_a").alias("size_a"),
            F.first("size_b").alias("size_b"),
        )
    )
    jac = inter.withColumn(
        "jaccard",
        F.col("n_inter") / (F.col("size_a") + F.col("size_b") - F.col("n_inter")),
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
    sh = shingle_strings(df, id_col, text_col, n).select("id", "shingle")
    return minhash_signatures_from_shingles(sh, num_hashes)


def minhash_signatures_from_shingles(
    sh: DataFrame, num_hashes: int = 6
) -> DataFrame:
    """Signature aggregation over an existing ``(id, shingle)`` relation —
    split out (r13) so pipelines that ALSO need the shingle table
    (:func:`minhash_verified_pairs`) can materialize it once and derive
    both consumers from the same pass instead of re-running the
    tokenize+shingle scan per consumer."""
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
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 6,
    link: str = "pairs",
) -> DataFrame:
    """Candidate near-dup pairs: documents agreeing on any min-hash band.
    Distinct (id_a, id_b) with id_a < id_b.

    ``link`` picks the bucket-emission policy:

    - ``"pairs"`` (default): all pairs within a bucket — O(members²) per
      bucket. Right when the consumer verifies pairwise (exact Jaccard)
      and duplicate multiplicity is a small constant (real corpora).
    - ``"star"``: each member links only to the bucket MINIMUM —
      O(members) per bucket, same CONNECTED COMPONENTS (a bucket's star
      spans it), so CC/keep-best clustering is unchanged. The escape
      hatch for pathological buckets (measured: the 100× scale probe's
      100-way-duplicated corpus inflates all-pairs output 26×; star
      output stays linear). Not for pairwise-verified flows — a star edge
      between two docs that only share the bucket hub is not itself a
      verified near-dup pair.

    Signatures are materialized once before the self-join — Catalyst does
    not reuse the exchange across the two aliased sides here (verified:
    no ReusedExchange in the executed plan), so without the checkpoint the
    shingle→minhash pipeline runs twice."""
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes).localCheckpoint(
        eager=True
    )
    return lsh_pairs_from_signatures(sig, link)


def lsh_pairs_from_signatures(sig: DataFrame, link: str = "pairs") -> DataFrame:
    """Bucket-pair emission over an already-materialized ``(id, band,
    minhash)`` signature table — split out (r13) for the same
    materialize-once reason as :func:`minhash_signatures_from_shingles`.
    ``sig`` must be materialized (checkpoint/table): both aliased join
    sides re-execute its plan otherwise."""
    if link == "star":
        hub = sig.groupBy("band", "minhash").agg(F.min("id").alias("__hub"))
        return (
            sig.join(hub, ["band", "minhash"])
            .filter(F.col("id") != F.col("__hub"))
            .select(F.col("__hub").alias("id_a"), F.col("id").alias("id_b"))
            .distinct()
        )
    if link != "pairs":
        raise ValueError(f"link must be 'pairs' or 'star', got {link!r}")
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

    Token hashes are materialized once into an array column, then ONE fold
    carries all ``bits`` counters as an array accumulator (zip_with against
    a mask array). The earlier form ran one fold per bit — 32 passes over
    the token array and a codegen tree 32× this size; the fused fold is
    ~12× faster at identical output (bit-for-bit, same per-token order)."""
    # token → 32-bit int from md5 prefix (conv hex→dec, JVM-side), computed once
    hashes = F.transform(
        tokens(col), lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
    )
    masks = F.array(*[F.lit(1 << b).cast("long") for b in range(bits)])
    contrib = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(
            acc, masks, lambda a, m: a + F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1)
        ),
    )
    return F.aggregate(
        F.zip_with(
            contrib, masks, lambda c, m: F.when(c > 0, m).otherwise(F.lit(0).cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_shared: int = 3,
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share n-gram
    shingles with an evaluation set (the GPT-3-style overlap removal every
    LLM data pipeline runs before training).

    Returns one row per training doc: ``(id, n_shared, contaminated)`` where
    ``n_shared`` counts DISTINCT shingles also present anywhere in the
    benchmark and ``contaminated = n_shared >= min_shared``. Callers drop the
    flagged rows (kept here so the clean/dirty split is auditable).

    100 TB shape: the benchmark side is an eval suite — thousands of docs,
    not billions — so its distinct-shingle set is broadcast and the training
    corpus is touched by exactly one scan + one shingle explode + one
    groupBy(id). No shuffle ever carries the corpus text, only (id, shingle)
    pairs. If the benchmark outgrows broadcast, the same code path falls
    back to a shuffle join on the shingle key (drop the broadcast hint) —
    the aggregation shape is unchanged.
    """
    bench_sh = (
        shingle_strings(benchmark, id_col, text_col, n)
        .select("shingle")
        .distinct()
    )
    train_sh = shingle_strings(train, id_col, text_col, n)
    shared = (
        train_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_shared"))  # rows are distinct per (id, shingle)
    )
    # the id spine must ALSO live in the shingle child session: joining a
    # parent-session DataFrame in would make the parent analyze the final
    # plan, re-enabling InferFiltersFromGenerate on the shingle explodes
    # (measured: 9s instead of 1s at sf0.1 — the whole shingle pipeline
    # re-ran as a pushed-down filter on the unparallelized scan)
    train_ids = _shingle_session_df(
        train.select(F.col(id_col).alias("id")), name="__decontam_train_ids"
    )
    return (
        train_ids
        .join(shared, "id", "left")
        .select(
            "id",
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            (F.coalesce("n_shared", F.lit(0)) >= min_shared).alias("contaminated"),
        )
    )


def minhash_incremental_candidates(
    corpus: DataFrame,
    new_batch: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 6,
) -> DataFrame:
    """Candidate near-dup pairs TOUCHING a new batch: every (id_a < id_b)
    band-collision pair with at least one member in ``new_batch`` (a subset
    of ``corpus`` by id). The incremental form of
    :func:`minhash_lsh_candidates` — at 100 TB the corpus signatures are a
    *stored* table maintained per ingest, so a daily increment hashes only
    its own documents and joins them against the signature index; nothing
    re-scans the historical text. Here both signature sets derive from one
    pipeline (the signature reuse is the point; the storage is the lake's).
    """
    # materialize the signature index once (the production analogue is a
    # stored lake table) — both join sides read it, and without this the
    # whole shingle→minhash pipeline runs twice
    sig = minhash_signatures(corpus, id_col, text_col, n, num_hashes).localCheckpoint(
        eager=True
    )
    new_ids = new_batch.select(F.col(id_col).alias("id"))
    new_sig = sig.join(F.broadcast(new_ids), "id")
    a, b = sig.alias("a"), new_sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.minhash") == F.col("b.minhash"))
            & (F.col("a.id") != F.col("b.id")),
        )
        .select(
            F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
            F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
        )
        .distinct()
    )


def paragraph_rows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seg_tokens: int | None = None,
) -> DataFrame:
    """Explode documents into ordered sub-document units for segment-level
    dedup: ``(id, seg_idx, segment)``.

    Two segmentation modes:

    - ``seg_tokens=None`` (default): real paragraphs — split on blank lines
      (``\\n\\n+``), the unit used by line/paragraph-dedup pipelines over
      web-crawl corpora (the FineWeb/RefinedWeb shape);
    - ``seg_tokens=k``: fixed k-token windows over the normalized token
      stream — the fallback segmenter for corpora without layout structure.

    Pure JVM expressions; one explode, no Python. At 100 TB this is a map
    stage — the downstream groupBy(segment) is the only shuffle, and it
    moves segments once.
    """
    # child session for the same InferFiltersFromGenerate reason as
    # ngram_window_rows below
    base = fan_out(
        _shingle_session_df(
            df.select(id_col, F.col(text_col).alias("__text")),
            "__dedup_paragraph_input",
        )
    ).select(id_col, F.col("__text"))
    if seg_tokens is None:
        segs = F.split(F.col("__text"), r"\n{2,}")
    else:
        toks = tokens(F.col("__text"))
        base = base.select(id_col, toks.alias("__toks"))
        t = F.col("__toks")
        segs = F.when(
            F.size(t) > 0,
            F.transform(
                F.sequence(
                    F.lit(0), (F.ceil(F.size(t) / seg_tokens) - 1).cast("int")
                ),
                lambda i: F.concat_ws(
                    " ", F.slice(t, i * seg_tokens + 1, seg_tokens)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
    # trim-then-length: paragraph mode's \n{2,} split leaves
    # whitespace-only fragments ('a\n\n \n\nb' → ['a', ' ', 'b']) that a
    # bare length>0 keeps — they then register as cross-document
    # boilerplate and inflate n_segments/n_removed for documents that only
    # lost inter-paragraph whitespace (token mode never produces them)
    return base.select(
        id_col, F.posexplode(segs).alias("seg_idx", "segment")
    ).filter(F.length(F.trim(F.col("segment"))) > 0)


def duplicate_segments(
    seg_rows: DataFrame, id_col: str, min_docs: int = 2
) -> DataFrame:
    """Segments appearing in at least ``min_docs`` DISTINCT documents —
    the cross-document boilerplate set. One shuffle on the segment text
    (at scale: on ``xxhash64(segment)`` — 8-byte keys); count-distinct is
    a partial-aggregated two-phase plan under AQE."""
    return (
        seg_rows.groupBy("segment")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("segment", "n_docs")
    )


def remove_duplicate_segments(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seg_tokens: int | None = None,
    min_docs: int = 2,
) -> DataFrame:
    """Paragraph-level exact dedup (the FineWeb/RefinedWeb boilerplate
    pass): drop every segment that appears in ``>= min_docs`` distinct
    documents from ALL documents, then reassemble each document's
    surviving segments in original order.

    Output: ``(id, clean_text, n_segments, n_removed)`` — one row per input
    document (documents reduced to nothing get ``clean_text = ''``).

    Scale shape: segment explode (map) → one groupBy(segment) for the
    duplicate set → broadcast-able anti join (the duplicate set is tiny
    relative to the corpus) → one groupBy(id) to reassemble. No driver
    materialization, no Python.
    """
    # materialize the segment explode once — three consumers below (the
    # duplicate set, the per-doc totals, and the kept-side anti join)
    segs = paragraph_rows(df, id_col, text_col, seg_tokens).localCheckpoint(
        eager=True
    )
    dups = duplicate_segments(segs, id_col, min_docs)
    totals = segs.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_segments")
    )
    kept = segs.join(F.broadcast(dups.select("segment")), "segment", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_idx", "segment"))),
                lambda s: s["segment"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return (
        df.select(id_col)
        .join(totals, id_col, "left")
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_segments", F.lit(0)).alias("n_segments"),
            (
                F.coalesce("n_segments", F.lit(0))
                - F.coalesce("n_kept", F.lit(0))
            ).alias("n_removed"),
        )
    )


def ngram_window_rows(
    df: DataFrame, id_col: str, text_col: str, n: int = 8
) -> DataFrame:
    """One row per overlapping n-token window: ``(id, pos, gh)`` where
    ``pos`` is the 0-based token offset and ``gh`` the md5 of the window's
    tokens joined by a single space.

    The token array is materialized BEFORE the per-position lambda (see
    :func:`shingles_from_tokens` — expressions inside higher-order-function
    lambdas are re-evaluated per element), so tokenization runs once per
    document, not once per window. Pure JVM; one posexplode map stage.
    """
    # the explode below runs in the shingle child session: on the parent
    # session InferFiltersFromGenerate synthesizes size(<window expr>)>0 and
    # pushes it under the fan-out, re-running tokenize+window-build on the
    # unparallelized scan (the measured 9x regression _shingle_session_df
    # documents)
    base = fan_out(
        _shingle_session_df(
            df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__text")),
            "__dedup_ngramwin_input",
        ),
        "id",
    ).select("id", tokens(F.col("__text")).alias("__toks"))
    t = F.col("__toks")
    wins = F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - n),
            lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return base.select(
        "id", F.posexplode(wins).alias("pos", "gram")
    ).select("id", "pos", F.md5("gram").alias("gh"))


def duplicate_ngram_spans(
    df: DataFrame, id_col: str, text_col: str, n: int = 8
) -> DataFrame:
    """Exact-substring duplicate spans (the suffix-array dedup of Lee et
    al., "Deduplicating Training Data Makes Language Models Better", ACL
    2022, re-expressed as an n-gram inverted index): for every document,
    the maximal token ranges covered by n-token windows that also occur in
    at least one OTHER document.

    Output: ``(id, span_start, span_end, n_windows)`` — token-index spans
    (inclusive), overlapping/adjacent windows merged into maximal islands.

    Scale shape (no suffix array, no quadratic step):

    - window explode is a map stage over 16-byte md5 keys;
    - cross-document grams are found with ``groupBy(gh).agg(min(id),
      max(id))`` and ``min <> max`` — O(1) state per gram, *no
      countDistinct* (two-phase partial agg, 24-byte records on the wire);
    - a shuffle semi join brings dup-marking back to (id, pos) rows;
    - span merge is the classic gaps-and-islands: one window partition per
      document, running ``max(pos + n - 1)`` over preceding rows, new
      island when the current window starts past ``prev_end + 1``. The
      per-document window is bounded by document length — no global sort.

    The window relation feeds both the dup-gram aggregate and the probe
    side, so it is checkpointed ONCE (the materialize-before-self-join
    rule every sibling follows) — which also truncates the child-session
    posexplode lineage before downstream callers join it into a
    parent-session frame, where the parent's re-enabled
    InferFiltersFromGenerate would otherwise push the whole tokenize+
    window build below the fan-out exchange (the measured 9x regression
    the child session exists to prevent).
    """
    wins = ngram_window_rows(df, id_col, text_col, n).localCheckpoint(
        eager=True
    )
    cross_doc = (
        wins.groupBy("gh")
        .agg(F.min("id").alias("__mn"), F.max("id").alias("__mx"))
        .filter(F.col("__mn") != F.col("__mx"))
        .select("gh")
    )
    dup = wins.join(cross_doc, "gh", "left_semi").select("id", "pos")
    w = W.partitionBy("id").orderBy("pos")
    run = dup.withColumn(
        "__prev_end",
        F.max(F.col("pos") + n - 1).over(w.rowsBetween(W.unboundedPreceding, -1)),
    )
    isl = run.withColumn(
        "__new",
        F.when(
            F.col("__prev_end").isNull() | (F.col("pos") > F.col("__prev_end") + 1),
            1,
        ).otherwise(0),
    ).withColumn("__isl", F.sum("__new").over(w.rowsBetween(W.unboundedPreceding, 0)))
    return (
        isl.groupBy("id", "__isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + n - 1).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select("id", "span_start", "span_end", "n_windows")
    )


def remove_duplicate_spans(
    df: DataFrame, id_col: str, text_col: str, n: int = 8
) -> DataFrame:
    """Cut every cross-document duplicated token span out of each document
    and reassemble the remainder: ``(id, clean_text, n_tokens_removed)``.

    ``clean_text`` is in NORMALIZED TOKEN SPACE — the single-space join of
    the surviving ``tokens()`` (lowercased, punctuation-stripped), not the
    original text's casing/layout. Span indices are token positions, so
    the reassembly contract (and its DuckDB oracle) is defined over the
    token array; callers that need the original formatting should map the
    span ranges back onto their own segmentation of the raw text.

    Spans come from :func:`duplicate_ngram_spans`; tokens whose index falls
    inside any span are dropped via a JVM ``exists`` over the document's
    (small) span array — the span list is folded per document first, so the
    join is 1:1, never row-multiplying.
    """
    spans = (
        duplicate_ngram_spans(df, id_col, text_col, n)
        .groupBy("id")
        .agg(
            F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
        )
    )
    base = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("__toks")
    ).join(spans, "id", "left")
    t, s = F.col("__toks"), F.col("__spans")
    covered = lambda i: F.exists(  # noqa: E731
        s, lambda sp: (i >= sp["span_start"]) & (i <= sp["span_end"])
    )
    kept = F.when(s.isNull(), t).otherwise(
        F.filter(t, lambda tok, i: ~covered(i))
    )
    return base.select(
        "id",
        F.concat_ws(" ", kept).alias("clean_text"),
        (F.size(t) - F.size(kept)).cast("long").alias("n_tokens_removed"),
    )


def minhash_verified_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 6,
    threshold: float = 0.2,
) -> DataFrame:
    """The full production near-dup pipeline: MinHash-LSH candidate
    generation followed by EXACT Jaccard verification on the candidates
    only — ``(id_a, id_b, jaccard)`` for verified pairs.

    Why this shape at 100 TB: exact all-pairs Jaccard is quadratic; LSH
    alone has false positives. Verifying just the candidate set costs
    O(candidates · shingles-per-doc) — the candidate set is the tiny
    band-bucket-local output, so the expensive exact step never sees the
    corpus. Every candidate pair shares ≥1 shingle by construction (equal
    band min-hash ⇒ the same min shingle string), so the intersection
    join below loses no candidate.
    """
    # materialize the shingle table ONCE: it feeds FOUR consumers below —
    # the minhash signatures, both sides of the intersection join and the
    # sizes aggregate. r13: the signatures are now derived from this same
    # checkpoint (minhash_signatures_from_shingles) instead of re-running
    # the tokenize+shingle scan a second time inside
    # minhash_lsh_candidates — one full-corpus shingle pass saved per call.
    sh = shingle_strings(df, id_col, text_col, n).localCheckpoint(eager=True)
    sig = minhash_signatures_from_shingles(
        sh.select("id", "shingle"), num_hashes
    ).localCheckpoint(eager=True)
    pairs = lsh_pairs_from_signatures(sig)
    # every sh row already carries the per-doc shingle count (n_sh rides
    # along from shingle_strings) — no second aggregate over the shingles
    sizes = sh.select("id", F.col("n_sh").alias("__n")).distinct()
    a = sh.select(F.col("id").alias("id_a"), F.col("shingle").alias("__sha"))
    b = sh.select(F.col("id").alias("__idb"), F.col("shingle").alias("__shb"))
    inter = (
        pairs.join(a, "id_a")
        .join(
            b,
            (F.col("id_b") == F.col("__idb")) & (F.col("__sha") == F.col("__shb")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__ni"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("__n").alias("__na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("__n").alias("__nb"))
    jac = F.col("__ni") / (F.col("__na") + F.col("__nb") - F.col("__ni"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
