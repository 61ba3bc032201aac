"""Text analysis operators for training-data pipelines (SURVEY §2.12):
language ID (stopword heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), document fingerprinting. All deterministic JVM
expressions — formulas are reproducible in plain SQL for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from dbt_decodable_spark.operators.dedup import fan_out, normalize_text, tokens

# tiny, deterministic per-language marker lists (n-gram heuristic stand-in;
# a real deployment swaps in fastText — the Spark plumbing is identical)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "que", "es"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "de", "et", "est"),
}

# BPE-ish token regex: word pieces, numbers, or single non-space symbols
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def whitespace_token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("long")


def bpe_token_count(col: Column | str) -> Column:
    """Count BPE-ish tokens via regexp_count — a fair proxy for tokenizer
    load without shipping a tokenizer model to executors."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_TOKEN_RE)).cast("long")


def lang_score(col: Column | str, lang: str) -> Column:
    """Total marker-word occurrences for a language (token-exact matches)."""
    toks = tokens(col)
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))


def lang_id_from_tokens(toks: Column) -> Column:
    """argmax over language marker scores; ties break in LANG_MARKERS order.

    ``toks`` must be a materialized token-array column (plain attribute
    reference) — see :func:`dbt_decodable_spark.operators.dedup.shingles_from_tokens`
    for why expressions must not be re-tokenized per language.

    Linear expression shape: one (score, priority) struct per language packed
    into an ``array_max`` argmax. A running ``when``-chain would embed the
    prior best-score expression twice per step — 2^n copies of the tokenizer
    by the last language.
    """
    langs = list(LANG_MARKERS)
    n = len(langs)
    # sentinel: beats every all-zero score (langs are doubled, so any hit
    # scores >= 2 > 1), loses to any real hit; priority 0 → "und"
    entries = [F.struct(F.lit(1).alias("s"), F.lit(0).alias("i"))]

    def _score(markers: Column) -> Column:
        # single-param lambda: F.filter maps each python parameter to a
        # lambda variable, so markers must come in via closure, not a param
        return F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))

    for i, lang in enumerate(langs):
        score = _score(F.array(*[F.lit(m) for m in LANG_MARKERS[lang]]))
        # priority n-i: on score ties the EARLIER language wins (struct
        # comparison is lexicographic: score first, then priority)
        entries.append(F.struct((score * 2).alias("s"), F.lit(n - i).alias("i")))
    lookup = ["und"] + [langs[n - p] for p in range(1, n + 1)]
    best_i = F.array_max(F.array(*entries))["i"]
    return F.element_at(F.array(*[F.lit(x) for x in lookup]), best_i + 1)


def lang_id(col: Column | str) -> Column:
    """argmax over language marker scores; ties break in LANG_MARKERS order."""
    return lang_id_from_tokens(tokens(col))


def quality_metrics(col: Column | str) -> dict[str, Column]:
    """Deterministic quality signals: length, mean word length, stopword
    ratio, punctuation ratio, uppercase ratio."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(col)
    n_tok = F.size(toks)
    n_chars = F.length(c).cast("long")
    stop = F.array(*[F.lit(m) for lst in LANG_MARKERS.values() for m in lst])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    n_punct = F.regexp_count(c, F.lit(r"[^\w\s]")).cast("long")
    n_upper = F.regexp_count(c, F.lit(r"[A-Z]")).cast("long")
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok.cast("long"),
        "mean_word_len": (F.length(normalize_text(c)) - (n_tok - 1)) / n_tok,
        "stopword_ratio": n_stop / n_tok,
        "punct_ratio": n_punct / n_chars,
        "upper_ratio": n_upper / n_chars,
    }


def quality_score(col: Column | str) -> Column:
    """Single [0,1] quality score from the metric mix (weights are arbitrary
    but fixed; deterministic double arithmetic)."""
    m = quality_metrics(col)
    length_term = F.least(m["n_tokens"] / F.lit(100.0), F.lit(1.0))
    stop_term = F.least(m["stopword_ratio"] * 5.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(1.0) - m["punct_ratio"] * 10.0, F.lit(0.0))
    return (length_term * 0.4 + stop_term * 0.3 + punct_pen * 0.3).alias("quality")


def fingerprint(col: Column | str) -> Column:
    """Canonical document fingerprint: md5 over the sorted distinct token
    set — robust to token order (the classic near-dup canary)."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(col)))))


def rolling_hashes(toks: Column, window: int = 4) -> Column:
    """Array of md5 hashes over sliding windows of a MATERIALIZED token
    array column. The caller must project ``tokens(text)`` into a real
    column first — passing the tokenizer expression directly would
    re-evaluate the regex split once per gram position inside the lambda
    (no CSE in higher-order functions; the O(tokens²)/doc hazard this
    module documents on shingles_from_tokens)."""
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - window, F.lit(0))),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, window))),
    )


# ------------------------------------------------------------ repetition
# Gopher/MassiveText-style repetition signals (Rae et al. 2021, table A1):
# heavily repetitive documents are low-quality training data. Adapted to
# token/bigram fractions (the driver's texts are single-line).

def repetition_metrics(df, id_col: str, text_col: str):
    """Per-document repetition signals as a DataFrame:
    ``(id, n_tokens, dup_token_frac, top_bigram_frac)``.

    - ``dup_token_frac``: 1 − distinct/total tokens — high when a few words
      repeat (pure array arithmetic, no shuffle);
    - ``top_bigram_frac``: occurrences of the most frequent bigram / total
      bigrams — the "top n-gram fraction" rule. Counted via explode +
      two-level aggregate; the shuffle carries (id, bigram) pairs, never
      document text, and both aggregates partition by id so the second
      reuses the first's exchange.

    Fractions are exact-int divisions evaluated once per doc — the same
    IEEE double in any engine.

    Runs in the generate-isolated child session (see
    ``dedup._shingle_session_df``): without it, InferFiltersFromGenerate
    pushes ``size(<ngram expr>) > 0`` below the fan-out exchange and the
    whole tokenize+ngram pipeline re-runs on the unparallelized scan.
    """
    from dbt_decodable_spark.operators.dedup import _shingle_session_df

    toks = tokens(text_col)
    base = fan_out(_shingle_session_df(df, name="__repetition_input")).select(
        F.col(id_col).alias("id"), toks.alias("__toks")
    )
    per_doc = base.select(
        "id",
        F.size("__toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("__toks")).cast("long").alias("__n_distinct"),
        ngrams_from_tokens(F.col("__toks"), 2).alias("__grams"),
    )
    gram_rows = per_doc.select("id", F.explode("__grams").alias("gram"))
    top = (
        gram_rows.groupBy("id", "gram")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy("id")
        .agg(F.max("__c").alias("__top"), F.sum("__c").alias("__total"))
    )
    return (
        per_doc.join(top, "id", "left")
        .select(
            "id",
            "n_tokens",
            (F.lit(1.0) - F.col("__n_distinct").cast("double") / F.col("n_tokens"))
            .alias("dup_token_frac"),
            F.coalesce(
                F.col("__top").cast("double") / F.col("__total"), F.lit(0.0)
            ).alias("top_bigram_frac"),
        )
    )


def ngrams_from_tokens(toks, n: int = 2):
    """Token n-grams WITH multiplicity (unlike
    :func:`dbt_decodable_spark.operators.dedup.shingles_from_tokens`, which
    dedups) — repetition counting needs every occurrence. ``toks`` must be a
    materialized column reference (lambda re-evaluation hazard, see dedup)."""
    return F.filter(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.when(
                F.size(toks) >= n, F.concat_ws(" ", F.slice(toks, i + 1, n))
            ),
        ),
        lambda x: x.isNotNull(),
    )


# ----------------------------------------------------------------- PII
# Deterministic regex scrubbing (emails, North-American phone shapes, IPv4).
# Patterns are RE2-safe (no backrefs/lookaround) so the same pattern text
# runs on Spark (Java regex) and any RE2-based oracle engine.

PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact_pii(col: Column | str) -> Column:
    """Replace every PII match with its tag, in PII_PATTERNS order (order
    matters: emails are consumed before the bare-number patterns can bite
    their digits). Chained JVM regexp_replace — no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, tag in PII_PATTERNS:
        c = F.regexp_replace(c, pat, tag)
    return c


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-kind match counts (audit trail for the redaction)."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        f"n_{name}": F.regexp_count(c, F.lit(pat)).cast("long")
        for name, pat, _ in PII_PATTERNS
    }


# ------------------------------------------------------------- chunking
# Context-window chunking: documents → fixed-size token windows with
# overlap, the step that turns a cleaned corpus into training sequences.

def chunk_tokens(df, id_col: str, text_col: str, chunk_size: int = 128,
                 stride: int = 96):
    """Explode each document into token chunks of ``chunk_size`` starting
    every ``stride`` tokens (overlap = chunk_size − stride). Returns
    ``(id, chunk_id, chunk_text, n_chunk_tokens)``; trailing chunks may be
    short, callers filter if they need full windows only.

    Narrow until the explode; the chunk windows are sliced from ONE
    materialized token array per document (no per-chunk re-tokenization —
    the lambda multi-reference hazard, see operators/dedup.py). At 100 TB
    the explode multiplies rows by ~n_tokens/stride but each output row is
    a bounded slice, and no shuffle is needed at all — chunking is a map.
    """
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    from dbt_decodable_spark.operators.dedup import _shingle_session_df

    toks = tokens(text_col)
    base = fan_out(_shingle_session_df(df, name="__chunk_input")).select(
        F.col(id_col).alias("id"), toks.alias("__toks")
    )
    n = F.size("__toks")
    # chunk start offsets 0, stride, 2·stride, … < n_tokens
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s, i: F.struct(
            i.alias("chunk_id"),
            F.slice(F.col("__toks"), s + 1, chunk_size).alias("toks"),
        ),
    )
    exploded = base.select(
        "id", F.explode(F.when(n > 0, chunks)).alias("ch")
    )
    return exploded.select(
        "id",
        F.col("ch.chunk_id").cast("long").alias("chunk_id"),
        F.concat_ws(" ", F.col("ch.toks")).alias("chunk_text"),
        F.size("ch.toks").cast("long").alias("n_chunk_tokens"),
    )


# ------------------------------------------------------- quality gating

def quality_quantile_gate(df, stratum_col: str, score_col, id_col: str,
                          keep_frac: float = 0.5):
    """Keep the top ``keep_frac`` of rows per stratum by score — the
    "train only on the best X% per language" gate.

    Exact discrete-quantile semantics via integer rank arithmetic (no
    float quantile interpolation, so any engine agrees): a row survives iff
    ``rank > floor((1-keep_frac) * n_stratum)`` where rank orders ascending
    by (score, id) — deterministic under ties.

    One shuffle on the stratum key; rank and count share the same window
    partitioning, so Catalyst evaluates both in a single Window exec. At
    100 TB a handful of language strata can skew — if one stratum dominates,
    pre-aggregate the per-stratum counts (tiny) and broadcast-join them
    instead of the count window, then rank within range-partitioned score
    buckets. The gate semantics are unchanged.
    """
    from pyspark.sql.window import Window

    if not (0.0 < keep_frac <= 1.0):
        raise ValueError("keep_frac must be in (0, 1]")
    sc = score_col if not isinstance(score_col, str) else F.col(score_col)
    w_rank = Window.partitionBy(stratum_col).orderBy(sc.asc(), F.col(id_col).asc())
    w_all = Window.partitionBy(stratum_col)
    ranked = df.withColumn("__rn", F.row_number().over(w_rank)).withColumn(
        "__n", F.count(F.lit(1)).over(w_all)
    )
    # floor((1-keep)*n) in exact integer arithmetic: with keep_frac as an
    # exact-ish double, floor(x) differences can only bite at integer
    # boundaries — avoid by scaling to micro-units (both engines compute
    # the identical integer for any keep_frac with <= 6 decimals)
    cut = F.floor(F.col("__n") * F.lit(round((1.0 - keep_frac) * 1_000_000)) / F.lit(1_000_000))
    return ranked.filter(F.col("__rn") > cut).drop("__rn", "__n")


def salient_terms(df, id_col: str, text_col: str, k: int = 3):
    """Per-document top-k salient terms: TF-IDF's shape with an
    integer-exact rarity weight — ``score = tf × (N − df)`` where ``tf`` is
    the term's in-document count, ``df`` its document frequency, ``N`` the
    corpus size. Monotone in tf and in rarity like tf·idf, but pure BIGINT
    arithmetic, so the ranking is bit-reproducible across engines (a
    ``log``-based idf is libm-dependent and banned from oracle-compared
    output). Ties break on the term string ascending — the rank is total.

    Output: ``(id, term, tf, score, rank)``, rank ≤ k.

    Scale shape: explode (map) → groupBy(id, term) with map-side partial
    aggregation → groupBy(term) for df — both shuffles move (term, count)
    pairs, never documents; N is a single scalar cross-joined as a
    broadcast; the final per-document top-k is one window shuffle on the id
    (bounded output: k rows per document).
    """
    from dbt_decodable_spark.operators.dedup import fan_out, tokens

    from pyspark.sql import Window as W

    term_rows = (
        fan_out(df)
        .select(id_col, F.explode(tokens(text_col)).alias("term"))
        .filter(F.length("term") > 0)
    )
    # materialize the tf aggregate ONCE: it feeds both the df-count
    # aggregate and the scoring join, and Catalyst plans no ReusedExchange
    # across the two references — without this the tokenize+explode+tf
    # pipeline executes twice per run (measured: 2 full document scans in
    # the executed plan). The checkpointed relation is the (id, term, tf)
    # aggregate — corpus-vocabulary-bounded, far smaller than the
    # occurrence rows (at cluster scale: write it to parquet and read back).
    tf = (
        term_rows.groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    dfc = tf.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
    n_docs = df.select(id_col).agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(dfc, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", F.col("tf") * (F.col("__n") - F.col("__df")))
    )
    w = W.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "score", "rank")
    )


def winnow_fingerprints(df, id_col: str, text_col: str, k: int = 4, w: int = 4):
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every k-token gram, slide a
    w-hash window, and record the window's minimum hash with its gram
    position (leftmost-min tie rule here — deterministic and
    SQL-expressible, unlike the paper's rightmost-min). Guarantees at least
    one shared fingerprint for any match of length ≥ w + k − 1 tokens —
    the local-dedup property plain min-hashing lacks.

    Output: distinct ``(id, pos, fp)`` rows.

    Scale shape: the whole selection is per-document JVM array arithmetic
    (one materialized hash array per doc, no shuffle at all before the
    distinct); the output is ~1/w of the gram count per document. The
    window min is recomputed per position (O(w) per gram) — fine for the
    w≈4..8 winnowing uses; a monotone-deque pass would be O(1) amortized
    but needs per-row imperative code.
    """
    from dbt_decodable_spark.operators.dedup import fan_out

    base = (
        fan_out(df)
        # two-step projection: tokenize ONCE into a real column, then hash
        # grams from it (tokenizing inside the gram lambda would be
        # O(tokens²) per document)
        .select(id_col, tokens(text_col).alias("__toks"))
        .select(id_col, rolling_hashes(F.col("__toks"), k).alias("__h"))
    )
    h = F.col("__h")
    sel = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(h) - w, F.lit(0))),
        lambda j: F.struct(
            (
                j
                + F.array_position(
                    F.slice(h, j + 1, w), F.array_min(F.slice(h, j + 1, w))
                )
                - 1
            ).cast("int").alias("pos"),
            F.array_min(F.slice(h, j + 1, w)).alias("fp"),
        ),
    )
    return (
        base.select(id_col, F.explode(sel).alias("__s"))
        .select(id_col, F.col("__s.pos").alias("pos"), F.col("__s.fp").alias("fp"))
        .distinct()
    )


def bigram_commonness(df, id_col: str, text_col: str):
    """Language-model-frequency proxy without a model: a document's average
    corpus frequency of its bigram occurrences. Fluent text reuses common
    collocations (high commonness); gibberish and boilerplate-free noise
    sit in rare bigrams (low). The integer sum / integer count division is
    one exact IEEE op, so the score is oracle-comparable — the reason this
    stands in for a perplexity score (log-prob sums are libm-dependent).

    Output: ``(id, n_bigrams, total_cf, commonness)`` — one row per input
    document; documents with < 2 tokens get NULL commonness.

    Scale shape: explode (map) → ONE groupBy(gram) for corpus counts →
    join back on the gram key (count table is ~vocab²-bounded but
    Zipf-small in practice; AQE broadcasts it when it fits) → one
    groupBy(id). Shuffles carry (gram, count) pairs, never documents.
    """
    from dbt_decodable_spark.operators.dedup import fan_out, tokens

    base = fan_out(df).select(id_col, tokens(text_col).alias("__toks"))
    grams = base.select(
        id_col, F.explode(ngrams_from_tokens(F.col("__toks"), 2)).alias("gram")
    )
    # pre-aggregate occurrences to (id, gram, n) and materialize ONCE
    # (guide §2.3/§2.4): the gram relation used to feed two consumers —
    # the corpus-count aggregate and the join side — and with no
    # ReusedExchange the tokenize+explode pipeline executed twice; the
    # pre-agg is also strictly fewer shuffled bytes (map-side partial agg
    # collapses within-document repeats before anything crosses the wire).
    # Arithmetic is unchanged exactly: cf = Σ_docs n, n_bigrams = Σ n,
    # total_cf = Σ n·cf — the same integers the per-occurrence plan summed.
    gram_tf = (
        grams.groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("__n"))
        .localCheckpoint(eager=True)
    )
    counts = gram_tf.groupBy("gram").agg(F.sum("__n").alias("cf"))
    per_doc = (
        gram_tf.join(counts, "gram")
        .groupBy(id_col)
        .agg(
            F.sum("__n").alias("n_bigrams"),
            F.sum(F.col("__n") * F.col("cf")).alias("total_cf"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("total_cf", F.lit(0)).alias("total_cf"),
            (F.col("total_cf") / F.col("n_bigrams")).alias("commonness"),
        )
    )


# ------------------------------------------------------------ Gopher rules
# MassiveText document-quality gates (Rae et al. 2021, "Scaling Language
# Models: ... Gopher", appendix A1.1): hard bounds on word count, mean word
# length, symbol ratio, alphabetic-word fraction, and stopword presence.
# All JVM expressions; ratios are single double divisions of exact integer
# counts, so any ANSI-SQL oracle reproduces them bit-for-bit.

GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def gopher_metrics(col: Column | str) -> dict[str, Column]:
    """Per-document Gopher gate inputs over the normalized token stream.

    ``mean_word_len`` and the two fractions divide exact BIGINT counts once
    — deterministic doubles. ``n_symbols`` counts ``#`` and ``...``
    occurrences in the raw text (the MassiveText "symbol" set).
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(col)
    n_words = F.size(toks).cast("long")
    # total token chars = normalized length minus the (n-1) separators
    total_chars = (F.length(normalize_text(c)) - (n_words - 1)).cast("long")
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("long")
    stop = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).cast("long")
    n_sym = (
        F.regexp_count(c, F.lit(r"#")) + F.regexp_count(c, F.lit(r"\.\.\."))
    ).cast("long")
    nz = F.when(n_words > 0, n_words)
    return {
        "n_words": n_words,
        "mean_word_len": total_chars / nz,
        "frac_alpha_words": n_alpha / nz,
        "n_stopword_hits": n_stop,
        "symbol_ratio": n_sym / nz,
    }


def gopher_pass(col: Column | str, min_words: int = 50, max_words: int = 100_000) -> Column:
    """1 iff the document clears every Gopher gate (word-count bounds,
    mean word length in [3, 10], ≥80% alphabetic words, ≥2 stopword hits,
    symbol ratio ≤ 0.1)."""
    m = gopher_metrics(col)
    ok = (
        (m["n_words"] >= min_words)
        & (m["n_words"] <= max_words)
        & (m["mean_word_len"] >= 3.0)
        & (m["mean_word_len"] <= 10.0)
        & (m["frac_alpha_words"] >= 0.8)
        & (m["n_stopword_hits"] >= 2)
        & (m["symbol_ratio"] <= 0.1)
    )
    return F.when(ok, F.lit(1)).otherwise(F.lit(0))


# --------------------------------------------------------- markup stripping
# C4/FineWeb-style cleanup: drop HTML tags, decode the five standard
# entities, collapse whitespace. Plain regexp_replace chains — identical
# pattern semantics in Java regex and RE2, so the same expressions run in
# any SQL oracle. No capture-group replacements (Spark spells them $1,
# DuckDB \1 — a silent portability trap).


def strip_markup(col: Column | str) -> Column:
    """Markup-free text: tags → space, entities decoded, whitespace
    collapsed. Map-only JVM expression chain (single codegen stage)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.regexp_replace(c, r"<[^>]*>", " ")
    for ent, rep in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"),
        ("&amp;", "&"),  # LAST — else &amp;lt; would double-decode
    ):
        out = F.replace(out, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


# --------------------------------------------------------- URL canonicalize
# Crawl-dedup canonicalization: two spellings of the same page must map to
# one key BEFORE exact dedup, or every http/https/www/utm variant becomes
# a distinct "document". Pure regex pipeline, engine-portable.


def canonical_url(col: Column | str) -> Column:
    """Canonical form: lowercase, fragment/scheme/www stripped, trailing
    ``utm_*`` tracking params removed, trailing slash and lone ``?``
    dropped. Deliberately conservative — no path resolution, no percent
    decoding (those change identity)."""
    c = F.col(col) if isinstance(col, str) else col
    u = F.lower(c)
    u = F.regexp_replace(u, r"#.*$", "")        # fragment
    u = F.regexp_replace(u, r"^https?://", "")  # scheme
    u = F.regexp_replace(u, r"^www\.", "")      # www prefix
    # utm stripping in three position-aware steps — a single [?&]utm_[^&]*
    # pass would eat the '?' when a utm param leads and others follow,
    # leaving the malformed 'path&id=…' key:
    u = F.regexp_replace(u, r"&utm_[^&]*", "")      # non-leading params
    u = F.regexp_replace(u, r"\?utm_[^&]*&", "?")   # leading, others follow
    u = F.regexp_replace(u, r"\?utm_[^&]*$", "")    # leading and alone
    u = F.regexp_replace(u, r"\?$", "")         # lone ? left behind
    return F.regexp_replace(u, r"/$", "")       # trailing slash


# ------------------------------------------------------------ novelty / OOV


def novelty_scores(df, id_col: str, text_col: str, n: int = 3):
    """Per-document n-gram novelty: the fraction of a document's distinct
    n-gram shingles that occur in NO other document — the inverse of the
    contamination/duplication signal, used to up-weight diverse documents
    in curation. Output: ``(id, n_shingles, n_novel, novelty)``.

    Shape: the shingle inverted index (one explode + one groupBy(shingle)
    document-frequency aggregate — partial-agg'd 16-byte keys at scale)
    joined back per (id, shingle); df == 1 means "only this document".
    No pair join, no quadratic step.
    """
    from dbt_decodable_spark.operators.dedup import shingle_strings

    # materialize the shingle pipeline ONCE (the dedup-module rule): it
    # feeds both the document-frequency aggregate and the join side, and
    # without the checkpoint the tokenize+shingle explode executes twice
    # (no ReusedExchange across the two references — verified in the
    # executed plan).
    #
    # SIZING (ADVICE r13): unlike the vocabulary-bounded tf/gram_tf
    # checkpoints in this module, (id, shingle) is OCCURRENCE-scale — it
    # grows linearly with corpus tokens, and the checkpointed blocks stay
    # in the block manager until the session ends (clearCache does not
    # reclaim checkpointed RDDs). Fine for the bench/test corpora (~100k
    # rows); at cluster scale materialize the shingle table to parquet
    # (write+read back, as graph_khop_neighbors does for its edge proxy)
    # instead of checkpointing, so the one-copy intermediate lives on disk
    # rather than pinned in executor memory.
    sh = shingle_strings(df, id_col, text_col, n).localCheckpoint(
        eager=True
    )  # (id, shingle) distinct
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    per_doc = (
        sh.join(dfreq, "shingle")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("__df") == 1, 1).otherwise(0)).alias("n_novel"),
        )
    )
    return per_doc.select(
        "id",
        "n_shingles",
        "n_novel",
        (F.col("n_novel") / F.col("n_shingles")).alias("novelty"),
    )


def stratum_length_quantiles(
    df, stratum_col: str, length_col: str, quantiles=(50, 90)
):
    """Exact discrete per-stratum quantiles of a length column: the value
    at integer rank ``ceil(q·n/100)`` within each stratum (the same
    integer-rank rule as ``quality_quantile_gate`` — engine-exact, no
    interpolation). One window shuffle partitioned BY STRATUM (never a
    global sort); the corpus-length reporting op for curation dashboards.

    Output: ``(stratum, n_rows, q50, q90, ...)`` one row per stratum.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy("stratum").orderBy(F.col("__len").asc())
    ranked = df.select(
        F.col(stratum_col).alias("stratum"), F.col(length_col).alias("__len")
    ).withColumn("__rn", F.row_number().over(w))
    counts = ranked.groupBy("stratum").agg(F.max("__rn").alias("n_rows"))
    j = ranked.join(F.broadcast(counts), "stratum")
    aggs = [F.max("n_rows").alias("n_rows")]
    for q in quantiles:
        target = F.expr(f"(n_rows * {q} + 99) div 100")
        aggs.append(
            F.max(F.when(F.col("__rn") == target, F.col("__len"))).alias(f"q{q}")
        )
    return j.groupBy("stratum").agg(*aggs)


def oov_rate(df, id_col: str, text_col: str, vocab: list[str]):
    """Per-document out-of-vocabulary token fraction against a fixed
    vocabulary list (tokenizer-fit metric: high OOV → the tokenizer will
    shred the document into bytes). The vocab rides the closure as an
    array literal — broadcast-by-construction, no join, map-only scan.

    Output: ``(id, n_tokens, n_oov, oov_frac)``.
    """
    toks = tokens(text_col)
    varr = F.array(*[F.lit(v) for v in vocab])
    base = df.select(F.col(id_col).alias("id"), toks.alias("__toks"))
    n_tok = F.size("__toks").cast("long")
    n_oov = F.size(
        F.filter("__toks", lambda t: ~F.array_contains(varr, t))
    ).cast("long")
    return base.select(
        "id",
        n_tok.alias("n_tokens"),
        n_oov.alias("n_oov"),
        (n_oov / F.when(n_tok > 0, n_tok)).alias("oov_frac"),
    )
