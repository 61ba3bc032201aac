"""Text analysis operators for training-data pipelines (SURVEY §2.12):
language ID (stopword heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), document fingerprinting. All deterministic JVM
expressions — formulas are reproducible in plain SQL for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from dbt_decodable_spark.operators.dedup import normalize_text, tokens

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


def rolling_hashes(col: Column | str, window: int = 4) -> Column:
    """Array of md5 hashes over sliding token windows (winnowing-style
    fingerprint basis)."""
    toks = tokens(col)
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - window, F.lit(0))),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, window))),
    )
