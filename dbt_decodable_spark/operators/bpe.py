"""BPE merge-rule learning (SURVEY §2.12): the tokenizer-training loop as a
distributed DataFrame recurrence.

Byte-pair encoding fits a tokenizer by repeating: count adjacent symbol
pairs over the corpus → merge the most frequent pair everywhere → repeat.
Each round here is pure DataFrame work — a map-side pair explode, one
partially-aggregated ``groupBy(a, b)``, a ``TakeOrderedAndProject`` top-1,
and a map-only merge application — so the corpus is never collected and the
only driver-side datum per round is the single winning pair.

Exactness is the point (like :mod:`clustering`): pair counts are integers,
the winner is the (count DESC, pair ASC) total order, and the merge itself
is plain left-to-right non-overlapping string ``replace`` — semantics every
engine shares, which makes the learned rules and the resegmentation
value-oracle-able (the ``text_bpe_*`` oracles unroll identical rounds).

Representation: a document's symbol sequence is kept BOTH as an array (for
pair counting) and as a **doubled-separator string** ``~~s1~~s2~~…~~`` (for
merge application). A pair merge is then the literal replace of
``~a~~b~`` with ``~ab~`` — the pattern consumes the *inner* half of each
boundary, so back-to-back occurrences (``a b a b``) still match on the
rescan, while overlapping ones (``a a a``) correctly merge greedily
left-to-right (``aa, a``), exactly the sequential BPE semantics. A plain
regex-free replace needs no lookbehind (RE2-safe for any oracle engine).
The separator must not occur in the corpus alphabet — documents containing
it are excluded by a filter guard fused into the scan.

Merged symbols can never contain ``~``, so the invariant (every boundary
and both ends are ``~~``) survives any number of rounds; resegmentation is
``split(trim(both '~'), '~~')``.

No reference counterpart (decodableco/dbt-decodable has no text-processing
surface); driver-mandated extension per /root/repo/BASELINE.json:6.

**100 TB pattern — sample-then-apply.** Every merge round is a full corpus
pass (standard BPE shape: the pair histogram must see all adjacent pairs),
so learning V merge rules costs V corpus scans. At 100 TB you do NOT run
the trainer over the whole corpus: learn the rules on a hash-sampled
subset (``WHERE xxhash64(doc_id) % K = 0`` — a few GB is statistically
ample for a pair-frequency ranking, same sampling contract as
``operators/sampling.py``), then apply them corpus-wide via
the ``text_bpe_segment`` apply path, which is a single map-only pass per
ruleset (rules inlined as literal replaces, no shuffle, no driver data). The
trainer here is exact-by-construction so the sampled run stays
value-oracle-able; scale lives in the apply path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

SEP = "~"


def chars_of(s: Column) -> Column:
    """``string`` → ``array<string>`` of single characters (1-based substr
    over a sequence — no empty-string artifacts from regex split). Empty
    input → empty array (guarded: ``sequence(1, 0)`` would otherwise step
    DOWN and produce two phantom elements)."""
    return F.when(F.length(s) > 0, F.transform(
        F.sequence(F.lit(1), F.length(s)), lambda i: F.substring(s, i, F.lit(1))
    )).otherwise(F.array().cast("array<string>"))


def to_sym_string(syms: Column) -> Column:
    """Symbol array → doubled-separator string ``~~s1~~s2~~``."""
    d = SEP + SEP
    return F.concat(F.lit(d), F.array_join(syms, d), F.lit(d))


def _resplit(col_name: str) -> Column:
    """Doubled-separator string column (by name) → symbol array."""
    return F.split(F.expr(f"trim(BOTH '{SEP}' FROM {col_name})"), SEP + SEP)


def _adjacent_pairs(syms: Column) -> Column:
    """Array of ``struct(a, b)`` adjacent pairs (empty for 1-symbol docs)."""
    n = F.size(syms)
    return F.zip_with(
        F.slice(syms, 1, n - 1),
        F.slice(syms, 2, n - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )


def _top_pair(sym_df: DataFrame) -> tuple[str, str, int] | None:
    """The corpus-wide most frequent adjacent pair; ties broken by the
    (a, b) lexicographic order. One partial-agg groupBy + TakeOrdered(1).
    ``None`` when no document has two symbols left (fully merged corpus)."""
    counts = (
        sym_df.select(F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = counts.orderBy(F.desc("cnt"), "a", "b").limit(1).collect()
    if not top:
        return None
    [w] = top
    return w.a, w.b, w.cnt


def learn_merges(
    docs: DataFrame,
    text_col: str,
    rounds: int = 2,
    max_chars: int = 64,
    sample_mod: int | None = None,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Run ``rounds`` BPE merge rounds over the first ``max_chars`` chars of
    each document. Returns ``(rules, segmented)`` where ``rules`` is
    ``[(round, left, right, count), …]`` (the only driver-side state — one
    row per round) and ``segmented`` carries ``(doc_id, syms, sym_string)``
    after all merges.

    ``sample_mod`` is the 100 TB sample-then-apply switch (module
    docstring): when set to K, the pair histograms are learned only over
    docs passing ``pmod(xxhash64(doc_id), K) = 0`` (deterministic ~1/K hash
    sample, same contract as ``operators/sampling.py``), and the returned
    ``segmented`` applies the learned rules to the FULL corpus in one
    map-only chained-replace projection — no shuffle, no extra corpus
    passes. ``rules`` counts are then sample counts. pytest pins rule
    identity on a replicated corpus at K=1 vs K=4
    (``tests/test_round9.py``).

    Documents shorter than 2 chars contribute no pairs and are dropped up
    front (they could never be resegmented anyway)."""
    base = (
        docs.select(
            "doc_id", F.substring(F.col(text_col), 1, max_chars).alias("__s")
        )
        # charset guard fused into the scan (no extra action): a doc that
        # contains the separator would corrupt the boundary encoding, so it
        # is excluded — pick a SEP outside the corpus alphabet
        .filter((F.length("__s") >= 2) & ~F.col("__s").contains(SEP))
    )
    train = base
    if sample_mod is not None and sample_mod > 1:
        train = base.filter(
            F.pmod(F.xxhash64(F.col("doc_id")), F.lit(sample_mod)) == 0
        )
    cur = train.select(
        "doc_id",
        chars_of(F.col("__s")).alias("syms"),
    ).withColumn("sym_string", to_sym_string(F.col("syms")))

    # Per-round caching: round r's _top_pair collect would otherwise replay
    # all r-1 prior merge applications from the raw scan (O(rounds²) corpus
    # passes). Each round's input is persisted; the PREVIOUS round's cache
    # is dropped once _top_pair has materialized the current one. The last
    # round's cache backs the returned `segmented` and is released on the
    # next learn_merges call in the same session (bounded leak of one).
    spark = docs.sparkSession
    prev_cache = getattr(spark, "_bpe_round_cache", None)
    if prev_cache is not None:
        prev_cache.unpersist(False)
    cur = cur.persist()
    live = [cur]

    rules: list[tuple[int, str, str, int]] = []
    for r in range(1, rounds + 1):
        top = _top_pair(cur)  # materializes (and caches) cur
        while len(live) > 1:
            live.pop(0).unpersist(False)
        if top is None:  # every doc fully merged — no pairs left to rank
            break
        a, b, cnt = top
        rules.append((r, a, b, cnt))
        pat = F.lit(f"{SEP}{a}{SEP}{SEP}{b}{SEP}")
        rep = F.lit(f"{SEP}{a}{b}{SEP}")
        cur = cur.select(
            "doc_id", F.replace(F.col("sym_string"), pat, rep).alias("sym_string")
        ).withColumn("syms", _resplit("sym_string")).persist()
        live.append(cur)
    while len(live) > 1:
        live.pop(0).unpersist(False)
    spark._bpe_round_cache = live[0]
    if sample_mod is not None and sample_mod > 1:
        # apply the sampled-learned rules CORPUS-WIDE: one lazy map-only
        # projection chaining every merge as a literal replace (the
        # text_bpe_segment apply shape) — the scale path the module
        # docstring promises
        expr: Column = to_sym_string(chars_of(F.col("__s")))
        for _r, a, b, _c in rules:
            expr = F.replace(
                expr,
                F.lit(f"{SEP}{a}{SEP}{SEP}{b}{SEP}"),
                F.lit(f"{SEP}{a}{b}{SEP}"),
            )
        full = base.select("doc_id", expr.alias("sym_string")).withColumn(
            "syms", _resplit("sym_string")
        )
        return rules, full
    return rules, cur
