"""Distributed Bloom-filter membership for incremental dedup (SURVEY §2.12).

At 100 TB the first question for every newly-ingested batch is "which of
these documents have we *definitely never* seen?" — answering it with a
join against the full historical key set shuffles the history every batch.
A Bloom filter answers it with a fixed-size bitset: false positives only
(a "maybe seen" can be re-checked against the exact index; a "not seen" is
certain), so the expensive exact path runs on the tiny maybe-set instead of
the whole batch. This is the standard pre-filter in front of
:func:`dbt_decodable_spark.operators.dedup.minhash_incremental_candidates`.

Distributed build — no driver-side bitset, no RDD:

- each historical key yields ``k`` bit positions (deterministic md5-keyed
  hashes, no RNG — reproducible across engines/runs/partitionings);
- positions fold into a ``(word_idx, bits)`` table via ``groupBy(word_idx)
  .agg(bit_or(1 << bit))`` — partial aggregation ORs map-side, so the
  shuffle moves at most ``m/32`` rows per map task regardless of history
  size. The whole filter is ``m/32`` rows (a 1-billion-bit filter is 31 M
  rows ≈ 500 MB — still a table, never a driver object);
- membership joins the batch's exploded positions against the word table.
  For the common sizes (≤ 2^27 bits ≈ 4 M rows) the word table is
  broadcast, so the 100 TB batch scan stays map-side with no shuffle.

Word size is 32 bits in a BIGINT word: ``1 << 31`` stays positive in
signed 64-bit everywhere, so the same arithmetic runs unmodified in any
ANSI-SQL oracle (DuckDB errors on ``1::BIGINT << 63`` sign overflow).

The reference (decodableco/dbt-decodable) has no dedup surface at all —
part of the driver-mandated training-data extension set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_WORD_BITS = 32


def _position(key: Column, j: int, m_bits: int) -> Column:
    """Deterministic hash position j for a key: 60 bits of md5(j || '#' ||
    key) read as an integer, mod m. 15 hex chars < 2^63 so ``conv`` cannot
    overflow; md5 keeps it engine-portable (DuckDB:
    ``CAST('0x' || substr(md5(...), 1, 15) AS BIGINT) % m``)."""
    h = F.md5(F.concat(F.lit(f"{j}#"), key))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % m_bits


def _positions(key: Column, m_bits: int, k: int) -> Column:
    return F.array(*[_position(key, j, m_bits) for j in range(k)])


def build_bloom(
    df: DataFrame, key_col: str, m_bits: int = 1 << 16, k: int = 4
) -> DataFrame:
    """Fold a key column into a Bloom word table ``(word_idx, bits)``.

    One explode (k rows/key) + one groupBy — ``bit_or`` partially
    aggregates map-side, so the shuffle carries at most ``m/32`` distinct
    words per task, independent of input size."""
    pos = df.select(
        F.explode(_positions(F.col(key_col), m_bits, k)).alias("pos")
    )
    return (
        pos.withColumn("word_idx", F.floor(F.col("pos") / _WORD_BITS))
        .withColumn("bit", (F.col("pos") % _WORD_BITS).cast("int"))
        .groupBy("word_idx")
        .agg(F.bit_or(F.expr("shiftleft(1L, bit)")).alias("bits"))
    )


def check_membership(
    batch: DataFrame,
    bloom: DataFrame,
    key_col: str,
    id_col: str,
    m_bits: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """Tag each batch row with ``maybe_seen`` (1 = all k bits set — possible
    duplicate, route to the exact check; 0 = certainly new).

    The word table is broadcast (``m/32`` rows — 2 K rows at the default
    2^16 bits), so the batch side is a map-only scan: explode k positions,
    hash-probe the broadcast words, fold back with min(hit). No shuffle of
    batch data beyond the id re-group, which AQE coalesces."""
    probes = batch.select(
        F.col(id_col).alias("__bid"),
        F.col(key_col).alias("__bkey"),
        F.explode(_positions(F.col(key_col), m_bits, k)).alias("pos"),
    ).select(
        "__bid",
        "__bkey",
        F.floor(F.col("pos") / _WORD_BITS).alias("word_idx"),
        (F.col("pos") % _WORD_BITS).cast("int").alias("bit"),
    )
    # broadcast only at sizes that are sanely driver-collectable — the
    # module's own doc puts the line at 2^27 bits (~4M words); past it the
    # word table joins as a plain table (shuffle join, still m/32 rows)
    bloom_side = bloom if m_bits > (1 << 27) else F.broadcast(bloom)
    hits = probes.join(bloom_side, "word_idx", "left").select(
        "__bid",
        "__bkey",
        F.when(
            F.expr("shiftright(coalesce(bits, 0L), bit)").bitwiseAND(F.lit(1)) == 1,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("hit"),
    )
    # fold per (id, KEY), not id alone: two batch rows sharing an id but
    # carrying different keys would otherwise merge their probes under
    # min(hit) — a genuinely-seen key masked 'certainly new' by its
    # sibling's unset bit, leaking a duplicate past the exact check
    flags = hits.groupBy("__bid", "__bkey").agg(F.min("hit").alias("maybe_seen"))
    # LEFT join + coalesce: a NULL id produces NULL probe positions and no
    # flag row — an inner join would silently drop the document from the
    # routing entirely. A NULL key was never inserted, so it is certainly new.
    return (
        batch.join(
            flags,
            batch[id_col].eqNullSafe(flags["__bid"])
            & batch[key_col].eqNullSafe(flags["__bkey"]),
            "left",
        )
        .withColumn("maybe_seen", F.coalesce(F.col("maybe_seen"), F.lit(0)))
        .drop("__bid", "__bkey")
    )


def bloom_prefilter_new_keys(
    history: DataFrame,
    batch: DataFrame,
    key_col: str,
    id_col: str,
    m_bits: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """End-to-end incremental-dedup pre-filter: build the filter over
    ``history`` and split ``batch`` into certainly-new (``maybe_seen = 0``)
    vs needs-exact-check rows. Returns the batch with the flag column; the
    caller routes ``maybe_seen = 1`` rows to the exact/minhash index."""
    bloom = build_bloom(history, key_col, m_bits, k)
    return check_membership(batch, bloom, key_col, id_col, m_bits, k)
