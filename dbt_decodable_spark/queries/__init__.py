"""Query registry: every operator from SURVEY.md §2 gets a named query with a
DuckDB oracle (the driver's correctness gate, ``/root/repo/__spark_entry__.py``).

Conventions (driver contract):

- each query fn takes ``(spark, sf_dir)`` and returns a DataFrame;
- every computed/aggregate column is aliased identically in the Spark code
  and the oracle SQL (the driver sorts columns by name before hashing);
- money/float aggregates are made *deterministic* via the exact integer-unit
  policy of :mod:`dbt_decodable_spark.queries.money` (scale the 2-decimal
  values to BIGINT units per row, sum exactly, convert to DOUBLE once at the
  end) — the same double comes out of Spark and DuckDB bit-for-bit, and no
  query emits a DECIMAL output column;
- queries whose semantics aren't ANSI-SQL-expressible register
  ``oracle=None`` → the driver records a weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


# The driver's correctness gate measures the FIRST 50 registry entries per
# round. Round-5 rotation: (a) the 24 queries that have NEVER had a driver
# row (the §2.12 LLM-pipeline batch registered in round 3 + the tpch3
# battery); (b) the three rows that were red in CORRECTNESS_r04 (all three
# broke when the testdata's events.ts encoding changed to TIMESTAMP_NTZ —
# fixed centrally in sources/tables.read_table) so their fix is measured by
# the hard signal; (c) re-measures of the §2.12 extension set last seen in
# round 2, before the money.py integer-unit migration and this round's
# similarity rewiring (LSH-blocked threshold join, max_by ivf_assign).
# Everything NOT in the window stays verified by tools/oracle_check.py
# (type-strict local replica of the same comparison) and pytest.
# Staged for the round-6 window: source_json_roundtrip and func_url (the
# only two queries with no driver row after this rotation), plus re-measures
# of whatever round 6 touches.
_DRIVER_WINDOW_PRIORITY = (
    # (a) never driver-measured:
    "dedup_connected_components", "decontaminate_against_benchmark",
    "dedup_embedding_cosine", "text_quality_quantile_gate",
    "text_repetition_filter", "text_redact_pii", "text_chunk_windows",
    "multimodal_features", "pack_token_shards",
    "sample_uniform", "sample_stratified",
    "unpivot_stack", "join_interval", "join_asof_merge", "agg_bool_string",
    "text_token_histogram", "embedding_normalize",
    "tpch_q2_min_cost_supplier", "tpch_q9_product_type_profit",
    "tpch_q11_important_part_value", "tpch_q12_late_shipment_priority",
    "tpch_q16_supplier_part_count", "tpch_q20_excess_shipments",
    "tpch_q21_suppliers_kept_waiting",
    # (b) red in CORRECTNESS_r04 (events.ts TIMESTAMP_NTZ regression):
    "stream_session_window", "stream_sessionize_stateful",
    "func_timestamp_ltz",
    # (c) §2.12 extension re-measures (last driver row: round 2):
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_simhash", "similarity_bruteforce_topk", "similarity_lsh_topk",
    "similarity_threshold_join", "similarity_ivf_topk",
    "multimodal_metadata", "text_token_count", "text_quality",
    "agg_approx_distinct", "events_count", "agg_groupby_q1",
    "embedding_quantize_int8",
    # new this round (streaming temporal + interval joins, SCD2 build,
    # source mixing, vocab/corpus stats, incremental dedup, file sources):
    "stream_temporal_join", "stream_scd2_versions", "stream_interval_join",
    "mix_token_budget", "text_vocab_topk", "dedup_incremental_minhash",
    "corpus_stats_by_source", "source_csv_roundtrip",
)


def load_all() -> dict[str, QueryDef]:
    """Import every query module (side effect: fills REGISTRY) and return the
    registry ordered so the driver's 50-entry correctness window covers the
    queries that most need a fresh measurement (see _DRIVER_WINDOW_PRIORITY)."""
    from dbt_decodable_spark.queries import (  # noqa: F401
        aggregates,
        extensions,
        joins,
        relational,
        relational2,
        scalar_functions,
        streaming_q,
        tpch,
        tpch2,
        tpch3,
        windows,
    )

    ordered = {n: REGISTRY[n] for n in _DRIVER_WINDOW_PRIORITY if n in REGISTRY}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    return ordered
