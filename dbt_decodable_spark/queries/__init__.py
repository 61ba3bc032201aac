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
# round. Round-13 rotation (VERDICT r12 item 1): the full 50-row round-9
# cohort hits the MAX_AGE_ROUNDS=4 staleness bound when r13 lands and MUST
# refresh — 0 free slots this round. The registry stays frozen at 198
# (capacity 4×50=200) for exactly this reason; any new row must REPLACE a
# superseded one. After this rotation, r14's forecast load is the 49-row
# r10 cohort (1 free slot). Everything NOT in the window stays verified by
# tools/oracle_check.py (driver-faithful local replica) and pytest;
# tools/window_audit.py mechanically checks the staleness invariant.
_DRIVER_WINDOW_PRIORITY = (
    # the full round-9 cohort (50 rows at the staleness bound):
    "agg_approx_distinct", "agg_bool_string", "agg_groupby_q1",
    "agg_kmv_distinct", "cluster_kmeans_lloyd", "corpus_length_quantiles",
    "corpus_stats_by_source", "decontaminate_against_benchmark",
    "dedup_bloom_filter", "dedup_cc_star_edges",
    "dedup_connected_components", "dedup_embedding_cosine", "dedup_exact",
    "dedup_incremental_minhash", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "embedding_normalize", "events_count", "func_timestamp_ltz",
    "join_asof_merge", "join_interval", "mix_token_budget",
    "multimodal_metadata", "pack_token_shards", "sample_stratified",
    "sample_uniform", "similarity_bruteforce_topk", "similarity_ivf_topk",
    "similarity_threshold_join", "source_csv_roundtrip",
    "stream_interval_join", "stream_scd2_versions", "stream_session_window",
    "stream_temporal_join", "text_chunk_windows", "text_quality",
    "text_quality_quantile_gate", "text_redact_pii",
    "text_repetition_filter", "text_token_count", "text_token_histogram",
    "text_vocab_topk", "tpch_q11_important_part_value",
    "tpch_q12_late_shipment_priority", "tpch_q16_supplier_part_count",
    "tpch_q20_excess_shipments", "tpch_q21_suppliers_kept_waiting",
    "tpch_q2_min_cost_supplier", "tpch_q9_product_type_profit",
    "unpivot_stack",
)


def load_all() -> dict[str, QueryDef]:
    """Import every query module (side effect: fills REGISTRY) and return the
    registry ordered so the driver's 50-entry correctness window covers the
    queries that most need a fresh measurement (see _DRIVER_WINDOW_PRIORITY)."""
    from dbt_decodable_spark.queries import (  # noqa: F401
        aggregates,
        extensions,
        extensions2,
        extensions3,
        ivm_q,
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
