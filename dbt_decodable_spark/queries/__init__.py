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
# round. Round-14 rotation (VERDICT r13 item 3): the 49-row round-10
# cohort hits the MAX_AGE_ROUNDS=4 staleness bound when r14 lands and MUST
# refresh (CORRECTNESS_r10 had 50 rows, but ivm_join_agg_dag has since been
# replaced in the registry, leaving 49 mandatory rows + 1 free slot). The
# free slot goes to ivm_dag_depth3: this round changes its commit-protocol
# internals (_SUCCESS batching, VERDICT r13 item 4), so the driver should
# re-attest it at r14 rather than ride on r12 evidence. The registry stays
# frozen at 198 (capacity 4×50=200); any new row must REPLACE a superseded
# one. After this rotation, r15's forecast load is the 49-row r11 cohort
# (1 free slot). Everything NOT in the window stays verified by
# tools/oracle_check.py (driver-faithful local replica) and pytest;
# tools/window_audit.py mechanically checks the staleness invariant.
_DRIVER_WINDOW_PRIORITY = (
    # the registered round-10 cohort (49 rows at the staleness bound):
    "agg_global", "agg_groupby_expression", "agg_grouping_sets",
    "dedup_cluster_keep_best", "dedup_cross_source_matrix",
    "dedup_minhash_verified", "dedup_paragraph_exact",
    "dedup_semantic_clusters", "dedup_span_ngram", "dedup_span_removal",
    "dedup_url_canonical", "embedding_quantize_int8",
    "events_funnel_stages", "events_rolling_active_7d", "func_unicode_nfc",
    "func_url", "graph_khop_neighbors", "ivm_agg_maintained",
    "mix_epochs_upsample", "mix_temperature_quota",
    "multimodal_features", "pack_length_buckets",
    "pipeline_curation_end2end", "sample_importance_weighted",
    "sample_reservoir_per_source", "sample_split_assign",
    "similarity_ivf_kmeans_topk", "similarity_ivf_quantized_topk",
    "source_json_roundtrip", "source_orc_roundtrip",
    "source_parquet_zstd_roundtrip", "source_partitioned_pruned",
    "source_text_roundtrip", "stream_bloom_index", "stream_dedup_watermark",
    "stream_interval_join_outer", "stream_kmeans_assign",
    "stream_minhash_index", "stream_window_topk", "stream_window_topk_run",
    "text_bigram_commonness", "text_bpe_segment", "text_bpe_train",
    "text_gopher_quality", "text_novelty_score", "text_oov_rate",
    "text_salient_terms", "text_strip_markup", "text_winnowing",
    # free slot (r13 verdict item 3): re-attest the query whose commit
    # protocol this round optimizes.
    "ivm_dag_depth3",
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
