"""Temporal (SCD2-versioned) dimension under incremental view maintenance —
the reference's change-stream dimension (``/root/reference/README.md:104``
primary-key change streams, ``decodable/client/schema.py:109-111``) composed
with the join IVM arm: the dim side's change stream is maintained as a
type-2 slowly-changing dimension (:func:`..streaming.changelog.
scd2_merge_batch`), and the maintained view enriches every live fact with
the dim version IN EFFECT AT THE FACT'S EVENT TIME — ``FOR SYSTEM_TIME AS
OF`` semantics (the streaming twin is :mod:`..streaming.temporal`), kept
incrementally correct as BOTH sides change.

Why this needs its own maintenance rule (vs :mod:`.ivm_join`): an equi-key
dim update rewrites ALL facts carrying that fk; a temporal dim VERSION with
``valid_from = t`` rewrites only the facts with ``fk = dk AND ts >= t`` —
history BEFORE the version stays pinned to the older version. The
maintenance step therefore recomputes exactly that slice:

- **fact batch**: every batch key is touched (its enrichment is
  re-derived against the current SCD2 table) — O(|batch|) view work. The
  snapshot ADVANCE itself is the caller's MERGE
  (:func:`maintain_temporal_join`'s ``snapshot_after`` — the
  :func:`.ivm.maintain` contract; bucketed partition-overwrite at scale,
  fold-the-union convenience fallback otherwise).
- **dim batch**: SCD2-merge the versions (closing previous current rows),
  then mark as touched every LIVE fact whose ``(fk, ts)`` falls at or
  after the batch's first new ``valid_from`` for that key — a broadcast
  range-semi-join probing the fact snapshot map-side (the dim batch is
  small by the change-stream contract; fanout is the real work and is
  exactly the set that must be rewritten). O(|batch| + fanout).
- touched keys' live images are AS-OF joined (:func:`..operators.asof.
  asof_join` — one shuffle of the SLICE, never the full fact table)
  against the versions of the touched dks only, and the view is patched
  by upsert/tombstone per touched key.

Contracts (documented, pytest-pinned):

- dim versions arrive in ``valid_from`` order per key (the
  ``scd2_merge_batch`` CDC contract); out-of-order history repair is a
  rebuild of the affected keys;
- fact keys and dim keys are non-null (primary-key change streams);
- dim keys are never deleted (a temporal dim retires by emitting a new
  version, not a tombstone — the equi-join arm owns hard dim deletes).

Equivalence to the from-base recompute (``scd2_from_changelog`` over the
full dim history + one AS-OF join of all live facts) is pinned in
``tests/test_ivm_temporal.py`` across multi-round two-sided churn; the
driver row is ``ivm_scd2_join`` (oracle: DuckDB's native ``ASOF JOIN``).

Scale: the fact snapshot is only ever probed map-side (broadcast semi
joins) or sliced; the AS-OF recompute shuffles O(touched) rows; the SCD2
table is O(|dim| + versions) and its merge windows over |batch| only —
no VIEW-maintenance step shuffles the 100 TB fact tail (it is scanned by
the broadcast probes, the same merge-on-read amplification every
log-consuming arm pays, partition-prunable on a bucketed layout). The
snapshot advance is the caller's MERGE — see
:func:`maintain_temporal_join`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from dbt_decodable_spark.operators.asof import asof_join
from dbt_decodable_spark.streaming.changelog import (
    fold_last_image,
    scd2_from_changelog,
    scd2_merge_batch,
)


@dataclass(frozen=True)
class TemporalJoinSpec:
    """Shape of a temporally-enriched view.

    fact_keys: fact primary key columns.
    fk_col: fact column matching the dim key.
    dim_key: dim key column.
    fact_ts: fact event-time column (the AS-OF probe instant).
    valid_from: dim change-stream column giving each version's start.
    payload: {output name: dim source column} enrichment columns.
    """

    fact_keys: tuple[str, ...]
    fk_col: str
    dim_key: str
    fact_ts: str
    valid_from: str
    payload: dict[str, str]


@dataclass
class TemporalJoinState:
    fact: DataFrame  # keyed fact snapshot, tombstones carried
    dim_versions: DataFrame  # SCD2 table (valid_from/valid_to/is_current)
    view: DataFrame  # live facts + payload, as-of enriched


def _live(df: DataFrame, delete_col: str | None) -> DataFrame:
    if delete_col is None:
        return df
    return df.filter(~F.coalesce(F.col(delete_col), F.lit(False)))


def _enrich(facts: DataFrame, versions: DataFrame, spec: TemporalJoinSpec) -> DataFrame:
    """AS-OF enrich: each fact gets the payload of the latest version with
    ``valid_from <= fact_ts`` for its fk (NULL payload when no version
    precedes the fact). One shuffle on the key — the merge-technique
    :func:`asof_join`, not a per-key quadratic probe."""
    rhs = versions.select(
        F.col(spec.dim_key).alias(spec.fk_col),
        F.col(spec.valid_from).alias("__vf"),
        *[F.col(src).alias(out) for out, src in spec.payload.items()],
    )
    return asof_join(
        facts,
        rhs,
        on=spec.fk_col,
        left_ts=spec.fact_ts,
        right_ts="__vf",
        value_cols=list(spec.payload),
        # deterministic winner among same-(key, valid_from) versions
        tiebreak_cols=list(spec.payload),
    )


def init_temporal_join_state(
    fact: DataFrame,
    dim_changes: DataFrame,
    spec: TemporalJoinSpec,
    fact_delete_col: str | None = None,
) -> TemporalJoinState:
    """Build the state by one full pass: SCD2 table from the dim change
    history (the batch/backfill path), then one AS-OF enrichment of the
    live facts. ``fact`` must already be a keyed snapshot (≤1 row/key)."""
    dim_versions = scd2_from_changelog(
        dim_changes, [spec.dim_key], spec.valid_from
    )
    view = _enrich(_live(fact, fact_delete_col), dim_versions, spec)
    return TemporalJoinState(fact=fact, dim_versions=dim_versions, view=view)


def maintain_temporal_join(
    state: TemporalJoinState,
    fact_batch: DataFrame | None,
    dim_batch: DataFrame | None,
    fact_order: Sequence[Column | str],
    spec: TemporalJoinSpec,
    fact_delete_col: str | None = None,
    broadcast_dim_batch: bool = True,
    broadcast_touched: bool = True,
    snapshot_after: DataFrame | None = None,
) -> TemporalJoinState:
    """Advance the temporally-enriched view by one micro-batch on either
    or both sides. Returns the new state; ``state.view`` equals the
    from-base recompute after every step (pytest-pinned).

    The SCD2 table advances by :func:`scd2_merge_batch`; the view by
    recomputing exactly the touched slice (batch fact keys ∪
    version-affected facts) — broadcast probes of the snapshot (scans,
    never shuffles) plus ONE AS-OF shuffle of the slice, so the VIEW work
    is O(|batch| + fanout).

    The fact snapshot advance is the caller's (the :func:`ivm.maintain`
    contract): pass ``snapshot_after`` — the post-merge keyed snapshot
    from the MERGE of your choice, at scale
    :func:`..streaming.changelog.merge_into_hash_partitioned` (a
    partition-overwrite touching only the batch keys' buckets). Without
    it the convenience fallback folds ``state.fact ∪ batch`` — the same
    associative winner rule, but a FULL key shuffle of the snapshot per
    batch: fine in-memory/small, the measured scale difference is the
    ``step_fold`` vs ``view_step`` rows of ``scale_probe temporal``."""
    spark = state.fact.sparkSession
    keys = list(spec.fact_keys)
    ordc = [F.col(c) if isinstance(c, str) else c for c in fact_order]

    if fact_batch is None:
        fact_batch = spark.createDataFrame([], state.fact.schema)
    # 1. advance the fact snapshot (caller-merged, else the fold fallback)
    if snapshot_after is not None:
        new_fact = snapshot_after
    else:
        new_fact = fold_last_image(
            state.fact.unionByName(fact_batch), keys, ordc
        )

    # 2. advance the SCD2 dim + collect version-affected fact keys
    if dim_batch is not None:
        new_dim = scd2_merge_batch(
            state.dim_versions,
            dim_batch,
            [spec.dim_key],
            spec.valid_from,
        )
        # first new valid_from per dim key: every live fact at/after it
        # re-enriches. Broadcast by the change-stream contract (a dim
        # batch is bounded); disable for bulk dim backfills.
        firsts = (
            dim_batch.groupBy(spec.dim_key)
            .agg(F.min(spec.valid_from).alias("__new_vf"))
            .select(
                F.col(spec.dim_key).alias("__dk"),
                F.col("__new_vf"),
            )
        )
        probe = F.broadcast(firsts) if broadcast_dim_batch else firsts
        affected = (
            _live(new_fact, fact_delete_col)
            .join(
                probe,
                on=(F.col(spec.fk_col) == F.col("__dk"))
                & (F.col(spec.fact_ts) >= F.col("__new_vf")),
                how="left_semi",
            )
            .select(*keys)
        )
    else:
        new_dim = state.dim_versions
        affected = spark.createDataFrame([], new_fact.select(*keys).schema)

    touched = (
        fact_batch.select(*keys).unionByName(affected).distinct()
    )
    # ``broadcast_touched=False`` for a backlog too large to ship to every
    # executor (e.g. a bulk dim backfill whose fanout is a large fraction
    # of the facts) — the semi/anti joins then shuffle, still bounded by
    # |fact| + |touched| (the same escape hatch as ivm_dag.snapshot_slice)
    probe_t = F.broadcast(touched) if broadcast_touched else touched

    # 3. recompute the touched slice only: live touched facts, AS-OF
    # against the touched dks' versions (semi-join prune keeps the version
    # side O(touched dks' history))
    slice_live = _live(
        new_fact.join(probe_t, on=keys, how="left_semi"),
        fact_delete_col,
    )
    # alias the fk probe: with dim_key == fk_col the raw on-expression
    # would be ambiguous
    fk_probe = slice_live.select(
        F.col(spec.fk_col).alias("__probe_fk")
    ).distinct()
    vers = new_dim.join(
        F.broadcast(fk_probe) if broadcast_touched else fk_probe,
        on=F.col(spec.dim_key) == F.col("__probe_fk"),
        how="left_semi",
    )
    enriched = _enrich(slice_live, vers, spec)

    # 4. patch the view: drop every touched key, add back the live
    # re-enrichments (a touched key absent from the slice was tombstoned)
    new_view = (
        state.view.join(probe_t, on=keys, how="left_anti")
        .unionByName(enriched)
    )
    return TemporalJoinState(
        fact=new_fact, dim_versions=new_dim, view=new_view
    )


def recompute_temporal_view(
    fact: DataFrame,
    dim_changes: DataFrame,
    spec: TemporalJoinSpec,
    fact_keys_order: Sequence[Column | str],
    fact_delete_col: str | None = None,
) -> DataFrame:
    """The declarative from-base recompute the maintenance must equal:
    last image per fact key, full SCD2 rebuild, one AS-OF join."""
    snap = fold_last_image(
        fact, list(spec.fact_keys),
        [F.col(c) if isinstance(c, str) else c for c in fact_keys_order],
    )
    versions = scd2_from_changelog(dim_changes, [spec.dim_key], spec.valid_from)
    return _enrich(_live(snap, fact_delete_col), versions, spec)
