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
    how: str = "left"

    def __post_init__(self) -> None:
        if self.how not in ("left", "inner"):
            raise ValueError(f"how must be left|inner, got {self.how!r}")


@dataclass
class TemporalJoinState:
    fact: DataFrame  # keyed fact snapshot, tombstones carried
    dim_versions: DataFrame  # SCD2 table (valid_from/valid_to/is_current)
    view: DataFrame  # live facts + payload, as-of enriched


# internal plumbing column names stacked onto user frames by _enrich and the
# maintenance probes; a fact/dim column with one of these names would make
# the affected-keys range probe or version prune silently ambiguous/wrong
# (ADVICE r11) — so fail fast at every entry point, like the catalog's
# __g/__k/__gbucket/__mult view_reserved check.
_RESERVED = frozenset({"__vf", "__dk", "__new_vf", "__probe_fk", "__vfm"})


def _check_reserved(spec: TemporalJoinSpec, *frames: DataFrame | None) -> None:
    for df in frames:
        if df is None:
            continue
        bad = sorted(set(df.columns) & _RESERVED)
        if bad:
            raise ValueError(
                f"column(s) {bad} collide with reserved temporal-join "
                f"internal names {sorted(_RESERVED)} — rename them before "
                "entering init_temporal_join_state/maintain_temporal_join"
            )


def _live(df: DataFrame, delete_col: str | None) -> DataFrame:
    if delete_col is None:
        return df
    return df.filter(~F.coalesce(F.col(delete_col), F.lit(False)))


def _enrich(facts: DataFrame, versions: DataFrame, spec: TemporalJoinSpec) -> DataFrame:
    """AS-OF enrich: each fact gets the payload of the latest version with
    ``valid_from <= fact_ts`` for its fk. One shuffle on the key — the
    merge-technique :func:`asof_join`, not a per-key quadratic probe.

    ``spec.how``: under ``left`` a fact with no preceding version keeps a
    NULL payload; under ``inner`` (Flink allows both spellings) the fact is
    ABSENT from the view. The distinction rides on a non-null match marker
    (``__vfm`` — the matched version's own ``valid_from``), never on the
    payload values, which may be legitimately NULL in a matched version."""
    rhs_cols = [
        F.col(spec.dim_key).alias(spec.fk_col),
        F.col(spec.valid_from).alias("__vf"),
        *[F.col(src).alias(out) for out, src in spec.payload.items()],
    ]
    value_cols = list(spec.payload)
    if spec.how == "inner":
        rhs_cols.append(F.col(spec.valid_from).alias("__vfm"))
        value_cols.append("__vfm")
    out = asof_join(
        facts,
        versions.select(*rhs_cols),
        on=spec.fk_col,
        left_ts=spec.fact_ts,
        right_ts="__vf",
        value_cols=value_cols,
        # deterministic winner among same-(key, valid_from) versions
        tiebreak_cols=list(spec.payload),
    )
    if spec.how == "inner":
        out = out.filter(F.col("__vfm").isNotNull()).drop("__vfm")
    return out


def init_temporal_join_state(
    fact: DataFrame,
    dim_changes: DataFrame,
    spec: TemporalJoinSpec,
    fact_delete_col: str | None = None,
) -> TemporalJoinState:
    """Build the state by one full pass: SCD2 table from the dim change
    history (the batch/backfill path), then one AS-OF enrichment of the
    live facts. ``fact`` must already be a keyed snapshot (≤1 row/key)."""
    _check_reserved(spec, fact, dim_changes)
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
    _check_reserved(spec, fact_batch, dim_batch, snapshot_after)
    new_state, _touched, _enriched = _temporal_round(
        state, fact_batch, dim_batch, fact_order, spec,
        fact_delete_col, broadcast_dim_batch, broadcast_touched,
        snapshot_after,
    )
    return new_state


def _temporal_round(
    state: TemporalJoinState,
    fact_batch: DataFrame | None,
    dim_batch: DataFrame | None,
    fact_order: Sequence[Column | str],
    spec: TemporalJoinSpec,
    fact_delete_col: str | None,
    broadcast_dim_batch: bool,
    broadcast_touched: bool,
    snapshot_after: DataFrame | None,
) -> tuple[TemporalJoinState, DataFrame, DataFrame]:
    """One maintenance round; returns (new state, touched fact keys,
    re-enriched live slice) so :func:`maintain_temporal_join_with_changes`
    can derive the view's own change stream without a second pass."""
    spark = state.fact.sparkSession
    keys = list(spec.fact_keys)
    ordc = [F.col(c) if isinstance(c, str) else c for c in fact_order]

    if fact_batch is None:
        fact_batch = spark.createDataFrame([], state.fact.schema)
    # 1. advance the fact snapshot (caller-merged, else the fold fallback)
    if snapshot_after is not None:
        new_fact = snapshot_after
    else:
        # r13 optimization (guide §5 lineage cut): the folded snapshot is
        # referenced by the affected-keys probe, the touched-slice
        # semi-join AND the returned state — Spark re-executes the full
        # key-shuffle fold per reference in the one lazy plan the
        # in-memory arm builds. Lazy checkpoint = fold once, reuse
        # (measured ivm_scd2_join 9.1 -> 5.7 s warm standalone). The
        # catalog/persisted paths pass snapshot_after and are unaffected.
        #
        # CAVEAT (ADVICE/VERDICT r13): unlike the k-row checkpoints
        # elsewhere, this block set is O(|fact state|) per maintenance
        # round, lives in the block manager (clearCache cannot reclaim
        # checkpointed RDDs), and — localCheckpoint being non-reliable —
        # is unrecoverable on executor loss. The in-memory fold arm is
        # therefore a SMALL-STATE arm (tests/bench scale); at cluster
        # scale callers must pass ``snapshot_after`` (the catalog paths
        # already do), which skips this branch entirely. Unpersisting the
        # previous round's blocks here is NOT safe: the returned state of
        # an earlier round may still be referenced by the caller, and a
        # truncated-lineage DF whose blocks are dropped cannot recompute.
        new_fact = fold_last_image(
            state.fact.unionByName(fact_batch), keys, ordc
        ).localCheckpoint(eager=False)

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

    # lazy checkpoint for the same reason: ``touched`` drives BOTH the
    # slice semi-join and the view anti-join (and the with_changes caller
    # reuses it again); it is batch-bounded by contract, so the stored
    # block is small
    touched = (
        fact_batch.select(*keys).unionByName(affected).distinct()
        .localCheckpoint(eager=False)
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
    return (
        TemporalJoinState(fact=new_fact, dim_versions=new_dim, view=new_view),
        touched,
        enriched,
    )


def maintain_temporal_join_with_changes(
    state: TemporalJoinState,
    fact_batch: DataFrame | None,
    dim_batch: DataFrame | None,
    fact_order: Sequence[Column | str],
    spec: TemporalJoinSpec,
    seq: int,
    fact_delete_col: str | None = None,
    broadcast_dim_batch: bool = True,
    broadcast_touched: bool = True,
    snapshot_after: DataFrame | None = None,
    seq_col: str = "__seq",
    deleted_col: str = "__deleted",
) -> tuple[TemporalJoinState, DataFrame]:
    """:func:`maintain_temporal_join` plus DELTA PROPAGATION — the view's
    own change stream for this batch in the standard changelog shape (view
    columns + ``seq_col`` + ``deleted_col``), mirroring
    :func:`..ivm_join.maintain_join_with_changes`: one upsert per touched
    key that survives in the view (its re-enriched image), one tombstone
    per touched key that does not. A key absent before AND after emits a
    redundant tombstone — harmless downstream, cheaper than re-probing the
    old view to suppress it. ``seq`` is the caller's monotonically
    increasing batch sequence. This is what makes a temporal-join model a
    COMPOSABLE node in a maintained project graph: a downstream aggregate
    consumes this stream exactly like a join node's view log."""
    _check_reserved(spec, fact_batch, dim_batch, snapshot_after)
    view_cols = list(state.view.columns)
    for c in (seq_col, deleted_col):
        if c in view_cols:
            raise ValueError(f"{c!r} collides with a view column")
    new_state, touched, enriched = _temporal_round(
        state, fact_batch, dim_batch, fact_order, spec,
        fact_delete_col, broadcast_dim_batch, broadcast_touched,
        snapshot_after,
    )
    keys = list(spec.fact_keys)
    ups = enriched.select(*view_cols).withColumn(deleted_col, F.lit(False))
    types = {f.name: f.dataType for f in state.view.schema.fields}
    gone = (
        touched.join(enriched.select(*keys), on=keys, how="left_anti")
        .select(
            *[F.col(k) for k in keys],
            *[
                F.lit(None).cast(types[c]).alias(c)
                for c in view_cols
                if c not in keys
            ],
        )
        .select(*view_cols)
        .withColumn(deleted_col, F.lit(True))
    )
    changes = ups.unionByName(gone).withColumn(
        seq_col, F.lit(seq).cast("long")
    ).select(*view_cols, seq_col, deleted_col)
    return new_state, changes


import re as _re

# the Flink temporal-table-join spelling the reference's change-stream dims
# imply (``/root/reference/README.md:104`` — a pipeline may join a fact
# stream against a versioned dimension "as of" the fact's event time):
#   SELECT f.*, d.<col> [AS name], ...
#   FROM fact f LEFT|INNER JOIN dim FOR SYSTEM_TIME AS OF f.<ts> [AS] d
#   ON f.<fk> = d.<dk>
# Both Flink spellings are supported (r13): LEFT keeps facts with no
# preceding version (NULL payload); INNER drops them from the view.
_TEMPORAL_SQL = _re.compile(
    r"^\s*select\s+(?P<items>.*?)\s+from\s+(?P<ft>[A-Za-z_][\w.]*)"
    r"(?:\s+(?:as\s+)?(?!left\b|join\b|inner\b)(?P<fa>[A-Za-z_]\w*))?\s+"
    r"(?P<how>left\s+(?:outer\s+)?join|inner\s+join|join)\s+(?P<dt>[A-Za-z_][\w.]*)\s+"
    r"for\s+system_time\s+as\s+of\s+(?P<pa>[A-Za-z_]\w*)\.(?P<pts>[A-Za-z_]\w*)"
    r"\s+(?:as\s+)?(?P<da>[A-Za-z_]\w*)\s+"
    r"on\s+(?P<cond>.+?)\s*;?\s*$",
    _re.IGNORECASE | _re.DOTALL,
)
_TEMPORAL_EQ = _re.compile(
    r"^\s*([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s*=\s*([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s*$"
)
_TEMPORAL_PAYLOAD = _re.compile(
    r"^([A-Za-z_]\w*)\.([A-Za-z_]\w*)(?:\s+as\s+([A-Za-z_]\w*))?$",
    _re.IGNORECASE,
)


def temporal_spec_from_sql(
    sql: str, fact_keys: Sequence[str], valid_from: str
) -> tuple[TemporalJoinSpec, str, str]:
    """Parse the supported temporal-join shape (above) into a
    :class:`TemporalJoinSpec` plus the (fact, dim) table names — the SQL
    front door that makes the SCD2-temporal arm a node kind in
    ``catalog.activate_project_incremental``, the twin of
    ``ivm_join.join_spec_from_sql``. Anything outside the provable shape
    raises ``ValueError``. ``fact_keys`` come from the fact stream's
    declared ``primary_key``; ``valid_from`` is the dim change stream's
    version-start column (the catalog defaults it to the dim's watermark
    column — the versioning is a property of the dim STREAM, not of the
    query, exactly Flink's versioned-table stance)."""
    m = _TEMPORAL_SQL.match(sql)
    if not m:
        raise ValueError(f"unsupported temporal-join SQL shape: {sql!r}")
    how = "left" if m.group("how").lower().startswith("left") else "inner"
    ft, dt = m.group("ft"), m.group("dt")
    fa = m.group("fa") or ft
    da = m.group("da")
    if m.group("pa") != fa:
        raise ValueError(
            f"FOR SYSTEM_TIME AS OF must probe the fact alias {fa!r}, "
            f"got {m.group('pa')!r}"
        )
    em = _TEMPORAL_EQ.match(m.group("cond"))
    if not em:
        raise ValueError(
            "temporal ON clause must be a single fact-key = dim-key "
            f"equality: {m.group('cond')!r}"
        )
    a_tbl, a_col, b_tbl, b_col = em.groups()
    if a_tbl == fa and b_tbl == da:
        fk, dk = a_col, b_col
    elif a_tbl == da and b_tbl == fa:
        fk, dk = b_col, a_col
    else:
        raise ValueError(
            f"ON clause references unknown alias: {m.group('cond')!r} "
            f"(fact={fa!r}, dim={da!r})"
        )
    from dbt_decodable_spark.operators.ivm import _split_items

    star_seen = False
    payload: dict[str, str] = {}
    for item in _split_items(m.group("items")):
        if item == f"{fa}.*":
            star_seen = True
            continue
        pm = _TEMPORAL_PAYLOAD.match(item)
        if pm and pm.group(1) == da:
            out_name = pm.group(3) or pm.group(2)
            if out_name in payload:
                raise ValueError(
                    f"duplicate output name {out_name!r} in select list"
                )
            payload[out_name] = pm.group(2)
            continue
        raise ValueError(
            f"unsupported select item: {item!r} — the maintainable shape "
            f"is {fa}.* plus {da}.<col> [AS name] items"
        )
    if not star_seen:
        raise ValueError(
            f"select list must carry {fa}.* — the view is keyed by the "
            "fact's primary key and carries its full image"
        )
    spec = TemporalJoinSpec(
        fact_keys=tuple(fact_keys),
        fk_col=fk,
        dim_key=dk,
        fact_ts=m.group("pts"),
        valid_from=valid_from,
        payload=payload,
        how=how,
    )
    return spec, ft, dt


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
