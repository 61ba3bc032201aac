"""Incremental view maintenance for enrichment (lookup) JOIN views over
keyed change streams on BOTH sides.

The reference platform's pipelines are continuously maintained SQL
materializations (``decodable/client/schema.py:109-111`` change-stream
semantics; ``dbt/adapters/decodable/handler.py:89-94`` last-image fold),
and its canonical multi-input pipeline is the *lookup join* — a fact
stream enriched by a dimension, both of which can change. The aggregate
half of that execution model is ``operators/ivm.py``; this module is the
join half: a materialized ``fact ⟕ dim`` (or inner) view, keyed by the
fact's primary key, kept current by touched-key partial recompute instead
of re-running the join.

Maintenance per micro-batch (ΔF = fact changes, ΔD = dim changes):

1. both snapshots advance via the bucketed keyed MERGE
   (:func:`dbt_decodable_spark.streaming.changelog.merge_changes_keyed`);
2. the *touched* view keys are (a) fact keys whose image actually changed
   (:func:`~dbt_decodable_spark.streaming.changelog.change_pairs`,
   ``__changed`` — stale out-of-order batch rows touch nothing) and
   (b) live fact rows whose foreign key references a changed dim key —
   located by a broadcast semi-join of the batch-sized changed-dim-key set
   against the fact;
3. the view rows for exactly those keys are recomputed by joining the
   touched fact slice against the new dim image, and spliced in with an
   anti-join + union.

Cost model per batch (the 100 TB argument), with fact snapshot, dim
snapshot and the view all bucketed on their keys:

- the two snapshot MERGEs shuffle O(|ΔF|) and O(|ΔD|) (state sides plan
  with no Exchange — the ``merge_changes_keyed`` contract);
- the dim-fanout locate is a broadcast semi-join (no fact shuffle; the
  scan itself is the linear term — at 100 TB lay the fact out clustered
  by the fk and let the zone map skip files:
  ``operators/zonemap.prune_for_join`` takes exactly this changed-key set);
- the patch join shuffles only the touched fact slice (dim side broadcast
  by default — the lookup-join shape; disable for big dims and bucket
  both sides on the fk instead);
- the view splice's anti-join is state-side shuffle-free on a bucketed
  view (plan-pinned in ``tests/test_ivm_join.py``), so the view rewrite
  shuffles O(|touched|).

Total: O(|ΔF| + |ΔD| + fact rows referencing changed dim keys) — the
dim-update fan-out is the irreducible write amplification of maintaining
a denormalized view; everything else is batch-sized. A recompute is
O(|fact| + |dim|) every batch.

Delete semantics (same tombstone contract as the rest of the changelog
machinery): a tombstoned fact row leaves the view; a tombstoned dim row
null-extends its facts under ``how="left"`` and removes them under
``how="inner"`` — both fall out of the recompute-touched-keys rule, no
special cases.

Pipelines stack: :func:`maintain_join_with_changes` additionally emits the
view's OWN change stream (upserts + tombstones with a batch sequence
order), so a downstream maintained operator — an aggregate view via
:func:`operators.ivm.maintain`, another join, an SCD2 build — composes on
the enriched stream without reading the base tables, exactly how the
reference platform chains pipelines.
"""

from __future__ import annotations

import re
from collections.abc import Sequence
from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

from dbt_decodable_spark.operators.ivm import change_pairs
from dbt_decodable_spark.streaming.changelog import merge_changes_keyed

# internal sentinel columns a maintenance round stacks onto the fact slice
# (liveness flag, dim-match flag, tombstone flag) — a fact column or payload
# output with one of these names would duplicate-select or be silently
# overwritten, so _round rejects them up front (the ``__dk`` aliases are
# collision-proof by construction in _dim_side)
_RESERVED = frozenset({"__alive", "__dead", "__dmatch"})


@dataclass(frozen=True)
class JoinViewSpec:
    """Supported view shape: ``SELECT f.<cols...>, <payload> FROM fact f
    LEFT|INNER JOIN dim d ON f.<fk_cols> = d.<dim_keys>``.

    ``fact_keys`` is the fact's primary key (the view's key — one view row
    per live fact row under ``left``). ``fk_cols`` (on the fact) pair up
    positionally with ``dim_keys`` (the dim's primary key). ``dim_payload``
    maps *view output column name* → *dim column*; output names must not
    collide with fact columns. NULL foreign keys never match (standard SQL
    join semantics) — under ``left`` they null-extend, under ``inner`` the
    row is absent; identical in recompute and maintenance paths."""

    fact_keys: tuple[str, ...]
    fk_cols: tuple[str, ...]
    dim_keys: tuple[str, ...]
    dim_payload: dict[str, str] = field(default_factory=dict)
    how: str = "left"

    def __post_init__(self) -> None:
        if self.how not in ("left", "inner"):
            raise ValueError(f"how must be left|inner, got {self.how!r}")
        if len(self.fk_cols) != len(self.dim_keys):
            raise ValueError(
                f"fk_cols {self.fk_cols} and dim_keys {self.dim_keys} must "
                "pair up positionally"
            )
        if not self.dim_payload:
            raise ValueError("dim_payload is empty — nothing to enrich with")
        for out in self.dim_payload:
            if out in _RESERVED:
                raise ValueError(
                    f"payload name {out!r} collides with a maintenance "
                    f"sentinel column (reserved: {sorted(_RESERVED)})"
                )


@dataclass(frozen=True)
class JoinViewState:
    """Maintenance state: both keyed snapshots plus the materialized view
    (keyed by ``fact_keys``). Persist each bucketed on its key
    (``operators/bucketing.py``) for the shuffle-free state-side plans."""

    fact: DataFrame
    dim: DataFrame
    view: DataFrame


def _live(df: DataFrame, delete_col: str | None) -> DataFrame:
    if delete_col is None:
        return df
    return df.filter(~F.coalesce(F.col(delete_col), F.lit(False)))


def _fact_out_cols(
    fact_cols: list[str],
    delete_col: str | None,
    hidden: Sequence[str] = (),
) -> list[str]:
    """View-output projection of the fact columns: the tombstone flag and
    any ``hidden`` metadata columns (e.g. the upstream change log's order
    column when the fact side IS another node's change stream) stay in the
    STATE — merges fold by them — but never reach the view."""
    drop = {delete_col, *hidden}
    return [c for c in fact_cols if c not in drop]


def _dim_side(dim: DataFrame, spec: JoinViewSpec, dim_delete_col: str | None) -> DataFrame:
    """Live dim projected to aliased join keys + payload outputs. Key
    aliases are positional (``__dk{i}``) so fact columns can never clash."""
    for out in spec.dim_payload:
        if out.startswith("__dk"):
            raise ValueError(f"payload name {out!r} collides with key alias")
    cols = [F.col(k).alias(f"__dk{i}") for i, k in enumerate(spec.dim_keys)]
    cols += [F.col(src).alias(out) for out, src in spec.dim_payload.items()]
    return _live(dim, dim_delete_col).select(*cols)


def _fk_cond(f: DataFrame, d: DataFrame, spec: JoinViewSpec) -> Column:
    return reduce(
        lambda a, b: a & b,
        [f[fk] == d[f"__dk{i}"] for i, fk in enumerate(spec.fk_cols)],
    )


def _joined(
    f: DataFrame,
    d: DataFrame,
    spec: JoinViewSpec,
    out_fact: list[str],
) -> DataFrame:
    j = f.join(d, _fk_cond(f, d, spec), spec.how)
    return j.select(
        *[f[c].alias(c) for c in out_fact],
        *[F.col(o) for o in spec.dim_payload],
    )


def compute_join_view(
    fact: DataFrame,
    dim: DataFrame,
    spec: JoinViewSpec,
    fact_delete_col: str | None = None,
    dim_delete_col: str | None = None,
    fact_hidden_cols: Sequence[str] = (),
) -> DataFrame:
    """Full recompute of the view — initialization and the ground truth
    the incremental path is tested against. Output columns: the fact's
    (minus its tombstone flag and any ``fact_hidden_cols`` state-only
    metadata), then the payload outputs in spec order."""
    for out in spec.dim_payload:
        if out in fact.columns:
            raise ValueError(f"payload name {out!r} collides with a fact column")
    f = _live(fact, fact_delete_col)
    d = _dim_side(dim, spec, dim_delete_col)
    return _joined(
        f, d, spec,
        _fact_out_cols(fact.columns, fact_delete_col, fact_hidden_cols),
    )


def init_join_state(
    fact: DataFrame,
    dim: DataFrame,
    spec: JoinViewSpec,
    fact_delete_col: str | None = None,
    dim_delete_col: str | None = None,
) -> JoinViewState:
    """Build maintenance state by one full join over the snapshots."""
    return JoinViewState(
        fact=fact,
        dim=dim,
        view=compute_join_view(fact, dim, spec, fact_delete_col, dim_delete_col),
    )


def _round(
    state: JoinViewState,
    fact_changes: DataFrame,
    dim_changes: DataFrame,
    fact_order: list,
    dim_order: list,
    spec: JoinViewSpec,
    fact_delete_col: str | None,
    dim_delete_col: str | None,
    broadcast_dim: bool,
    fact_hidden_cols: Sequence[str] = (),
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame, DataFrame, DataFrame]:
    """One maintenance round's shared plan set: (fact_new, dim_new,
    touched_keys, patch, view_new, emitted) — ``emitted`` carries every
    touched key exactly once with its recomputed view image and a
    ``__dead`` flag (the delta-propagation core, nulled payload on dead
    keys).

    The core scale decision lives here: the MERGED fact is never re-probed.
    ``merge_changes_keyed``'s winner projection extracts fields out of a
    CASE-of-structs, which destroys output-partitioning propagation — any
    key-join against the merged frame re-shuffles O(|fact|). Instead the
    touched slice is assembled from the two places it already exists:

    - ΔF-touched keys take their post-merge image straight from
      ``change_pairs`` (``__new`` of the changed rows — batch-sized, no
      fact scan beyond the pairs probe);
    - dim-fanout keys (referencing a changed dim key but NOT in ΔF) take
      their image from the OLD bucketed snapshot, which this batch does
      not change for those keys — a broadcast semi-join locate plus a
      broadcast anti-join against the batch-sized ΔF key set, so the
      bucketed fact scan planes with NO Exchange above it (plan-pinned).

    The two slices are disjoint by construction (the anti-join) and each
    carries ≤1 row per key, so the slice is key-unique — no distinct.
    Everything downstream (patch, view splice, upserts AND tombstones)
    derives from ONE left join of that slice against the new dim image:
    a single evaluation of the emitted stream runs the fact scans once,
    where the earlier shape (separate patch recompute for the tombstone
    anti-join) ran them per branch — measured 14.9 s → see SCALING.md at
    a 10M-row fact, where the map-side scans are the whole cost.
    """
    fkeys = list(spec.fact_keys)
    if not fkeys:
        raise ValueError(
            "spec.fact_keys is empty — maintenance joins on the fact's "
            "primary key (join_spec_from_sql deliberately builds a keyless "
            "placeholder; fill fact_keys via dataclasses.replace before "
            "maintaining)"
        )
    dkeys = list(spec.dim_keys)
    fact_cols = list(state.fact.columns)
    # payload outputs are already rejected at spec construction
    # (__post_init__); only the fact frame's columns can smuggle one in
    bad = sorted(c for c in fact_cols if c in _RESERVED)
    if bad:
        raise ValueError(
            f"fact column name(s) {bad} collide with maintenance sentinel "
            f"columns (reserved: {sorted(_RESERVED)})"
        )
    out_fact = _fact_out_cols(fact_cols, fact_delete_col, fact_hidden_cols)

    fact_new = merge_changes_keyed(state.fact, fact_changes, fkeys, fact_order)
    dim_new = merge_changes_keyed(state.dim, dim_changes, dkeys, dim_order)

    # ΔF-touched: keys whose image actually changed (stale rows touch
    # nothing), with the winning post-merge image AND liveness carried
    pairs = change_pairs(state.fact, fact_changes, fkeys, fact_order)
    changed = pairs.filter(F.col("__changed"))
    new_alive = F.col("__new").isNotNull()
    if fact_delete_col is not None:
        new_alive = new_alive & ~F.coalesce(
            F.col("__new").getField(fact_delete_col), F.lit(False)
        )
    slice_f = changed.select(
        *[F.col("__new").getField(c).alias(c) for c in fact_cols],
        new_alive.alias("__alive"),
    )

    # dim-fanout: OLD-snapshot live facts referencing a changed dim key,
    # minus the ΔF-touched keys (whose image the snapshot no longer owns).
    # Both build sides are batch-sized → explicit broadcasts, so the
    # bucketed snapshot scan stays Exchange-free deterministically.
    dp = change_pairs(state.dim, dim_changes, dkeys, dim_order)
    changed_d = F.broadcast(
        dp.filter(F.col("__changed")).select(
            *[F.col(k).alias(f"__dk{i}") for i, k in enumerate(dkeys)]
        )
    )
    live_old = _live(state.fact, fact_delete_col)
    referencing = live_old.join(
        changed_d, _fk_cond(live_old, changed_d, spec), "left_semi"
    )
    fanout_rows = referencing.join(
        F.broadcast(changed.select(*fkeys)), on=fkeys, how="left_anti"
    ).withColumn("__alive", F.lit(True))

    sl = slice_f.unionByName(fanout_rows)
    touched = sl.select(*fkeys)

    # ONE left join of the slice against the new dim image decides
    # everything: upsert vs tombstone, payload vs null-extension
    d_side = _dim_side(dim_new, spec, dim_delete_col).withColumn(
        "__dmatch", F.lit(True)
    )
    if broadcast_dim:
        d_side = F.broadcast(d_side)
    j = sl.join(d_side, _fk_cond(sl, d_side, spec), "left")
    alive_out = F.col("__alive")
    if spec.how == "inner":
        alive_out = alive_out & F.coalesce(F.col("__dmatch"), F.lit(False))
    view_cols = [*out_fact, *spec.dim_payload]
    emitted = j.select(
        *[sl[k].alias(k) for k in fkeys],
        *[
            F.when(alive_out, sl[c] if c in out_fact else F.col(c)).alias(c)
            for c in view_cols
            if c not in fkeys
        ],
        (~alive_out).alias("__dead"),
    )
    patch = emitted.filter(~F.col("__dead")).select(*view_cols)

    # splice: drop every touched key from the old view (dead facts simply
    # contribute no patch row), append the recomputed rows. State-side
    # shuffle-free on a fact_keys-bucketed view.
    view_new = state.view.join(touched, on=fkeys, how="left_anti").unionByName(patch)
    return fact_new, dim_new, touched, patch, view_new, emitted


def maintain_join(
    state: JoinViewState,
    fact_changes: DataFrame,
    dim_changes: DataFrame,
    fact_order: list,
    dim_order: list,
    spec: JoinViewSpec,
    fact_delete_col: str | None = None,
    dim_delete_col: str | None = None,
    broadcast_dim: bool = True,
    fact_hidden_cols: Sequence[str] = (),
) -> JoinViewState:
    """Advance the view by one micro-batch of keyed changes on either or
    both sides.

    ``fact_order`` / ``dim_order`` are the per-side winner order tuples of
    the keyed MERGE contract (non-null, include a unique tie-breaker; ties
    go to the batch). Convergence under arbitrary micro-batch
    splits/reorders follows from both snapshots converging (the MERGE's
    associative fold) plus the view being a pure function of the snapshots
    — hypothesis-tested in ``tests/test_ivm_join.py``.

    ``broadcast_dim`` hints the dim side of the patch join (the lookup-join
    shape — dims are small relative to facts); disable for a dim too big
    to broadcast and co-bucket fact and dim on the fk instead.
    """
    fact_new, dim_new, _touched, _patch, view_new, _emitted = _round(
        state, fact_changes, dim_changes, fact_order, dim_order, spec,
        fact_delete_col, dim_delete_col, broadcast_dim, fact_hidden_cols,
    )
    return JoinViewState(fact=fact_new, dim=dim_new, view=view_new)


def maintain_join_with_changes(
    state: JoinViewState,
    fact_changes: DataFrame,
    dim_changes: DataFrame,
    fact_order: list,
    dim_order: list,
    spec: JoinViewSpec,
    seq: int,
    fact_delete_col: str | None = None,
    dim_delete_col: str | None = None,
    broadcast_dim: bool = True,
    seq_col: str = "__seq",
    deleted_col: str = "__deleted",
    fact_hidden_cols: Sequence[str] = (),
) -> tuple[JoinViewState, DataFrame]:
    """:func:`maintain_join` plus DELTA PROPAGATION: also returns the view's
    own change stream for this batch, in the standard changelog shape
    (view columns + ``seq_col`` order column + ``deleted_col`` tombstone
    flag), so a downstream incrementally-maintained operator — an aggregate
    view over the enriched facts (:func:`operators.ivm.maintain`), another
    join, an SCD2 build — can stack on top without ever seeing the base
    tables. This is the multi-operator pipeline the reference platform
    runs: each pipeline's output stream is the next pipeline's input
    (``decodable/client/schema.py:109-111`` change streams compose).

    ``seq`` is the caller's monotonically increasing batch sequence number
    (the micro-batch id in a ``foreachBatch`` driver) — it becomes the
    downstream MERGE's order column, so downstream convergence inherits
    this stream's batch order.

    Emitted rows: one upsert per touched key that survives in the view
    (its recomputed image — the splice's own patch frame, not a re-probe),
    one tombstone per touched key that does not. A key that was absent
    before AND after (e.g. a stale tombstone arriving for an unknown fact)
    emits a redundant tombstone — harmless downstream (no old image to
    retract, nothing to add), and cheaper than re-probing the old view to
    suppress it.
    """
    fact_new, dim_new, _touched, _patch, view_new, emitted = _round(
        state, fact_changes, dim_changes, fact_order, dim_order, spec,
        fact_delete_col, dim_delete_col, broadcast_dim, fact_hidden_cols,
    )
    for c in (seq_col, deleted_col):
        if c in emitted.columns and c != "__dead":
            raise ValueError(f"{c!r} collides with a view column")
    changes = emitted.select(
        *[c for c in emitted.columns if c != "__dead"],
        F.lit(seq).cast("long").alias(seq_col),
        F.col("__dead").alias(deleted_col),
    )
    return (
        JoinViewState(fact=fact_new, dim=dim_new, view=view_new),
        changes,
    )


# the alias groups need keyword lookaheads: without one, an alias-less
# "FROM orders LEFT JOIN ..." lets the optional fact alias swallow LEFT and
# the join parses as INNER — a silent semantics flip, not a parse error
_JOIN_SQL = re.compile(
    r"^\s*select\s+(?P<items>.*?)\s+from\s+(?P<ft>[A-Za-z_][\w.]*)"
    r"(?:\s+(?:as\s+)?(?!left\b|inner\b|join\b|on\b)(?P<fa>[A-Za-z_]\w*))?\s+"
    r"(?P<how>left\s+(?:outer\s+)?join|inner\s+join|join)\s+"
    r"(?P<dt>[A-Za-z_][\w.]*)"
    r"(?:\s+(?:as\s+)?(?!on\b)(?P<da>[A-Za-z_]\w*))?\s+"
    r"on\s+(?P<cond>.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_EQ = re.compile(
    r"^\s*([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s*=\s*([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s*$"
)
_PAYLOAD = re.compile(
    r"^([A-Za-z_]\w*)\.([A-Za-z_]\w*)(?:\s+as\s+([A-Za-z_]\w*))?$",
    re.IGNORECASE,
)


def join_spec_from_sql(sql: str, fact_keys: Sequence[str]) -> tuple[JoinViewSpec, str, str]:
    """Parse the supported join-view shape — ``SELECT f.*, d.<col> [AS
    name], ... FROM fact f [LEFT] JOIN dim d ON f.<fk> = d.<pk> [AND ...]``
    — into a :class:`JoinViewSpec` plus the (fact, dim) table names. The
    SQL front door for continuously-maintained enrichment pipelines, the
    twin of :func:`operators.ivm.agg_spec_from_sql`: anything outside the
    provable shape (WHERE, expressions, more than two tables, non-equi ON)
    raises — this parses the pipelines whose maintenance we can prove, not
    general SQL. ``fact_keys`` come from the fact stream's declared
    ``primary_key`` (the view's key is the fact's, never inferable from
    the SQL)."""
    m = _JOIN_SQL.match(sql)
    if not m:
        raise ValueError(f"unsupported join-view SQL shape: {sql!r}")
    ft, dt = m.group("ft"), m.group("dt")
    fa = m.group("fa") or ft
    da = m.group("da") or dt
    how = "left" if m.group("how").lower().startswith("left") else "inner"
    fks: list[str] = []
    dks: list[str] = []
    for clause in re.split(r"\s+and\s+", m.group("cond"), flags=re.IGNORECASE):
        em = _EQ.match(clause)
        if not em:
            raise ValueError(f"unsupported ON clause (equi-conjunction only): {clause!r}")
        a_tbl, a_col, b_tbl, b_col = em.groups()
        if a_tbl == fa and b_tbl == da:
            fks.append(a_col)
            dks.append(b_col)
        elif a_tbl == da and b_tbl == fa:
            fks.append(b_col)
            dks.append(a_col)
        else:
            raise ValueError(
                f"ON clause references unknown alias: {clause!r} "
                f"(fact={fa!r}, dim={da!r})"
            )
    star_seen = False
    payload: dict[str, str] = {}
    for item in _split_select_items(m.group("items")):
        if item == f"{fa}.*":
            star_seen = True
            continue
        pm = _PAYLOAD.match(item)
        if pm and pm.group(1) == da:
            out_name = pm.group(3) or pm.group(2)
            if out_name in payload:
                # silently keeping the last writer would drop the user's
                # other enrichment — outside-the-shape inputs must raise
                raise ValueError(
                    f"duplicate output name {out_name!r} in select list"
                )
            payload[out_name] = pm.group(2)
            continue
        raise ValueError(
            f"unsupported select item: {item!r} — the maintainable shape is "
            f"{fa}.* plus {da}.<col> [AS name] items"
        )
    if not star_seen:
        raise ValueError(
            f"select list must carry {fa}.* — the view is keyed by the "
            "fact's primary key and carries its full image"
        )
    spec = JoinViewSpec(
        fact_keys=tuple(fact_keys),
        fk_cols=tuple(fks),
        dim_keys=tuple(dks),
        dim_payload=payload,
        how=how,
    )
    return spec, ft, dt


def _split_select_items(items: str) -> list[str]:
    from dbt_decodable_spark.operators.ivm import _split_items

    return _split_items(items)
