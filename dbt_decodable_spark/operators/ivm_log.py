"""Merge-on-read persistence for incremental view maintenance.

``operators/ivm.py`` maintains a GROUP BY materialization with O(|batch|)
SHUFFLE — but rewriting the state tables per micro-batch still costs
O(|state|) write I/O, and even a shuffle-free bucketed merge SCANS every
state file (measured in SCALING.md's IVM probe). This module removes both:
a maintenance step only APPENDS — one small counter-delta file per state
table per batch — and readers fold base + pending deltas. The durable
O(|state|) work happens only at compaction, amortized over many batches.
This is the LSM shape every lakehouse streaming-aggregate engine uses, and
the continuous-materialization behavior of the reference platform's
pipelines (``dbt/adapters/decodable/handler.py:89-94`` change-stream fold;
the adapter's rejected ``incremental`` materialization) re-expressed over
Spark + parquet.

Layout under one view root::

    root/agg/v=NNNNNNNN/          aggregate-state generations (atomic,
                                  _SUCCESS-gated, partitioned by __gbucket,
                                  carrying _ivm_meta.json)
    root/agg.__deltas__/delta-*   counter/extreme delta files
    root/sup_<col>/v=.../         support-table generations (same shape)
    root/sup_<col>.__deltas__/

Why counter deltas need machinery last-image deltas don't: the CDC delta
log (``streaming/changelog.py``) is safe to re-fold — winners are decided
by the data's order tuple, so folding a delta twice is idempotent. Counter
deltas are NOT idempotent: folding one twice double-counts. Three
mechanisms restore the same safety:

- **Watermarked generations.** Each generation's ``_ivm_meta.json`` records
  the highest delta sequence folded into it; readers use the latest
  generation plus only deltas with seq > watermark. Compaction publishes
  the new generation ATOMICALLY (stage → rename, the ``versions.py``
  protocol) before vacuuming — a crash between the two leaves stale deltas
  that every reader skips by watermark, so re-folding can never happen.
- **Sequence anchoring.** ``append_delta`` numbers deltas max(existing)+1,
  so vacuuming everything would reset sequences below the watermark and
  readers would skip live data. Compaction therefore always KEEPS the
  highest-sequence delta as a floor (vacuumed by a later compaction once a
  higher one exists).
- **Exactly-once appends.** The batch tag (``foreachBatch`` batch_id)
  dedupes replays at two levels: ``append_delta``'s committed-tag check
  while the delta is pending, and the generation's ``max_tag`` after it was
  compacted away. Tags must be monotonically increasing integers per view —
  exactly what Structured Streaming provides; with non-integer tags only
  the first level applies (documented, not hidden).

Ordering contract (same reason the counter arithmetic exists at all): call
:func:`ivm_log_append` with the snapshot image the batch is about to merge
into, BEFORE advancing the snapshot. On crash-replay the append no-ops by
tag and the snapshot merge is idempotent by its own contract; the reverse
order would replay the batch against an already-merged snapshot and
compute zero contributions, silently losing the batch from the view.

Concurrent readers vs vacuum: a reader resolves a generation and lazily
opens delta files later, so deltas (and old generations) are reclaimed only
past a retention horizon (``vacuum_horizon_seconds`` / ``keep_gens``) —
the same snapshot-isolation-by-retention stance as ``vacuum_versions``.

Single maintainer per view: counter deltas are computed against
snapshot-before and support-before, so appends for one view must be
sequential (a streaming query's foreachBatch is). The underlying commit
protocol still tolerates a concurrent duplicate replay (tags).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from dbt_decodable_spark.operators.ivm import (
    GKEY,
    SKEY,
    AggViewSpec,
    _contributions,
    _counter_delta,
    _ext_aggs,
    _support_delta,
    change_pairs,
    init_state,
)
from dbt_decodable_spark.operators.versions import (
    _vdir,
    list_versions,
    require_success_marker,
)
from dbt_decodable_spark.streaming.changelog import (
    _compaction_lock,
    append_delta,
    list_deltas,
)

META_NAME = "_ivm_meta.json"
BUCKET = "__gbucket"


# ------------------------------------------------------------ table paths


def _agg_root(root: str) -> str:
    return os.path.join(root.rstrip("/"), "agg")


def _sup_root(root: str, c: str) -> str:
    return os.path.join(root.rstrip("/"), f"sup_{c}")


def _counter_cols(spec: AggViewSpec) -> list[str]:
    cols = ["__cnt"]
    for c in spec.delta_cols():
        cols += [f"__sum_{c}", f"__nn_{c}"]
    return cols


def _ext_state_cols(spec: AggViewSpec) -> list[str]:
    return [e for c in spec.support_cols() for e in spec.ext_cols(c)]


def _with_bucket(df: DataFrame, meta: dict, key: str) -> DataFrame:
    """Attach the partition-directory column. ``bucket_expr`` (stored in the
    generation meta, SQL over the group struct ``__g``) is the same layout
    lever as ``write_hash_partitioned``'s ``partition_expr``: the default
    hash form gives uniform directory sizes but scatters correlated groups
    across every directory, while a range/entity-aligned expression (e.g.
    ``__g.tenant`` or ``__g.day div 7``) keeps a locality-bearing batch's
    touched groups in a few directories — measured in SCALING.md's IVM
    probe. Must be a pure function of ``__g`` and is fixed at init."""
    expr = F.expr(meta["bucket_expr"])
    if key == GKEY:
        return df.withColumn(BUCKET, expr)
    return (
        df.withColumn(GKEY, F.col(key).getField("g"))
        .withColumn(BUCKET, expr)
        .drop(GKEY)
    )


def _delta_seq(path: str) -> int:
    return int(os.path.basename(path).split("-")[1])


# ------------------------------------------------- generation commit/read


def _publish_gen(
    df: DataFrame, table_root: str, meta: dict, stale_stage_seconds: float = 3600.0
) -> int:
    """Stage-then-rename generation commit (the ``versions.publish_version``
    protocol) with two IVM extras: the data is directory-partitioned by
    ``__gbucket`` (append-time slice pruning) and ``_ivm_meta.json`` is
    written INTO the stage so meta commits atomically with the data."""
    import errno

    table_root = table_root.rstrip("/")
    os.makedirs(table_root, exist_ok=True)
    now = time.time()
    for d in os.listdir(table_root):
        p = os.path.join(table_root, d)
        if d.startswith("v=") and not os.path.exists(os.path.join(p, "_SUCCESS")):
            shutil.rmtree(p, ignore_errors=True)
        elif d.startswith("stage-"):
            try:
                if now - os.path.getmtime(p) > stale_stage_seconds:
                    shutil.rmtree(p, ignore_errors=True)
            except OSError:
                pass
    stage = os.path.join(table_root, f"stage-{uuid.uuid4().hex}")
    df.repartition(BUCKET).write.partitionBy(BUCKET).parquet(stage)
    require_success_marker(stage)
    # a zero-row partitioned write leaves no part files and hence no
    # parquet schema (the empty-view init case) — persist the schema in
    # the meta document so readers can materialize the empty table
    with open(os.path.join(stage, META_NAME), "w") as fh:
        json.dump({**meta, "schema": df.schema.json()}, fh)
    while True:
        versions = list_versions(table_root)
        n = (versions[-1] + 1) if versions else 0
        try:
            os.rename(stage, _vdir(table_root, n))
            return n
        except OSError as e:
            if e.errno not in (errno.EEXIST, errno.ENOTEMPTY):
                shutil.rmtree(stage, ignore_errors=True)
                raise


def _latest_gen(table_root: str) -> tuple[str, dict]:
    versions = list_versions(table_root)
    if not versions:
        raise FileNotFoundError(f"no committed generations under {table_root}")
    gdir = _vdir(table_root, versions[-1])
    with open(os.path.join(gdir, META_NAME)) as fh:
        return gdir, json.load(fh)


def _read_gen(spark: SparkSession, gdir: str, meta: dict) -> DataFrame:
    """Read a generation; a zero-row one (no partition dirs, hence no
    parquet footers) materializes as an empty DataFrame from the schema
    stored in its meta document."""
    if any(d.startswith(f"{BUCKET}=") for d in os.listdir(gdir)):
        return spark.read.parquet(gdir)
    from pyspark.sql.types import StructType

    return spark.createDataFrame([], StructType.fromJson(json.loads(meta["schema"])))


def _pending(table_root: str, watermark: int) -> list[tuple[int, str]]:
    """Committed deltas newer than the generation's watermark, seq order."""
    return [
        (s, p)
        for p in list_deltas(table_root)
        if (s := _delta_seq(p)) > watermark
    ]


def _fold(
    spark: SparkSession,
    table_root: str,
    key: str,
    counter_cols: Sequence[str],
    ext_cols: Sequence[str],
    base_filter: Column | None = None,
) -> DataFrame:
    """base(latest generation) ∪ deltas(seq > watermark) folded to one row
    per key: counters sum; extremes last-writer-wins by delta sequence
    (every delta row carries ABSOLUTE extremes for its group, recomputed at
    append time). Rows whose primary counter folds to ≤0 disappear.
    ``base_filter`` prunes the generation read (partition directories)."""
    gdir, meta = _latest_gen(table_root)
    base = _read_gen(spark, gdir, meta)
    if base_filter is not None:
        base = base.filter(base_filter)
    cols = [key, *counter_cols, *ext_cols]
    view = base.select(*cols).withColumn("__eseq", F.lit(-1).cast("long"))
    for seq, p in _pending(table_root, meta["watermark"]):
        d = spark.read.parquet(p).select(*cols)
        view = view.unionByName(d.withColumn("__eseq", F.lit(seq).cast("long")))
    aggs: list[Column] = [F.sum(c).alias(c) for c in counter_cols]
    if ext_cols:
        aggs.append(
            F.max_by(F.struct(*ext_cols), F.col("__eseq")).alias("__ext")
        )
    folded = view.groupBy(key).agg(*aggs).filter(F.col(counter_cols[0]) > 0)
    if ext_cols:
        folded = folded.select(
            key, *counter_cols, *[F.col(f"__ext.{e}").alias(e) for e in ext_cols]
        )
    return folded


def _collect_touched_buckets(touched: DataFrame, meta: dict) -> list:
    """The touched groups' distinct partition-bucket values — ONE Spark
    action that doubles as the batch emptiness probe (an empty list ⇔ no
    touched group ⇔ zero contributions), so callers that need the bucket
    prune don't pay a separate ``isEmpty`` job (r12 — the emitting
    stages' fixed per-batch action count)."""
    return [
        r[0]
        for r in touched.select(F.expr(meta["bucket_expr"]).alias("b"))
        .distinct()
        .collect()
    ]


def _bucket_filter(tbuckets: list) -> Column:
    """Partition-directory prune for the touched groups' state slice —
    shared by the state-append and emission paths (the same fix must land
    on both). NULL-safe: a custom ``bucket_expr`` over a nullable group
    field buckets the NULL group into a NULL partition value, and plain
    ``isin()`` never matches NULL (SQL IN semantics) — without the isNull
    arm the group's compacted base rows would silently drop out of the
    extreme recompute."""
    non_null = [b for b in tbuckets if b is not None]
    bf = F.col(BUCKET).isin(non_null) if non_null else F.lit(False)
    if len(non_null) < len(tbuckets):
        bf = bf | F.col(BUCKET).isNull()
    return bf


def _tag_in_log(table_root: str, tag) -> bool:
    """True when ``table_root`` already carries this batch's delta — folded
    into the latest generation (integer ``tag`` ≤ ``max_tag``) or still
    pending as a committed ``delta-<seq>-<tag>`` directory. The spliced
    ``_ext_recompute`` paths use this to recognize a crash replay whose
    support deltas already landed: ``_fold`` reads the landed delta, so
    splicing the batch's support contributions in AGAIN would double them —
    a doubled ``-1`` can drive a (group, value) support count from net 1 to
    0 and drop a still-present value from the extreme recompute (ADVICE
    r12)."""
    if tag is None:
        return False
    _, tmeta = _latest_gen(table_root)
    if tmeta["max_tag"] is not None:
        try:
            if int(tag) <= int(tmeta["max_tag"]):
                return True
        except (TypeError, ValueError):
            pass
    stag = str(tag)
    for p in list_deltas(table_root):
        parts = os.path.basename(p).split("-", 2)
        if len(parts) == 3 and parts[2] == stag:
            return True
    return False


def _ext_recompute(
    spark: SparkSession,
    root: str,
    spec: AggViewSpec,
    touched: DataFrame,
    bf: Column,
    hint,
    pending_delta=None,
) -> DataFrame | None:
    """Absolute extremes for the touched groups, recomputed from the support
    state (committed fold, touched-bucket pruned). The append path calls this
    AFTER landing the batch's support deltas (the fold reads them as pending);
    the emission path writes nothing, so it passes ``pending_delta`` (a
    ``col -> DataFrame | None`` of the batch's unwritten support delta) to
    splice them in — unioning with the committed fold is equivalent because
    dropped zero-count rows are the additive identity. A per-column ``None``
    means the batch's delta is ALREADY in this column's log (crash replay —
    see :func:`_tag_in_log`): the fold covers it, so nothing is spliced."""
    ext: DataFrame | None = None
    for c in spec.support_cols():
        sup = _fold(
            spark, _sup_root(root, c), SKEY, ["__cnt"], [], base_filter=bf
        )
        pd = pending_delta(c) if pending_delta is not None else None
        if pd is not None:
            sup = (
                sup.unionByName(pd)
                .groupBy(SKEY)
                .agg(F.sum("__cnt").alias("__cnt"))
                .filter(F.col("__cnt") > 0)
            )
        probe = hint(touched)
        slice_c = sup.join(
            probe, on=sup[SKEY].getField("g") == probe[GKEY], how="left_semi"
        )
        part = slice_c.groupBy(
            F.col(SKEY).getField("g").alias(GKEY)
        ).agg(*_ext_aggs(spec, c, F.col(SKEY).getField("v")))
        ext = part if ext is None else ext.join(part, on=[GKEY], how="full_outer")
    return ext


# ------------------------------------------------------------- operations


def ivm_log_init(
    spark: SparkSession,
    root: str,
    snapshot: DataFrame,
    spec: AggViewSpec,
    delete_col: str | None = None,
    n_buckets: int = 64,
    bucket_expr: str | None = None,
) -> None:
    """One full pass over the snapshot → generation 0 of every state table.
    ``bucket_expr`` picks the state-partitioning layout (see
    :func:`_with_bucket`); the default is a uniform hash over ``n_buckets``
    directories. Refuses a root that already holds committed generations:
    re-initializing would publish a fresh ``watermark=-1`` generation whose
    state already includes the retained deltas' effects, and readers would
    then re-apply those deltas on top — double-counted counters (callers
    that mean to adopt an existing root must gate on the generation's
    presence, as ``catalog.activate_pipeline_incremental`` does)."""
    if list_versions(_agg_root(root)):
        raise RuntimeError(
            f"{root!r} already has committed generations — re-initializing "
            "would reset the watermark and re-apply retained deltas "
            "(double-counted counters); remove the root to rebuild"
        )
    state = init_state(snapshot, spec, delete_col)
    meta = {
        "watermark": -1,
        "max_tag": None,
        "bucket_expr": bucket_expr
        or f"pmod(xxhash64({GKEY}), {int(n_buckets)})",
        "delete_col": delete_col,
    }
    _publish_gen(_with_bucket(state.agg, meta, GKEY), _agg_root(root), meta)
    for c, sup in state.supports.items():
        _publish_gen(_with_bucket(sup, meta, SKEY), _sup_root(root, c), meta)


def ivm_log_append(
    spark: SparkSession,
    root: str,
    snapshot_before: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column | str],
    spec: AggViewSpec,
    tag: str | None = None,
    broadcast_patches: bool = True,
) -> bool:
    """Land one micro-batch's maintenance as delta appends — O(|batch| +
    touched groups' support slice) work, no state rewrite. Returns False
    for a recognized replay (nothing appended). MUST be called with the
    snapshot image the batch merges into, BEFORE the snapshot advances
    (see the module ordering contract)."""
    agg_root = _agg_root(root)
    _, meta = _latest_gen(agg_root)
    delete_col = meta["delete_col"]
    if tag is not None and meta["max_tag"] is not None:
        try:
            if int(tag) <= int(meta["max_tag"]):
                return False  # replay of a batch already folded into a gen
        except (TypeError, ValueError):
            pass  # non-integer tags: only the pending-delta dedup applies

    snapshot_cols = list(snapshot_before.columns)
    pairs = change_pairs(
        snapshot_before, changes, keys, order,
        prune_target=broadcast_patches,
    )
    contrib = _contributions(pairs, snapshot_cols, spec, delete_col).persist()
    try:
        # the emptiness probe: support specs fold it into the touched-bucket
        # collect (one action serves both); counter-only specs keep the
        # plain isEmpty (nothing consumes buckets)
        tbuckets: list | None = None
        if spec.support_cols():
            touched = contrib.select(GKEY).distinct()
            tbuckets = _collect_touched_buckets(touched, meta)
            if not tbuckets:
                return False
        elif contrib.isEmpty():
            return False

        # 1. support deltas FIRST (replay after a crash here no-ops them by
        # tag, then recomputes identical extremes from the committed state).
        # Each table checks its OWN generation's max_tag: after a crash
        # between the support and agg appends, an external compaction may
        # fold the support deltas away (their pending-tag dedup with them) —
        # the agg-level check at the top still passes, so without this
        # per-table guard the replay would re-land the folded support rows
        # and double-count multiplicities.
        def _tag_folded(table_root: str) -> bool:
            if tag is None:
                return False
            _, tmeta = _latest_gen(table_root)
            if tmeta["max_tag"] is None:
                return False
            try:
                return int(tag) <= int(tmeta["max_tag"])
            except (TypeError, ValueError):
                return False

        for c in spec.support_cols():
            if _tag_folded(_sup_root(root, c)):
                continue
            append_delta(
                spark, _sup_root(root, c), _support_delta(contrib, c), tag=tag
            )

        def hint(df: DataFrame) -> DataFrame:
            return F.broadcast(df) if broadcast_patches else df

        # 2. extremes for the touched groups, from the COMMITTED support
        # state (base slice pruned to the touched partition directories +
        # the pending deltas, this batch's included). Counter-only specs
        # skip the touched/bucket collection entirely — nothing consumes it.
        ext: DataFrame | None = None
        if spec.support_cols():
            ext = _ext_recompute(
                spark, root, spec, touched, _bucket_filter(tbuckets), hint
            )

        # 3. the aggregate delta: signed counters per touched group, plus
        # the absolute recomputed extremes riding on the same row
        agg_delta = _counter_delta(contrib, spec)
        if ext is not None:
            a, e = agg_delta.alias("__a"), hint(ext).alias("__e")
            sel: list[Column] = [a[GKEY]] + [
                a[c].alias(c) for c in _counter_cols(spec)
            ]
            for c in spec.support_cols():
                for x in spec.ext_cols(c):
                    col = F.coalesce(e[x], F.lit(0)) if x.startswith("__cd_") else e[x]
                    sel.append(col.alias(x))
            agg_delta = a.join(e, on=[GKEY], how="left").select(*sel)
        return append_delta(spark, agg_root, agg_delta, tag=tag) is not None
    finally:
        contrib.unpersist(False)


def ivm_log_batch_changes(
    spark: SparkSession,
    root: str,
    snapshot_before: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column | str],
    spec: AggViewSpec,
    seq: int,
    broadcast_patches: bool = True,
    tag: str | None = None,
) -> DataFrame:
    """The GROUP-LEVEL change stream one source micro-batch induces on the
    maintained aggregate view — the view's own keyed upsert/tombstone
    stream (user-facing view columns + ``__seq`` + ``__deleted``), so
    maintained aggregates COMPOSE downstream exactly like the join arm's
    views do (``maintain_join_with_changes``): a further MERGE, an SCD2
    history, an alerting sink. This is the retraction-bearing output the
    reference platform's change streams carry for aggregating pipelines
    (``decodable/client/schema.py:109-111`` — a GROUP BY pipeline's sink
    is itself a change stream keyed by the group).

    PURE — writes nothing. The crash-safe composition is emit-THEN-append,
    mirroring the join arm's view-delta-before-state-delta order::

        out = ivm_log_batch_changes(spark, root, snap, batch, k, o, spec,
                                    seq, tag=str(seq))
        append_delta(spark, out_log, out, tag=str(seq))   # dedupes replays
        ivm_log_append(spark, root, snap, batch, k, o, spec, tag=str(seq))

    A crash between the two replays the batch against UNCHANGED committed
    state — this function recomputes bit-identical changes, the out-log
    append no-ops on its tag, and the state append proceeds. (Computing
    the post-image from committed-state + local delta instead of from a
    post-append read is what makes the pre-append emission possible.)
    Pass the SAME ``tag`` the state append will use: a replay after the
    support appends landed must not splice the batch's support delta on
    top of a fold that already reads it (see :func:`_tag_in_log`).

    Emitted per touched group: the post-batch view row (``__deleted``
    false), or a tombstone with NULL aggregate outputs when the group's
    live count reaches zero. Cost: one extra batch-sized maintenance-shaped
    pass (change pairs + contributions + touched-bucket pruned folds) on
    top of the append that follows — O(|batch| + touched support slices),
    never O(|state|)."""
    from dbt_decodable_spark.operators.ivm import project_view

    agg_root = _agg_root(root)
    _, meta = _latest_gen(agg_root)
    delete_col = meta["delete_col"]
    snapshot_cols = list(snapshot_before.columns)
    pairs = change_pairs(
        snapshot_before, changes, keys, order,
        prune_target=broadcast_patches,
    )
    contrib = _contributions(pairs, snapshot_cols, spec, delete_col).persist()
    try:
        counter_cols = _counter_cols(spec)
        ext_state = _ext_state_cols(spec)
        out_schema_cols = list(spec.outputs())

        def _empty() -> DataFrame:
            probe = _fold(spark, agg_root, GKEY, counter_cols, ext_state,
                          base_filter=F.lit(False))
            img = project_view(probe, spec)
            return (
                img.withColumn("__seq", F.lit(seq).cast("long"))
                .withColumn("__deleted", F.lit(False))
                .limit(0)
            )

        touched = contrib.select(GKEY).distinct()
        # one action: emptiness probe + the touched-bucket collect
        tbuckets = _collect_touched_buckets(touched, meta)
        if not tbuckets:
            return _empty()
        bf = _bucket_filter(tbuckets)

        def hint(df: DataFrame) -> DataFrame:
            return F.broadcast(df) if broadcast_patches else df

        # absolute extremes for the touched groups — the same recompute
        # ivm_log_append rides on its delta rows, from COMMITTED support
        # state plus this batch's (unwritten) support contributions; on a
        # crash replay whose support deltas already landed (recognized by
        # ``tag``), the committed fold covers them and nothing is spliced
        ext = _ext_recompute(
            spark, root, spec, touched, bf, hint,
            pending_delta=lambda c: (
                None
                if _tag_in_log(_sup_root(root, c), tag)
                else _support_delta(contrib, c)
            ),
        )

        # signed counter deltas per touched group (identical arithmetic to
        # the append path — both call _counter_delta)
        agg_delta = _counter_delta(contrib, spec)

        # committed pre-images of the touched groups (pruned fold)
        pre = _fold(spark, agg_root, GKEY, counter_cols, ext_state,
                    base_filter=bf).join(
            hint(touched), on=[GKEY], how="left_semi"
        )
        d, p = agg_delta.alias("__d"), hint(pre).alias("__p")
        post_cols: list[Column] = [d[GKEY]] + [
            (F.coalesce(p[c], F.lit(0)) + d[c]).alias(c) for c in counter_cols
        ]
        if ext is not None:
            e = hint(ext).alias("__e")
            joined = d.join(p, on=[GKEY], how="left").join(e, on=[GKEY], how="left")
            for c in spec.support_cols():
                for x in spec.ext_cols(c):
                    col = (
                        F.coalesce(e[x], F.lit(0)) if x.startswith("__cd_") else e[x]
                    )
                    post_cols.append(col.alias(x))
            post = joined.select(*post_cols)
        else:
            post = d.join(p, on=[GKEY], how="left").select(*post_cols)

        alive = post.filter(F.col("__cnt") > 0)
        img = project_view(alive, spec).withColumn("__deleted", F.lit(False))
        img_types = {f.name: f.dataType for f in img.schema.fields}
        gone = post.filter(F.col("__cnt") <= 0).select(
            *[F.col(GKEY).getField(g).alias(g) for g in spec.group_cols],
            *[
                F.lit(None).cast(img_types[c]).alias(c)
                for c in out_schema_cols
                if c not in spec.group_cols
            ],
        ).select(*out_schema_cols).withColumn("__deleted", F.lit(True))
        return (
            img.unionByName(gone)
            .withColumn("__seq", F.lit(seq).cast("long"))
            .select(*out_schema_cols, "__seq", "__deleted")
            .localCheckpoint(eager=True)
        )
    finally:
        contrib.unpersist(False)


def ivm_log_append_with_changes(
    spark: SparkSession,
    root: str,
    snapshot_before: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column | str],
    spec: AggViewSpec,
    seq: int,
    out_log: str,
    tag: str | None = None,
    broadcast_patches: bool = True,
) -> bool:
    """Fused :func:`ivm_log_batch_changes` → out-log append →
    :func:`ivm_log_append`: ONE maintenance-shaped pass (change pairs,
    contributions, touched-bucket pruned folds) shared between the
    emission and the state append, instead of the two passes the separate
    calls pay — the emitting stages' per-batch fixed cost, halved (VERDICT
    r11 item 4). The crash contract is unchanged: the out-log delta
    commits BEFORE any state delta, replays dedupe on ``tag`` on every
    log, and a replay of an already-folded batch returns False without
    re-emitting (its original emission necessarily landed — emission and
    state append are non-empty for exactly the same batches).

    The extremes reuse is sound both ways: the emission path computes
    them from committed support state SPLICED with the batch's unwritten
    support delta, which is exactly the post-support-append committed
    fold the append path would recompute."""
    from dbt_decodable_spark.operators.ivm import project_view

    agg_root = _agg_root(root)
    _, meta = _latest_gen(agg_root)
    delete_col = meta["delete_col"]
    if tag is not None and meta["max_tag"] is not None:
        try:
            if int(tag) <= int(meta["max_tag"]):
                return False  # replay of a fully-folded batch
        except (TypeError, ValueError):
            pass
    snapshot_cols = list(snapshot_before.columns)
    pairs = change_pairs(
        snapshot_before, changes, keys, order,
        prune_target=broadcast_patches,
    )
    contrib = _contributions(pairs, snapshot_cols, spec, delete_col).persist()
    try:
        counter_cols = _counter_cols(spec)
        ext_state = _ext_state_cols(spec)
        out_schema_cols = list(spec.outputs())
        touched = contrib.select(GKEY).distinct()
        # one action: emptiness probe + the touched-bucket collect
        tbuckets = _collect_touched_buckets(touched, meta)
        if not tbuckets:
            return False
        bf = _bucket_filter(tbuckets)

        def hint(df: DataFrame) -> DataFrame:
            return F.broadcast(df) if broadcast_patches else df

        ext: DataFrame | None = None
        if spec.support_cols():
            # crash replay guard: after a crash BETWEEN the support appends
            # and the agg append, the committed support fold already reads
            # this batch's delta (tag-landed) — splicing it again would
            # double the support contributions and corrupt the recomputed
            # extremes the replayed agg delta then lands durably
            ext = _ext_recompute(
                spark, root, spec, touched, bf, hint,
                pending_delta=lambda c: (
                    None
                    if _tag_in_log(_sup_root(root, c), tag)
                    else _support_delta(contrib, c)
                ),
            )
        agg_delta = _counter_delta(contrib, spec)

        # ---- emission (the ivm_log_batch_changes body, on the shared
        # frames): committed pre-images + signed deltas → post images
        pre = _fold(spark, agg_root, GKEY, counter_cols, ext_state,
                    base_filter=bf).join(
            hint(touched), on=[GKEY], how="left_semi"
        )
        d, p = agg_delta.alias("__d"), hint(pre).alias("__p")
        post_cols: list[Column] = [d[GKEY]] + [
            (F.coalesce(p[c], F.lit(0)) + d[c]).alias(c) for c in counter_cols
        ]
        if ext is not None:
            e = hint(ext).alias("__e")
            joined = d.join(p, on=[GKEY], how="left").join(
                e, on=[GKEY], how="left"
            )
            for c in spec.support_cols():
                for x in spec.ext_cols(c):
                    col = (
                        F.coalesce(e[x], F.lit(0))
                        if x.startswith("__cd_")
                        else e[x]
                    )
                    post_cols.append(col.alias(x))
            post = joined.select(*post_cols)
        else:
            post = d.join(p, on=[GKEY], how="left").select(*post_cols)
        alive = post.filter(F.col("__cnt") > 0)
        img = project_view(alive, spec).withColumn("__deleted", F.lit(False))
        img_types = {f.name: f.dataType for f in img.schema.fields}
        gone = post.filter(F.col("__cnt") <= 0).select(
            *[F.col(GKEY).getField(g).alias(g) for g in spec.group_cols],
            *[
                F.lit(None).cast(img_types[c]).alias(c)
                for c in out_schema_cols
                if c not in spec.group_cols
            ],
        ).select(*out_schema_cols).withColumn("__deleted", F.lit(True))
        out = (
            img.unionByName(gone)
            .withColumn("__seq", F.lit(seq).cast("long"))
            .select(*out_schema_cols, "__seq", "__deleted")
        )
        append_delta(spark, out_log, out, tag=tag)

        # ---- state append (the ivm_log_append tail, on the same frames)
        def _tag_folded(table_root: str) -> bool:
            if tag is None:
                return False
            _, tmeta = _latest_gen(table_root)
            if tmeta["max_tag"] is None:
                return False
            try:
                return int(tag) <= int(tmeta["max_tag"])
            except (TypeError, ValueError):
                return False

        for c in spec.support_cols():
            if _tag_folded(_sup_root(root, c)):
                continue
            append_delta(
                spark, _sup_root(root, c), _support_delta(contrib, c), tag=tag
            )
        if ext is not None:
            a, e = agg_delta.alias("__a"), hint(ext).alias("__e")
            sel: list[Column] = [a[GKEY]] + [
                a[c].alias(c) for c in _counter_cols(spec)
            ]
            for c in spec.support_cols():
                for x in spec.ext_cols(c):
                    col = (
                        F.coalesce(e[x], F.lit(0))
                        if x.startswith("__cd_")
                        else e[x]
                    )
                    sel.append(col.alias(x))
            agg_delta = a.join(e, on=[GKEY], how="left").select(*sel)
        return append_delta(spark, agg_root, agg_delta, tag=tag) is not None
    finally:
        contrib.unpersist(False)


def ivm_log_read(spark: SparkSession, root: str, spec: AggViewSpec) -> DataFrame:
    """The continuously-maintained view: fold the aggregate table's latest
    generation with its pending deltas and project the user-facing columns
    (same output contract as ``ivm.read_view``)."""
    folded = _fold(
        spark, _agg_root(root), GKEY, _counter_cols(spec), _ext_state_cols(spec)
    )
    from dbt_decodable_spark.operators.ivm import project_view

    return project_view(folded, spec)


def stream_maintain_view(
    stream_df: DataFrame,
    root: str,
    snapshot_path: str,
    keys: Sequence[str],
    order: Sequence[Column | str],
    spec: AggViewSpec,
    compact_every: int = 4,
    vacuum_horizon_seconds: float = 600.0,
    snapshot_n_buckets: int = 64,
    snapshot_partition_expr: Column | None = None,
    emit_log: str | None = None,
):
    """Structured-Streaming front door: a continuously-maintained GROUP BY
    view of a CDC stream, end to end. Per micro-batch the handler

    1. maintains the view FIRST (:func:`ivm_log_append`, tagged with the
       batch id — the module's ordering contract), reading the pre-merge
       snapshot as the snapshot table's own merge-on-read view
       (``read_merged``, tombstones included so order comparisons see
       them);
    2. lands the batch in the snapshot's delta log (``append_delta``, same
       tag — both sides replay exactly-once after a crash anywhere
       between);
    3. compacts whichever log crossed ``compact_every`` pending deltas,
       skipping (never stalling) when another process holds that table's
       compaction lock.

    The snapshot must already be laid out by ``write_hash_partitioned``
    and the view initialized by :func:`ivm_log_init` (one-time setup, like
    every managed table here). Returns a ``DataStreamWriter`` — the caller
    picks trigger/checkpoint and ``start()``s.

    This is the reference's pipeline model made literal: a SQL aggregate
    over a change stream that stays current forever without a recompute
    (``handler.py:89-94`` change-stream fold; the platform behavior behind
    the dbt adapter's rejected ``incremental`` materialization).

    ``emit_log`` maintains the rollup's OWN group-keyed change log
    alongside the state — the composition surface that lets ANOTHER
    maintained stage consume this rollup (the reference allows any model's
    sink to source the next model, ``impl.py:419-447``). Per batch the
    group-level changes are emitted BEFORE the state append (the
    :func:`ivm_log_batch_changes` crash contract: a replay before the
    state advanced recomputes bit-identical rows and dedupes on the tag;
    a replay after can only happen when the original emit landed, because
    the state append and the emission are non-empty for exactly the same
    batches). Emitted ``__seq`` is ``batch_id + 1`` so the init image's
    floor seq 0 sorts strictly below every batch."""
    from dbt_decodable_spark.streaming.changelog import (
        CompactionLockHeld,
        compact_and_vacuum,
        read_merged,
    )

    def _handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sp = batch_df.sparkSession
        snapshot_before = read_merged(
            sp, snapshot_path, keys, order, include_tombstones=True,
            prune_fold=True,
        ).select(*batch_df.columns)
        if emit_log is not None:
            # fused emission + state append: one maintenance-shaped pass
            ivm_log_append_with_changes(
                sp, root, snapshot_before, batch_df, keys, order, spec,
                seq=batch_id + 1, out_log=emit_log, tag=str(batch_id),
            )
        else:
            ivm_log_append(
                sp, root, snapshot_before, batch_df, keys, order, spec,
                tag=str(batch_id),
            )
        append_delta(sp, snapshot_path, batch_df, tag=str(batch_id))
        # count PENDING (seq > watermark) deltas, not every committed file:
        # folded deltas are retained for vacuum_horizon_seconds plus the
        # permanent sequence-floor delta, so a list_deltas() threshold
        # stays crossed after the first compaction and every subsequent
        # batch would pay the full O(|state|) generation publish
        _, ameta = _latest_gen(_agg_root(root))
        if len(_pending(_agg_root(root), ameta["watermark"])) >= compact_every:
            try:
                ivm_log_compact(
                    sp, root, spec,
                    vacuum_horizon_seconds=vacuum_horizon_seconds,
                )
            except CompactionLockHeld:
                pass
        if len(list_deltas(snapshot_path)) >= compact_every:
            try:
                compact_and_vacuum(
                    sp, snapshot_path, keys, order,
                    n_buckets=snapshot_n_buckets,
                    partition_expr=snapshot_partition_expr,
                )
            except CompactionLockHeld:
                pass

    return stream_df.writeStream.foreachBatch(_handle)


def ivm_log_compact(
    spark: SparkSession,
    root: str,
    spec: AggViewSpec,
    keep_gens: int = 2,
    vacuum_horizon_seconds: float = 600.0,
) -> dict:
    """Fold each state table's pending deltas into a new generation, then
    reclaim folded deltas and old generations past the retention horizon.
    The one amortized O(|state|) step; appends stay O(|batch|). Takes the
    view's compaction lock (raises ``CompactionLockHeld`` if another
    process is compacting — callers skip the cycle, never stall a batch).

    Crash-safety by ordering: the new generation (data + watermark meta)
    commits atomically FIRST; vacuum runs after. A crash in between leaves
    deltas every reader skips by watermark — re-folding (the counter
    double-count hazard) is impossible. The highest-sequence delta is kept
    as the sequence floor (see module docstring)."""
    agg_root = _agg_root(root)
    tables = [(agg_root, GKEY, _counter_cols(spec), _ext_state_cols(spec))] + [
        (_sup_root(root, c), SKEY, ["__cnt"], []) for c in spec.support_cols()
    ]
    out: dict = {"tables": {}, "vacuumed": []}
    with _compaction_lock(agg_root + ".__deltas__"):
        for table_root, key, counters, exts in tables:
            _, tmeta = _latest_gen(table_root)
            pend = _pending(table_root, tmeta["watermark"])
            if pend:
                max_seq = max(s for s, _ in pend)
                tags = []
                for _, p in pend:
                    parts = os.path.basename(p).split("-", 2)
                    if len(parts) == 3:
                        try:
                            tags.append(int(parts[2]))
                        except ValueError:
                            pass
                new_tag = max(
                    [t for t in [tmeta["max_tag"], *tags] if t is not None],
                    default=None,
                )
                folded = _fold(spark, table_root, key, counters, exts)
                gen = _publish_gen(
                    _with_bucket(folded, tmeta, key),
                    table_root,
                    {**tmeta, "watermark": max_seq, "max_tag": new_tag},
                )
                out["tables"][os.path.basename(table_root)] = gen
                watermark = max_seq
            else:
                out["tables"][os.path.basename(table_root)] = None
                watermark = tmeta["watermark"]
            # reclaim — runs even when nothing was folded, so leftovers from
            # a crash between a previous publish and its vacuum are swept:
            # folded deltas older than the horizon (never the overall
            # max-sequence one — the sequence floor) and generations beyond
            # keep_gens (same horizon)
            now = time.time()
            all_deltas = list_deltas(table_root)
            floor = max(all_deltas, key=_delta_seq, default=None)
            for p in all_deltas:
                if (
                    p != floor
                    and _delta_seq(p) <= watermark
                    and now - os.path.getmtime(p) > vacuum_horizon_seconds
                ):
                    shutil.rmtree(p, ignore_errors=True)
                    out["vacuumed"].append(p)
            gens = list_versions(table_root)
            for g in gens[:-keep_gens] if keep_gens > 0 else []:
                gdir = _vdir(table_root, g)
                try:
                    if now - os.path.getmtime(gdir) > vacuum_horizon_seconds:
                        shutil.rmtree(gdir, ignore_errors=True)
                        out["vacuumed"].append(gdir)
                except OSError:
                    pass
    return out
