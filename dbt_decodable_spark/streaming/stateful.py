"""Custom stateful streaming operator: event-time sessionization via
``applyInPandasWithState`` (SURVEY §2.9 — the "custom stateful operator"
slot; the reference's platform runs arbitrary Flink SQL including session
windows, `README.md:7`, and Spark's own ``F.session_window`` covers the
declarative case — this module is the escape hatch for session logic that
declarative windows can't express, e.g. value-dependent gaps or per-session
caps).

Semantics (deterministic, oracle-checkable):

- events are grouped per key and ordered by event time (micros);
- an event within ``gap`` of the running session's end extends it, otherwise
  the running session is EMITTED (closed by data) and a new one starts;
- the final open session per key is held in state with an event-time timeout
  at ``session_end + gap``; when the watermark passes it, the session is
  emitted (closed by watermark). Sessions still open at end-of-stream are
  NOT emitted — exactly Flink/Spark session-window late-closure semantics.

Scale notes: state is O(keys) (one open session each, 4 longs); the shuffle
is one hash partitioning by key; per-group work is Arrow-batched and fully
vectorized (numpy cut points: ``diff(ts) > gap`` → segment boundaries →
``add.reduceat`` per-segment aggregates — no per-event Python loop), and the
operator projects to exactly (key, ts, measure) before the stateful shuffle.
Value totals ride as integer cents so emission is order-exact at any
parallelism.

Cost model (measured, local[32], sf0.1 = 100k events / 1500 keys): the
dominant term is ``applyInPandasWithState``'s per-KEY overhead — each key
becomes its own Arrow record batch + Python function call (~2 ms/key/batch;
a no-op stateful fn measures ~3 s for batch 0 alone), and event-time
timeouts force a second micro-batch that calls every keyed state again. So
wall time ≈ 2 × keys × 2 ms + fixed streaming costs, regardless of how lean
the per-group body is. Per-EVENT work is what scales with data volume, and
that is fully vectorized here. For gap sessionization that needs no custom
state, the declarative ``F.session_window`` twin (queries/streaming_q.py
``stream_session_window``) is ~10× faster — this operator is the escape
hatch for semantics declarative windows can't express.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def sessionize_stateful(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    cents_col: str,
    gap_seconds: int,
) -> DataFrame:
    """Sessionize a watermarked streaming DataFrame; see module docstring.

    ``events`` must already carry a watermark on ``ts_col`` (required for
    the event-time timeout). ``cents_col`` is a BIGINT measure (integer
    cents — exact addition in any order).
    """
    out_schema = StructType(
        [
            StructField(key_col, LongType()),
            StructField("session_start", TimestampType()),
            StructField("session_end", TimestampType()),
            StructField("n_events", LongType()),
            StructField("total_cents", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("start_us", LongType()),
            StructField("end_us", LongType()),
            StructField("n", LongType()),
            StructField("cents", LongType()),
        ]
    )
    gap_us = gap_seconds * 1_000_000
    gap_ms = gap_seconds * 1_000

    def _emit_batch(key: int, s, e, n, c) -> pd.DataFrame:
        # int64 micros → datetime64[us] is a reinterpreting view (no parse
        # cost, unlike pd.to_datetime) — this runs once per group, keep it lean
        return pd.DataFrame(
            {
                key_col: np.full(len(s), key, dtype="int64"),
                "session_start": np.asarray(s, dtype="int64").view("datetime64[us]"),
                "session_end": np.asarray(e, dtype="int64").view("datetime64[us]"),
                "n_events": np.asarray(n, dtype="int64"),
                "total_cents": np.asarray(c, dtype="int64"),
            }
        )

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.hasTimedOut:
            s, e, n, c = state.get
            state.remove()
            yield _emit_batch(k, [s], [e], [n], [c])
            return
        # pull only the two needed columns into numpy; sorting two flat arrays
        # via argsort is far cheaper than DataFrame.sort_values
        ts_parts, cents_parts = [], []
        for pdf in pdfs:
            ts_parts.append(pdf[ts_col].to_numpy(dtype="datetime64[ns]").astype("int64"))
            cents_parts.append(pdf[cents_col].to_numpy(dtype="int64"))
        ts_us = (np.concatenate(ts_parts) // 1000) if ts_parts else np.empty(0, dtype="int64")
        if ts_us.size == 0:
            if state.exists:  # keep the open session + its timeout armed
                cur = state.get
                state.update(cur)
                # clamp: re-arming below the advanced watermark would crash
                # the query; firing on the next advance closes it correctly
                state.setTimeoutTimestamp(
                    max(cur[1] // 1000 + gap_ms, state.getCurrentWatermarkMs() + 1)
                )
            return
        cents = np.concatenate(cents_parts)
        order = np.argsort(ts_us, kind="stable")
        ts_us = ts_us[order]
        cents = cents[order]

        # Vectorized gaps-and-islands: an event starts a new session iff its
        # gap from the previous event exceeds gap_us (the first event compares
        # to the open-state session end, if any).
        starts = np.empty(len(ts_us), dtype=bool)
        starts[0] = True
        starts[1:] = np.diff(ts_us) > gap_us
        idx = np.flatnonzero(starts)  # segment start offsets
        seg_start = ts_us[idx]
        seg_end = ts_us[np.append(idx[1:] - 1, len(ts_us) - 1)]
        seg_n = np.diff(np.append(idx, len(ts_us))).astype("int64")
        seg_cents = np.add.reduceat(cents, idx)

        closed_state = None
        if state.exists:
            s0, e0, n0, c0 = state.get
            if ts_us[0] - e0 <= gap_us:
                # first segment continues the open session; end = max so an
                # out-of-order (but in-watermark) batch can't regress the
                # session end and re-arm an earlier timeout
                seg_start[0], seg_n[0], seg_cents[0] = s0, seg_n[0] + n0, seg_cents[0] + c0
                seg_end[0] = max(int(seg_end[0]), int(e0))
            else:
                closed_state = (s0, e0, n0, c0)  # closed by data, emit first

        # every segment but the last is closed by data; the last goes to state
        last = len(idx) - 1
        emit_s = list(seg_start[:last])
        emit_e = list(seg_end[:last])
        emit_n = list(seg_n[:last])
        emit_c = list(seg_cents[:last])
        if closed_state is not None:
            emit_s.insert(0, closed_state[0])
            emit_e.insert(0, closed_state[1])
            emit_n.insert(0, closed_state[2])
            emit_c.insert(0, closed_state[3])
        if emit_s:
            yield _emit_batch(k, emit_s, emit_e, emit_n, emit_c)

        state.update((int(seg_start[last]), int(seg_end[last]), int(seg_n[last]), int(seg_cents[last])))
        # fire when the watermark passes session_end + gap (ms floor — the
        # same truncation Spark's watermark tracker applies); clamped above
        # the current watermark (arming at/below it crashes the query)
        state.setTimeoutTimestamp(
            max(
                int(seg_end[last]) // 1000 + gap_ms,
                state.getCurrentWatermarkMs() + 1,
            )
        )

    # project to exactly the columns the operator needs BEFORE the stateful
    # shuffle: the stream may carry wide payloads (props/text/etc.) that would
    # otherwise ride through the exchange and every Arrow batch (the watermark
    # column survives a projection that keeps it)
    return (
        events.select(key_col, ts_col, cents_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def sessionize_stateful_bucketed(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    cents_col: str,
    gap_seconds: int,
    n_buckets: int = 128,
) -> DataFrame:
    """Same semantics as :func:`sessionize_stateful`, with the
    ``applyInPandasWithState`` group being a KEY BUCKET
    (``pmod(xxhash64(key), n_buckets)``) instead of a single key.

    Why: the per-group cost of ``applyInPandasWithState`` is dominated by
    the per-group fixed overhead — every group is its own Arrow record
    batch + Python call (~2 ms) + state round-trip, so per-key grouping
    costs ~2·keys·2 ms per micro-batch regardless of data volume. Bucketing
    divides that by keys/bucket: state becomes parallel arrays of open
    sessions for all keys in the bucket, the per-event work stays fully
    vectorized (lexsort by (key, ts) → segment boundaries on key-change or
    gap → ``add.reduceat``), and the per-key state merge is a dict pass
    over only the keys present in the batch. One event-time timeout per
    bucket is armed at the MIN deadline over its open sessions; when it
    fires, sessions whose ``end + gap`` fell behind the current watermark
    emit and the timeout re-arms at the next min.

    Measured honestly: at sf0.1 (1500 keys) this is NOT faster locally —
    both forms sit at ~2.8 s because the floor there is per-micro-batch
    fixed cost (planning, state commits across partitions), not the
    per-key Python calls. The bucketed form is the right shape when keys
    ≫ cores (10⁶–10⁹ keys: Python-call count becomes n_buckets, not
    n_keys); below that, prefer the simpler per-key
    :func:`sessionize_stateful`. Both produce identical output
    (equivalence-tested in tests/test_streaming.py).

    ``n_buckets`` trades per-call batch size against parallelism — size it
    to ~a few × total cores.
    """
    out_schema = StructType(
        [
            StructField(key_col, LongType()),
            StructField("session_start", TimestampType()),
            StructField("session_end", TimestampType()),
            StructField("n_events", LongType()),
            StructField("total_cents", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("keys", ArrayType(LongType())),
            StructField("start_us", ArrayType(LongType())),
            StructField("end_us", ArrayType(LongType())),
            StructField("n", ArrayType(LongType())),
            StructField("cents", ArrayType(LongType())),
        ]
    )
    gap_us = gap_seconds * 1_000_000
    gap_ms = gap_seconds * 1_000

    def _emit(k, s, e, n, c) -> pd.DataFrame:
        return pd.DataFrame(
            {
                key_col: np.asarray(k, dtype="int64"),
                "session_start": np.asarray(s, dtype="int64").view("datetime64[us]"),
                "session_end": np.asarray(e, dtype="int64").view("datetime64[us]"),
                "n_events": np.asarray(n, dtype="int64"),
                "total_cents": np.asarray(c, dtype="int64"),
            }
        )

    def _save(state: GroupState, k, s, e, n, c) -> None:
        """Persist open-session arrays and arm the min-deadline timeout."""
        if len(k) == 0:
            if state.exists:
                state.remove()
            return
        state.update(
            ([int(x) for x in k], [int(x) for x in s], [int(x) for x in e],
             [int(x) for x in n], [int(x) for x in c])
        )
        state.setTimeoutTimestamp(int(min(e)) // 1000 + gap_ms)

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            ku, s0, e0, n0, c0 = (np.asarray(x, dtype="int64") for x in state.get)
            wm = state.getCurrentWatermarkMs()
            fire = (e0 // 1000 + gap_ms) < wm
            keep = ~fire
            _save(state, ku[keep], s0[keep], e0[keep], n0[keep], c0[keep])
            if fire.any():
                yield _emit(ku[fire], s0[fire], e0[fire], n0[fire], c0[fire])
            return

        users_parts, ts_parts, cents_parts = [], [], []
        for pdf in pdfs:
            users_parts.append(pdf[key_col].to_numpy(dtype="int64"))
            ts_parts.append(pdf[ts_col].to_numpy(dtype="datetime64[ns]").astype("int64"))
            cents_parts.append(pdf[cents_col].to_numpy(dtype="int64"))
        if not ts_parts or sum(len(t) for t in ts_parts) == 0:
            if state.exists:
                ku, s0, e0, n0, c0 = (np.asarray(x, dtype="int64") for x in state.get)
                wm = state.getCurrentWatermarkMs()
                overdue = (e0 // 1000 + gap_ms) <= wm
                if overdue.any():
                    yield _emit(ku[overdue], s0[overdue], e0[overdue], n0[overdue], c0[overdue])
                keep = ~overdue
                _save(state, ku[keep], s0[keep], e0[keep], n0[keep], c0[keep])
            return
        users = np.concatenate(users_parts)
        ts_us = np.concatenate(ts_parts) // 1000
        cents = np.concatenate(cents_parts)
        order = np.lexsort((ts_us, users))
        users, ts_us, cents = users[order], ts_us[order], cents[order]

        new_user = np.empty(len(users), dtype=bool)
        new_user[0] = True
        new_user[1:] = users[1:] != users[:-1]
        starts = new_user.copy()
        starts[1:] |= np.diff(ts_us) > gap_us
        idx = np.flatnonzero(starts)
        seg_user = users[idx]
        seg_start = ts_us[idx]
        seg_end = ts_us[np.append(idx[1:] - 1, len(ts_us) - 1)]
        seg_n = np.diff(np.append(idx, len(ts_us))).astype("int64")
        seg_cents = np.add.reduceat(cents, idx)
        first_mask = new_user[idx]  # first segment of each key in this batch
        last_mask = np.append(seg_user[1:] != seg_user[:-1], True)

        # open sessions from state: merge into each key's first segment when
        # within gap, else emit them (closed by data)
        emit_k: list = []
        emit_s: list = []
        emit_e: list = []
        emit_n: list = []
        emit_c: list = []
        carried: dict[int, tuple[int, int, int, int]] = {}
        if state.exists:
            ku, s0, e0, n0, c0 = state.get
            carried = {
                int(u): (int(a), int(b), int(m), int(d))
                for u, a, b, m, d in zip(ku, s0, e0, n0, c0)
            }
        for j in np.flatnonzero(first_mask):
            prev = carried.pop(int(seg_user[j]), None)
            if prev is None:
                continue
            ps, pe, pn, pc = prev
            if seg_start[j] - pe <= gap_us:
                seg_start[j], seg_n[j], seg_cents[j] = ps, seg_n[j] + pn, seg_cents[j] + pc
                seg_end[j] = max(int(seg_end[j]), int(pe))  # no end regression
            else:
                emit_k.append(int(seg_user[j]))
                emit_s.append(ps)
                emit_e.append(pe)
                emit_n.append(pn)
                emit_c.append(pc)

        closed = ~last_mask  # every segment but each key's last is closed by data
        if closed.any():
            emit_k.extend(seg_user[closed].tolist())
            emit_s.extend(seg_start[closed].tolist())
            emit_e.extend(seg_end[closed].tolist())
            emit_n.extend(seg_n[closed].tolist())
            emit_c.extend(seg_cents[closed].tolist())
        if emit_k:
            yield _emit(emit_k, emit_s, emit_e, emit_n, emit_c)

        # new open set: carried-forward keys absent from this batch + each
        # batch key's last segment. Carried keys whose deadline the watermark
        # already passed must EMIT here — the bucket had data, so no timeout
        # fires for them, and re-arming min(e)+gap below the watermark would
        # crash the query.
        nk = np.asarray(list(carried.keys()) + seg_user[last_mask].tolist(), dtype="int64")
        ns = np.asarray([v[0] for v in carried.values()] + seg_start[last_mask].tolist(), dtype="int64")
        ne = np.asarray([v[1] for v in carried.values()] + seg_end[last_mask].tolist(), dtype="int64")
        nn = np.asarray([v[2] for v in carried.values()] + seg_n[last_mask].tolist(), dtype="int64")
        nc = np.asarray([v[3] for v in carried.values()] + seg_cents[last_mask].tolist(), dtype="int64")
        wm = state.getCurrentWatermarkMs()
        overdue = (ne // 1000 + gap_ms) <= wm
        if overdue.any():
            yield _emit(nk[overdue], ns[overdue], ne[overdue], nn[overdue], nc[overdue])
        keep = ~overdue
        _save(state, nk[keep], ns[keep], ne[keep], nn[keep], nc[keep])

    return (
        events.select(key_col, ts_col, cents_col)
        .withColumn("__bucket", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)))
        .groupBy("__bucket")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def sessionize_stateful_auto(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    cents_col: str,
    gap_seconds: int,
    n_keys_estimate: int | None = None,
    keys_per_core_threshold: int = 32,
    n_buckets: int | None = None,
) -> DataFrame:
    """Dispatch between the per-key and key-bucketed stateful sessionizers
    on the expected distinct-key count.

    The per-key form pays ~2 ms of Arrow/Python fixed cost PER KEY per
    micro-batch; the bucketed form pays it per BUCKET. Below
    ``keys_per_core_threshold × defaultParallelism`` keys the per-key cost
    is under the per-micro-batch floor (planning + state-store commits) and
    the simpler operator wins on clarity; above it, Python-call count —
    not data volume — becomes the bottleneck and bucketing caps it at
    ``n_buckets`` (default 4 × cores). The caller supplies
    ``n_keys_estimate`` (a streaming plan can't count its own keys — use a
    batch ``approx_count_distinct`` over the backing table, or a domain
    bound); with no estimate the per-key form is used.
    """
    spark = events.sparkSession
    cores = spark.sparkContext.defaultParallelism
    if n_keys_estimate is not None and n_keys_estimate > keys_per_core_threshold * cores:
        return sessionize_stateful_bucketed(
            events, key_col, ts_col, cents_col, gap_seconds,
            n_buckets=n_buckets or 4 * cores,
        )
    return sessionize_stateful(events, key_col, ts_col, cents_col, gap_seconds)
