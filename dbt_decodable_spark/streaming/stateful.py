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
is one hash partitioning by key; per-group work is Arrow-batched pandas.
Value totals ride as integer cents so emission is order-exact at any
parallelism.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType, TimestampType


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

    def _emit(key: int, s: int, e: int, n: int, c: int) -> pd.DataFrame:
        return pd.DataFrame(
            {
                key_col: [key],
                "session_start": pd.to_datetime([s], unit="us"),
                "session_end": pd.to_datetime([e], unit="us"),
                "n_events": [n],
                "total_cents": [c],
            }
        )

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.hasTimedOut:
            s, e, n, c = state.get
            state.remove()
            yield _emit(k, s, e, n, c)
            return
        rows = pd.concat(list(pdfs)).sort_values(ts_col)
        ts_us = (rows[ts_col].astype("int64") // 1000).to_numpy()  # ns → us
        cents = rows[cents_col].to_numpy()
        cur: list[int] | None = list(state.get) if state.exists else None
        for t, c in zip(ts_us, cents):
            t, c = int(t), int(c)
            if cur is None:
                cur = [t, t, 1, c]
            elif t - cur[1] <= gap_us:
                cur[1], cur[2], cur[3] = t, cur[2] + 1, cur[3] + c
            else:
                yield _emit(k, *cur)
                cur = [t, t, 1, c]
        if cur is not None:
            state.update(tuple(cur))
            # fire when the watermark passes session_end + gap (ms floor —
            # the same truncation Spark's watermark tracker applies)
            state.setTimeoutTimestamp(cur[1] // 1000 + gap_ms)

    return events.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
    )
