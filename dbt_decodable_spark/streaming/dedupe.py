"""Streaming deduplication (SURVEY §2.9): at-most-once emission per key over
an event-time stream.

The reference platform's change streams imply per-key dedup/upsert semantics
at the sink (`dbt/adapters/decodable/handler.py:89-94` folds to the last
image per key); the *ingest-side* twin is first-wins dedup — drop every
repeat of a key seen within the watermark horizon. Spark has a dedicated
operator for exactly this: ``dropDuplicatesWithinWatermark`` keeps per-key
state only until the watermark passes the first-seen event time + delay, so
state size is bounded by the key arrival rate × horizon, not by stream
length — the property that makes streaming dedup viable on an unbounded
100 TB/day feed (a plain ``dropDuplicates`` would grow state forever).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_within_watermark(
    stream: DataFrame,
    keys: list[str],
    ts_col: str | None = None,
    delay: str = "1 hour",
) -> DataFrame:
    """First-wins streaming dedup on ``keys``: one output row per key per
    watermark horizon. ``stream`` must be a streaming DataFrame. Pass
    ``ts_col`` to declare the watermark here; pass ``None`` when the stream
    already carries one (Spark rejects redefinition).

    State shape: one (key → first-seen ts) entry per live key, evicted when
    the watermark passes ts + delay. Choose ``delay`` = the maximum expected
    duplicate lag; duplicates arriving inside the horizon are dropped
    exactly, later ones may re-emit (the documented at-least-once tail every
    horizon-bounded dedup has).
    """
    if ts_col is not None:
        stream = stream.withWatermark(ts_col, delay)
    return stream.dropDuplicatesWithinWatermark(keys)
