"""Bounded preview execution — the only reference path that returns rows
(SURVEY §3.2; ``dbt/adapters/decodable/handler.py:65-114``).

Protocol reproduced Spark-first:

- run a SQL statement over streams from ``earliest`` | ``latest`` start
  positions (``decodable/client/api.py:22-35``) within a cumulative time
  budget (default 60 s, ``connections.py:46``),
- poll with exponential backoff + jitter (1 s initial, ×2, +0–1 s jitter,
  capped at remaining budget — ``handler.py:29-42``),
- fold results by stream type: APPEND extends, CHANGE keeps the last
  ``after`` image per key with null-after = delete (``handler.py:79-94``),
- empty results are seeded with the dbt fake-result row
  (``handler.py:99-100,127-128``),
- cursor output flattens to tuples (``handler.py:102-114``).

Batch sources resolve instantly, so the poll loop runs one round; against a
true StreamingQuery (streaming layer) the same loop polls progress until the
``availableNow`` run finishes or the budget lapses.
"""

from __future__ import annotations

import random
import time
from collections.abc import Iterator

from pyspark.sql import DataFrame, Row, SparkSession, functions as F

from dbt_decodable_spark.dialect import normalize
from dbt_decodable_spark.streaming.changelog import fold_last_image


def backoff_schedule(
    budget_ms: int, initial_ms: int = 1000, rng: random.Random | None = None
) -> Iterator[int]:
    """Exponential backoff with jitter, capped at the remaining budget
    (handler.py:29-42): 1 s, ×2 per round, +0–1000 ms jitter."""
    rng = rng or random.Random()
    elapsed = 0
    delay = initial_ms
    while elapsed < budget_ms:
        jittered = delay + rng.randint(0, 1000)
        wait = min(jittered, budget_ms - elapsed)
        yield wait
        elapsed += wait
        delay *= 2


class Preview:
    """Bounded query runner with append/change folding."""

    def __init__(
        self,
        spark: SparkSession,
        timeout_ms: int = 60_000,
        start: str = "earliest",
    ):
        if start not in ("earliest", "latest"):
            raise ValueError(f"start position must be earliest|latest, got {start!r}")
        self.spark = spark
        self.timeout_ms = timeout_ms
        self.start = start

    def run(
        self,
        sql: str,
        primary_key: list[str] | None = None,
        order_col: str | None = None,
    ) -> list[tuple]:
        """Execute and fold. ``primary_key`` set ⇒ CHANGE-stream semantics:
        keep the last after-image per key (ordered by ``order_col``, or the
        incoming row order when None). APPEND ⇒ all rows."""
        deadline = time.time() + self.timeout_ms / 1000.0
        df = self.spark.sql(normalize(sql))
        if self.start == "latest":
            # latest over a bounded batch source = empty tail (SURVEY §3.2)
            df = df.limit(0)
        if primary_key:
            if order_col:
                df = fold_last_image(df, primary_key, [F.col(order_col)])
            else:
                # "incoming row order": tag each row with a per-partition
                # monotonic sequence and keep the max per key — F.last in an
                # aggregation is explicitly non-deterministic under shuffles
                # and would flip the folded after-image between runs
                value_cols = [c for c in df.columns if c not in primary_key]
                if not value_cols:  # key covers every column → fold = distinct
                    df = df.dropDuplicates(primary_key)
                else:
                    seq = df.withColumn("__seq", F.monotonically_increasing_id())
                    df = (
                        seq.groupBy(*primary_key)
                        .agg(*[F.max_by(c, F.col("__seq")).alias(c) for c in value_cols])
                        .select(*df.columns)
                    )
        rows = self._collect_with_budget(df, deadline)
        return [tuple(r) for r in rows]

    def _collect_with_budget(self, df: DataFrame, deadline: float) -> list[Row]:
        """Collect, enforcing the cumulative time budget via job cancellation."""
        sc = self.spark.sparkContext
        group = f"preview-{id(df)}-{time.time_ns()}"
        try:
            import threading

            result: list[Row] = []
            error: list[BaseException] = []

            def work() -> None:
                try:
                    # the job group must be set on the THREAD THAT SUBMITS
                    # the job — under pinned-thread mode each Python thread
                    # maps to its own JVM thread, so a group set on the
                    # caller would never tag (and cancel) this collect
                    sc.setJobGroup(group, "bounded preview", interruptOnCancel=True)
                    result.extend(df.collect())
                except BaseException as e:  # noqa: BLE001 — surfaced below
                    error.append(e)

            t = threading.Thread(target=work, daemon=True)
            t.start()
            t.join(max(deadline - time.time(), 0.001))
            if t.is_alive():
                sc.cancelJobGroup(group)
                raise TimeoutError(
                    f"preview exceeded its {self.timeout_ms} ms budget"
                )
            if error:
                raise error[0]
            return result
        finally:
            sc.setJobGroup("", "")

    @staticmethod
    def seed_fake_results() -> list[tuple]:
        """Empty preview → dbt fake result row (handler.py:127-128)."""
        return [(0, False, False)]  # (failures, should_warn, should_error)
