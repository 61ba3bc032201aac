"""Streaming pipeline runner: continuous queries with the reference's
activate/deactivate lifecycle (``decodable/client/client.py:381-393``;
auto-activate on apply ``impl.py:459-460``) and bounded ``availableNow``
previews (the streaming form of SURVEY §3.2).

Sinks:

- append streams → ``writeStream`` in append mode straight to the sink
  table/path;
- change streams (primary key declared) → ``foreachBatch`` MERGE via
  :func:`dbt_decodable_spark.streaming.changelog.apply_changes_batch` —
  Spark's own update mode can't delete on null-after, the fold can.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


@dataclass
class RunningPipeline:
    name: str
    query: StreamingQuery
    sink: str


@dataclass
class StreamRunner:
    """Registry of running streaming queries (activate/deactivate)."""

    spark: SparkSession
    running: dict[str, RunningPipeline] = field(default_factory=dict)

    def activate(
        self,
        name: str,
        df: DataFrame,
        sink_path: str,
        checkpoint: str,
        fmt: str = "parquet",
        available_now: bool = False,
    ) -> RunningPipeline:
        """Start a continuous (or availableNow-bounded) query writing a sink."""
        writer = (
            df.writeStream.format(fmt)
            .option("path", sink_path)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        q = writer.start()
        rp = RunningPipeline(name=name, query=q, sink=sink_path)
        self.running[name] = rp
        return rp

    def activate_memory(
        self, name: str, df: DataFrame, output_mode: str = "append",
        available_now: bool = True,
    ) -> RunningPipeline:
        """Bounded preview into the in-memory sink (queryable as a table)."""
        writer = (
            df.writeStream.format("memory").queryName(name).outputMode(output_mode)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        q = writer.start()
        rp = RunningPipeline(name=name, query=q, sink=name)
        self.running[name] = rp
        return rp

    def activate_foreach_batch(
        self, name: str, df: DataFrame, batch_fn, available_now: bool = False
    ) -> RunningPipeline:
        """Custom-sink path (change-stream MERGE lives here)."""
        writer = df.writeStream.foreachBatch(batch_fn)
        if available_now:
            writer = writer.trigger(availableNow=True)
        q = writer.start()
        rp = RunningPipeline(name=name, query=q, sink=f"foreachBatch:{name}")
        self.running[name] = rp
        return rp

    def wait(self, name: str, timeout_s: float = 60.0) -> None:
        """Block until an availableNow query drains (budget-capped, mirroring
        the preview poll loop's cumulative budget)."""
        rp = self.running[name]
        deadline = time.time() + timeout_s
        while rp.query.isActive:
            if time.time() > deadline:
                rp.query.stop()
                raise TimeoutError(f"streaming preview {name!r} exceeded {timeout_s}s")
            rp.query.awaitTermination(0.2)

    def deactivate(self, name: str) -> None:
        rp = self.running.pop(name, None)
        if rp and rp.query.isActive:
            rp.query.stop()

    def deactivate_all(self) -> None:
        for name in list(self.running):
            self.deactivate(name)

    def states(self) -> dict[str, str]:
        """actual_state view (impl.py:218): RUNNING | STOPPED per pipeline."""
        return {
            n: ("RUNNING" if rp.query.isActive else "STOPPED")
            for n, rp in self.running.items()
        }
