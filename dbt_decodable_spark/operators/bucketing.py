"""Bucketed materialization — the shuffle-elimination path for repeated
big⋈big joins (SCALING.md "Joins").

At 100 TB, a lineitem⋈orders-class join shuffles both fact tables on the
key every time it runs. When the same join recurs (daily pipelines over
the same keys), the winning strategy is to pay one shuffle at *write*
time: persist both tables bucketed (hash-clustered + per-bucket sorted)
on the join key. Every subsequent join plans as a zip of pre-clustered
buckets — ``.explain`` shows **no Exchange on either side** (asserted in
``tests/test_bucketing.py``), and with ``sortBy`` no Sort either: the
SortMergeJoin reads both scans directly.

This is Spark's native bucketing (``DataFrameWriter.bucketBy`` →
``spark.sql.sources.bucketing.enabled``), not a reimplementation: the
operator's job is to make it a one-call materialization primitive with
the correct invariants —

- both sides must agree on bucket count (Spark only elides the shuffle
  when the bucket counts match, or one divides the other with
  ``bucketing.autoBucketedScan`` semantics);
- the bucket column set must equal the join key set;
- writes go through ``saveAsTable`` (bucket metadata lives in the
  catalog; a bare ``.parquet()`` write silently drops it).

Bucket-count sizing at 100 TB: target ~128–512 MB per bucket file per
partition — e.g. 100 TB / 256 MB ≈ 400k total files ⇒ thousands of
buckets; here tests use small counts, the API is count-agnostic.

The reference (decodableco/dbt-decodable) ships SQL to a managed Flink
platform and has no physical-layout surface; this operator is the
Spark-native equivalent of its "stream as durable table" materialization
(`dbt/adapters/decodable/impl.py` create-table path) with a scale-aware
layout attached.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def materialize_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort: bool = True,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and per-bucket sorted) parquet table.

    ``path`` makes it an external table (tests point this at a tmp dir);
    omitted, the session's warehouse location is used."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed tables on their bucket columns. When both were
    materialized with matching bucket specs this plans with no Exchange —
    callers can assert that via ``plan_has_no_exchange``."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def scan_shuffle_free(df: DataFrame, scan_marker: str) -> bool:
    """True iff the physical plan contains a file scan whose description
    includes ``scan_marker`` (e.g. the snapshot table/path name) AND no
    shuffle Exchange sits between that scan and the plan root.

    This is the one-sided contract a bucketed-snapshot MERGE needs: the
    batch side may (must) shuffle, the state side must not. Walks the plan
    tree through py4j so tree-drawing prefixes can't fool it; descends into
    AQE and whole-stage-codegen wrappers.
    """

    def scan_desc(node) -> str:
        # node.toString() truncates the Location field at
        # spark.sql.maxMetadataStringLength (100 chars) — a scan path one
        # character too long silently cuts the marker out of the rendered
        # string and the contract check becomes PATH-LENGTH-dependent
        # (observed: the same test flipping pass→fail when pytest's tmp
        # counter grew a digit). Concatenate the un-truncated root paths
        # (and the v2 scan description) WITH the rendered string — some
        # markers (catalog table names) appear only in the latter.
        desc = []
        try:
            desc.append(node.relation().location().rootPaths().toString())
        except Exception:
            pass
        try:
            desc.append(node.scan().description())
        except Exception:
            pass
        desc.append(node.toString())
        return "\n".join(desc)

    def walk(node, shuffled_above: bool) -> bool:
        cls = node.getClass().getSimpleName()
        if cls.startswith("ShuffleExchange") or cls.startswith("ShuffleQueryStage"):
            shuffled_above = True
        if "FileSourceScan" in cls or "BatchScan" in cls:
            if scan_marker in scan_desc(node) and not shuffled_above:
                return True
        # AdaptiveSparkPlanExec hides its live plan outside children()
        if cls == "AdaptiveSparkPlanExec":
            return walk(node.executedPlan(), shuffled_above)
        found = False
        # materialized AQE stages (Shuffle/Broadcast/ResultQueryStageExec)
        # hide their subtree behind .plan() — children() is EMPTY once the
        # frame has executed, so an already-collected DataFrame would never
        # reach its scans and the contract would vacuously fail
        if cls.endswith("QueryStageExec"):
            found = walk(node.plan(), shuffled_above)
        children = node.children()
        for i in range(children.size()):
            found = found or walk(children.apply(i), shuffled_above)
        return found

    return walk(df._jdf.queryExecution().executedPlan(), False)


def plan_has_no_exchange(df: DataFrame) -> bool:
    """True iff the physical plan contains no shuffle (Exchange) operator.
    (BroadcastExchange doesn't count — it's not a data shuffle.)"""
    plan = df._jdf.queryExecution().executedPlan().toString()
    # strip ALL tree-drawing prefix chars — a join's non-last child renders
    # with ':' prefixes (':  +- Exchange ...'), which a '+-* '-only lstrip
    # would hide, reporting "no shuffle" over a real left-side Exchange
    return not any(
        line.strip().lstrip(":+-| *").startswith("Exchange")
        for line in plan.splitlines()
    )
