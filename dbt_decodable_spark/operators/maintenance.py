"""Table maintenance: small-file compaction (SURVEY §2.1/§2.11 adjacent).

Streaming sinks and incremental ingests accumulate many small files; scan
throughput at 100 TB dies on file-open overhead and tiny row groups
(footer-per-file, no effective column-chunk runs). Compaction rewrites a
table's files at a target size.

Spark-first shape: `maxRecordsPerFile` bounds file size WITHOUT a count
pass or an exact-width repartition — the writer rolls files as it streams.
The optional `target_files` repartition is for when the input's partition
count itself is pathological (thousands of near-empty tasks); a plain
`repartition(n)` round-robin shuffle then rebalances skew in one pass.
Partitioned tables compact per partition directory (pass the subdir), so
compaction parallelizes across partitions and never touches cold ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_compacted(
    df: DataFrame,
    path: str,
    max_records_per_file: int,
    target_files: int | None = None,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` to ``path`` with files bounded at
    ``max_records_per_file`` rows; optionally rebalance to
    ``target_files`` partitions first (one round-robin shuffle)."""
    out = df.repartition(target_files) if target_files else df
    (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .format(fmt)
        .save(path)
    )


def compact_path(
    spark: SparkSession,
    path: str,
    max_records_per_file: int,
    target_files: int | None = None,
    fmt: str = "parquet",
) -> None:
    """Rewrite the files under ``path`` compacted (read → temp → swap is
    the crash-safe production shape; this in-place form relies on Spark's
    overwrite staging, which is atomic per the file committer)."""
    df = spark.read.format(fmt).load(path)
    staged = df.localCheckpoint(eager=True)  # detach from the files we rewrite
    write_compacted(staged, path, max_records_per_file, target_files, fmt)
