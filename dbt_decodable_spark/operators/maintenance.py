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

import os
import shutil

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
    """Rewrite the files under ``path`` compacted, crash-safely:
    read → write to a ``<path>.__compact_tmp__`` sibling → verify the row
    count survived the rewrite → swap directories (keeping the old data as
    ``.__compact_old__`` until the swap completes, then delete it). A crash
    before the swap leaves the original untouched; a crash between the two
    renames leaves the old directory recoverable on disk. No
    ``localCheckpoint`` involved — the original files are never deleted
    while any job still needs them (executor loss or block eviction can
    discard checkpoint blocks, which would have destroyed data in the
    old overwrite-in-place form)."""
    tmp = path.rstrip("/") + ".__compact_tmp__"
    old = path.rstrip("/") + ".__compact_old__"
    for leftover in (tmp, old):
        if os.path.exists(leftover):
            shutil.rmtree(leftover)
    df = spark.read.format(fmt).load(path)
    n_before = df.count()
    write_compacted(df, tmp, max_records_per_file, target_files, fmt)
    n_after = spark.read.format(fmt).load(tmp).count()
    if n_after != n_before:
        shutil.rmtree(tmp)
        raise RuntimeError(
            f"compaction row count changed ({n_before} -> {n_after}); "
            f"aborted, original untouched at {path}"
        )
    os.rename(path.rstrip("/"), old)
    os.rename(tmp, path.rstrip("/"))
    shutil.rmtree(old)
