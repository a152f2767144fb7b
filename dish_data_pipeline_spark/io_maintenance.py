"""Table maintenance: small-file compaction for plain-Parquet zones.

A long-lived ingest (the reference runs twice weekly per feed —
DAG/etl_google_analytics_dag.py:57 — and a streaming sink commits
every micro-batch) accumulates many small files; at 100 TB the
scan-planning and footer-reading overhead of millions of kilobyte
files dominates query latency long before data volume does. BigQuery
compacts internally; a file-based lakehouse must do it itself (Delta
``OPTIMIZE``'s plain-Parquet equivalent).

``compact_parquet`` rewrites a directory to approximately
``target_file_mb``-sized files and swaps atomically (crash-safe up
to the final rename pair, single-writer — io.atomic_overwrite's
documented scope). File count comes from the CURRENT on-disk bytes,
so compaction is idempotent: re-running on a compacted table is a
cheap no-op rewrite to the same layout. Coalesce (not repartition)
keeps it shuffle-free — each output file is a concatenation of
input splits, and row order within files is irrelevant to Parquet
consumers. Partitioned layouts should compact per partition
directory (the helper works on any directory of Parquet files).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from dish_data_pipeline_spark import io as dio


def _dir_parquet_stats(path: str) -> tuple[int, int]:
    """(n_files, total_bytes) of the Parquet data files under path."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def plan_compaction(
    path: str, target_file_mb: int = 128, min_files: int = 2
) -> int:
    """Target output file count, or 0 when compaction isn't worth a
    rewrite (fewer than ``min_files`` present, or the layout already
    averages at least half the target size — rewriting would churn
    bytes for no planning win)."""
    n_files, total = _dir_parquet_stats(path)
    if n_files < min_files:
        return 0
    target_bytes = target_file_mb * 1024 * 1024
    want = max(1, -(-total // target_bytes))
    if n_files <= want or total / n_files >= target_bytes / 2:
        return 0
    return int(want)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    min_files: int = 2,
) -> int:
    """Compact the Parquet directory at ``path`` toward
    ``target_file_mb`` files; returns the new file count (0 = no-op).
    Shuffle-free (coalesce) + atomic swap."""
    want = plan_compaction(path, target_file_mb, min_files)
    if want == 0:
        return 0
    df = dio.read_parquet(spark, path).coalesce(want)
    dio.atomic_overwrite(df, path)
    return _dir_parquet_stats(path)[0]
