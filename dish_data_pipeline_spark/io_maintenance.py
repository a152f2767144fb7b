"""Table-maintenance operators: the jobs that keep a 100 TB Parquet
lake healthy.

- ``table_stats``: cheap file-level health report (file count,
  bytes, min/max file size) to decide WHEN to compact — driver-side
  filesystem metadata only, no data read.
- ``compact``: rewrite a table (or chosen partitions) into
  size-targeted files. Streaming sinks and fine-grained merges leave
  small files; scans then pay per-file open/footer costs and
  schedulers drown in splits. Shuffle-free (coalesce concatenates
  input splits) + atomic swap, so readers never observe a
  half-compacted table.
- ``plan_compaction`` / ``compact_parquet``: the idempotent planner
  tier — computes the target file count from CURRENT on-disk bytes
  and declines the rewrite when it wouldn't help (already compact,
  or fewer than ``min_files`` present), so a scheduled maintenance
  job can run unconditionally without churning bytes.

BigQuery compacts internally (the reference never thinks about it);
a file-based lakehouse must do it itself — this is Delta
``OPTIMIZE``'s plain-Parquet equivalent. Partitioned layouts compact
per partition directory (every helper works on any directory of
Parquet files).
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass

from pyspark.sql import SparkSession

from dish_data_pipeline_spark.io import atomic_overwrite


@dataclass
class TableStats:
    n_files: int
    total_bytes: int
    min_file_bytes: int
    max_file_bytes: int

    @property
    def avg_file_bytes(self) -> float:
        return self.total_bytes / self.n_files if self.n_files else 0.0


def table_stats(path: str) -> TableStats:
    files = [
        f
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.isfile(f)
    ]
    sizes = [os.path.getsize(f) for f in files]
    return TableStats(
        n_files=len(files),
        total_bytes=sum(sizes),
        min_file_bytes=min(sizes) if sizes else 0,
        max_file_bytes=max(sizes) if sizes else 0,
    )


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> TableStats:
    """Rewrite ``path`` with file count sized to
    ``total_bytes / target_file_bytes`` (min 1). Unconditional — see
    ``compact_parquet`` for the no-op-when-already-compact tier."""
    stats = table_stats(path)
    n_out = max(1, round(stats.total_bytes / target_file_bytes))
    df = spark.read.parquet(path).coalesce(n_out)
    atomic_overwrite(df, path)
    return table_stats(path)


def plan_compaction(
    path: str, target_file_mb: int = 128, min_files: int = 2
) -> int:
    """Target output file count, or 0 when compaction isn't worth a
    rewrite (fewer than ``min_files`` present, or the layout already
    averages at least half the target size — rewriting would churn
    bytes for no planning win)."""
    stats = table_stats(path)
    if stats.n_files < min_files:
        return 0
    target_bytes = target_file_mb * 1024 * 1024
    want = max(1, -(-stats.total_bytes // target_bytes))
    if stats.n_files <= want or stats.avg_file_bytes >= target_bytes / 2:
        return 0
    return int(want)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    min_files: int = 2,
) -> int:
    """Compact the Parquet directory at ``path`` toward
    ``target_file_mb`` files; returns the new file count (0 = no-op,
    making scheduled re-runs idempotent)."""
    want = plan_compaction(path, target_file_mb, min_files)
    if want == 0:
        return 0
    df = spark.read.parquet(path).coalesce(want)
    atomic_overwrite(df, path)
    return table_stats(path).n_files
