"""Table-maintenance operators: the jobs that keep a 100 TB Parquet
lake healthy.

- ``compact``: rewrite a table (or chosen partitions) into
  size-targeted files. Streaming sinks and fine-grained merges leave
  small files; scans then pay per-file open/footer costs and
  schedulers drown in splits.
- ``table_stats``: cheap file-level health report (file count,
  bytes, min/max file size) to decide WHEN to compact — driver-side
  filesystem metadata only, no data read.
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
    ``total_bytes / target_file_bytes`` (min 1). Uses the atomic
    swap writer so readers never observe a half-compacted table."""
    stats = table_stats(path)
    n_out = max(1, round(stats.total_bytes / target_file_bytes))
    df = spark.read.parquet(path).coalesce(n_out)
    atomic_overwrite(df, path)
    return table_stats(path)
