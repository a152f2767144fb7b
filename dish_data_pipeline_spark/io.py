"""Readers and writers for the engine's three-zone layout.

Mirrors the reference's raw/staging/target/audit zones
(reference README.md:195-203, pipeline/data_pipeline.py:46-53,
140-148, 234-237) on files Spark natively understands:

- raw zone: Hive-style date-partitioned JSON
  (``year=YYYY/month=MM/day=DD``) — partition pruning is free on read.
- staging/target/audit: Parquet (columnar, predicate pushdown,
  column pruning).

At 100 TB the same code holds: partitioned writes shard per task, and
readers get pushdown + pruning from the DataSource v2 path.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark's vectorized
    reader rejects those outright (PARQUET_TYPE_ILLEGAL)."""
    try:
        import pyarrow.parquet as pq
        import pyarrow as pa

        schema = pq.read_schema(path)
        return [
            f.name
            for f in schema
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        ]
    except Exception:
        return []


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet`` with transparent TIMESTAMP(NANOS)
    support: ns columns are read as raw longs
    (``legacy.parquet.nanosAsLong``) and converted to microsecond
    timestamps (ns→µs floor — lossless for µs-grain data)."""
    ns_cols = _nanos_timestamp_cols(path)
    if not ns_cols:
        return spark.read.parquet(path)
    # The flag is consumed at schema resolution (inside .parquet()),
    # so it can be restored immediately after — later plain reads of
    # TIMESTAMP(NANOS) files in the same session are unaffected.
    conf_key = "spark.sql.legacy.parquet.nanosAsLong"
    try:
        prev: str | None = spark.conf.get(conf_key)
    except Exception:
        prev = None
    spark.conf.set(conf_key, "true")
    try:
        df = spark.read.parquet(path)
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table (``<sf_dir>/<name>.parquet``)."""
    return read_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TPCH_TABLES
) -> dict[str, DataFrame]:
    return {n: read_table(spark, sf_dir, n) for n in names}


def register_temp_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TPCH_TABLES
) -> None:
    """Register each table as a temp view for ``spark.sql`` queries."""
    for n in names:
        read_table(spark, sf_dir, n).createOrReplaceTempView(n)


def write_raw_zone(df: DataFrame, path: str, fmt: str = "json") -> None:
    """Raw/landing-zone writer: Hive-style date partitions.

    Spark-native equivalent of the reference's per-page GCS blob
    layout ``raw_api_data/<name>/year=/month=/day=/`` (reference
    pipeline/data_pipeline.py:46-53). Requires ``year``/``month``/
    ``day`` columns (see enrich.with_date_partitions).
    """
    (
        df.write.mode("append")
        .partitionBy("year", "month", "day")
        .format(fmt)
        .save(path)
    )


def write_staging(df: DataFrame, path: str) -> None:
    """Truncate-load staging write (reference WRITE_TRUNCATE,
    pipeline/data_pipeline.py:141-148)."""
    df.write.mode("overwrite").parquet(path)


def write_append(df: DataFrame, path: str) -> None:
    """Append write (audit sink, reference
    pipeline/data_pipeline.py:234-237)."""
    df.write.mode("append").parquet(path)


def atomic_overwrite(df: DataFrame, path: str) -> None:
    """Overwrite ``path`` with ``df`` safely even when ``df`` reads
    from ``path`` (the upsert read-modify-write cycle).

    Plain ``mode("overwrite")`` on the source path would delete the
    files mid-read. Strategy: materialize to a temp sibling, then
    swap directories. This gives crash-safety up to the final rename
    pair; for true multi-writer atomicity use a table format with a
    transaction log (Delta/Iceberg ``MERGE INTO``) — the operator
    composition in operators/upsert.py is format-agnostic, so only
    this writer changes.
    """
    base = path.rstrip("/")
    tmp = os.path.join(
        os.path.dirname(base), f".tmp-{uuid.uuid4().hex}-{os.path.basename(base)}"
    )
    df.write.mode("overwrite").parquet(tmp)
    old = tmp + ".old"
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)
