"""Audit-table protocol (S4, reference pipeline/data_pipeline.py:219-242).

Append-only one-row loads recording table, count, status, timestamp,
and the list of source blob paths (``ARRAY<STRING>`` — the one
array-typed stored column in the reference).

Unlike the reference (BQ autodetect), the schema is explicit — schema
inference drift is a recorded reference defect class (SURVEY.md
§7.4.4).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

AUDIT_SCHEMA = StructType(
    [
        StructField("table_name", StringType(), False),
        StructField("record_count", LongType(), False),
        StructField("status", StringType(), False),
        StructField("load_timestamp", TimestampType(), False),
        StructField("source_files", ArrayType(StringType()), True),
    ]
)


def audit_row(
    spark: SparkSession,
    table_name: str,
    record_count: int,
    status: str,
    source_files: list[str] | str | None,
) -> DataFrame:
    """One-row audit DataFrame. A plain string is coerced to a
    1-element list (reference pipeline/data_pipeline.py:222-223);
    None → empty list (fixes the reference's unbound-variable failure
    path, pipeline/data_pipeline.py:269 — defect ledger item 2)."""
    if source_files is None:
        source_files = []
    elif isinstance(source_files, str):
        source_files = [source_files]
    row = [
        (
            table_name,
            int(record_count),
            status,
            dt.datetime.now(dt.timezone.utc).replace(tzinfo=None),
            list(source_files),
        )
    ]
    # ONE row by construction: parallelize it as ONE slice so each
    # append write runs one task instead of defaultParallelism
    # near-empty ones (createDataFrame's default slicing). NOT
    # coalesce(1): coalescing the 32-slice parent couples the single
    # task to every parent partition's locality and was measured
    # paying a multi-second locality wait per write in local mode.
    return spark.createDataFrame(
        spark.sparkContext.parallelize(row, 1), AUDIT_SCHEMA
    ).withColumn("load_timestamp", F.col("load_timestamp"))
