"""Validated file sources: explicit-schema CSV scan with
corrupt-record routing.

The reference trusts BigQuery ``autodetect`` on every load
(reference pipeline/data_pipeline.py:141-144); the engine's rule is
the opposite (SURVEY §7.4.4): explicit ``StructType`` per feed,
inference only in exploratory paths. A malformed line then has to go
SOMEWHERE — silently nulling it (Spark's default DROPMALFORMED /
bare PERMISSIVE) loses data without a trace. This source routes each
malformed raw line to a rejects relation instead, preserving the
original text for replay/debugging, mirroring the DQ philosophy of
the reference's audit trail (bad input is recorded, not dropped).

Scale: the scan is a plain distributed CSV read — schema applied per
task, no driver involvement; the good/reject split is two map-side
filters over one persisted scan (persisted because Spark cannot push
a query that references ONLY the corrupt-record column — the
documented engine restriction — and because it keeps the file read
to a single pass for both outputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from dish_data_pipeline_spark.cache_registry import tracked_persist

CORRUPT_COL = "_corrupt_record"


def read_csv_validated(
    spark: SparkSession,
    path: str,
    schema: StructType,
    **options: str,
) -> tuple[DataFrame, DataFrame]:
    """CSV scan under an explicit schema; returns (good, rejects).

    ``good`` has exactly ``schema``'s columns; ``rejects`` is one
    ``raw_line STRING`` column holding each malformed source line
    verbatim. ``options`` pass through to the CSV reader (header,
    sep, ...)."""
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(f"schema must not already contain {CORRUPT_COL!r}")
    augmented = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )
    scan = tracked_persist(
        spark.read.options(
            mode="PERMISSIVE",
            columnNameOfCorruptRecord=CORRUPT_COL,
            **options,
        )
        .schema(augmented)
        .csv(path)
    )
    good = scan.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    rejects = scan.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, rejects
