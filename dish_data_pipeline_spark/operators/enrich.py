"""Load-metadata enrichment (P1/P2) and lineage.

Reference adds two metadata columns per batch (reference
pipeline/data_pipeline.py:79-81): ``load_timestamp`` = now(UTC) and
``source_file`` = load date formatted ``YYYY-MM-DD``. Despite the
name, ``source_file`` is NOT a path — it is part of the merge key
(SURVEY.md §1.3). We keep those semantics and additionally offer
``with_lineage`` recording the true per-row input file via
``F.input_file_name()`` (what the column name pretends to be).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def add_load_metadata(df: DataFrame, load_date: dt.date | None = None) -> DataFrame:
    """Add ``load_timestamp`` (UTC now) and ``source_file``
    (load-date string, reference pipeline/data_pipeline.py:79-81).

    Pass ``load_date`` for deterministic replays/backfills; default
    is the current date/timestamp (session tz = UTC).
    """
    if load_date is None:
        ts = F.current_timestamp()
        sf = F.date_format(F.current_date(), "yyyy-MM-dd")
    else:
        ts = F.lit(dt.datetime.combine(load_date, dt.time())).cast("timestamp")
        sf = F.lit(load_date.strftime("%Y-%m-%d"))
    return df.withColumn("load_timestamp", ts).withColumn("source_file", sf)


def with_lineage(df: DataFrame, col: str = "input_file") -> DataFrame:
    """True per-row file lineage (the reference tracks blob paths
    only batch-level in the audit table, pipeline/data_pipeline.py:51)."""
    return df.withColumn(col, F.input_file_name())


def with_date_partitions(df: DataFrame, ts_col: str | None = None) -> DataFrame:
    """Add ``year``/``month``/``day`` partition columns for the raw
    zone layout (reference pipeline/data_pipeline.py:46-50).

    Derives from ``ts_col`` when given (event-time partitioning —
    fixes the reference defect where a run straddling midnight splits
    partitions by wall clock); else uses the current date.
    """
    src = F.col(ts_col) if ts_col else F.current_date()
    return (
        df.withColumn("year", F.year(src))
        .withColumn("month", F.format_string("%02d", F.month(src)))
        .withColumn("day", F.format_string("%02d", F.dayofmonth(src)))
    )
