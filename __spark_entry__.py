"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The catalog itself lives in ``dish_data_pipeline_spark.plans``
(QUERIES: name → (spark fn, DuckDB oracle SQL)); this module just
adapts it to the driver's contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Fallback for uninstalled checkouts; `pip install -e .` /
# `python setup.py develop` makes the package importable without it.
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dish_data_pipeline_spark.plans import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: keep-latest window
    dedup over events + aggregate (SURVEY.md §7.2 minimum slice)."""
    return QUERIES["keep_latest_events"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2/§2.13."""
    return {name: qd.fn for name, qd in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for EVERY query in the catalog — the LSH-family
    and iterative oracles replicate the algorithms exactly via the
    portable hash and WITH RECURSIVE; see plans/oracle_dedup.py."""
    return {name: qd.sql for name, qd in QUERIES.items() if qd.sql is not None}
