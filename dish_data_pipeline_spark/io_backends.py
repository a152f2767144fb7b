"""Pluggable table-format backends for the target-zone MERGE.

The reference's MERGE runs inside BigQuery and is atomic under
concurrent writers (reference pipeline/data_pipeline.py:155-216).
This engine's default target zone is plain Parquet, where the
equivalent is a read→join→write cycle finished by a directory swap
(io.atomic_overwrite) — crash-safe but single-writer. A lakehouse
deployment wants a transaction-logged table format instead, where
``MERGE INTO`` is truly atomic and multi-writer.

This module makes that a *backend choice* rather than a rewrite:
the upsert composition (operators/upsert.py) is format-agnostic, so
each backend only decides how a target table is created, read, and
merged into.

- ``ParquetSwapBackend`` (default): the join-based MERGE + directory
  swap. Works anywhere Spark can list files; single-writer scope is
  documented on io.atomic_overwrite.
- ``DeltaBackend``: native ``DeltaTable.merge`` — optimistic
  concurrency via the transaction log, multi-writer safe, and at
  100 TB the data-skipping/file-pruning MERGE path rewrites only the
  files whose key ranges intersect staging. Import-gated: the
  ``delta-spark`` package is an *optional* dependency (not baked
  into this container), so constructing the backend without it
  raises ``BackendUnavailable`` with an actionable message. The
  merge-condition SQL builder is a plain function, unit-tested
  without the dependency.

An Iceberg backend would follow the same protocol (``MERGE INTO``
via spark.sql against a catalog table); it needs a catalog
configured on the session, which file paths alone can't express, so
it is left to deployments that have one.
"""

from __future__ import annotations

import os
from collections.abc import Sequence
from typing import Protocol

from pyspark.sql import DataFrame, SparkSession

from dish_data_pipeline_spark import io as dio
from dish_data_pipeline_spark.operators.dedup import keep_latest
from dish_data_pipeline_spark.operators.upsert import upsert


class BackendUnavailable(RuntimeError):
    """The backend's optional dependency is not installed."""


class TableBackend(Protocol):
    """What the pipeline needs from a target-table format."""

    name: str

    def exists(self, spark: SparkSession, path: str) -> bool: ...

    def read(self, spark: SparkSession, path: str) -> DataFrame: ...

    def create(self, df: DataFrame, path: str) -> None: ...

    def merge_keep_latest(
        self,
        spark: SparkSession,
        path: str,
        staging: DataFrame,
        keys: Sequence[str],
        ts_col: str,
        tiebreakers: Sequence[str] = (),
    ) -> None:
        """MERGE staging into the table at ``path``: staging is first
        deduped keep-latest per key (W1), then matched target rows are
        replaced and unmatched staging rows inserted (J2)."""
        ...


class ParquetSwapBackend:
    """Join-based MERGE on plain Parquet, finished by a directory
    swap. Catalyst broadcasts the (small) staging side, so the target
    is never shuffled; the swap is crash-safe but single-writer
    (io.atomic_overwrite docstring)."""

    name = "parquet"

    def exists(self, spark: SparkSession, path: str) -> bool:
        return os.path.exists(path)

    def read(self, spark: SparkSession, path: str) -> DataFrame:
        return dio.read_parquet(spark, path)

    def create(self, df: DataFrame, path: str) -> None:
        dio.write_staging(df, path)

    def merge_keep_latest(
        self,
        spark: SparkSession,
        path: str,
        staging: DataFrame,
        keys: Sequence[str],
        ts_col: str,
        tiebreakers: Sequence[str] = (),
    ) -> None:
        target = self.read(spark, path)
        deduped = keep_latest(staging, keys, ts_col, tiebreakers)
        dio.atomic_overwrite(upsert(target, deduped, keys), path)


def merge_condition(keys: Sequence[str], left: str = "t", right: str = "s") -> str:
    """SQL ON-condition for a MERGE on bare equality keys — matches
    the join-based upsert's semantics (plain ``=``: null keys never
    match, same as ``DataFrame.join`` on column names)."""
    if not keys:
        raise ValueError("merge requires at least one key column")
    return " AND ".join(f"{left}.`{k}` = {right}.`{k}`" for k in keys)


class DeltaBackend:
    """Native Delta Lake MERGE: atomic + multi-writer via the
    transaction log. Requires the optional ``delta-spark`` package
    AND a session with the Delta SQL extension configured."""

    name = "delta"

    def __init__(self) -> None:
        try:
            from delta.tables import DeltaTable  # noqa: F401
        except ImportError as exc:
            raise BackendUnavailable(
                "DeltaBackend needs the optional 'delta-spark' package "
                "(pip install delta-spark) and a SparkSession configured "
                "with io.delta.sql.DeltaSparkSessionExtension; the "
                "default ParquetSwapBackend has no extra dependencies."
            ) from exc

    def exists(self, spark: SparkSession, path: str) -> bool:
        from delta.tables import DeltaTable

        return DeltaTable.isDeltaTable(spark, path)

    def read(self, spark: SparkSession, path: str) -> DataFrame:
        return spark.read.format("delta").load(path)

    def create(self, df: DataFrame, path: str) -> None:
        df.write.format("delta").mode("overwrite").save(path)

    def merge_keep_latest(
        self,
        spark: SparkSession,
        path: str,
        staging: DataFrame,
        keys: Sequence[str],
        ts_col: str,
        tiebreakers: Sequence[str] = (),
    ) -> None:
        from delta.tables import DeltaTable

        deduped = keep_latest(staging, keys, ts_col, tiebreakers)
        (
            DeltaTable.forPath(spark, path)
            .alias("t")
            .merge(deduped.alias("s"), merge_condition(keys))
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )


_BACKENDS = {
    "parquet": ParquetSwapBackend,
    "delta": DeltaBackend,
}


def get_backend(name: str) -> TableBackend:
    """Resolve a backend by name ('parquet' default path, 'delta').

    Raises ``ValueError`` for unknown names, ``BackendUnavailable``
    when the named backend's optional dependency is missing."""
    try:
        cls = _BACKENDS[name]
    except KeyError:
        raise ValueError(
            f"unknown table backend {name!r}; available: {sorted(_BACKENDS)}"
        ) from None
    return cls()
