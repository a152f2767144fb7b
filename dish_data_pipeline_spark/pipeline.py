"""End-to-end batch pipeline mirroring reference ``main()`` semantics
(reference pipeline/data_pipeline.py:245-272).

Per feed: extract → flatten+enrich → DQ gate → (recoverable-dup?
dedup and continue : skip + audit FAILED) → staging truncate-load →
keep-latest upsert into target → audit SUCCESS. Audit fires on the
failure path too (try/except, like the reference — but without its
unbound ``source_files`` bug, defect ledger item 2).

The six Airflow tasks of the reference DAG collapse into this one
driver program; XCom disappears because dataflow stays inside the
lazy plan (SURVEY.md §3.2).
"""

from __future__ import annotations

import datetime as dt
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from dish_data_pipeline_spark import io as dio
from dish_data_pipeline_spark.operators.audit import audit_row
from dish_data_pipeline_spark.operators.dedup import dedup_keyed
from dish_data_pipeline_spark.operators.enrich import add_load_metadata
from dish_data_pipeline_spark.operators.flatten import normalize_records
from dish_data_pipeline_spark.operators.quality import (
    DEFAULT_POLICIES,
    is_recoverable,
    run_data_quality_checks,
)
from dish_data_pipeline_spark.io_backends import TableBackend, get_backend
from dish_data_pipeline_spark.sources.rest import (
    fetch_paginated_data,
    records_to_dataframe,
)


@dataclass
class FeedConfig:
    """One feed = one endpoint + DQ policy + merge keys."""

    name: str
    endpoint: str
    keys: list[str]
    required: list[str]
    schema: object | None = None  # explicit StructType when known


@dataclass
class PipelineResult:
    table: str
    status: str
    record_count: int
    issues: list[str] = field(default_factory=list)


def run_feed(
    spark: SparkSession,
    feed: FeedConfig,
    base_url: str,
    warehouse_dir: str,
    http_get=None,
    load_date: dt.date | None = None,
    backend: "TableBackend | str" = "parquet",
) -> PipelineResult:
    """Run one feed end to end against a file warehouse layout:
    ``<warehouse>/raw/``, ``staging_<name>/``, ``tgt_<name>/``,
    ``load_audit/``.

    ``backend`` picks the target-table format (io_backends): the
    default join-based Parquet MERGE, or any TableBackend (e.g.
    'delta' for transaction-logged atomic MERGE INTO)."""
    if isinstance(backend, str):
        backend = get_backend(backend)
    raw_dir = os.path.join(warehouse_dir, "raw")
    staging_path = os.path.join(warehouse_dir, f"staging_{feed.name}")
    target_path = os.path.join(warehouse_dir, f"tgt_{feed.name}")
    audit_path = os.path.join(warehouse_dir, "load_audit")
    source_files: list[str] = []

    def _audit(count: int, status: str) -> None:
        dio.write_append(
            audit_row(spark, feed.name, count, status, source_files), audit_path
        )

    try:
        kwargs = {"http_get": http_get} if http_get else {}
        records, source_files = fetch_paginated_data(
            base_url,
            feed.endpoint,
            raw_zone_dir=raw_dir,
            name=feed.name,
            **kwargs,
        )
        df = records_to_dataframe(spark, records, feed.schema)
        df = add_load_metadata(normalize_records(df), load_date=load_date)
        # Reference pre-dedup (D1, pipeline/data_pipeline.py:84-85):
        # KEYED only when ``visit_date`` is present (the daily_visits
        # shape); FULL-ROW for every other feed — so key-duplicates
        # that are not exact-row duplicates survive to the DQ gate
        # and exercise the recoverable-duplicate routing below (D2,
        # reference :253-258). Generalizing this to "keyed whenever
        # the key columns exist" (the pre-round-10 behavior) made the
        # recovery branch dead code for all feeds.
        if "visit_date" in df.columns:
            pre_keys = [k for k in feed.keys if k in df.columns]
            df = dedup_keyed(df, pre_keys or None)
        else:
            df = dedup_keyed(df, None)

        # Compute the feed relation ONCE: the DQ gate's aggregate,
        # the staging write and the audited count all consume the
        # same extract→normalize→dedup plan, which previously
        # re-executed per action (driver re-serialization of the
        # fetched records plus the dedup window shuffle, 2-3×).
        # The cache is feed-sized (the reference ingests ~3k
        # rows/run) and released in the finally below.
        cached = df = df.persist()

        # Feed-specific config wins over the built-in defaults — a
        # feed named like a default (daily_visits/ga_sessions) must
        # be gated on ITS OWN required/keys, matching the dedup path.
        policies = {
            **DEFAULT_POLICIES,
            feed.name: {"required": feed.required, "keys": feed.keys},
        }
        try:
            passed, issues = run_data_quality_checks(df, feed.name, policies)
            if not passed:
                fatal = [i for i in issues if not is_recoverable(i)]
                if fatal:
                    _audit(0, f"FAILED: {', '.join(issues)}")
                    return PipelineResult(feed.name, "FAILED", 0, issues)
                # Recoverable duplicates: dedup by key and continue
                # (reference pipeline/data_pipeline.py:253-258) — a
                # plan over the cached base, so the recovery pass
                # re-windows cached rows, not the source fetch.
                df = dedup_keyed(df, feed.keys)

            dio.write_staging(df, staging_path)
            # Audited count = the staged row count; counting the
            # (cached) relation just written avoids re-listing and
            # re-scanning the parquet it produced.
            count = df.count()
        finally:
            cached.unpersist()
        staged = spark.read.parquet(staging_path)

        if backend.exists(spark, target_path):
            backend.merge_keep_latest(
                spark, target_path, staged, feed.keys, "load_timestamp"
            )
        else:
            backend.create(staged, target_path)

        _audit(count, "SUCCESS")
        return PipelineResult(feed.name, "SUCCESS", count, issues)
    except Exception as exc:  # audit-on-failure, reference :266-271
        _audit(0, f"FAILED: {exc}")
        return PipelineResult(feed.name, "FAILED", 0, [str(exc)])
