"""Task-granular orchestrator adapter: the six DAG stages must
reproduce run_feed's outcomes, short-circuit on fatal DQ, and fire
the audit stage even when a mid-pipeline stage raises (ALL_DONE)."""

from __future__ import annotations

import datetime as dt

from dish_data_pipeline_spark.orchestration import (
    STAGES,
    StageContext,
    run_stages,
    stage_audit_log,
    stage_dq_check,
    stage_extract,
    stage_transform,
)
from tests.test_pipeline import FEED, visits_server


def _ctx(spark, tmp_path, http_get):
    return StageContext(
        spark=spark,
        feed=FEED,
        base_url="http://fake",
        warehouse_dir=str(tmp_path / "wh"),
        http_get=http_get,
        load_date=dt.date(2024, 2, 1),
    )


def test_stages_match_run_feed_success(spark, tmp_path):
    ctx = _ctx(spark, tmp_path, visits_server())
    res = run_stages(ctx)
    assert res.status == "SUCCESS" and res.record_count == 8
    tgt = spark.read.parquet(f"{ctx.warehouse_dir}/tgt_daily_visits")
    assert tgt.count() == 8
    audit = spark.read.parquet(f"{ctx.warehouse_dir}/load_audit").collect()
    assert len(audit) == 1 and audit[0].status == "SUCCESS"


def test_dq_short_circuit_skips_compute_but_audits(spark, tmp_path):
    def empty(url):
        return 200, {"records": []}

    ctx = _ctx(spark, tmp_path, empty)
    res = run_stages(ctx)
    assert res.status == "FAILED"
    # compute stages after the short-circuit never ran: no staging,
    # no target, but the FAILED audit row exists.
    import os

    assert not os.path.exists(f"{ctx.warehouse_dir}/staging_daily_visits")
    assert not os.path.exists(f"{ctx.warehouse_dir}/tgt_daily_visits")
    audit = spark.read.parquet(f"{ctx.warehouse_dir}/load_audit").collect()
    assert len(audit) == 1 and audit[0].status.startswith("FAILED")


def test_injected_failure_still_audits(spark, tmp_path):
    """ALL_DONE semantics: a stage that RAISES mid-pipeline must not
    suppress the audit record (reference trigger_rule=ALL_DONE,
    DAG/etl_google_analytics_dag.py:177-185)."""
    ctx = _ctx(spark, tmp_path, visits_server())

    def exploding_stage(_ctx):
        raise RuntimeError("disk full")

    # splice the failure in place of load_staging
    stages = list(STAGES)
    stages[3] = exploding_stage
    import dish_data_pipeline_spark.orchestration as orch

    original = orch.STAGES
    orch.STAGES = tuple(stages)
    try:
        res = run_stages(ctx)
    finally:
        orch.STAGES = original
    assert res.status == "FAILED"
    audit = spark.read.parquet(f"{ctx.warehouse_dir}/load_audit").collect()
    assert len(audit) == 1
    assert audit[0].status.startswith("FAILED") and "disk full" in audit[0].status
    # upsert (after the failed stage) never ran
    import os

    assert not os.path.exists(f"{ctx.warehouse_dir}/tgt_daily_visits")


def test_stages_are_individually_drivable(spark, tmp_path):
    """A scheduler can call stages one at a time with its own retry/
    timeout wrappers — state rides exclusively on the context."""
    ctx = _ctx(spark, tmp_path, visits_server())
    assert stage_extract(ctx) is True
    assert len(ctx.xcom["source_files"]) == 2
    assert stage_transform(ctx) is True
    assert stage_dq_check(ctx) is True  # dup is recoverable → dedup
    assert ctx.xcom["df"].count() == 8
