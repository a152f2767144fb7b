"""Pluggable table-format backends (io_backends): the parquet swap
path end-to-end, backend routing through run_feed, the MERGE
condition builder, and the delta import gate (reference parity:
the reference's MERGE is atomic inside BigQuery,
pipeline/data_pipeline.py:155-216 — DeltaBackend is the engine's
transaction-logged equivalent)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from dish_data_pipeline_spark.io_backends import (
    BackendUnavailable,
    DeltaBackend,
    ParquetSwapBackend,
    get_backend,
    merge_condition,
)
from dish_data_pipeline_spark.operators.upsert import upsert_keep_latest
from dish_data_pipeline_spark.pipeline import FeedConfig, run_feed
from tests.test_pipeline import FEED, visits_server


def _delta_available() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def test_parquet_backend_matches_upsert_keep_latest(spark, tmp_path):
    path = str(tmp_path / "tgt")
    be = ParquetSwapBackend()
    tgt = spark.createDataFrame(
        [Row(k="a", v=1, ts=1), Row(k="b", v=2, ts=1)]
    )
    stg = spark.createDataFrame(
        [
            Row(k="a", v=10, ts=2),
            Row(k="a", v=5, ts=1),  # stale duplicate — keep-latest drops it
            Row(k="c", v=30, ts=2),
        ]
    )
    assert not be.exists(spark, path)
    be.create(tgt, path)
    assert be.exists(spark, path)
    be.merge_keep_latest(spark, path, stg, ["k"], "ts")

    got = sorted(map(tuple, be.read(spark, path).select("k", "v", "ts").collect()))
    want = sorted(
        map(
            tuple,
            upsert_keep_latest(tgt, stg, ["k"], "ts")
            .select("k", "v", "ts")
            .collect(),
        )
    )
    assert got == want == [("a", 10, 2), ("b", 2, 1), ("c", 30, 2)]


class _RecordingBackend(ParquetSwapBackend):
    """Parquet semantics + a call log, to prove run_feed routes every
    target-table touch through the backend protocol."""

    def __init__(self) -> None:
        self.calls: list[str] = []

    def exists(self, spark, path):
        self.calls.append("exists")
        return super().exists(spark, path)

    def create(self, df, path):
        self.calls.append("create")
        super().create(df, path)

    def merge_keep_latest(self, spark, path, staging, keys, ts_col, tiebreakers=()):
        self.calls.append("merge")
        super().merge_keep_latest(spark, path, staging, keys, ts_col, tiebreakers)


def test_run_feed_routes_through_backend(spark, tmp_path):
    wh = str(tmp_path / "wh")
    be = _RecordingBackend()
    r1 = run_feed(
        spark, FEED, "http://x", wh, http_get=visits_server(), backend=be
    )
    assert r1.status == "SUCCESS"
    assert be.calls == ["exists", "create"]
    r2 = run_feed(
        spark, FEED, "http://x", wh, http_get=visits_server(), backend=be
    )
    assert r2.status == "SUCCESS"
    assert be.calls == ["exists", "create", "exists", "merge"]


def test_get_backend_names():
    assert isinstance(get_backend("parquet"), ParquetSwapBackend)
    with pytest.raises(ValueError, match="unknown table backend"):
        get_backend("bigquery")


def test_merge_condition_sql():
    assert merge_condition(["k"]) == "t.`k` = s.`k`"
    assert (
        merge_condition(["a", "b"], "tgt", "stg")
        == "tgt.`a` = stg.`a` AND tgt.`b` = stg.`b`"
    )
    with pytest.raises(ValueError):
        merge_condition([])


@pytest.mark.skipif(_delta_available(), reason="delta-spark installed")
def test_delta_backend_gated_when_dependency_missing():
    with pytest.raises(BackendUnavailable, match="delta-spark"):
        DeltaBackend()
    with pytest.raises(BackendUnavailable):
        get_backend("delta")


@pytest.mark.skipif(not _delta_available(), reason="delta-spark not installed")
def test_delta_backend_merge(spark, tmp_path):
    path = str(tmp_path / "delta_tgt")
    be = DeltaBackend()
    tgt = spark.createDataFrame([Row(k="a", v=1, ts=1)])
    stg = spark.createDataFrame([Row(k="a", v=10, ts=2), Row(k="b", v=2, ts=2)])
    be.create(tgt, path)
    be.merge_keep_latest(spark, path, stg, ["k"], "ts")
    got = sorted(map(tuple, be.read(spark, path).select("k", "v").collect()))
    assert got == [("a", 10), ("b", 2)]
