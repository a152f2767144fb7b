"""Round-14 optimization internals of the streaming replay harness
(plans/analytics): the single-job batch writer and the size-derived
state-partition wrapper."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from dish_data_pipeline_spark.plans.analytics import (
    _with_replay_shuffle_partitions,
    _write_replay_batches,
)


def test_replay_batch_writer_one_file_per_batch(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 3).alias("grp")
    )
    out = str(tmp_path / "batches")
    os.makedirs(out)
    files = _write_replay_batches(
        out, (df.filter("id < 40"), df.filter("id >= 40"))
    )
    assert [os.path.basename(f) for f in files] == [
        "b0.parquet", "b1.parquet",
    ]
    # mtime strictly increasing — the file source's replay order
    assert os.path.getmtime(files[0]) < os.path.getmtime(files[1])
    b0 = spark.read.parquet(files[0])
    b1 = spark.read.parquet(files[1])
    # the _replay_batch tag must NOT leak into the written schema
    assert b0.columns == df.columns
    assert b0.count() == 40 and b1.count() == 60
    assert b0.filter("id >= 40").count() == 0


def test_replay_batch_writer_empty_batch_fallback(spark, tmp_path):
    df = spark.range(10).select(F.col("id"))
    out = str(tmp_path / "batches")
    os.makedirs(out)
    # middle batch is EMPTY: partitionBy writes no directory for it,
    # so the writer must fall back to an explicit empty-file write
    files = _write_replay_batches(
        out,
        (df.filter("id < 5"), df.filter("id < 0"), df.filter("id >= 5")),
    )
    assert len(files) == 3 and all(os.path.exists(f) for f in files)
    empty = spark.read.parquet(files[1])
    assert empty.count() == 0
    assert empty.columns == df.columns


def test_replay_shuffle_partitions_sized_and_restored(spark, tmp_path):
    df = spark.range(1000)
    p = str(tmp_path / "b0.parquet")
    df.coalesce(1).write.parquet(str(tmp_path / "stage"))
    (src,) = [
        f
        for f in os.listdir(str(tmp_path / "stage"))
        if f.endswith(".parquet")
    ]
    os.rename(str(tmp_path / "stage" / src), p)

    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    seen = {}

    def fake_start():
        seen["n"] = spark.conf.get(key)

        class _Q:
            def awaitTermination(self, _t):
                return None

        return _Q()

    _with_replay_shuffle_partitions(spark, [p], fake_start)
    # a few-KB replay derives 1 state partition; session conf restored
    assert seen["n"] == "1"
    assert spark.conf.get(key) == before


def test_replay_shuffle_partitions_explicit_override_and_error_restore(
    spark, tmp_path
):
    df = spark.range(10)
    stage = str(tmp_path / "stage")
    df.coalesce(1).write.parquet(stage)
    (src,) = [f for f in os.listdir(stage) if f.endswith(".parquet")]
    p = str(tmp_path / "b0.parquet")
    os.rename(os.path.join(stage, src), p)

    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    seen = {}

    def fake_start():
        seen["n"] = spark.conf.get(key)
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        _with_replay_shuffle_partitions(
            spark, [p], fake_start, explicit=7
        )
    assert seen["n"] == "7"
    # conf restored even when the stream fails to start
    assert spark.conf.get(key) == before
