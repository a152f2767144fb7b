"""Partition-pruned MERGE: only touched partitions rewritten,
untouched partition files bit-identical, results match full merge."""

from __future__ import annotations

import os
import glob

from pyspark.sql import Row
from pyspark.sql import functions as F

from dish_data_pipeline_spark.operators.upsert import upsert
from dish_data_pipeline_spark.operators.upsert_partitioned import (
    upsert_partitioned,
    write_partitioned_target,
)


def _target_df(spark):
    rows = [
        Row(day="2024-01-01", k=1, v="a"),
        Row(day="2024-01-01", k=2, v="b"),
        Row(day="2024-01-02", k=3, v="c"),
        Row(day="2024-01-03", k=4, v="d"),
    ]
    return spark.createDataFrame(rows)


def _staging_df(spark):
    return spark.createDataFrame(
        [
            Row(day="2024-01-01", k=1, v="A"),   # update in day 01
            Row(day="2024-01-01", k=9, v="new"),  # insert in day 01
        ]
    )


def test_partitioned_upsert_matches_full_merge(spark, tmp_path):
    path = str(tmp_path / "tgt")
    write_partitioned_target(_target_df(spark), path, "day")
    affected = upsert_partitioned(
        spark, path, _staging_df(spark), keys=["day", "k"], partition_col="day"
    )
    assert affected == ["2024-01-01"]

    # partition-type inference reads `day` back as DATE → normalize
    got = {
        (str(r.day), r.k): r.v for r in spark.read.parquet(path).collect()
    }
    want = {
        (str(r.day), r.k): r.v
        for r in upsert(_target_df(spark), _staging_df(spark), ["day", "k"]).collect()
    }
    assert got == want
    assert got[("2024-01-01", 1)] == "A" and got[("2024-01-01", 9)] == "new"
    assert got[("2024-01-02", 3)] == "c"


def test_untouched_partitions_not_rewritten(spark, tmp_path):
    path = str(tmp_path / "tgt2")
    write_partitioned_target(_target_df(spark), path, "day")

    def files_with_mtime(day):
        return {
            f: os.path.getmtime(f)
            for f in glob.glob(os.path.join(path, f"day={day}", "*.parquet"))
        }

    before_02 = files_with_mtime("2024-01-02")
    before_01 = files_with_mtime("2024-01-01")
    assert before_02 and before_01
    upsert_partitioned(
        spark, path, _staging_df(spark), keys=["day", "k"], partition_col="day"
    )
    assert files_with_mtime("2024-01-02") == before_02  # untouched on disk
    assert files_with_mtime("2024-01-01") != before_01  # rewritten


def test_empty_staging_is_noop(spark, tmp_path):
    path = str(tmp_path / "tgt3")
    write_partitioned_target(_target_df(spark), path, "day")
    affected = upsert_partitioned(
        spark,
        path,
        _staging_df(spark).filter(F.lit(False)),
        keys=["day", "k"],
        partition_col="day",
    )
    assert affected == []
    assert spark.read.parquet(path).count() == 4


def test_keep_latest_dedup_inside(spark, tmp_path):
    path = str(tmp_path / "tgt4")
    write_partitioned_target(
        _target_df(spark).withColumn("ts", F.lit(0)), path, "day"
    )
    stg = spark.createDataFrame(
        [
            Row(day="2024-01-02", k=3, v="first", ts=1),
            Row(day="2024-01-02", k=3, v="latest", ts=2),
        ]
    )
    upsert_partitioned(
        spark, path, stg, keys=["day", "k"], partition_col="day", ts_col="ts"
    )
    got = {
        (str(r.day), r.k): r.v for r in spark.read.parquet(path).collect()
    }
    assert got[("2024-01-02", 3)] == "latest"
    assert len(got) == 4
