"""Compaction maintenance + second-wave streaming semantics
(streaming dedup within watermark, stream-static join)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from dish_data_pipeline_spark.io_maintenance import compact, table_stats


def test_compact_reduces_file_count(spark, tmp_path):
    p = str(tmp_path / "frag")
    # 40 tiny files
    spark.range(4000).repartition(40).write.parquet(p)
    before = table_stats(p)
    assert before.n_files >= 40
    data_before = sorted(r.id for r in spark.read.parquet(p).collect())

    after = compact(spark, p, target_file_bytes=10**9)
    assert after.n_files == 1
    assert after.total_bytes > 0
    data_after = sorted(r.id for r in spark.read.parquet(p).collect())
    assert data_after == data_before  # lossless rewrite


SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _write(path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_streaming_dedup_within_watermark(spark, tmp_path):
    rows = [
        {"event_id": 1, "ts": "2024-01-01T00:00:00Z", "user_id": 1,
         "event_type": "click", "value": 1.0},
        {"event_id": 1, "ts": "2024-01-01T00:00:30Z", "user_id": 1,
         "event_type": "click", "value": 1.0},  # duplicate delivery
        {"event_id": 2, "ts": "2024-01-01T00:01:00Z", "user_id": 1,
         "event_type": "view", "value": 2.0},
    ]
    _write(tmp_path / "in" / "a.json", rows)
    stream = spark.readStream.schema(SCHEMA).json(str(tmp_path / "in"))
    deduped = stream.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    out = spark.sql("SELECT event_id FROM dedup_stream").collect()
    assert sorted(r.event_id for r in out) == [1, 2]


def test_stream_static_join(spark, tmp_path):
    _write(
        tmp_path / "in2" / "a.json",
        [
            {"event_id": 1, "ts": "2024-01-01T00:00:00Z", "user_id": 10,
             "event_type": "click", "value": 1.0},
            {"event_id": 2, "ts": "2024-01-01T00:01:00Z", "user_id": 20,
             "event_type": "view", "value": 2.0},
        ],
    )
    users = spark.createDataFrame(
        [(10, "alpha"), (20, "beta")], "user_id long, segment string"
    )
    stream = spark.readStream.schema(SCHEMA).json(str(tmp_path / "in2"))
    joined = stream.join(F.broadcast(users), "user_id")
    q = (
        joined.writeStream.format("memory")
        .queryName("sj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {r.event_id: r.segment for r in spark.sql("SELECT * FROM sj").collect()}
    assert got == {1: "alpha", 2: "beta"}
