"""Structured Streaming: watermarked windows, session windows, and
the foreachBatch upsert (idempotent replay) — SURVEY.md §7.6."""

from __future__ import annotations

import json

import pytest

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from dish_data_pipeline_spark.streaming import (
    stream_raw_zone,
    stream_upsert_to_target,
    windowed_event_counts,
)
from dish_data_pipeline_spark.streaming.pipeline import sessionized_counts

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _write_events(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    with open(path / "part-0.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


EVENTS = [
    {"event_id": 1, "ts": "2024-01-01T00:05:00Z", "user_id": 1, "event_type": "click", "value": 1.0},
    {"event_id": 2, "ts": "2024-01-01T00:15:00Z", "user_id": 1, "event_type": "click", "value": 2.0},
    {"event_id": 3, "ts": "2024-01-01T01:10:00Z", "user_id": 1, "event_type": "view", "value": 3.0},
    {"event_id": 4, "ts": "2024-01-01T03:00:00Z", "user_id": 2, "event_type": "click", "value": 4.0},
]


def _run_stream_to_memory(spark, df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if name == "raw" else "complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    return spark.sql(f"SELECT * FROM {name}")


def test_windowed_counts_from_file_stream(spark, tmp_path):
    _write_events(tmp_path / "raw", EVENTS)
    stream = stream_raw_zone(spark, str(tmp_path / "raw"), SCHEMA)
    assert stream.isStreaming
    counts = windowed_event_counts(stream)
    out = _run_stream_to_memory(spark, counts, "win_counts")
    rows = {
        (r.window_start.isoformat(), r.event_type): (r.n_events, r.sum_value)
        for r in out.collect()
    }
    # hour 0: two clicks; hour 1: one view; hour 3: one click
    assert rows[("2024-01-01T00:00:00", "click")] == (2, 3.0)
    assert rows[("2024-01-01T01:00:00", "view")] == (1, 3.0)
    assert rows[("2024-01-01T03:00:00", "click")] == (1, 4.0)


def test_session_windows(spark, tmp_path):
    _write_events(tmp_path / "raw2", EVENTS)
    stream = stream_raw_zone(spark, str(tmp_path / "raw2"), SCHEMA)
    out = _run_stream_to_memory(spark, sessionized_counts(stream), "sessions")
    per_user = {}
    for r in out.collect():
        per_user.setdefault(r.user_id, []).append(r.n_events)
    # user 1: events at 00:05/00:15 (one session) + 01:10 (new session)
    assert sorted(per_user[1]) == [1, 2]
    assert per_user[2] == [1]


@pytest.mark.parametrize("replays", [1, 2])
def test_foreach_batch_upsert_idempotent(spark, tmp_path, replays):
    target = str(tmp_path / "tgt")
    for i in range(replays):
        _write_events(tmp_path / f"in{i}", EVENTS)
        stream = stream_raw_zone(spark, str(tmp_path / f"in{i}"), SCHEMA)
        q = stream_upsert_to_target(
            stream,
            target,
            keys=["user_id", "event_type"],
            ts_col="ts",
            checkpoint_dir=str(tmp_path / f"ckpt{i}"),
            tiebreakers=["event_id"],
        )
        q.awaitTermination(60)
    tgt = spark.read.parquet(target)
    rows = {(r.user_id, r.event_type): r.event_id for r in tgt.collect()}
    # keep-latest per key, stable across replays
    assert rows == {(1, "click"): 2, (1, "view"): 3, (2, "click"): 4}
