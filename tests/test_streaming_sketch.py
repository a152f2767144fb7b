"""Windowed approximate-distinct on a stream: event-time windows +
watermark + HLL (`approx_count_distinct`) — the streaming face of the
sketch family (state per window is one HLL register set, not the
user-id universe). Append mode emits each window once its watermark
passes."""

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

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def test_windowed_approx_distinct_stream(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    rows = []
    # hour 10: users 1..40 click (each twice — dups must not inflate)
    for u in range(1, 41):
        for j in (0, 1):
            rows.append(
                {"event_id": u * 10 + j, "ts": f"2024-01-01T10:{j:02d}:00Z",
                 "user_id": u, "event_type": "click", "value": 1.0}
            )
    # hour 12: 5 distinct users; plus a late straggler that closes
    # the 10:00 window (watermark passes)
    for u in range(1, 6):
        rows.append(
            {"event_id": 9000 + u, "ts": "2024-01-01T12:30:00Z",
             "user_id": u, "event_type": "click", "value": 1.0}
        )
    with open(src / "b.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    stream = spark.readStream.schema(SCHEMA).json(str(src))
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.approx_count_distinct("user_id").alias("approx_users"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("win_distinct")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {
        r["window"]["start"].hour: r["approx_users"]
        for r in spark.sql("SELECT * FROM win_distinct").collect()
    }
    # the 10:00 window is finalized (watermark from 12:30 passed it);
    # HLL at this cardinality is within a few % of 40 distinct users
    assert 10 in out
    assert abs(out[10] - 40) <= 4, out


def test_streaming_cms_counters_equal_batch(spark, tmp_path):
    """CMS counters maintained as streaming aggregation state
    (bounded: d x w rows per group) equal the batch sketch over the
    same rows — counter addition is the merge, so micro-batch
    arrival order cannot change the result."""
    from dish_data_pipeline_spark.ops.sketch import cms_counters

    src = tmp_path / "cms_in"
    src.mkdir()
    doc_schema = StructType(
        [StructField("g", StringType()), StructField("v", StringType())]
    )
    batch1 = [{"g": "a", "v": f"tok{i % 7}"} for i in range(50)]
    batch2 = [{"g": "a", "v": f"tok{i % 5}"} for i in range(30)] + [
        {"g": "b", "v": "solo"}
    ]
    for name, rows in (("b1.jsonl", batch1), ("b2.jsonl", batch2)):
        with open(src / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    stream = spark.readStream.schema(doc_schema).json(str(src))
    q = (
        cms_counters(stream, "g", "v", d=3, w=16)
        .writeStream.format("memory")
        .queryName("cms_state")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch_df = spark.createDataFrame(
        [(r["g"], r["v"]) for r in batch1 + batch2], doc_schema
    )
    want = {
        (r.g, r._i, r._b): r._cnt
        for r in cms_counters(batch_df, "g", "v", d=3, w=16).collect()
    }
    got = {
        (r.g, r._i, r._b): r._cnt
        for r in spark.sql("SELECT * FROM cms_state").collect()
    }
    assert got == want and len(got) > 0
