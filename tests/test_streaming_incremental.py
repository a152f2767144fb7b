"""Streaming incremental ingest dedup: micro-batches of new docs
probe the existing corpus' MinHash band buckets via foreachBatch
reusing the batch operator — survivors (and only survivors) reach
the parquet sink, and a checkpointed replay appends nothing new
beyond re-delivered batches' identical survivor sets."""

from __future__ import annotations

import json

from pyspark.sql import Row
from pyspark.sql.types import LongType, StringType, StructField, StructType

from dish_data_pipeline_spark.streaming import stream_incremental_neardup

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)

EXISTING = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "an entirely different document about spark shuffles and joins"),
]


def test_stream_incremental_neardup_filters_against_corpus(spark, tmp_path):
    existing = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in EXISTING]
    )
    src_dir = tmp_path / "in"
    src_dir.mkdir()
    new_rows = [
        # exact copy of doc 1 → must be dropped
        {"doc_id": 100, "text": EXISTING[0][1]},
        # near-copy of doc 2 (one word changed) → shares band buckets
        {"doc_id": 101,
         "text": "an entirely different document about spark shuffles and sorts"},
        # fresh → must survive
        {"doc_id": 102,
         "text": "completely novel material mentioning glaciers penguins and maps"},
    ]
    with open(src_dir / "b1.jsonl", "w") as f:
        for r in new_rows:
            f.write(json.dumps(r) + "\n")

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema(SCHEMA).json(str(src_dir))
    q = stream_incremental_neardup(stream, existing, sink, ckpt)
    q.awaitTermination(120)

    out = {r.doc_id for r in spark.read.parquet(sink).collect()}
    assert out == {102}

    # replay with the same checkpoint: the processed batch is not
    # re-fired, so the sink is unchanged
    q2 = stream_incremental_neardup(
        spark.readStream.schema(SCHEMA).json(str(src_dir)), existing, sink, ckpt
    )
    q2.awaitTermination(120)
    assert [r.doc_id for r in spark.read.parquet(sink).collect()] == [102]
