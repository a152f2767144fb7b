"""The map-side text operators (quality flags, PII redaction) are
stateless column programs, so they compose into Structured Streaming
unchanged — a streaming corpus-ingest can gate and redact in-flight.
Also a hot-segment stress: segment dedup's census is a 1×N join
(one census row per hash), so a boilerplate segment shared by
hundreds of docs must neither blow up nor mislabel keep-first."""

from __future__ import annotations

import json

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from dish_data_pipeline_spark.ops.segments import segment_dedup
from dish_data_pipeline_spark.ops.text import redact_pii, with_quality_flags

DOC_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)


def test_quality_gate_and_redaction_stream(spark, tmp_path):
    src = tmp_path / "in" / "batch.jsonl"
    src.parent.mkdir(parents=True)
    rows = [
        {"doc_id": 1,
         "text": "a good long document with plenty of distinct words in it "
                 "and more prose follows about many various topics indeed "
                 "reach me at alice@example.com for the remaining details"},
        {"doc_id": 2, "text": "short"},  # fails the token-count floor
    ]
    with open(src, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    stream = spark.readStream.schema(DOC_SCHEMA).json(str(src.parent))
    gated = redact_pii(with_quality_flags(stream)).filter(
        F.col("keep") == 1
    ).select("doc_id", "n_emails", "text_redacted")
    q = (
        gated.writeStream.format("memory")
        .queryName("stream_gate")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {r.doc_id: r for r in spark.sql("SELECT * FROM stream_gate").collect()}
    assert set(out) == {1}  # doc 2 gated out in-flight
    assert out[1].n_emails == 1
    assert "<EMAIL>" in out[1].text_redacted
    assert "alice@example.com" not in out[1].text_redacted


def test_stream_static_dim_enrichment(spark, tmp_path):
    """Stream-static join: a document stream enriched against a
    static source-priority dim — the broadcast join works unchanged
    inside Structured Streaming (no state, no watermark needed)."""
    from pyspark.sql import Row

    dims = spark.createDataFrame(
        [Row(source="wiki", priority=1), Row(source="web", priority=3)]
    )
    src = tmp_path / "in" / "b.jsonl"
    src.parent.mkdir(parents=True)
    rows = [
        {"doc_id": 1, "text": "alpha", "source": "wiki"},
        {"doc_id": 2, "text": "beta", "source": "web"},
        {"doc_id": 3, "text": "gamma", "source": "unknown"},
    ]
    with open(src, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("source", StringType()),
        ]
    )
    stream = spark.readStream.schema(schema).json(str(src.parent))
    enriched = stream.join(F.broadcast(dims), "source", "left").select(
        "doc_id", F.coalesce("priority", F.lit(9)).alias("priority")
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("stream_enrich")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {
        r.doc_id: r.priority
        for r in spark.sql("SELECT * FROM stream_enrich").collect()
    }
    assert out == {1: 1, 2: 3, 3: 9}


def test_segment_census_hot_key(spark):
    hot = "shared boilerplate header repeated on every single document here today"
    n_hot = 300
    rows = [
        Row(doc_id=i, text=hot + f" unique tail {i} alpha beta gamma")
        for i in range(n_hot)
    ]
    out = {
        r.doc_id: r
        for r in segment_dedup(
            spark.createDataFrame(rows), seg_tokens=10
        ).collect()
    }
    assert len(out) == n_hot
    # keep-first: doc 0 keeps the boilerplate segment, everyone else
    # keeps only their unique tail
    assert out[0].text_deduped.startswith(hot)
    assert out[0].n_kept == 2
    for i in range(1, n_hot):
        assert out[i].text_deduped == f"unique tail {i} alpha beta gamma"
        assert out[i].n_segments == 2 and out[i].n_kept == 1
