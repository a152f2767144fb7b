"""Int8 quantization: bounded error, exact determinism, and search
recall vs the float brute force on the driver testdata."""

from __future__ import annotations

import math

from pyspark.sql import Row

from dish_data_pipeline_spark.ops.quantize import (
    Q_MAX,
    quantized_topk,
    with_quantized,
)
from dish_data_pipeline_spark.ops.similarity import cosine_topk

SF_DIR = "/root/testdata/sf0.001"


def test_quantize_roundtrip_error_bounded(spark):
    vec = [0.5, -0.25, 0.125, 0.0, -1.0]
    df = spark.createDataFrame([Row(vec_id=1, embedding=vec)])
    row = with_quantized(df).collect()[0]
    assert row.q_scale == 1.0
    # floor(x*127 + 0.5) of each component
    assert row.q_vec == [
        math.floor(x * Q_MAX / 1.0 + 0.5) for x in vec
    ]
    # dequantized error ≤ half a quantization step per component
    for x, q in zip(vec, row.q_vec):
        assert abs(x - q * row.q_scale / Q_MAX) <= 0.5 * row.q_scale / Q_MAX


def test_quantize_zero_vector(spark):
    df = spark.createDataFrame([Row(vec_id=1, embedding=[0.0, 0.0])])
    row = with_quantized(df).collect()[0]
    assert row.q_scale == 0.0 and row.q_vec == [0, 0]


def test_quantized_search_recall(spark):
    from dish_data_pipeline_spark.io import read_table

    emb = read_table(spark, SF_DIR, "embeddings")
    qids = [0, 1, 2, 3, 4]
    exact = cosine_topk(emb, qids, k=10, assume_normalized=True).collect()
    quant = quantized_topk(emb, qids, k=10).collect()
    by_q_exact: dict[int, set[int]] = {}
    for r in exact:
        by_q_exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    by_q_quant: dict[int, set[int]] = {}
    for r in quant:
        by_q_quant.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(
        len(by_q_exact[q] & by_q_quant[q]) for q in by_q_exact
    )
    total = sum(len(v) for v in by_q_exact.values())
    # int8 on unit-norm vectors: overlap with the exact top-10 should
    # be near-total
    assert hits / total >= 0.8, (hits, total)
