"""The operator-cache registry: tracked_persist caches like persist,
release_caches frees exactly the tracked relations — including ones
whose operator-local Python variable is long gone (the reason the
registry holds strong handles)."""

from __future__ import annotations

from pyspark.sql import Row

from dish_data_pipeline_spark.cache_registry import (
    release_caches,
    tracked_persist,
)


def test_release_unpersists_tracked(spark):
    release_caches()  # start clean
    df = tracked_persist(spark.createDataFrame([Row(x=1), Row(x=2)]))
    df.count()
    assert df.storageLevel.useMemory
    assert release_caches() == 1
    assert not df.storageLevel.useMemory


def test_release_survives_dropped_local(spark):
    release_caches()
    tracked_persist(spark.createDataFrame([Row(x=1)]))  # local dropped
    import gc

    gc.collect()
    assert release_caches() == 1  # registry handle kept the cache reachable


def test_operator_caches_are_tracked(spark):
    """srp_block_pairs' signature cache is released by the hook."""
    import numpy as np

    from dish_data_pipeline_spark.ops.similarity import srp_block_pairs

    release_caches()
    rng = np.random.default_rng(7)
    rows = [
        Row(doc_id=i, emb=[float(v) for v in rng.normal(size=8)])
        for i in range(20)
    ]
    df = spark.createDataFrame(rows)
    srp_block_pairs(df, id_col="doc_id", vec_col="emb", dim=8).count()
    assert release_caches() >= 1
