"""Training-shard exporter: determinism, coverage, balance, and
partition pruning of the shard layout."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dish_data_pipeline_spark.io_shards import (
    read_shard,
    shard_manifest,
    with_shard_assignment,
    write_training_shards,
)


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
    )


def test_shards_cover_input_exactly_and_are_balanced(spark, tmp_path):
    df = _docs(spark)
    path = str(tmp_path / "shards")
    write_training_shards(df, path, "doc_id", n_shards=8, seed=42)
    back = spark.read.parquet(path)
    assert back.count() == 400
    assert sorted(r.doc_id for r in back.collect()) == list(range(400))
    sizes = {
        r.shard: r.n for r in back.groupBy("shard").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert set(sizes) == set(range(8))  # every shard non-empty
    assert max(sizes.values()) <= 2 * min(sizes.values())  # hash balance
    # one directory per shard on disk
    dirs = sorted(d for d in os.listdir(path) if d.startswith("shard="))
    assert dirs == [f"shard={i}" for i in range(8)]


def test_shard_layout_is_deterministic_across_reruns(spark, tmp_path):
    df = _docs(spark, 200)
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(df, p1, "doc_id", n_shards=4, seed=7)
    write_training_shards(df, p2, "doc_id", n_shards=4, seed=7)
    for shard in range(4):
        a = [tuple(r) for r in read_shard(spark, p1, shard).collect()]
        b = [tuple(r) for r in read_shard(spark, p2, shard).collect()]
        assert a == b  # identical content AND identical order
    # a different seed is a different permutation
    p3 = str(tmp_path / "c")
    write_training_shards(df, p3, "doc_id", n_shards=4, seed=8)
    moved = sum(
        1
        for shard in range(4)
        for r7, r8 in [(
            {x.doc_id for x in read_shard(spark, p1, shard).collect()},
            {x.doc_id for x in read_shard(spark, p3, shard).collect()},
        )]
        if r7 != r8
    )
    assert moved > 0


def test_manifest_matches_written_shards(spark, tmp_path):
    df = _docs(spark, 300)
    path = str(tmp_path / "shards")
    write_training_shards(df, path, "doc_id", n_shards=5, seed=1)
    manifest = {
        r.shard: (r.n_rows, r.content_digest)
        for r in shard_manifest(df, "doc_id", n_shards=5, seed=1).collect()
    }
    back = with_shard_assignment(
        spark.read.parquet(path).drop("shard"), "doc_id", 5, 1
    )
    from dish_data_pipeline_spark.ops.portable import P

    derived = {
        r.shard: (r.n_rows, r.content_digest)
        for r in back.groupBy("shard").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.pmod(F.col("_order"), F.lit(P)))
            .cast("bigint")
            .alias("content_digest"),
        ).collect()
    }
    assert manifest == derived
    assert sum(n for n, _ in manifest.values()) == 300


def test_read_shard_prunes_partitions(spark, tmp_path):
    df = _docs(spark, 100)
    path = str(tmp_path / "shards")
    write_training_shards(df, path, "doc_id", n_shards=4, seed=3)
    plan = read_shard(spark, path, 2)._jdf.queryExecution().executedPlan().toString()
    # the shard predicate lands in PartitionFilters (directory
    # pruning), not DataFilters — only shard=2's files are read
    assert "PartitionFilters: [isnotnull(shard" in plan
    assert "= 2)" in plan
    got = read_shard(spark, path, 2)
    assert got.count() > 0
    assert {r.shard for r in got.select("shard").distinct().collect()} == {2}


def test_shard_argument_validation(spark):
    df = _docs(spark, 10)
    with pytest.raises(ValueError, match="n_shards"):
        with_shard_assignment(df, "doc_id", 0)
    with pytest.raises(ValueError, match="absent"):
        with_shard_assignment(df, "nope", 4)
