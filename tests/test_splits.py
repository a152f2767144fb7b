"""Leakage-safe splitting (ops/splits.py): co-assignment of
near-dup clusters, ingest stability, and weight validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dish_data_pipeline_spark.ops.portable import py_phash
from dish_data_pipeline_spark.ops.splits import (
    _thresholds,
    leakage_safe_split,
)


def py_split(cluster_id: int, weights, salt="split-v1") -> str:
    b = py_phash(f"{salt}|{cluster_id}") % 100
    acc = 0
    for name, w in weights.items():
        acc += w
        if b < acc:
            return name
    raise AssertionError


def _clusters(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id bigint, cluster_id bigint")


def test_cluster_members_always_co_assigned(spark):
    # one big cluster (42) + singletons; every member of 42 must land
    # in the same split regardless of its own doc_id
    rows = [(i, 42) for i in range(50)] + [(100 + i, 100 + i) for i in range(50)]
    docs = spark.createDataFrame([(r[0],) for r in rows], "doc_id bigint")
    out = leakage_safe_split(docs, _clusters(spark, rows)).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    assert by_cluster[42] == {py_split(42, {"train": 90, "val": 5, "test": 5})}
    assert all(len(v) == 1 for v in by_cluster.values())


def test_assignment_matches_python_twin_and_distribution(spark):
    rows = [(i, i) for i in range(1000)]
    docs = spark.createDataFrame([(i,) for i, _ in rows], "doc_id bigint")
    w = {"train": 80, "val": 10, "test": 10}
    out = {r["doc_id"]: r["split"]
           for r in leakage_safe_split(docs, _clusters(spark, rows), w).collect()}
    assert out == {i: py_split(i, w) for i in range(1000)}
    n_train = sum(1 for s in out.values() if s == "train")
    assert 700 < n_train < 900  # ~80% of 1000


def test_split_stable_under_corpus_growth(spark):
    """Adding documents must not reassign existing clusters — the
    property that lets a 100 TB corpus grow without re-splitting."""
    first = [(i, i) for i in range(200)]
    docs1 = spark.createDataFrame([(i,) for i, _ in first], "doc_id bigint")
    out1 = {r["doc_id"]: r["split"]
            for r in leakage_safe_split(docs1, _clusters(spark, first)).collect()}
    grown = first + [(i, i) for i in range(200, 400)]
    docs2 = spark.createDataFrame([(i,) for i, _ in grown], "doc_id bigint")
    out2 = {r["doc_id"]: r["split"]
            for r in leakage_safe_split(docs2, _clusters(spark, grown)).collect()}
    assert all(out2[i] == out1[i] for i in range(200))


def test_weight_validation():
    assert [h for _, h in _thresholds({"a": 30, "b": 70})] == [30, 100]
    with pytest.raises(ValueError):
        _thresholds({"a": 50, "b": 49})
    with pytest.raises(ValueError):
        _thresholds({"a": 100, "b": 0})


def test_salt_changes_assignment_but_not_coassignment(spark):
    rows = [(i, i // 4) for i in range(200)]  # clusters of 4
    docs = spark.createDataFrame([(i,) for i, _ in rows], "doc_id bigint")
    a = leakage_safe_split(docs, _clusters(spark, rows), salt="s1").collect()
    b = leakage_safe_split(docs, _clusters(spark, rows), salt="s2").collect()
    flips = sum(
        1 for ra, rb in zip(sorted(a, key=lambda r: r["doc_id"]),
                            sorted(b, key=lambda r: r["doc_id"]))
        if ra["split"] != rb["split"]
    )
    assert flips > 0  # salt actually re-randomizes
    for res in (a, b):
        seen = {}
        for r in res:
            seen.setdefault(r["cluster_id"], set()).add(r["split"])
        assert all(len(v) == 1 for v in seen.values())
