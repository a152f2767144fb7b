"""Gram/covariance accumulation (ops/linalg): numpy equivalence on
the quantized statistic, partition invariance, and malformed-vector
handling."""

from __future__ import annotations

import numpy as np

from dish_data_pipeline_spark.ops.linalg import covariance_matrix


def _np_cov_quantized(mat, scale=1_000_000):
    q = np.floor(mat * scale).astype(np.int64).astype(np.float64)
    n = q.shape[0]
    g = q.T @ q
    s = q.sum(axis=0)
    return (n * g - np.outer(s, s)) / (n * (n - 1)) / (scale * scale)


def _collect(df, dim):
    out = np.full((dim, dim), np.nan)
    for r in df.collect():
        out[r["i"], r["j"]] = r["cov"]
    return out


def test_matches_numpy_and_partition_invariant(spark):
    rng = np.random.RandomState(3)
    mat = rng.uniform(-0.5, 0.5, size=(40, 5))
    rows = [(i, [float(x) for x in mat[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id bigint, v array<double>")
    want = _np_cov_quantized(mat)
    got1 = _collect(covariance_matrix(df, "v", 5), 5)
    got8 = _collect(covariance_matrix(df.repartition(8), "v", 5), 5)
    iu = np.triu_indices(5)
    assert np.array_equal(got1[iu], want[iu])  # bit-exact
    assert np.array_equal(got8[iu], want[iu])  # partitioning-invariant


def test_malformed_vectors_skipped(spark):
    rows = [
        (1, [0.1, 0.2]),
        (2, [0.3, 0.4]),
        (3, None),
        (4, [0.5]),  # wrong length
        (5, [0.2, 0.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, v array<double>")
    mat = np.array([[0.1, 0.2], [0.3, 0.4], [0.2, 0.1]])
    want = _np_cov_quantized(mat)
    got = _collect(covariance_matrix(df, "v", 2), 2)
    iu = np.triu_indices(2)
    assert np.array_equal(got[iu], want[iu])
