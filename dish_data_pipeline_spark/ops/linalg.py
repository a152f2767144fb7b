"""Distributed dense linear algebra over array columns — the Gram /
covariance matrix (the PCA / whitening building block).

The d×d covariance of an embedding table is a sum of outer products
— embarrassingly parallel, but two float hazards hide in the naive
spelling: per-partition float accumulation is order-dependent (no
oracle can match it), and a d²-row explode per vector shuffles 4096×
the data for d = 64. This module does neither:

- Each Arrow batch QUANTIZES components to int64
  (``floor(x · scale)`` — floor has no rounding ties) and
  accumulates the exact integer Gram ``Qᵀ Q``, the component sums,
  and the row count with numpy int64 matmul — exact in any order,
  vectorized, one d×d partial per batch instead of d² rows per
  vector.
- Partials reduce with a plain grouped SUM (exact BIGINTs), and the
  covariance closes as one fixed IEEE double expression from the
  integer totals — int64→double conversions are single
  correctly-rounded instructions on every engine, so a single-node
  SQL oracle reproduces the matrix bit-for-bit.

Overflow domain: |x|·scale ≤ Q keeps Σ qᵢqⱼ below int64 when
``rows · Q² < 2^63`` — with Q ≈ 2^20 (unit-scale embeddings at
scale=1e6) that is ~8e6 rows per... batch-partial; the grouped SUM
of partials is Spark BIGINT (document ~8e12-row global headroom) —
raise ``scale`` down for wider data.

Reference scope: no linear algebra in the reference; §2.13
extension (embedding-statistics tier).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRAM_SCALE = 1_000_000


def gram_partials(
    df: DataFrame, vec_col: str, dim: int, scale: int = GRAM_SCALE
) -> DataFrame:
    """Per-Arrow-batch exact integer Gram partials:
    ``(i, j, g)`` for the upper triangle (i ≤ j) of ``Qᵀ Q``, plus
    component-sum rows ``(-1, j, Σ qⱼ)`` and a count row
    ``(-1, -1, n)``. Sum over batches with a grouped SUM to get
    exact global totals. NULL vectors and wrong-length vectors are
    skipped (counted out of n)."""
    import numpy as np

    iu = np.triu_indices(dim)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vecs = [
                v
                for v in pdf[vec_col]
                if v is not None and len(v) == dim
            ]
            if not vecs:
                continue
            q = np.floor(
                np.asarray(vecs, dtype=np.float64) * scale
            ).astype(np.int64)
            gram = q.T @ q  # exact int64 matmul
            sums = q.sum(axis=0)
            i_idx = np.concatenate(
                [iu[0], np.full(dim, -1), np.array([-1])]
            )
            j_idx = np.concatenate(
                [iu[1], np.arange(dim), np.array([-1])]
            )
            vals = np.concatenate(
                [gram[iu], sums, np.array([len(q)], dtype=np.int64)]
            )
            yield pd.DataFrame({"i": i_idx, "j": j_idx, "g": vals})

    return df.mapInPandas(batches, "i int, j int, g bigint")


def covariance_matrix(
    df: DataFrame, vec_col: str, dim: int, scale: int = GRAM_SCALE
) -> DataFrame:
    """Upper-triangle sample covariance ``(i, j, cov)`` of the
    quantized components (the DEFINED statistic is the covariance of
    ``floor(x·scale)/scale`` — exactly reproducible everywhere;
    quantization error ≤ 1/scale per component):
    ``cov_ij = (n·G_ij − s_i·s_j) / (n·(n−1)) / scale²`` — one fixed
    double expression over exact BIGINT totals."""
    from dish_data_pipeline_spark.cache_registry import tracked_persist

    parts = gram_partials(df, vec_col, dim, scale)
    # consumed by four branches (gram / sums / count filters) — persist
    # the ≤(d²/2 + d + 1)-row total so the Arrow Gram pass runs once
    totals = tracked_persist(
        parts.groupBy("i", "j").agg(F.sum("g").alias("g"))
    )
    n_row = totals.filter((F.col("i") == -1) & (F.col("j") == -1)).select(
        F.col("g").alias("n")
    )
    sums = totals.filter((F.col("i") == -1) & (F.col("j") >= 0)).select(
        F.col("j").alias("k"), F.col("g").alias("s")
    )
    gram = totals.filter(F.col("i") >= 0)
    si = sums.select(F.col("k").alias("i"), F.col("s").alias("s_i"))
    sj = sums.select(F.col("k").alias("j"), F.col("s").alias("s_j"))
    nd = F.col("n").cast("double")
    cov = (
        (nd * F.col("g").cast("double")
         - F.col("s_i").cast("double") * F.col("s_j").cast("double"))
        / (nd * (nd - F.lit(1.0)))
        / F.lit(float(scale) * float(scale))
    )
    return (
        gram.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .crossJoin(F.broadcast(n_row))
        .select("i", "j", cov.alias("cov"))
    )
