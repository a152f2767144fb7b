"""Int8 embedding quantization + quantized similarity search.

At 100 TB an embedding store is rarely kept in float32: symmetric
int8 (one scale per vector, components in [-127, 127]) cuts storage
and shuffle bytes 4× and turns the dot product into exact integer
arithmetic. The quantizer is ``floor(x · 127 / scale + 0.5)`` —
chosen over ``round()`` deliberately, because SQL round() semantics
(half-up vs banker's) differ across engines while floor(+0.5) is
bit-identical everywhere, which is what lets the DuckDB oracle
replicate quantization AND search exactly.

Scoring: ``int_dot × scale_a × scale_b / 127²`` — the integer dot is
order-independent (exact), and the final double multiply chain is
written in the same order in both engines, so even the approximation
error is verified, not just bounded.

Scale shape: quantization is map-side (one pass, no UDF); the search
is the same broadcast-queries × corpus scan as ``cosine_topk`` with
4× less data movement — and composes with the SRP/IVF blockers for
sub-linear candidate generation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

Q_MAX = 127
Q_DENOM = Q_MAX * Q_MAX  # 16129


def with_quantized(
    df: DataFrame, vec_col: str = "embedding", out_prefix: str = "q"
) -> DataFrame:
    """Add ``{out_prefix}_scale`` (double, the max-abs component) and
    ``{out_prefix}_vec`` (array<int> in [-127, 127]). An all-zero
    vector quantizes to zeros with scale 0."""
    scale = F.expr(
        f"array_max(transform({vec_col}, x -> abs(CAST(x AS DOUBLE))))"
    )
    out = df.withColumn(f"{out_prefix}_scale", scale)
    qvec = F.expr(
        f"CASE WHEN {out_prefix}_scale > 0 THEN "
        f"transform({vec_col}, x -> CAST(floor(CAST(x AS DOUBLE) * {Q_MAX}.0 "
        f"/ {out_prefix}_scale + 0.5) AS INT)) "
        f"ELSE transform({vec_col}, x -> 0) END"
    )
    return out.withColumn(f"{out_prefix}_vec", qvec)


def quantized_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k neighbors by quantized dot product (≈ cosine on
    unit-norm input). Same broadcast-queries plan as ``cosine_topk``;
    the pair score is exact-integer ``dot(q̂, ĉ)`` rescaled by the two
    quantization scales."""
    quant = with_quantized(embeddings, vec_col)
    q = quant.select(
        F.col(id_col).alias("query_id"),
        F.col("q_vec").alias("qa"),
        F.col("q_scale").alias("sa"),
    ).filter(F.col("query_id").isin(query_ids))
    c = quant.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("q_vec").alias("qb"),
        F.col("q_scale").alias("sb"),
    )
    pairs = F.broadcast(q).crossJoin(c).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    int_dot = F.expr(
        "aggregate(zip_with(qa, qb, (x, y) -> CAST(x AS BIGINT) * y), "
        "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    score = F.expr(
        f"CAST(_idot AS DOUBLE) * sa * sb / {Q_DENOM}.0"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("qcosine"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("_idot", int_dot)
        .withColumn("qcosine", score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "qcosine", "rank")
    )


def quantized_topk_sql(query_ids: list[int], k: int = 10) -> str:
    """DuckDB twin: identical quantization, integer dot, and rescale
    over the ``embeddings`` view."""
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH sc AS (
  SELECT vec_id,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
           AS scale,
         embedding
  FROM embeddings),
quant AS (
  SELECT vec_id, scale,
         CASE WHEN scale > 0 THEN
           list_transform(embedding, x ->
             CAST(floor(CAST(x AS DOUBLE) * {Q_MAX}.0 / scale + 0.5) AS INT))
         ELSE list_transform(embedding, x -> 0) END AS qvec
  FROM sc),
dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(list_reduce(list_transform(q.qvec, (x, i) ->
             CAST(x AS BIGINT) * c.qvec[i]),
           (acc, v) -> acc + v) AS DOUBLE) * q.scale * c.scale / {Q_DENOM}.0
           AS qcosine
  FROM quant q, quant c
  WHERE q.vec_id IN ({ids}) AND q.vec_id <> c.vec_id)
SELECT query_id, neighbor_id, qcosine, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY qcosine DESC, neighbor_id ASC) AS rank
  FROM dots) t
WHERE rank <= {k}
"""
