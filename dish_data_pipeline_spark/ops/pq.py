"""Product quantization (PQ) — the codebook ANN tier (Jégou et al.,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011).

Where int8 quantization (ops/quantize.py) compresses each vector
4×, PQ compresses it to ``m`` single-byte codes: the dimension is
split into ``m`` contiguous subspaces, each with its own ``k``-entry
codebook, and a vector is stored as its per-subspace nearest-code
ids. Asymmetric distance computation (ADC) then scores a FULL-
PRECISION query against the code approximations — the standard
billion-scale recipe (FAISS's IVF-PQ inner loop).

Verification split, same pattern as the SRP/IVF tiers:

- The ENCODE + ADC pipeline is oracle-EXACT with formula-derived
  codebooks (:func:`pq_grid_codebooks`, the ``srp_planes``
  deterministic-component device): both engines embed the identical
  double literals, fold the identical left-associative squared
  distances, and break argmin ties identically — so codes,
  distances, and the final ranking all hash-match
  (``knn_pq`` catalog query).
- TRAINED codebook quality (:func:`pq_codebooks` — per-subspace
  Lloyd's via the shared deterministic k-means) is held to a
  measured recall bar in pytest, like IVF's trained-centroid bar:
  training is data-dependent iteration, not SQL.

Scale shape: encoding is a map-side projection (codebooks are
literals in the plan — model state, not data); ADC search is the
broadcast-queries × corpus scan shared by ``cosine_topk``, touching
m×k-double lookup tables instead of full vectors; both compose with
the SRP/IVF blockers for sub-linear candidate generation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dish_data_pipeline_spark.ops.similarity import _plane_component

PQ_M = 16
PQ_K = 16


def pq_grid_codebooks(
    m: int, n_codes: int, dim: int, seed: int = 11, scale: float = 0.35
) -> list[list[list[float]]]:
    """Deterministic formula-derived codebooks ``cb[s][j] ->
    sub-vector`` (splitmix components in [-scale, scale)) — the
    frozen-model table the exact oracle shares."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    return [
        [
            [scale * _plane_component(seed + s, j, t) for t in range(sub)]
            for j in range(n_codes)
        ]
        for s in range(m)
    ]


def pq_codebooks(
    embeddings: DataFrame,
    m: int = PQ_M,
    n_codes: int = PQ_K,
    n_iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train per-subspace codebooks with the shared deterministic
    Lloyd's loop (``kmeans_centroids`` over each dimension slice).
    Returns driver-side model state ``cb[s][j]`` for
    :func:`pq_encode` / :func:`pq_topk`."""
    from dish_data_pipeline_spark.ops.similarity import kmeans_centroids

    dim = len(embeddings.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    books = []
    for s in range(m):
        sliced = embeddings.select(
            F.col(id_col),
            F.slice(F.col(vec_col), s * sub + 1, sub).alias(vec_col),
        )
        cents = kmeans_centroids(
            sliced, n_centroids=n_codes, n_iters=n_iters,
            id_col=id_col, vec_col=vec_col,
        ).collect()
        books.append(
            [list(r.cent_vec) for r in sorted(cents, key=lambda r: r.centroid_id)]
        )
    return books


def _lit_list(vals: list[float]) -> str:
    # scientific-notation literals parse directly as DOUBLE in both
    # engines; a bare decimal literal routes through DECIMAL, whose
    # cast-to-double divides by a power of ten and can land 1 ULP off
    # the correctly-rounded strtod parse (observed in DuckDB 1.0)
    return "array(" + ", ".join(f"{v:.17e}" for v in vals) + ")"


def _l2_expr(sub_expr: str, cb_entry: str) -> str:
    """Left-fold squared L2 distance — identical association order
    to the DuckDB twin, so the doubles match bit for bit."""
    return (
        f"aggregate(zip_with({sub_expr}, {cb_entry}, "
        "(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _code_expr(sub_expr: str, book: list[list[float]]) -> str:
    """Argmin code for one subspace: score every codebook entry,
    fold keeping (min d, ties -> lowest cid) — the ``_argmax_cid``
    selection device, map-side, no exchange."""
    cb = "array(" + ", ".join(_lit_list(c) for c in book) + ")"
    scored = (
        f"transform(sequence(1, {len(book)}), j -> named_struct("
        f"'d', {_l2_expr(sub_expr, f'element_at({cb}, j)')}, "
        "'cid', j - 1))"
    )
    return (
        f"aggregate({scored}, "
        "named_struct('d', CAST('Infinity' AS DOUBLE), 'cid', 999999), "
        "(best, cur) -> IF(cur.d < best.d "
        "OR (cur.d = best.d AND cur.cid < best.cid), cur, best)).cid"
    )


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    out_col: str = "pq_codes",
) -> DataFrame:
    """Add ``out_col`` (ARRAY<INT>, one code per subspace) — a pure
    map-side projection; the codebooks ride the plan as literals."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    codes = ", ".join(
        _code_expr(f"slice({vec_col}, {s * sub + 1}, {sub})", codebooks[s])
        for s in range(m)
    )
    return df.withColumn(out_col, F.expr(f"array({codes})").cast("array<int>"))


def pq_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank: int | None = None,
) -> DataFrame:
    """Top-k by ADC: full-precision queries (broadcast) against the
    PQ-coded corpus — distance = sum over subspaces of ||q_s −
    cb[s][code_s]||². Ascending distance, ties → lowest neighbor
    id. Output: (query_id, neighbor_id, pq_dist, rank).

    ``rerank=R`` adds the standard exact re-rank stage: the ADC
    shortlist of R candidates per query joins back its full-precision
    vectors and the final top-k comes from exact squared L2 —
    recall then depends only on the shortlist containing the true
    neighbors (measured at sf0.01, m=16/k=16: 0.44 → 0.86 recall@10
    with R=50), while the expensive exact math touches R rows per
    query instead of the corpus. Output ``pq_dist`` is the EXACT
    distance in this mode."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    enc = pq_encode(embeddings, codebooks, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("pq_codes")
    )
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    adc_terms = " + ".join(
        _l2_expr(
            f"slice(_qv, {s * sub + 1}, {sub})",
            "element_at("
            + "array(" + ", ".join(_lit_list(c) for c in codebooks[s]) + ")"
            + f", element_at(pq_codes, {s + 1}) + 1)",
        )
        for s in range(m)
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(enc)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("pq_dist", F.expr(adc_terms))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("pq_dist"), F.asc("neighbor_id")
    )
    adc_ranked = (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= (rerank or k))
        .select("query_id", "neighbor_id", "pq_dist", "rank")
    )
    if rerank is None:
        return adc_ranked
    # exact re-rank: shortlist joins its full vectors; same left-fold
    # distance device, applied to R rows per query, not the corpus
    full = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv")
    )
    exact = F.expr(
        "aggregate(zip_with(_qv, _nv, "
        "(x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) "
        "* (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    rw = Window.partitionBy("query_id").orderBy(
        F.asc("pq_dist"), F.asc("neighbor_id")
    )
    return (
        adc_ranked.drop("rank", "pq_dist")
        .join(full, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .withColumn("pq_dist", exact)
        .withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "pq_dist", "rank")
    )


# --- DuckDB twin ---------------------------------------------------
def _duck_list(vals: list[float]) -> str:
    # same scientific-literal discipline as _lit_list
    return "[" + ", ".join(f"{v:.17e}" for v in vals) + "]"


def pq_topk_sql(
    codebooks: list[list[list[float]]], query_ids: list[int], k: int = 10
) -> str:
    """DuckDB twin of :func:`pq_topk` with the SAME codebook values:
    identical left-fold L2 sums, identical argmin tiebreaks (ROW
    NUMBER d ASC, j ASC == the Spark fold), and the ADC terms
    re-added in the identical left-to-right subspace order (pivoted
    columns, not an order-unspecified SUM) — rankings hash-match
    exactly. Structured as a join against a codebook VALUES relation
    rather than literals inside lambdas: the literal form
    re-materialized the m×k×sub constant per evaluated element,
    ~10× slower than the whole Spark run."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    ids = ", ".join(str(i) for i in query_ids)
    rows = ",\n".join(
        f"({s_}, {j}, {_duck_list(codebooks[s_][j])})"
        for s_ in range(m)
        for j in range(len(codebooks[s_]))
    )

    def l2(a: str) -> str:
        return (
            f"list_reduce(list_transform({a}, (x, i) -> "
            "(CAST(x AS DOUBLE) - v[i]) * (CAST(x AS DOUBLE) - v[i])), "
            "(acc, w) -> acc + w)"
        )

    pivots = ", ".join(
        f"MAX(CASE WHEN s = {s_} THEN d END) AS d{s_}" for s_ in range(m)
    )
    adc = "d0"
    for s_ in range(1, m):
        adc = f"({adc} + d{s_})"
    qslice = f"list_slice(q.embedding, c.s * {sub} + 1, c.s * {sub} + {sub})"
    return f"""
WITH cb(s, j, v) AS (VALUES
{rows}),
subs AS (
  SELECT e.vec_id, t.s,
         list_slice(e.embedding, t.s * {sub} + 1, t.s * {sub} + {sub}) AS sv
  FROM embeddings e
  CROSS JOIN (SELECT unnest(generate_series(0, {m - 1})) AS s) t),
dists AS (
  SELECT subs.vec_id, subs.s, cb.j, {l2("sv")} AS d
  FROM subs JOIN cb ON cb.s = subs.s),
codes AS (
  SELECT vec_id, s, j AS code FROM (
    SELECT vec_id, s, j,
           ROW_NUMBER() OVER (PARTITION BY vec_id, s
                              ORDER BY d ASC, j ASC) AS rn
    FROM dists) r WHERE rn = 1),
qd AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.s,
         {l2(qslice)} AS d
  FROM codes c
  JOIN cb ON cb.s = c.s AND cb.j = c.code
  JOIN embeddings q ON q.vec_id <> c.vec_id
  WHERE q.vec_id IN ({ids})),
padc AS (
  SELECT query_id, neighbor_id, {pivots} FROM qd GROUP BY 1, 2),
ranked AS (
  SELECT query_id, neighbor_id, {adc} AS pq_dist,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY {adc} ASC, neighbor_id ASC) AS INTEGER) AS rank
  FROM padc)
SELECT query_id, neighbor_id, pq_dist, rank
FROM ranked WHERE rank <= {k}
"""


def ivfpq_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    codebooks: list[list[list[float]]],
    k: int = 10,
    n_centroids: int = 10,
    n_probe: int = 3,
    centroids: DataFrame | None = None,
    rerank: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ: the standard billion-scale composition (FAISS
    ``IVFx,PQy``) — the IVF coarse quantizer restricts the search to
    ``n_probe`` inverted lists, and within them candidates are scored
    by PQ ADC, so the only corpus-sized relation that moves carries
    ``m`` one-byte codes per row instead of the full vector.

    Coarse geometry follows ``ivf_topk`` (fold-argmax dot against
    the broadcast centroid set; unit-norm contract — argmax dot ==
    argmin L2 there); fine distances are the ADC of :func:`pq_topk`;
    ``rerank`` adds the exact shortlist re-rank. With ``n_probe ==
    n_centroids`` every list is scanned, so the result provably
    equals :func:`pq_topk` — the exhaustive-probe certification
    device the ``knn_ivfpq`` catalog query uses to share the
    ``knn_pq`` oracle verbatim. Output: (query_id, neighbor_id,
    pq_dist, rank)."""
    from dish_data_pipeline_spark.ops.similarity import (
        _argmax_cid,
        _top_probe_structs,
    )

    m = len(codebooks)
    sub = len(codebooks[0][0])
    if centroids is None:
        centroids = (
            embeddings.orderBy(F.asc(id_col))
            .limit(n_centroids)
            .select(
                F.col(id_col).alias("centroid_id"),
                F.col(vec_col).alias("cent_vec"),
            )
        )
    cent_arr = centroids.agg(
        F.expr(
            "array_sort(collect_list(named_struct("
            "'cid', CAST(centroid_id AS BIGINT), "
            "'cv', CAST(cent_vec AS ARRAY<DOUBLE>))))"
        ).alias("_cents")
    )
    # assignment sees the full vector map-side, then DROPS it — the
    # shuffled candidate payload is the m-byte code array
    assigned = (
        pq_encode(embeddings, codebooks, vec_col)
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col("pq_codes"),
            F.col(vec_col).alias("_av"),
        )
        .crossJoin(F.broadcast(cent_arr))
        .withColumn("list_id", _argmax_cid("_av"))
        .select("neighbor_id", "pq_codes", "list_id")
    )
    queries = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    probes = (
        queries.crossJoin(F.broadcast(cent_arr))
        .withColumn("_probe", F.explode(_top_probe_structs("_qv", n_probe)))
        .select("query_id", "_qv", F.col("_probe.cid").alias("list_id"))
    )
    adc_terms = " + ".join(
        _l2_expr(
            f"slice(_qv, {s * sub + 1}, {sub})",
            "element_at("
            + "array(" + ", ".join(_lit_list(c) for c in codebooks[s]) + ")"
            + f", element_at(pq_codes, {s + 1}) + 1)",
        )
        for s in range(m)
    )
    pairs = (
        F.broadcast(probes)
        .join(assigned, "list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("pq_dist", F.expr(adc_terms))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("pq_dist"), F.asc("neighbor_id")
    )
    shortlist = (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= (rerank or k))
        .select("query_id", "neighbor_id", "pq_dist", "rank")
    )
    if rerank is None:
        return shortlist
    full = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv")
    )
    exact = F.expr(
        "aggregate(zip_with(_qv, _nv, "
        "(x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) "
        "* (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    rw = Window.partitionBy("query_id").orderBy(
        F.asc("pq_dist"), F.asc("neighbor_id")
    )
    return (
        shortlist.drop("rank", "pq_dist")
        .join(full, "neighbor_id")
        .join(F.broadcast(queries), "query_id")
        .withColumn("pq_dist", exact)
        .withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "pq_dist", "rank")
    )
