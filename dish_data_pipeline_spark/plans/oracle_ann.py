"""DuckDB oracle SQL for the SRP-LSH similarity operators.

The Spark ops embed a deterministic hyperplane tensor
(``ops.similarity.srp_planes``) as literals; these generators embed
THE SAME floats in DuckDB SQL (``repr`` round-trips, so both engines
parse the identical double), compute dot products with the shared
sequential-left-fold contract (bit-identical sums), and replicate the
bucket equi-join — so the candidate sets, and therefore the final
top-k / near-dup pairs, match exactly, including the algorithm's
approximation behavior.
"""

from __future__ import annotations

from collections.abc import Sequence

from dish_data_pipeline_spark.ops.similarity import srp_planes

DOT_SQL = (
    "list_reduce(list_transform({a}, (x, i) -> "
    "CAST(x AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (acc, v) -> acc + v)"
)


def _plane_list(plane: Sequence[float]) -> str:
    return "[" + ", ".join(repr(v) for v in plane) + "]"


def bucket_expr(plane_table: Sequence[Sequence[float]], vec: str) -> str:
    """Signature of one hash table: sign bit per plane, packed
    big-endian (twin of the Spark ``acc * 2 + b`` fold)."""
    n = len(plane_table)
    bits = []
    for plane in plane_table:
        dot = (
            f"list_reduce(list_transform({_plane_list(plane)}, (x, i) -> "
            f"x * CAST({vec}[i] AS DOUBLE)), (acc, v) -> acc + v)"
        )
        bits.append(f"CASE WHEN {dot} >= 0 THEN 1 ELSE 0 END")
    terms = " + ".join(
        f"({b}) * {2 ** (n - 1 - i)}" for i, b in enumerate(bits)
    )
    return f"({terms})"


def sig_union_sql(
    source: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    dim: int = 64,
) -> str:
    """UNION ALL of one signature SELECT per hash table."""
    tables = srp_planes(n_planes, n_tables, seed, dim)
    return " UNION ALL ".join(
        f"SELECT {id_col}, {t} AS table_id, "
        f"{bucket_expr(tables[t], vec_col)} AS bucket FROM {source}"
        for t in range(n_tables)
    )


def sql_knn_lsh(
    query_ids: Sequence[int],
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    dim: int = 64,
) -> str:
    """Twin of ``lsh_bucket_topk`` over the ``embeddings`` view."""
    ids = ", ".join(str(i) for i in query_ids)
    dot = DOT_SQL.format(a="qe.embedding", b="ce.embedding")
    return f"""
WITH sig AS ({sig_union_sql('embeddings', n_planes=n_planes, n_tables=n_tables, seed=seed, dim=dim)}),
pairs AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM sig q JOIN sig c ON q.table_id = c.table_id AND q.bucket = c.bucket
  WHERE q.vec_id IN ({ids}) AND q.vec_id <> c.vec_id),
scored AS (
  SELECT p.query_id, p.neighbor_id, {dot} AS cosine
  FROM pairs p
  JOIN embeddings qe ON qe.vec_id = p.query_id
  JOIN embeddings ce ON ce.vec_id = p.neighbor_id)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored) t
WHERE rank <= {k}
"""


def sql_embedding_neardup(
    corpus_sql: str,
    threshold: float = 0.95,
    n_planes: int = 16,
    n_tables: int = 2,
    seed: int = 7,
    dim: int = 64,
) -> str:
    """Twin of ``srp_block_pairs`` + exact cosine filter over a
    planted-duplicates corpus CTE."""
    dot = DOT_SQL.format(a="ea.embedding", b="eb.embedding")
    return f"""
WITH corpus AS ({corpus_sql}),
sig AS ({sig_union_sql('corpus', n_planes=n_planes, n_tables=n_tables, seed=seed, dim=dim)}),
pairs AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM sig a JOIN sig b ON a.table_id = b.table_id AND a.bucket = b.bucket
   AND a.vec_id < b.vec_id)
SELECT p.id_a, p.id_b, {dot} AS cosine
FROM pairs p
JOIN corpus ea ON ea.vec_id = p.id_a
JOIN corpus eb ON eb.vec_id = p.id_b
WHERE {dot} >= {threshold}
"""


def sql_embedding_dedup(
    corpus_sql: str,
    threshold: float = 0.95,
    n_planes: int = 16,
    n_tables: int = 2,
    seed: int = 7,
    dim: int = 64,
) -> str:
    """Twin of the SemDeDup-style composition: SRP-blocked candidate
    pairs → exact cosine gate → recursive-reachability connected
    components (same unique min-id fixpoint the Spark label
    propagation converges to) → canonical (min-id) survivor with its
    cluster size."""
    dot = DOT_SQL.format(a="ea.embedding", b="eb.embedding")
    return f"""
WITH RECURSIVE corpus AS ({corpus_sql}),
sig AS ({sig_union_sql('corpus', n_planes=n_planes, n_tables=n_tables, seed=seed, dim=dim)}),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM sig a JOIN sig b ON a.table_id = b.table_id AND a.bucket = b.bucket
   AND a.vec_id < b.vec_id),
edges AS (
  SELECT p.id_a, p.id_b FROM cand p
  JOIN corpus ea ON ea.vec_id = p.id_a
  JOIN corpus eb ON eb.vec_id = p.id_b
  WHERE {dot} >= {threshold}),
sym(a, b) AS (SELECT id_a, id_b FROM edges
              UNION ALL SELECT id_b, id_a FROM edges),
walk(id, r) AS (
  SELECT vec_id, vec_id FROM corpus
  UNION
  SELECT w.id, s.b FROM walk w JOIN sym s ON s.a = w.r),
lab AS (
  SELECT id AS vec_id, CAST(MIN(r) AS BIGINT) AS cluster_id
  FROM walk GROUP BY id),
sizes AS (
  SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
  FROM lab GROUP BY cluster_id)
SELECT l.vec_id, l.cluster_id, s.cluster_size
FROM lab l JOIN sizes s USING (cluster_id)
WHERE l.vec_id = l.cluster_id
"""
