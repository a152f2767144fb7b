"""Near-duplicate CLUSTERING: connected components over LSH pair
sets — the step between pair detection and corpus selection in a
training-data pipeline (pairs say "A≈B, B≈C"; the corpus builder
needs the transitive group {A,B,C} and one canonical survivor).

Spark-first shape: iterative min-label propagation. Each round is
one equi-join (edges × labels) + one groupBy-min — both plain
shuffles on the id key, no all-pairs anything. Rounds needed =
cluster diameter, which for near-dup graphs is tiny (dup groups are
near-cliques); convergence is checked with a monotone `label
shrank?` count. Iterative fixpoints inherently need driver-side
convergence actions (like ``kmeans_centroids`` — this is control
flow, not data collection). At extreme diameters, swap the loop body
for the small-star/large-star contraction of the same joins.

The fixpoint is unique (min id reachable), so results are
deterministic regardless of iteration count or partitioning — which
is what lets a DuckDB ``WITH RECURSIVE`` reachability oracle verify
the operator exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iters: int = 50,
) -> DataFrame:
    """Label every id with the minimum id reachable through
    ``pairs`` (columns id_a/id_b, undirected). Singletons label
    themselves. Returns (id_col, cluster_id)."""
    # Persist the symmetrized edge list: its lineage is the whole
    # upstream pair pipeline (e.g. MinHash-LSH) and every round joins
    # against it — without this, each iteration recomputes the LSH.
    edges = (
        pairs.select(F.col("id_a").alias("_src"), F.col("id_b").alias("_dst"))
        .unionByName(
            pairs.select(F.col("id_b").alias("_src"), F.col("id_a").alias("_dst"))
        )
        .persist()
    )
    labels = ids.select(
        F.col(id_col).alias("_id"), F.col(id_col).cast("long").alias("_label")
    ).persist()
    for _ in range(max_iters):
        neigh = edges.join(labels, edges["_src"] == labels["_id"]).select(
            F.col("_dst").alias("_id"), "_label"
        )
        new_labels = (
            labels.unionByName(neigh)
            .groupBy("_id")
            .agg(F.min("_label").alias("_label"))
            # truncate lineage each round: the persisted relation is
            # |ids| rows; plan depth stays O(1) instead of O(iters)
            .localCheckpoint(eager=True)
        )
        shrank = (
            new_labels.withColumnRenamed("_label", "_new")
            .join(labels, "_id")
            .filter(F.col("_new") < F.col("_label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if shrank == 0:
            break
    edges.unpersist()
    return labels.select(
        F.col("_id").alias(id_col), F.col("_label").alias("cluster_id")
    )


def canonical_docs(
    docs: DataFrame, clusters: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Keep one survivor per cluster: the canonical (minimum-id)
    member. Composes with any pair source (exact hash groups,
    MinHash, SimHash, embedding blocks)."""
    return docs.join(clusters, id_col).filter(
        F.col(id_col) == F.col("cluster_id")
    )
