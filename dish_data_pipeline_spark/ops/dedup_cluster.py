"""Near-duplicate CLUSTERING: connected components over LSH pair
sets — the step between pair detection and corpus selection in a
training-data pipeline (pairs say "A≈B, B≈C"; the corpus builder
needs the transitive group {A,B,C} and one canonical survivor).

Two engines, same unique fixpoint (every id labelled with the min id
reachable), verified equivalent by property tests on random graphs:

- **min-label propagation** (default for near-dup graphs): each
  round is one equi-join (edges × labels) + one groupBy-min — both
  plain shuffles on the id key, no all-pairs anything. Rounds needed
  = cluster diameter, which for near-dup graphs is tiny (dup groups
  are near-cliques).
- **large-star / small-star contraction** (Kiveris et al.,
  "Connected Components in MapReduce and Beyond", 2014): each round
  rewires every node toward its neighborhood minimum, converging in
  O(log d) rounds instead of O(d) — the swap for extreme-diameter
  graphs (long chains). ``algorithm="auto"`` starts with min-label
  and falls back to star contraction when a diameter this large is
  detected (no convergence within ``switch_after`` rounds).

Iterative fixpoints inherently need driver-side convergence actions
(like ``kmeans_centroids`` — this is control flow, not data
collection). Both loops persist their per-round relation and
``localCheckpoint`` it to keep plan depth O(1); the FINAL round's
checkpoint backs the returned DataFrame, so it stays cached until
the caller's action completes and is then LRU-evictable
(MEMORY_AND_DISK) — a long-lived session clustering many corpora
should checkpoint/write the labels itself.

The fixpoint is deterministic regardless of iteration count or
partitioning — which is what lets a DuckDB ``WITH RECURSIVE``
reachability oracle verify the operator exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iters: int = 50,
    algorithm: str = "auto",
    switch_after: int = 8,
) -> DataFrame:
    """Label every id with the minimum id reachable through
    ``pairs`` (columns id_a/id_b, undirected). Singletons label
    themselves. Returns (id_col, cluster_id).

    ``algorithm``: ``"minlabel"`` | ``"star"`` | ``"auto"`` (min-
    label first; if still unconverged after ``switch_after`` rounds
    the graph has an unusually large diameter, so restart on the
    O(log d) star contraction)."""
    if algorithm not in ("auto", "minlabel", "star"):
        raise ValueError(f"unknown algorithm {algorithm!r}")
    if algorithm == "star":
        return _cc_star(ids, pairs, id_col, max_iters)

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
    budget = switch_after if algorithm == "auto" else max_iters
    converged = False
    for _ in range(budget):
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
            converged = True
            break
    edges.unpersist()
    if not converged and algorithm == "auto":
        # diameter > switch_after: restart on the O(log d) engine
        # (the star loop contracts chains exponentially fast, so the
        # wasted min-label rounds are a bounded constant overhead).
        return _cc_star(ids, pairs, id_col, max_iters)
    return labels.select(
        F.col("_id").alias(id_col), F.col("_label").alias("cluster_id")
    )


def _cc_star(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iters: int = 50,
) -> DataFrame:
    """Large-star/small-star alternation (Kiveris et al. 2014).

    Edges are kept directed larger→smaller. Per round:

    - **large-star**: every node ``u`` rewires its LARGER neighbors
      to ``m = min(Γ(u) ∪ {u})`` — one window-min over the
      symmetrized edges, map-side emit.
    - **small-star**: every node ``u`` rewires its smaller-or-self
      neighborhood to its minimum — same shape on the directed list.

    Both are a single shuffle each (partition by node); no step ever
    materializes a neighborhood cross product, and chain diameters
    halve-ish per round (O(log d) rounds total). Convergence = the
    directed edge set reaches a fixpoint (each non-min node points
    at its component minimum — a star)."""
    e = (
        pairs.select(
            F.col("id_a").cast("long").alias("u"),
            F.col("id_b").cast("long").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .selectExpr("greatest(u, v) AS u", "least(u, v) AS v")
        .distinct()
        .localCheckpoint(eager=True)
    )
    edges = e
    w = Window.partitionBy("u")
    for _ in range(max_iters):
        # large-star over the symmetrized view
        sym = edges.unionByName(edges.selectExpr("v AS u", "u AS v"))
        ls = (
            sym.withColumn("m", F.least(F.min("v").over(w), F.col("u")))
            .filter(F.col("v") > F.col("u"))
            .selectExpr("v AS u", "m AS v")
            .distinct()
        )
        # small-star over the directed (u > v) list
        ss = (
            ls.withColumn("m", F.min("v").over(w))
            .select(
                F.explode(F.array(F.col("v"), F.col("u"))).alias("n"),
                F.col("m"),
            )
            .filter(F.col("n") != F.col("m"))
            .selectExpr("n AS u", "m AS v")
            .distinct()
            .localCheckpoint(eager=True)
        )
        changed = (
            ss.exceptAll(edges).limit(1).count()
            + edges.exceptAll(ss).limit(1).count()
        )
        edges = ss
        if changed == 0:
            break
    # At the fixpoint every non-min node points at its component min.
    # The groupBy-min guard keeps the one-row-per-id contract even if
    # the loop exits via max_iters before a true star fixpoint (a
    # node may then still carry several parents); the original id
    # column is preserved untouched so both engines return the same
    # schema.
    labels = (
        edges.selectExpr("u AS _jk", "v AS _label")
        .groupBy("_jk")
        .agg(F.min("_label").alias("_label"))
    )
    return (
        ids.select(F.col(id_col), F.col(id_col).cast("long").alias("_jk"))
        .join(labels, "_jk", "left")
        .select(
            F.col(id_col),
            F.coalesce("_label", "_jk").alias("cluster_id"),
        )
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


def canonical_best(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "quality",
) -> DataFrame:
    """Keep one survivor per cluster: the HIGHEST-``score_col``
    member (ties broken by smallest id, so the choice is
    deterministic and engine-independent). This is the corpus
    canonicalization a training pipeline actually wants — when
    near-duplicates differ (one copy truncated, one boilerplated),
    keep the best copy, not the first — where :func:`canonical_docs`
    keeps the min-id member regardless of quality. Adds
    ``cluster_size`` so downstream mixing can weight survivors by
    how much duplication they absorbed. One window over the cluster
    id: rank + size share the single shuffle."""
    w_rank = Window.partitionBy("cluster_id").orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    w_all = Window.partitionBy("cluster_id")
    return (
        docs.join(clusters, id_col)
        .withColumn("_rn", F.row_number().over(w_rank))
        .withColumn("cluster_size", F.count(F.lit(1)).over(w_all))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "cluster_id")
    )
