"""Graph centrality: integer-quantized PageRank.

Companion to the connected-components engines in
``ops/dedup_cluster.py`` — where CC answers "which documents form a
duplicate cluster", PageRank answers "which nodes matter most" over
any relation-derived graph (near-dup graphs, customer↔supplier trade
graphs, citation/link graphs).

Determinism contract — the reason this PageRank is ORACLE-EXACT
where textbook float PageRank cannot be: all arithmetic is integer.
Rank mass is carried in fixed-point units of 1/SCALE; each edge
contribution is ``(dnum · pr_q) div (dden · deg)`` (pure BIGINT
multiply + floor division), the per-node sum of BIGINTs is exact in
any aggregation order, and the teleport term is the integer
``((dden − dnum) · SCALE) div (dden · N)``. No float enters until
the optional final division — so Spark's partitioned execution and a
single-node SQL engine produce bit-identical ranks, and a FIXED
iteration count unrolls into plain chained SQL CTEs (aggregation is
not allowed inside recursive CTEs, but unrolling sidesteps recursion
entirely). The per-iteration floor discards < 1/SCALE of mass per
edge — part of the statistic's definition, far below any ranking
decision at SCALE = 10¹².

Scale shape: per iteration, one join of the edge relation with the
(node-sized) rank relation hashed on src — co-partitioned with the
degree join — and one map-side-combined sum by dst; rank relation is
``localCheckpoint``ed per round (plan depth O(1), the CC/k-means
iterative-operator discipline). Driver holds two scalars (N, base).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Fixed-point denominator for rank mass (micro-micro-units).
PR_SCALE = 1_000_000_000_000

#: Target rows per localCheckpoint partition for iterative state:
#: edge/state tuples run ~32 B, so 4 M rows ≈ 128 MB — the guide's
#: healthy partition size. Iterative loops whose per-round row count
#: is ALREADY a driver scalar (the fixpoint/early-exit counts) use it
#: to coalesce their checkpointed state: broadcast-joined rounds
#: inherit the input's partitioning forever, so a peeled-down graph
#: of a few thousand rows otherwise re-schedules full-width tasks
#: every round (measured: 32 near-empty tasks per stage, ~0.8-1.5 s
#: per k-core round over 1,633 edges at sf0.1). Count-driven and
#: clamped to [1, defaultParallelism], so at real scale the count
#: keeps the state at full cluster width — nothing is tuned to the
#: local core count.
CKPT_ROWS_PER_PARTITION = 4_000_000


def _ckpt_parts(df: DataFrame, n_rows: int) -> int:
    """Partition count for checkpointed iterative state with a
    driver-known row count (see CKPT_ROWS_PER_PARTITION)."""
    width = df.sparkSession.sparkContext.defaultParallelism
    return max(1, min(width, -(-n_rows // CKPT_ROWS_PER_PARTITION)))


def pagerank(
    edges: DataFrame,
    n_iter: int = 4,
    damping_num: int = 85,
    damping_den: int = 100,
    src_col: str = "src",
    dst_col: str = "dst",
    dangling: str = "drop",
) -> DataFrame:
    """Integer-quantized PageRank over a directed edge relation
    (pass each undirected edge in both directions). Returns
    ``(node, pr_q BIGINT, pr DOUBLE)`` — ``pr_q`` is the exact
    fixed-point rank, ``pr`` the single final division by SCALE.

    Dangling-node contract, selected by ``dangling``:

    - ``"drop"`` (default): a node with NO out-edges (dst-only)
      keeps receiving the teleport base and whatever its in-edges
      contribute, but its own rank mass is NOT redistributed — it
      leaves the system each iteration, so on digraphs with sinks
      the ranks do not sum to ~1 and deviate from textbook PageRank.
      This keeps every iteration a pure edge-join + sum (no extra
      global aggregate per round) and is a no-op on graphs where
      every node has an out-edge — e.g. symmetrized/undirected
      graphs like the ``trade_pagerank`` catalog query.
    - ``"redistribute"``: textbook behavior — each iteration the
      total sink mass ``D`` is spread uniformly, every node gaining
      the integer ``(damping_num · D) div (damping_den · N)``. Costs
      one extra (tiny, node-keyed anti-join + 1-row sum) aggregate
      per round, kept IN-PLAN via a cross join of the single-row
      aggregate, so no extra driver round-trips; still fully
      integer, so still oracle-exact (``trade_pagerank_directed``
      unrolls it into per-round scalar CTEs). Mass is conserved up
      to the per-node floor truncations.

    Both pinned by ``tests/test_round7_properties.py``'s star-digraph
    tests."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if not 0 < damping_num < damping_den:
        raise ValueError("need 0 < damping_num < damping_den")
    if dangling not in ("drop", "redistribute"):
        raise ValueError(
            f"dangling must be 'drop' or 'redistribute', got {dangling!r}"
        )
    from dish_data_pipeline_spark.cache_registry import tracked_persist

    # The edge relation may be an arbitrary lazy pipeline (joins,
    # distinct); it is probed once per iteration plus by deg and
    # nodes — persist it or the upstream plan executes ~(n_iter + 2)
    # times (measured 15-18 s vs 4-5 s at sf0.1 on the trade graph).
    e = tracked_persist(
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    )
    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    ).distinct().localCheckpoint()
    deg = tracked_persist(
        e.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    )
    n = nodes.count()  # driver scalar — model state, one row
    if n == 0:
        raise ValueError("edges relation is empty — no nodes to rank")
    init_q = PR_SCALE // n
    base_q = ((damping_den - damping_num) * PR_SCALE) // (damping_den * n)
    pr = nodes.withColumn("pr_q", F.lit(init_q).cast("bigint"))
    contrib_expr = F.expr(
        f"({int(damping_num)} * pr_q) div ({int(damping_den)} * deg)"
    ).cast("bigint")
    for _ in range(n_iter):
        contrib = (
            e.join(pr, e.src == pr.node)
            .join(deg, "src")
            .select(F.col("dst").alias("node"), contrib_expr.alias("_c"))
            .groupBy("node")
            .agg(F.sum("_c").cast("bigint").alias("_s"))
        )
        gain = F.lit(base_q).cast("bigint") + F.coalesce(
            F.col("_s"), F.lit(0).cast("bigint")
        )
        nxt = nodes.join(contrib, "node", "left")
        if dangling == "redistribute":
            # single-row sink-mass aggregate, cross-joined so the
            # share stays in-plan (no driver round-trip per round)
            dang = (
                pr.join(deg, pr.node == deg.src, "left_anti")
                .agg(
                    F.coalesce(F.sum("pr_q"), F.lit(0))
                    .cast("bigint")
                    .alias("_d")
                )
            )
            nxt = nxt.crossJoin(dang)
            gain = gain + F.expr(
                f"({int(damping_num)} * _d) div ({int(damping_den)} * {n})"
            ).cast("bigint")
        pr = nxt.select("node", gain.alias("pr_q")).localCheckpoint()
    return pr.select(
        "node",
        "pr_q",
        (F.col("pr_q").cast("double") / F.lit(float(PR_SCALE))).alias("pr"),
    )


def kcore(
    edges: DataFrame,
    k: int = 2,
    n_rounds: int = 6,
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """k-core peeling: repeatedly delete nodes of degree < ``k``
    (and their edges) for ``n_rounds`` FIXED rounds — the dense-core
    extraction that strips hangers-on from a similarity or
    interaction graph (Seidman, "Network structure and minimum
    degree", Social Networks 1983). Output: the surviving nodes with
    their within-subgraph degree, ``(node, core_degree)``.

    A fixed round count (not run-to-fixpoint) keeps the operator
    oracle-expressible by UNROLLING — the same device as the
    fixed-iteration PageRank: each round is one degree aggregation +
    one two-sided semi-join filter, plain chained SQL. Peeling is
    monotone (kept sets only shrink), so if round r removes nothing
    the result is final; ``n_rounds`` bounds the cascade depth, and
    real similarity graphs cascade shallowly. All-integer — exact in
    both engines by construction.

    Scale shape: per round, one map-side-combined degree count and
    two semi-joins of the edge relation against the (node-sized)
    kept set, ``localCheckpoint``ed so plan depth stays O(1)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_rounds < 1:
        raise ValueError(f"n_rounds must be >= 1, got {n_rounds}")
    e = edges.select(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    ).localCheckpoint()
    n_edges = e.count()
    for _ in range(n_rounds):
        deg = (
            e.selectExpr("a AS node")
            .unionAll(e.selectExpr("b AS node"))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        kept = deg.filter(F.col("deg") >= k).select("node")
        e = (
            e.join(kept.selectExpr("node AS a"), "a", "left_semi")
            .join(kept.selectExpr("node AS b"), "b", "left_semi")
            .select("a", "b")
            # kept sets only shrink and the previous round's edge
            # count is already a driver scalar (the fixpoint probe):
            # right-size the checkpointed state instead of inheriting
            # the input's width through the broadcast semi-joins
            .coalesce(_ckpt_parts(e, n_edges))
            .localCheckpoint()
        )
        # fixpoint early-exit (1 scalar per round, like the CC
        # engines): peeling is monotone, so an unchanged edge count
        # means every remaining round is a no-op — the result still
        # equals the full n_rounds unroll the oracle computes
        prev, n_edges = n_edges, e.count()
        if n_edges == prev:
            break
    return (
        e.selectExpr("a AS node")
        .unionAll(e.selectExpr("b AS node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_degree"))
        .filter(F.col("core_degree") >= k)
    )


def kcore_sql(
    edges_cte: str,
    k: int = 2,
    n_rounds: int = 6,
    node_out: str = "node",
) -> str:
    """DuckDB twin: the peeling rounds unrolled as chained CTEs over
    an edge relation named ``edges_cte`` with columns (a, b).
    ``node_out`` renames the output node column (cast to BIGINT)."""
    rounds = []
    prev = edges_cte
    for i in range(n_rounds):
        # MATERIALIZED: each round references its predecessor 4× —
        # inlining would expand the chain exponentially
        rounds.append(f"""d{i} AS MATERIALIZED (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT a AS node FROM {prev} UNION ALL SELECT b FROM {prev})
  GROUP BY node),
k{i} AS (SELECT node FROM d{i} WHERE deg >= {k}),
e{i} AS MATERIALIZED (
  SELECT e.a, e.b FROM {prev} e
  JOIN k{i} ka ON ka.node = e.a
  JOIN k{i} kb ON kb.node = e.b)""")
        prev = f"e{i}"
    body = ",\n".join(rounds)
    return f"""{body}
SELECT CAST(node AS BIGINT) AS {node_out},
       CAST(COUNT(*) AS BIGINT) AS core_degree FROM (
  SELECT a AS node FROM {prev} UNION ALL SELECT b FROM {prev})
GROUP BY node HAVING COUNT(*) >= {k}"""


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
) -> DataFrame:
    """Multi-source BFS: minimum hop distance from any seed node,
    bounded at ``max_hops`` — the reachability / blast-radius query
    (which parties are within k trades of a sanctioned entity; which
    documents sit within k near-dup links of a contaminated one).
    Returns ``(node, hops INT)`` with one row per reached node;
    seeds themselves are hops 0. Unreached nodes are absent.

    Frontier expansion: round h joins the PREVIOUS frontier (not the
    whole reached set) against the edge relation, dedups, and
    anti-joins the reached set so every node is labeled with its
    first (minimal) hop count — textbook level-synchronous BFS. A
    FIXED hop bound keeps it oracle-expressible by unrolling (the
    PageRank/k-core device); the early exit when a frontier empties
    is sound because later rounds of an empty frontier are no-ops.

    Scale shape: per round, one hash join of edges against the
    frontier (AQE broadcasts small frontiers), one distinct, one
    anti-join against the reached set; frontier and reached set are
    ``localCheckpoint``ed so plan depth stays O(1). The driver sees
    one scalar count per round. All comparisons, no arithmetic —
    exact in any engine."""
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    from dish_data_pipeline_spark.cache_registry import tracked_persist

    e = tracked_persist(
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    )
    dist = (
        seeds.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("hops", F.lit(0).cast("int"))
        .localCheckpoint()
    )
    n_dist = dist.count()
    frontier = dist.select("node")
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .withColumn("hops", F.lit(h).cast("int"))
            .localCheckpoint()
        )
        n_nxt = nxt.count()
        if n_nxt == 0:
            break
        n_dist += n_nxt
        # both counts are already driver scalars (the early-exit
        # probe): right-size the accumulated reached set instead of
        # letting the per-round union grow its partition count
        dist = (
            dist.unionByName(nxt)
            .coalesce(_ckpt_parts(dist, n_dist))
            .localCheckpoint()
        )
        frontier = nxt.select("node")
    return dist


def bfs_hops_sql(
    edges_cte: str,
    seeds_cte: str,
    max_hops: int = 3,
    node_out: str = "node",
) -> str:
    """DuckDB twin: the BFS rounds unrolled as chained CTEs over an
    edge relation ``edges_cte`` (src, dst) and a seed relation
    ``seeds_cte`` (node). Emits every reached node with its minimal
    hop count — identical semantics to :func:`bfs_hops` (which may
    early-exit, a no-op difference)."""
    parts = [
        f"d0 AS MATERIALIZED (SELECT DISTINCT node, 0 AS hops FROM {seeds_cte})",
        "f0 AS (SELECT node FROM d0)",
    ]
    for h in range(1, max_hops + 1):
        parts.append(f"""n{h} AS MATERIALIZED (
  SELECT DISTINCT e.dst AS node
  FROM f{h - 1} f JOIN {edges_cte} e ON e.src = f.node
  WHERE NOT EXISTS (SELECT 1 FROM d{h - 1} d WHERE d.node = e.dst)),
d{h} AS MATERIALIZED (
  SELECT node, hops FROM d{h - 1}
  UNION ALL SELECT node, {h} AS hops FROM n{h}),
f{h} AS (SELECT node FROM n{h})""")
    body = ",\n".join(parts)
    return f"""{body}
SELECT node AS {node_out}, CAST(hops AS INT) AS hops FROM d{max_hops}"""


#: Fixed-point denominator for label mass (same magnitude as
#: PR_SCALE: 10^12 leaves ~10^6 headroom in BIGINT sums over
#: million-neighbor nodes).
LP_SCALE = 1_000_000_000_000


def label_propagate(
    edges: DataFrame,
    seeds: DataFrame,
    n_iter: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    label_col: str = "label",
) -> DataFrame:
    """Semi-supervised label propagation with clamped seeds (Zhu &
    Ghahramani 2002 shape) over a directed edge relation (pass each
    undirected edge both ways): spread a small set of trusted labels
    (human-rated quality, known language, verified toxicity) across
    a similarity graph so every connected document inherits a label
    plus a confidence mass. The LLM-corpus use: hand-label 1/1000 of
    the corpus, propagate over the near-dup/metadata-blocking graph,
    and get corpus-wide weak labels without a model.

    Determinism contract (the PageRank device): label mass is
    fixed-point BIGINT in units of 1/LP_SCALE. Each round every node
    v receives, per label l, ``Σ_{u→v} s_q(u, l) div deg(u)`` (pure
    BIGINT multiply-free floor division; non-negative, so Spark
    ``div`` and DuckDB ``//`` agree), summed exactly in any order;
    seed nodes are then CLAMPED back to one-hot LP_SCALE on their
    seed label. A FIXED ``n_iter`` unrolls into chained SQL CTEs
    (:func:`label_propagate_sql`). Zero-mass rows are dropped, so
    state stays bounded by (reached nodes × observed labels).

    Output: ``(node, label INT, s_q BIGINT, score DOUBLE)`` — the
    argmax label per reached node (ties break toward the smaller
    label id), score = one final IEEE division. Nodes never reached
    by any seed's mass are absent.

    Scale shape: per round, one hash join of the edge relation with
    the node-keyed state (co-partitioned with the degree join) and
    one map-side-combined sum by (dst, label); state is
    ``localCheckpoint``ed per round so plan depth stays O(1). No
    driver data round-trips at all — the loop is plan construction
    only."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    from pyspark.sql import Window

    from dish_data_pipeline_spark.cache_registry import tracked_persist

    e = tracked_persist(
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    )
    deg = tracked_persist(
        e.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    )
    sd = (
        seeds.select(
            F.col(node_col).alias("node"),
            F.col(label_col).cast("int").alias("label"),
        )
        .distinct()
        .localCheckpoint()
    )
    one_hot = sd.withColumn("s_q", F.lit(LP_SCALE).cast("bigint"))
    state = one_hot
    for _ in range(n_iter):
        contrib = (
            e.join(state, state["node"] == e["src"])
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                "label",
                F.expr("s_q div deg").cast("bigint").alias("_c"),
            )
            .groupBy("node", "label")
            .agg(F.sum("_c").cast("bigint").alias("s_q"))
        )
        state = (
            contrib.filter(F.col("s_q") > 0)
            .join(sd.select("node"), "node", "left_anti")
            .unionByName(one_hot)
            .localCheckpoint()
        )
    w = Window.partitionBy("node").orderBy(
        F.col("s_q").desc(), F.col("label").asc()
    )
    return (
        state.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "node",
            "label",
            "s_q",
            (F.col("s_q").cast("double") / F.lit(float(LP_SCALE))).alias(
                "score"
            ),
        )
    )


def label_propagate_sql(
    edges_cte: str,
    seeds_cte: str,
    n_iter: int = 3,
    node_out: str = "node",
) -> str:
    """DuckDB twin: the propagation rounds unrolled as chained CTEs
    over an edge relation ``edges_cte`` (src, dst) and a seed
    relation ``seeds_cte`` (node, label). Identical all-integer
    arithmetic to :func:`label_propagate`."""
    parts = [
        f"""lpdeg AS MATERIALIZED (
  SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM {edges_cte} GROUP BY src)""",
        f"""lpsd AS MATERIALIZED (
  SELECT DISTINCT node, CAST(label AS INT) AS label FROM {seeds_cte})""",
        f"""lps0 AS (
  SELECT node, label, CAST({LP_SCALE} AS BIGINT) AS s_q FROM lpsd)""",
    ]
    for i in range(1, n_iter + 1):
        parts.append(f"""lpc{i} AS MATERIALIZED (
  SELECT e.dst AS node, s.label, CAST(SUM(s.s_q // d.deg) AS BIGINT) AS s_q
  FROM {edges_cte} e
  JOIN lps{i - 1} s ON s.node = e.src
  JOIN lpdeg d ON d.src = e.src
  GROUP BY e.dst, s.label),
lps{i} AS MATERIALIZED (
  SELECT c.node, c.label, c.s_q FROM lpc{i} c
  WHERE c.s_q > 0
    AND NOT EXISTS (SELECT 1 FROM lpsd sd WHERE sd.node = c.node)
  UNION ALL
  SELECT node, label, CAST({LP_SCALE} AS BIGINT) AS s_q FROM lpsd)""")
    body = ",\n".join(parts)
    return f"""{body}
SELECT node AS {node_out}, label, s_q,
       CAST(s_q AS DOUBLE) / {float(LP_SCALE)} AS score
FROM (
  SELECT node, label, s_q,
         row_number() OVER (PARTITION BY node
                            ORDER BY s_q DESC, label ASC) AS _rn
  FROM lps{n_iter}) t
WHERE _rn = 1"""


def triangle_counts(
    edges: DataFrame,
    src_col: str = "u",
    dst_col: str = "v",
) -> DataFrame:
    """Per-node triangle counts → (node, n_triangles BIGINT), nodes
    in at least one triangle. Total triangles = sum / 3.

    Input is any edge relation over an UNDIRECTED simple graph;
    direction, duplicates, and self-loops are normalized away first
    (``least/greatest`` + distinct).

    Algorithm — degree-ordered node-iterator (the MapReduce-classic
    from Suri & Vassilvitskii, "Counting Triangles and the Curse of
    the Last Reducer", WWW'11, and the shape Spark's own GraphX
    TriangleCount uses): orient every edge from the (degree, node)-
    smaller endpoint to the larger, enumerate wedges by joining the
    oriented list with itself on the shared SOURCE, then close each
    wedge against the oriented edge list.

    Why this scales where the naive 3-way join dies: wedges are
    enumerated at each triangle's LOWEST-degree corner, so a
    celebrity node with degree d never expands its d² neighbor
    pairs — total wedge work is O(m^1.5) regardless of skew, each
    wedge is a hash-join row (no driver state), and the closure is
    one more equi-join. Three shuffles beyond the degree count:
    wedge join on src, closure join on the (lo, hi) pair, final
    per-node aggregate. The (degree, node) order is evaluated as a
    struct comparison inside the join condition — no global
    rank/window stage, so nothing ever funnels to one partition.

    Orientation changes WORK, never RESULTS: the triangle set —
    and therefore every per-node count — is orientation-independent,
    which is what lets a DuckDB oracle verify this with the simple
    id-ordered 3-way self-join (see SQL_PART_TRIANGLES).
    """
    from dish_data_pipeline_spark.cache_registry import tracked_persist

    u, v = F.col(src_col), F.col(dst_col)
    ec = tracked_persist(
        edges.filter(u != v)
        .select(F.least(u, v).alias("lo"), F.greatest(u, v).alias("hi"))
        .distinct()
    )
    deg = (
        ec.select(F.col("lo").alias("node"))
        .unionAll(ec.select(F.col("hi").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    dl = deg.select(F.col("node").alias("lo"), F.col("deg").alias("dlo"))
    dh = deg.select(F.col("node").alias("hi"), F.col("deg").alias("dhi"))
    keyed = ec.join(dl, "lo").join(dh, "hi")
    lo_k = F.struct(
        F.col("dlo").alias("deg"), F.col("lo").alias("node")
    )
    hi_k = F.struct(
        F.col("dhi").alias("deg"), F.col("hi").alias("node")
    )
    # The oriented list is read three times (both wedge sides + the
    # closure); persist it or each reference re-derives the whole
    # canonicalize+degree lineage — the multi-pass graph-operator
    # discipline shared with pagerank/connected components. Both
    # persists are edge-sized and released via the cache registry.
    oriented = tracked_persist(
        keyed.select(
            F.when(lo_k < hi_k, F.col("lo"))
            .otherwise(F.col("hi"))
            .alias("src"),
            F.when(lo_k < hi_k, hi_k).otherwise(lo_k).alias("dst_k"),
        ).select("src", F.col("dst_k.*"))
    )
    # oriented: src → (deg, node) of the larger endpoint
    o1 = oriented.select("src", F.col("deg").alias("d1"),
                         F.col("node").alias("n1"))
    o2 = oriented.select(F.col("src").alias("src2"),
                         F.col("deg").alias("d2"),
                         F.col("node").alias("n2"))
    wedges = o1.join(o2, o1.src == o2.src2).filter(
        F.struct(F.col("d1"), F.col("n1")) < F.struct(F.col("d2"), F.col("n2"))
    )
    closure = oriented.select(
        F.col("src").alias("w1"), F.col("node").alias("w2")
    )
    tri = wedges.join(
        closure,
        (F.col("n1") == F.col("w1")) & (F.col("n2") == F.col("w2")),
        "left_semi",
    ).select(F.col("src").alias("a"), F.col("n1").alias("b"),
             F.col("n2").alias("c"))
    return (
        tri.select(
            F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias(
                "node"
            )
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )


def clustering_coefficients(
    edges: DataFrame,
    src_col: str = "u",
    dst_col: str = "v",
) -> DataFrame:
    """Per-node local clustering coefficient → (node, deg BIGINT,
    n_triangles BIGINT, clustering DOUBLE): the fraction of a
    node's neighbor pairs that are themselves connected,
    ``2·tri / (deg·(deg−1))`` (Watts-Strogatz), 0.0 for degree-1
    nodes. Rides on :func:`triangle_counts` (same O(m^1.5) bound)
    plus the degree relation; the closing division is one IEEE op
    on exact integers, so a SQL oracle reproduces it bit-for-bit."""
    from dish_data_pipeline_spark.cache_registry import tracked_persist

    u, v = F.col(src_col), F.col(dst_col)
    # persisted: read by the degree aggregate AND by triangle_counts
    # (whose own canonicalization is then a no-op pass over this)
    ec = tracked_persist(
        edges.filter(u != v)
        .select(F.least(u, v).alias("lo"), F.greatest(u, v).alias("hi"))
        .distinct()
    )
    deg = (
        ec.select(F.col("lo").alias("node"))
        .unionAll(ec.select(F.col("hi").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    )
    tri = triangle_counts(ec, "lo", "hi")
    joined = deg.join(tri, "node", "left").select(
        "node",
        "deg",
        F.coalesce(F.col("n_triangles"), F.lit(0))
        .cast("bigint")
        .alias("n_triangles"),
    )
    return joined.withColumn(
        "clustering",
        F.when(
            F.col("deg") > 1,
            2.0
            * F.col("n_triangles").cast("double")
            / (F.col("deg") * (F.col("deg") - 1)).cast("double"),
        ).otherwise(F.lit(0.0)),
    )
