"""Triangle counting (ops/graph.py::triangle_counts) vs a pure-Python
brute force, plus shape edge cases."""

from __future__ import annotations

import itertools
import random

from dish_data_pipeline_spark.ops.graph import triangle_counts


def test_k4_every_node_in_three_triangles(spark):
    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a < b],
        "u long, v long",
    )
    got = sorted((r.node, r.n_triangles) for r in triangle_counts(k4).collect())
    assert got == [(0, 3), (1, 3), (2, 3), (3, 3)]


def test_triangle_free_graph_is_empty(spark):
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "u long, v long"
    )
    assert triangle_counts(path).count() == 0
    star = spark.createDataFrame([(0, i) for i in range(1, 8)],
                                 "u long, v long")
    assert triangle_counts(star).count() == 0


def test_random_graph_matches_brute_force(spark):
    """Duplicates, reversed edges, and self-loops in the input must
    all normalize away; per-node counts must match enumeration."""
    random.seed(7)
    edges = {
        (a, b)
        for a in range(30)
        for b in range(a + 1, 30)
        if random.random() < 0.2
    }
    rows = (
        list(edges)
        + [(b, a) for a, b in edges]   # reversed duplicates
        + [(5, 5), (9, 9)]             # self-loops
    )
    df = spark.createDataFrame(rows, "u long, v long")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    adj: dict[int, set[int]] = {n: set() for n in range(30)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want: dict[int, int] = {}
    for a, b, c in itertools.combinations(range(30), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                want[n] = want.get(n, 0) + 1
    assert got == want
    assert sum(got.values()) % 3 == 0  # every triangle counted thrice


def test_string_node_ids(spark):
    tri = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "u string, v string"
    )
    got = {r.node: r.n_triangles for r in triangle_counts(tri).collect()}
    assert got == {"a": 1, "b": 1, "c": 1}


def test_clustering_coefficients_square_with_diagonal(spark):
    from dish_data_pipeline_spark.ops.graph import clustering_coefficients

    # square 0-1-2-3 plus diagonal 0-2: nodes 0/2 have deg 3 and sit
    # in 2 triangles (cc = 2*2/6), nodes 1/3 deg 2 in 1 (cc = 1.0)
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)], "u long, v long"
    )
    got = {
        r.node: (r.deg, r.n_triangles, round(r.clustering, 6))
        for r in clustering_coefficients(e).collect()
    }
    assert got == {
        0: (3, 2, round(2 / 3, 6)),
        1: (2, 1, 1.0),
        2: (3, 2, round(2 / 3, 6)),
        3: (2, 1, 1.0),
    }


def test_clustering_degree_one_and_isolated_from_triangles(spark):
    from dish_data_pipeline_spark.ops.graph import clustering_coefficients

    # triangle 0-1-2 plus pendant 2-9: node 9 has deg 1 → cc 0.0 and
    # appears in the output (unlike triangle_counts, which only
    # reports triangle members)
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (2, 9)], "u long, v long"
    )
    got = {r.node: (r.deg, r.n_triangles, r.clustering)
           for r in clustering_coefficients(e).collect()}
    assert got[9] == (1, 0, 0.0)
    assert got[0] == (2, 1, 1.0)
    assert got[2][0] == 3 and got[2][1] == 1
