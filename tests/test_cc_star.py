"""Connected-components engine equivalence: min-label propagation,
large-star/small-star contraction, and a pure-Python union-find must
agree on random graphs (hypothesis), chains (the star engine's
raison d'être), and the auto-switch path."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Row

from dish_data_pipeline_spark.ops.dedup_cluster import connected_components

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _py_components(n_ids: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = list(range(n_ids))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min reachable id per node
    return {i: find(i) for i in range(n_ids)}


def _spark_cc(spark, n_ids, edges, **kw) -> dict[int, int]:
    ids = spark.createDataFrame([Row(doc_id=i) for i in range(n_ids)])
    if edges:
        pairs = spark.createDataFrame([Row(id_a=a, id_b=b) for a, b in edges])
    else:
        pairs = spark.createDataFrame([], "id_a long, id_b long")
    return {
        r.doc_id: r.cluster_id
        for r in connected_components(ids, pairs, **kw).collect()
    }


GRAPH = st.integers(min_value=1, max_value=12).flatmap(
    lambda n: st.tuples(
        st.just(n),
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=n - 1),
                st.integers(min_value=0, max_value=n - 1),
            ),
            max_size=16,
        ),
    )
)


@given(graph=GRAPH)
@SLOW
def test_cc_engines_match_union_find(spark, graph):
    n, edges = graph
    edges = [(a, b) for a, b in edges if a != b]
    expect = _py_components(n, edges)
    assert _spark_cc(spark, n, edges, algorithm="minlabel") == expect
    assert _spark_cc(spark, n, edges, algorithm="star") == expect


def test_cc_star_on_long_chain(spark):
    """A 40-node path has diameter 39 — min-label needs 39 rounds,
    the star contraction collapses it in O(log n). Also exercises
    the auto-switch (min-label budget exhausted → star restart)."""
    n = 40
    chain = [(i, i + 1) for i in range(n - 1)]
    expect = {i: 0 for i in range(n)}
    assert _spark_cc(spark, n, chain, algorithm="star") == expect
    assert (
        _spark_cc(spark, n, chain, algorithm="auto", switch_after=3) == expect
    )


def test_cc_rejects_unknown_algorithm(spark):
    import pytest

    with pytest.raises(ValueError, match="unknown algorithm"):
        _spark_cc(spark, 2, [(0, 1)], algorithm="bogus")


# --- canonical_best ------------------------------------------------
def test_canonical_best_keeps_highest_quality(spark):
    from pyspark.sql import Row

    from dish_data_pipeline_spark.ops.dedup_cluster import canonical_best

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, quality=0.5),
            Row(doc_id=2, quality=0.9),  # cluster {1,2,3}: best
            Row(doc_id=3, quality=0.9),  # tie — 2 wins (smaller id)
            Row(doc_id=4, quality=0.1),  # singleton survives
        ]
    )
    clusters = spark.createDataFrame(
        [
            Row(doc_id=1, cluster_id=1),
            Row(doc_id=2, cluster_id=1),
            Row(doc_id=3, cluster_id=1),
            Row(doc_id=4, cluster_id=4),
        ]
    )
    got = {
        r.doc_id: (r.quality, r.cluster_size)
        for r in canonical_best(docs, clusters).collect()
    }
    assert got == {2: (0.9, 3), 4: (0.1, 1)}
