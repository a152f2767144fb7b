"""Round-8 property tests: clamped-seed label propagation."""

from __future__ import annotations

from dish_data_pipeline_spark.ops.graph import LP_SCALE, label_propagate


def _edges(spark, pairs):
    sym = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(sym, "src bigint, dst bigint")


def test_path_graph_mass_and_tiebreak(spark):
    """Path 1-2-3, seeds at the ends: the middle node receives full
    mass from both sides (tie) and the tiebreak picks the smaller
    label id; seeds stay clamped one-hot."""
    e = _edges(spark, [(1, 2), (2, 3)])
    seeds = spark.createDataFrame([(1, 0), (3, 1)], "node bigint, label int")
    out = {
        r["node"]: (r["label"], r["s_q"])
        for r in label_propagate(e, seeds, n_iter=3).collect()
    }
    assert out[1] == (0, LP_SCALE)
    assert out[3] == (1, LP_SCALE)
    assert out[2] == (0, LP_SCALE)  # tie LP_SCALE/LP_SCALE -> label 0


def test_unreached_island_absent(spark):
    """A connected component with no seed gets no rows."""
    e = _edges(spark, [(1, 2), (10, 11)])
    seeds = spark.createDataFrame([(1, 7)], "node bigint, label int")
    out = {r["node"] for r in label_propagate(e, seeds, n_iter=3).collect()}
    assert out == {1, 2}


def test_degree_split_floor(spark):
    """A degree-2 spreader sends floor(S/2) each way; a seedless
    leaf two hops out gets floor(floor(S/2)/1) after round 2."""
    # star: seed 1 - hub 2 - leaves 3,4
    e = _edges(spark, [(1, 2), (2, 3), (2, 4)])
    seeds = spark.createDataFrame([(1, 5)], "node bigint, label int")
    out = {
        r["node"]: (r["label"], r["s_q"])
        for r in label_propagate(e, seeds, n_iter=2).collect()
    }
    # hub deg=3: after round 1 hub holds S; round 2 leaves get S div 3
    assert out[3] == (5, LP_SCALE // 3)
    assert out[4] == (5, LP_SCALE // 3)
    assert out[1] == (5, LP_SCALE)
