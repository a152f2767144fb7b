"""2D Pareto skyline vs brute-force dominance."""

from __future__ import annotations

import random

from pyspark.sql import Row

from dish_data_pipeline_spark.ops.skyline import skyline_2d


def _brute(points, minimize_x=True, maximize_y=True):
    def better_x(a, b):
        return a < b if minimize_x else a > b

    def better_y(a, b):
        return a > b if maximize_y else a < b

    out = []
    for p in points:
        dominated = any(
            (better_x(q[0], p[0]) or q[0] == p[0])
            and (better_y(q[1], p[1]) or q[1] == p[1])
            and (better_x(q[0], p[0]) or better_y(q[1], p[1]))
            for q in points
        )
        if not dominated:
            out.append(p)
    return sorted(out)


def _run(spark, points, **kw):
    df = spark.createDataFrame(
        [Row(i=i, x=float(x), y=y) for i, (x, y) in enumerate(points)]
    )
    got = sorted((r.x, r.y) for r in skyline_2d(df, "x", "y", **kw).collect())
    return got


def test_matches_bruteforce_random(spark):
    rng = random.Random(7)
    # few partitions force the cross-partition carry path; duplicate
    # x values exercise the groupBy candidate reduction
    points = [(rng.randrange(40) / 4.0, rng.randrange(30)) for _ in range(300)]
    assert _run(spark, points, partitions=5) == _brute(points)


def test_ties_on_frontier_all_kept(spark):
    points = [(1.0, 10), (1.0, 10), (2.0, 5)]
    assert _run(spark, points) == [(1.0, 10), (1.0, 10)]


def test_sign_flips(spark):
    points = [(1.0, 10), (2.0, 20), (3.0, 5)]
    # maximize x, minimize y: (3,5) and (2,20)? (2,20): worse x than 3,
    # worse y than 5-at-3 → dominated by (3,5) on both → frontier {(3,5)}
    got = _run(spark, points, minimize_x=False, maximize_y=False)
    assert got == _brute(points, minimize_x=False, maximize_y=False)
    assert got == [(3.0, 5)]


def test_nulls_excluded(spark):
    df = spark.createDataFrame(
        [Row(x=None, y=99), Row(x=1.0, y=None), Row(x=2.0, y=3)]
    )
    rows = skyline_2d(df, "x", "y").collect()
    assert [(r.x, r.y) for r in rows] == [(2.0, 3)]


def test_empty_input(spark):
    df = spark.createDataFrame([], "x double, y int")
    assert skyline_2d(df, "x", "y").count() == 0


def test_single_partition_equivalent(spark):
    rng = random.Random(11)
    points = [(rng.randrange(25) / 2.0, rng.randrange(25)) for _ in range(120)]
    assert _run(spark, points, partitions=1) == _run(
        spark, points, partitions=8
    )
