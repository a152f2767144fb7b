"""Grid proximity join (ops/spatial.proximity_join): brute-force
equivalence including cross-cell pairs, boundary distances, and NULL
coordinates."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from dish_data_pipeline_spark.ops.spatial import proximity_join


def _brute(pts, r):
    out = set()
    for i, (ia, xa, ya) in enumerate(pts):
        for ib, xb, yb in pts[i + 1 :]:
            a, b = sorted((ia, ib))
            d2 = (xa - xb) ** 2 + (ya - yb) ** 2
            if d2 <= r * r:
                out.add((a, b, d2))
    return out


def test_cross_cell_and_boundary_pairs(spark):
    # r=10: (0,0)-(9,0) same cell; (9,0)-(11,0) adjacent cells;
    # (0,0)-(10,0) EXACTLY r apart (must match); (0,0)-(25,0) out
    pts = [(1, 0, 0), (2, 9, 0), (3, 11, 0), (4, 10, 0), (5, 25, 0)]
    df = spark.createDataFrame(pts, "id bigint, x bigint, y bigint")
    got = {
        (r["id_a"], r["id_b"], r["dist2"])
        for r in proximity_join(df, "id", "x", "y", 10).collect()
    }
    assert got == _brute(pts, 10)
    assert (1, 4, 100) in got  # the exactly-at-radius pair


def test_null_coordinates_never_pair(spark):
    df = spark.createDataFrame(
        [(1, 0, 0), (2, None, 0), (3, 1, None)],
        "id bigint, x bigint, y bigint",
    )
    assert proximity_join(df, "id", "x", "y", 5).count() == 0


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-40, max_value=40),
            st.integers(min_value=-40, max_value=40),
        ),
        min_size=1,
        max_size=20,
        unique=True,
    )
)
def test_matches_bruteforce(spark, coords):
    pts = [(i, x, y) for i, (x, y) in enumerate(coords)]
    df = spark.createDataFrame(pts, "id bigint, x bigint, y bigint")
    got = {
        (r["id_a"], r["id_b"], r["dist2"])
        for r in proximity_join(df, "id", "x", "y", 7).collect()
    }
    assert got == _brute(pts, 7)
