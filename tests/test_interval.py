"""Interval sweep-line (ops/interval.max_concurrency): brute-force
equivalence, half-open semantics, carry across range partitions,
grouping, and null handling."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from dish_data_pipeline_spark.ops.interval import max_concurrency


def _brute_max_concurrency(intervals):
    """O(n²) reference on half-open [s, e): peak count of intervals
    open at any start point."""
    best = 0
    for s, _ in intervals:
        open_n = sum(1 for s2, e2 in intervals if s2 <= s < e2)
        best = max(best, open_n)
    return best


def _mk(spark, rows, with_group=False):
    schema = (
        "g string, s timestamp_ntz, e timestamp_ntz"
        if with_group
        else "s timestamp_ntz, e timestamp_ntz"
    )
    return spark.createDataFrame(rows, schema)


EPOCH = dt.datetime(2024, 1, 1)


def _ts(sec):
    return EPOCH + dt.timedelta(seconds=sec)


def test_basic_overlap(spark):
    # [0,10) [5,15) [9,12) overlap 3 at t=9; [20,21) disjoint
    df = _mk(
        spark,
        [
            (_ts(0), _ts(10)),
            (_ts(5), _ts(15)),
            (_ts(9), _ts(12)),
            (_ts(20), _ts(21)),
        ],
    )
    row = max_concurrency(df, "s", "e").collect()[0]
    assert row["n_intervals"] == 4
    assert row["max_concurrent"] == 3


def test_half_open_touching_intervals_do_not_overlap(spark):
    df = _mk(spark, [(_ts(0), _ts(10)), (_ts(10), _ts(20))])
    row = max_concurrency(df, "s", "e").collect()[0]
    assert row["max_concurrent"] == 1


def test_carry_crosses_range_partitions(spark):
    """A staircase that only peaks after many partition boundaries:
    20 nested intervals forced through 8 range partitions — the
    peak (20) requires the cross-partition carry."""
    rows = [(_ts(i), _ts(100 - i)) for i in range(20)]
    df = _mk(spark, rows)
    row = max_concurrency(df, "s", "e", partitions=8).collect()[0]
    assert row["max_concurrent"] == 20
    assert row["n_intervals"] == 20


def test_grouped(spark):
    rows = [
        ("a", _ts(0), _ts(10)),
        ("a", _ts(5), _ts(6)),
        ("b", _ts(0), _ts(1)),
        ("b", _ts(2), _ts(3)),
    ]
    out = {
        r["g"]: (r["n_intervals"], r["max_concurrent"])
        for r in max_concurrency(
            _mk(spark, rows, with_group=True), "s", "e", ["g"], partitions=4
        ).collect()
    }
    assert out == {"a": (2, 2), "b": (2, 1)}


def test_null_endpoints_excluded(spark):
    df = _mk(spark, [(_ts(0), _ts(10)), (None, _ts(5)), (_ts(1), None)])
    row = max_concurrency(df, "s", "e").collect()[0]
    assert row["n_intervals"] == 1
    assert row["max_concurrent"] == 1


def test_interval_join_matches_bruteforce(spark):
    from dish_data_pipeline_spark.ops.interval import interval_join

    ivals = [("a", 1, 0, 10), ("a", 2, 5, 6), ("a", 3, 9, 30), ("b", 4, 0, 100)]
    pts = [("a", 10, 0), ("a", 11, 5), ("a", 12, 9), ("a", 13, 10),
           ("b", 14, 50), ("a", 15, 99)]
    iv = spark.createDataFrame(
        [(g, i, _ts(s), _ts(e)) for g, i, s, e in ivals],
        "g string, iv_id bigint, s timestamp_ntz, e timestamp_ntz",
    )
    p = spark.createDataFrame(
        [(g, i, _ts(t)) for g, i, t in pts],
        "g string, pid bigint, t timestamp_ntz",
    )
    got = {
        (r["pid"], r["iv_id"])
        for r in interval_join(p, iv, "t", "s", "e", ["g"]).collect()
    }
    want = {
        (pi, ii)
        for gp, pi, t in pts
        for gi, ii, s, e in ivals
        if gp == gi and s <= t < e
    }
    assert got == want
    # a tiny grid (heavy replication) must not change the result
    got2 = {
        (r["pid"], r["iv_id"])
        for r in interval_join(
            p, iv, "t", "s", "e", ["g"], grid_seconds=3
        ).collect()
    }
    assert got2 == want


def test_interval_join_null_endpoints_never_match(spark):
    from dish_data_pipeline_spark.ops.interval import interval_join

    iv = spark.createDataFrame(
        [("a", 1, _ts(0), _ts(10)), ("a", 2, None, _ts(10))],
        "g string, iv_id bigint, s timestamp_ntz, e timestamp_ntz",
    )
    p = spark.createDataFrame(
        [("a", 9, _ts(5))], "g string, pid bigint, t timestamp_ntz"
    )
    rows = interval_join(p, iv, "t", "s", "e", ["g"]).collect()
    assert [(r["pid"], r["iv_id"]) for r in rows] == [(9, 1)]


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),
            st.integers(min_value=1, max_value=30),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_matches_bruteforce(spark, ivals):
    intervals = [(s, s + d) for s, d in ivals]
    df = _mk(
        spark,
        [(_ts(s), _ts(e)) for s, e in intervals],
    )
    row = max_concurrency(df, "s", "e", partitions=5).collect()[0]
    assert row["max_concurrent"] == _brute_max_concurrency(intervals)
    assert row["n_intervals"] == len(intervals)
