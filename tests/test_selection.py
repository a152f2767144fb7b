"""Distributed exact selection (ops/selection.exact_quantile):
brute-force equivalence, ties, tiny groups, NULL/NaN handling, and
the narrowing path actually engaging (n > collect threshold)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

import dish_data_pipeline_spark.ops.selection as sel
from dish_data_pipeline_spark.ops.selection import exact_quantile


def _brute(vals, p):
    s = sorted(vals)
    return s[max(1, math.ceil(p * len(s))) - 1]


def test_grouped_median_matches_brute(spark):
    rows = [("a", float(v)) for v in [5, 1, 9, 3, 7]] + [
        ("b", float(v)) for v in [2, 2, 2, 8]
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {
        r["g"]: (r["n"], r["q"])
        for r in exact_quantile(df, "v", 0.5, ["g"]).collect()
    }
    assert out == {"a": (5, 5.0), "b": (4, 2.0)}


def test_null_and_nan_excluded(spark):
    rows = [("a", 1.0), ("a", None), ("a", float("nan")), ("a", 3.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    (r,) = exact_quantile(df, "v", 0.5, ["g"]).collect()
    assert (r["n"], r["q"]) == (2, 1.0)


def test_single_value_and_all_equal(spark):
    rows = [("a", 4.0)] + [("b", 7.0)] * 9
    df = spark.createDataFrame(rows, "g string, v double")
    out = {
        r["g"]: r["q"] for r in exact_quantile(df, "v", 0.5, ["g"]).collect()
    }
    assert out == {"a": 4.0, "b": 7.0}


def test_narrowing_path_engages(spark, monkeypatch):
    """Force the histogram rounds (collect threshold below n) and
    check exactness on an adversarially skewed distribution."""
    monkeypatch.setattr(sel, "COLLECT_THRESHOLD", 50)
    vals = [float(i * i) for i in range(1000)] + [1e12, -1e12]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    (r,) = exact_quantile(df, "v", 0.5, []).collect()
    assert r["q"] == _brute(vals, 0.5)
    assert r["n"] == len(vals)


def test_null_group_key_resolves(spark, monkeypatch):
    """A NULL group key must match its own group in the narrowing
    filters (null-safe comparison) — previously the group never
    narrowed and float(None) raised."""
    monkeypatch.setattr(sel, "COLLECT_THRESHOLD", 10)
    rows = [(None, float(v)) for v in range(100)] + [
        ("a", float(v)) for v in range(50)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {
        r["g"]: (r["n"], r["q"])
        for r in exact_quantile(df, "v", 0.5, ["g"]).collect()
    }
    assert out[None] == (100, _brute([float(v) for v in range(100)], 0.5))
    assert out["a"] == (50, _brute([float(v) for v in range(50)], 0.5))


def test_fp_bin_boundary_mass_not_lost(spark, monkeypatch):
    """Values whose arithmetic bin edge rounds past them must stay in
    the next round's filter: the narrowed interval is the bin's
    OBSERVED [min, max]. Dense near-boundary doubles stress this."""
    monkeypatch.setattr(sel, "COLLECT_THRESHOLD", 20)
    import struct

    def ulps(x, n):
        (i,) = struct.unpack("<q", struct.pack("<d", x))
        return [
            struct.unpack("<d", struct.pack("<q", i + d))[0]
            for d in range(-n, n + 1)
        ]

    vals = []
    for base in [0.1, 1.0 / 3.0, 7.7, 1e9 + 0.5]:
        vals += ulps(base, 30)
    (lo, hi) = (min(vals), max(vals))
    vals += [lo - 1.0, hi + 1.0]
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    for p in (0.25, 0.5, 0.75):
        (r,) = exact_quantile(df, "v", p, []).collect()
        assert r["q"] == _brute(vals, p), p
        assert r["n"] == len(vals)


def _brute_weighted(pairs, p):
    total = sum(w for _, w in pairs)
    k = max(1, math.ceil(p * total))
    cum = 0
    for v, w in sorted(pairs):
        cum += w
        if cum >= k:
            return v
    raise AssertionError("unreachable")


def test_weighted_matches_brute(spark):
    pairs = [(1.0, 1), (2.0, 5), (3.0, 1)]  # weighted median = 2.0
    df = spark.createDataFrame(pairs, "v double, w bigint")
    (r,) = exact_quantile(df, "v", 0.5, [], weight_col="w").collect()
    assert (r["n"], r["w"], r["q"]) == (3, 7, 2.0)


def test_weighted_nonpositive_and_null_weights_excluded(spark):
    pairs = [(1.0, 0), (2.0, -4), (3.0, None), (4.0, 2)]
    df = spark.createDataFrame(pairs, "v double, w bigint")
    (r,) = exact_quantile(df, "v", 0.5, [], weight_col="w").collect()
    assert (r["n"], r["w"], r["q"]) == (1, 2, 4.0)


@settings(max_examples=12, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(
            st.floats(
                min_value=-1e5, max_value=1e5,
                allow_nan=False, allow_infinity=False,
            ),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=40,
    ),
    p=st.sampled_from([0.25, 0.5, 0.9]),
)
def test_weighted_matches_bruteforce(spark, pairs, p):
    df = spark.createDataFrame(
        [(float(v), int(w)) for v, w in pairs], "v double, w bigint"
    )
    (r,) = exact_quantile(df, "v", p, [], weight_col="w").collect()
    assert r["q"] == _brute_weighted(pairs, p)


@settings(max_examples=15, deadline=None)
@given(
    vals=st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=60,
    ),
    p=st.sampled_from([0.1, 0.25, 0.5, 0.9, 1.0]),
)
def test_matches_bruteforce(spark, vals, p):
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    (r,) = exact_quantile(df, "v", p, []).collect()
    assert r["q"] == _brute(vals, p)
