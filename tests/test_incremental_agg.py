"""Incremental view maintenance: roll a grouped aggregate forward
from a snapshot delta and land bit-identical to full recompute."""

from __future__ import annotations

from pyspark.sql import Row

from dish_data_pipeline_spark.operators.diff import (
    grouped_agg,
    incremental_agg_update,
    snapshot_diff,
)


def _rows(df):
    return {
        tuple(
            None if v is None else (float(v) if hasattr(v, "scaleb") else v)
            for v in r
        )
        for r in df.collect()
    }


def _roll(spark, old_rows, new_rows, group_cols=("g",), measures=("v",)):
    old = spark.createDataFrame(old_rows)
    new = spark.createDataFrame(new_rows)
    agg_old = grouped_agg(old, list(group_cols), list(measures))
    delta = snapshot_diff(
        old, new, ["k"], [*group_cols, *measures], include_unchanged=False
    )
    rolled = incremental_agg_update(
        agg_old, delta, list(group_cols), list(measures)
    )
    recomputed = grouped_agg(new, list(group_cols), list(measures))
    return rolled, recomputed


def test_roll_forward_matches_recompute(spark):
    old = [Row(k=i, g=f"g{i % 3}", v=float(i) * 1.25) for i in range(30)]
    # delete k%5==0, insert 100-104, update k%4==0 (reprice), and
    # k%6==0 moves group — all change classes in one delta
    new = [
        Row(
            k=r.k,
            g="MOVED" if r.k % 6 == 0 else r.g,
            v=r.v * 2.0 if r.k % 4 == 0 else r.v,
        )
        for r in old
        if r.k % 5 != 0
    ] + [Row(k=100 + i, g="g0", v=7.5 + i) for i in range(5)]
    rolled, recomputed = _roll(spark, old, new)
    assert _rows(rolled) == _rows(recomputed)


def test_group_vanishes_when_count_hits_zero(spark):
    old = [Row(k=1, g="solo", v=1.0), Row(k=2, g="keep", v=2.0)]
    new = [Row(k=2, g="keep", v=2.0)]
    rolled, recomputed = _roll(spark, old, new)
    assert _rows(rolled) == _rows(recomputed)
    assert {r.g for r in rolled.collect()} == {"keep"}


def test_null_group_key_is_maintained(spark):
    old = [Row(k=1, g=None, v=1.0), Row(k=2, g="a", v=2.0)]
    new = [
        Row(k=1, g=None, v=5.0),  # update inside the NULL group
        Row(k=2, g="a", v=2.0),
        Row(k=3, g=None, v=3.0),  # insert into the NULL group
    ]
    rolled, recomputed = _roll(spark, old, new)
    assert _rows(rolled) == _rows(recomputed)
    null_row = [r for r in rolled.collect() if r.g is None]
    assert len(null_row) == 1 and null_row[0].n_rows == 2


def test_chained_maintenance_two_deltas(spark):
    v0 = [Row(k=i, g=f"g{i % 2}", v=float(i)) for i in range(10)]
    v1 = [Row(k=r.k, g=r.g, v=r.v + 0.5) for r in v0 if r.k != 3] + [
        Row(k=20, g="g0", v=9.0)
    ]
    v2 = [Row(k=r.k, g="g1" if r.k == 20 else r.g, v=r.v) for r in v1 if r.k != 4]
    d0 = spark.createDataFrame(v0)
    d1 = spark.createDataFrame(v1)
    d2 = spark.createDataFrame(v2)
    state = grouped_agg(d0, ["g"], ["v"])
    for old, new in ((d0, d1), (d1, d2)):
        delta = snapshot_diff(old, new, ["k"], ["g", "v"], include_unchanged=False)
        state = incremental_agg_update(state, delta, ["g"], ["v"])
    assert _rows(state) == _rows(grouped_agg(d2, ["g"], ["v"]))


def test_apply_changes_roundtrip(spark):
    from dish_data_pipeline_spark.operators.diff import (
        apply_changes,
        snapshot_diff,
    )

    old_rows = [Row(k=i, a=f"v{i}", b=float(i)) for i in range(20)]
    new_rows = [
        Row(k=r.k, a=r.a + "!" if r.k % 3 == 0 else r.a, b=r.b)
        for r in old_rows
        if r.k % 5 != 0
    ] + [Row(k=100, a="new", b=9.0)]
    old = spark.createDataFrame(old_rows)
    new = spark.createDataFrame(new_rows)
    delta = snapshot_diff(old, new, ["k"], ["a", "b"], include_unchanged=False)
    rebuilt = apply_changes(old, delta, ["k"], ["a", "b"])
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_apply_changes_empty_delta_is_identity(spark):
    from dish_data_pipeline_spark.operators.diff import (
        apply_changes,
        snapshot_diff,
    )

    rows = [Row(k=1, a="x", b=1.0), Row(k=2, a="y", b=2.0)]
    df = spark.createDataFrame(rows)
    delta = snapshot_diff(df, df, ["k"], ["a", "b"], include_unchanged=False)
    rebuilt = apply_changes(df, delta, ["k"], ["a", "b"])
    assert sorted(map(tuple, rebuilt.collect())) == sorted(map(tuple, rows))
