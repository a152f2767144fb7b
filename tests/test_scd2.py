"""SCD2 operator: close/open versions, unchanged retention,
key-absence handling, idempotent re-apply."""

import datetime as dt

from pyspark.sql import Row

from dish_data_pipeline_spark.operators.scd2 import scd2_apply

D0 = dt.date(2020, 1, 1)
EFF = dt.date(2024, 1, 1)


def _history(spark):
    return spark.createDataFrame(
        [
            Row(k=1, attr="a", valid_from=D0, valid_to=None),
            Row(k=2, attr="b", valid_from=D0, valid_to=None),
            # already-expired version of k=2
            Row(k=2, attr="old", valid_from=dt.date(2019, 1, 1), valid_to=D0),
            Row(k=3, attr="c", valid_from=D0, valid_to=None),
        ],
        "k int, attr string, valid_from date, valid_to date",
    )


def _snapshot(spark):
    return spark.createDataFrame(
        [
            Row(k=1, attr="a"),  # unchanged
            Row(k=2, attr="B"),  # changed
            Row(k=4, attr="d"),  # new key; k=3 absent
        ],
        "k int, attr string",
    )


def test_scd2_branches(spark):
    out = scd2_apply(
        _history(spark), _snapshot(spark), ["k"], ["attr"], EFF
    ).collect()
    rows = sorted((r.k, r.attr, r.valid_from, r.valid_to) for r in out)
    assert rows == sorted(
        [
            (1, "a", D0, None),             # unchanged
            (2, "old", dt.date(2019, 1, 1), D0),  # expired untouched
            (2, "b", D0, EFF),              # closed
            (2, "B", EFF, None),            # new version
            (3, "c", D0, None),             # absent from snapshot → kept
            (4, "d", EFF, None),            # brand-new key
        ]
    )


def test_scd2_reapply_same_snapshot_is_noop(spark):
    once = scd2_apply(_history(spark), _snapshot(spark), ["k"], ["attr"], EFF)
    twice = scd2_apply(once, _snapshot(spark), ["k"], ["attr"], EFF)
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
