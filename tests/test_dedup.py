"""D1/D2/W1 dedup semantics incl. determinism under ties
(SURVEY.md §7.4.2)."""

import datetime as dt

from pyspark.sql import Row

from dish_data_pipeline_spark.operators.dedup import (
    dedup_first_wins,
    dedup_keyed,
    keep_latest,
)


def _events(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        Row(k="a", seq=1, ts=t0, v="first"),
        Row(k="a", seq=2, ts=t0 + dt.timedelta(hours=1), v="latest"),
        Row(k="a", seq=3, ts=t0 + dt.timedelta(hours=1), v="tie"),  # ts tie
        Row(k="b", seq=4, ts=t0, v="only"),
    ]
    return spark.createDataFrame(rows)


def test_dedup_keyed_counts(spark):
    df = _events(spark)
    assert dedup_keyed(df, ["k"]).count() == 2
    assert dedup_keyed(df).count() == 4  # full-row: all distinct


def test_keep_latest_breaks_ties_deterministically(spark):
    df = _events(spark)
    out = {r.k: r for r in keep_latest(df, ["k"], "ts", ["seq"]).collect()}
    # ts tie between seq 2 and 3 → higher seq wins (desc tiebreaker)
    assert out["a"].v == "tie"
    assert out["b"].v == "only"


def test_first_wins_deterministic(spark):
    df = _events(spark)
    out = {r.k: r for r in dedup_first_wins(df, ["k"], ["ts", "seq"]).collect()}
    assert out["a"].v == "first"


def test_keep_latest_idempotent(spark):
    df = _events(spark)
    once = keep_latest(df, ["k"], "ts", ["seq"])
    twice = keep_latest(once, ["k"], "ts", ["seq"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
