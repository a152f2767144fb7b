"""J1/J2 MERGE-semantics upsert (reference
pipeline/data_pipeline.py:155-216): matched/not-matched branches,
expression keys, idempotency."""

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from dish_data_pipeline_spark.operators.upsert import (
    split_matched,
    upsert,
    upsert_keep_latest,
)


def _tgt(spark):
    return spark.createDataFrame(
        [
            Row(k="a", sf="d1", v=1),
            Row(k="b", sf="d1", v=2),
        ]
    )


def test_upsert_update_insert_retain(spark):
    tgt = _tgt(spark)
    stg = spark.createDataFrame(
        [
            Row(k="a", sf="d1", v=10),  # update
            Row(k="c", sf="d1", v=30),  # insert
        ]
    )
    out = {(r.k, r.sf): r.v for r in upsert(tgt, stg, ["k", "sf"]).collect()}
    assert out == {("a", "d1"): 10, ("b", "d1"): 2, ("c", "d1"): 30}


def test_upsert_empty_staging_is_noop(spark):
    tgt = _tgt(spark)
    stg = tgt.filter(F.lit(False))
    out = upsert(tgt, stg, ["k", "sf"])
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, tgt.collect()))


def test_upsert_expression_key(spark):
    # Reference J1 wraps both join sides in date()
    # (pipeline/data_pipeline.py:163) — expression-key form.
    tgt = spark.createDataFrame(
        [Row(visit_date=dt.datetime(2024, 1, 1, 5), sf="d1", v=1)]
    )
    stg = spark.createDataFrame(
        [Row(visit_date=dt.datetime(2024, 1, 1, 9), sf="d1", v=99)]
    )
    out = upsert(
        tgt,
        stg,
        ["visit_date", "sf"],
        key_exprs=lambda t, s: (
            F.to_date(t.visit_date) == F.to_date(s.visit_date)
        )
        & (t.sf == s.sf),
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0].v == 99  # same calendar day → update


def test_upsert_keep_latest_dedups_staging(spark):
    t0 = dt.datetime(2024, 1, 1)
    tgt = spark.createDataFrame([Row(k="a", sf="d1", load_timestamp=t0, v=0)])
    stg = spark.createDataFrame(
        [
            Row(k="a", sf="d1", load_timestamp=t0 + dt.timedelta(1), v=1),
            Row(k="a", sf="d1", load_timestamp=t0 + dt.timedelta(2), v=2),
        ]
    )
    out = upsert_keep_latest(tgt, stg, ["k", "sf"], "load_timestamp")
    rows = out.collect()
    assert len(rows) == 1 and rows[0].v == 2  # latest staging row wins


def test_upsert_idempotent_on_redelivery(spark):
    tgt = _tgt(spark)
    stg = spark.createDataFrame([Row(k="a", sf="d1", v=10)])
    once = upsert(tgt, stg, ["k", "sf"])
    twice = upsert(once, stg, ["k", "sf"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_split_matched(spark):
    tgt = _tgt(spark)
    stg = spark.createDataFrame(
        [Row(k="a", sf="d1", v=10), Row(k="z", sf="d1", v=20)]
    )
    upd, ins = split_matched(stg, tgt, ["k", "sf"])
    assert [r.k for r in upd.collect()] == ["a"]
    assert [r.k for r in ins.collect()] == ["z"]
