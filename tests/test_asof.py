"""as-of join operator: backward match, <= semantics, no-match
nulls, per-key isolation."""

import datetime as dt

from pyspark.sql import Row

from dish_data_pipeline_spark.operators.asof import asof_join


def _t(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_asof_backward_and_equal_ts(spark):
    left = spark.createDataFrame(
        [
            Row(k=1, ts=_t(5), ev="a"),
            Row(k=1, ts=_t(10), ev="b"),  # exactly at a quote
            Row(k=1, ts=_t(12), ev="c"),
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, ts=_t(3), px=100.0),
            Row(k=1, ts=_t(10), px=200.0),
        ]
    )
    out = {r.ev: r for r in asof_join(left, right, on="ts", by=["k"]).collect()}
    assert out["a"].px_right == 100.0  # latest quote <= 00:05
    assert out["b"].px_right == 200.0  # equal ts matches
    assert out["c"].px_right == 200.0


def test_asof_no_prior_row_is_null(spark):
    left = spark.createDataFrame([Row(k=1, ts=_t(1), ev="early")])
    right = spark.createDataFrame([Row(k=1, ts=_t(5), px=1.0)])
    row = asof_join(left, right, on="ts", by=["k"]).collect()[0]
    assert row.px_right is None


def test_asof_keys_isolated(spark):
    left = spark.createDataFrame(
        [Row(k=1, ts=_t(9), ev="x"), Row(k=2, ts=_t(9), ev="y")]
    )
    right = spark.createDataFrame([Row(k=1, ts=_t(1), px=7.0)])
    out = {r.ev: r for r in asof_join(left, right, on="ts", by=["k"]).collect()}
    assert out["x"].px_right == 7.0
    assert out["y"].px_right is None  # other key's rows invisible
