"""as-of join operator: backward match, <= semantics, no-match
nulls, per-key isolation."""

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

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


def test_asof_tolerance_on_timestamp_column(spark):
    # tolerance on a temporal `on` is in SECONDS (distance computed
    # on epoch doubles — a plain timestamp difference is an INTERVAL
    # that can't compare against a numeric tolerance)
    left = spark.createDataFrame(
        [Row(k=1, ts=_t(10), ev="near"), Row(k=1, ts=_t(30), ev="far")]
    )
    right = spark.createDataFrame([Row(k=1, ts=_t(9), px=5.0)])
    out = {
        r.ev: r
        for r in asof_join(
            left, right, on="ts", by=["k"], tolerance=120
        ).collect()
    }
    assert out["near"].px_right == 5.0  # 60 s away, inside 120 s
    assert out["far"].px_right is None  # 21 min away, outside


def test_asof_tolerance_on_timestamp_ntz(spark):
    # TIMESTAMP_NTZ can't cast straight to double; the operator must
    # route it through a timestamp cast (guards the events.ts case)
    left = spark.createDataFrame(
        [Row(k=1, ts=_t(10), ev="near")]
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    right = spark.createDataFrame(
        [Row(k=1, ts=_t(9), px=5.0)]
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    rows = asof_join(
        left, right, on="ts", by=["k"], direction="nearest", tolerance=30
    ).collect()
    assert rows[0].px_right is None  # 60 s away, outside 30 s
