"""Bucketed tables remove the join/agg shuffle — plan-asserted."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dish_data_pipeline_spark.io import write_bucketed


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    a = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 2000, 2).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    write_bucketed(a, "bt_a", 8, "k")
    write_bucketed(b, "bt_b", 8, "k")
    yield "bt_a", "bt_b"
    spark.sql("DROP TABLE IF EXISTS bt_a")
    spark.sql("DROP TABLE IF EXISTS bt_b")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cobucketed_join_has_no_exchange(spark, bucketed_pair):
    ta, tb = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table(ta).join(spark.table(tb), "k")
        j.collect()
        plan = _plan(j)
        assert "Exchange" not in plan, plan
        assert j.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_agg_has_no_exchange(spark, bucketed_pair):
    ta, _ = bucketed_pair
    agg = spark.table(ta).groupBy("k").agg(F.sum("va").alias("s"))
    agg.collect()
    assert "Exchange" not in _plan(agg)


def test_bucketed_join_matches_unbucketed(spark, bucketed_pair):
    ta, tb = bucketed_pair
    a = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 2000, 2).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    want = sorted(
        (r.k, r.va, r.vb) for r in a.join(b, "k").collect()
    )
    got = sorted(
        (r.k, r.va, r.vb)
        for r in spark.table(ta).join(spark.table(tb), "k").collect()
    )
    assert got == want


def test_write_bucketed_validates_args(spark):
    df = spark.range(3)
    with pytest.raises(ValueError, match="n_buckets"):
        write_bucketed(df, "bt_bad", 0, "id")
    with pytest.raises(ValueError, match="bucket column"):
        write_bucketed(df, "bt_bad", 4)
