"""Validated CSV source and schema-evolving upsert."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from dish_data_pipeline_spark.operators.upsert import upsert_evolve
from dish_data_pipeline_spark.sources.files import read_csv_validated


def test_csv_routes_corrupt_lines(spark, tmp_path):
    p = tmp_path / "feed.csv"
    p.write_text(
        "1,alpha,10\n"
        "2,beta,not_an_int\n"  # type failure -> reject
        "3,gamma,30\n"
        "4,delta\n"  # missing column -> reject
    )
    schema = StructType(
        [
            StructField("id", IntegerType()),
            StructField("name", StringType()),
            StructField("qty", IntegerType()),
        ]
    )
    good, rejects = read_csv_validated(spark, str(p), schema)
    g = {r.id: (r.name, r.qty) for r in good.collect()}
    assert g == {1: ("alpha", 10), 3: ("gamma", 30)}
    bad = sorted(r.raw_line for r in rejects.collect())
    assert bad == ["2,beta,not_an_int", "4,delta"]
    assert good.columns == ["id", "name", "qty"]  # corrupt col dropped


def test_csv_rejects_schema_with_corrupt_col(spark, tmp_path):
    schema = StructType([StructField("_corrupt_record", StringType())])
    with pytest.raises(ValueError, match="_corrupt_record"):
        read_csv_validated(spark, str(tmp_path), schema)


def test_upsert_evolve_adds_and_backfills_columns(spark):
    target = spark.createDataFrame(
        [Row(k=1, a=10), Row(k=2, a=20)]
    )
    staging = spark.createDataFrame(
        [Row(k=2, a=21, b="new"), Row(k=3, a=30, b="row")]
    )
    out = upsert_evolve(target, staging, ["k"])
    got = {r.k: (r.a, r.b) for r in out.collect()}
    # retained target row gets NULL for the new column
    assert got == {1: (10, None), 2: (21, "new"), 3: (30, "row")}
    assert out.columns == ["k", "a", "b"]


def test_upsert_evolve_staging_missing_column(spark):
    target = spark.createDataFrame([Row(k=1, a=10, c="keep")])
    staging = spark.createDataFrame([Row(k=2, a=20)])
    got = {r.k: (r.a, r.c) for r in upsert_evolve(target, staging, ["k"]).collect()}
    assert got == {1: (10, "keep"), 2: (20, None)}


def test_upsert_evolve_rejects_type_drift(spark):
    target = spark.createDataFrame([Row(k=1, a=10)])
    staging = spark.createDataFrame([Row(k=2, a="ten")])
    with pytest.raises(ValueError, match="type drift.*a:"):
        upsert_evolve(target, staging, ["k"])


def test_upsert_evolve_rejects_missing_keys(spark):
    target = spark.createDataFrame([Row(k=1, a=10)])
    staging = spark.createDataFrame([Row(other=2, a=20)])
    with pytest.raises(ValueError, match="keys absent"):
        upsert_evolve(target, staging, ["k"])


def test_snapshot_diff_classifies_all_types(spark):
    from dish_data_pipeline_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [Row(k=1, v=10, s="x"), Row(k=2, v=20, s="y"), Row(k=3, v=30, s="z"),
         Row(k=4, v=None, s="w")]
    )
    new = spark.createDataFrame(
        [Row(k=2, v=21, s="y"),    # update (value)
         Row(k=3, v=30, s="z"),    # unchanged
         Row(k=4, v=None, s="w"),  # unchanged (null == null, null-safe)
         Row(k=5, v=50, s="q")]    # insert; k=1 deleted
    )
    out = {r.k: r for r in snapshot_diff(old, new, ["k"]).collect()}
    assert out[1].change_type == "delete" and out[1].new_v is None
    assert out[2].change_type == "update" and (out[2].old_v, out[2].new_v) == (20, 21)
    assert out[3].change_type == "unchanged"
    assert out[4].change_type == "unchanged"  # null vs null is not a change
    assert out[5].change_type == "insert" and out[5].old_v is None


def test_snapshot_diff_ignores_one_sided_columns(spark):
    from dish_data_pipeline_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame([Row(k=1, v=10)])
    new = spark.createDataFrame([Row(k=1, v=10, extra="added-by-evolution")])
    out = snapshot_diff(old, new, ["k"]).collect()
    assert len(out) == 1 and out[0].change_type == "unchanged"


def test_snapshot_diff_rejects_missing_keys(spark):
    from dish_data_pipeline_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame([Row(k=1, v=10)])
    new = spark.createDataFrame([Row(other=1, v=10)])
    with pytest.raises(ValueError, match="keys absent"):
        snapshot_diff(old, new, ["k"])
