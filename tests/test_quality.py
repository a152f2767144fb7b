"""Q1-Q5 rule engine with reference-compatible issue strings
(reference pipeline/data_pipeline.py:91-124) + recoverable routing."""

import math

from pyspark.sql import Row

from dish_data_pipeline_spark.operators.quality import (
    is_recoverable,
    run_data_quality_checks,
)

POL = {
    "daily_visits": {
        "required": ["visit_date", "total_visits"],
        "keys": ["visit_date", "source_file"],
    }
}


def _df(spark, rows):
    return spark.createDataFrame(rows)


def test_q1_empty_is_fatal(spark):
    df = spark.createDataFrame([], "visit_date string, total_visits long, source_file string")
    ok, issues = run_data_quality_checks(df, "daily_visits", POL)
    assert not ok and issues == ["DataFrame is empty"]
    assert not is_recoverable(issues[0])


def test_q2_missing_columns(spark):
    df = _df(spark, [Row(visit_date="2024-01-01", source_file="s")] * 6)
    ok, issues = run_data_quality_checks(df, "daily_visits", POL)
    assert not ok
    assert any("Missing required columns" in i and "total_visits" in i for i in issues)


def test_q3_null_keys(spark):
    rows = [Row(visit_date="2024-01-01", total_visits=1, source_file="s")] * 5
    rows.append(Row(visit_date=None, total_visits=1, source_file="s"))
    ok, issues = run_data_quality_checks(_df(spark, rows), "daily_visits", POL)
    assert not ok
    assert any("Null values found in column: visit_date" in i for i in issues)


def test_q3_nan_counts_as_null_for_float_keys(spark):
    pol = {"t": {"required": ["score"], "keys": ["score"]}}
    rows = [Row(score=1.0)] * 5 + [Row(score=float("nan"))]
    ok, issues = run_data_quality_checks(_df(spark, rows), "t", pol)
    assert not ok
    assert any("Null values found in column: score" in i for i in issues)
    assert math.isnan(rows[-1].score)  # sanity: we really fed NaN


def test_q4_duplicates_recoverable(spark):
    rows = [
        Row(visit_date=f"2024-01-0{i}", total_visits=i, source_file="s")
        for i in range(1, 6)
    ] + [Row(visit_date="2024-01-01", total_visits=9, source_file="s")]
    ok, issues = run_data_quality_checks(_df(spark, rows), "daily_visits", POL)
    assert not ok
    assert issues == ["Found 1 duplicate records"]
    assert is_recoverable(issues[0])


def test_q5_low_volume(spark):
    rows = [Row(visit_date="2024-01-01", total_visits=1, source_file="s")]
    ok, issues = run_data_quality_checks(_df(spark, rows), "daily_visits", POL)
    assert not ok
    assert any("Low record count" in i for i in issues)


def test_clean_data_passes(spark):
    rows = [
        Row(visit_date=f"2024-01-0{i}", total_visits=i, source_file="s")
        for i in range(1, 7)
    ]
    ok, issues = run_data_quality_checks(_df(spark, rows), "daily_visits", POL)
    assert ok and issues == []


def test_unknown_table_only_generic_checks(spark):
    rows = [Row(x=1)] * 6
    ok, issues = run_data_quality_checks(_df(spark, rows), "mystery", POL)
    assert ok, issues
