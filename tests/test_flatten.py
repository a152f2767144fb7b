"""F1 recursive flatten + P3 sanitize (reference
pipeline/data_pipeline.py:20-23,73-76)."""

import json

from pyspark.sql import Row

from dish_data_pipeline_spark.operators.flatten import (
    flatten_struct_columns,
    normalize_records,
    sanitize_complex_columns,
)


def test_flatten_three_levels(spark):
    df = spark.createDataFrame(
        [
            Row(
                visitId="1",
                device=Row(browser="Chrome", os=Row(name="linux", ver="6")),
                totals=Row(hits=4),
            )
        ]
    )
    out = flatten_struct_columns(df)
    assert set(out.columns) == {
        "visitId",
        "device_browser",
        "device_os_name",
        "device_os_ver",
        "totals_hits",
    }
    row = out.collect()[0]
    assert row.device_os_name == "linux"
    assert row.totals_hits == 4


def test_flatten_keeps_arrays_intact(spark):
    df = spark.createDataFrame([Row(a=1, hits=[Row(page="/")])])
    out = flatten_struct_columns(df)
    # json_normalize leaves list cells alone; so do we.
    assert out.schema["hits"].dataType.typeName() == "array"


def test_sanitize_stringifies_complex(spark):
    df = spark.createDataFrame([Row(a=1, tags=["x", "y"], meta=Row(k=2))])
    out = sanitize_complex_columns(df)
    row = out.collect()[0]
    assert json.loads(row.tags) == ["x", "y"]
    assert json.loads(row.meta) == {"k": 2}
    assert out.schema["tags"].dataType.typeName() == "string"


def test_normalize_records_end_to_end(spark):
    df = spark.createDataFrame(
        [Row(visitId="7", device=Row(browser="FF"), hits=[1, 2])]
    )
    out = normalize_records(df)
    row = out.collect()[0]
    assert row.device_browser == "FF"
    assert json.loads(row.hits) == [1, 2]
