"""io paths: TIMESTAMP(NANOS) shim, atomic read-modify-swap
overwrite, raw-zone partitioned write, bucketed warehouse."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from dish_data_pipeline_spark import io as dio


def test_nanos_timestamp_shim(spark, tmp_path):
    ts = pd.to_datetime(
        ["2024-01-01T00:00:00.123456", "2024-06-01T12:34:56.654321"]
    )
    table = pa.table({"id": [1, 2], "ts": pa.array(ts, pa.timestamp("ns"))})
    path = str(tmp_path / "ns.parquet")
    pq.write_table(table, path)

    df = dio.read_parquet(spark, path)
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    rows = {r.id: r.ts for r in df.collect()}
    assert rows[1].microsecond == 123456  # µs precision preserved
    assert rows[2].year == 2024 and rows[2].second == 56


def test_plain_parquet_not_affected(spark, tmp_path):
    p = str(tmp_path / "plain")
    spark.range(5).write.parquet(p)
    assert dio.read_parquet(spark, p).count() == 5


def test_atomic_overwrite_read_modify_write(spark, tmp_path):
    p = str(tmp_path / "tbl")
    spark.range(10).write.parquet(p)
    df = spark.read.parquet(p).withColumn("id", F.col("id") + 100)
    # plain overwrite of the source path would clobber mid-read;
    # atomic_overwrite must produce the full transformed result
    dio.atomic_overwrite(df, p)
    out = sorted(r.id for r in spark.read.parquet(p).collect())
    assert out == list(range(100, 110))
    # no temp/old residue
    parent = os.path.dirname(p)
    assert [d for d in os.listdir(parent) if d.startswith(".tmp-")] == []


def test_raw_zone_partitioned_write(spark, tmp_path):
    from dish_data_pipeline_spark.operators.enrich import with_date_partitions

    df = spark.createDataFrame(
        [(1, "2024-03-05T10:00:00"), (2, "2024-03-06T10:00:00")],
        "id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    raw = str(tmp_path / "raw")
    dio.write_raw_zone(with_date_partitions(df, "ts"), raw)
    assert os.path.isdir(os.path.join(raw, "year=2024", "month=03", "day=05"))
    back = spark.read.json(raw)
    pruned = back.filter((F.col("day") == "06"))
    assert pruned.count() == 1


@pytest.mark.parametrize("n", [0, 3])
def test_write_staging_truncates(spark, tmp_path, n):
    p = str(tmp_path / "stg")
    spark.range(10).write.parquet(p)
    dio.write_staging(spark.range(n), p)
    assert spark.read.parquet(p).count() == n


def test_write_read_roundtrip_all_table_formats(spark, tmp_path):
    """Every TABLE_FORMATS member round-trips values — ORC exercises
    the second Spark-native columnar path end to end (pushdown/
    pruning come with the format), CSV via header + inference."""
    import pytest as _pytest
    from pyspark.sql import Row

    from dish_data_pipeline_spark.io import TABLE_FORMATS, read_any, write_table

    from dish_data_pipeline_spark.io import avro_available

    df = spark.createDataFrame(
        [Row(k=1, name="a", v=1.5), Row(k=2, name="b", v=-2.0)]
    )
    assert avro_available(spark) in (True, False)  # gate is callable
    for fmt in TABLE_FORMATS:
        # avro always round-trips: JVM module when present, else the
        # pure-Python container-file tier
        path = str(tmp_path / f"t_{fmt}")
        write_table(df, path, fmt)
        got = sorted(
            map(tuple, read_any(spark, path, fmt).select("k", "name", "v").collect())
        )
        assert got == [(1, "a", 1.5), (2, "b", -2.0)], fmt

    # ORC keeps filter pushdown in the plan
    path = str(tmp_path / "t_orc")
    plan = (
        read_any(spark, path, "orc")
        .filter("k = 2")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters" in plan and "k" in plan

    with _pytest.raises(ValueError, match="fmt"):
        write_table(df, str(tmp_path / "x"), "protobuf")


def test_avro_two_tier(spark, tmp_path):
    """Avro is a first-class TABLE_FORMATS member with two tiers:
    the vectorized spark-avro JVM module when it's on the classpath,
    else the spec-faithful pure-Python container-file tier
    (sources.avro_python). Either way the io entry points round-trip
    — there is no unavailable state anymore. Cross-implementation
    conformance of the Python tier is covered by
    tests/test_avro_python.py against the canonical Apache Avro Java
    library."""
    import os

    from pyspark.sql import Row

    from dish_data_pipeline_spark.io import (
        avro_available,
        read_any,
        write_table,
    )

    df = spark.createDataFrame([Row(k=1, name="a"), Row(k=2, name=None)])
    path = str(tmp_path / "t_avro")
    write_table(df, path, "avro")
    got = sorted(
        map(tuple, read_any(spark, path, "avro").collect()),
        key=lambda t: t[0],
    )
    assert got == [(1, "a"), (2, None)]
    if not avro_available(spark):
        # the python tier wrote real container files + schema sidecar
        files = os.listdir(path)
        assert any(f.endswith(".avro") for f in files)
        assert "_avro_schema.avsc" in files
