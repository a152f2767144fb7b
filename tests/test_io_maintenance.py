"""Small-file compaction: shrinks a fragmented directory to the
planned file count, preserves every row, no-ops on already-compact
layouts, and is idempotent."""

from __future__ import annotations

from pyspark.sql import Row

from dish_data_pipeline_spark.io_maintenance import (
    compact_parquet,
    plan_compaction,
    table_stats,
)


def _fragmented(spark, path: str, n_parts: int = 24, rows: int = 240):
    df = spark.createDataFrame(
        [Row(k=i, v=f"val-{i}") for i in range(rows)]
    ).repartition(n_parts)
    df.write.mode("overwrite").parquet(path)
    return df


def test_compact_preserves_rows_and_shrinks_files(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _fragmented(spark, path)
    before_files = table_stats(path).n_files
    assert before_files >= 24
    got = compact_parquet(spark, path, target_file_mb=128)
    assert 0 < got < before_files
    out = spark.read.parquet(path)
    assert out.count() == 240
    assert sorted(r.k for r in out.collect()) == list(range(240))


def test_compaction_is_idempotent_noop(spark, tmp_path):
    path = str(tmp_path / "tbl2")
    _fragmented(spark, path)
    assert compact_parquet(spark, path) > 0
    # second run: already at/below the planned layout → no rewrite
    assert plan_compaction(path) == 0
    assert compact_parquet(spark, path) == 0


def test_plan_skips_tiny_directories(spark, tmp_path):
    path = str(tmp_path / "tbl3")
    spark.createDataFrame([Row(k=1, v="x")]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
    assert plan_compaction(path) == 0
