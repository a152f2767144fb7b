"""CLI entry point: run-feed exit codes + query/list-queries."""

from __future__ import annotations

from dish_data_pipeline_spark.__main__ import main

from tests.test_pipeline import visits_server


def test_cli_run_feed_success_and_failure(spark, tmp_path, capsys):
    argv = [
        "run-feed",
        "--name", "daily_visits",
        "--endpoint", "daily_visits",
        "--keys", "visit_date,source_file",
        "--required", "visit_date,total_visits",
        "--base-url", "http://fake",
        "--warehouse", str(tmp_path / "wh"),
    ]
    assert main(argv, http_get=visits_server()) == 0
    assert "SUCCESS (8 records)" in capsys.readouterr().out

    def empty(url):
        return 200, {"records": []}

    assert main(argv, http_get=empty) == 1  # schedulers gate on this


def test_cli_list_queries(capsys):
    assert main(["list-queries"]) == 0
    out = capsys.readouterr().out
    assert "keep_latest_events" in out and "minhash_neardup" in out


def test_cli_query_unknown(capsys):
    assert main(["query", "nope"]) == 2


def test_cli_table_lifecycle(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    from dish_data_pipeline_spark.__main__ import main
    from dish_data_pipeline_spark.io_backends import ManifestParquetBackend

    path = str(tmp_path / "t")
    be = ManifestParquetBackend()
    be.create(spark.range(6).select(F.col("id").alias("k")), path)
    be.delete_where(spark, path, "k < 3")

    assert main(["table", "history", path]) == 0
    out = capsys.readouterr().out
    assert "create" in out and "delete(k < 3)" in out

    assert main(["table", "restore", path, "--version", "0"]) == 0
    assert be.read(spark, path).count() == 6

    assert main(["table", "restore", path]) == 2  # missing --version

    assert main(["table", "vacuum", path]) == 0
    assert main(["table", "expire", path, "--keep-last", "2"]) == 0
    assert [h["version"] for h in be.history(path)] == [1, 2]


def test_cli_merge_statement(spark, tmp_path, capsys):
    """End-to-end `merge` subcommand: textual MERGE against manifest
    tables mapped by --table, then a dry-run of a second statement."""
    from pyspark.sql import Row

    from dish_data_pipeline_spark.io_backends import ManifestParquetBackend

    be = ManifestParquetBackend()
    tgt = str(tmp_path / "tgt")
    stg = str(tmp_path / "stg")
    be.create(
        spark.createDataFrame([Row(k=1, v=1), Row(k=2, v=2)],
                              "k long, v long"),
        tgt,
    )
    be.create(
        spark.createDataFrame([Row(k=2, v=20), Row(k=3, v=30)],
                              "k long, v long"),
        stg,
    )
    sql_file = tmp_path / "stmt.sql"
    sql_file.write_text(
        "MERGE `proj.ds.tgt` T USING `proj.ds.stg` S ON T.k = S.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    rc = main([
        "merge", "--sql-file", str(sql_file), "--backend", "manifest",
        "--table", f"tgt={tgt}", "--table", f"stg={stg}",
    ])
    assert rc == 0
    assert "3 rows" in capsys.readouterr().out
    rows = {r.k: r.v for r in be.read(spark, tgt).collect()}
    assert rows == {1: 1, 2: 20, 3: 30}
    assert be.latest_version(tgt) == 1  # one commit for the MERGE

    rc = main([
        "merge",
        "--sql",
        "MERGE tgt T USING stg S ON T.k = S.k WHEN MATCHED THEN DELETE",
        "--backend", "manifest", "--dry-run",
        "--table", f"tgt={tgt}", "--table", f"stg={stg}",
    ])
    assert rc == 0
    assert "dry-run" in capsys.readouterr().out
    assert be.latest_version(tgt) == 1  # dry-run committed nothing


def test_cli_merge_missing_mapping(spark, capsys):
    rc = main([
        "merge", "--sql",
        "MERGE tgt T USING stg S ON T.k = S.k WHEN MATCHED THEN DELETE",
        "--table", "stg=/nowhere",
    ])
    assert rc == 2
    assert "no --table mapping" in capsys.readouterr().err


def test_cli_merge_using_subquery(spark, tmp_path, capsys):
    """A general USING (SELECT ...) statement is drivable from the
    CLI: the subquery's table refs resolve through the --table
    catalog (round-13 advisor item)."""
    from pyspark.sql import Row

    from dish_data_pipeline_spark.io_backends import ManifestParquetBackend

    be = ManifestParquetBackend()
    tgt = str(tmp_path / "tgt")
    raw = str(tmp_path / "raw")
    be.create(
        spark.createDataFrame([Row(day="d1", total=1)],
                              "day string, total long"),
        tgt,
    )
    be.create(
        spark.createDataFrame(
            [Row(day="d1", n=5), Row(day="d1", n=7), Row(day="d2", n=2)],
            "day string, n long",
        ),
        raw,
    )
    rc = main([
        "merge", "--sql",
        "MERGE `proj.ds.tgt` T USING "
        "(SELECT day, SUM(n) AS total FROM `proj.ds.raw` GROUP BY day) S "
        "ON T.day = S.day "
        "WHEN MATCHED THEN UPDATE SET T.total = S.total "
        "WHEN NOT MATCHED THEN INSERT (day, total) VALUES (S.day, S.total)",
        "--backend", "manifest",
        "--table", f"tgt={tgt}", "--table", f"raw={raw}",
    ])
    assert rc == 0
    assert "2 rows" in capsys.readouterr().out
    rows = {r.day: r.total for r in be.read(spark, tgt).collect()}
    assert rows == {"d1": 12, "d2": 2}


def test_cli_merge_cardinality_default_and_opt_out(spark, tmp_path, capsys):
    """The committing CLI path verifies MERGE cardinality by default;
    --no-verify opts out."""
    from pyspark.sql import Row

    from dish_data_pipeline_spark.io_backends import ManifestParquetBackend

    be = ManifestParquetBackend()
    tgt = str(tmp_path / "tgt")
    stg = str(tmp_path / "stg")
    be.create(
        spark.createDataFrame([Row(k=1, v=0)], "k long, v long"), tgt
    )
    be.create(
        spark.createDataFrame([Row(k=1, v=10), Row(k=1, v=20)],
                              "k long, v long"),
        stg,
    )
    args = [
        "merge", "--sql",
        "MERGE tgt T USING stg S ON T.k = S.k "
        "WHEN MATCHED THEN UPDATE SET T.v = S.v",
        "--backend", "manifest",
        "--table", f"tgt={tgt}", "--table", f"stg={stg}",
    ]
    import pytest

    with pytest.raises(ValueError, match="cardinality"):
        main(args)
    assert be.latest_version(tgt) == 0  # nothing committed

    assert main(args + ["--no-verify"]) == 0
    assert be.read(spark, tgt).count() == 2  # accepted fan-out


def test_cli_sql_script(spark, tmp_path, capsys):
    """The `sql` subcommand runs a multi-statement lifecycle script
    and prints the final SELECT."""
    from pyspark.sql import Row

    from dish_data_pipeline_spark.io_backends import ManifestParquetBackend

    be = ManifestParquetBackend()
    raw = str(tmp_path / "raw")
    be.create(
        spark.createDataFrame([Row(k=1, v=5), Row(k=2, v=6)],
                              "k long, v long"),
        raw,
    )
    script = tmp_path / "lifecycle.sql"
    script.write_text(
        "-- truncate-load then report\n"
        "CREATE OR REPLACE TABLE stg AS SELECT * FROM raw WHERE v > 5;\n"
        "SELECT COUNT(*) AS n FROM stg;\n"
    )
    rc = main([
        "sql", "--sql-file", str(script), "--backend", "manifest",
        "--table", f"raw={raw}", "--table", f"stg={tmp_path / 'stg'}",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "1" in out and "n" in out
    assert be.read(spark, str(tmp_path / "stg")).collect() == [Row(k=2, v=6)]


def test_cli_sql_trailing_dml(spark, tmp_path, capsys):
    from pyspark.sql import Row

    from dish_data_pipeline_spark.io_backends import ManifestParquetBackend

    be = ManifestParquetBackend()
    raw = str(tmp_path / "raw")
    be.create(spark.createDataFrame([Row(k=1)], "k long"), raw)
    rc = main([
        "sql", "--sql", "CREATE TABLE t AS SELECT * FROM raw",
        "--backend", "manifest",
        "--table", f"raw={raw}", "--table", f"t={tmp_path / 't'}",
    ])
    assert rc == 0
    assert "committing DML" in capsys.readouterr().out


def test_cli_table_alter_ops(tmp_path, capsys, spark):
    """table add-column / drop-column / drop drive the round-14
    schema-evolution and removal primitives from the CLI."""
    from dish_data_pipeline_spark.__main__ import main
    from dish_data_pipeline_spark.io_backends import ManifestParquetBackend

    path = str(tmp_path / "t")
    be = ManifestParquetBackend()
    be.create(
        spark.createDataFrame([(1, "a")], "k long, v string"), path
    )
    assert main(["table", "add-column", path,
                 "--column", "x=INT", "--column", "y=STRING"]) == 0
    assert "added 2 column(s) as v1" in capsys.readouterr().out
    assert be.read(spark, path).columns == ["k", "v", "x", "y"]
    assert main(["table", "drop-column", path, "--column", "y"]) == 0
    assert be.read(spark, path).columns == ["k", "v", "x"]
    # history line carries the commit timestamp
    assert main(["table", "history", path]) == 0
    out = capsys.readouterr().out
    assert "alter(drop_column(y))" in out and "20" in out
    assert main(["table", "drop", path]) == 0
    assert not be.exists(spark, path)
    # guard-rails: missing/bad args exit 2
    assert main(["table", "add-column", path]) == 2
    assert main(["table", "drop-column", path]) == 2
