"""Python UDTF surface (ops/udtf_ops.WordRuns): generator semantics
and the end-to-end SQL LATERAL path."""

from __future__ import annotations

from dish_data_pipeline_spark.ops.udtf_ops import WordRuns, register_udtfs


def _runs(text, doc_id=1):
    # the @udtf decorator wraps the class; its func attr is the
    # original — instantiate that for direct generator testing
    cls = getattr(WordRuns, "func", WordRuns)
    return list(cls().eval(doc_id, text))


def test_generator_semantics():
    assert _runs("a a b b b c") == [(1, 1, "a", 1, 2), (1, 2, "b", 3, 3)]
    # gap splits runs; single occurrences never emit
    assert _runs("x y x x") == [(1, 1, "x", 3, 2)]
    # trailing run is closed at end of stream
    assert _runs("q q") == [(1, 1, "q", 1, 2)]
    # empty tokens (double spaces) form no reported run
    assert _runs("a  a") == []
    assert _runs("") == []
    assert _runs(None) == []


def test_lateral_end_to_end(spark):
    register_udtfs(spark)
    df = spark.createDataFrame(
        [(7, "go go go stop go"), (8, "only singles here")],
        "doc_id bigint, text string",
    )
    df.createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        "SELECT s.* FROM udtf_docs, LATERAL word_runs(doc_id, text) s"
    ).collect()
    assert [tuple(r) for r in rows] == [(7, 1, "go", 1, 3)]
