"""Duplicate-span masking (ops/spans.py): planted-span semantics,
full-copy annihilation, edge guards."""

from __future__ import annotations

import pytest

from dish_data_pipeline_spark.ops.spans import mask_duplicate_spans


def _mask(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = mask_duplicate_spans(df, **kw)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_shared_span_masked_unique_text_kept(spark):
    shared = "alpha beta gamma delta epsilon"  # one 5-gram
    rows = [
        (1, f"one two three {shared} four five six"),
        (2, f"seven eight {shared} nine ten"),
        (3, "completely unrelated words here again today"),
    ]
    got = _mask(spark, rows, n=5)
    assert got[1]["clean_text"] == "one two three four five six"
    assert got[1]["n_removed"] == 5
    assert got[2]["clean_text"] == "seven eight nine ten"
    assert got[3]["n_removed"] == 0
    assert got[3]["clean_text"] == rows[2][1]


def test_exact_copies_fully_annihilated(spark):
    text = "the quick brown fox jumps over the lazy dog today"
    got = _mask(spark, [(1, text), (2, text)], n=5)
    for i in (1, 2):
        assert got[i]["clean_text"] == ""
        assert got[i]["n_removed"] == got[i]["n_tokens"] == 10
        assert got[i]["removed_frac"] == 1.0


def test_overlapping_spans_counted_once(spark):
    # two docs share a 6-token run -> two overlapping 5-gram starts,
    # covered union is 6 positions, not 10
    run = "a1 a2 a3 a4 a5 a6"
    got = _mask(spark, [(1, f"x {run} y"), (2, f"p q {run} r")], n=5)
    assert got[1]["n_removed"] == 6
    assert got[1]["clean_text"] == "x y"


def test_within_doc_repeat_not_masked_by_default(spark):
    # the same 5-gram twice in ONE doc: df counts distinct docs, so
    # min_df=2 leaves it alone (self-repetition is the repetition
    # filter's job, not cross-doc span dedup's)
    rep = "r1 r2 r3 r4 r5"
    got = _mask(spark, [(1, f"{rep} mid {rep}"), (2, "unrelated text")], n=5)
    assert got[1]["n_removed"] == 0


def test_short_and_empty_docs_survive(spark):
    got = _mask(spark, [(1, "only three words"), (2, ""), (3, "x")], n=5)
    assert got[1]["clean_text"] == "only three words"
    assert got[2]["clean_text"] == "" and got[2]["n_tokens"] == 0
    assert got[3]["clean_text"] == "x"


def test_param_validation(spark):
    df = None
    with pytest.raises(ValueError):
        mask_duplicate_spans(df, n=0)
    with pytest.raises(ValueError):
        mask_duplicate_spans(df, min_df=1)
