"""Robustness sweep: NULL text, empty text, whitespace-only, and
non-ASCII text through every text operator. At 100 TB a corpus WILL
contain all of these; no operator may throw, and exclusion semantics
must be consistent (NULL behaves like 'no tokens')."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType


@pytest.fixture()
def dirty(spark):
    schema = StructType(
        [StructField("doc_id", IntegerType()), StructField("text", StringType())]
    )
    rows = [
        (0, None),
        (1, ""),
        (2, "   \t\n "),
        (3, "héllo wörld héllo"),  # non-ASCII letters (outside TOKEN_RE)
        (4, "normal text with normal words"),
        (5, "x"),  # single char — below every min-length gate
    ]
    return spark.createDataFrame(rows, schema)


def test_text_stats_and_cleaning_survive_dirty_rows(spark, dirty):
    from dish_data_pipeline_spark.ops.text import (
        clean_text,
        redact_pii,
        with_fingerprint,
        with_language_id,
        with_text_stats,
    )

    stats = {r.doc_id: r for r in with_text_stats(dirty).collect()}
    assert len(stats) == 6  # no row dropped, nothing thrown
    assert stats[1].n_tokens == 0
    assert stats[4].n_tokens == 5
    assert with_language_id(dirty).count() == 6
    assert clean_text(dirty).count() == 6
    red = {r.doc_id: r for r in redact_pii(dirty).collect()}
    assert red[0].n_emails == 0  # NULL treated as ''
    # md5 fingerprint of NULL is NULL — consistent exact-dedup key
    fp = {r.doc_id: r.fingerprint for r in with_fingerprint(dirty).collect()}
    assert fp[0] is None and fp[1] is not None


def test_pair_bigram_and_lm_ops_exclude_dirty_rows_consistently(spark, dirty):
    from dish_data_pipeline_spark.ops.text import (
        bigram_lm_counts,
        char_pair_counts,
        doc_lm_scores,
    )

    pairs = {r.pair for r in char_pair_counts(dirty).collect()}
    # only tokens of length >= 2 contribute; non-ASCII splits words
    # at the accent characters under the [A-Za-z0-9]+ tokenizer
    assert "no" in pairs
    bi = bigram_lm_counts(dirty).collect()
    assert all(r.n >= 1 for r in bi)
    scores = {r.doc_id: r for r in doc_lm_scores(dirty).collect()}
    # docs with < 2 tokens (NULL/empty/whitespace/single-char) absent
    assert 0 not in scores and 1 not in scores and 2 not in scores
    assert 4 in scores and scores[4].n_bigrams == 4


def test_bpe_and_fingerprints_survive_dirty_rows(spark, dirty):
    from dish_data_pipeline_spark.ops.text import (
        bpe_segment,
        bpe_train,
        winnow_fingerprints,
    )

    merges, vocab = bpe_train(dirty, n_merges=3)
    assert all(len(m) == 4 for m in merges)
    seg = {r.doc_id: r for r in bpe_segment(dirty, merges).collect()}
    assert len(seg) == 6  # segmentation is total: every row survives
    assert seg[0].tokens is None or list(seg[0].tokens) == []
    assert list(seg[2].tokens) == []  # whitespace-only → no tokens
    assert winnow_fingerprints(dirty).where(F.col("doc_id") == 4).count() == 1


def test_drift_divergence_survives_dirty_rows(spark):
    from dish_data_pipeline_spark.ops.drift import token_divergence

    rows = [("a", None), ("a", "the cat"), ("b", ""), ("b", "the dog")]
    out = {r.src: r for r in token_divergence(
        spark.createDataFrame(rows, "src string, text string"), "src"
    ).collect()}
    assert set(out) == {"a", "b"}  # groups with SOME tokens present
    assert all(r.n_tokens == 2 for r in out.values())
