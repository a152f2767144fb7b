"""Round-7 property tests: batched BPE merge selection
(ops/text.bpe_train batch_m), the multi-pair fold, and the
versioned-manifest commit ordering invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dish_data_pipeline_spark.ops.text import (
    _merge_fold,
    _merge_fold_multi,
    bpe_train,
)


def test_multi_fold_equals_sequential_folds_for_disjoint_pairs(spark):
    """The batch-acceptance rule's payoff: one combined pass over
    disjoint pairs == sequential single-pair passes, symbol by
    symbol."""
    words = ["erin", "stow", "terse", "aaaa", "wrist", "snore", "x"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    syms = F.split("w", "")
    pairs = [("e", "r"), ("s", "t"), ("o", "w")]

    combined = df.select(_merge_fold_multi(syms, pairs).alias("s"))
    seq = syms
    for left, right in pairs:
        seq = _merge_fold(seq, left, right)
    sequential = df.select(seq.alias("s"))
    assert [r.s for r in combined.collect()] == [
        r.s for r in sequential.collect()
    ]


def test_batched_bpe_equals_exact_when_merges_disjoint(spark):
    """A corpus whose top pairs are mutually non-interacting and
    whose counts are strictly separated (no created pair can
    overtake): batch_m=4 must reproduce exact greedy verbatim."""
    text = " ".join(["er"] * 40 + ["st"] * 30 + ["ow"] * 20 + ["in"] * 10)
    df = spark.createDataFrame([(text,)], "text string")
    exact, _ = bpe_train(df, "text", n_merges=4, batch_m=1)
    batched, _ = bpe_train(df, "text", n_merges=4, batch_m=4)
    assert batched == exact == [
        (1, "e", "r", 40), (2, "s", "t", 30), (3, "o", "w", 20),
        (4, "i", "n", 10),
    ]


def test_batched_bpe_prefix_rule_stops_at_interaction(spark):
    """Candidate 2 shares a symbol with candidate 1 → the batch must
    end after candidate 1 (its application would invalidate the
    pre-batch count of candidate 2), falling back to per-round
    behavior — so the result again equals exact greedy."""
    # (a,b) leads; (b,c) interacts with it via 'b'
    text = " ".join(["abz"] * 5 + ["bcz"] * 4)
    df = spark.createDataFrame([(text,)], "text string")
    exact, _ = bpe_train(df, "text", n_merges=3, batch_m=1)
    batched, _ = bpe_train(df, "text", n_merges=3, batch_m=3)
    assert batched == exact


def test_batched_bpe_respects_min_pair_count(spark):
    df = spark.createDataFrame([("er er st",)], "text string")
    merges, _ = bpe_train(df, "text", n_merges=5, batch_m=5, min_pair_count=2)
    # (s,t) appears once — below the floor; batch must not absorb it
    assert merges == [(1, "e", "r", 2)]


def test_batched_bpe_rejects_bad_batch_m(spark):
    df = spark.createDataFrame([("ab",)], "text string")
    with pytest.raises(ValueError, match="batch_m"):
        bpe_train(df, "text", n_merges=1, batch_m=0)
