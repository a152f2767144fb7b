"""Property tests for the round-6 operators. Each operator is
twinned by an independent pure-Python implementation on random
inputs — shapes the fixed corpus doesn't cover (repeated symbols,
single-word corpora, merge chains that cascade)."""

from __future__ import annotations

import collections
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dish_data_pipeline_spark.ops.text import bpe_train

SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# Tiny alphabet so pair merges collide and cascade (aa+a, ab+ba …).
WORDS = st.lists(
    st.text(alphabet="ab1", min_size=1, max_size=6),
    min_size=1,
    max_size=30,
)


def _twin_bpe(texts, n_merges, min_pair_count=2):
    wc = collections.Counter(
        w
        for t in texts
        for w in re.findall("[A-Za-z0-9]+", t.lower())
        if len(w) >= 2
    )
    vo = {w: list(w) for w in wc}
    merges = []
    for step in range(1, n_merges + 1):
        pc = collections.Counter()
        for w, syms in vo.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wc[w]
        if not pc:
            break
        (left, right), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_pair_count:
            break
        merges.append((step, left, right, c))
        for w, syms in vo.items():
            acc = []
            for s in syms:
                if acc and acc[-1] == left and s == right:
                    acc[-1] = left + right
                else:
                    acc.append(s)
            vo[w] = acc
    vocab = sorted((tuple(v), wc[w]) for w, v in vo.items())
    return merges, vocab


@SLOW
@given(WORDS)
def test_bpe_train_matches_python_twin(spark, words):
    texts = [" ".join(words[i : i + 5]) for i in range(0, len(words), 5)]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    merges, vocab = bpe_train(df, "text", n_merges=4)
    tw_merges, tw_vocab = _twin_bpe(texts, 4)
    assert merges == tw_merges
    got_vocab = sorted((tuple(r.syms), r.n) for r in vocab.collect())
    assert got_vocab == tw_vocab


def test_bpe_train_greedy_overlap_and_early_stop(spark):
    # "aaaa" ×3: pair (a,a) counts 9 (overlapping), first merge makes
    # [aa, aa]; second merge (aa, aa) makes [aaaa]; then no pair is
    # left anywhere and training stops early.
    df = spark.createDataFrame([("aaaa aaaa aaaa",)], "text string")
    merges, vocab = bpe_train(df, "text", n_merges=10)
    assert merges == [(1, "a", "a", 9), (2, "aa", "aa", 3)]
    assert [(tuple(r.syms), r.n) for r in vocab.collect()] == [(("aaaa",), 3)]

    import pytest

    with pytest.raises(ValueError, match="n_merges"):
        bpe_train(df, "text", n_merges=0)
