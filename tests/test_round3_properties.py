"""Property tests for the round-3 operators: segment dedup, mixture
sampling, contamination, and the KMV sketch must match pure-Python
twins on random inputs — a third independent implementation beyond
the DuckDB oracles, exercised on adversarial shapes the planted
corpus doesn't cover (empty docs, all-duplicate corpora, singleton
strata)."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Row

from dish_data_pipeline_spark.ops.contamination import contamination_report
from dish_data_pipeline_spark.ops.portable import py_phash
from dish_data_pipeline_spark.ops.sampling import SAMPLE_DENOM, mixture_sample
from dish_data_pipeline_spark.ops.segments import segment_dedup
from dish_data_pipeline_spark.ops.sketch import kmv_distinct

SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "fox"]
DOC = st.lists(st.sampled_from(WORDS), min_size=0, max_size=14).map(" ".join)
DOCS = st.lists(DOC, min_size=1, max_size=8)


def _toks(text: str) -> list[str]:
    return re.findall(r"[A-Za-z0-9]+", text)


# --- segment_dedup vs python twin ---------------------------------
def _py_segment_dedup(docs: dict[int, str], k: int):
    segs = {}
    for i, t in docs.items():
        toks = _toks(t)
        segs[i] = [
            " ".join(toks[p * k : p * k + k])
            for p in range((len(toks) + k - 1) // k)
        ]
    first, ndocs = {}, {}
    for i in sorted(docs):
        for s in set(segs[i]):
            first.setdefault(s, i)
            ndocs[s] = ndocs.get(s, 0) + 1
    out = {}
    for i in sorted(docs):
        kept = [s for s in segs[i] if ndocs[s] <= 1 or first[s] == i]
        out[i] = (" ".join(kept), len(segs[i]), len(kept))
    return out


@SLOW
@given(DOCS)
def test_segment_dedup_matches_python(spark, texts):
    docs = dict(enumerate(texts))
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in docs.items()]
    )
    got = {
        r.doc_id: (r.text_deduped, r.n_segments, r.n_kept)
        for r in segment_dedup(df, seg_tokens=3).collect()
    }
    assert got == _py_segment_dedup(docs, 3)


# --- mixture_sample invariants ------------------------------------
LANGS = ["en", "de", "fr"]


@SLOW
@given(
    st.lists(st.sampled_from(LANGS), min_size=1, max_size=40),
    st.integers(min_value=1, max_value=30),
)
def test_mixture_sample_matches_python(spark, langs, out_rows):
    rows = [Row(doc_id=i, lang=g) for i, g in enumerate(langs)]
    df = spark.createDataFrame(rows)
    weights = {"en": 0.5, "de": 0.3, "fr": 0.2}
    got = {
        r.doc_id
        for r in mixture_sample(
            df, "lang", weights, out_rows, ["cast(doc_id as string)"]
        ).collect()
    }
    counts = {g: langs.count(g) for g in set(langs)}
    import math

    expect = set()
    for i, g in enumerate(langs):
        thresh = min(
            SAMPLE_DENOM,
            int(math.floor(weights[g] * out_rows * SAMPLE_DENOM / counts[g])),
        )
        if py_phash(f"{i}|mix") % SAMPLE_DENOM < thresh:
            expect.add(i)
    assert got == expect
    # membership is a pure row-key function: a second run is identical
    again = {
        r.doc_id
        for r in mixture_sample(
            df, "lang", weights, out_rows, ["cast(doc_id as string)"]
        ).collect()
    }
    assert again == got


# --- contamination vs python twin ---------------------------------
@SLOW
@given(DOCS, DOCS)
def test_contamination_matches_python(spark, corpus_texts, bench_texts):
    n = 2
    corpus = dict(enumerate(corpus_texts))
    bench = dict(enumerate(bench_texts))
    cdf = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in corpus.items()]
    )
    bdf = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in bench.items()]
    )
    got = {
        r.doc_id: (r.n_grams, r.n_contaminated)
        for r in contamination_report(cdf, bdf, n=n).collect()
    }

    def grams(t):
        toks = _toks(t)
        return [
            " ".join(toks[i : i + n]) for i in range(max(0, len(toks) - n + 1))
        ]

    bgrams = {g for t in bench.values() for g in grams(t)}
    expect = {
        i: (len(grams(t)), sum(1 for g in grams(t) if g in bgrams))
        for i, t in corpus.items()
    }
    assert got == expect


# --- histogram quantiles vs python twin ---------------------------
@SLOW
@given(
    st.lists(st.integers(0, 1000), min_size=1, max_size=60),
    st.sampled_from([0.5, 0.9]),
)
def test_histogram_quantiles_matches_python(spark, values, q):
    from dish_data_pipeline_spark.ops.sketch import histogram_quantiles

    bins = 16
    df = spark.createDataFrame([Row(g="x", v=float(x)) for x in values])
    got = {
        r.q: r.est
        for r in histogram_quantiles(
            df, "g", "v", quantiles=(q,), bins=bins
        ).collect()
    }

    lo, hi, n = float(min(values)), float(max(values)), len(values)
    if hi <= lo:
        expect = lo
    else:
        counts = [0] * bins
        for x in values:
            b = min(bins - 1, int((float(x) - lo) * bins / (hi - lo)))
            counts[b] += 1
        cum = 0
        for b, c in enumerate(counts):
            cum += c
            if cum >= q * n:
                frac = (q * n - (cum - c)) / c
                expect = lo + (b + frac) * (hi - lo) / bins
                break
    assert abs(got[q] - expect) < 1e-9


# --- incremental near-dup filter vs python twin -------------------
def _py_bands(text: str, bands: int = 4, rows: int = 4) -> set[tuple[int, int]]:
    from tests.test_dedup_properties import _py_minhash, _py_shingles

    sig = _py_minhash(_py_shingles(text))
    return {
        (b, py_phash("-".join(str(v) for v in sig[b * rows : b * rows + rows])))
        for b in range(bands)
    }


@SLOW
@given(DOCS, DOCS)
def test_incremental_filter_matches_python(spark, new_texts, old_texts):
    from dish_data_pipeline_spark.ops.dedup_fuzzy import (
        incremental_neardup_filter,
    )

    new_df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(new_texts)]
    )
    old_df = spark.createDataFrame(
        [Row(doc_id=100 + i, text=t) for i, t in enumerate(old_texts)]
    )
    got = {
        r.doc_id for r in incremental_neardup_filter(new_df, old_df).collect()
    }
    old_keys = {k for t in old_texts for k in _py_bands(t)}
    expect = {
        i for i, t in enumerate(new_texts) if not (_py_bands(t) & old_keys)
    }
    assert got == expect


# --- kmv sketch vs python twin ------------------------------------
@SLOW
@given(
    st.lists(
        st.tuples(st.sampled_from("ab"), st.integers(0, 400)),
        min_size=1,
        max_size=120,
    ),
    st.sampled_from([4, 16]),
)
def test_kmv_matches_python(spark, pairs, k):
    df = spark.createDataFrame([Row(g=g, v=f"v{n}") for g, n in pairs])
    got = {
        r.g: (r.n_distinct, r.est_distinct)
        for r in kmv_distinct(df, "g", "v", k=k).collect()
    }
    expect = {}
    for g in {p[0] for p in pairs}:
        hs = sorted({py_phash(f"v{n}") for gg, n in pairs if gg == g})
        est = (
            float(len(hs))
            if len(hs) < k
            else float(k - 1) * float(1 << 60) / float(hs[k - 1])
        )
        expect[g] = (len(hs), est)
    assert got == expect
