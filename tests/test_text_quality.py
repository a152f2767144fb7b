"""Unit tests for the training-data quality operators added in
round 3: Gopher repetition stats, quality flags, n-gram benchmark
decontamination, target-mixture sampling, incremental near-dup
filtering. Planted cases with hand-computed expectations; the
sf0.01 oracle equivalence is covered by the catalog gate
(tools/check_oracle.py)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from dish_data_pipeline_spark.ops.contamination import (
    contamination_report,
    decontaminate,
)
from dish_data_pipeline_spark.ops.dedup_fuzzy import incremental_neardup_filter
from dish_data_pipeline_spark.ops.sampling import mixture_sample
from dish_data_pipeline_spark.ops.text import top_ngram_stats, with_quality_flags


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))
         for i, t in rows]
    )


# --- top_ngram_stats ----------------------------------------------
def test_top_ngram_known_counts(spark):
    df = _docs(spark, [(1, "a b a b a b c"), (3, "one two three four")])
    out = {r.doc_id: r for r in top_ngram_stats(df).collect()}
    r1 = out[1]  # bigrams: "a b"×3, "b a"×2, "b c"×1
    assert r1.top_ngram == "a b" and r1.top_ngram_count == 3
    assert r1.n_ngrams == 6
    assert abs(r1.top_ngram_char_frac - 3 * 3 / 13) < 1e-12
    assert abs(r1.dup_ngram_frac - 0.5) < 1e-12  # 3 distinct of 6
    r3 = out[3]  # all bigrams unique; tie-break = largest gram
    assert r3.top_ngram == "two three" and r3.top_ngram_count == 1
    assert r3.dup_ngram_frac == 0.0


def test_top_ngram_short_docs_absent(spark):
    df = _docs(spark, [(1, "solo"), (2, "")])
    assert top_ngram_stats(df).count() == 0


# --- with_quality_flags -------------------------------------------
def test_quality_flags_rules(spark):
    good = "the quick brown fox jumps over the lazy dog near the river bank"
    short = "too short"
    repetitive = " ".join(["spam"] * 40)
    df = _docs(spark, [(1, good), (2, short), (3, repetitive)])
    out = {r.doc_id: r for r in with_quality_flags(df).collect()}
    assert out[1].keep == 1
    assert out[2].ok_tokens == 0 and out[2].keep == 0
    assert out[3].ok_distinct == 0 and out[3].keep == 0  # 1/40 distinct
    assert abs(out[3].distinct_frac - 1 / 40) < 1e-12


# --- contamination ------------------------------------------------
def test_contamination_counts_and_decontaminate(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon")])
    corpus = _docs(
        spark,
        [
            # contains the benchmark 5-gram twice (prefix + repeat)
            (1, "alpha beta gamma delta epsilon and alpha beta gamma delta epsilon"),
            (2, "totally unrelated words one two three four five six"),
            (3, "tiny"),  # < 5 tokens → zero grams
        ],
    )
    rep = {r.doc_id: r for r in contamination_report(corpus, bench).collect()}
    assert set(rep) == {1, 2, 3}  # clean docs present with zeros
    assert rep[1].contaminated == 1 and rep[1].n_contaminated == 2
    assert rep[1].n_grams == 11 - 5 + 1
    assert rep[2].contaminated == 0 and rep[2].n_contaminated == 0
    assert rep[3].n_grams == 0 and rep[3].contamination_frac == 0.0

    kept = {r.doc_id for r in decontaminate(corpus, bench).collect()}
    assert kept == {2, 3}


# --- mixture_sample -----------------------------------------------
def test_mixture_sample_rates_and_determinism(spark):
    rows = [Row(doc_id=i, lang="en" if i < 400 else "fr") for i in range(500)]
    df = spark.createDataFrame(rows)
    out = mixture_sample(
        df, "lang", {"en": 0.5, "fr": 0.5}, out_rows=100,
        key_cols=["cast(doc_id as string)"],
    )
    got = [(r.doc_id, r.lang) for r in out.collect()]
    by_lang = {"en": 0, "fr": 0}
    for _, lang in got:
        by_lang[lang] += 1
    # en: 400 docs, target 50 → rate 0.125; fr: 100 docs, target 50 →
    # rate 0.5. Hash sampling is approximate but deterministic.
    assert 0 < by_lang["en"] < 400  # downsampled
    assert 0 < by_lang["fr"] < 100
    assert by_lang["en"] < 400 * 0.25  # well under half, near 12.5%
    again = [(r.doc_id, r.lang) for r in out.collect()]
    assert sorted(got) == sorted(again)


def test_mixture_sample_scarce_stratum_kept_whole(spark):
    rows = [Row(doc_id=i, lang="en" if i < 95 else "zz") for i in range(100)]
    df = spark.createDataFrame(rows)
    out = mixture_sample(
        df, "lang", {"en": 0.5, "zz": 0.5}, out_rows=200,
        key_cols=["cast(doc_id as string)"],
    )
    # zz: 5 docs, target 100 → rate capped at 1.0 → all kept
    assert out.filter(F.col("lang") == "zz").count() == 5


# --- incremental_neardup_filter -----------------------------------
def test_incremental_filter_drops_copies_keeps_fresh(spark):
    existing = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs today"),
        ],
    )
    new = _docs(
        spark,
        [
            (10, "the quick brown fox jumps over the lazy dog"),  # exact copy
            (11, "completely novel sentence about distributed query engines"),
        ],
    )
    kept = {r.doc_id for r in incremental_neardup_filter(new, existing).collect()}
    assert kept == {11}


def test_char_pair_counts_python_twin(spark):
    from pyspark.sql import Row

    from dish_data_pipeline_spark.ops.text import char_pair_counts

    rows = [Row(text="Banana anna"), Row(text="ab")]
    out = {r.pair: r.n for r in char_pair_counts(spark.createDataFrame(rows)).collect()}
    # python twin over lowercase words: banana, anna, ab
    import collections
    truth = collections.Counter()
    for w in ["banana", "anna", "ab"]:
        for i in range(len(w) - 1):
            truth[w[i:i + 2]] += 1
    assert out == dict(truth)
    assert out["an"] == 3  # banana: an×2, anna: an×1 — every offset counted


def test_bigram_lm_counts_continuations(spark):
    from pyspark.sql import Row

    from dish_data_pipeline_spark.ops.text import bigram_lm_counts

    rows = [
        Row(text="the cat sat"),
        Row(text="a cat ran"),
        Row(text="single"),  # < 2 tokens: contributes nothing
    ]
    out = bigram_lm_counts(spark.createDataFrame(rows)).collect()
    got = {(r.w1, r.w2): (r.n, r.continuation_w2) for r in out}
    # bigrams: (the,cat) (cat,sat) (a,cat) (cat,ran)
    assert got[("the", "cat")] == (1, 2)  # cat completes after {the, a}
    assert got[("a", "cat")] == (1, 2)
    assert got[("cat", "sat")] == (1, 1)
    assert got[("cat", "ran")] == (1, 1)
    assert len(got) == 4
