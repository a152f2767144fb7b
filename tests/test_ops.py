"""Extension operators: fuzzy dedup finds planted near-dups,
similarity search ranks a known neighbor first, multimodal plumbing
round-trips."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from dish_data_pipeline_spark.ops.dedup_fuzzy import (
    exact_dedup_groups,
    exact_jaccard_pairs,
    minhash_candidate_pairs,
    simhash_near_pairs,
    with_minhash,
    with_shingles,
    with_simhash,
)
from dish_data_pipeline_spark.ops.multimodal import (
    extract_features,
    fake_feature_extract,
    text_to_binary_content,
)
from dish_data_pipeline_spark.ops.similarity import cosine_topk
from dish_data_pipeline_spark.ops.text import with_language_id, with_text_stats

BASE = "the quick brown fox jumps over the lazy dog near the river bank today"


def _docs(spark):
    rows = [
        Row(doc_id=0, text=BASE, lang="en", source="s", n_chars=len(BASE)),
        # near-dup: one word changed
        Row(doc_id=1, text=BASE.replace("quick", "rapid"), lang="en", source="s",
            n_chars=len(BASE)),
        # exact dup of 0
        Row(doc_id=2, text=BASE, lang="en", source="s", n_chars=len(BASE)),
        # unrelated
        Row(doc_id=3, text="completely different content about spark sql engines "
            "and distributed query processing at large scale", lang="en",
            source="s", n_chars=10),
    ]
    return spark.createDataFrame(rows)


def test_exact_dedup_groups(spark):
    groups = exact_dedup_groups(_docs(spark)).collect()
    dupes = [g for g in groups if g.n_copies > 1]
    assert len(dupes) == 1
    assert dupes[0].n_copies == 2 and dupes[0].canonical_id == 0


def test_minhash_finds_planted_neardups(spark):
    shingled = with_shingles(_docs(spark))
    pairs = minhash_candidate_pairs(with_minhash(shingled))
    scored = exact_jaccard_pairs(shingled, pairs)
    found = {(r.id_a, r.id_b): r.jaccard for r in scored.collect()}
    assert found.get((0, 2)) == 1.0  # exact dup pair
    near = found.get((0, 1))
    assert near is not None and 0.5 < near < 1.0  # one-word change
    assert (0, 3) not in found and (1, 3) not in found  # unrelated stays out


def test_simhash_identical_docs_hamming_zero(spark):
    pairs = simhash_near_pairs(with_simhash(_docs(spark))).collect()
    ham = {(r.id_a, r.id_b): r.hamming for r in pairs}
    assert ham.get((0, 2)) == 0
    if (0, 1) in ham:
        assert ham[(0, 1)] <= 12  # near-dup: small distance


def test_cosine_topk_ranks_identical_vector_first(spark):
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0], label=0),
        Row(vec_id=1, embedding=[1.0, 0.0, 0.0], label=0),  # identical to 0
        Row(vec_id=2, embedding=[0.9, 0.1, 0.0], label=0),
        Row(vec_id=3, embedding=[0.0, 1.0, 0.0], label=1),
    ]
    emb = spark.createDataFrame(rows).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    out = cosine_topk(emb, [0], k=3).collect()
    assert [r.neighbor_id for r in out] == [1, 2, 3]
    assert abs(out[0].cosine - 1.0) < 1e-6


def test_text_stats_counts(spark):
    d = spark.createDataFrame(
        [Row(doc_id=0, text="Hello, world! abc abc", lang="en", source="s",
             n_chars=21)]
    )
    row = with_text_stats(d).collect()[0]
    assert row.n_tokens == 4
    assert row.n_distinct_tokens == 3
    assert row.n_punct == 2  # comma + bang


def test_language_id_deterministic_pick(spark):
    d = spark.createDataFrame(
        [
            Row(doc_id=0, text="the cat and the dog of war", lang="en",
                source="s", n_chars=1),
            Row(doc_id=1, text="el perro la casa los gatos", lang="es",
                source="s", n_chars=1),
        ]
    )
    out = {r.doc_id: r.lang_pred for r in with_language_id(d).collect()}
    assert out[0] == "en" and out[1] == "es"


def test_multimodal_feature_extraction(spark):
    d = spark.createDataFrame(
        [Row(doc_id=0, text="abc", lang="en", source="s", n_chars=3)]
    )
    feats = extract_features(text_to_binary_content(d)).collect()
    assert len(feats) == 1
    row = feats[0]
    assert row.mime == "text/plain" and row.n_bytes == 3
    assert row.features == fake_feature_extract(b"abc")
