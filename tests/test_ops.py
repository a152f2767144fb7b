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
    # 8 bands × 2 rows: catch probability for jaccard ≈ 0.71 is
    # 1-(1-0.71²)⁴⁺ ≈ 0.995, and with the fixed portable permutations
    # this specific pair verifiably shares a band (12/16 positions
    # match). Exact dups share ALL bands under any geometry.
    shingled = with_shingles(_docs(spark))
    pairs = minhash_candidate_pairs(
        with_minhash(shingled), bands=8, rows_per_band=2
    )
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


def _py_simhash(text: str, bits: int = 60) -> int:
    """Python twin of with_simhash (distinct tokens, portable hash,
    per-bit sign votes) for planted-case construction."""
    import re

    from dish_data_pipeline_spark.ops.portable import py_phash

    toks = list(dict.fromkeys(re.findall(r"[A-Za-z0-9]+", text)))
    hs = [py_phash(t) for t in toks]
    sim = 0
    for j in range(bits):
        vote = sum(1 if (h >> j) & 1 else -1 for h in hs)
        if vote >= 0:
            sim |= 1 << j
    return sim


def test_simhash_hamming3_pair_is_found(spark):
    """Recall-guarantee regression (round-1 bug): the 4 × 15-bit band
    geometry must surface a pair at hamming EXACTLY 3 — the round-1
    3 × 16-bit geometry only guaranteed hamming ≤ 2 and could
    silently drop such pairs."""
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    h0 = _py_simhash(base)
    planted = None
    for i in range(2000):
        cand = base + f" kilo{i} lima{i} mike{i}"
        d = bin(h0 ^ _py_simhash(cand)).count("1")
        if d == 3:
            planted = cand
            break
    assert planted is not None, "no hamming-3 perturbation found in search"
    from pyspark.sql import Row as R

    df = spark.createDataFrame(
        [
            R(doc_id=0, text=base, lang="en", source="s", n_chars=len(base)),
            R(doc_id=1, text=planted, lang="en", source="s", n_chars=len(planted)),
        ]
    )
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_pairs(with_simhash(df)).collect()
    }
    assert pairs.get((0, 1)) == 3


def test_portable_hash_parity(spark):
    """The Spark SQL spelling of the portable hash must equal the
    Python twin (the DuckDB spelling is verified by the oracle suite)."""
    from dish_data_pipeline_spark.ops.portable import py_phash, spark_phash

    words = ["hello", "", "Zürich", "a b c", "0"]
    df = spark.createDataFrame([(w,) for w in words], ["s"])
    got = {
        r.s: r.h
        for r in df.selectExpr("s", f"{spark_phash('s')} AS h").collect()
    }
    for w in words:
        assert got[w] == py_phash(w), w


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


def test_cosine_topk_true_cosine_on_unnormalized_input(spark):
    # vectors deliberately NOT unit-norm; the default must divide by
    # the norms (a raw dot would score neighbor 1 as 5.0, not 1.0)
    rows = [
        Row(vec_id=0, embedding=[2.0, 0.0], label=0),
        Row(vec_id=1, embedding=[5.0, 0.0], label=0),  # same direction
        Row(vec_id=2, embedding=[3.0, 4.0], label=0),  # cos = 0.6
    ]
    emb = spark.createDataFrame(rows).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    out = {r.neighbor_id: r.cosine for r in cosine_topk(emb, [0], k=2).collect()}
    assert abs(out[1] - 1.0) < 1e-12
    assert abs(out[2] - 0.6) < 1e-12
    # the opt-in fast path returns raw dots on the same input
    raw = {
        r.neighbor_id: r.cosine
        for r in cosine_topk(emb, [0], k=2, assume_normalized=True).collect()
    }
    assert abs(raw[1] - 10.0) < 1e-12


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


def test_connected_components_transitive_clusters(spark):
    """A≈B and B≈C must cluster {A,B,C} even when A≈C was never a
    pair — the property pairwise dedup lacks and corpus-building
    needs. Singletons keep their own label."""
    from pyspark.sql import Row as R

    from dish_data_pipeline_spark.ops.dedup_cluster import (
        canonical_docs,
        connected_components,
    )

    ids = spark.createDataFrame([R(doc_id=i) for i in [1, 2, 3, 4, 7]])
    pairs = spark.createDataFrame(
        [R(id_a=1, id_b=2), R(id_a=2, id_b=3), R(id_a=4, id_b=7)]
    )
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components(ids, pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 7: 4}

    docs = ids.withColumn("text", F.lit("x"))
    kept = canonical_docs(docs, connected_components(ids, pairs))
    assert sorted(r.doc_id for r in kept.collect()) == [1, 4]


def test_clean_text_strips_artifacts(spark):
    from dish_data_pipeline_spark.ops.text import clean_text

    raw = "Hello\x00world see https://x.io/a?b=1 mail a.b@c.org  now\t!"
    d = spark.createDataFrame(
        [Row(doc_id=0, text=raw, lang="en", source="s", n_chars=len(raw)),
         Row(doc_id=1, text="plain text", lang="en", source="s", n_chars=10)]
    )
    out = {r.doc_id: r for r in clean_text(d).collect()}
    assert out[0].clean_text == "Hello world see mail now !"
    assert out[0].had_url == 1 and out[0].had_email == 1
    assert out[0].n_chars_removed == len(raw) - len(out[0].clean_text)
    assert out[1].clean_text == "plain text"
    assert out[1].had_url == 0 and out[1].had_email == 0


def test_decode_image_routes_by_pil_presence():
    """decode_image auto-detects PIL: real decode when the lib is
    importable, loud NotImplementedError otherwise — both branches
    covered, whichever environment this runs in."""
    import pytest as _pytest

    from dish_data_pipeline_spark.ops import multimodal as mm

    if mm.has_pil():
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("L", (3, 2), color=7).save(buf, format="PNG")
        arr = mm.decode_image(buf.getvalue())
        assert arr.shape == (2, 3) and int(arr[0][0]) == 7
        # the opt-in real resize kernel honors the w*h byte contract
        assert len(mm.pil_resize_kernel(buf.getvalue(), 4, 4)) == 16
    else:
        with _pytest.raises(NotImplementedError):
            mm.decode_image(b"\x89PNG\r\n")


def test_decode_image_real_kernel_when_forced(monkeypatch):
    """When detection says PIL is absent, the stub path must raise
    even for well-formed input (no silent fake decode)."""
    from dish_data_pipeline_spark.ops import multimodal as mm

    monkeypatch.setattr(mm, "_HAS_PIL", False)
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        mm.decode_image(b"anything")
