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


def _ppm_p6(w, h):
    """Planted P6 raster with a comment in the header; pixel bytes
    are 0,1,2,... so every position is checkable."""
    return (
        f"P6\n# planted\n{w} {h}\n255\n".encode()
        + bytes(i % 256 for i in range(w * h * 3))
    )


def _bmp24(pixels):
    """Minimal uncompressed 24-bit BMP from rows of (r,g,b), top row
    first — stored bottom-up, BGR, 4-byte row padding per the format."""
    import struct

    h, w = len(pixels), len(pixels[0])
    row_bytes = (w * 3 + 3) & ~3
    raster = b"".join(
        b"".join(bytes((b, g, r)) for (r, g, b) in row).ljust(row_bytes, b"\x00")
        for row in reversed(pixels)
    )
    fh = b"BM" + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
    ih = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster),
                     2835, 2835, 0, 0)
    return fh + ih + raster


def test_decode_ppm_and_pgm_pure_python():
    from dish_data_pipeline_spark.ops import multimodal as mm

    arr = mm.decode_image(_ppm_p6(3, 2))
    assert arr.shape == (2, 3, 3)
    assert [int(v) for v in arr[0, 0]] == [0, 1, 2]
    assert [int(v) for v in arr[1, 2]] == [15, 16, 17]

    pgm = b"P5\n2 2\n255\n" + bytes([9, 8, 7, 6])
    arr = mm.decode_image(pgm)
    assert arr.shape == (2, 2) and int(arr[0, 0]) == 9 and int(arr[1, 1]) == 6

    import pytest as _pytest

    with _pytest.raises(ValueError, match="raster"):
        mm.decode_ppm(b"P6\n2 2\n255\n\x00")  # truncated


def test_decode_bmp_bottom_up_padding_and_bgr():
    from dish_data_pipeline_spark.ops import multimodal as mm

    pixels = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
        [(1, 2, 3), (4, 5, 6), (7, 8, 9)],
    ]
    arr = mm.decode_image(_bmp24(pixels))
    assert arr.shape == (2, 3, 3)
    # row order and BGR→RGB both round-trip
    assert [[tuple(int(v) for v in px) for px in row] for row in arr] == pixels

    import pytest as _pytest

    with _pytest.raises(ValueError, match="24-bit"):
        bad = bytearray(_bmp24(pixels))
        bad[28] = 8  # bpp
        mm.decode_bmp(bytes(bad))


def test_real_decode_through_extract_features(spark):
    """End-to-end: planted real-format bytes (PPM + BMP) flow the
    binary column → mapInPandas → REAL decode → pixel-statistic
    features. No imaging library involved."""
    from dish_data_pipeline_spark.ops import multimodal as mm

    ppm, bmp = _ppm_p6(4, 2), _bmp24([[(10, 10, 10), (40, 40, 40)]])
    d = spark.createDataFrame(
        [Row(doc_id=0, content=bytearray(ppm)),
         Row(doc_id=1, content=bytearray(bmp))]
    ).withColumn(
        "meta",
        F.struct(
            F.lit("image/x-portable-pixmap").alias("mime"),
            F.length("content").cast("bigint").alias("n_bytes"),
            F.lit("planted").alias("source"),
        ),
    )
    rows = {
        r.doc_id: r.features
        for r in extract_features(
            d, batch_extractor=mm.decoded_feature_extract
        ).collect()
    }
    assert rows[0][:3] == [2.0, 4.0, 3.0]  # h, w, channels
    assert rows[0][4] == 0.0 and rows[0][5] == 23.0  # min, max of 0..23
    assert rows[1][:3] == [1.0, 2.0, 3.0]
    assert rows[1][3] == 25.0  # mean of 10s and 40s


def test_decode_resize_kernel_real_pixels(spark):
    from dish_data_pipeline_spark.ops import multimodal as mm
    from dish_data_pipeline_spark.ops.multimodal import resize_images

    # 4×4 grayscale ramp → 2×2 nearest-neighbor picks rows/cols 0,2
    pgm = b"P5\n4 4\n255\n" + bytes(range(16))
    d = spark.createDataFrame([Row(doc_id=0, content=bytearray(pgm))])
    out = resize_images(
        d, width=2, height=2, kernel=mm.decode_resize_kernel
    ).collect()[0]
    assert bytes(out.content) == bytes([0, 2, 8, 10])


def test_decode_wav_parses_stdlib_wave_output():
    """Independent-builder check: a file written by Python's stdlib
    `wave` module parses back sample-exact through the pure-Python
    RIFF parser (16-bit mono + stereo), and the features are the
    documented statistics."""
    import io
    import wave

    from dish_data_pipeline_spark.ops import multimodal as mm

    samples = [0, 1000, -1000, 32767, -32768, 5]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        import struct

        w.writeframes(b"".join(struct.pack("<h", s) for s in samples))
    rate, arr = mm.decode_wav(buf.getvalue())
    assert rate == 16000 and list(arr) == samples

    # stereo: frames become (n, 2); channel 0 drives the features
    buf2 = io.BytesIO()
    with wave.open(buf2, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        import struct

        w.writeframes(struct.pack("<4h", 3, 9, -4, 9))
    rate2, arr2 = mm.decode_wav(buf2.getvalue())
    assert arr2.shape == (2, 2) and list(arr2[:, 0]) == [3, -4]
    feats = mm.audio_feature_extract([buf2.getvalue()])[0]
    assert feats[:3] == [8000.0, 2.0, 2.0]
    assert feats[4] == 1.0  # one sign change on channel 0


def test_wav_roundtrip_and_guards():
    import pytest as _pytest

    from dish_data_pipeline_spark.ops import multimodal as mm

    blob = mm.wav_from_samples([7, -7, 70000, -70000], sample_rate=4000)
    rate, arr = mm.decode_wav(blob)
    assert rate == 4000
    assert list(arr) == [7, -7, 32767, -32768]  # clamped at pack time

    with _pytest.raises(ValueError, match="RIFF"):
        mm.decode_wav(b"nope")
    with _pytest.raises(ValueError, match="fmt/data"):
        mm.decode_wav(b"RIFF\x04\x00\x00\x00WAVE" + b"\x00" * 40)
