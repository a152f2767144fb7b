"""Property tests: the Spark MinHash-LSH / SimHash / winnowing
pipelines must match pure-Python twins exactly on random inputs —
a third independent implementation (beyond the DuckDB oracles) of
the same algorithms, exercised on adversarial shapes the planted
corpus doesn't cover (empty token lists, shingle collisions, short
texts)."""

from __future__ import annotations

import hashlib
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Row
from pyspark.sql import functions as F

from dish_data_pipeline_spark.ops.dedup_fuzzy import (
    exact_jaccard_pairs,
    minhash_candidate_pairs,
    simhash_near_pairs,
    with_minhash,
    with_shingles,
    with_simhash,
)
from dish_data_pipeline_spark.ops.portable import perm_coeffs, py_perm, py_phash
from dish_data_pipeline_spark.ops.text import winnow_fingerprints

SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# Small vocabulary forces shingle overlap between random docs.
WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "fox"]
DOC = st.lists(st.sampled_from(WORDS), min_size=0, max_size=12).map(" ".join)
DOCS = st.lists(DOC, min_size=1, max_size=8)


def _py_shingles(text: str, n: int = 3) -> list[str]:
    toks = re.findall(r"[A-Za-z0-9]+", text)
    if len(toks) < n:
        return [" ".join(toks)]
    return list(dict.fromkeys(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)))


def _py_minhash(shingles: list[str], n_hashes: int = 16, seed: int = 42) -> list[int]:
    phs = [py_phash(s) for s in shingles]
    return [min(py_perm(h, a, b) for h in phs) for a, b in perm_coeffs(n_hashes, seed)]


def _py_candidates(sigs: dict[int, list[int]], bands: int = 4, rows: int = 4):
    out = set()
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            for band in range(bands):
                lo, hi = band * rows, band * rows + rows
                ka = py_phash("-".join(str(v) for v in sigs[a][lo:hi]))
                kb = py_phash("-".join(str(v) for v in sigs[b][lo:hi]))
                if ka == kb:
                    out.add((a, b))
                    break
    return out


@given(docs=DOCS)
@SLOW
def test_minhash_pipeline_matches_python_twin(spark, docs):
    rows = [
        Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))
        for i, t in enumerate(docs)
    ]
    df = spark.createDataFrame(rows)
    shingled = with_shingles(df)
    pairs = minhash_candidate_pairs(with_minhash(shingled))
    got = {
        (r.id_a, r.id_b): (r.est_jaccard, r.jaccard)
        for r in exact_jaccard_pairs(shingled, pairs).collect()
    }

    sh = {i: _py_shingles(t) for i, t in enumerate(docs)}
    sigs = {i: _py_minhash(s) for i, s in sh.items()}
    expect = {}
    for a, b in _py_candidates(sigs):
        est = sum(x == y for x, y in zip(sigs[a], sigs[b])) / 16.0
        inter = len(set(sh[a]) & set(sh[b]))
        union = len(set(sh[a]) | set(sh[b]))
        expect[(a, b)] = (est, inter / union)
    assert got == expect


def _py_simhash(text: str, bits: int = 60) -> int:
    toks = list(dict.fromkeys(re.findall(r"[A-Za-z0-9]+", text)))
    hs = [py_phash(t) for t in toks]
    sim = 0
    for j in range(bits):
        if sum(1 if (h >> j) & 1 else -1 for h in hs) >= 0:
            sim |= 1 << j
    return sim


@given(docs=DOCS)
@SLOW
def test_simhash_pairs_match_python_twin(spark, docs):
    rows = [
        Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))
        for i, t in enumerate(docs)
    ]
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_pairs(with_simhash(spark.createDataFrame(rows))).collect()
    }

    sims = {i: _py_simhash(t) for i, t in enumerate(docs)}
    mask = (1 << 15) - 1
    expect = {}
    ids = sorted(sims)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if any(
                (sims[a] >> (bd * 15)) & mask == (sims[b] >> (bd * 15)) & mask
                for bd in range(4)
            ):
                expect[(a, b)] = bin(sims[a] ^ sims[b]).count("1")
    assert got == expect


TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40
)


def _py_winnow(text: str, k: int = 8, window: int = 4):
    grams = [
        py_phash(text[i : i + k]) for i in range(max(len(text) - k + 1, 1))
    ]
    mins = [
        min(grams[i : i + window]) for i in range(max(len(grams) - window + 1, 1))
    ]
    fps = list(dict.fromkeys(mins))
    digest = hashlib.md5(",".join(str(v) for v in sorted(fps)).encode()).hexdigest()
    return len(fps), digest


@given(texts=st.lists(TEXT, min_size=1, max_size=6))
@SLOW
def test_winnow_matches_python_twin(spark, texts):
    rows = [
        Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))
        for i, t in enumerate(texts)
    ]
    out = winnow_fingerprints(spark.createDataFrame(rows)).select(
        "doc_id",
        "n_fingerprints",
        F.md5(
            F.expr(
                "array_join(transform(sort_array(fingerprints), "
                "x -> cast(x as string)), ',')"
            )
        ).alias("fp_digest"),
    )
    got = {r.doc_id: (r.n_fingerprints, r.fp_digest) for r in out.collect()}
    expect = {i: _py_winnow(t) for i, t in enumerate(texts)}
    assert got == expect


# --- segment_dedup vs Python twin ---------------------------------
def _py_segment_dedup(texts: list[str], seg_tokens: int = 2, max_docs: int = 1):
    """Reference semantics: strip segments appearing in more than
    max_docs distinct docs except from the smallest-id doc."""
    segs = {}
    for i, t in enumerate(texts):
        toks = re.findall(r"[A-Za-z0-9]+", t)
        segs[i] = [
            " ".join(toks[p : p + seg_tokens])
            for p in range(0, len(toks), seg_tokens)
        ]
    docs_of = {}
    for i, ss in segs.items():
        for s in set(ss):
            docs_of.setdefault(s, set()).add(i)
    out = {}
    for i, ss in segs.items():
        kept = [
            s
            for s in ss
            if len(docs_of[s]) <= max_docs or i == min(docs_of[s])
        ]
        out[i] = (" ".join(kept), len(ss), len(kept))
    return out


@SLOW
@given(DOCS)
def test_segment_dedup_matches_python_twin(spark, texts):
    """Both physical strategies (window census and AQE-splittable
    groupBy census) must match the reference model — and therefore
    each other — on random inputs."""
    from dish_data_pipeline_spark.ops.segments import segment_dedup

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    want = _py_segment_dedup(texts, seg_tokens=2)
    for impl in ("window", "census"):
        got = {
            r.doc_id: (r.text_deduped, r.n_segments, r.n_kept)
            for r in segment_dedup(df, seg_tokens=2, impl=impl).collect()
        }
        assert got == want, impl
