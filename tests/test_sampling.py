"""Deterministic sampling + sequence packing semantics."""

from __future__ import annotations

import re

from pyspark.sql import Row

from dish_data_pipeline_spark.ops.portable import py_phash
from dish_data_pipeline_spark.ops.sampling import (
    SAMPLE_DENOM,
    deterministic_sample,
    pack_sequences,
    stratified_sample,
)

LANGS = ["en", "de", "fr", "es"]


def _docs(spark, n=200):
    rows = [
        Row(doc_id=i, text=" ".join(f"w{j}" for j in range(5 + i % 17)),
            lang=LANGS[i % 4], source="s", n_chars=10)
        for i in range(n)
    ]
    return spark.createDataFrame(rows)


def test_sample_matches_python_twin_and_nests(spark):
    d = _docs(spark)
    key = ["cast(doc_id as string)"]
    s10 = {r.doc_id for r in deterministic_sample(d, 0.10, key).collect()}
    s20 = {r.doc_id for r in deterministic_sample(d, 0.20, key).collect()}
    expect10 = {
        i for i in range(200)
        if py_phash(f"{i}|sample") % SAMPLE_DENOM < int(0.10 * SAMPLE_DENOM)
    }
    assert s10 == expect10
    # same salt => smaller sample nests inside the larger one
    assert s10 <= s20


def test_stratified_rates_match_python_twin(spark):
    d = _docs(spark)
    rates = {"en": 0.5, "de": 0.2}
    out = stratified_sample(
        d, "lang", rates, key_cols=["cast(doc_id as string)"], default_rate=0.0
    ).collect()
    got = {r.doc_id for r in out}
    expect = set()
    for i in range(200):
        rate = rates.get(LANGS[i % 4], 0.0)
        if py_phash(f"{i}|sample") % SAMPLE_DENOM < int(rate * SAMPLE_DENOM):
            expect.add(i)
    assert got == expect
    assert all(LANGS[i % 4] in rates for i in got)  # default 0 drops rest


def test_stratified_sample_escapes_quoted_strata(spark):
    rows = [
        Row(doc_id=i, lang="pt'; DROP" if i % 2 == 0 else "it's", source="s")
        for i in range(100)
    ]
    d = spark.createDataFrame(rows)
    rates = {"pt'; DROP": 1.0, "it's": 0.0}
    out = stratified_sample(
        d, "lang", rates, key_cols=["cast(doc_id as string)"], salt="o'salt"
    ).collect()
    got = {r.doc_id for r in out}
    expect = {
        i for i in range(100)
        if i % 2 == 0
        and py_phash(f"{i}|o'salt") % SAMPLE_DENOM < SAMPLE_DENOM
    }
    assert got == expect  # the quoted stratum keeps all, the other none


def test_pack_sequences_invariants(spark):
    budget = 40
    out = pack_sequences(_docs(spark), budget=budget).collect()
    # python twin: per bucket, id-ordered running sum
    by_bucket: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r.bucket, r.doc_id)):
        by_bucket.setdefault(r.bucket, []).append(r)
    for bucket, rows in by_bucket.items():
        cum = 0
        prev_seq = 0
        for r in rows:
            assert r.seq_id == cum // budget  # start-offset binning
            assert r.seq_id >= prev_seq  # monotone within bucket
            cum += r.n_tokens
            prev_seq = r.seq_id
    # every doc has the regex token count
    d = {r.doc_id: r.n_tokens for r in out}
    assert d[0] == len(re.findall(r"[A-Za-z0-9]+", " ".join(f"w{j}" for j in range(5))))


def test_domain_quota_keeps_topk_per_domain(spark):
    from dish_data_pipeline_spark.ops.sampling import domain_quota

    rows = [
        Row(doc_id=i, text="t", lang="en", source=f"d{i % 3}", n_chars=(i * 7) % 50)
        for i in range(60)
    ]
    d = spark.createDataFrame(rows)
    out = domain_quota(d, "source", 5, order_col="n_chars").collect()
    by_dom: dict[str, list] = {}
    for r in out:
        by_dom.setdefault(r.source, []).append(r)
    assert set(by_dom) == {"d0", "d1", "d2"}
    for dom, kept in by_dom.items():
        assert len(kept) == 5
        assert sorted(r.rank_in_domain for r in kept) == [1, 2, 3, 4, 5]
        # python twin: top-5 by (n_chars desc, doc_id asc)
        truth = sorted(
            (r for r in rows if r.source == dom),
            key=lambda r: (-r.n_chars, r.doc_id),
        )[:5]
        assert sorted(r.doc_id for r in kept) == sorted(r.doc_id for r in truth)


def test_domain_quota_rejects_bad_cap(spark):
    import pytest

    from dish_data_pipeline_spark.ops.sampling import domain_quota

    d = spark.createDataFrame([Row(doc_id=1, source="a", n_chars=1)])
    with pytest.raises(ValueError, match="cap"):
        domain_quota(d, "source", 0, order_col="n_chars")
