"""Unit tests for segment-level dedup, PII redaction, and the KMV
distinct-count sketch. Planted cases with hand-computed
expectations; sf0.01 oracle equivalence is covered by the catalog
gate (tools/check_oracle.py)."""

from __future__ import annotations

from pyspark.sql import Row

from dish_data_pipeline_spark.ops.portable import py_phash
from dish_data_pipeline_spark.ops.segments import segment_dedup
from dish_data_pipeline_spark.ops.sketch import kmv_distinct
from dish_data_pipeline_spark.ops.text import redact_pii


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in rows]
    )


# --- segment_dedup ------------------------------------------------
SEG = "one two three four"  # a full 4-token segment


def test_segment_dedup_keep_first(spark):
    # doc 1 and doc 2 share segment SEG; doc 1 (smaller id) keeps it
    df = _docs(
        spark,
        [
            (1, SEG + " alpha beta gamma delta"),
            (2, SEG + " epsilon zeta eta theta"),
            (3, "totally different words here"),
        ],
    )
    out = {
        r.doc_id: r
        for r in segment_dedup(df, seg_tokens=4, max_docs=1).collect()
    }
    assert out[1].text_deduped == SEG + " alpha beta gamma delta"
    assert out[1].n_segments == 2 and out[1].n_kept == 2
    assert out[2].text_deduped == "epsilon zeta eta theta"
    assert out[2].n_segments == 2 and out[2].n_kept == 1
    assert out[3].text_deduped == "totally different words here"


def test_segment_dedup_empties_exact_copy(spark):
    # doc 9 is an exact copy of doc 1 → every segment stripped,
    # row survives with empty text (quality gate decides, not us)
    df = _docs(spark, [(1, SEG), (9, SEG)])
    out = {r.doc_id: r for r in segment_dedup(df, seg_tokens=4).collect()}
    assert out[1].text_deduped == SEG
    assert out[9].text_deduped == "" and out[9].n_kept == 0
    assert out[9].n_segments == 1


def test_segment_dedup_partial_tail_and_order(spark):
    # 6 tokens at seg_tokens=4 → segments "a b c d" and "e f";
    # reassembly must restore original order
    df = _docs(spark, [(1, "a b c d e f")])
    row = segment_dedup(df, seg_tokens=4).collect()[0]
    assert row.text_deduped == "a b c d e f"
    assert row.n_segments == 2 and row.n_kept == 2


# --- redact_pii ---------------------------------------------------
def test_redact_pii_planted(spark):
    df = _docs(
        spark,
        [
            (1, "mail me at bob.smith+x@corp.example.org today"),
            (2, "server 192.168.1.254 and peer 10.0.0.7"),
            (3, "call +49 170 123456 now"),
            (4, "nothing sensitive here"),
        ],
    )
    out = {r.doc_id: r for r in redact_pii(df).collect()}
    assert out[1].n_emails == 1 and out[1].text_redacted == (
        "mail me at <EMAIL> today"
    )
    assert out[2].n_ips == 2 and out[2].text_redacted == (
        "server <IP> and peer <IP>"
    )
    assert out[3].n_phones == 1 and out[3].text_redacted == (
        "call <PHONE> now"
    )
    r4 = out[4]
    assert (r4.n_emails, r4.n_ips, r4.n_phones) == (0, 0, 0)
    assert r4.text_redacted == "nothing sensitive here"


# --- histogram quantiles ------------------------------------------
def test_histogram_quantiles_accuracy_and_degenerate(spark):
    from dish_data_pipeline_spark.ops.sketch import histogram_quantiles

    rows = [Row(g="u", v=float(i)) for i in range(1000)]  # uniform 0..999
    rows += [Row(g="const", v=7.0)] * 10  # degenerate: min == max
    df = spark.createDataFrame(rows)
    out = {
        (r.g, r.q): r.est
        for r in histogram_quantiles(df, "g", "v", quantiles=(0.5, 0.9)).collect()
    }
    # uniform data: histogram interpolation lands within one bin
    # width (999/128 ≈ 7.8) of the true quantile
    assert abs(out[("u", 0.5)] - 499.5) <= 999 / 128
    assert abs(out[("u", 0.9)] - 899.1) <= 999 / 128
    assert out[("const", 0.5)] == 7.0 and out[("const", 0.9)] == 7.0


# --- token-budgeted mixture sampling ------------------------------
def test_mixture_sample_tokens_budget(spark):
    from dish_data_pipeline_spark.ops.sampling import mixture_sample_tokens

    # "a": 4000 docs × 10 tokens; "b": 40 docs × 10 tokens (scarce)
    rows = [Row(doc_id=i, lang="a", n_tokens=10) for i in range(4000)]
    rows += [Row(doc_id=10_000 + i, lang="b", n_tokens=10) for i in range(40)]
    df = spark.createDataFrame(rows)
    out = mixture_sample_tokens(
        df, "lang", {"a": 0.5, "b": 0.5}, 2000,
        token_col="n_tokens", key_cols=["cast(doc_id as string)"],
    ).collect()
    toks = {}
    for r in out:
        toks[r.lang] = toks.get(r.lang, 0) + r.n_tokens
    # "a" is downsampled toward its 1000-token share (hash sampling
    # ⇒ binomial noise around the target); scarce "b" kept whole
    assert toks["b"] == 400
    assert 600 <= toks["a"] <= 1400
    # deterministic: identical second run
    again = mixture_sample_tokens(
        df, "lang", {"a": 0.5, "b": 0.5}, 2000,
        token_col="n_tokens", key_cols=["cast(doc_id as string)"],
    ).collect()
    assert sorted(r.doc_id for r in again) == sorted(r.doc_id for r in out)


# --- null / empty text contract -----------------------------------
def test_null_text_is_empty_contract(spark):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from dish_data_pipeline_spark.ops.text import with_quality_flags

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    df = spark.createDataFrame(
        [Row(doc_id=1, text=None), Row(doc_id=2, text="")], schema
    )
    q = {r.doc_id: r for r in with_quality_flags(df).collect()}
    # legacy size(null) = -1 must never leak: null ≡ ''
    assert q[1].n_tokens == 0 and q[1].keep == 0
    assert q[2].n_tokens == 0 and q[2].keep == 0
    r = {r.doc_id: r for r in redact_pii(df).collect()}
    assert (r[1].n_emails, r[1].text_redacted) == (0, "")
    seg = {r.doc_id: r for r in segment_dedup(df).collect()}
    assert seg[1].n_segments == 0 and seg[1].text_deduped == ""


# --- kmv_distinct -------------------------------------------------
def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame(
        [Row(g="a", v=f"x{i}") for i in range(10)]
        + [Row(g="a", v="x0")]  # duplicate must not inflate
    )
    row = kmv_distinct(df, "g", "v", k=64).collect()[0]
    assert row.n_distinct == 10
    assert row.est_distinct == 10.0  # below k → exact


def test_kmv_merge_equals_direct(spark):
    # the merged per-partition sketches must give EXACTLY the
    # single-pass estimate (union of bottom-ks ⊇ global bottom-k),
    # including a group that never reaches k (falls back to exact)
    from dish_data_pipeline_spark.ops.sketch import kmv_merge_distinct

    rows = [
        Row(g="big", p=f"p{i % 3}", v=f"val-{i}") for i in range(300)
    ] + [Row(g="small", p="p0", v=f"v{i}") for i in range(5)]
    df = spark.createDataFrame(rows)
    direct = {
        r.g: r.est_distinct
        for r in kmv_distinct(df, "g", "v", k=32).collect()
    }
    merged = {
        r.g: (r.n_partitions, r.est_distinct)
        for r in kmv_merge_distinct(df, "g", "p", "v", k=32).collect()
    }
    assert merged["big"] == (3, direct["big"])
    assert merged["small"] == (1, 5.0) and direct["small"] == 5.0


def test_kmv_estimate_matches_python_twin(spark):
    values = [f"val-{i}" for i in range(500)]
    df = spark.createDataFrame([Row(g="a", v=v) for v in values])
    row = kmv_distinct(df, "g", "v", k=32).collect()[0]
    assert row.n_distinct == 500
    kth = sorted({py_phash(v) for v in values})[31]
    expected = 31.0 * float(1 << 60) / float(kth)
    assert row.est_distinct == expected  # bit-identical arithmetic
    assert abs(row.est_distinct - 500) / 500 < 0.5  # sane accuracy


# --- count-min sketch ---------------------------------------------
def test_cms_never_underestimates_and_exact_when_sparse(spark):
    from dish_data_pipeline_spark.ops.sketch import count_min_freq

    rows = (
        [Row(g="a", v="x")] * 50
        + [Row(g="a", v="y")] * 20
        + [Row(g="a", v=f"noise-{i}") for i in range(200)]
    )
    out = {
        r.value: (r.true_count, r.cms_count)
        for r in count_min_freq(
            spark.createDataFrame(rows), "g", "v", d=4, w=64, k=5
        ).collect()
    }
    assert out["x"][0] == 50 and out["y"][0] == 20
    for true, est in out.values():
        assert est >= true  # CMS only ever overestimates


def test_cms_matches_python_twin(spark):
    """The counter a probe reads is exactly the sum of colliding
    hashes — replicated value-for-value in plain Python."""
    from collections import Counter

    from dish_data_pipeline_spark.ops.portable import (
        perm_coeffs,
        py_perm,
        py_phash,
    )
    from dish_data_pipeline_spark.ops.sketch import count_min_freq

    d, w = 3, 8  # tiny width to force collisions
    values = [f"v{i}" for i in range(40)] + ["hot"] * 25
    coeffs = perm_coeffs(d, 9)
    counters: Counter = Counter()
    for v in values:
        h = py_phash(v)
        for i, (a, b) in enumerate(coeffs):
            counters[(i, py_perm(h, a, b) % w)] += 1
    h_hot = py_phash("hot")
    expected = min(
        counters[(i, py_perm(h_hot, a, b) % w)]
        for i, (a, b) in enumerate(coeffs)
    )
    df = spark.createDataFrame([Row(g="a", v=v) for v in values])
    got = {
        r.value: r.cms_count
        for r in count_min_freq(df, "g", "v", d=d, w=w, k=1, seed=9).collect()
    }
    assert got == {"hot": expected}


def test_segment_dedup_rejects_unknown_impl(spark):
    df = spark.createDataFrame([("d1", "a b c d")], "doc_id string, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown impl"):
        segment_dedup(df, impl="windw")


def test_hll_distinct_matches_python_twin_and_band(spark):
    """HLL registers and the dyadic harmonic sum replicated in pure
    Python must produce the identical estimate (the same contract
    the DuckDB oracle enforces), the estimate must sit inside the
    ~3σ band (σ = 1.04/sqrt(256)), and the result must be invariant
    to partitioning (register MAX is the merge)."""
    import hashlib

    from pyspark.sql import Row

    from dish_data_pipeline_spark.ops.sketch import (
        HLL_P,
        _hll_consts,
        hll_distinct,
    )

    n = 5000
    rows = [Row(g="a", v=f"val-{i}") for i in range(n)]
    df = spark.createDataFrame(rows)
    got = hll_distinct(df, "g", "v").collect()[0]

    m, rest_bits, scale_bits, numerator = _hll_consts(HLL_P)
    regs: dict[int, int] = {}
    for i in range(n):
        h = int(hashlib.md5(f"val-{i}".encode()).hexdigest()[:15], 16)
        idx, rest = divmod(h, 1 << rest_bits)
        rank = scale_bits - rest.bit_length()
        regs[idx] = max(regs.get(idx, 0), rank)
    s = sum(1 << (scale_bits - r) for r in regs.values())
    s += (m - len(regs)) * (1 << scale_bits)
    expect = numerator / float(s)

    assert got.n_distinct == n
    assert got.n_registers == len(regs)
    assert got.est_distinct == expect
    assert abs(expect - n) / n < 3 * 1.04 / (m ** 0.5)

    # partitioning invariance: the sketch merges by register MAX
    got32 = hll_distinct(df.repartition(32), "g", "v").collect()[0]
    assert got32.est_distinct == got.est_distinct
