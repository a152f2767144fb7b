"""Property tests for the round-5 operators: gap fill, domain quota,
and the bigram LM counts must match pure-Python twins on random
inputs — a third independent implementation beyond the DuckDB
oracles, exercised on shapes the fixed corpus doesn't cover (single
observations, all-one-domain, empty-ish docs)."""

from __future__ import annotations

import collections
import datetime as dt
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from dish_data_pipeline_spark.ops.sampling import domain_quota
from dish_data_pipeline_spark.ops.text import bigram_lm_counts
from dish_data_pipeline_spark.ops.timeseries import gap_fill, resample

SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

STEP = 3600
OBS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),  # hour offset
        st.sampled_from(["a", "b"]),
        st.integers(min_value=-50, max_value=50),
    ),
    min_size=1,
    max_size=25,
)


@SLOW
@given(OBS)
def test_gap_fill_invariants(spark, obs):
    base = dt.datetime(2024, 3, 1)
    rows = [
        Row(ts=base + dt.timedelta(hours=h, minutes=i % 50), k=k, v=float(v))
        for i, (h, k, v) in enumerate(obs)
    ]
    r = resample(spark.createDataFrame(rows), "ts", "k", "v", STEP)
    out = gap_fill(r, "k", STEP).collect()
    by_key: dict[str, list] = {}
    for row in out:
        by_key.setdefault(row.k, []).append(row)
    observed = {(k): sorted(h for h, kk, _ in obs if kk == k) for k in {k for _, k, _ in obs}}
    for k, rows_k in by_key.items():
        rows_k.sort(key=lambda r: r.bucket)
        hours = observed[k]
        # grid is exactly [min, max] with no holes, step-spaced
        assert len(rows_k) == hours[-1] - hours[0] + 1
        buckets = [r.bucket for r in rows_k]
        assert buckets == list(range(buckets[0], buckets[-1] + STEP, STEP))
        # no nulls after the fill; first row is always observed
        assert all(r.value is not None for r in rows_k)
        assert rows_k[0].is_filled is False
        # filled rows carry the previous observed value
        prev = None
        for r in rows_k:
            if r.is_filled:
                assert r.value == prev
            prev = r.value
    assert set(by_key) == set(observed)


@SLOW
@given(
    st.lists(
        st.tuples(st.sampled_from(["d0", "d1", "d2"]), st.integers(0, 99)),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=6),
)
def test_domain_quota_matches_python_twin_and_is_idempotent(spark, docs, cap):
    rows = [
        Row(doc_id=i, source=s, n_chars=n) for i, (s, n) in enumerate(docs)
    ]
    df = spark.createDataFrame(rows)
    out = domain_quota(df, "source", cap, order_col="n_chars").collect()
    by_dom: dict[str, list] = {}
    for r in out:
        by_dom.setdefault(r.source, []).append(r.doc_id)
    for dom in {s for s, _ in docs}:
        truth = [
            r.doc_id
            for r in sorted(
                (r for r in rows if r.source == dom),
                key=lambda r: (-r.n_chars, r.doc_id),
            )[:cap]
        ]
        assert sorted(by_dom.get(dom, [])) == sorted(truth)
    # idempotence: quota of the quota is the quota
    again = domain_quota(
        df.sparkSession.createDataFrame(
            [Row(doc_id=r.doc_id, source=r.source, n_chars=r.n_chars) for r in out]
        ),
        "source",
        cap,
        order_col="n_chars",
    ).collect()
    assert sorted(r.doc_id for r in again) == sorted(r.doc_id for r in out)


@SLOW
@given(
    st.lists(
        st.lists(st.sampled_from(["ab", "cd", "ef"]), min_size=0, max_size=8).map(
            " ".join
        ),
        min_size=1,
        max_size=8,
    )
)
def test_bigram_lm_matches_python_twin(spark, texts):
    rows = [Row(text=t) for t in texts]
    out = bigram_lm_counts(spark.createDataFrame(rows)).collect()
    got = {(r.w1, r.w2): (r.n, r.continuation_w2) for r in out}
    counts: collections.Counter = collections.Counter()
    for t in texts:
        toks = re.findall(r"[A-Za-z0-9]+", t.lower())
        for a, b in zip(toks, toks[1:]):
            counts[(a, b)] += 1
    cont: dict[str, set] = {}
    for (a, b), _ in counts.items():
        cont.setdefault(b, set()).add(a)
    truth = {k: (n, len(cont[k[1]])) for k, n in counts.items()}
    assert got == truth
