"""Property-based tests (SURVEY.md §5.2 item 4): dedup idempotence,
upsert re-delivery convergence, DQ verdict monotonicity."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from dish_data_pipeline_spark.operators.dedup import dedup_first_wins, keep_latest
from dish_data_pipeline_spark.operators.quality import run_data_quality_checks
from dish_data_pipeline_spark.operators.upsert import upsert

KEYS = st.sampled_from(["a", "b", "c"])
ROWS = st.lists(
    st.tuples(KEYS, st.integers(0, 50), st.integers(-5, 5)),
    min_size=0,
    max_size=25,
)

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(rows or [("_", -1, 0)], "k string, seq int, v int")


@given(rows=ROWS)
@SLOW
def test_keep_latest_idempotent(spark, rows):
    df = _df(spark, rows)
    once = keep_latest(df, ["k"], "seq", tiebreakers=["v"])
    twice = keep_latest(once, ["k"], "seq", tiebreakers=["v"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


@given(rows=ROWS)
@SLOW
def test_first_wins_equals_python_min(spark, rows):
    df = _df(spark, rows)
    got = {
        r.k: (r.seq, r.v)
        for r in dedup_first_wins(df, ["k"], ["seq", "v"]).collect()
    }
    want = {}
    for k, seq, v in rows or [("_", -1, 0)]:
        if k not in want or (seq, v) < want[k]:
            want[k] = (seq, v)
    assert got == want


@given(rows=ROWS, staged=ROWS)
@SLOW
def test_upsert_redelivery_converges(spark, rows, staged):
    tgt = _df(spark, rows).dropDuplicates(["k"])
    stg = _df(spark, staged).dropDuplicates(["k"])
    once = upsert(tgt, stg, ["k"])
    twice = upsert(once, stg, ["k"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    # staging rows always win; non-staged target rows retained
    out = {r.k for r in once.collect()}
    assert out == {r.k for r in tgt.collect()} | {r.k for r in stg.collect()}


@given(rows=st.lists(st.tuples(KEYS, st.integers(0, 9)), min_size=6, max_size=20))
@SLOW
def test_dq_verdict_monotone_under_duplicate_removal(spark, rows):
    """If the only issue is duplicates, dedup must clear the verdict
    (the recoverable path terminates)."""
    pol = {"t": {"required": ["k"], "keys": ["k"]}}
    df = spark.createDataFrame(rows, "k string, v int")
    ok, issues = run_data_quality_checks(df, "t", pol)
    if not ok and all("duplicate" in i.lower() for i in issues):
        deduped = df.dropDuplicates(["k"])
        if deduped.count() >= 5:
            ok2, issues2 = run_data_quality_checks(deduped, "t", pol)
            assert ok2, issues2
