"""Property test: asof_join matches a pure-Python reference
implementation of backward as-of semantics on random inputs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from dish_data_pipeline_spark.operators.asof import asof_join
from dish_data_pipeline_spark.operators.enrich import with_lineage

LEFT = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 30)), min_size=1, max_size=15
)
RIGHT = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 30), st.integers(0, 99)),
    min_size=0,
    max_size=10,
    unique_by=lambda t: (t[0], t[1]),  # unique (key, ts): deterministic
)

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _python_asof(left, right):
    out = {}
    for i, (k, ts) in enumerate(left):
        best = None
        for rk, rts, px in right:
            if rk == k and rts <= ts and (best is None or rts > best[0]):
                best = (rts, px)
        out[i] = best[1] if best else None
    return out


@given(left=LEFT, right=RIGHT)
@SLOW
def test_asof_matches_python_reference(spark, left, right):
    ldf = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(left)], "idx int, k int, ts int"
    )
    rdf = spark.createDataFrame(right or [(99, -1, 0)], "k int, ts int, px int")
    got = {
        r.idx: r.px_right
        for r in asof_join(ldf, rdf, on="ts", by=["k"]).collect()
    }
    assert got == _python_asof(left, right or [(99, -1, 0)])


def test_asof_null_payload_not_torn(spark):
    """The latest matching right row must arrive WHOLESALE: a NULL
    field in it stays NULL instead of being backfilled from an older
    right row (the round-1 per-column fill tore rows this way)."""
    ldf = spark.createDataFrame([(0, 1, 10)], "idx int, k int, ts int")
    rdf = spark.createDataFrame(
        [(1, 1, 7, 9), (1, 5, None, 5)], "k int, ts int, px int, qx int"
    )
    row = asof_join(ldf, rdf, on="ts", by=["k"]).collect()[0]
    assert row.qx_right == 5
    assert row.px_right is None  # from ts=5 row, NOT 7 from ts=1
    assert row.ts_right == 5


RIGHT_NULLABLE = st.lists(
    st.tuples(
        st.integers(1, 3),
        st.integers(0, 30),
        st.one_of(st.none(), st.integers(0, 99)),
        st.one_of(st.none(), st.integers(0, 99)),
    ),
    min_size=0,
    max_size=10,
    unique_by=lambda t: (t[0], t[1]),
)


@given(left=LEFT, right=RIGHT_NULLABLE)
@SLOW
def test_asof_nullable_payload_matches_python_reference(spark, left, right):
    ldf = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(left)], "idx int, k int, ts int"
    )
    rdf = spark.createDataFrame(
        right or [(99, -1, 0, 0)], "k int, ts int, px int, qx int"
    )
    got = {
        r.idx: (r.px_right, r.qx_right)
        for r in asof_join(ldf, rdf, on="ts", by=["k"]).collect()
    }
    expect = {}
    for i, (k, ts) in enumerate(left):
        best = None
        for rk, rts, px, qx in right or [(99, -1, 0, 0)]:
            if rk == k and rts <= ts and (best is None or rts > best[0]):
                best = (rts, px, qx)
        expect[i] = (best[1], best[2]) if best else (None, None)
    assert got == expect


def test_with_lineage_records_input_file(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.range(3).write.parquet(p)
    df = with_lineage(spark.read.parquet(p))
    files = {r.input_file for r in df.collect()}
    assert files and all(f.endswith(".parquet") and p.lstrip("/") in f for f in files)


# --- forward / nearest / tolerance vs pandas merge_asof -----------
def _pd_asof(left, right, direction, tolerance=None):
    """pandas merge_asof as the reference oracle (sorted inputs)."""
    import pandas as pd

    lf = pd.DataFrame(
        {"k": [t[0] for t in left], "ts": [t[1] for t in left]}
    ).sort_values("ts", kind="mergesort").reset_index()
    rf = (
        pd.DataFrame(
            {
                "k": [t[0] for t in right],
                "ts": [t[1] for t in right],
                "px": [t[2] for t in right],
            }
        )
        .astype({"k": "int64", "ts": "int64", "px": "int64"})
        .sort_values("ts", kind="mergesort")
    )
    kw = {}
    if tolerance is not None:
        kw["tolerance"] = tolerance
    m = pd.merge_asof(
        lf, rf, on="ts", by="k", direction=direction, **kw
    )
    return {
        int(r["index"]): (None if pd.isna(r["px"]) else int(r["px"]))
        for _, r in m.iterrows()
    }


@SLOW
@given(LEFT, RIGHT, st.sampled_from(["backward", "forward", "nearest"]),
       st.sampled_from([None, 0, 3, 10]))
def test_asof_directions_match_pandas(spark, left, right, direction, tol):
    df_l = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(left)], "idx long, k long, ts long"
    )
    df_r = spark.createDataFrame(
        [(k, ts, px) for k, ts, px in right], "k long, ts long, px long"
    )
    got = {
        r.idx: r.px_right
        for r in asof_join(
            df_l, df_r, on="ts", by=["k"], direction=direction, tolerance=tol
        ).collect()
    }
    assert got == _pd_asof(left, right, direction, tol)
