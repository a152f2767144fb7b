"""Time-series resample/gap-fill and corpus-drift semantics."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from dish_data_pipeline_spark.ops.drift import token_divergence
from dish_data_pipeline_spark.ops.timeseries import gap_fill, resample


def _events(spark):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    # key "a": observations in hours 0, 1, 4 (holes at 2, 3)
    for h, vals in [(0, [2.0, 4.0]), (1, [6.0]), (4, [10.0])]:
        for i, v in enumerate(vals):
            rows.append(
                Row(ts=base + dt.timedelta(hours=h, minutes=i), k="a", v=v)
            )
    # key "b": single hour — no holes
    rows.append(Row(ts=base + dt.timedelta(hours=2), k="b", v=1.0))
    return spark.createDataFrame(rows)


def test_resample_buckets_and_means(spark):
    out = resample(_events(spark), "ts", "k", "v", 3600).collect()
    got = {(r.k, r.bucket): (r.avg_value, r.n_obs) for r in out}
    epoch = int(dt.datetime(2024, 1, 1).replace(tzinfo=dt.timezone.utc).timestamp())
    assert got[("a", epoch)] == (3.0, 2)
    assert got[("a", epoch + 3600)] == (6.0, 1)
    assert got[("a", epoch + 4 * 3600)] == (10.0, 1)
    assert got[("b", epoch + 2 * 3600)] == (1.0, 1)


def test_gap_fill_completes_and_forward_fills(spark):
    r = resample(_events(spark), "ts", "k", "v", 3600)
    out = gap_fill(r, "k", 3600).collect()
    a = sorted((r for r in out if r.k == "a"), key=lambda r: r.bucket)
    # grid spans hours 0..4 inclusive — 5 buckets, holes filled
    assert len(a) == 5
    assert [r.value for r in a] == [3.0, 6.0, 6.0, 6.0, 10.0]
    assert [r.is_filled for r in a] == [False, False, True, True, False]
    b = [r for r in out if r.k == "b"]
    assert len(b) == 1 and b[0].value == 1.0 and not b[0].is_filled


def test_resample_and_gap_fill_validate_step(spark):
    d = _events(spark)
    with pytest.raises(ValueError, match="step_sec"):
        resample(d, "ts", "k", "v", 0)
    with pytest.raises(ValueError, match="step_sec"):
        gap_fill(d, "k", 0)


def test_token_divergence_identical_groups_near_zero(spark):
    """Two groups with the same token distribution diverge ~0; a
    group with disjoint vocabulary diverges strongly."""
    rows = (
        [Row(src="x", text="alpha beta gamma") for _ in range(10)]
        + [Row(src="y", text="alpha beta gamma") for _ in range(10)]
        + [Row(src="z", text="zeta zeta eta") for _ in range(10)]
    )
    out = {
        r.src: r
        for r in token_divergence(
            spark.createDataFrame(rows), "src", "text"
        ).collect()
    }
    assert out["x"].n_tokens == 30 and out["x"].n_distinct == 3
    # x and y match each other but not the corpus (z skews it), yet
    # they must be symmetric with each other
    assert abs(out["x"].chi2 - out["y"].chi2) < 1e-9
    assert out["z"].chi2 > out["x"].chi2
    # a group equal to the full corpus distribution has chi2 ~ 0
    uni = [Row(src=s, text="one two three") for s in ("p", "q") for _ in range(5)]
    o2 = {
        r.src: r.chi2
        for r in token_divergence(spark.createDataFrame(uni), "src", "text").collect()
    }
    assert all(abs(v) < 1e-6 for v in o2.values())


def test_debounce_collapses_chained_bursts(spark):
    from dish_data_pipeline_spark.ops.timeseries import debounce

    base = dt.datetime(2024, 1, 1)
    secs = [0, 2, 4, 30, 31, 100]  # chains at gap 10: {0,2,4}, {30,31}, {100}
    rows = [
        Row(event_id=i, k="u", ts=base + dt.timedelta(seconds=s))
        for i, s in enumerate(secs)
    ]
    out = debounce(
        spark.createDataFrame(rows), "ts", ["k"], 10, tiebreakers=["event_id"]
    ).collect()
    kept = sorted(r.event_id for r in out)
    assert kept == [0, 3, 5]
    # slow drip: consecutive gaps below threshold chain together even
    # past the gap from the chain head (sessionize-style semantics)
    drip = [Row(event_id=i, k="u", ts=base + dt.timedelta(seconds=i * 5))
            for i in range(6)]
    out2 = debounce(
        spark.createDataFrame(drip), "ts", ["k"], 10, tiebreakers=["event_id"]
    ).collect()
    assert [r.event_id for r in out2] == [0]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="min_gap_sec"):
        debounce(spark.createDataFrame(drip), "ts", ["k"], 0)


def test_rolling_zscore_known_values(spark):
    import math

    from dish_data_pipeline_spark.ops.timeseries import rolling_zscore

    rows = [Row(k="a", bucket=i, value=float(v))
            for i, v in enumerate([10.0, 10.0, 10.0, 16.0])]
    out = {r.bucket: r for r in rolling_zscore(
        spark.createDataFrame(rows), "k", window_rows=3, threshold=2.0
    ).collect()}
    # first bucket: no history -> null z, flag false
    assert out[0].zscore is None and out[0].is_anomaly is False
    # second: n=1 < 2 -> null
    assert out[1].zscore is None
    # third: trailing values equal -> zero variance -> null
    assert out[2].zscore is None
    # fourth: trailing {10,10,10} has zero variance -> still null
    assert out[3].zscore is None
    # a genuinely varying series: z = (x - mean) / std over trailing 3
    vals = [1.0, 2.0, 3.0, 10.0]
    rows2 = [Row(k="a", bucket=i, value=v) for i, v in enumerate(vals)]
    out2 = {r.bucket: r for r in rolling_zscore(
        spark.createDataFrame(rows2), "k", window_rows=3, threshold=2.0
    ).collect()}
    mean = 2.0
    var = (1 + 4 + 9) / 3 - mean * mean
    expect = (10.0 - mean) / math.sqrt(var)
    assert abs(out2[3].zscore - expect) < 1e-12
    assert out2[3].is_anomaly is True


def test_ewma_hand_computed_series(spark):
    from dish_data_pipeline_spark.ops.timeseries import ewma

    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 2.0), ("a", 3, 4.0)],
        "k string, bucket int, value double",
    )
    got = {r.bucket: r.ewma for r in ewma(df, "k", window_rows=8).collect()}
    # qv = 1000, 2000, 4000; folds: [1000]/1; [1000+2*2000]/3;
    # [1000 + 2*2000 + 4*4000]/7 — denominators (2^m - 1) * 1000
    assert got[1] == 1000 / (1 * 1000)
    assert got[2] == 5000 / (3 * 1000)
    assert got[3] == 21000 / (7 * 1000)


def test_ewma_window_truncates(spark):
    from dish_data_pipeline_spark.ops.timeseries import ewma

    df = spark.createDataFrame(
        [("a", i, 1.0 * i) for i in range(1, 6)],
        "k string, bucket int, value double",
    )
    got = {r.bucket: r.ewma for r in ewma(df, "k", window_rows=2).collect()}
    # bucket 5: frame [4.0, 5.0] → (4000 + 2*5000) / (3 * 1000)
    assert got[5] == 14000 / 3000


def test_ewma_nulls_dropped_not_slotted(spark):
    from dish_data_pipeline_spark.ops.timeseries import ewma

    df = spark.createDataFrame(
        [("a", 1, 2.0), ("a", 2, None), ("a", 3, 6.0)],
        "k string, bucket int, value double",
    )
    rows = ewma(df, "k", window_rows=2).collect()
    got = {r.bucket: r.ewma for r in rows}
    assert 2 not in got
    # bucket 3's frame is [2.0, 6.0] — the NULL neither weights nor
    # occupies a slot
    assert got[3] == (2000 + 2 * 6000) / (3 * 1000)


def test_ewma_rejects_overflowable_window(spark):
    import pytest as _pytest

    from dish_data_pipeline_spark.ops.timeseries import ewma

    df = spark.createDataFrame([("a", 1, 1.0)], "k string, bucket int, value double")
    with _pytest.raises(ValueError, match="window_rows"):
        ewma(df, "k", window_rows=41)
