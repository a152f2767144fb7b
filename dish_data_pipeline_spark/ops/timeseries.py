"""Time-series resampling and gap filling (hypertable-rollup-style
operators over the ``events`` stream table).

``resample`` buckets an event stream to a fixed step and aggregates
per (key, bucket); ``gap_fill`` completes each key's bucket grid
between its first and last observation and forward-fills missing
buckets — the downsample + regularize pair every monitoring /
feature-engineering pipeline runs before joining time series.

Determinism contract: buckets are integer epoch seconds via
``floor(seconds) div step * step`` (floor-exact in both engines —
Spark's ``unix_timestamp`` truncates, the DuckDB twin uses
``floor(epoch(ts))``); bucket means use the decimal-exact ``davg``;
the forward fill copies already-identical doubles, so every value is
bit-identical cross-engine.

Scale shape: resample is one map-side bucket projection + one
groupBy (partial aggregation combines per input split before the
exchange). gap_fill derives each key's span from the resampled
relation (tiny), explodes the grid map-side, and both the grid join
and the fill window hash on the same key — AQE plans them into one
exchange chain; nothing touches the raw event volume twice. The
fill window is per-key ordered by bucket: grids are bounded by
(span / step), not by event count, so a hot key costs O(grid), and a
year of hourly buckets is ~9k rows per key — driver-safe and
executor-trivial at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dish_data_pipeline_spark.plans.common import ZSCORE_SCALE, davg


def debounce(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    min_gap_sec: int,
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """Collapse bursts of events per key to the burst's first event —
    sensor/click debouncing. A burst is a chain of events whose
    consecutive gaps are all below ``min_gap_sec`` (sessionize-style
    gap-detection chaining: an unbroken slow drip longer than the
    gap still collapses to one event; re-emitting relative to the
    last KEPT row would need stateful iteration, which is the
    streaming `applyInPandasWithState` tier's job, not a batch
    window's).

    Mechanics: flag rows whose distance to the previous row reaches
    the gap, running-sum the flags into chain ids, keep each chain's
    first row. Two stacked windows + the rank filter on one key
    partitioning — a single exchange. ``tiebreakers`` order
    equal-timestamp rows deterministically; the chain sum uses an
    explicit ROWS frame so duplicate (key, ts) rows without
    tiebreakers still accumulate row-by-row instead of sharing a
    RANGE peer frame (which would diverge from the SQL twin's ROWS
    UNBOUNDED PRECEDING nondeterministically).

    Granularity contract: gaps compare WHOLE-SECOND floors of the
    timestamps (``unix_timestamp`` truncation) — sub-second spacing
    rounds down, matching the streaming twin
    :func:`streaming.stateful.stream_debounce`, which floors
    fractional seconds the same way."""
    if min_gap_sec < 1:
        raise ValueError(f"min_gap_sec must be >= 1, got {min_gap_sec}")
    tb = [F.col(c).asc() for c in (tiebreakers or [])]
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).asc(), *tb)
    w_sum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sec = F.unix_timestamp(F.col(ts_col)).cast("bigint")
    prev = F.lag(sec).over(w)
    new_chain = (prev.isNull() | (sec - prev >= F.lit(min_gap_sec))).cast("bigint")
    grouped = df.withColumn("_chain", F.sum(new_chain).over(w_sum)).withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy(*key_cols, "_chain").orderBy(
                F.col(ts_col).asc(), *tb
            )
        ),
    )
    return grouped.filter(F.col("_rn") == 1).drop("_chain", "_rn")


def rolling_zscore(
    resampled: DataFrame,
    key_col: str,
    bucket_col: str = "bucket",
    value_col: str = "value",
    window_rows: int = 24,
    threshold: float = 3.0,
) -> DataFrame:
    """Flag buckets whose value deviates more than ``threshold``
    standard deviations from the trailing ``window_rows``-bucket
    statistics (the bucket itself excluded) — the streaming-friendly
    anomaly gate monitoring pipelines run over a regularized series
    (compose after :func:`gap_fill`, whose output is exactly
    row-per-step, making the ROWS frame a true time window).

    Determinism contract: the trailing sums of x and x² accumulate
    ``floor(term · ZSCORE_SCALE)`` as exact BIGINTs (the
    floor-quantization device from ``ops.drift`` — floor has no
    rounding ties, unlike a decimal(38,6) cast, which ROUNDS and so
    splits cross-engine on exact half-way doubles: Spark rounds
    HALF_UP, DuckDB half-even). The BIGINT sums are order-exact, the
    mean/variance are a fixed division chain on identical doubles,
    and sqrt is IEEE-correctly-rounded in every engine — so the
    z-score is bit-identical cross-engine by construction. The
    truncation is part of the statistic's definition; its error is
    NOT flat 1e-6: each x² term floors by up to 1/SCALE directly,
    but the variance additionally carries the mean² cross term,
    bounded by ~2·|mean|/SCALE — |value|-proportional, so at the
    |value|≈1e5 edge of the safe domain the variance can be
    distorted by ~0.2 absolute. On large-magnitude, genuinely
    low-variance series that deflates z-scores; center such series
    (subtract a per-key baseline) before scoring, which removes the
    cross term entirely. Buckets with fewer
    than 2 trailing rows or zero variance get NULL z. One window
    exchange on the key (reused from gap_fill's when composed)."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(bucket_col).asc())
        .rowsBetween(-window_rows, -1)
    )
    x = F.col(value_col).cast("double")
    scale = F.lit(float(ZSCORE_SCALE))
    n = F.count(value_col).over(w).cast("double")
    s1 = F.sum(F.floor(x * scale)).over(w).cast("double") / scale
    s2 = F.sum(F.floor(x * x * scale)).over(w).cast("double") / scale
    mean = s1 / n
    var = s2 / n - mean * mean
    z = F.when(
        (n >= 2) & (var > 0), (x - mean) / F.sqrt(var)
    )
    return resampled.select(
        F.col(key_col),
        F.col(bucket_col),
        x.alias(value_col),
        z.alias("zscore"),
        # insufficient history / zero variance → not anomalous (a
        # non-null flag also keeps the boolean column dtype-stable
        # across engines)
        F.coalesce(F.abs(z) > F.lit(threshold), F.lit(False)).alias("is_anomaly"),
    )


def resample(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    step_sec: int,
) -> DataFrame:
    """Downsample to fixed ``step_sec`` buckets per key: (key,
    bucket epoch-sec, decimal-exact mean, count)."""
    if step_sec < 1:
        raise ValueError(f"step_sec must be >= 1, got {step_sec}")
    # unix_timestamp truncates to whole seconds (= floor for the
    # post-epoch timestamps this targets); div is integer floor.
    bucket = F.expr(
        f"(unix_timestamp({ts_col}) div {int(step_sec)}) * {int(step_sec)}"
    ).cast("bigint")
    return (
        df.select(
            F.col(key_col), bucket.alias("bucket"), F.col(value_col).alias("_v")
        )
        .groupBy(key_col, "bucket")
        .agg(
            davg(F.col("_v")).alias("avg_value"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )


def gap_fill(
    resampled: DataFrame,
    key_col: str,
    step_sec: int,
    bucket_col: str = "bucket",
    value_col: str = "avg_value",
) -> DataFrame:
    """Complete each key's bucket grid from its first to its last
    observed bucket and forward-fill ``value_col`` into the holes.

    Output: (key, bucket, value, is_filled) — ``is_filled`` marks
    carried-forward rows. The grid starts at each key's first
    observation, so the fill window never leaves a null behind."""
    if step_sec < 1:
        raise ValueError(f"step_sec must be >= 1, got {step_sec}")
    spans = resampled.groupBy(key_col).agg(
        F.min(bucket_col).alias("_mn"), F.max(bucket_col).alias("_mx")
    )
    grid = spans.select(
        F.col(key_col),
        F.explode(
            F.sequence(F.col("_mn"), F.col("_mx"), F.lit(int(step_sec)))
        ).alias(bucket_col),
    )
    joined = grid.join(
        resampled.select(key_col, bucket_col, value_col),
        [key_col, bucket_col],
        "left",
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(bucket_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col(key_col),
        F.col(bucket_col),
        F.last(F.col(value_col), ignorenulls=True).over(w).alias("value"),
        F.col(value_col).isNull().alias("is_filled"),
    )


def funnel_times(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    steps: list[tuple[str, "F.Column"]],
) -> DataFrame:
    """Per-user chained funnel stage times for an ARBITRARY ordered
    step list: ``steps`` is ``[(name, condition), ...]`` and stage
    k's time is the user's first ``ts`` satisfying condition k
    STRICTLY AFTER stage k-1's time (time-anchored ordering, not
    mere co-occurrence).

    Output: one row per user, ``<name>_ts`` per step (NULL where the
    chain broke). Single-pass plan for any step count: the input is
    exchanged ONCE on the user hash, the per-step conditional window
    minima stack as chained Window nodes on that one partitioning,
    and the per-user collapse reuses the same hash — 1 scan +
    2 exchanges total, independent of ``len(steps)``."""
    if not steps:
        raise ValueError("steps must be non-empty")
    w = Window.partitionBy(user_col)
    out = df
    prev: str | None = None
    names: list[str] = []
    for name, cond in steps:
        col = f"{name}_ts"
        if col in names or col in df.columns:
            raise ValueError(f"duplicate or clashing step column {col}")
        qual = cond if prev is None else cond & (F.col(ts_col) > F.col(prev))
        out = out.withColumn(col, F.min(F.when(qual, F.col(ts_col))).over(w))
        prev = col
        names.append(col)
    return out.groupBy(user_col).agg(
        *[F.max(c).alias(c) for c in names]
    )


def funnel_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    steps: list[tuple[str, "F.Column"]],
) -> DataFrame:
    """One-row funnel: per step, the number of users whose chain
    reached it (monotonically non-increasing down the list). Columns
    are ``n_<name>`` in step order. Same single-pass plan as
    :func:`funnel_times` plus one final scalar reduce."""
    per_user = funnel_times(df, user_col, ts_col, steps)
    return per_user.agg(
        *[F.count(f"{name}_ts").alias(f"n_{name}") for name, _ in steps]
    )


def sessionize(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    gap_sec: int,
    tiebreakers: list[str] | None = None,
    extra_aggs: dict[str, "F.Column"] | None = None,
) -> DataFrame:
    """Gap-based sessionization: group each key's events into
    sessions separated by silences of at least ``gap_sec`` whole
    seconds, and emit one row per session — ``session_seq`` (1-based
    per key, in time order), ``session_start`` / ``session_end``,
    ``n_events``, whole-second ``duration_sec``, plus any
    ``extra_aggs`` (name → aggregate Column over the session's
    rows, e.g. a value sum).

    Same gap-chain device as :func:`debounce` (lag + flag +
    running-sum on ONE key partitioning, explicit ROWS frame,
    whole-second granularity contract), then a (key, chain) groupBy.
    The window's key exchange does the heavy lifting; the groupBy's
    partial aggregation collapses each session map-side, so the
    second exchange carries only session-count-bounded partials —
    at 100 TB that is the per-key session count, not the event
    volume."""
    if gap_sec < 1:
        raise ValueError(f"gap_sec must be >= 1, got {gap_sec}")
    reserved = {"session_seq", "session_start", "session_end", "n_events",
                "duration_sec", *key_cols}
    clash = reserved & set(extra_aggs or {})
    if clash:
        raise ValueError(f"extra_aggs clash with output columns: {sorted(clash)}")
    tb = [F.col(c).asc() for c in (tiebreakers or [])]
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).asc(), *tb)
    w_sum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sec = F.unix_timestamp(F.col(ts_col)).cast("bigint")
    prev = F.lag(sec).over(w)
    new_chain = (prev.isNull() | (sec - prev >= F.lit(gap_sec))).cast("bigint")
    chained = df.withColumn("_chain", F.sum(new_chain).over(w_sum))
    extras = [col.alias(name) for name, col in (extra_aggs or {}).items()]
    return (
        chained.groupBy(*key_cols, "_chain")
        .agg(
            F.min(F.col(ts_col)).alias("session_start"),
            F.max(F.col(ts_col)).alias("session_end"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            (F.max(sec) - F.min(sec)).cast("bigint").alias("duration_sec"),
            *extras,
        )
        .withColumnRenamed("_chain", "session_seq")
    )


def rolling_robust_zscore(
    resampled: DataFrame,
    key_col: str,
    bucket_col: str = "bucket",
    value_col: str = "value",
    window_rows: int = 24,
    threshold: float = 3.0,
) -> DataFrame:
    """Robust companion to :func:`rolling_zscore`: flag buckets
    deviating more than ``threshold`` MADs from the trailing-window
    MEDIAN (bucket itself excluded). Median/MAD ignore outliers in
    the window itself, so a burst of spikes cannot inflate the scale
    estimate and mask the next spike — the masking failure
    mean/stddev gates are known for.

    Determinism contract — simpler than the quantized-sum device,
    because order statistics need no accumulation at all: the
    trailing values ride a window ``collect_list`` (non-null only,
    matching the batch NULL convention), ``array_sort`` makes the
    order canonical, the median is pure element SELECTION (even
    windows: one IEEE add + halving of the two middle elements),
    deviations are single subtractions, and the MAD is another
    selection. Identical doubles → identical medians in any engine;
    no rounding device required. Compose after :func:`gap_fill` like
    ``rolling_zscore`` so the ROWS frame is a true time window and
    values are non-null.

    Fewer than 2 trailing values or zero MAD → NULL score, flag
    false. Output: (key, bucket, value, robust_z, is_anomaly). One
    window exchange on the key, shared with the chain it composes
    with."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(bucket_col).asc())
        .rowsBetween(-window_rows, -1)
    )
    x = F.col(value_col).cast("double")

    def _median(arr: str) -> str:
        # element selection on the sorted array; even length averages
        # the two middle elements (one add + one halving, portable).
        # Empty guard first: element_at index 0 throws in Spark.
        return (
            f"CASE WHEN size({arr}) = 0 THEN CAST(NULL AS DOUBLE) "
            f"WHEN size({arr}) % 2 = 1 "
            f"THEN element_at({arr}, CAST((size({arr}) + 1) div 2 AS INT)) "
            f"ELSE (element_at({arr}, CAST(size({arr}) div 2 AS INT)) "
            f"  + element_at({arr}, CAST(size({arr}) div 2 + 1 AS INT))) "
            f"/ 2.0 END"
        )

    trail = F.expr("array_sort(_trail_raw)")
    out = (
        resampled.withColumn(
            "_trail_raw", F.collect_list(x).over(w)
        )
        .withColumn("_trail", trail)
        .withColumn("_med", F.expr(_median("_trail")))
        .withColumn(
            "_devs",
            F.expr("array_sort(transform(_trail, u -> abs(u - _med)))"),
        )
        .withColumn("_mad", F.expr(_median("_devs")))
    )
    rz = F.when(
        (F.size("_trail") >= 2) & (F.col("_mad") > 0),
        (x - F.col("_med")) / F.col("_mad"),
    )
    return out.select(
        F.col(key_col),
        F.col(bucket_col),
        x.alias(value_col),
        rz.alias("robust_z"),
        F.coalesce(F.abs(rz) > F.lit(threshold), F.lit(False)).alias(
            "is_anomaly"
        ),
    )


#: EWMA value quantization: qv = floor(value · EWMA_QUANT) BIGINT.
EWMA_QUANT = 1000


def ewma(
    resampled: DataFrame,
    key_col: str,
    bucket_col: str = "bucket",
    value_col: str = "value",
    window_rows: int = 16,
) -> DataFrame:
    """Exponentially weighted moving average (α = 1/2), truncated to
    the trailing ``window_rows`` rows — trend smoothing that reacts
    to level shifts faster than a flat rolling mean. Output adds an
    ``ewma DOUBLE`` column.

    Determinism contract (the reason this EWMA is oracle-exact where
    float recurrences cannot be): values quantize to
    ``floor(v · EWMA_QUANT)`` BIGINTs, and the weighted numerator is
    the INTEGER fold ``Σ qv[i] · 2^i`` over the frame-ordered window
    array (0-based ``i``, newest row receiving the largest weight
    ``2^(m-1)``) with denominator ``(2^m − 1) · EWMA_QUANT`` — both
    exact BIGINTs in any evaluation order, so the single final IEEE
    division is bit-identical cross-engine. Dividing numerator and
    denominator by ``2^(m-1)`` recovers the textbook truncated
    α = 1/2 weights; the scaling cancels. Overflow bound:
    ``max|qv| · 2^window_rows`` must stay below 2^63 —
    ``window_rows`` ≤ 40 enforced, safe for |value| ≤ 10⁶ at the
    default quantization.

    NULL-valued rows are dropped BEFORE windowing (they neither
    weight nor occupy a frame slot) — chosen because Spark's
    ``collect_list`` and DuckDB's ``list()`` disagree on NULL
    handling inside window frames; pre-filtering makes both engines
    see identical arrays. Compose after :func:`resample` /
    :func:`gap_fill`, whose outputs are non-null.

    Scale shape: one window exchange on the key (shared with any
    adjacent per-key window), map-side array fold, no driver state.
    """
    if not 1 <= window_rows <= 40:
        raise ValueError(
            f"window_rows must be in [1, 40] (BIGINT overflow bound), "
            f"got {window_rows}"
        )
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(bucket_col).asc())
        .rowsBetween(-(window_rows - 1), 0)
    )
    qv = F.floor(
        F.col(value_col).cast("double") * F.lit(float(EWMA_QUANT))
    ).cast("bigint")
    out = (
        resampled.filter(F.col(value_col).isNotNull())
        .withColumn("_arr", F.collect_list(qv).over(w))
        .withColumn(
            "_num",
            F.expr(
                "aggregate("
                "  zip_with(_arr, sequence(0, size(_arr) - 1),"
                "           (v, i) -> named_struct('v', v, 'i', i)),"
                "  cast(0 as bigint),"
                "  (acc, s) -> acc + s.v * shiftleft(cast(1 as bigint), s.i))"
            ),
        )
        .withColumn(
            "_den",
            F.expr("shiftleft(cast(1 as bigint), size(_arr)) - 1"),
        )
    )
    return out.withColumn(
        "ewma",
        F.col("_num").cast("double")
        / (F.col("_den") * F.lit(EWMA_QUANT)).cast("double"),
    ).drop("_arr", "_num", "_den")
