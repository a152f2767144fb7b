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

from dish_data_pipeline_spark.plans.common import davg


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
