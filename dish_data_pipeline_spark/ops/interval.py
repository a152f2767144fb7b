"""Interval overlap analytics — max concurrency via a distributed
sweep line.

"How many intervals are open at once?" (peak concurrent sessions,
simultaneous jobs, overlapping spans) is the classic sweep-line
statistic: explode every interval ``[start, end)`` into a ``+1``
delta at ``start`` and a ``-1`` at ``end``, sort by time, and the
running sum *after* each delta is the instantaneous concurrency; its
maximum is the answer.

The naive distributed spelling — one window ordered by time — is a
single-partition sort (or, partitioned by a low-cardinality group
column, a handful of giant tasks). This module distributes the scan
with the same two-phase range-partitioned prefix device as
``ops.skyline``:

1. ``repartitionByRange(group…, t, d)`` so partition p holds a
   key-interval strictly below partition p+1 (a partition may
   straddle group boundaries — phase 2 windows re-partition by
   ``(pid, group…)``, so the straddle is harmless).
2. A per-``(pid, group…)`` window computes the intra-partition
   running sum in parallel.
3. Per-``(pid, group…)`` delta TOTALS — bounded by
   ``partitions + |groups|`` rows because each group occupies a
   contiguous pid range — come back to the driver; the exclusive
   prefix per group is broadcast back as a carry join, closing the
   cross-partition sum.

End-before-start tie convention: deltas at equal time order ``-1``
before ``+1`` (ascending ``d``), i.e. intervals are half-open — an
interval ending at *t* never overlaps one starting at *t*. Within a
tie group all deltas share a sign, so the running maximum is
invariant to the engine's arbitrary order among equal keys (the
running values inside such a group form the same set under any
permutation) — this is what makes the statistic exactly
reproducible in a single-node SQL oracle.

Reference scope: the reference pipeline has no interval analytics;
this is a §2.13 extension operator for the training-data tier
(peak-load profiling of event/session tables).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    by_cols: Sequence[str] = (),
    grid_seconds: int | None = None,
) -> DataFrame:
    """Point-in-interval INNER join (``start <= t < end``, plus
    equality on ``by_cols``) as an EQUI-join — the scale-safe
    spelling of a range join.

    A naive range join plans as BroadcastNestedLoopJoin (quadratic,
    a 100 TB non-starter). The standard fix is grid banding: pick a
    grid no finer than the longest interval, replicate each interval
    onto every grid cell it touches (≤ 2 cells when the grid bound
    holds), band each point to its one cell, equi-join on
    ``(by_cols…, cell)``, and re-check the exact range predicate on
    the (small) candidate pairs. One shuffle per side on the
    composite key; replication ≤ ceil(duration/grid) + 1 per
    interval.

    ``grid_seconds`` defaults to the observed max interval duration
    (one tiny aggregate). Output: all ``points`` columns + all
    ``intervals`` columns (caller disambiguates names beforehand).
    NULL endpoints/timestamps never match (range predicate is
    NULL-rejecting), mirroring SQL join semantics.
    """
    by_cols = list(by_cols)
    if grid_seconds is None:
        row = intervals.agg(
            F.max(
                F.unix_timestamp(F.col(end_col))
                - F.unix_timestamp(F.col(start_col))
            ).alias("g")
        ).collect()[0]
        grid_seconds = max(1, int(row["g"] or 1))
    g = int(grid_seconds)
    iv = intervals.withColumn(
        "_cell",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / g),
                F.floor(F.unix_timestamp(F.col(end_col)) / g),
            )
        ),
    )
    pt = points.withColumn(
        "_cell", F.floor(F.unix_timestamp(F.col(point_ts)) / g)
    )
    joined = pt.join(iv, ["_cell", *by_cols]).filter(
        (F.col(start_col) <= F.col(point_ts))
        & (F.col(point_ts) < F.col(end_col))
    )
    return joined.drop("_cell")


def max_concurrency(
    df: DataFrame,
    start_col: str,
    end_col: str,
    group_cols: Sequence[str] = (),
    partitions: int | None = None,
) -> DataFrame:
    """Peak number of simultaneously-open ``[start, end)`` intervals,
    per group.

    Returns one row per group: ``(*group_cols, n_intervals
    BIGINT, max_concurrent BIGINT)``. Rows with a NULL start or end
    are excluded (an unbounded interval has no sweep events); rows
    with ``end <= start`` contribute ``n_intervals`` but can never
    raise concurrency (their -1 sorts at-or-before their +1).

    With no ``group_cols`` the result is a single global row
    (``n_intervals``, ``max_concurrent``).

    Scale shape: two shuffles of the 2n delta table (the range
    repartition and the per-group final max) plus a
    ``partitions + |groups|``-row driver exchange — no
    single-partition window regardless of how few groups there are.
    """
    group_cols = list(group_cols)
    pts = df.filter(
        F.col(start_col).isNotNull() & F.col(end_col).isNotNull()
    )
    starts = pts.select(
        *group_cols,
        F.col(start_col).alias("_t"),
        F.lit(1).cast("bigint").alias("_d"),
    )
    ends = pts.select(
        *group_cols,
        F.col(end_col).alias("_t"),
        F.lit(-1).cast("bigint").alias("_d"),
    )
    deltas = starts.unionByName(ends)
    spark = df.sparkSession
    n_part = partitions or spark.sparkContext.defaultParallelism
    ranged = deltas.repartitionByRange(
        n_part, *[F.col(c) for c in group_cols], F.col("_t"), F.col("_d")
    ).withColumn("_pid", F.spark_partition_id())
    w = (
        Window.partitionBy("_pid", *group_cols)
        .orderBy("_t", "_d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    from dish_data_pipeline_spark.cache_registry import tracked_persist

    # consumed twice (per-(pid,group) totals collect + carry join) —
    # persist so the union + range shuffle + window run once
    local = tracked_persist(ranged.withColumn("_run", F.sum("_d").over(w)))
    totals = (
        local.groupBy("_pid", *group_cols)
        .agg(F.sum("_d").alias("_tot"))
        .collect()
    )
    # exclusive prefix of partition totals, per group, in pid order —
    # bounded by partitions + |groups| rows, never by data size
    by_group: dict[tuple, list] = {}
    for r in totals:
        by_group.setdefault(tuple(r[c] for c in group_cols), []).append(r)
    carry_rows = []
    for key, rows in by_group.items():
        acc = 0
        for r in sorted(rows, key=lambda r: r["_pid"]):
            if acc != 0:
                carry_rows.append((r["_pid"], *key, acc))
            acc += r["_tot"]
    run = local
    if carry_rows:
        from pyspark.sql.types import LongType, StructField, StructType

        carry_schema = StructType(
            [StructField("_pid", local.schema["_pid"].dataType)]
            + [StructField(c, local.schema[c].dataType) for c in group_cols]
            + [StructField("_carry", LongType())]
        )
        carry = spark.createDataFrame(carry_rows, carry_schema)
        run = local.join(
            F.broadcast(carry), ["_pid", *group_cols], "left"
        ).withColumn(
            "_run", F.col("_run") + F.coalesce(F.col("_carry"), F.lit(0))
        )
    agg = run.groupBy(*group_cols).agg(
        (F.count(F.lit(1)) / 2).cast("bigint").alias("n_intervals"),
        F.max("_run").alias("max_concurrent"),
    )
    return agg
