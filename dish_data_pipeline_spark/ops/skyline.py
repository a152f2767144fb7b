"""2D Pareto frontier (skyline) — the "best tradeoff" query.

Returns the rows not *strictly dominated* on two criteria (minimize
``x``, maximize ``y`` after optional sign flips): a row is dominated
when some other row is at least as good on both axes and strictly
better on one. The classic driver is supplier/part selection
("cheapest at every size class"), and in a training-data pipeline
the quality-vs-cost frontier over candidate corpora.

Naive dominance is an O(n²) self-join — a non-starter at scale. The
2D structure collapses it to sorting: group to one ``(x, max(y))``
candidate per distinct x, then a single ascending-x scan keeps the
candidates whose y strictly exceeds the running maximum of every
smaller x. This module distributes that scan as a two-phase prefix
maximum:

1. ``groupBy(x)`` → the candidate table (one shuffle, map-side
   combined; |distinct x| rows, already ≪ input).
2. ``repartitionByRange(x)`` so partition p holds an x-interval
   strictly below partition p+1; a per-partition window computes the
   intra-partition running max in parallel.
3. Per-partition maxima (ONE row per partition — bounded model
   state, like the k-means centroid collect) come back to the
   driver; the exclusive prefix over them is broadcast back as a
   join on partition id, closing the cross-partition carry.

No single-partition window anywhere, so the frontier of a 100 TB
input is sort-bounded: two shuffles of the distinct-x table plus a
P-row driver exchange. The final semi-join rehydrates every input
row sitting exactly on the frontier (ties included: rows equal on
both axes never strictly dominate each other).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    minimize_x: bool = True,
    maximize_y: bool = True,
    partitions: int | None = None,
    broadcast_frontier: bool = True,
) -> DataFrame:
    """All rows of ``df`` on the (x, y) Pareto frontier.

    Rows with NULL in either criterion are excluded (NULL never
    dominates and cannot sit on a frontier ordered by comparisons).
    Duplicate frontier points all survive. Output columns = input
    columns.

    The final rehydration semi-join broadcasts the frontier by
    default — a 2D skyline of real tradeoff data is tiny (measured:
    AQE leaves this join as a full-table SortMergeJoin otherwise),
    and broadcasting removes the only input-sized shuffle in the
    plan. Pass ``broadcast_frontier=False`` for adversarial
    (anti-correlated) inputs whose frontier approaches the distinct-x
    count.
    """
    sx = F.col(x_col) if minimize_x else -F.col(x_col)
    sy = F.col(y_col) if maximize_y else -F.col(y_col)
    pts = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    cand = (
        pts.select(sx.alias("_sx"), sy.alias("_sy"))
        .groupBy("_sx")
        .agg(F.max("_sy").alias("_ymax"))
    )
    n_part = partitions or cand.sparkSession.sparkContext.defaultParallelism
    ranged = cand.repartitionByRange(n_part, F.col("_sx")).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy("_sx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    from dish_data_pipeline_spark.cache_registry import tracked_persist

    # consumed twice (P-row partition-max collect + frontier filter)
    # — persist so the candidate reduction and window run once, not
    # two full passes over the base table
    local = tracked_persist(ranged.withColumn("_prev", F.max("_ymax").over(w)))
    # one row per range partition — bounded by the partition count,
    # never by data size (same device as the k-means centroid
    # collect); the exclusive prefix closes the cross-partition carry
    pmax = {
        r["_pid"]: r["mx"]
        for r in local.groupBy("_pid").agg(F.max("_ymax").alias("mx")).collect()
    }
    spark = df.sparkSession
    prefix_rows, best = [], None
    for pid in sorted(pmax):
        if best is not None:
            prefix_rows.append((pid, best))
        best = pmax[pid] if best is None else max(best, pmax[pid])
    if prefix_rows:
        from pyspark.sql.types import StructField, StructType

        carry_schema = StructType(
            [
                StructField("_pid", local.schema["_pid"].dataType),
                StructField("_carry", local.schema["_ymax"].dataType),
            ]
        )
        carry = spark.createDataFrame(prefix_rows, carry_schema)
        local = local.join(F.broadcast(carry), "_pid", "left").withColumn(
            "_prev", F.greatest("_prev", "_carry")
        )
    frontier = local.filter(
        F.col("_prev").isNull() | (F.col("_ymax") > F.col("_prev"))
    ).select("_sx", "_ymax")
    if broadcast_frontier:
        frontier = F.broadcast(frontier)
    return pts.join(
        frontier,
        (sx == F.col("_sx")) & (sy == F.col("_ymax")),
        "left_semi",
    )
