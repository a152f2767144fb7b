"""Bucketed-table support: co-located joins without a shuffle.

At 100 TB the dominant cost of a fact-fact join is shuffling both
sides. Writing both tables bucketed (and sorted) on the join key
lets Spark's planner skip the Exchange entirely — each bucket pair
joins locally. This module wraps ``bucketBy``/``sortBy`` writes
(which require ``saveAsTable`` — bucket metadata lives in the
catalog) and a verification helper that asserts the shuffle really
disappeared.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    buckets: int = 8,
    sort: bool = True,
) -> None:
    """Save ``df`` as a bucketed (+sorted) managed parquet table."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, *keys)
    )
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, keys: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys. The merge
    hint forces sort-merge (bucketing is a no-op under broadcast);
    with matching bucket counts the physical plan then has no shuffle
    Exchange on either side (verify with ``count_shuffles``)."""
    return (
        spark.table(left_table)
        .hint("merge")
        .join(spark.table(right_table).hint("merge"), list(keys), how)
    )


def count_shuffles(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan
    (BroadcastExchange excluded) — the metric bucketing drives to
    zero. Structural node-name counting (plans/plan_text.py), so
    ReusedExchange/AQE-stage reprints never inflate it."""
    from dish_data_pipeline_spark.plans.plan_text import count_shuffles as _cs

    return _cs(df._jdf.queryExecution().executedPlan().toString())
