"""Deduplication operators (SURVEY.md §2.6, §2.8).

Three variants with distinct semantics:

- ``dedup_keyed`` — arbitrary row per key (reference D1/D2,
  pandas ``drop_duplicates``; reference pipeline/data_pipeline.py:84-85,
  253-258). Cheapest: map-side partial aggregation, one shuffle.
- ``dedup_first_wins`` — deterministic "first occurrence" given an
  explicit total order. pandas keeps first-in-input-order; Spark has
  no stable input order after a shuffle, so determinism requires an
  ordering column (SURVEY.md §7.4.2).
- ``keep_latest`` — the reference's W1 pattern: ``ROW_NUMBER() OVER
  (PARTITION BY keys ORDER BY ts DESC) = 1`` (reference
  pipeline/data_pipeline.py:181-187).

Scale notes: all three shuffle once on the key columns. For skewed
keys AQE skew handling applies to the window variants because they
hash-partition by key; ``dedup_keyed`` additionally benefits from
partial (map-side) aggregation. At 100 TB prefer ``dedup_keyed``
when any-row semantics suffice — it is the only one that combines
before the shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_keyed(df: DataFrame, keys: Sequence[str] | None = None) -> DataFrame:
    """Keep one arbitrary row per key (full-row dedup when keys is
    None) — reference D1/D2 semantics."""
    return df.dropDuplicates(list(keys)) if keys else df.dropDuplicates()


def _rank_filter(
    df: DataFrame, keys: Sequence[str], order: Sequence, rank_col: str = "row_num"
) -> DataFrame:
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) == 1)
        .drop(rank_col)
    )


def dedup_first_wins(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[str]
) -> DataFrame:
    """Deterministic first-wins dedup: keep the row that sorts FIRST
    by ``order_by`` (ascending) within each key group."""
    return _rank_filter(df, keys, [F.col(c).asc() for c in order_by])


def keep_latest(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Keep-latest dedup (reference W1, pipeline/data_pipeline.py:181-187):
    row_number over (partition by keys, order by ts desc) = 1.

    ``tiebreakers`` (descending) make the result total-ordered and
    therefore deterministic — required for oracle hash-matching and
    for reproducible pipelines (SURVEY.md §7.4.2).
    """
    order = [F.desc(ts_col)] + [F.desc(t) for t in tiebreakers]
    return _rank_filter(df, keys, order)
