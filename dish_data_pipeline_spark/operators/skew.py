"""Skew-mitigation operators for hot keys at 100 TB.

AQE's skew-join splitting (enabled in session.py) handles most
cases at runtime; these are the explicit fallbacks for when the
planner can't help:

- ``salted_join``: large-side rows get a deterministic salt
  (xxhash64 of a unique column), the small side is exploded across
  all salt values, and the join key becomes (key, salt) — a hot key
  now spreads over ``buckets`` reducers. Result is row-identical to
  the plain join for inner/left/semi/anti joins (other join types
  are rejected: an unmatched exploded small-side row would be
  emitted once per salt under right/full outer).
- ``salted_agg``: two-phase decomposable aggregation — partial
  aggregate on (key, salt), final on key. The hot key's rows combine
  in ``buckets`` parallel partial groups first.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    salt_col: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with large-side salting. ``salt_col`` is any
    large-side column (ideally unique) used to derive a
    deterministic salt; the small side replicates ``buckets``×.

    ``how`` must keep the large side on the preserved side:
    inner/left/left_semi/left_anti. Right/full outer would emit each
    unmatched small-side row once per salt replica — rejected."""
    # 'semi'/'anti' are Spark's own aliases for left_semi/left_anti —
    # equally safe here (the large side is the preserved side).
    allowed = {"inner", "left", "leftouter", "leftsemi", "leftanti", "semi", "anti"}
    if how.lower().replace("_", "") not in allowed:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got {how!r}: "
            "right/full outer joins would duplicate unmatched small-side rows "
            "across salt replicas"
        )
    salted_large = large.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(buckets))
    )
    salted_small = small.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(buckets)])),
    )
    out = salted_large.join(salted_small, [*keys, "_salt"], how)
    return out.drop("_salt")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    salt_col: str,
    sums: Sequence[str] = (),
    buckets: int = 16,
) -> DataFrame:
    """Two-phase count+sum aggregation over skewed keys. Returns one
    row per key with ``n`` and ``sum_<col>`` columns (sums use the
    exact decimal contract so results are order-independent)."""
    partial = (
        df.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(buckets)))
        .groupBy(*keys, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            *[
                F.sum(F.col(c).cast("decimal(38,6)")).alias(f"_s_{c}")
                for c in sums
            ],
        )
    )
    final_aggs: list[Column] = [F.sum("_n").alias("n")]
    for c in sums:
        final_aggs.append(F.sum(f"_s_{c}").cast("double").alias(f"sum_{c}"))
    return partial.groupBy(*keys).agg(*final_aggs)
