"""Privacy-preserving release operators: k-anonymity suppression and
l-diversity measurement over generalized quasi-identifiers.

A training-data pipeline that exports user-adjacent tables (events,
customers, session logs) needs a release gate: rows whose
quasi-identifier combination is rare enough to re-identify someone
must not ship. The standard contract (Sweeney, "k-Anonymity: A Model
for Protecting Privacy", IJUFKS 2002) is: after GENERALIZING the
quasi-identifiers (bucketing balances, truncating zips — the
caller's projection), every released row must share its exact
quasi-tuple with at least ``k - 1`` others; cohorts smaller than
``k`` are SUPPRESSED. l-diversity (Machanavajjhala et al., ICDE
2006) strengthens it: a cohort whose sensitive attribute is
near-constant leaks that attribute even at size >= k, so each cohort
must carry at least ``l`` distinct sensitive values.

Scale shape: one hash shuffle on the quasi-identifier columns —
a window count (no join, no second scan). NULL quasi-values form
their own cohort, matching SQL ``GROUP BY`` semantics, so the
suppression decision is identical to the DuckDB oracle's ``HAVING``.

No counterpart in the reference (its pipeline ships raw GA rows,
reference pipeline/data_pipeline.py:91-152); this is charter
extension surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def k_anonymize(df: DataFrame, quasi: Sequence[str], k: int) -> DataFrame:
    """Suppress every row whose exact quasi-identifier tuple occurs
    fewer than ``k`` times. Input columns pass through unchanged —
    generalize (bucket/truncate) BEFORE calling, since k-anonymity
    is only as strong as the generalization it counts over."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not quasi:
        raise ValueError("at least one quasi-identifier column required")
    w = Window.partitionBy(*quasi)
    return (
        df.withColumn("_cohort_n", F.count(F.lit(1)).over(w))
        .filter(F.col("_cohort_n") >= k)
        .drop("_cohort_n")
    )


def l_diversity(
    df: DataFrame, quasi: Sequence[str], sensitive: str
) -> DataFrame:
    """Per-cohort diversity report: cohort quasi-values, size, and
    the number of DISTINCT sensitive values (``l``). A release gate
    keeps cohorts with ``l >= threshold``; a cohort with l = 1
    reveals its members' sensitive value exactly."""
    if not quasi:
        raise ValueError("at least one quasi-identifier column required")
    return df.groupBy(*quasi).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(sensitive).alias("l_div"),
    )


def mondrian_anonymize(
    df: DataFrame,
    dims: Sequence[str],
    rounds: int = 3,
    k: int = 2,
) -> DataFrame:
    """Mondrian multidimensional k-anonymity (LeFevre et al., ICDE
    2006) — GENERALIZATION, where :func:`k_anonymize` only
    suppresses: the integer quasi-identifier space is recursively
    median-split (round-robin over ``dims``, the classic k-d
    discipline), producing axis-aligned cells; each cell released as
    its per-dimension [min, max] ranges plus its population, cells
    below ``k`` suppressed. Rare records thus survive inside WIDER
    ranges instead of being dropped.

    Median = the ceil(n/2)-th smallest value (nearest-rank, a value
    from the data — deterministic for any tie order, and expressible
    identically in any SQL engine, unlike interpolating medians);
    rows equal to the median go left, so a split can be degenerate
    (all rows one side) but never loses rows.

    Scale shape: per-round medians come from
    :func:`ops.selection.exact_quantile` (iterative histogram
    narrowing — state bounded by cells × bins, NO global sort: a
    per-cell window would move round 1's entire table through one
    partition, Spark warns exactly this), then the ≤ 2^rounds cut
    points broadcast back onto the data; one final groupBy.
    ``dims`` must be integer-valued (quantize money to cents first);
    NULLs in any dim are excluded up front — a NULL has no place on
    a k-d axis (release them through :func:`k_anonymize` instead)."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    if not dims:
        raise ValueError("at least one dimension required")
    cur = df
    for d in dims:
        cur = cur.filter(F.col(d).isNotNull())
    from dish_data_pipeline_spark.cache_registry import tracked_persist
    from dish_data_pipeline_spark.ops.selection import exact_quantile

    cur = cur.withColumn("_cell", F.lit(0))
    for r in range(rounds):
        d = dims[r % len(dims)]
        # persisted: exact_quantile's narrowing rounds and the split
        # join below both re-read this round's relation
        cur = tracked_persist(cur)
        med = exact_quantile(cur, d, 0.5, group_cols=["_cell"]).select(
            "_cell", F.col("q").alias("_med")
        )
        cur = (
            cur.join(F.broadcast(med), "_cell")
            .withColumn(
                "_cell",
                F.col("_cell") * 2
                + (F.col(d) > F.col("_med")).cast("int"),
            )
            .drop("_med")
        )
    agg = [F.count(F.lit(1)).alias("n")]
    for d in dims:
        agg.extend(
            [F.min(d).alias(f"{d}_lo"), F.max(d).alias(f"{d}_hi")]
        )
    return (
        cur.groupBy("_cell")
        .agg(*agg)
        .filter(F.col("n") >= k)
        .select(
            F.col("_cell").alias("cell"),
            *[c for d in dims for c in (f"{d}_lo", f"{d}_hi")],
            "n",
        )
    )
