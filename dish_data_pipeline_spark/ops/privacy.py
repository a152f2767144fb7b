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
