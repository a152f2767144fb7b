"""Data-contract validation: declarative table-level constraints
evaluated as aggregates, returning a per-rule violations report.

The dbt-tests / Great-Expectations shape: a pipeline consuming an
upstream table declares what it relies on — key uniqueness, required
columns, enumerated domains, referential integrity — and the engine
answers with violation COUNTS (a report to gate on), not a crash in
some downstream join three stages later. Complements
``operators/quality.py`` (the reference's own row-count/null/dup
gates, reference pipeline/data_pipeline.py:120-152) with the
cross-table and domain rules the reference never had.

Scale shape, per rule class:
- ``not_null`` + ``accepted``: ONE shared aggregation pass over the
  table (conditional sums, map-side combined — adding a rule adds a
  column, not a scan).
- ``unique``: one hash shuffle per key set (sum of per-key
  ``count-1`` — NULL key tuples group together, matching SQL
  ``GROUP BY``; duplicates among NULLs are violations too, which
  ``COUNT(DISTINCT ...)``-based spellings silently miss).
- ``fk``: one left-anti join per reference (dim side broadcast when
  small); NULL foreign keys are not violations (SQL FK semantics —
  declare ``not_null`` separately to forbid them).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def contract_report(
    df: DataFrame,
    unique: Sequence[Sequence[str]] = (),
    not_null: Sequence[str] = (),
    accepted: Mapping[str, Sequence] | None = None,
    fks: Sequence[tuple[str, DataFrame, str]] = (),
) -> DataFrame:
    """Evaluate every declared rule; one output row per rule:
    ``(rule string, n_violations bigint, passed boolean)``.

    ``unique``: key-column sets that must be row-unique.
    ``not_null``: columns that must never be NULL.
    ``accepted``: column → allowed values (NULLs exempt).
    ``fks``: (fk_col, dim_df, dim_col) referential checks."""
    spark = df.sparkSession
    reports: list[DataFrame] = []

    scalar_aggs = []
    labels = []
    for c in not_null:
        scalar_aggs.append(
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"_r{len(labels)}")
        )
        labels.append(f"not_null({c})")
    for c, vals in (accepted or {}).items():
        lits = [F.lit(v) for v in vals]
        scalar_aggs.append(
            F.count(
                F.when(F.col(c).isNotNull() & ~F.col(c).isin(*lits), 1)
            ).alias(f"_r{len(labels)}")
        )
        labels.append(
            f"accepted_values({c} in "
            f"[{', '.join(str(v) for v in vals)}])"
        )
    if scalar_aggs:
        row = df.agg(*scalar_aggs)
        pairs = [
            F.struct(
                F.lit(lbl).alias("rule"),
                F.col(f"_r{i}").cast("bigint").alias("n_violations"),
            )
            for i, lbl in enumerate(labels)
        ]
        reports.append(
            row.select(F.explode(F.array(*pairs)).alias("s")).select(
                "s.rule", "s.n_violations"
            )
        )

    for keys in unique:
        key_list = list(keys)
        dup = (
            df.groupBy(*key_list)
            .agg((F.count(F.lit(1)) - F.lit(1)).alias("_extra"))
            .agg(
                F.coalesce(F.sum("_extra"), F.lit(0))
                .cast("bigint")
                .alias("n_violations")
            )
            .select(
                F.lit(f"unique({', '.join(key_list)})").alias("rule"),
                "n_violations",
            )
        )
        reports.append(dup)

    for fk_col, dim, dim_col in fks:
        orphans = (
            df.filter(F.col(fk_col).isNotNull())
            .select(F.col(fk_col).alias("_fk"))
            .join(
                dim.select(F.col(dim_col).alias("_fk")).distinct(),
                ["_fk"],
                "left_anti",
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
            .select(
                F.lit(f"fk({fk_col} -> {dim_col})").alias("rule"),
                "n_violations",
            )
        )
        reports.append(orphans)

    if not reports:
        raise ValueError("no rules declared")
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.select(
        "rule",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )
