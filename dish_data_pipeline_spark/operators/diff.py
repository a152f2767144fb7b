"""Keyed snapshot diff: reconcile two versions of a table.

Answers "what changed between yesterday's load and today's" — the
reconciliation/CDC-extraction step a MERGE-based pipeline (reference
pipeline/data_pipeline.py:155-216) needs when auditing what its
upserts actually did, and the generic table-compare every migration
runs.

Output is row-level: the key columns, a ``change_type`` in
{insert, delete, update, unchanged}, and the old/new value columns
(``old_<c>`` / ``new_<c>``), so downstream can both count per type
and replay the delta.

Scale shape: one full-outer equi-join on the keys (the single
unavoidable shuffle — both sides hash-partition on the same key, and
AQE broadcasts a small side automatically); presence detection uses
injected literal markers rather than key-null checks, so NULLs in
key columns never masquerade as missing rows; value comparison is
null-safe ``<=>`` per column, all map-side after the join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    include_unchanged: bool = True,
) -> DataFrame:
    """Full-outer keyed diff of ``old`` vs ``new``.

    ``compare_cols`` defaults to every shared non-key column; columns
    present in only one snapshot are ignored for change detection
    (pair with ``upsert_evolve`` semantics: additive evolution is not
    an UPDATE of existing rows).

    ``include_unchanged=False`` drops the unchanged majority BEFORE
    the output is materialized — at 100 TB the reconciliation
    consumer almost always wants only the delta, and the filter sits
    directly on the join output so nothing downstream ever writes or
    shuffles the unchanged rows (pair with :func:`diff_summary` for
    the per-type counts the full output would have provided)."""
    missing = [k for k in keys if k not in old.columns or k not in new.columns]
    if missing:
        raise ValueError(f"keys absent from old or new: {missing}")
    if compare_cols is None:
        shared = set(old.columns) & set(new.columns)
        compare_cols = [c for c in new.columns if c in shared and c not in keys]
    o = old.select(
        *keys,
        F.lit(1).alias("_in_old"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *keys,
        F.lit(1).alias("_in_new"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    j = o.join(n, list(keys), "full_outer")
    differs = F.lit(False)
    for c in compare_cols:
        differs = differs | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(differs, F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        *keys,
        change.alias("change_type"),
        *[F.col(f"old_{c}") for c in compare_cols],
        *[F.col(f"new_{c}") for c in compare_cols],
    )
    if not include_unchanged:
        out = out.filter(F.col("change_type") != "unchanged")
    return out


def diff_summary(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Per-``change_type`` row counts of the keyed diff — the
    reconciliation health check ("today's load inserted X, updated
    Y, deleted Z, left W alone") without materializing the wide
    old/new columns. Same single full-outer join as
    :func:`snapshot_diff`; the classification collapses straight
    into a 4-row-bounded aggregate with map-side combine, so the
    unchanged majority is never carried past the join."""
    classified = snapshot_diff(old, new, keys, compare_cols)
    return classified.groupBy("change_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
