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


def apply_changes(
    target: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    value_cols: Sequence[str],
) -> DataFrame:
    """Apply a :func:`snapshot_diff` delta onto ``target`` — the CDC
    consumer side: replicate a table by shipping only the delta and
    reconstructing the new snapshot at the destination.
    ``delta`` carries ``change_type`` + ``new_<c>`` columns for
    ``value_cols``; inserts and updates land with their new values,
    deletes disappear, untouched rows pass through by anti-join.

    Round-trip contract: ``apply_changes(old, snapshot_diff(old,
    new, ...), ...)`` equals ``new`` exactly (row-identical — values
    are carried, never recomputed), which the ``cdc_apply_orders``
    oracle certifies by comparing against the new snapshot built
    directly. Scale shape: one anti-join of target against the
    (small) delta's keys plus a union — the delta side broadcasts
    under AQE; cost is O(|target| scan + |delta|), no wide shuffle
    of untouched data."""
    ct = F.col("change_type")
    touched = delta.select(*keys)
    upserts = delta.filter(ct.isin("insert", "update")).select(
        *keys, *[F.col(f"new_{c}").alias(c) for c in value_cols]
    )
    kept = target.select(*keys, *value_cols).join(
        touched, list(keys), "left_anti"
    )
    return kept.unionByName(upserts)


# Exact decimal accumulation makes the maintained sums
# order-independent AND algebraically invertible: +x then -x returns
# the accumulator to exactly its prior value, which IEEE doubles do
# not guarantee. decimal(38,6) matches plans.common.dsum.
_DEC = "decimal(38,6)"


def grouped_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    measures: Sequence[str],
) -> DataFrame:
    """Materialize the *maintainable* grouped-aggregate shape:
    ``group_cols`` + ``n_rows`` (BIGINT) + ``sum_<m>``
    (DECIMAL(38,6)) per measure. This is the state
    :func:`incremental_agg_update` consumes and re-emits, so a
    materialized aggregate can be rolled forward version after
    version without ever rescanning the base table. COUNT and SUM
    are the self-maintainable aggregates (AVG = sum/count derives
    at read time); MIN/MAX are deliberately absent — a delete can
    invalidate them without a base rescan."""
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        *[F.sum(F.col(m).cast(_DEC)).alias(f"sum_{m}") for m in measures],
    )


def incremental_agg_update(
    agg_old: DataFrame,
    delta: DataFrame,
    group_cols: Sequence[str],
    measures: Sequence[str],
) -> DataFrame:
    """Roll a materialized grouped aggregate forward from a change
    feed — incremental view maintenance, the 100 TB alternative to
    recomputing a summary over the full base table on every commit.

    ``agg_old`` is :func:`grouped_agg` output over the previous
    snapshot; ``delta`` is :func:`snapshot_diff` output (or
    ``io_backends.ManifestParquetBackend.changes``) whose
    ``compare_cols`` covered BOTH ``group_cols`` and ``measures``.
    Each delta row becomes signed contributions: deletes and updates
    retract ``(-1, -old values)`` from the OLD row's group, inserts
    and updates add ``(+1, +new values)`` to the NEW row's group —
    so an update that moves a row between groups maintains both
    groups correctly, and an in-place update nets to a pure sum
    adjustment. Groups whose count reaches zero drop out; groups
    born in the delta appear via the full-outer join.

    Exactness: contributions accumulate in DECIMAL(38,6), so the
    rolled-forward state equals ``grouped_agg`` recomputed on the
    new snapshot bit-for-bit (the ``incremental_agg_orders`` catalog
    oracle asserts exactly this equivalence).

    Scale shape: the delta (small by construction) aggregates to at
    most its own group count, then one join against the aggregate
    table — both sides orders of magnitude smaller than the base
    table, and AQE broadcasts the delta side when it fits. Cost is
    O(|delta| + |groups|), independent of base-table size. The delta
    is persisted here because BOTH signed branches consume it — when
    it arrives as a lazy ``snapshot_diff`` plan, the expensive diff
    join would otherwise execute twice (Spark reuses exchanges, not
    arbitrary shared subtrees across a Union)."""
    from dish_data_pipeline_spark.cache_registry import tracked_persist

    delta = tracked_persist(delta)
    ct = F.col("change_type")
    retract = delta.filter(ct.isin("delete", "update")).select(
        *[F.col(f"old_{g}").alias(g) for g in group_cols],
        F.lit(-1).cast("bigint").alias("_dn"),
        *[
            (-F.col(f"old_{m}").cast(_DEC)).alias(f"_d_{m}")
            for m in measures
        ],
    )
    apply_ = delta.filter(ct.isin("insert", "update")).select(
        *[F.col(f"new_{g}").alias(g) for g in group_cols],
        F.lit(1).cast("bigint").alias("_dn"),
        *[F.col(f"new_{m}").cast(_DEC).alias(f"_d_{m}") for m in measures],
    )
    adj = (
        retract.unionByName(apply_)
        .groupBy(*group_cols)
        .agg(
            F.sum("_dn").alias("_dn"),
            *[F.sum(f"_d_{m}").alias(f"_d_{m}") for m in measures],
        )
    )
    # null-safe join keys: a NULL group value is a real group for
    # groupBy, and a plain equi-join would orphan its adjustments
    a = agg_old.alias("a")
    d = adj.alias("d")
    cond = F.lit(True)
    for g in group_cols:
        cond = cond & F.col(f"a.{g}").eqNullSafe(F.col(f"d.{g}"))
    joined = a.join(d, cond, "full_outer")
    zero = F.lit(0).cast(_DEC)
    return joined.select(
        *[
            F.coalesce(F.col(f"a.{g}"), F.col(f"d.{g}")).alias(g)
            for g in group_cols
        ],
        (
            F.coalesce(F.col("a.n_rows"), F.lit(0))
            + F.coalesce(F.col("d._dn"), F.lit(0))
        ).cast("bigint").alias("n_rows"),
        *[
            (
                F.coalesce(F.col(f"a.sum_{m}"), zero)
                + F.coalesce(F.col(f"d._d_{m}"), zero)
            ).cast(_DEC).alias(f"sum_{m}")
            for m in measures
        ],
    ).filter(F.col("n_rows") > 0)


def incremental_join_update(
    view_old: DataFrame,
    fact_delta: DataFrame,
    dim_delta: DataFrame,
    fact_new: DataFrame,
    dim_new: DataFrame,
    fact_key: str,
    join_key: str,
    fact_cols: Sequence[str],
    dim_cols: Sequence[str],
) -> DataFrame:
    """Roll a materialized fact-dim INNER-join view forward from
    BOTH sides' change feeds — join-view incremental maintenance,
    the companion to :func:`incremental_agg_update` for the other
    self-maintainable view shape. View schema: ``fact_key`` +
    ``join_key`` + ``fact_cols`` (from the fact side, unique per
    ``fact_key``) + ``dim_cols`` (from the dim side, unique per
    ``join_key``).

    The delta algebra (classic ΔV = ΔA⋈B ∪ A⋈ΔB, specialized to
    key-unique sides):

    - fact-touched rows (any ``fact_delta`` key) leave the view and,
      for inserts/updates, REBUILD from the delta's ``new_*`` values
      joined against the new dim;
    - dim deletes kill every surviving fan-out row (inner-join
      semantics);
    - dim updates PATCH surviving rows' dim columns in place;
    - dim inserts can REVIVE fact rows that previously dangled
      (their dim key did not exist) — the one term that must probe
      the new fact table, scoped to the inserted dim keys.

    Scale shape: the big inputs (``view_old``, ``fact_new``) are
    each scanned once and never shuffled — every join here is
    against a delta-bounded or dim-sized side (broadcast under AQE);
    deltas are persisted because multiple branches consume them.
    Cost is O(|view| + |fact| map-side + |Δ| joins), independent of
    re-joining the full fact×dim.

    Contract (certified by the ``incremental_join_orders`` oracle):
    the rolled-forward view row-equals ``fact_new ⋈ dim_new``
    recomputed from scratch."""
    from dish_data_pipeline_spark.cache_registry import tracked_persist

    fact_delta = tracked_persist(fact_delta)
    dim_delta = tracked_persist(dim_delta)
    ct = F.col("change_type")
    view_cols = [fact_key, join_key, *fact_cols, *dim_cols]

    touched = fact_delta.select(fact_key)
    dim_deleted = dim_delta.filter(ct == "delete").select(join_key)
    dim_patch = dim_delta.filter(ct == "update").select(
        join_key,
        F.lit(1).alias("_patched"),
        *[F.col(f"new_{c}").alias(f"_new_{c}") for c in dim_cols],
    )
    survivors = (
        view_old.join(F.broadcast(touched), [fact_key], "left_anti")
        .join(F.broadcast(dim_deleted), [join_key], "left_anti")
        .join(F.broadcast(dim_patch), [join_key], "left")
        .select(
            fact_key,
            join_key,
            *fact_cols,
            *[
                F.when(
                    F.col("_patched").isNotNull(), F.col(f"_new_{c}")
                )
                .otherwise(F.col(c))
                .alias(c)
                for c in dim_cols
            ],
        )
    )
    dim_new_slim = dim_new.select(join_key, *dim_cols)
    rebuilt = (
        fact_delta.filter(ct.isin("insert", "update"))
        .select(
            fact_key,
            F.col(f"new_{join_key}").alias(join_key),
            *[F.col(f"new_{c}").alias(c) for c in fact_cols],
        )
        .join(dim_new_slim, [join_key], "inner")
        .select(*view_cols)
    )
    dim_inserted = dim_delta.filter(ct == "insert").select(join_key)
    revived = (
        fact_new.select(fact_key, join_key, *fact_cols)
        .join(F.broadcast(dim_inserted), [join_key], "inner")
        .join(F.broadcast(touched), [fact_key], "left_anti")
        .join(dim_new_slim, [join_key], "inner")
        .select(*view_cols)
    )
    return survivors.unionByName(rebuilt).unionByName(revived)
