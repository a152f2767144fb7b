"""As-of (time-travel) join — an operator Spark lacks natively.

``asof_join(left, right, on, by)``: for every left row, attach the
payload of the latest right row with ``right.on <= left.on`` within
the same ``by`` key group (direction="backward", the merge_asof
default).

Spark-first implementation (no pandas, no per-group loops): union
both sides tagged, one window sort per key with
``last(payload_struct, ignorenulls=True)`` carrying the most recent
right ROW forward — the payload travels as ONE struct so every
output column comes from the SAME right row (a per-column fill
would backfill a NULL field from an older row, diverging from
merge_asof's take-the-row-wholesale semantics). Cost = ONE shuffle
on ``by`` plus an in-partition sort — the same class as a
sort-merge join, and it scales to arbitrarily large both sides (no
broadcast needed, no all-pairs). The alternative (``applyInPandas``
+ ``pd.merge_asof`` per key) moves data through Python; use it only
when per-group pandas logic is genuinely required.

Determinism: if multiple right rows share (by, on) the LAST one in
the (on, tag) sort order wins; pass unique (by, on) right sides for
fully deterministic output (callers can keep_latest first).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "_asof_is_left"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of left join. Right payload columns (everything
    except ``by``) arrive suffixed; the right's own ``on`` value
    arrives as ``<on><suffix>``."""
    by = list(by)
    payload_src = [c for c in right.columns if c not in by]
    payload = [f"{c}{suffix}" for c in payload_src]

    # The right payload travels as ONE struct: non-null for every
    # right row (even when all its fields are null), null for left
    # rows — so last(ignorenulls) picks the latest right row
    # WHOLESALE and never mixes fields across right rows.
    r_tagged = right.select(
        *by,
        F.col(on).alias("_asof_on"),
        F.struct(
            *[F.col(c).alias(f"{c}{suffix}") for c in payload_src]
        ).alias("_asof_p"),
        F.lit(0).alias(_TAG),
    )
    left_only = [c for c in left.columns if c not in by]
    for c in left_only:
        r_tagged = r_tagged.withColumn(c, F.lit(None))
    p_type = r_tagged.schema["_asof_p"].dataType
    l_tagged = (
        left.withColumn(_TAG, F.lit(1))
        .withColumn("_asof_on", F.col(on))
        .withColumn("_asof_p", F.lit(None).cast(p_type))
    )

    unioned = l_tagged.select(
        *by, "_asof_on", _TAG, *left_only, "_asof_p"
    ).unionByName(r_tagged.select(*by, "_asof_on", _TAG, *left_only, "_asof_p"))

    # right rows (tag 0) sort before left rows at equal timestamps →
    # a right row at exactly left.on is visible (<= semantics).
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("_asof_on").asc(), F.col(_TAG).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *by,
        _TAG,
        *left_only,
        F.last("_asof_p", ignorenulls=True).over(w).alias("_asof_p"),
    )
    return (
        carried.filter(F.col(_TAG) == 1)
        .select(
            *by,
            *left_only,
            *[F.col(f"_asof_p.{c}").alias(c) for c in payload],
        )
    )
