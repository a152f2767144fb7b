"""As-of (time-travel) join — an operator Spark lacks natively.

``asof_join(left, right, on, by)``: for every left row, attach the
payload of one right row within the same ``by`` key group, chosen by
``direction`` (pandas ``merge_asof`` semantics):

- ``backward`` (default): latest right row with ``right.on <=
  left.on``;
- ``forward``: earliest right row with ``right.on >= left.on``;
- ``nearest``: whichever of the two is closer in ``on``; ties take
  the backward row (pandas' rule).

``tolerance`` drops a match whose distance exceeds it — the payload
comes back null, like merge_asof. Units: the ``on`` column's own
units for numeric columns; SECONDS when ``on`` is a
date/timestamp/timestamp_ntz column (distances are computed on epoch
seconds as doubles, so sub-second timestamps compare at full
precision).

Spark-first implementation (no pandas, no per-group loops): union
both sides tagged, one shuffle on ``by``, and carry the right
payload across the in-partition sort — ``last(payload,
ignorenulls=True)`` over the preceding frame for backward,
``first(...)`` over the following frame for forward. The payload
travels as ONE struct so every output column comes from the SAME
right row (a per-column fill would backfill a NULL field from an
older row, diverging from merge_asof's take-the-row-wholesale
semantics). Cost = ONE shuffle plus in-partition sorts — the same
class as a sort-merge join, scaling to arbitrarily large both sides
(no broadcast, no all-pairs). The alternative (``applyInPandas`` +
``pd.merge_asof`` per key) moves data through Python; use it only
when per-group pandas logic is genuinely required.

Determinism: if multiple right rows share (by, on), backward takes
the LAST in sort order and forward the FIRST; pass unique (by, on)
right sides for fully deterministic output (callers can keep_latest
first).
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
    direction: str = "backward",
    tolerance: float | int | None = None,
) -> DataFrame:
    """As-of left join (see module docstring). Right payload columns
    (everything except ``by``) arrive suffixed; the right's own
    ``on`` value arrives as ``<on><suffix>``."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    by = list(by)
    payload_src = [c for c in right.columns if c not in by]
    payload = [f"{c}{suffix}" for c in payload_src]

    # The right payload travels as ONE struct: non-null for every
    # right row (even when all its fields are null), null for left
    # rows — so the ignorenulls carries pick the nearest right row
    # WHOLESALE and never mix fields across right rows.
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

    carried_cols = []
    if direction in ("backward", "nearest"):
        # right rows (tag 0) sort before left rows at equal on → a
        # right row at exactly left.on is inside the preceding frame
        # (<= semantics)
        w_back = (
            Window.partitionBy(*by)
            .orderBy(F.col("_asof_on").asc(), F.col(_TAG).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried_cols.append(
            F.last("_asof_p", ignorenulls=True).over(w_back).alias("_p_back")
        )
    if direction in ("forward", "nearest"):
        # tag DESC puts right rows at equal on AFTER left rows → an
        # exact match is inside the following frame (>= semantics).
        # Same partitioning as the backward window: one shuffle, a
        # second in-partition sort only.
        w_fwd = (
            Window.partitionBy(*by)
            .orderBy(F.col("_asof_on").asc(), F.col(_TAG).desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carried_cols.append(
            F.first("_asof_p", ignorenulls=True).over(w_fwd).alias("_p_fwd")
        )

    carried = unioned.select(
        *by, _TAG, F.col("_asof_on"), *left_only, *carried_cols
    ).filter(F.col(_TAG) == 1)

    on_field = f"{on}{suffix}"

    # Distance operands: temporal `on` columns become epoch-second
    # doubles (timestamp - timestamp is an INTERVAL, which doesn't
    # compare against a numeric tolerance and TIMESTAMP_NTZ doesn't
    # cast to double directly — route NTZ/date through a timestamp
    # cast first; the session tz is pinned UTC so the detour is
    # lossless). Numeric columns pass through untouched.
    from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

    _on_temporal = isinstance(
        left.schema[on].dataType, (DateType, TimestampType, TimestampNTZType)
    )

    def _dist_operand(c: F.Column) -> F.Column:
        return c.cast("timestamp").cast("double") if _on_temporal else c

    def _within(p):
        if tolerance is None:
            return p
        delta = F.abs(
            _dist_operand(F.col("_asof_on")) - _dist_operand(p[on_field])
        )
        return F.when(delta <= F.lit(tolerance), p)

    if direction == "backward":
        chosen = _within(F.col("_p_back"))
    elif direction == "forward":
        chosen = _within(F.col("_p_fwd"))
    else:
        back = _within(F.col("_p_back"))
        fwd = _within(F.col("_p_fwd"))
        d_back = _dist_operand(F.col("_asof_on")) - _dist_operand(back[on_field])
        d_fwd = _dist_operand(fwd[on_field]) - _dist_operand(F.col("_asof_on"))
        chosen = (
            F.when(back.isNull(), fwd)
            .when(fwd.isNull(), back)
            # ties take the backward row (pandas merge_asof rule)
            .when(d_back <= d_fwd, back)
            .otherwise(fwd)
        )

    return carried.select(
        *by,
        *left_only,
        *[chosen[c].alias(c) for c in payload],
    )
