"""Distributed exact selection (k-th smallest / exact quantile,
optionally weighted) without a global sort.

``percentile()`` needs a total order (single-partition sort at
scale) and ``approx_percentile`` is, by design, approximate AND
accumulation-path-dependent — neither gives a 100 TB-safe EXACT
median. Selection doesn't need sorting: the classic distributed
answer is iterative histogram narrowing (the same idea as
BigQuery/Teradata quantile pushdown):

1. One aggregation pass bins every in-range value into B equal-width
   bins per group → a ``|groups| × B`` count/weight table (map-side
   combined, driver-bounded).
2. The driver walks each group's histogram to the bin containing the
   target rank (a WEIGHT rank when a weight column is given),
   subtracts the mass below it, and narrows ``[lo, hi]`` to that
   bin.
3. Repeat. Each round divides the candidate range by B; when the
   in-range candidate ROW count is small, one final filtered collect
   picks the exact element.

Convergence: ~log_B(distinct values) rounds (3-4 passes at B = 128
for double data), each a full-width scan-and-aggregate — no shuffle
of the data itself, no per-group sort, state bounded by
``|groups| × B``. The result is the exact k-th smallest DATA VALUE,
so it is engine-independent no matter how the binning path went —
which is what makes a single-node SQL oracle possible.

Weights must be integral (cast to BIGINT): integer weight sums are
exact in any aggregation order, so the weighted rank walk is
deterministic — fractional weights would reintroduce float
accumulation-order sensitivity, the very thing this module exists
to avoid.

Reference scope: the reference pipeline has no quantile operator;
this is a §2.13 extension (robust statistics over 100 TB columns).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: bins per narrowing round; 128 keeps the per-round driver exchange
#: at |groups|·128 rows while still dividing the range fast.
DEFAULT_BINS = 128

#: once a group's in-range candidate ROWS fit here, stop narrowing
#: and resolve exactly from a final filtered collect.
COLLECT_THRESHOLD = 4096


def exact_quantile(
    df: DataFrame,
    value_col: str,
    p: float,
    group_cols: Sequence[str] = (),
    bins: int = DEFAULT_BINS,
    max_rounds: int = 64,
    weight_col: str | None = None,
) -> DataFrame:
    """Exact lower-nearest-rank quantile per group.

    Unweighted: the ``k = max(1, ceil(p·n))``-th smallest value
    (NULL/NaN excluded) — for ``p = 0.5`` the lower median, always
    an actual data value. Weighted (``weight_col``, cast BIGINT;
    rows with NULL or non-positive weight excluded): the smallest
    value whose cumulative weight reaches ``max(1, ceil(p·W))``.

    Returns ``(*group_cols, n BIGINT, q DOUBLE)`` — plus
    ``w BIGINT`` (total weight) before ``q`` when weighted — built
    on the driver (the per-group answer is one number; state is
    bounded by ``|groups| × bins`` throughout — this operator is for
    many-rows-per-group shapes, not million-group ones).

    Each round narrows to the selected bin's OBSERVED [min, max]
    (not its arithmetic edges): the binning map is monotone in the
    value under IEEE rounding, so that interval contains exactly the
    rows binned there — no boundary row can leak out of (or into)
    the next round's filter. Adversarial mass at the extremes of the double
    exponent range can exhaust ``max_rounds`` before the candidate
    count fits the collect threshold; the final resolve is then
    larger but still exact (real-data convergence: 3-4 rounds).
    """
    if not 0.0 < p <= 1.0:
        raise ValueError(f"p must be in (0, 1], got {p}")
    group_cols = list(group_cols)
    spark = df.sparkSession
    vc = F.col(value_col).cast("double")
    # NaN excluded explicitly: Spark's min/max order NaN as the
    # LARGEST double, which would poison the bin width
    cond = F.col(value_col).isNotNull() & ~F.isnan(vc)
    wc = (
        F.col(weight_col).cast("bigint")
        if weight_col is not None
        else F.lit(1).cast("bigint")
    )
    if weight_col is not None:
        cond = cond & F.col(weight_col).isNotNull() & (wc > 0)
    pts = df.filter(cond).select(
        *group_cols, vc.alias("_v"), wc.alias("_w")
    )
    # round 0: per-group row count, total weight, value range
    base = {
        tuple(r[c] for c in group_cols): (r["n"], r["tw"], r["lo"], r["hi"])
        for r in pts.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_w").alias("tw"),
            F.min("_v").alias("lo"),
            F.max("_v").alias("hi"),
        )
        .collect()
    }
    # state per group: remaining WEIGHT rank within [lo, hi]
    # (1-based), and how many candidate ROWS remain in range
    state = {}
    for key, (n, tw, lo, hi) in base.items():
        k = max(1, math.ceil(p * tw))
        state[key] = {"lo": lo, "hi": hi, "k": k, "n_range": n, "ans": None}
        if lo == hi:
            state[key]["ans"] = lo

    def _open(keys):
        return [key for key in keys if state[key]["ans"] is None]

    def _key_filter(keys):
        if not group_cols:
            return F.lit(True)
        cond = F.lit(False)
        for key in keys:
            this = F.lit(True)
            for c, v in zip(group_cols, key):
                # null-safe: a NULL group key must still match its own
                # group or the group never narrows and ans stays None
                eq = (
                    F.col(c).isNull()
                    if v is None
                    else (F.col(c) == F.lit(v))
                )
                this = this & eq
            cond = cond | this
        return cond

    for _ in range(max_rounds):
        open_keys = _open(state)
        if not open_keys:
            break
        big = [
            key
            for key in open_keys
            if state[key]["n_range"] > COLLECT_THRESHOLD
        ]
        if not big:
            break
        # build per-group bin expressions from broadcast literals:
        # bin = clamp(floor((v - lo) / width * bins))
        lo_expr = F.lit(None).cast("double")
        w_expr = F.lit(None).cast("double")
        for key in big:
            s = state[key]
            m = _key_filter([key])
            lo_expr = F.when(m, F.lit(s["lo"])).otherwise(lo_expr)
            w_expr = F.when(
                m, F.lit((s["hi"] - s["lo"]) or 1.0)
            ).otherwise(w_expr)
        binned = (
            pts.filter(_key_filter(big))
            .withColumn("_lo", lo_expr)
            .withColumn("_bw", w_expr)
            .filter(
                (F.col("_v") >= F.col("_lo"))
                & (F.col("_v") <= F.col("_lo") + F.col("_bw"))
            )
            .withColumn(
                "_bin",
                F.least(
                    F.lit(bins - 1),
                    F.greatest(
                        F.lit(0),
                        F.floor(
                            (F.col("_v") - F.col("_lo"))
                            / F.col("_bw")
                            * bins
                        ).cast("int"),
                    ),
                ),
            )
        )
        hist = {key: {} for key in big}
        for r in (
            binned.groupBy(*group_cols, "_bin")
            .agg(
                F.count(F.lit(1)).alias("c"),
                F.sum("_w").alias("ws"),
                F.min("_v").alias("bmin"),
                F.max("_v").alias("bmax"),
            )
            .collect()
        ):
            hist[tuple(r[c] for c in group_cols)][r["_bin"]] = (
                r["c"],
                r["ws"],
                r["bmin"],
                r["bmax"],
            )
        progressed = False
        for key in big:
            s = state[key]
            counts = hist[key]
            cum_w = 0
            for b in range(bins):
                c, ws, bmin, bmax = counts.get(b, (0, 0, None, None))
                if cum_w + ws >= s["k"]:
                    # Narrow to the bin's OBSERVED [min, max], not the
                    # arithmetic bin edges: floor((v-lo)/width*bins) is
                    # monotone in v under IEEE rounding, so the observed
                    # interval contains exactly the rows binned here —
                    # no FP-edge row can fall below the next round's
                    # ``_v >= _lo`` filter and silently lose mass.
                    new_lo, new_hi = bmin, bmax
                    s["k"] -= cum_w
                    if c == s["n_range"] and new_lo <= s["lo"] and (
                        new_hi >= s["hi"]
                    ):
                        # bin failed to narrow (degenerate FP width)
                        s["n_range"] = c
                        break
                    if new_lo == new_hi:
                        s["ans"] = new_lo
                    s["lo"], s["hi"], s["n_range"] = new_lo, new_hi, c
                    progressed = True
                    break
                cum_w += ws
        if not progressed:
            break
    # final exact resolve for all still-open groups in ONE collect:
    # every group's survivors are <= COLLECT_THRESHOLD rows (or
    # narrowing stalled on a degenerate range — also tiny by then)
    open_keys = _open(state)
    if open_keys:
        cond = F.lit(False)
        for key in open_keys:
            s = state[key]
            m = _key_filter([key])
            cond = cond | (
                m & (F.col("_v") >= s["lo"]) & (F.col("_v") <= s["hi"])
            )
        rows = pts.filter(cond).collect()
        by_key: dict[tuple, list] = {key: [] for key in open_keys}
        for r in rows:
            key = tuple(r[c] for c in group_cols)
            if key in by_key:
                by_key[key].append((r["_v"], r["_w"]))
        for key in open_keys:
            cum = 0
            for v, w in sorted(by_key[key]):
                cum += w
                if cum >= state[key]["k"]:
                    state[key]["ans"] = v
                    break
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    sample = pts.schema
    if weight_col is None:
        out_rows = [
            (*key, base[key][0], float(state[key]["ans"])) for key in state
        ]
        tail = [StructField("n", LongType()), StructField("q", DoubleType())]
    else:
        out_rows = [
            (*key, base[key][0], base[key][1], float(state[key]["ans"]))
            for key in state
        ]
        tail = [
            StructField("n", LongType()),
            StructField("w", LongType()),
            StructField("q", DoubleType()),
        ]
    schema = StructType([sample[c] for c in group_cols] + tail)
    return spark.createDataFrame(out_rows, schema)
