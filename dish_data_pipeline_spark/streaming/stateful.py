"""Custom stateful streaming operator via ``applyInPandasWithState``
(the Spark-native path for operators Structured Streaming lacks,
SURVEY.md charter: custom stateful operators).

``stateful_user_stats``: per-key running totals maintained in the
state store across micro-batches — the building block for
sessionization with custom emission rules, incremental feature
stores, or online dedup state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double, max_value double"
STATE_SCHEMA = "n bigint, s double, mx double"


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, s, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, s, mx))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [s],
            "max_value": [mx],
        }
    )


def stateful_user_stats(events: DataFrame, key: str = "user_id") -> DataFrame:
    """Running per-user count/sum/max across micro-batches. Output
    mode: update (one refreshed row per key per batch)."""
    return events.groupBy(key).applyInPandasWithState(
        _update,
        OUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# NOTE: round 6 changed this from double to bigint (whole-second
# granularity contract). State schemas are part of a streaming
# query's CHECKPOINT format — a stream started on the double schema
# cannot resume from its old checkpoint after upgrading; restart
# with a fresh checkpoint directory. Operator-facing migration note:
# CHANGELOG.md (repo root), "Round 6".
DEBOUNCE_STATE_SCHEMA = "last_kept_sec bigint"


def stream_debounce(
    events: DataFrame,
    min_gap_sec: int,
    key_cols: tuple[str, ...] = ("user_id", "event_type"),
) -> DataFrame:
    """KEPT-anchored streaming debounce: emit an event iff it is at
    least ``min_gap_sec`` after the last EMITTED event of its key,
    with the last-kept timestamp carried in the state store across
    micro-batches.

    This is the semantics the batch :func:`ops.timeseries.debounce`
    documents as needing stateful iteration: a slow drip spaced just
    under the gap re-emits every time the distance from the last
    kept event reaches the gap, where the batch chain version
    collapses the whole drip to one event. Rows are processed in
    (ts, event_id) order within each micro-batch; cross-batch order
    is the stream's arrival order, so pair with a watermark-bounded
    source if heavy reordering is possible.

    Granularity contract: gaps compare WHOLE-SECOND floors of the
    event time — the same truncation the batch twin's
    ``unix_timestamp`` applies — so sub-second spacing classifies
    identically in both tiers.

    ``key_cols`` may be any columns of ``events``; the output schema
    (key columns + ``event_id`` + ``ts``) and the emitted column
    names/types are derived from ``events.schema``, so non-default
    keys are labeled correctly instead of being forced into the
    default key names. Output mode: append (only kept events are
    ever emitted)."""
    if min_gap_sec < 1:
        raise ValueError(f"min_gap_sec must be >= 1, got {min_gap_sec}")
    missing = [c for c in (*key_cols, "event_id", "ts") if c not in events.columns]
    if missing:
        raise ValueError(f"columns absent from events: {missing}")
    from pyspark.sql.types import StructType

    out_schema = StructType(
        [events.schema[c] for c in (*key_cols, "event_id", "ts")]
    )
    key_names = list(key_cols)

    def _debounce(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import math

        last = state.get[0] if state.exists else None
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            keep = []
            for ts, event_id in zip(pdf["ts"], pdf["event_id"]):
                sec = math.floor(ts.timestamp())
                if last is None or sec - last >= min_gap_sec:
                    keep.append(event_id)
                    last = sec
            if keep:
                out = pdf[pdf["event_id"].isin(keep)]
                cols = {k: [v] * len(out) for k, v in zip(key_names, key)}
                cols["event_id"] = out["event_id"].to_list()
                cols["ts"] = out["ts"].to_list()
                yield pd.DataFrame(cols)
        if last is not None:
            state.update((last,))

    return events.groupBy(*key_cols).applyInPandasWithState(
        _debounce,
        out_schema,
        DEBOUNCE_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


ZSCORE_STATE_SCHEMA = "vals array<double>"


def stream_zscore(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("event_type",),
    ts_col: str = "ts",
    value_col: str = "value",
    window_rows: int = 24,
    threshold: float = 3.0,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Streaming twin of :func:`ops.timeseries.rolling_zscore`: per
    key, flag values deviating more than ``threshold`` standard
    deviations from the TRAILING ``window_rows`` observations (the
    value itself excluded), with the trailing window carried in the
    state store across micro-batches — the online anomaly gate for a
    monitoring stream that cannot wait for a batch re-run.

    BIT-IDENTICAL to the batch operator on in-order input: the
    trailing window is the last ``window_rows`` ROWS — a NULL-valued
    row consumes (and later evicts) a window slot exactly like the
    batch ROWS frame, carried as a null element in the state array —
    and the statistics replay the batch chain operation for
    operation (BIGINT sums of ``floor(term · ZSCORE_SCALE)`` over
    the non-null slots, then the identical division chain), so
    quantization agrees too. Fewer than 2 non-null trailing slots or
    zero variance → NULL z, flag false. State is a bounded
    ``window_rows``-element array of nullable doubles per key —
    O(window) per key regardless of stream volume. Rows are processed in
    (ts_col, *tiebreak_cols) order within each micro-batch (pass
    tiebreakers when equal timestamps are possible — state evolution
    is order-sensitive, and a bare timestamp sort leaves tie order
    arbitrary); cross-batch order is arrival order, so pair with a
    watermark-bounded source if heavy reordering is possible.
    Compose after a streaming resample for a regularized grid,
    exactly like the batch pipeline.

    Output: key cols + (ts_col, value DOUBLE, zscore DOUBLE,
    is_anomaly BOOLEAN), append mode — schema derived from the input
    like :func:`stream_debounce`."""
    if window_rows < 1:
        raise ValueError(f"window_rows must be >= 1, got {window_rows}")
    missing = [
        c
        for c in (*key_cols, ts_col, value_col, *tiebreak_cols)
        if c not in events.columns
    ]
    if missing:
        raise ValueError(f"columns absent from events: {missing}")
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [events.schema[c] for c in (*key_cols, ts_col)]
        + [
            StructField("value", DoubleType()),
            StructField("zscore", DoubleType()),
            StructField("is_anomaly", BooleanType()),
        ]
    )
    key_names = list(key_cols)

    from dish_data_pipeline_spark.plans.common import ZSCORE_SCALE

    def _score(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import math

        vals = list(state.get[0]) if state.exists else []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values([ts_col, *tiebreak_cols], kind="stable")
            out_ts, out_v, out_z, out_flag = [], [], [], []
            for ts, v in zip(pdf[ts_col], pdf[value_col]):
                is_null = v is None or (
                    isinstance(v, float) and math.isnan(v)
                )
                x = None if is_null else float(v)
                z = None
                if not is_null:
                    # replay the batch chain exactly: BIGINT sums of
                    # floor-quantized terms over the non-null slots
                    # of the ROWS window, then the same divisions.
                    xs = [u for u in vals if u is not None]
                    n = len(xs)
                    if n >= 2:
                        s1 = float(
                            sum(math.floor(u * ZSCORE_SCALE) for u in xs)
                        ) / ZSCORE_SCALE
                        s2 = float(
                            sum(math.floor(u * u * ZSCORE_SCALE) for u in xs)
                        ) / ZSCORE_SCALE
                        mean = s1 / n
                        var = s2 / n - mean * mean
                        if var > 0:
                            z = (x - mean) / math.sqrt(var)
                out_ts.append(ts)
                out_v.append(x)
                out_z.append(z)
                out_flag.append(bool(z is not None and abs(z) > threshold))
                # NULL rows occupy (and later evict) a slot, exactly
                # like the batch ROWS frame — the stats above skip
                # them, mirroring F.count/F.sum null handling.
                vals.append(x)
                if len(vals) > window_rows:
                    vals.pop(0)
            cols = {k: [v] * len(out_ts) for k, v in zip(key_names, key)}
            cols[ts_col] = out_ts
            cols["value"] = out_v
            cols["zscore"] = out_z
            cols["is_anomaly"] = out_flag
            yield pd.DataFrame(cols)
        state.update((vals,))

    return events.groupBy(*key_cols).applyInPandasWithState(
        _score,
        out_schema,
        ZSCORE_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def stream_funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    step_col: str = "event_type",
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Streaming twin of :func:`ops.timeseries.funnel_times`:
    per-user ordered-step funnel progression maintained in the state
    store — emit a row the moment a user's chain ADVANCES a stage
    (append mode), instead of recomputing the whole funnel per batch.

    ``steps`` is the ordered list of ``step_col`` values; stage k
    advances on the first event matching step k with a timestamp
    STRICTLY AFTER stage k-1's time — the batch operator's
    time-anchored semantics. State per user is one timestamp per
    stage (O(len(steps))). Equal to the batch funnel on in-order
    streams; out-of-order delivery can miss an earlier qualifying
    event the batch pass would pick (kept-anchored caveat shared
    with :func:`stream_debounce`) — pair with a watermark-bounded
    source if heavy reordering is possible.

    Output: (user_col, stage INT, stage_name STRING, stage_ts) —
    ``stage`` is the 1-based index, so a funnel dashboard can count
    ``WHERE stage >= k`` without string ordering."""
    if not steps:
        raise ValueError("steps must be non-empty")
    if len(set(steps)) != len(steps):
        raise ValueError("steps must be distinct")
    missing = [
        c
        for c in (user_col, ts_col, step_col, *tiebreak_cols)
        if c not in events.columns
    ]
    if missing:
        raise ValueError(f"columns absent from events: {missing}")
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            events.schema[user_col],
            StructField("stage", IntegerType()),
            StructField("stage_name", StringType()),
            StructField("stage_ts", events.schema[ts_col].dataType),
        ]
    )
    # State carries one per-stage timestamp of the SAME type as the
    # event time (TIMESTAMP_NTZ testdata would otherwise round-trip
    # state through a session-timezone-dependent TIMESTAMP_LTZ while
    # the output column keeps NTZ).
    state_schema = StructType(
        [
            StructField(f"t{i}", events.schema[ts_col].dataType)
            for i in range(len(steps))
        ]
    )
    n_steps = len(steps)
    step_index = {s: i for i, s in enumerate(steps)}

    def _advance(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        stages = list(state.get) if state.exists else [None] * n_steps
        advanced = False
        out_stage, out_name, out_ts = [], [], []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values([ts_col, *tiebreak_cols], kind="stable")
            for ts, step in zip(pdf[ts_col], pdf[step_col]):
                i = step_index.get(step)
                if i is None or stages[i] is not None:
                    continue
                if i > 0 and (stages[i - 1] is None or not ts > stages[i - 1]):
                    continue
                stages[i] = ts
                advanced = True
                out_stage.append(i + 1)
                out_name.append(step)
                out_ts.append(ts)
        if advanced:
            state.update(tuple(stages))
        if out_stage:
            yield pd.DataFrame(
                {
                    user_col: [key[0]] * len(out_stage),
                    "stage": out_stage,
                    "stage_name": out_name,
                    "stage_ts": out_ts,
                }
            )

    return events.groupBy(user_col).applyInPandasWithState(
        _advance,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.NoTimeout,
    )
