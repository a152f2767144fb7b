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
