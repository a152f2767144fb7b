"""Timestamp-encoding drift guard (round-3 postmortem).

The driver's testdata stores ``events.ts`` as parquet
``timestamp[us]`` WITHOUT a timezone, which Spark 4 reads as
TIMESTAMP_NTZ — and TIMESTAMP_NTZ refuses a direct ``cast("long")``
(DATATYPE_MISMATCH.CAST_WITHOUT_SUGGESTION). Round 3 shipped a
sessionize that passed on one encoding and crashed on the other's
environment; this module makes that class of drift impossible to
miss again by running every window-over-time query against BOTH
parquet timestamp encodings (NTZ: ``timestamp[us]``, LTZ:
``timestamp[us, tz=UTC]``) of the same rows.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dish_data_pipeline_spark.plans.analytics import (
    q_rolling_window,
    q_sessionize,
)

# Sub-second offsets on purpose: unix_timestamp()/epoch() flooring
# must agree across engines for fractional seconds too.
_ROWS = [
    (1, "2024-01-01T00:00:00.778549", 1, "view", 1.5),
    (2, "2024-01-01T00:10:00.123456", 1, "view", 2.0),
    (3, "2024-01-01T01:00:01.000001", 1, "buy", 3.0),
    (4, "2024-01-01T00:00:30.500000", 2, "view", 0.5),
    (5, "2024-01-01T02:00:00.999999", 2, "view", 4.0),
]


def _write_events(tmp_path, encoding: str) -> str:
    ts_type = (
        pa.timestamp("us") if encoding == "ntz" else pa.timestamp("us", tz="UTC")
    )
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in _ROWS], pa.int64()),
            "ts": pa.array(
                [dt.datetime.fromisoformat(r[1]) for r in _ROWS], ts_type
            ),
            "user_id": pa.array([r[2] for r in _ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in _ROWS], pa.string()),
            "value": pa.array([r[4] for r in _ROWS], pa.float64()),
            "props": pa.array(["{}"] * len(_ROWS), pa.string()),
        }
    )
    d = tmp_path / encoding
    d.mkdir()
    pq.write_table(table, str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize("encoding", ["ntz", "ltz"])
@pytest.mark.parametrize("query", [q_sessionize, q_rolling_window])
def test_time_window_queries_run_on_both_encodings(
    spark, tmp_path, encoding, query
):
    sf_dir = _write_events(tmp_path, encoding)
    out = query(spark, sf_dir).collect()
    assert len(out) > 0


@pytest.mark.parametrize("query", [q_sessionize, q_rolling_window])
def test_time_window_results_agree_across_encodings(spark, tmp_path, query):
    """Same instants, different physical encodings → identical
    session/window shapes (modulo the tz-awareness of returned
    timestamps, which we strip before comparing)."""
    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir()
    b.mkdir()
    ntz = query(spark, _write_events(a, "ntz"))
    ltz = query(spark, _write_events(b, "ltz"))

    def _rows(df):
        out = []
        for row in df.collect():
            vals = []
            for v in row:
                if isinstance(v, dt.datetime):
                    v = v.replace(tzinfo=None)
                vals.append(v)
            out.append(tuple(vals))
        return sorted(out, key=repr)

    assert _rows(ntz) == _rows(ltz)
