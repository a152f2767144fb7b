"""Pure-function tests for the bench harness (bench.py): drift
median, regression detection with the absolute floor, and the
adjudication median — the logic the driver's BENCH_r{N}.json rides
on, pinned without spawning Spark."""

from __future__ import annotations

import importlib.util
import json
import subprocess
import sys

_spec = importlib.util.spec_from_file_location("bench_mod", "bench.py")
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def test_median_ratio_robust_to_single_regression():
    baseline = {f"q{i}": 1.0 for i in range(9)}
    timings = {f"q{i}": 1.1 for i in range(9)}
    timings["q0"] = 30.0  # one true regression must not move the median
    assert bench.median_ratio(timings, baseline) == 1.1


def test_median_ratio_empty_overlap_is_none():
    assert bench.median_ratio({"a": 1.0}, {"b": 1.0}) is None


def test_find_regressions_factor_and_floor():
    baseline = {"fast": 0.2, "slow": 10.0, "mid": 2.0}
    timings = {
        "fast": 0.5,   # 2.5x but under the 0.75 s absolute floor → no flag
        "slow": 16.0,  # 1.6x and +6 s → flag
        "mid": 2.2,    # 1.1x → no flag
    }
    out = bench.find_regressions(timings, baseline)
    assert set(out) == {"slow"}
    assert out["slow"]["ratio"] == 1.6
    # adj_ratio divides out the suite drift (median ratio here is 1.6
    # from fast=2.5, slow=1.6, mid=1.1 → median 1.6)
    assert out["slow"]["adj_ratio"] == 1.0


def test_find_regressions_skips_errored_queries():
    out = bench.find_regressions({"q": -1.0}, {"q": 1.0})
    assert out == {}


def test_adjudication_median():
    assert bench._median([3.0, 1.0, 2.0]) == 2.0
    assert bench._median([4.0, 1.0]) == 2.5
    assert bench._median([7.0]) == 7.0


def test_load_baseline_rejects_other_scale(tmp_path, monkeypatch):
    # baselines pinned at one sf must not gate runs at another
    assert bench.load_baseline(123.456) == {}


def test_single_query_mode_emits_two_parseable_lines():
    """The adjudication subprocess contract: line 1 carries
    per-query timings, the LAST line is the minimal summary."""
    p = subprocess.run(
        [sys.executable, "bench.py", "enrich_metadata"],
        capture_output=True,
        text=True,
        env={**__import__("os").environ,
             "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001"},
        timeout=600,
    )
    lines = p.stdout.strip().splitlines()
    assert len(lines) == 2
    full, summary = (json.loads(x) for x in lines)
    assert "enrich_metadata" in full["queries"]
    assert summary["n_queries"] == 1 and summary["n_errors"] == 0
