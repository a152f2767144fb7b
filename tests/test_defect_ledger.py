"""One test per SURVEY.md Appendix A row: the reference defects this
engine deliberately does NOT replicate (or, for row 10, the
reference semantics it deliberately DOES), pinned so
parity-with-fixes survives refactors (VERDICT r10 item 7).

Row numbers follow the Appendix A table order.
"""

from __future__ import annotations

import ast
import datetime as dt
import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "dish_data_pipeline_spark")


def test_row1_no_parsed_but_unused_cli_args():
    """Reference parses --run_type and never reads it
    (pipeline/data_pipeline.py:245,275-278). Our CLI must consume
    every argument dest it defines."""
    from dish_data_pipeline_spark.__main__ import _build_parser

    src = open(os.path.join(PKG, "__main__.py")).read()
    p = _build_parser()
    dests = set()
    for action in p._subparsers._group_actions[0].choices.values():
        for a in action._actions:
            if a.dest not in ("help", "cmd"):
                dests.add(a.dest)
    for dest in dests:
        assert re.search(rf"args\.{dest}\b", src), (
            f"CLI defines --{dest} but never reads args.{dest} "
            "(the reference's --run_type defect)"
        )


def test_row2_failure_audit_never_unbound(spark, tmp_path):
    """Reference: an extract failure reaches the audit write with
    ``source_files`` unbound (NameError shadows the real error,
    pipeline/data_pipeline.py:249,269). Our run_feed must write the
    FAILED audit row with an empty file list instead."""
    from dish_data_pipeline_spark.pipeline import FeedConfig, run_feed

    def exploding_http_get(url):
        raise ConnectionError("api down")

    feed = FeedConfig(
        name="daily_visits",
        endpoint="daily-visits",
        keys=["visit_date"],
        required=["visit_date", "total_visits"],
    )
    res = run_feed(
        spark,
        feed,
        "http://fake",
        str(tmp_path),
        http_get=exploding_http_get,
    )
    assert res.status == "FAILED"
    audit = spark.read.parquet(str(tmp_path / "load_audit")).collect()
    assert len(audit) == 1
    assert audit[0]["status"].startswith("FAILED")
    assert list(audit[0]["source_files"]) == []


def test_row3_true_lineage_beside_parity_source_file(spark, tmp_path):
    """Reference ``source_file`` is a load-date string, not a file
    (pipeline/data_pipeline.py:81). We keep the parity column AND
    offer real per-row file lineage."""
    from dish_data_pipeline_spark.operators.enrich import (
        add_load_metadata,
        with_lineage,
    )

    p = str(tmp_path / "lineage_src")
    spark.range(3).write.parquet(p)
    df = with_lineage(add_load_metadata(
        spark.read.parquet(p), load_date=dt.date(2026, 8, 16)
    ))
    rows = df.collect()
    assert all(r["source_file"] == "2026-08-16" for r in rows)  # parity
    assert all(r["input_file"].endswith(".parquet") for r in rows)  # truth


def test_row4_bare_key_upsert_keeps_keys_unwrapped(spark):
    """Reference wraps BOTH MERGE join keys in date() — defeating
    partition pruning and file skipping on the target
    (pipeline/data_pipeline.py:163). Our default upsert joins on
    bare columns (expression keys are a separate opt-in), so the
    anti-join condition stays prunable."""
    from dish_data_pipeline_spark.operators.upsert import upsert

    t = spark.createDataFrame([(1, "a")], "k int, v string")
    s = spark.createDataFrame([(2, "b")], "k int, v string")
    plan = upsert(t, s, ["k"])._jdf.queryExecution().optimizedPlan().toString()
    assert "date(" not in plan.lower().replace("to_date", "date")
    # and the expression form exists but must be asked for
    import inspect

    sig = inspect.signature(upsert)
    assert sig.parameters["key_exprs"].default is None


def test_row5_dockerfile_copies_exist_and_entrypoint_runs():
    """Reference Dockerfile COPYs a path that doesn't exist in the
    repo layout (Docker/Dockerfile:12-19). Every COPY source in ours
    must exist, and the ENTRYPOINT module must be importable."""
    import importlib.util

    lines = open(os.path.join(REPO, "Dockerfile")).read().splitlines()
    for line in lines:
        if line.startswith("COPY "):
            srcs = line.split()[1:-1]
            for s in srcs:
                assert os.path.exists(os.path.join(REPO, s)), (
                    f"Dockerfile COPYs nonexistent {s}"
                )
    entries = [ln for ln in lines if ln.startswith("ENTRYPOINT")]
    assert entries, "no ENTRYPOINT"
    for entry in entries:  # every stage's entry module must import
        argv = json.loads(entry.split(None, 1)[1])
        assert "-m" in argv, entry
        mod = argv[argv.index("-m") + 1]
        assert importlib.util.find_spec(mod) is not None, mod
    # the runtime (default, last) stage runs the package CLI
    assert (
        importlib.util.find_spec(
            json.loads(entries[-1].split(None, 1)[1])[-1] + ".__main__"
        )
        is not None
    )


def test_row6_package_reexports_are_importable():
    """Reference mixes script-style and package-relative imports
    (pipeline/data_pipeline.py:7 vs __init__.py:5-12), so the
    package imports only from one working directory. Ours must
    import everything it re-exports from anywhere."""
    import dish_data_pipeline_spark as pkg

    for name in getattr(pkg, "__all__", []):
        assert getattr(pkg, name, None) is not None, name


def test_row7_no_duplicate_module_constant_assignments():
    """Reference assigns DATASET twice in its config template
    (config_file_template.py:5,14) — the first value is silently
    dead. No module in our package may assign the same top-level
    UPPERCASE constant twice."""
    for root, _, files in os.walk(PKG):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            tree = ast.parse(open(path).read())
            seen: set[str] = set()
            for node in tree.body:
                if isinstance(node, ast.Assign):
                    for tgt in node.targets:
                        if (
                            isinstance(tgt, ast.Name)
                            and tgt.id.isupper()
                        ):
                            assert tgt.id not in seen, (
                                f"{path}: {tgt.id} assigned twice"
                            )
                            seen.add(tgt.id)


def test_row8_docs_reference_real_dependency_files():
    """Reference README points at requirements.txt while the repo
    ships requirement.txt. Every dependency-file name our README
    mentions must exist."""
    readme = open(os.path.join(REPO, "README.md")).read()
    for m in re.finditer(r"[\w./-]*requirements?[\w.-]*\.txt", readme):
        assert os.path.exists(os.path.join(REPO, m.group(0))), m.group(0)
    if "pyproject.toml" in readme:
        assert os.path.exists(os.path.join(REPO, "pyproject.toml"))


def test_row9_one_run_lands_in_one_partition(tmp_path):
    """Reference stamps now() PER PAGE, so a paginated run straddling
    midnight splits its raw files across day partitions while
    source_file stays one value (pipeline/data_pipeline.py:46-50 vs
    :81). Our fetch captures the partition date ONCE per run — proven
    with a clock that crosses midnight between pages."""
    from dish_data_pipeline_spark.sources.rest import fetch_paginated_data

    def http_get(url):
        page = int(url.rsplit("=", 1)[-1])
        if page > 3:
            return 200, {"records": []}
        return 200, {"records": [{"k": page}], "hasMore": page < 3}

    ticks = iter(
        [
            dt.datetime(2026, 8, 15, 23, 59, 59, tzinfo=dt.timezone.utc),
            dt.datetime(2026, 8, 16, 0, 0, 1, tzinfo=dt.timezone.utc),
            dt.datetime(2026, 8, 16, 0, 0, 2, tzinfo=dt.timezone.utc),
        ]
    )
    records, files = fetch_paginated_data(
        "http://fake",
        "ep",
        http_get=http_get,
        raw_zone_dir=str(tmp_path),
        name="feed",
        clock=lambda: next(ticks),
    )
    assert len(records) == 3 and len(files) == 3
    part_dirs = {os.path.dirname(f) for f in files}
    assert len(part_dirs) == 1, (
        f"run split across partitions: {sorted(part_dirs)}"
    )
    assert "year=2026" in files[0] and "day=15" in files[0]


def test_row10_literal_predup_rule_is_kept(spark):
    """Row 10 is reference SEMANTICS we deliberately replicate: the
    ga_sessions-shaped pre-dedup is FULL-ROW (key-duplicates with
    different payloads survive to the DQ gate, which routes them to
    the recoverable dedup-and-continue branch). Pin the rule's two
    halves so a 'helpful' generalization to keyed pre-dedup (which
    made the recovery branch dead code before round 10) cannot
    silently return."""
    from dish_data_pipeline_spark.operators.dedup import dedup_keyed
    from dish_data_pipeline_spark.operators.quality import is_recoverable

    df = spark.createDataFrame(
        [("s1", "chrome"), ("s1", "firefox"), ("s1", "chrome")],
        "visitId string, browser string",
    )
    # full-row pre-dedup keeps the key-dup pair with differing payloads
    pre = dedup_keyed(df, None)
    assert pre.count() == 2
    # the DQ routing treats duplicates as recoverable, not fatal
    assert is_recoverable("duplicate keys found: 1")
    assert not is_recoverable("null keys found: 1")
    # and keyed recovery dedup collapses to one row per key
    assert dedup_keyed(pre, ["visitId"]).count() == 1
