"""Catalog smoke: every registered query runs at sf0.001 and yields a
stable schema. Value correctness vs DuckDB is covered by
tools/check_oracle.py (run at sf0.01 pre-commit) and the driver's
CORRECTNESS gate."""

from __future__ import annotations

import pytest

from dish_data_pipeline_spark.plans import QUERIES


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, sf_dir, name):
    qd = QUERIES[name]
    df = qd.fn(spark, sf_dir)
    assert df.columns  # non-empty schema
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_oracle_sql_subset_of_queries():
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) == len(QUERIES)


def test_rotation_head_is_least_recently_verified():
    """plans/rotation.py is GENERATED from CORRECTNESS_r*.json by
    tools/gen_rotation_head.py; a stale copy silently burns the
    driver's ~50-query budget on already-certified queries.

    Validates SELF-CONSISTENCY against the generation-time inputs
    recorded in rotation.CONSUMED_INPUTS: each consumed file must
    still exist with its recorded hash, and replaying exactly those
    files must reproduce the committed ordering. A NEWER CORRECTNESS
    file on disk (the driver drops round N's file after the builder's
    final commit) is a warning, never a failure — it is structurally
    impossible to regenerate against a file that does not exist yet."""
    import hashlib
    import re
    import sys
    import warnings
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo / "tools"))
    try:
        import gen_rotation_head as gen
    finally:
        sys.path.pop(0)

    from dish_data_pipeline_spark.plans import catalog_definition_order
    from dish_data_pipeline_spark.plans import rotation

    consumed = getattr(rotation, "CONSUMED_INPUTS", None)
    assert consumed, (
        "rotation.py predates input fingerprinting — regenerate: "
        "python tools/gen_rotation_head.py"
    )

    # 1. Consumed inputs must be intact: same file, same content. A
    #    mutated or deleted history file means the ordering no longer
    #    reflects the recorded history → real staleness, fail.
    files: list[tuple[int, str]] = []
    for fname, digest in consumed:
        path = repo / fname
        assert path.exists(), f"consumed history file vanished: {fname}"
        actual = hashlib.sha256(path.read_bytes()).hexdigest()[:16]
        assert actual == digest, (
            f"{fname} changed since rotation.py was generated — run: "
            "python tools/gen_rotation_head.py"
        )
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json$", fname).group(1))
        files.append((rnd, str(path)))
    files.sort()

    # 2. Replaying exactly those inputs must reproduce the ordering.
    names = catalog_definition_order()
    history = gen.driver_history(str(repo), files=files)
    expected = gen.rotation_order(names, history)
    assert rotation.DRIVER_ROTATION_ORDER == expected, (
        "plans/rotation.py does not match its own recorded inputs — "
        "run: python tools/gen_rotation_head.py"
    )
    assert set(rotation.DRIVER_ROTATION_ORDER) == set(names)

    # 3. Newer history on disk → informational only (driver writes
    #    round N's file after the final commit; regenerate at the
    #    START of the next round, not here).
    seen = {fn for fn, _ in consumed}
    newer = sorted(
        p.name
        for p in repo.glob("CORRECTNESS_r*.json")
        if p.name not in seen
    )
    if newer:
        warnings.warn(
            f"newer driver history not yet folded into rotation.py: "
            f"{', '.join(newer)} — run tools/gen_rotation_head.py at "
            "round start",
            stacklevel=1,
        )


def test_catalog_module_keys_disjoint():
    """A name defined in two catalog modules silently shadows one of
    them in the ** merge (hit once: a second cohort_retention) — the
    lost query keeps its green history while its code stops running."""
    from dish_data_pipeline_spark.plans.analytics import ANALYTICS_QUERIES
    from dish_data_pipeline_spark.plans.breadth import BREADTH_QUERIES
    from dish_data_pipeline_spark.plans.extensions import EXTENSION_QUERIES
    from dish_data_pipeline_spark.plans.parity import PARITY_QUERIES
    from dish_data_pipeline_spark.plans.tpch_extra import TPCH_EXTRA_QUERIES

    seen: dict[str, str] = {}
    for mod_name, d in [
        ("parity", PARITY_QUERIES),
        ("breadth", BREADTH_QUERIES),
        ("analytics", ANALYTICS_QUERIES),
        ("tpch_extra", TPCH_EXTRA_QUERIES),
        ("extensions", EXTENSION_QUERIES),
    ]:
        for k in d:
            assert k not in seen, f"{k} defined in {seen[k]} AND {mod_name}"
            seen[k] = mod_name
