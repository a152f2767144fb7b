"""Manifest-backend data skipping: footer min/max stats, interval
pruning soundness/completeness, z-order compaction tightening, and
stats inheritance through MERGE."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dish_data_pipeline_spark.io_backends import ManifestParquetBackend


@pytest.fixture()
def table(spark, tmp_path):
    """4-file table over k=0..399, v=k*3, file i holding k in
    [i*100, i*100+99] (repartitionByRange on k → disjoint ranges)."""
    be = ManifestParquetBackend()
    path = str(tmp_path / "t")
    df = (
        spark.range(400)
        .selectExpr(
            "CAST(id AS BIGINT) AS k",
            "CAST(id * 3 AS BIGINT) AS v",
            "CAST(1 AS BIGINT) AS ts",
        )
        .repartitionByRange(4, F.col("k"))
        .sortWithinPartitions("k")
    )
    be.create(df, path, stats_cols=["k", "v"])
    return be, path


def test_manifest_records_footer_stats(table):
    be, path = table
    man = be._manifest(path, 0)
    assert man["stats_cols"] == ["k", "v"]
    assert set(man["stats"]) == set(man["files"])
    los = sorted(s["k"][0] for s in man["stats"].values())
    his = sorted(s["k"][1] for s in man["stats"].values())
    assert los[0] == 0 and his[-1] == 399
    # disjoint ascending ranges
    assert all(lo <= hi for lo, hi in zip(los, his))


def test_prune_is_sound_and_tight(spark, table):
    be, path = table
    kept, total = be.prune_files(path, {"k": (150, 160)})
    assert total == 4 and len(kept) == 1
    # completeness: every matching row survives the pruned scan
    got = (
        be.scan(spark, path, {"k": (150, 160)})
        .filter("k BETWEEN 150 AND 160")
        .count()
    )
    assert got == 11
    # unbounded side + no-stats column never prunes wrongly
    kept, _ = be.prune_files(path, {"k": (None, 99)})
    assert len(kept) == 1
    kept, _ = be.prune_files(path, {"nosuch": (1, 2)})
    assert len(kept) == 4
    # empty intersection → empty DataFrame with schema intact
    empty = be.scan(spark, path, {"k": (4000, 5000)})
    assert empty.count() == 0 and empty.columns == ["k", "v", "ts"]


def test_stats_inherited_through_merge(spark, table):
    be, path = table
    be.merge_keep_latest(
        spark, path,
        spark.createDataFrame([Row(k=1000, v=1, ts=2)]),
        ["k"], "ts",
    )
    man = be._manifest(path, 1)
    assert man["stats_cols"] == ["k", "v"]
    assert set(man["stats"]) == set(man["files"])
    his = max(s["k"][1] for s in man["stats"].values())
    assert his == 1000


def test_zorder_compaction_prunes_both_dimensions(spark, tmp_path):
    """Before: files cut on k only → a v-predicate hits every file.
    After OPTIMIZE-ZORDER compaction: both k and v prune."""
    be = ManifestParquetBackend()
    path = str(tmp_path / "z")
    # v deliberately anti-correlated with k so a k-sort is the worst
    # case for v pruning
    df = (
        spark.range(4096)
        .selectExpr(
            "CAST(id AS BIGINT) AS k",
            "CAST(4095 - id AS BIGINT) AS v",
            "CAST(1 AS BIGINT) AS ts",
        )
        .repartitionByRange(8, F.col("k"))
    )
    be.create(df, path, stats_cols=["k", "v"])
    kept_v_before, total = be.prune_files(path, {"v": (0, 63)})
    assert total == 8

    v = be.compact(spark, path, target_files=8, zorder_by=["k", "v"])
    assert v == 1
    kept_k, total = be.prune_files(path, {"k": (0, 63)}, version=1)
    kept_v, _ = be.prune_files(path, {"v": (0, 63)}, version=1)
    assert total == 8
    assert len(kept_k) < 8 and len(kept_v) < 8
    # completeness after relayout
    assert (
        be.scan(spark, path, {"v": (0, 63)}, version=1)
        .filter("v < 64").count() == 64
    )
    # rows preserved exactly
    assert be.read(spark, path, 1).count() == 4096


def test_append_commits_new_files_and_keeps_stats(spark, table):
    be, path = table
    v = be.append(
        spark.createDataFrame([Row(k=900, v=1, ts=1)]), path
    )
    assert v == 1
    assert be.read(spark, path).count() == 401
    assert be.read(spark, path, 0).count() == 400  # snapshot intact
    man = be._manifest(path, 1)
    # every file gets a stats entry (at least the _rows count); empty
    # part files carry no row groups → no COLUMN stats (sound: they
    # are never pruned on any column)
    assert set(man["stats"]) <= set(man["files"])
    assert max(
        s["k"][1] for s in man["stats"].values() if "k" in s
    ) == 900
    # appended files prunable immediately: only the k=900 file (plus
    # any column-statless empties) survives this interval
    kept, total = be.prune_files(path, {"k": (880, 920)})
    assert total == len(man["files"])
    assert [
        f for f in kept if "k" in man["stats"].get(f, {})
    ] == [
        f for f, s in man["stats"].items()
        if "k" in s and s["k"][0] == 900
    ]


def test_append_race_retries_without_rewriting_data(spark, table):
    """A rival committing between our write and our commit must not
    lose either append: ours retries against the new latest."""
    be, path = table
    rival = ManifestParquetBackend()
    orig = be._try_commit
    state = {"fired": False}

    def racing_commit(path_, version, manifest):
        if not state["fired"]:
            state["fired"] = True
            rival.append(
                spark.createDataFrame([Row(k=2000, v=1, ts=1)]), path_
            )
        return orig(path_, version, manifest)

    be._try_commit = racing_commit
    try:
        v = be.append(
            spark.createDataFrame([Row(k=3000, v=2, ts=1)]), path
        )
    finally:
        be._try_commit = orig
    assert v == 2  # lost v1 to the rival, committed v2
    ks = {r["k"] for r in be.read(spark, path).filter("k >= 2000").collect()}
    assert ks == {2000, 3000}  # both appends survive


def test_changes_between_versions(spark, table):
    """CDF: insert + update + delete-free merge classified row-level
    between any two committed versions."""
    be, path = table
    be.merge_keep_latest(
        spark, path,
        spark.createDataFrame(
            [Row(k=1000, v=1, ts=2), Row(k=0, v=999, ts=2)]
        ),
        ["k"], "ts",
    )
    diff = {r["k"]: r["change_type"]
            for r in be.changes(spark, path, ["k"], 0, 1).collect()}
    assert diff == {1000: "insert", 0: "update"}
    # full-range equals latest-default; empty range is empty
    assert be.changes(spark, path, ["k"], 0).count() == 2
    assert be.changes(spark, path, ["k"], 1, 1).count() == 0
    import pytest as _pytest
    with _pytest.raises(ValueError):
        be.changes(spark, path, ["k"], 5, 1)


def test_append_rejects_schema_drift(spark, table):
    be, path = table
    with pytest.raises(ValueError, match="schema"):
        be.append(
            spark.createDataFrame([Row(k=1, extra="x")]), path
        )


def test_expire_versions_and_vacuum_reclaim(spark, table):
    be, path = table
    # v1, v2: two appends, each writing fresh data dirs
    be.append(spark.createDataFrame([Row(k=901, v=1, ts=1)]), path)
    be.append(spark.createDataFrame([Row(k=902, v=2, ts=1)]), path)
    # overwrite-style merge producing v3 that rewrites everything
    be.merge_keep_latest(
        spark, path, spark.createDataFrame([Row(k=1, v=999, ts=9)]), ["k"], "ts"
    )
    assert be.latest_version(path) == 3
    expired = be.expire_versions(path, keep_last=1)
    assert expired == [0, 1, 2]
    # latest snapshot intact; expired versions unreadable
    assert be.read(spark, path).count() == 402
    with pytest.raises(FileNotFoundError):
        be.read(spark, path, 0)
    # the rewrite dropped every pre-v3 file — vacuum reclaims the
    # dirs only expired manifests referenced
    deleted = be.vacuum(path)
    assert deleted, "expected expired-only data dirs to be reclaimed"
    assert be.read(spark, path).count() == 402


def test_vacuum_reclaims_crashed_commit_scratch(spark, table):
    import os
    import time

    be, path = table
    log = be._log_dir(path)
    # simulate a writer hard-killed between creating its commit
    # scratch and the finally-unlink: a stale .tmp-* in the log dir
    stale = os.path.join(log, ".tmp-deadbeef")
    with open(stale, "w") as f:
        f.write("{}")
    old = time.time() - 3600
    os.utime(stale, (old, old))
    fresh = os.path.join(log, ".tmp-in-flight")
    with open(fresh, "w") as f:
        f.write("{}")
    # windowed vacuum: the hour-old scratch goes, the in-flight stays
    deleted = be.vacuum(path, min_age_seconds=600)
    assert os.path.join("_log", ".tmp-deadbeef") in deleted
    assert not os.path.exists(stale)
    assert os.path.exists(fresh)
    # quiesced vacuum (window 0) reclaims the rest
    deleted = be.vacuum(path)
    assert os.path.join("_log", ".tmp-in-flight") in deleted
    assert not os.path.exists(fresh)
    # the table itself is untouched
    assert be.read(spark, path).count() == 400


def test_expire_versions_never_drops_latest(spark, table):
    be, path = table
    assert be.expire_versions(path, keep_last=5) == []
    assert be.latest_version(path) == 0
    with pytest.raises(ValueError):
        be.expire_versions(path, keep_last=0)
