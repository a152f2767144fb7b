"""Join-view incremental maintenance (operators.diff.
incremental_join_update): every delta-algebra term on planted rows."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from dish_data_pipeline_spark.operators.diff import (
    incremental_join_update,
    snapshot_diff,
)


@pytest.fixture(scope="module")
def rolled_and_truth(spark):
    # fact: (fk, jk, amt)   dim: (jk, seg)
    old_fact = spark.createDataFrame(
        [
            Row(fk=1, jk=10, amt=100.0),  # survives untouched
            Row(fk=2, jk=20, amt=200.0),  # fact delete
            Row(fk=3, jk=10, amt=300.0),  # fact update (repriced)
            Row(fk=4, jk=30, amt=400.0),  # dim 30 gets deleted
            Row(fk=5, jk=40, amt=500.0),  # dim 40 gets updated
            Row(fk=6, jk=99, amt=600.0),  # DANGLING (99 not in dim)
            Row(fk=7, jk=10, amt=700.0),  # moves to dim 40
        ]
    )
    new_fact = spark.createDataFrame(
        [
            Row(fk=1, jk=10, amt=100.0),
            Row(fk=3, jk=10, amt=333.0),
            Row(fk=4, jk=30, amt=400.0),
            Row(fk=5, jk=40, amt=500.0),
            Row(fk=6, jk=99, amt=600.0),  # revived by dim insert 99
            Row(fk=7, jk=40, amt=700.0),  # cross-key move
            Row(fk=8, jk=10, amt=800.0),  # fact insert
            Row(fk=9, jk=77, amt=900.0),  # insert to MISSING dim: stays out
        ]
    )
    old_dim = spark.createDataFrame(
        [Row(jk=10, seg="a"), Row(jk=20, seg="b"),
         Row(jk=30, seg="c"), Row(jk=40, seg="d")]
    )
    new_dim = spark.createDataFrame(
        [Row(jk=10, seg="a"), Row(jk=20, seg="b"),
         Row(jk=40, seg="D2"),              # dim update
         Row(jk=99, seg="new")]             # dim insert (30 deleted)
    )
    view_old = old_fact.join(old_dim, ["jk"]).select(
        "fk", "jk", "amt", "seg"
    )
    rolled = incremental_join_update(
        view_old,
        snapshot_diff(old_fact, new_fact, ["fk"], ["jk", "amt"],
                      include_unchanged=False),
        snapshot_diff(old_dim, new_dim, ["jk"], ["seg"],
                      include_unchanged=False),
        new_fact, new_dim, "fk", "jk", ["amt"], ["seg"],
    )
    truth = new_fact.join(new_dim, ["jk"]).select("fk", "jk", "amt", "seg")
    return (
        sorted(map(tuple, rolled.select("fk", "jk", "amt", "seg").collect())),
        sorted(map(tuple, truth.collect())),
    )


def test_rolled_view_equals_from_scratch_join(rolled_and_truth):
    rolled, truth = rolled_and_truth
    assert rolled == truth


def test_every_term_fired(rolled_and_truth):
    rolled, _ = rolled_and_truth
    by_fk = {r[0]: r for r in rolled}
    assert 2 not in by_fk                      # fact delete
    assert by_fk[3][2] == 333.0                # fact update rebuilt
    assert 4 not in by_fk                      # dim delete killed fan-out
    assert by_fk[5][3] == "D2"                 # dim update patched in place
    assert by_fk[6] == (6, 99, 600.0, "new")   # dim insert revived dangler
    assert by_fk[7] == (7, 40, 700.0, "D2")    # cross-key move
    assert by_fk[8][3] == "a"                  # fact insert joined new dim
    assert 9 not in by_fk                      # insert to missing dim stays out
    assert by_fk[1] == (1, 10, 100.0, "a")     # untouched survivor
