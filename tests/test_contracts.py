"""Data-contract validation (ops/contracts.py): every rule class on
planted rows, NULL-edge semantics pinned."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from dish_data_pipeline_spark.ops.contracts import contract_report


@pytest.fixture(scope="module")
def table(spark):
    return spark.createDataFrame(
        [
            Row(k=1, fk=10, status="A"),
            Row(k=1, fk=20, status="B"),     # dup key
            Row(k=2, fk=None, status="Z"),   # null fk (not an FK violation)
            Row(k=3, fk=99, status=None),    # orphan fk; null status exempt
            Row(k=None, fk=10, status="A"),  # null key
            Row(k=None, fk=10, status="A"),  # dup among NULL keys
        ]
    )


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame([Row(d=10), Row(d=20)])


def test_contract_report_counts(spark, table, dim):
    rep = {
        r.rule: (r.n_violations, r.passed)
        for r in contract_report(
            table,
            unique=[["k"]],
            not_null=["fk"],
            accepted={"status": ["A", "B"]},
            fks=[("fk", dim, "d")],
        ).collect()
    }
    # dup k=1 (1 extra) + dup NULL-NULL (1 extra) = 2
    assert rep["unique(k)"] == (2, False)
    assert rep["not_null(fk)"] == (1, False)
    # only 'Z' violates; NULL status exempt
    assert rep["accepted_values(status in [A, B])"] == (1, False)
    # fk=99 orphan; NULL fk exempt
    assert rep["fk(fk -> d)"] == (1, False)


def test_contract_report_clean_table_passes(spark, dim):
    clean = spark.createDataFrame([Row(k=1, fk=10), Row(k=2, fk=20)])
    rep = contract_report(
        clean, unique=[["k"]], not_null=["k", "fk"], fks=[("fk", dim, "d")]
    ).collect()
    assert all(r.passed and r.n_violations == 0 for r in rep)


def test_contract_report_requires_rules(spark, table):
    with pytest.raises(ValueError, match="no rules"):
        contract_report(table)
