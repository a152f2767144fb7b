"""k-anonymity suppression + l-diversity (ops/privacy.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from dish_data_pipeline_spark.ops.privacy import k_anonymize, l_diversity


@pytest.fixture(scope="module")
def people(spark):
    rows = (
        [Row(zip="100", age=30, disease="flu")] * 3
        + [Row(zip="100", age=30, disease="cold")] * 2
        + [Row(zip="200", age=40, disease="flu")]  # singleton cohort
        + [Row(zip=None, age=50, disease="flu")] * 2  # NULL cohort
    )
    return spark.createDataFrame(rows)


def test_k_anonymize_suppresses_small_cohorts(spark, people):
    kept = k_anonymize(people, ["zip", "age"], k=2).collect()
    assert len(kept) == 7  # the (200, 40) singleton is suppressed
    assert all((r.zip, r.age) != ("200", 40) for r in kept)


def test_null_quasi_tuple_is_its_own_cohort(spark, people):
    kept = k_anonymize(people, ["zip", "age"], k=2).collect()
    assert sum(1 for r in kept if r.zip is None) == 2
    # at k=3 the NULL cohort (size 2) is suppressed too
    kept3 = k_anonymize(people, ["zip", "age"], k=3).collect()
    assert all(r.zip == "100" for r in kept3) and len(kept3) == 5


def test_l_diversity_counts_distinct_sensitive(spark, people):
    rep = {
        (r.zip, r.age): (r.n, r.l_div)
        for r in l_diversity(people, ["zip", "age"], "disease").collect()
    }
    assert rep[("100", 30)] == (5, 2)
    assert rep[("200", 40)] == (1, 1)
    assert rep[(None, 50)] == (2, 1)


def test_k_anonymize_validates_args(spark, people):
    with pytest.raises(ValueError, match="k must be"):
        k_anonymize(people, ["zip"], k=0)
    with pytest.raises(ValueError, match="quasi-identifier"):
        k_anonymize(people, [], k=2)
    with pytest.raises(ValueError, match="quasi-identifier"):
        l_diversity(people, [], "disease")
