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


# --- Mondrian multidimensional k-anonymity ---------------------------
def test_mondrian_single_round_median_split(spark):
    from pyspark.sql import Row

    from dish_data_pipeline_spark.ops.privacy import mondrian_anonymize

    df = spark.createDataFrame([Row(x=i) for i in [1, 2, 3, 4, 5, 6]])
    cells = {
        r.cell: (r.x_lo, r.x_hi, r.n)
        for r in mondrian_anonymize(df, ["x"], rounds=1, k=1).collect()
    }
    # median = ceil(6/2)=3rd smallest = 3; <=3 left, >3 right
    assert cells == {0: (1, 3, 3), 1: (4, 6, 3)}


def test_mondrian_round_robin_and_suppression(spark):
    from pyspark.sql import Row

    from dish_data_pipeline_spark.ops.privacy import mondrian_anonymize

    rows = [Row(x=x, y=y) for x in range(4) for y in range(4)]
    out = mondrian_anonymize(
        spark.createDataFrame(rows), ["x", "y"], rounds=2, k=4
    ).collect()
    # 16 points on a 4x4 grid split into quadrants of exactly 4
    assert len(out) == 4 and all(r.n == 4 for r in out)
    spans = {(r.x_lo, r.x_hi, r.y_lo, r.y_hi) for r in out}
    assert spans == {
        (0, 1, 0, 1), (0, 1, 2, 3), (2, 3, 0, 1), (2, 3, 2, 3)
    }
    # k above any cell population suppresses everything
    assert (
        mondrian_anonymize(
            spark.createDataFrame(rows), ["x", "y"], rounds=2, k=5
        ).count() == 0
    )


def test_mondrian_degenerate_split_loses_no_rows(spark):
    from pyspark.sql import Row

    from dish_data_pipeline_spark.ops.privacy import mondrian_anonymize

    # constant dim: median == every value, all rows go left each round
    df = spark.createDataFrame([Row(x=7, y=None)] * 5 + [Row(x=7, y=1)])
    out = mondrian_anonymize(df, ["x"], rounds=3, k=1).collect()
    assert len(out) == 1 and out[0].n == 6 and out[0].cell == 0
    # NULLs in a DIM are excluded up front
    out2 = mondrian_anonymize(df, ["y"], rounds=1, k=1).collect()
    assert sum(r.n for r in out2) == 1
