"""Z-order layout (ops/layout.py): Morton twin, bound guards, and
the actual pruning claim — z-order buckets have tighter 2-D extents
than a single-column sort produces."""

from __future__ import annotations

from pyspark.sql import functions as F

from dish_data_pipeline_spark.io import read_parquet
from dish_data_pipeline_spark.ops.layout import (
    layout_extents,
    morton_expr,
    with_zvalue,
)

SF = "/root/testdata/sf0.001"


def py_morton(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton_expr_matches_python_twin(spark):
    rows = [(x, y) for x in (0, 1, 5, 170, 255) for y in (0, 3, 128, 255)]
    df = spark.createDataFrame(rows, "s0 bigint, s1 bigint")
    got = df.selectExpr(
        "s0", "s1",
        f"CAST({morton_expr(['s0', 's1'], 8, 'div')} AS BIGINT) AS z",
    ).collect()
    for r in got:
        assert r["z"] == py_morton(r["s0"], r["s1"], 8), (r["s0"], r["s1"])


def test_zvalue_bounds_and_scaling(spark):
    o = read_parquet(spark, f"{SF}/orders.parquet").selectExpr(
        "CAST(o_custkey AS BIGINT) AS ck",
        "CAST(datediff(o_orderdate, DATE '1970-01-01') AS BIGINT) AS td",
    )
    z = with_zvalue(o, ["ck", "td"], bits=8)
    stats = z.agg(
        F.min("zvalue"), F.max("zvalue"),
        F.min("_s0"), F.max("_s0"), F.min("_s1"), F.max("_s1"),
    ).collect()[0]
    assert 0 <= stats[0] and stats[1] < (1 << 16)
    assert stats[2] == 0 and stats[3] == 255  # scaling hits both ends
    assert stats[4] == 0 and stats[5] == 255


def test_zorder_prunes_the_unsorted_dimension(spark):
    """The pruning claim, measured. Rectangle AREAS are similar in
    both layouts (64 buckets ≈ 1/64 of the grid each); the z-order
    win is SHAPE — near-square rectangles instead of full-width
    slivers — so a predicate on the dimension the naive layout does
    NOT sort by overlaps only the buckets whose d0-range contains it,
    instead of every bucket."""
    o = read_parquet(spark, f"{SF}/orders.parquet").selectExpr(
        "CAST(o_custkey AS BIGINT) AS ck",
        "CAST(datediff(o_orderdate, DATE '1970-01-01') AS BIGINT) AS td",
    )
    z = with_zvalue(o, ["ck", "td"], bits=8)
    zex = layout_extents(z, 64, bits=8, n_dims=2).collect()

    naive = (
        z.withColumn("bucket", F.expr("_s1 div 4"))
        .groupBy("bucket")
        .agg(F.min("_s0").alias("min_d0"), F.max("_s0").alias("max_d0"))
        .collect()
    )

    def hits(extents, point):
        return sum(
            1 for r in extents if r["min_d0"] <= point <= r["max_d0"]
        )

    probe_points = (25, 100, 180, 240)
    z_hits = sum(hits(zex, p) for p in probe_points)
    n_hits = sum(hits(naive, p) for p in probe_points)
    # naive date-sliced buckets span ~all of d0 → a custkey predicate
    # touches ~every bucket; z-order touches only a d0-slab of them
    assert z_hits * 3 < n_hits, (z_hits, n_hits)


def test_repartition_by_zvalue_gives_disjoint_file_ranges(spark, tmp_path):
    """The write path: repartitionByRange on the z-key yields files
    whose z-ranges don't overlap — what makes min/max skipping work."""
    o = read_parquet(spark, f"{SF}/orders.parquet").selectExpr(
        "CAST(o_custkey AS BIGINT) AS ck",
        "CAST(datediff(o_orderdate, DATE '1970-01-01') AS BIGINT) AS td",
    )
    z = with_zvalue(o, ["ck", "td"], bits=8)
    out = str(tmp_path / "zsorted")
    z.repartitionByRange(8, F.col("zvalue")).sortWithinPartitions(
        "zvalue"
    ).write.parquet(out)
    back = spark.read.parquet(out).withColumn(
        "f", F.input_file_name()
    )
    ranges = (
        back.groupBy("f")
        .agg(F.min("zvalue").alias("lo"), F.max("zvalue").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    assert len(ranges) > 1
    for a, b in zip(ranges, ranges[1:]):
        assert a["hi"] <= b["lo"]
