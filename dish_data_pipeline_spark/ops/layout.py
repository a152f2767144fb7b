"""Z-order (Morton-curve) data layout clustering — the
multi-dimension file-skipping device behind Delta/Iceberg
``OPTIMIZE ZORDER BY`` (public docs) and classic multidimensional
indexing (Morton 1966; Orenstein & Merrett, PODS 1984).

The problem it solves at 100 TB: a table range-partitioned on ONE
column prunes scans on that column only; queries filtering the other
dimension read everything. Interleaving the bits of two (or more)
rank-normalized dimensions into one sort key makes rows that are
close in EVERY dimension land in the same file, so per-file min/max
statistics become tight rectangles — a predicate on either dimension
skips most files.

Spark-first shape: the z-value is a pure integer column expression
(no UDF, whole-stage codegen), so the actual layout operation is
just ``df.repartitionByRange(n_files, F.col("zvalue"))`` followed by
the parquet write — Spark's range partitioner samples the z-key
distribution and produces equal-frequency file splits; the writer
collects per-file min/max automatically. This module provides the
key expression plus :func:`layout_extents`, the bucket-level min/max
rectangle report a table maintenance job would persist as its
file-skipping manifest (and the statistic the catalog query
verifies).

Determinism contract: dimension normalization is exact integer
arithmetic — ``(x − min) · (2^bits − 1) div max(max − min, 1)`` —
and the bit interleave is a sum of ``(x div 2^i) % 2 · 2^(d·i+j)``
terms, all literals, identical semantics in Spark (``div``) and
DuckDB (``//``). The bucket report is therefore hash-exact
cross-engine; no sampling, no floats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scaled_expr(
    col: str, min_expr: str, max_expr: str, bits: int, idiv: str
) -> str:
    """Rank-normalize an integer expression onto [0, 2^bits − 1]."""
    top = (1 << bits) - 1
    return (
        f"((({col}) - ({min_expr})) * {top}) {idiv} "
        f"(CASE WHEN ({max_expr}) > ({min_expr}) "
        f"THEN ({max_expr}) - ({min_expr}) ELSE 1 END)"
    )


def morton_expr(scaled_cols: list[str], bits: int, idiv: str) -> str:
    """Bit-interleave d pre-scaled dimensions (each in
    [0, 2^bits − 1]) into one z-value: dimension j contributes its
    bit i at output position d·i + j. Pure literal shifts — stays in
    whole-stage codegen."""
    d = len(scaled_cols)
    terms = []
    for j, c in enumerate(scaled_cols):
        for i in range(bits):
            terms.append(
                f"((({c}) {idiv} {1 << i}) % 2) * {1 << (d * i + j)}"
            )
    return "(" + " + ".join(terms) + ")"


def with_zvalue(
    df: DataFrame,
    dims: list[str],
    bits: int = 8,
    out_col: str = "zvalue",
) -> DataFrame:
    """Append the Morton key over integer columns ``dims``,
    min/max-normalized in-plan (one aggregate, broadcast back — a
    1-row model-state join, same device as the k-means centroids)."""
    aggs = []
    for j, c in enumerate(dims):
        aggs += [
            F.min(c).cast("bigint").alias(f"_min{j}"),
            F.max(c).cast("bigint").alias(f"_max{j}"),
        ]
    bounds = df.agg(*aggs)
    wide = df.crossJoin(F.broadcast(bounds))
    scaled = [
        scaled_expr(f"CAST({c} AS BIGINT)", f"_min{j}", f"_max{j}", bits, "div")
        for j, c in enumerate(dims)
    ]
    z = morton_expr(scaled, bits, "div")
    keep = [f for f in df.columns]
    return wide.selectExpr(
        *keep,
        *[f"CAST({s} AS BIGINT) AS _s{j}" for j, s in enumerate(scaled)],
        f"CAST({z} AS BIGINT) AS {out_col}",
    )


def layout_extents(
    df_z: DataFrame,
    n_buckets: int,
    bits: int = 8,
    n_dims: int = 2,
    zcol: str = "zvalue",
) -> DataFrame:
    """Equal-width z-range buckets (files, conceptually) with their
    per-dimension min/max rectangles — the file-skipping manifest.
    ``extent_cells`` is the rectangle volume in scaled-grid cells: the
    smaller it is relative to the full grid, the more files a
    point/range predicate skips."""
    z_span = 1 << (bits * n_dims)
    width = max(z_span // n_buckets, 1)
    g = df_z.withColumn(
        "bucket", F.expr(f"CAST(({zcol} div {width}) AS BIGINT)")
    ).groupBy("bucket")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    vol = None
    for j in range(n_dims):
        aggs += [
            F.min(f"_s{j}").alias(f"min_d{j}"),
            F.max(f"_s{j}").alias(f"max_d{j}"),
        ]
    out = g.agg(*aggs)
    for j in range(n_dims):
        side = F.col(f"max_d{j}") - F.col(f"min_d{j}") + F.lit(1)
        vol = side if vol is None else vol * side
    return out.withColumn("extent_cells", vol.cast("bigint"))
