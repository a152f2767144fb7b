"""Planar proximity self-join — the grid-cell spatial join device.

"All pairs of points within distance r" is a cross join written
naively (100 TB non-starter). The standard distributed spelling
snaps each point to an r-sized grid cell; any qualifying pair lies
in the same or an adjacent cell, so expanding ONE side to its 3×3
cell neighborhood turns the distance join into an EQUI-join on the
cell key, with the exact predicate re-checked on candidates.
Each unordered pair is found exactly once: the pair (p, q) with
``id_p < id_q`` matches only where p's expanded neighborhood meets
q's single home cell.

Exactness: with integer coordinates the squared distance
``(Δx)² + (Δy)²`` is exact BIGINT arithmetic — no sqrt, no trig
(libm vs JVM trig split last-ulp cross-engine; this module never
calls either). Geographic use at scale swaps the integer plane for
a geohash and the squared distance for haversine — the banding
shape is identical; the exactness contract is what changes.

Reference scope: the reference pipeline has no spatial operator;
§2.13 extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def proximity_join(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
) -> DataFrame:
    """All unordered pairs at squared distance ≤ ``radius²``, as
    ``(id_a, id_b, dist2)`` with ``id_a < id_b``. Integer
    coordinates required (the exactness contract above); NULL
    coordinates never pair. One shuffle per side on the cell key;
    the left side replicates 9× (its 3×3 cell neighborhood) — a
    constant, not data-dependent, expansion.
    """
    if radius <= 0:
        raise ValueError(f"radius must be positive, got {radius}")
    pts = points.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        F.col(id_col).alias("_id"),
        F.col(x_col).cast("bigint").alias("_x"),
        F.col(y_col).cast("bigint").alias("_y"),
    )
    g = int(radius)
    home = pts.withColumn("_cx", F.floor(F.col("_x") / g)).withColumn(
        "_cy", F.floor(F.col("_y") / g)
    )
    off = F.expr("explode(sequence(-1, 1))")
    probe = (
        home.withColumn("_dx", off)
        .withColumn("_dy", F.expr("explode(sequence(-1, 1))"))
        .select(
            F.col("_id").alias("_id_a"),
            F.col("_x").alias("_xa"),
            F.col("_y").alias("_ya"),
            (F.col("_cx") + F.col("_dx")).alias("_cx"),
            (F.col("_cy") + F.col("_dy")).alias("_cy"),
        )
    )
    build = home.select(
        F.col("_id").alias("_id_b"),
        F.col("_x").alias("_xb"),
        F.col("_y").alias("_yb"),
        "_cx",
        "_cy",
    )
    d2 = (F.col("_xa") - F.col("_xb")) * (F.col("_xa") - F.col("_xb")) + (
        F.col("_ya") - F.col("_yb")
    ) * (F.col("_ya") - F.col("_yb"))
    return (
        probe.join(build, ["_cx", "_cy"])
        .filter(F.col("_id_a") < F.col("_id_b"))
        .withColumn("dist2", d2)
        .filter(F.col("dist2") <= g * g)
        .select(
            F.col("_id_a").alias("id_a"),
            F.col("_id_b").alias("id_b"),
            "dist2",
        )
    )
