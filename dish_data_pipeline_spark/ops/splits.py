"""Leakage-safe train/validation/test splitting.

The standard eval-integrity failure in LLM data work: hashing each
DOCUMENT id into a split puts near-duplicates on both sides of the
train/test boundary, so held-out loss silently measures
memorization. The fix is to split by DUPLICATE CLUSTER — every
member of a near-dup cluster (connected components over the LSH pair
graph, ``ops/dedup_cluster.py``) hashes to the same split because
the hash key is the cluster label, not the document id. Documents
with no near-dup are their own cluster and split independently.

Determinism contract: the assignment is
``phash(salt || cluster_id) % 100`` compared against cumulative
integer percent thresholds — the same salted 60-bit md5 hash
(``ops.portable``) both engines compute, no RNG, no floats; adding
corpus does not reassign existing clusters (the property that makes
the split stable across ingest batches at 100 TB).

Scale shape: one broadcast-free equi-join of docs to their cluster
label (both sides keyed by doc id — co-partitioned with the CC
output) and a map-side hash per row. The cluster labels come from
the existing O(log d) star-contraction CC; nothing here adds a
shuffle beyond that join.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dish_data_pipeline_spark.ops.portable import spark_phash


def _thresholds(weights: Mapping[str, int]) -> list[tuple[str, int]]:
    """Cumulative integer-percent upper bounds, insertion order."""
    if any(w <= 0 for w in weights.values()):
        raise ValueError(f"split weights must be positive: {weights}")
    if sum(weights.values()) != 100:
        raise ValueError(
            f"split weights must sum to 100, got {sum(weights.values())}"
        )
    out, acc = [], 0
    for name, w in weights.items():
        acc += w
        out.append((name, acc))
    return out


def split_case_sql(
    cluster_expr: str,
    weights: Mapping[str, int],
    salt: str,
    phash,
) -> str:
    """The split CASE over a cluster-id expression; ``phash`` is the
    engine's hash spelling (``spark_phash`` / ``duck_phash``)."""
    h = phash(f"concat('{salt}|', CAST({cluster_expr} AS STRING))")
    branches = " ".join(
        f"WHEN ({h}) % 100 < {hi} THEN '{name}'"
        for name, hi in _thresholds(weights)
    )
    return f"CASE {branches} END"


def leakage_safe_split(
    docs: DataFrame,
    clusters: DataFrame,
    weights: Mapping[str, int] | None = None,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    salt: str = "split-v1",
) -> DataFrame:
    """Assign each document the split of its duplicate cluster.

    ``clusters`` is (id_col, cluster_col) — the connected-components
    output, which covers every document (singletons label
    themselves). Output: (id_col, cluster_col, split)."""
    weights = weights or {"train": 90, "val": 5, "test": 5}
    case = split_case_sql(cluster_col, weights, salt, spark_phash)
    return (
        docs.select(id_col)
        .join(clusters, id_col)
        .selectExpr(id_col, cluster_col, f"{case} AS split")
    )
