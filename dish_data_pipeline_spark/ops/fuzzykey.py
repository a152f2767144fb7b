"""Fuzzy key matching: exact edit-distance-1 pair join via deletion
neighborhoods (the FastSS / symmetric-delete family — Bocek et al.,
"Fast Similarity Search in Large Dictionaries", 2007; the device
behind SymSpell-style spell correction).

Entity resolution needs "these two keys are the same up to a typo" —
a different problem from document near-dup (``ops/dedup_fuzzy``,
``ops/setsim``): keys are short, so shingles carry no signal, but
edit distance is meaningful and tiny. The blocking here is EXACT,
not probabilistic: two strings are within Levenshtein distance 1 iff
their deletion neighborhoods intersect — where a string's
neighborhood is itself plus every single-character deletion
(|s| + 1 variants):

- substitution at i  → both sides' delete-at-i agree;
- insertion/deletion → the longer side's delete-at-i IS the shorter;
- equality           → the strings themselves agree.

So an equi-join on neighborhood members yields a candidate superset
with NO false negatives, and one exact ``levenshtein`` evaluation
per candidate keeps the true pairs. Determinism: candidate
membership is string equality, the verify is an exact integer DP —
nothing float anywhere, so the DuckDB brute-force oracle (all pairs,
``levenshtein ≤ 1``) hash-matches exactly and independently proves
the blocking loses nothing.

Scale shape: the neighborhood explode is a map-side O(len) blowup
per row; the join is a plain equi-join on the variant string (hash
the variant for fixed-width keys at petabyte scale); the verify
touches candidates only. Nothing quadratic. k > 1 generalizes with
k-deletion neighborhoods (O(len^k) variants — the standard FastSS
trade); this operator deliberately ships the k = 1 tier, the common
dedup-key case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edit1_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
) -> DataFrame:
    """All id pairs whose ``str_col`` values are within Levenshtein
    distance 1 (including exact equals at distance 0), ``id_a <
    id_b``. NULL keys never match (SQL equality semantics). Output:
    (id_a, id_b, dist INT)."""
    variants = F.expr(
        "array_union(array(_s), "
        "transform(sequence(1, length(_s)), "
        "i -> concat(substring(_s, 1, i - 1), substring(_s, i + 1))))"
    )
    nb = (
        df.select(
            F.col(id_col).alias("_id"),
            F.col(str_col).alias("_s"),
        )
        .filter(F.col("_s").isNotNull())
        .select("_id", "_s", F.explode(variants).alias("_v"))
    )
    a = nb.select(
        F.col("_id").alias("id_a"), F.col("_s").alias("_sa"), "_v"
    )
    b = nb.select(
        F.col("_id").alias("id_b"), F.col("_s").alias("_sb"), "_v"
    )
    return (
        a.join(b, "_v")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_sa", "_sb")
        .distinct()
        .withColumn("dist", F.levenshtein("_sa", "_sb"))
        .filter(F.col("dist") <= 1)
        .select("id_a", "id_b", F.col("dist").cast("int").alias("dist"))
    )


def edit1_pairs_sql(src_sql: str, id_col: str, str_col: str) -> str:
    """Brute-force DuckDB oracle: ALL pairs, exact ``levenshtein`` —
    an independent algorithm (no neighborhood blocking), so the hash
    match proves the deletion-neighborhood candidates are complete."""
    return f"""
WITH keys AS (
  SELECT {id_col} AS id, {str_col} AS s FROM ({src_sql}) src
  WHERE {str_col} IS NOT NULL)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(levenshtein(a.s, b.s) AS INTEGER) AS dist
FROM keys a JOIN keys b ON a.id < b.id
WHERE levenshtein(a.s, b.s) <= 1
"""
