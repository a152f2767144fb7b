"""KMV (k-minimum-values) distinct-count sketch — Bar-Yossef et al.
2002's bottom-k estimator: hash every value, keep the k smallest
distinct hashes per group; with ``h_k`` the k-th smallest over a hash
space of size ``2^60``, the distinct count is ``(k-1) * 2^60 / h_k``
(exact count when the group has fewer than k distinct values).

Why KMV and not HyperLogLog here: the estimator is PURE integer/
double arithmetic on the portable 60-bit hash, so the DuckDB oracle
reproduces the sketch — including its estimation error — bit for
bit, upgrading an "approximate" operator to full value-hash
verification. (HLL's register/rho extraction needs bit-position
intrinsics whose engine-side roundings are not portable; Spark's own
``approx_count_distinct`` IS HLL and is the right choice when no
cross-engine determinism is required.)

Scale shape: hashing is map-side; the DISTINCT on (group, hash) is
one hash-partitioned shuffle with partial aggregation; the k-th
smallest per group is a per-group sort of the ALREADY-DEDUPED hash
relation. For very-high-cardinality groups the production refinement
is a per-partition bottom-k pre-prune (keep each partition's k
smallest before the shuffle — the global bottom-k is a subset of the
union of partition bottom-ks), which bounds the sorted relation at
``k × partitions`` rows per group; at catalog scale the plain window
is the simpler, equally-correct plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dish_data_pipeline_spark.ops.portable import spark_phash

HASH_SPACE = float(1 << 60)


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_sql: str,
    k: int = 64,
) -> DataFrame:
    """Per-group distinct-count estimate of ``value_sql`` (a SQL
    expression). Returns ``(group, n_distinct, est_distinct)`` where
    ``n_distinct`` is the exact distinct-hash count (the verification
    yardstick) and ``est_distinct`` the KMV estimate."""
    hashed = df.selectExpr(
        group_col, f"{spark_phash(value_sql)} AS _h"
    ).distinct()
    exact = hashed.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_distinct")
    )
    w = Window.partitionBy(group_col).orderBy("_h")
    kth = (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == k)
        .select(group_col, F.col("_h").alias("_kth"))
    )
    est = F.when(
        F.col("_kth").isNull(), F.col("n_distinct").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("_kth").cast("double")
    )
    return (
        exact.join(kth, group_col, "left")
        .select(group_col, "n_distinct", est.alias("est_distinct"))
    )


def kmv_merge_distinct(
    df: DataFrame,
    outer_group: str,
    inner_group: str,
    value_sql: str,
    k: int = 64,
) -> DataFrame:
    """Distributed-sketch estimate: build a bottom-k sketch per
    ``(outer, inner)`` partition, then MERGE the per-partition
    sketches into one estimate per ``outer`` group. KMV merges
    losslessly — the union of per-partition bottom-k sets contains
    the global bottom-k (any hash among the k smallest globally is
    among the k smallest of its own partition) — so the merged
    estimate EQUALS the single-pass estimate, which is the property
    that lets a 1000-executor corpus scan ship k values per
    partition instead of re-scanning data (tested exactly in
    ``tests/test_round3_properties.py``-style unit tests).

    Returns ``(outer, n_partitions, est_distinct)``."""
    hashed = df.selectExpr(
        outer_group, inner_group, f"{spark_phash(value_sql)} AS _h"
    ).distinct()
    w_part = Window.partitionBy(outer_group, inner_group).orderBy("_h")
    sketches = hashed.withColumn("_rn", F.row_number().over(w_part)).filter(
        F.col("_rn") <= k
    )
    n_parts = sketches.groupBy(outer_group).agg(
        F.countDistinct(inner_group).alias("n_partitions")
    )
    merged = sketches.select(outer_group, "_h").distinct()
    w_outer = Window.partitionBy(outer_group).orderBy("_h")
    ranked = merged.withColumn("_rn", F.row_number().over(w_outer))
    counts = ranked.groupBy(outer_group).agg(F.count(F.lit(1)).alias("_n"))
    kth = ranked.filter(F.col("_rn") == k).select(
        outer_group, F.col("_h").alias("_kth")
    )
    est = F.when(
        F.col("_kth").isNull(), F.col("_n").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("_kth").cast("double")
    )
    return (
        counts.join(kth, outer_group, "left")
        .join(n_parts, outer_group)
        .select(outer_group, "n_partitions", est.alias("est_distinct"))
    )


def kmv_merge_distinct_sql(
    source_sql: str,
    outer_group: str,
    inner_group: str,
    value_sql_duck: str,
    k: int = 64,
) -> str:
    """DuckDB twin of :func:`kmv_merge_distinct`."""
    from dish_data_pipeline_spark.ops.portable import duck_phash

    return f"""
WITH src AS ({source_sql}),
hashed AS (
  SELECT DISTINCT {outer_group}, {inner_group},
         {duck_phash(value_sql_duck)} AS h FROM src),
sk AS (
  SELECT * FROM (
    SELECT {outer_group}, {inner_group}, h,
           row_number() OVER (PARTITION BY {outer_group}, {inner_group}
                              ORDER BY h) AS rn
    FROM hashed) t
  WHERE rn <= {k}),
nparts AS (
  SELECT {outer_group},
         CAST(COUNT(DISTINCT {inner_group}) AS BIGINT) AS n_partitions
  FROM sk GROUP BY {outer_group}),
merged AS (SELECT DISTINCT {outer_group}, h FROM sk),
ranked AS (
  SELECT {outer_group}, h,
         row_number() OVER (PARTITION BY {outer_group} ORDER BY h) AS rn
  FROM merged),
cnt AS (
  SELECT {outer_group}, CAST(COUNT(*) AS BIGINT) AS n
  FROM merged GROUP BY {outer_group}),
kth AS (SELECT {outer_group}, h AS kth FROM ranked WHERE rn = {k})
SELECT c.{outer_group}, p.n_partitions,
       CASE WHEN k.kth IS NULL THEN CAST(c.n AS DOUBLE)
            ELSE CAST({float(k - 1)!r} AS DOUBLE)
                 * CAST({HASH_SPACE!r} AS DOUBLE) / CAST(k.kth AS DOUBLE)
       END AS est_distinct
FROM cnt c
LEFT JOIN kth k ON k.{outer_group} = c.{outer_group}
JOIN nparts p ON p.{outer_group} = c.{outer_group}
"""


def histogram_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: Sequence[float] = (0.5, 0.9, 0.99),
    bins: int = 128,
) -> DataFrame:
    """Approximate per-group quantiles from a fixed-width histogram —
    the single-pass, bounded-state alternative to an exact
    percentile's per-group sort: at 100 TB the histogram is
    ``bins`` counters per group (mergeable across partitions by
    addition), where exact quantiles need the whole column resident.

    Two scans (per-group min/max, then bin counts — both map-side
    combined), one tiny broadcast join, cumulative window over
    ``bins`` rows per group. Estimate = left bin edge + linear
    interpolation within the crossing bin. Every step is plain
    arithmetic in a fixed order, so the DuckDB oracle reproduces the
    estimate (and its binning error) bit for bit. Degenerate groups
    (min = max) return that value for every quantile.

    Returns ``(group, q, est)`` with one row per group × quantile.
    NULL values are excluded (they would otherwise fall into the top
    bin via NULL-skipping least()); a group of only NULLs vanishes."""
    if not quantiles:
        raise ValueError("histogram_quantiles needs at least one quantile")
    df = df.filter(F.col(value_col).isNotNull())
    rng = df.groupBy(group_col).agg(
        F.min(F.col(value_col).cast("double")).alias("_lo"),
        F.max(F.col(value_col).cast("double")).alias("_hi"),
        F.count(F.lit(1)).alias("_n"),
    )
    binned = (
        df.join(F.broadcast(rng), group_col)
        .withColumn(
            "_bin",
            F.expr(
                f"CASE WHEN _hi > _lo THEN least({bins - 1}, "
                f"CAST(floor((CAST({value_col} AS DOUBLE) - _lo) "
                f"* {bins} / (_hi - _lo)) AS INT)) ELSE 0 END"
            ),
        )
        .groupBy(group_col, "_bin")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.first("_lo").alias("_lo"),
            F.first("_hi").alias("_hi"),
            F.first("_n").alias("_n"),
        )
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy("_bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = binned.withColumn("_cum", F.sum("_c").over(w))
    # ONE pass for all quantiles (mirrors the oracle's qs VALUES
    # cross join): explode the quantile literals against the cum
    # relation, keep each (group, q)'s first crossing bin. Literals
    # are double-typed Columns — Spark would parse a bare 0.9 in SQL
    # text as DECIMAL, whose exact arithmetic diverges from the
    # oracle's IEEE doubles in the last ulp.
    qcol = F.explode(
        F.array(*[F.lit(float(q)) for q in quantiles])
    ).alias("q")
    hit = (
        cum.select("*", qcol)
        .filter(F.expr("_cum >= q * _n"))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(group_col, "q").orderBy("_bin")
            ),
        )
        .filter(F.col("_rn") == 1)
    )
    est = F.expr(
        f"CASE WHEN _hi > _lo THEN _lo + (CAST(_bin AS DOUBLE) + "
        f"((q * _n - (_cum - _c)) / _c)) * (_hi - _lo) / {bins} "
        "ELSE _lo END"
    )
    return hit.select(F.col(group_col), F.col("q"), est.alias("est"))


def histogram_quantiles_sql(
    source_sql: str,
    group_col: str,
    value_col: str,
    quantiles: Sequence[float] = (0.5, 0.9, 0.99),
    bins: int = 128,
) -> str:
    """DuckDB twin of :func:`histogram_quantiles`."""
    # CAST inside VALUES: DuckDB would otherwise infer DECIMAL for
    # the quantile literals, changing both schema and arithmetic
    q_rows = ", ".join(
        f"(CAST({float(q)!r} AS DOUBLE))" for q in quantiles
    )
    return f"""
WITH src AS (
  SELECT * FROM ({source_sql}) WHERE {value_col} IS NOT NULL),
rng AS (
  SELECT {group_col}, MIN(CAST({value_col} AS DOUBLE)) AS lo,
         MAX(CAST({value_col} AS DOUBLE)) AS hi,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM src GROUP BY {group_col}),
binned AS (
  SELECT s.{group_col},
         CASE WHEN r.hi > r.lo THEN LEAST({bins - 1},
           CAST(floor((CAST(s.{value_col} AS DOUBLE) - r.lo)
                * {bins} / (r.hi - r.lo)) AS INT)) ELSE 0 END AS bin,
         CAST(COUNT(*) AS BIGINT) AS c,
         MIN(r.lo) AS lo, MIN(r.hi) AS hi, MIN(r.n) AS n
  FROM src s JOIN rng r ON r.{group_col} = s.{group_col}
  GROUP BY 1, 2),
cum AS (
  SELECT *, SUM(c) OVER (PARTITION BY {group_col} ORDER BY bin
                         ROWS UNBOUNDED PRECEDING) AS cumc
  FROM binned),
qs(q) AS (VALUES {q_rows}),
hit AS (
  SELECT *, row_number() OVER (PARTITION BY {group_col}, q
                               ORDER BY bin) AS rn
  FROM cum CROSS JOIN qs
  WHERE cumc >= q * n)
SELECT {group_col}, q,
       CASE WHEN hi > lo THEN lo + (CAST(bin AS DOUBLE) +
         ((q * n - (cumc - c)) / c)) * (hi - lo) / {bins}
       ELSE lo END AS est
FROM hit WHERE rn = 1
"""


def kmv_distinct_sql(
    source_sql: str, group_col: str, value_sql_duck: str, k: int = 64
) -> str:
    """DuckDB twin of :func:`kmv_distinct` — same hash, same rank,
    same double arithmetic, hence bit-identical estimates.
    ``source_sql`` must yield the group column and whatever
    ``value_sql_duck`` references."""
    from dish_data_pipeline_spark.ops.portable import duck_phash

    return f"""
WITH src AS ({source_sql}),
hashed AS (
  SELECT DISTINCT {group_col}, {duck_phash(value_sql_duck)} AS h FROM src),
exact AS (
  SELECT {group_col}, CAST(COUNT(*) AS BIGINT) AS n_distinct
  FROM hashed GROUP BY {group_col}),
ranked AS (
  SELECT {group_col}, h,
         row_number() OVER (PARTITION BY {group_col} ORDER BY h) AS rn
  FROM hashed),
kth AS (SELECT {group_col}, h AS kth FROM ranked WHERE rn = {k})
SELECT e.{group_col}, e.n_distinct,
       CASE WHEN k.kth IS NULL THEN CAST(e.n_distinct AS DOUBLE)
            ELSE CAST({float(k - 1)!r} AS DOUBLE)
                 * CAST({HASH_SPACE!r} AS DOUBLE) / CAST(k.kth AS DOUBLE)
       END AS est_distinct
FROM exact e LEFT JOIN kth k ON k.{group_col} = e.{group_col}
"""

# --- Count-min frequency sketch -----------------------------------
# Cormode & Muthukrishnan 2005: d universal-hash rows × w buckets of
# counters; a value's frequency estimate is the MIN of its d bucket
# counters (always ≥ the true count — collisions only add). The
# counter table is one groupBy over (group, row, bucket) with full
# map-side combine, and MERGING sketches is plain counter addition
# (sum is associative), so a 1000-executor corpus scan ships
# d × w counters per partition, never re-scanning data. Like the KMV
# sketch above, all arithmetic is portable integer math on the 60-bit
# md5 hash, so the DuckDB oracle reproduces the sketch — including
# its overestimation error — bit for bit.


def _cms_buckets(coeffs, w: int):
    """Array of (row, bucket) structs for a hash column ``_h``."""
    from dish_data_pipeline_spark.ops.portable import perm_expr

    return F.array(
        *[
            F.struct(
                F.lit(i).alias("_i"),
                F.expr(f"({perm_expr('_h', a, b)}) % {w}").alias("_b"),
            )
            for i, (a, b) in enumerate(coeffs)
        ]
    )


def cms_counters(
    df: DataFrame,
    group_col: str,
    value_col: str,
    d: int = 4,
    w: int = 64,
    seed: int = 9,
) -> DataFrame:
    """The CMS counter relation ``(group, _i, _b, _cnt)`` — the
    sketch STATE, exposed separately because it is what distributed
    and streaming tiers exchange: counters merge by plain addition,
    so a streaming aggregation with this groupBy holds exactly
    ``d × w`` rows of state per group, and per-partition counter
    tables sum to the global sketch. Works unchanged on a streaming
    DataFrame (explode + groupBy-count are both supported)."""
    from dish_data_pipeline_spark.ops.portable import perm_coeffs

    coeffs = perm_coeffs(d, seed)
    base = df.select(
        F.col(group_col), F.expr(spark_phash(value_col)).alias("_h")
    )
    return _counters_from_base(base, group_col, coeffs, w)


def _counters_from_base(base: DataFrame, group_col: str, coeffs, w: int) -> DataFrame:
    """Counter relation from a pre-hashed base ``(group, ..., _h)`` —
    shared by :func:`cms_counters` and :func:`count_min_freq` so a
    caller that also needs true counts hashes the input ONCE."""
    return (
        base.select(group_col, F.explode(_cms_buckets(coeffs, w)).alias("_s"))
        .select(group_col, F.col("_s._i").alias("_i"), F.col("_s._b").alias("_b"))
        .groupBy(group_col, "_i", "_b")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )


def count_min_freq(
    df: DataFrame,
    group_col: str,
    value_col: str,
    d: int = 4,
    w: int = 64,
    k: int = 10,
    seed: int = 9,
) -> DataFrame:
    """Per-group CMS frequency estimates for the top-``k`` values by
    TRUE frequency (the verification yardstick — at 100 TB the true
    counts are exactly what you cannot afford, and the heavy-hitter
    candidates come from a stream or a sample instead). Input is one
    row per value OCCURRENCE; returns
    ``(group, value, true_count, cms_count)`` with ``cms_count >=
    true_count`` by construction."""
    from dish_data_pipeline_spark.cache_registry import tracked_persist
    from dish_data_pipeline_spark.ops.portable import perm_coeffs

    coeffs = perm_coeffs(d, seed)
    # Tokenize-and-hash ONCE: both the counter relation and the true
    # counts derive from this persisted base (md5 over the full input
    # is the dominant map cost — recomputing it per branch doubled it).
    base = tracked_persist(
        df.select(
            F.col(group_col),
            F.col(value_col).alias("_v"),
            F.expr(spark_phash(value_col)).alias("_h"),
        )
    )
    buckets = _cms_buckets(coeffs, w)
    counters = _counters_from_base(base, group_col, coeffs, w)
    true_counts = base.groupBy(group_col, "_v", "_h").agg(
        F.count(F.lit(1)).alias("true_count")
    )
    w_rank = Window.partitionBy(group_col).orderBy(
        F.desc("true_count"), F.asc("_v")
    )
    topk = (
        true_counts.withColumn("_rn", F.row_number().over(w_rank))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
    probes = topk.select(
        group_col, "_v", "true_count", F.explode(buckets).alias("_s")
    ).select(
        group_col,
        "_v",
        "true_count",
        F.col("_s._i").alias("_i"),
        F.col("_s._b").alias("_b"),
    )
    return (
        probes.join(counters, [group_col, "_i", "_b"])
        .groupBy(group_col, "_v", "true_count")
        .agg(F.min("_cnt").alias("cms_count"))
        .select(
            group_col,
            F.col("_v").alias("value"),
            "true_count",
            "cms_count",
        )
    )


def count_min_freq_sql(
    source_sql: str,
    group_col: str,
    value_col: str,
    d: int = 4,
    w: int = 64,
    k: int = 10,
    seed: int = 9,
) -> str:
    """DuckDB twin of :func:`count_min_freq` (same perms, same
    bucket arithmetic, same tie-break)."""
    from dish_data_pipeline_spark.ops.portable import (
        duck_phash,
        perm_coeffs,
        perm_expr,
    )

    coeffs = perm_coeffs(d, seed)
    bucket_rows = " UNION ALL ".join(
        f"SELECT {group_col}, v, h, {i} AS i, "
        f"(({perm_expr('h', a, b)}) % {w}) AS b FROM base"
        for i, (a, b) in enumerate(coeffs)
    )
    return f"""
WITH src AS ({source_sql}),
base AS (
  SELECT {group_col}, {value_col} AS v,
         {duck_phash(value_col)} AS h
  FROM src),
expanded AS ({bucket_rows}),
counters AS (
  SELECT {group_col}, i, b, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM expanded GROUP BY {group_col}, i, b),
true_counts AS (
  SELECT {group_col}, v, h, CAST(COUNT(*) AS BIGINT) AS true_count
  FROM base GROUP BY {group_col}, v, h),
topk AS (
  SELECT * FROM (
    SELECT {group_col}, v, h, true_count,
           row_number() OVER (PARTITION BY {group_col}
                              ORDER BY true_count DESC, v ASC) AS rn
    FROM true_counts) t
  WHERE rn <= {k}),
probes AS (
  {" UNION ALL ".join(
      f"SELECT {group_col}, v, true_count, {i} AS i, "
      f"(({perm_expr('h', a, b)}) % {w}) AS b FROM topk"
      for i, (a, b) in enumerate(coeffs))})
SELECT p.{group_col}, p.v AS value, p.true_count,
       CAST(MIN(c.cnt) AS BIGINT) AS cms_count
FROM probes p
JOIN counters c
  ON c.{group_col} = p.{group_col} AND c.i = p.i AND c.b = p.b
GROUP BY p.{group_col}, p.v, p.true_count
"""


def kmv_overlap_estimate(
    a: DataFrame,
    b: DataFrame,
    value_sql_a: str,
    value_sql_b: str,
    k: int = 64,
) -> DataFrame:
    """KMV set-operation estimator (Beyer et al. 2007): estimate the
    distinct-key union, Jaccard similarity, and intersection of two
    relations' key sets from bottom-k sketches — the join-planning
    diagnostic ("how many keys actually overlap?") that costs two
    distinct-scans and k rows instead of an exact join.

    Mechanics: hash each side's distinct keys (portable 60-bit hash,
    so the DuckDB oracle replicates the sketch bit-exactly), mark
    membership with a hash-space full-outer join (distinct-key-sized,
    NOT row-sized), take the global bottom-k (Spark plans
    ``orderBy.limit(k)`` as TakeOrderedAndProject — per-partition
    top-k merged at the driver, no global sort shuffle), then read
    the three estimates off those k rows: τ = the k-th smallest hash,
    D̂_∪ = (k−1)·2⁶⁰/τ (or the exact count when fewer than k),
    ρ̂ = |both-members among the k| / k, D̂_∩ = ρ̂ · D̂_∪.

    Output (1 row): n_sketch, tau, est_union, jaccard,
    est_intersection — every value a fixed chain of IEEE ops on
    exact integers: cross-engine hash-exact."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    ha = a.selectExpr(f"{spark_phash(value_sql_a)} AS _h").distinct().withColumn(
        "_in_a", F.lit(1)
    )
    hb = b.selectExpr(f"{spark_phash(value_sql_b)} AS _h").distinct().withColumn(
        "_in_b", F.lit(1)
    )
    u = ha.join(hb, "_h", "full_outer")
    bottom = u.orderBy(F.asc("_h")).limit(k)
    n = F.count(F.lit(1)).cast("bigint")
    tau = F.max("_h").cast("bigint")
    n_both = F.sum(
        (F.col("_in_a").isNotNull() & F.col("_in_b").isNotNull()).cast("bigint")
    ).cast("bigint")
    agg = bottom.agg(n.alias("n_sketch"), tau.alias("tau"), n_both.alias("n_both"))
    est_union = F.when(
        F.col("n_sketch") < k, F.col("n_sketch").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("tau").cast("double")
    )
    jaccard = F.col("n_both").cast("double") / F.col("n_sketch").cast("double")
    return agg.select(
        "n_sketch",
        "tau",
        est_union.alias("est_union"),
        jaccard.alias("jaccard"),
        (jaccard * est_union).alias("est_intersection"),
    )


# --- HyperLogLog ---------------------------------------------------
HLL_P = 8  # 2^8 = 256 registers — ~6.5% relative error (1.04/sqrt(m))


def _hll_consts(p: int) -> tuple[int, int, int, float]:
    """(m, rest_bits, scale_bits, numerator): registers, suffix bits
    of the 60-bit hash, the dyadic scale, and the precomputed
    ``alpha_m · m² · 2^scale_bits`` double both engines embed as the
    SAME scientific literal (one shared constant, one IEEE division
    at the end)."""
    m = 1 << p
    rest_bits = 60 - p
    scale_bits = rest_bits + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return m, rest_bits, scale_bits, alpha * m * m * float(1 << scale_bits)


def _bitlen_cases(expr: str, max_bits: int) -> str:
    """Integer bit length as an unrolled comparison chain — pure
    BIGINT compares, exactly portable across engines (no log2: libm
    is not correctly rounded)."""
    cases = " ".join(
        f"WHEN {expr} >= {1 << (b - 1)} THEN {b}"
        for b in range(max_bits, 0, -1)
    )
    return f"CASE {cases} ELSE 0 END"


def hll_distinct(
    df: DataFrame,
    group_col: str,
    value_sql: str,
    p: int = HLL_P,
) -> DataFrame:
    """Per-group HyperLogLog distinct estimate (Flajolet et al.
    2007) next to the exact yardstick — the KMV companion for the
    regime where even a bottom-k sketch is too much state: 2^p
    one-byte registers per group, mergeable by register-wise MAX
    (which is exactly what the groupBy MAX computes, so
    per-partition sketches merge for free in the map-side combine).

    Determinism contract: register index/rank come from integer
    splits of the portable 60-bit hash (bit length via an unrolled
    compare chain — no log2), and the harmonic denominator is summed
    as EXACT dyadic BIGINTs (``2^(scale−rank)``; ≤ 2^61 total, no
    float order-dependence), so the estimate is one shared-literal
    multiply + one IEEE division — bit-identical cross-engine. The
    raw HLL estimator only (no small-range linear-counting branch:
    it needs ln, which is not correctly rounded across engines);
    accuracy below ~2.5·m distincts is the caller's concern.

    Output: (group, n_distinct exact, n_registers, est_distinct)."""
    m, rest_bits, scale_bits, numerator = _hll_consts(p)
    hashed = df.selectExpr(
        group_col, f"{spark_phash(value_sql)} AS _h"
    ).distinct()
    rank = (
        f"{scale_bits} - ({_bitlen_cases(f'(_h % {1 << rest_bits})', rest_bits)})"
    )
    regs = (
        hashed.selectExpr(
            group_col,
            f"_h div {1 << rest_bits} AS _idx",
            f"CAST({rank} AS BIGINT) AS _rank",
        )
        .groupBy(group_col, "_idx")
        .agg(F.max("_rank").alias("_r"))
    )
    # exact dyadic harmonic sum: present registers contribute
    # 2^(scale - r), absent ones 2^scale each
    agg = regs.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_registers"),
        F.sum(
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST({scale_bits} - _r AS INT))"
            )
        ).cast("bigint").alias("_s_present"),
    )
    exact = hashed.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_distinct")
    )
    s_total = F.col("_s_present") + (
        (F.lit(m).cast("bigint") - F.col("n_registers"))
        * F.lit(1 << scale_bits).cast("bigint")
    )
    return (
        exact.join(agg, group_col)
        .select(
            group_col,
            "n_distinct",
            "n_registers",
            (F.expr(f"{numerator:.17e}") / s_total.cast("double"))
            .alias("est_distinct"),
        )
    )


def hll_distinct_sql(
    src_sql: str, group_col: str, value_col: str, p: int = HLL_P
) -> str:
    """DuckDB twin of :func:`hll_distinct` over ``src_sql``."""
    from dish_data_pipeline_spark.ops.portable import duck_phash

    m, rest_bits, scale_bits, numerator = _hll_consts(p)
    h = duck_phash(value_col)
    rank = f"{scale_bits} - ({_bitlen_cases(f'(h % {1 << rest_bits})', rest_bits)})"
    return f"""
WITH hashed AS (
  SELECT DISTINCT {group_col} AS g, {h} AS h FROM ({src_sql}) src),
regs AS (
  SELECT g, h // {1 << rest_bits} AS idx,
         CAST(MAX({rank}) AS BIGINT) AS r
  FROM hashed GROUP BY 1, 2),
agg AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_registers,
         CAST(SUM(CAST(1 AS BIGINT) << CAST({scale_bits} - r AS INTEGER))
              AS BIGINT) AS s_present
  FROM regs GROUP BY 1),
exact AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_distinct FROM hashed GROUP BY 1)
SELECT exact.g AS {group_col}, n_distinct, n_registers,
       {numerator:.17e} / CAST(s_present
         + ({m} - n_registers) * (CAST(1 AS BIGINT) << {scale_bits})
         AS DOUBLE) AS est_distinct
FROM exact JOIN agg USING (g)
"""


def hll_sliding(
    df: DataFrame,
    group_col: str,
    value_sql: str,
    ts_sql: str,
    window_days: int = 7,
    p: int = HLL_P,
) -> DataFrame:
    """Trailing-window distinct counts from MERGED daily HLL
    sketches — the 100 TB shape for "distinct users per key over the
    trailing N days": the raw data is scanned ONCE to build 2^p
    one-byte registers per (key, day); every trailing window is then
    answered by register-wise MAX over ≤ N register sets (a
    sketch-sized explode+max, never a re-scan of the raw rows, and
    daily sketches are reusable across window widths).

    Same determinism contract as :func:`hll_distinct` (integer
    register split of the portable hash, dyadic-BIGINT harmonic sum,
    one shared-literal multiply + one IEEE division), so the window
    estimates are bit-identical cross-engine. The exact trailing
    distinct is computed alongside as the yardstick (that one does
    fan out the distinct hashes ×N — it exists to certify the
    sketch, not to be the scale path).

    Days are epoch-day integers internally; output windows end on
    days the group actually has data (trailing windows over silent
    days are suppressed). Output: ``(group, window_end DATE,
    n_distinct, n_registers, est_distinct)``."""
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    m, rest_bits, scale_bits, numerator = _hll_consts(p)
    hashed = df.selectExpr(
        f"{group_col} AS _g",
        f"datediff(CAST({ts_sql} AS DATE), DATE'1970-01-01') AS _d",
        f"{spark_phash(value_sql)} AS _h",
    ).distinct()
    rank = (
        f"{scale_bits} - ({_bitlen_cases(f'(_h % {1 << rest_bits})', rest_bits)})"
    )
    regs = (
        hashed.selectExpr(
            "_g",
            "_d",
            f"_h div {1 << rest_bits} AS _idx",
            f"CAST({rank} AS BIGINT) AS _rank",
        )
        .groupBy("_g", "_d", "_idx")
        .agg(F.max("_rank").alias("_r"))
    )
    days = hashed.select("_g", "_d").distinct()
    serve = F.expr(f"explode(sequence(_d, _d + {window_days - 1}))").alias(
        "_dout"
    )
    wregs = (
        regs.select("_g", "_idx", "_r", serve)
        .join(days.selectExpr("_g", "_d AS _dout"), ["_g", "_dout"], "left_semi")
        .groupBy("_g", "_dout", "_idx")
        .agg(F.max("_r").alias("_r"))
    )
    agg = wregs.groupBy("_g", "_dout").agg(
        F.count(F.lit(1)).alias("n_registers"),
        F.sum(
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST({scale_bits} - _r AS INT))"
            )
        ).cast("bigint").alias("_s_present"),
    )
    exact = (
        hashed.select("_g", "_h", serve)
        .join(days.selectExpr("_g", "_d AS _dout"), ["_g", "_dout"], "left_semi")
        .select("_g", "_dout", "_h")
        .distinct()
        .groupBy("_g", "_dout")
        .agg(F.count(F.lit(1)).alias("n_distinct"))
    )
    s_total = F.col("_s_present") + (
        (F.lit(m).cast("bigint") - F.col("n_registers"))
        * F.lit(1 << scale_bits).cast("bigint")
    )
    return (
        exact.join(agg, ["_g", "_dout"])
        .select(
            F.col("_g").alias(group_col),
            F.expr("date_add(DATE'1970-01-01', CAST(_dout AS INT))").alias(
                "window_end"
            ),
            "n_distinct",
            "n_registers",
            (F.expr(f"{numerator:.17e}") / s_total.cast("double"))
            .alias("est_distinct"),
        )
    )


def hll_sliding_sql(
    src_sql: str,
    group_col: str,
    value_sql: str,
    ts_sql: str,
    window_days: int = 7,
    p: int = HLL_P,
) -> str:
    """DuckDB twin of :func:`hll_sliding` over ``src_sql``."""
    from dish_data_pipeline_spark.ops.portable import duck_phash

    m, rest_bits, scale_bits, numerator = _hll_consts(p)
    h = duck_phash(value_sql)
    rank = f"{scale_bits} - ({_bitlen_cases(f'(h % {1 << rest_bits})', rest_bits)})"
    w = window_days - 1
    return f"""
WITH hashed AS (
  SELECT DISTINCT {group_col} AS g,
         datediff('day', DATE '1970-01-01', CAST({ts_sql} AS DATE)) AS d,
         {h} AS h
  FROM ({src_sql}) src),
days AS (SELECT DISTINCT g, d FROM hashed),
regs AS (
  SELECT g, d, h // {1 << rest_bits} AS idx,
         CAST(MAX({rank}) AS BIGINT) AS r
  FROM hashed GROUP BY 1, 2, 3),
serv AS (
  SELECT r.g, s.d_out, r.idx, r.r
  FROM regs r,
       LATERAL (SELECT unnest(generate_series(r.d, r.d + {w})) AS d_out) s
  JOIN days dy ON dy.g = r.g AND dy.d = s.d_out),
wregs AS (
  SELECT g, d_out, idx, MAX(r) AS r FROM serv GROUP BY 1, 2, 3),
agg AS (
  SELECT g, d_out, CAST(COUNT(*) AS BIGINT) AS n_registers,
         CAST(SUM(CAST(1 AS BIGINT) << CAST({scale_bits} - r AS INTEGER))
              AS BIGINT) AS s_present
  FROM wregs GROUP BY 1, 2),
exact AS (
  SELECT g, d_out, CAST(COUNT(DISTINCT hh) AS BIGINT) AS n_distinct
  FROM (
    SELECT hs.g, s.d_out, hs.h AS hh
    FROM hashed hs,
         LATERAL (SELECT unnest(generate_series(hs.d, hs.d + {w})) AS d_out) s
    JOIN days dy ON dy.g = hs.g AND dy.d = s.d_out) x
  GROUP BY 1, 2)
SELECT exact.g AS {group_col},
       DATE '1970-01-01' + CAST(exact.d_out AS INTEGER) AS window_end,
       n_distinct, n_registers,
       {numerator:.17e} / CAST(s_present
         + ({m} - n_registers) * (CAST(1 AS BIGINT) << {scale_bits})
         AS DOUBLE) AS est_distinct
FROM exact JOIN agg ON agg.g = exact.g AND agg.d_out = exact.d_out
"""
