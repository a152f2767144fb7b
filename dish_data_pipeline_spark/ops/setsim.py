"""Exact set-similarity join via prefix filtering (the PPJoin family
— Xiao et al., "Efficient Similarity Joins for Near Duplicate
Detection", WWW 2008).

The LSH tiers (``ops/dedup_fuzzy.py``) trade recall for bounded work;
this operator is the EXACT complement: every document pair with
token-set Jaccard ≥ τ is returned, no false negatives, without the
all-pairs cross join. The pruning argument: order each document's
distinct tokens by global rarity (rarest first); if two sets have
Jaccard ≥ τ, they must share at least one token among each other's
first ``n − ⌊τ·n⌋ + 1`` tokens (the prefix) — so equi-joining on
prefix tokens generates a candidate superset, and an exact verify
pass keeps the true pairs. Rarest-first ordering makes prefix tokens
the least-frequent ones, which simultaneously minimizes candidate
volume and join skew.

Determinism contract: the threshold is an integer PERCENT and the
acceptance test is pure integer (``inter · 100 ≥ τ_pct · union``) —
no float comparison anywhere in the decision path; the reported
jaccard is one IEEE division of exact BIGINTs. The prefix length
uses the floor form (``n − floor(τ·n) + 1``), which is ≥ the
theoretical minimum for any IEEE rounding of ``τ·n`` — float error
can only lengthen the prefix (more candidates), never lose a pair.

Scale shape: one token-frequency aggregate, one per-doc sort
(rarity-ordered token array), a prefix-token equi-join whose volume
the prefix bound controls, then a verify join on doc ids. All
exchanges are key-bounded; nothing is quadratic in the corpus. The
brute-force DuckDB oracle (all pairs + length filter) independently
proves the candidate generation loses nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dish_data_pipeline_spark.ops.text import TOKEN_RE


def jaccard_similarity_join(
    df: DataFrame,
    tau_pct: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 1,
) -> DataFrame:
    """All pairs whose element-set Jaccard ≥ ``tau_pct``/100 — exact.
    Elements are distinct word ``shingle_n``-grams (1 = bare tokens;
    2+ = order-sensitive shingles, the usual near-dup signal — bare
    token SETS saturate on small vocabularies). Output: (id_a, id_b,
    n_inter, n_union, jaccard), id_a < id_b."""
    if not 0 < tau_pct <= 100:
        raise ValueError(f"tau_pct must be in (0, 100], got {tau_pct}")
    if shingle_n < 1:
        raise ValueError(f"shingle_n must be >= 1, got {shingle_n}")
    toks_arr = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0
    )
    if shingle_n == 1:
        elems = F.col("_w")
    else:
        join_expr = " || ' ' || ".join(
            f"element_at(_w, i + {j})" for j in range(shingle_n)
        )
        # CASE guard, not greatest(.., 0): Spark's sequence(1, 0)
        # steps BACKWARD ([1, 0]) instead of yielding empty
        elems = F.expr(
            f"CASE WHEN size(_w) < {shingle_n} THEN array() "
            f"ELSE transform(sequence(1, size(_w) - {shingle_n - 1}), "
            f"i -> {join_expr}) END"
        )
    toks = (
        df.select(F.col(id_col).alias("_id"), toks_arr.alias("_w"))
        .select("_id", F.explode(F.array_distinct(elems)).alias("_t"))
    )
    freq = toks.groupBy("_t").agg(F.count(F.lit(1)).alias("_f"))
    # rarity-ordered token sequence per doc (ties → token asc, so the
    # ordering — and therefore the prefix — is deterministic)
    ordered = (
        toks.join(freq, "_t")
        .groupBy("_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(_f, _t))), s -> s._t)"
            ).alias("_toks")
        )
        .withColumn("_n", F.size("_toks").cast("bigint"))
        .filter(F.col("_n") > 0)
    )
    from dish_data_pipeline_spark.cache_registry import tracked_persist

    ordered = tracked_persist(ordered)
    # prefix length n - floor(tau*n/100) + 1, in pure integers
    prefix = ordered.select(
        "_id",
        "_n",
        F.explode(
            F.expr(f"slice(_toks, 1, _n - (_n * {int(tau_pct)}) div 100 + 1)")
        ).alias("_t"),
    )
    a = prefix.select(
        F.col("_id").alias("id_a"), F.col("_n").alias("_na"), "_t"
    )
    b = prefix.select(
        F.col("_id").alias("id_b"), F.col("_n").alias("_nb"), "_t"
    )
    cands = (
        a.join(b, "_t")
        .filter(F.col("id_a") < F.col("id_b"))
        # PPJoin length filter: tau*na <= nb <= na/tau (integer form)
        .filter(F.col("_nb") * 100 >= F.col("_na") * tau_pct)
        .filter(F.col("_nb") * tau_pct <= F.col("_na") * 100)
        .select("id_a", "id_b")
        .distinct()
    )
    ta = ordered.select(
        F.col("_id").alias("id_a"),
        F.col("_toks").alias("_ta"),
        F.col("_n").alias("_na"),
    )
    tb = ordered.select(
        F.col("_id").alias("id_b"),
        F.col("_toks").alias("_tb"),
        F.col("_n").alias("_nb"),
    )
    inter = F.size(F.array_intersect("_ta", "_tb")).cast("bigint")
    return (
        cands.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("n_inter", inter)
        .withColumn("n_union", F.col("_na") + F.col("_nb") - inter)
        # integer acceptance — no float in the decision path
        .filter(F.col("n_inter") * 100 >= F.col("n_union") * tau_pct)
        .select(
            "id_a",
            "id_b",
            "n_inter",
            "n_union",
            (F.col("n_inter").cast("double") / F.col("n_union").cast("double"))
            .alias("jaccard"),
        )
    )


def jaccard_similarity_join_sql(
    src_sql: str, tau_pct: int = 60, id_col: str = "doc_id",
    shingle_n: int = 1,
) -> str:
    """Brute-force DuckDB oracle: ALL doc pairs, exact element-set
    intersection/union, the identical integer acceptance — an
    INDEPENDENT implementation (no prefix filter), so a hash match
    proves the Spark candidate generation is lossless, not merely
    self-consistent."""
    if shingle_n == 1:
        elems = f"regexp_extract_all(lower(text), '{TOKEN_RE}')"
    else:
        join_expr = " || ' ' || ".join(
            f"w[i + {j}]" for j in range(shingle_n)
        )
        elems = (
            f"list_transform(generate_series(1, greatest(len(w) - "
            f"{shingle_n - 1}, 0)), i -> {join_expr})"
        )
    return f"""
WITH words AS (
  SELECT {id_col} AS id,
         regexp_extract_all(lower(text), '{TOKEN_RE}') AS w
  FROM ({src_sql}) src),
toks AS (
  SELECT id, list_distinct({elems}) AS ts FROM words),
sized AS (
  SELECT id, ts, CAST(len(ts) AS BIGINT) AS n FROM toks WHERE len(ts) > 0),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
         CAST(len(list_intersect(a.ts, b.ts)) AS BIGINT) AS n_inter,
         a.n + b.n - CAST(len(list_intersect(a.ts, b.ts)) AS BIGINT)
           AS n_union
  FROM sized a JOIN sized b ON a.id < b.id)
SELECT id_a, id_b, n_inter, n_union,
       CAST(n_inter AS DOUBLE) / CAST(n_union AS DOUBLE) AS jaccard
FROM pairs WHERE n_inter * 100 >= n_union * {int(tau_pct)}
"""


def containment_pairs(
    df: DataFrame,
    tau_pct: int = 80,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """ASYMMETRIC set containment: ordered pairs where at least
    ``tau_pct``% of doc ``id_a``'s elements also occur in ``id_b`` —
    quote/excerpt/subset detection, which Jaccard misses by
    construction (a paragraph quoted inside a book has near-zero
    Jaccard but containment ≈ 1).

    Exact, and simpler than the prefix filter: containment ≥ τ > 0
    implies ≥ 1 shared element, so the shared-element equi-join is
    already a COMPLETE candidate generator — and because each shared
    element contributes exactly one joined row per pair (elements
    are distinct per doc), ``|∩|`` is just the per-pair row count:
    explode → self-join → count, no array re-intersection. Same
    integer acceptance discipline as :func:`jaccard_similarity_join`
    (``inter · 100 ≥ τ_pct · n_a``, floats only in the reported
    ratio). Skew note: a corpus-wide boilerplate element fans out
    quadratically in the join — use shingles rare enough to
    discriminate (``shingle_n``), and at web scale drop elements
    above a document-frequency cap first (they cannot certify
    containment of anything but themselves).

    Output: (id_a, id_b, n_inter, n_a, containment), id_a ≠ id_b,
    both directions."""
    if not 0 < tau_pct <= 100:
        raise ValueError(f"tau_pct must be in (0, 100], got {tau_pct}")
    if shingle_n < 1:
        raise ValueError(f"shingle_n must be >= 1, got {shingle_n}")
    toks_arr = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0
    )
    if shingle_n == 1:
        elems = F.col("_w")
    else:
        join_expr = " || ' ' || ".join(
            f"element_at(_w, i + {j})" for j in range(shingle_n)
        )
        elems = F.expr(
            f"CASE WHEN size(_w) < {shingle_n} THEN array() "
            f"ELSE transform(sequence(1, size(_w) - {shingle_n - 1}), "
            f"i -> {join_expr}) END"
        )
    toks = (
        df.select(F.col(id_col).alias("_id"), toks_arr.alias("_w"))
        .select("_id", F.explode(F.array_distinct(elems)).alias("_t"))
    )
    from dish_data_pipeline_spark.cache_registry import tracked_persist

    toks = tracked_persist(toks)
    sizes = toks.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
    inter = (
        toks.select(F.col("_id").alias("id_a"), "_t")
        .join(toks.select(F.col("_id").alias("id_b"), "_t"), "_t")
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_inter"))
    )
    return (
        inter.join(
            sizes.select(F.col("_id").alias("id_a"), F.col("_n").alias("n_a")),
            "id_a",
        )
        .filter(F.col("n_inter") * 100 >= F.col("n_a") * tau_pct)
        .select(
            "id_a",
            "id_b",
            "n_inter",
            F.col("n_a").cast("bigint").alias("n_a"),
            (F.col("n_inter").cast("double") / F.col("n_a").cast("double"))
            .alias("containment"),
        )
    )


def containment_pairs_sql(
    src_sql: str, tau_pct: int = 80, id_col: str = "doc_id",
    shingle_n: int = 3,
) -> str:
    """Brute-force DuckDB oracle: all ORDERED pairs, exact
    ``list_intersect`` counts — independent of the shared-element
    join, so the hash match proves candidate completeness."""
    if shingle_n == 1:
        elems = f"regexp_extract_all(lower(text), '{TOKEN_RE}')"
    else:
        join_expr = " || ' ' || ".join(
            f"w[i + {j}]" for j in range(shingle_n)
        )
        elems = (
            f"list_transform(generate_series(1, greatest(len(w) - "
            f"{shingle_n - 1}, 0)), i -> {join_expr})"
        )
    return f"""
WITH words AS (
  SELECT {id_col} AS id,
         regexp_extract_all(lower(text), '{TOKEN_RE}') AS w
  FROM ({src_sql}) src),
toks AS (
  SELECT id, list_distinct({elems}) AS ts FROM words),
sized AS (
  SELECT id, ts, CAST(len(ts) AS BIGINT) AS n FROM toks WHERE len(ts) > 0),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
         CAST(len(list_intersect(a.ts, b.ts)) AS BIGINT) AS n_inter,
         a.n AS n_a
  FROM sized a JOIN sized b ON a.id <> b.id)
SELECT id_a, id_b, n_inter, n_a,
       CAST(n_inter AS DOUBLE) / CAST(n_a AS DOUBLE) AS containment
FROM pairs WHERE n_inter * 100 >= n_a * {int(tau_pct)}
"""
