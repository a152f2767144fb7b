"""Corpus-drift diagnostics: per-slice token-distribution divergence.

Training-data pipelines need to answer "did this source/snapshot
drift from the corpus?" before mixing it in. This computes, per
group (source, snapshot, shard …), a chi-square-style divergence of
the group's token unigram distribution against the whole corpus:

    chi2(s) = Σ_{t ∈ s} (p_s(t) − p_g(t))² / p_g(t)
            + Σ_{t ∉ s} p_g(t)

The absent-token tail needs no group×vocab grid: for tokens the
group never uses, the term reduces to p_g(t), so the tail equals
``1 − Σ_{t ∈ s} p_g(t)`` — computable from the group's own rows.

Determinism contract (cross-engine hash parity): probabilities are
single IEEE divisions of exact BIGINT counts and each term a fixed
chain of IEEE ops on identical doubles — but summing doubles via a
decimal cast is NOT tie-free here (terms near 1e-9 occasionally hit
an exact half at the rounding digit, and Spark rounds HALF_UP where
DuckDB rounds half-even: measured 1-ulp drift on 3/20 groups at
sf0.01). So the statistic is defined with explicit floor
quantization, the same device ``ops.quantize`` uses: each term
contributes ``floor(term * 1e9)`` as an exact BIGINT — floor has no
ties — the BIGINT sums are exact in any order, and the final value
is one identical division per engine. The ~1e-9 per-term truncation
is part of the statistic's definition, far below any drift-decision
threshold.

Scale shape: tokenize → explode is map-side; the (group, token)
count gets map-side combine; the global token relation derives from
the (group, token) relation by a second, smaller aggregate; the
terms join hashes on token only (vocab-bounded, not corpus-bounded);
group totals are a tiny broadcast. No collect, no grid, no
all-pairs — cost is O(corpus tokens) + O(vocab × groups present).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dish_data_pipeline_spark.ops.text import TOKEN_RE

#: Quantization denominator for the tie-free term accumulation.
CHI2_SCALE = 1_000_000_000


def token_divergence(
    df: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Per-group chi-square divergence vs the corpus distribution.

    Output: (group_col, n_tokens BIGINT, n_distinct BIGINT,
    chi2 DOUBLE) — higher chi2 = further from the corpus mix."""
    from dish_data_pipeline_spark.cache_registry import tracked_persist

    # The (group, token) count relation feeds FOUR branches (terms,
    # global counts, group totals, corpus total); persisting it keeps
    # the tokenize → explode → count pass over the corpus to exactly
    # one execution (the broadcast branches materialize as separate
    # jobs where exchange reuse does not apply).
    st = tracked_persist(
        df.select(
            F.col(group_col),
            F.explode(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
            ).alias("token"),
        )
        .groupBy(group_col, "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    gt = st.groupBy("token").agg(F.sum("c").cast("bigint").alias("cg"))
    ts = st.groupBy(group_col).agg(F.sum("c").cast("bigint").alias("t"))
    tg = st.agg(F.sum("c").cast("bigint").alias("tt"))
    p_s = F.col("c").cast("double") / F.col("t").cast("double")
    p_g = F.col("cg").cast("double") / F.col("tt").cast("double")
    d = p_s - p_g
    terms = (
        st.join(gt, "token")
        .join(F.broadcast(ts), group_col)
        .crossJoin(F.broadcast(tg))
        .select(
            F.col(group_col),
            F.col("c"),
            F.floor(d * d / p_g * F.lit(float(CHI2_SCALE))).alias("_term_q"),
            F.floor(p_g * F.lit(float(CHI2_SCALE))).alias("_pg_q"),
        )
    )
    scale = F.lit(float(CHI2_SCALE))
    return terms.groupBy(group_col).agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        (
            F.sum("_term_q").cast("double") / scale
            + F.lit(1.0)
            - F.sum("_pg_q").cast("double") / scale
        ).alias("chi2"),
    )
