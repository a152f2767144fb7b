"""Deterministic sampling and sequence packing for training-data
pipelines.

Sampling uses the portable hash instead of an RNG: membership is a
pure function of the row key, so samples are reproducible across
runs, engines (the DuckDB oracle computes the identical sample),
cluster sizes, and retries — and they compose (a 10% sample is a
subset of the 20% sample under the same salt). ``df.sample()`` gives
none of those guarantees.

Packing lays documents end-to-end in a deterministic order and
assigns each to the training-sequence bin its START falls in
(concatenate-and-slice semantics — documents aren't split, so a bin
overflows by at most one document tail). The window runs per hash
bucket, not globally: a global ORDER BY window is a single-partition
bottleneck at scale, while per-bucket packing is embarrassingly
parallel and still deterministic.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dish_data_pipeline_spark.ops.portable import spark_phash
from dish_data_pipeline_spark.ops.text import TOKEN_RE

SAMPLE_DENOM = 10_000


def _sql_str(v: str) -> str:
    """SQL string literal with embedded quotes doubled — stratum
    values and salts come from user config, not trusted SQL."""
    return "'" + str(v).replace("'", "''") + "'"


def sample_keep_expr(key_cols: Sequence[str], rate: float, salt: str = "sample") -> str:
    """SQL predicate: keep iff hash(key, salt) lands under rate."""
    h = spark_phash(f"concat_ws('|', {', '.join(key_cols)}, {_sql_str(salt)})")
    return f"({h}) % {SAMPLE_DENOM} < {int(rate * SAMPLE_DENOM)}"


def deterministic_sample(
    df: DataFrame, rate: float, key_cols: Sequence[str], salt: str = "sample"
) -> DataFrame:
    return df.filter(F.expr(sample_keep_expr(key_cols, rate, salt)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: Mapping[str, float],
    key_cols: Sequence[str],
    default_rate: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum keep rates (e.g. per-language quotas when mixing
    a corpus). Same hash, different thresholds — still reproducible
    and composable."""
    h = spark_phash(f"concat_ws('|', {', '.join(key_cols)}, {_sql_str(salt)})")
    cases = " ".join(
        f"WHEN {_sql_str(stratum)} THEN {int(r * SAMPLE_DENOM)}"
        for stratum, r in sorted(rates.items())
    )
    threshold = (
        f"CASE {strata_col} {cases} ELSE {int(default_rate * SAMPLE_DENOM)} END"
    )
    return df.filter(F.expr(f"({h}) % {SAMPLE_DENOM} < {threshold}"))


def mixture_case_sql(strata_col: str, weights: Mapping[str, float]) -> str:
    """CASE expr mapping stratum → target weight (shared verbatim by
    the Spark plan and the DuckDB oracle)."""
    cases = " ".join(
        f"WHEN {_sql_str(s)} THEN CAST({float(w)!r} AS DOUBLE)"
        for s, w in sorted(weights.items())
    )
    return f"CASE {strata_col} {cases} ELSE CAST(0.0 AS DOUBLE) END"


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    weights: Mapping[str, float],
    out_rows: int,
    key_cols: Sequence[str],
    salt: str = "mix",
) -> DataFrame:
    """Sample toward a TARGET mixture (e.g. 40% en / 30% de / 30% fr
    of a ~``out_rows``-doc corpus): per-stratum keep rate =
    ``min(1, weight × out_rows / observed_count)``, so over-represented
    strata are downsampled and scarce ones kept whole.

    Unlike ``stratified_sample`` (caller supplies rates), the rates
    here derive from the data — and they derive INSIDE the plan: a
    per-stratum count aggregate (map-side combined, tiny output)
    broadcast-joined back onto the corpus. No driver collect, no
    second pass over the data, membership still a pure function of
    the row key (reproducible across runs/engines/cluster sizes).
    """
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n"))
    w_case = mixture_case_sql(strata_col, weights)
    # explicit floor before the integral cast: Spark truncates
    # double→bigint but DuckDB ROUNDS, so the cast alone would
    # disagree; floor() then cast agrees everywhere
    thresh = F.expr(
        f"least({SAMPLE_DENOM}, CAST(floor("
        f"{w_case} * {int(out_rows)} * {SAMPLE_DENOM} / _n) AS BIGINT))"
    )
    rates = counts.select(F.col(strata_col), thresh.alias("_thresh"))
    h = spark_phash(f"concat_ws('|', {', '.join(key_cols)}, {_sql_str(salt)})")
    return (
        df.join(F.broadcast(rates), strata_col)
        .filter(F.expr(f"({h}) % {SAMPLE_DENOM} < _thresh"))
        .drop("_thresh")
    )


def mixture_sample_tokens(
    df: DataFrame,
    strata_col: str,
    weights: Mapping[str, float],
    out_tokens: int,
    token_col: str,
    key_cols: Sequence[str],
    salt: str = "mixtok",
) -> DataFrame:
    """Token-budgeted mixture sampling: training mixtures are
    specified as TOKEN shares ("30% of the budget is code"), not
    document shares — so the per-stratum keep rate here is
    ``min(1, weight × out_tokens / observed_token_sum)``, derived
    from a per-stratum SUM aggregate instead of a row count. With
    per-doc hash membership the sampled token mass matches the
    target share in expectation (exact token-level control would
    require splitting documents — the packer's job, not the
    sampler's). Same plan shape as :func:`mixture_sample`: one
    map-side-combined aggregate broadcast back onto the corpus, no
    driver collect, membership a pure row-key function."""
    sums = df.groupBy(strata_col).agg(
        F.sum(F.col(token_col).cast("bigint")).alias("_tok")
    )
    w_case = mixture_case_sql(strata_col, weights)
    thresh = F.expr(
        f"least({SAMPLE_DENOM}, CAST(floor("
        f"{w_case} * {int(out_tokens)} * {SAMPLE_DENOM} / _tok) AS BIGINT))"
    )
    rates = sums.select(F.col(strata_col), thresh.alias("_thresh"))
    h = spark_phash(f"concat_ws('|', {', '.join(key_cols)}, {_sql_str(salt)})")
    return (
        df.join(F.broadcast(rates), strata_col)
        .filter(F.expr(f"({h}) % {SAMPLE_DENOM} < _thresh"))
        .drop("_thresh")
    )


def domain_quota(
    df: DataFrame,
    domain_col: str,
    cap: int,
    order_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Cap documents per domain/source, keeping the top-``cap`` by
    ``order_col`` (descending, ``id_col`` ascending tiebreak) — the
    domain-balancing stage web-corpus pipelines run so a handful of
    giant domains can't dominate the training mixture.

    Plan shape: rank-within-group + ``rank <= cap`` filter. Catalyst
    rewrites this pair into WindowGroupLimit (Spark >= 3.5), which
    keeps only ``cap`` rows per key map-side BEFORE the exchange —
    so a 100× hot domain ships ``cap`` rows per input partition, not
    its whole row set, and the post-shuffle window touches at most
    ``cap × n_partitions`` rows per domain. For domains hot enough
    that even that matters, pre-thin with
    :func:`deterministic_sample` composed upstream (approximate but
    exchange-free), then apply the exact quota."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    w = Window.partitionBy(domain_col).orderBy(
        F.col(order_col).desc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
        .withColumn("rank_in_domain", F.col("_rk").cast("int"))
        .drop("_rk")
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 32,
) -> DataFrame:
    """Assign each document to a training-sequence bin of ~``budget``
    tokens. Documents are hashed into ``n_buckets`` independent
    streams (parallel, no global sort), laid end-to-end in id order
    within each stream, and binned by the budget window their first
    token falls in.

    Output: (id_col, bucket, seq_id, n_tokens) — deterministic, and
    exactly expressible as a windowed SUM for the oracle."""
    n_tokens = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), 0)
    ).cast("bigint")
    bucket = F.expr(f"pmod({spark_phash(f'cast({id_col} as string)')}, {n_buckets})")
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(F.col(id_col), n_tokens.alias("n_tokens"), bucket.alias("bucket"))
        .withColumn("_cum", F.sum("n_tokens").over(w))
        # integer division: exact in every engine, no float rounding
        .withColumn("seq_id", F.expr(f"(_cum - n_tokens) div {budget}"))
        .drop("_cum")
        .select(id_col, "bucket", "seq_id", "n_tokens")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """Split each document into fixed-token chunks with overlap —
    the context-window preprocessing every training/RAG pipeline
    runs before packing or embedding. Chunk i starts at token
    ``i * (chunk_tokens - overlap)``; the last chunk may be short;
    an empty document yields one empty chunk (mirroring the
    single-shingle convention for short docs).

    Pure map-side higher-order expressions — tokenize, windowed
    slice, posexplode — so the operator has ZERO shuffles and
    scales linearly with input splits; returns (id_col, chunk_id,
    chunk_text, n_tokens)."""
    if overlap >= chunk_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be < chunk_tokens ({chunk_tokens})"
        )
    step = chunk_tokens - overlap
    base = df.select(
        F.col(id_col),
        F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), 0).alias("_toks"),
    )
    chunks = (
        "transform(sequence(0, greatest(size(_toks) - 1, 0), {step}), "
        "s -> struct(array_join(slice(_toks, s + 1, {c}), ' ') AS chunk_text, "
        "size(slice(_toks, s + 1, {c})) AS n_tokens))"
    ).format(step=step, c=chunk_tokens)
    return base.select(
        F.col(id_col),
        F.posexplode(F.expr(chunks)).alias("chunk_id", "_ch"),
    ).select(
        id_col,
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.col("_ch.chunk_text").alias("chunk_text"),
        F.col("_ch.n_tokens").cast("bigint").alias("n_tokens"),
    )


def weighted_sample(
    df: DataFrame,
    key_cols: Sequence[str],
    weight_expr: str,
    base_rate: float,
    salt: str = "wsample",
) -> DataFrame:
    """Per-ROW weighted Bernoulli sampling: keep each row with
    probability ``min(1, base_rate · weight)`` — the quality-weighted
    corpus sampling step ("keep high-quality documents at a higher
    rate") real pre-training pipelines run, where the per-stratum
    :func:`mixture_sample` is too coarse because the weight is a
    continuous per-document score, not a group label.

    Deterministic and reproducible like every sampler here: the coin
    is ``hash(key, salt) mod DENOM`` compared against
    ``floor(min(1, base_rate · weight) · DENOM)`` — the weight enters
    through ONE IEEE multiply and a floor, so the kept set is
    bit-identical across engines, runs, and cluster sizes, and a
    re-run with the same salt reproduces the sample exactly (change
    the salt to draw an independent sample). Rows whose weight is
    NULL are dropped (NULL threshold fails the comparison) — score
    your corpus before sampling it. Pure map-side filter: zero
    shuffles, pushdown-friendly."""
    if not 0 < base_rate:
        raise ValueError(f"base_rate must be > 0, got {base_rate}")
    h = spark_phash(
        f"concat_ws('|', {', '.join(key_cols)}, {_sql_str(salt)})"
    )
    thresh = (
        f"CAST(floor(least(1.0D, {float(base_rate)!r}D * ({weight_expr})) "
        f"* {SAMPLE_DENOM}) AS BIGINT)"
    )
    return df.filter(F.expr(f"({h}) % {SAMPLE_DENOM} < {thresh}"))


#: sqrt quantization for temperature sampling: floor(sqrt(n)·1e6)
#: keeps the per-stratum mass an exact BIGINT so the normalizing sum
#: is order-independent (the same floor-quantize device as
#: plans.common.ZSCORE_SCALE). Safe domain: n up to ~8.4e9 rows per
#: stratum keeps sqrt(n)·1e6 below int64 max comfortably.
TEMP_SQRT_SCALE = 1_000_000


def temperature_sample(
    df: DataFrame,
    strata_col: str,
    out_rows: int,
    key_cols: Sequence[str],
    salt: str = "temp",
) -> DataFrame:
    """Temperature-flattened corpus mixture at α = 0.5 (the
    multilingual-pretraining standard — XLM-R / mBERT sample
    languages ∝ n^α with α < 1 so head languages stop drowning the
    tail): target share of stratum i is sqrt(n_i)/Σ_j sqrt(n_j), so
    the keep rate is ``out_rows · sqrt(n_i) / (Σ sqrt(n_j) · n_i)``
    — rare strata keep (relatively) much more than popular ones,
    with no hand-written weight table to maintain.

    α is FIXED at 0.5 because sqrt is the one power both Spark and
    DuckDB round identically (correctly-rounded per IEEE-754, unlike
    ``pow(n, α)``), which is what upgrades this from rows-only to an
    exact value-hash oracle. The per-stratum sqrt masses are
    floor-quantized to BIGINT (``TEMP_SQRT_SCALE``) so the
    normalizing sum is exact under any aggregation order; the
    closing rate math is one fixed-shape double expression.

    Plan shape: per-stratum count (map-side combined, tiny) → 1-row
    quantized-sqrt total cross-joined back (broadcast) → per-row
    hash coin. No driver collect, membership a pure row-key
    function — reproducible across runs, engines, cluster sizes."""
    from dish_data_pipeline_spark.cache_registry import tracked_persist

    # persisted: the counts relation feeds BOTH the 1-row total and
    # the rate join — without it the base-table scan+shuffle runs
    # twice (stratum count is bounded, the cache is bytes)
    counts = tracked_persist(
        df.groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn(
            "_s",
            F.expr(f"CAST(floor(sqrt(_n) * {TEMP_SQRT_SCALE}) AS BIGINT)"),
        )
    )
    total = counts.agg(F.sum("_s").alias("_stot"))
    thresh = F.expr(
        f"least({SAMPLE_DENOM}, CAST(floor("
        f"CAST({int(out_rows)} AS DOUBLE) * {SAMPLE_DENOM} * "
        f"CAST(_s AS DOUBLE) / CAST(_stot AS DOUBLE) / CAST(_n AS DOUBLE)"
        f") AS BIGINT))"
    )
    rates = counts.crossJoin(F.broadcast(total)).select(
        F.col(strata_col), thresh.alias("_thresh")
    )
    h = spark_phash(f"concat_ws('|', {', '.join(key_cols)}, {_sql_str(salt)})")
    return (
        df.join(F.broadcast(rates), strata_col)
        .filter(F.expr(f"({h}) % {SAMPLE_DENOM} < _thresh"))
        .drop("_thresh")
    )


def temperature_sample_sql(
    strata_col: str,
    out_rows: int,
    key_cols_sql: str,
    table: str = "documents",
    salt: str = "temp",
) -> str:
    """DuckDB twin of :func:`temperature_sample` — same quantized
    masses, same rate expression, same hash coin."""
    from dish_data_pipeline_spark.ops.portable import duck_phash

    h = duck_phash(f"concat_ws('|', {key_cols_sql}, '{salt}')")
    return f"""
WITH counts AS (
  SELECT {strata_col}, COUNT(*) AS _n,
         CAST(floor(sqrt(COUNT(*)) * {TEMP_SQRT_SCALE}) AS BIGINT) AS _s
  FROM {table} GROUP BY {strata_col}),
tot AS (SELECT SUM(_s) AS _stot FROM counts),
th AS (
  SELECT {strata_col},
         LEAST({SAMPLE_DENOM}, CAST(floor(
           CAST({int(out_rows)} AS DOUBLE) * {SAMPLE_DENOM} *
           CAST(_s AS DOUBLE) / CAST(_stot AS DOUBLE) /
           CAST(_n AS DOUBLE)) AS BIGINT)) AS _thresh
  FROM counts, tot)
SELECT d.* FROM {table} d
JOIN th ON th.{strata_col} = d.{strata_col}
WHERE ({h}) % {SAMPLE_DENOM} < _thresh
"""
