"""Duplicate-SPAN masking: rewrite documents with cross-document
duplicated n-gram spans removed (the span-level complement of
document dedup — the public method of Lee et al., "Deduplicating
Training Data Makes Language Models Better", ACL 2022, which removes
repeated substrings rather than whole near-dup docs; boilerplate,
licenses and templates survive document-level dedup because the
SURROUNDING text differs).

Semantics: a token position is covered when any word n-gram starting
at-or-before it (and spanning it) occurs in ≥ ``min_df`` distinct
documents. The rewritten document is the original token sequence
with covered positions deleted (order preserved); the span report
carries exact token/removal counts.

Determinism contract: grams are keyed by the portable 60-bit md5
hash (``ops.portable``) so the DuckDB oracle replicates coverage
decisions exactly; counts are BIGINT; the removal fraction is one
IEEE division. The rewrite is pure array arithmetic — position
sequences, set-difference, element lookup — no UDFs.

Scale shape: one map-side explode of (doc, start, gram-hash), one
distinct-doc count per gram (the only corpus-wide shuffle — the same
shape as the dup-n-gram diagnostic), one shuffle join back of
flagged starts, then a map-side array rewrite. Nothing quadratic; at
100 TB the gram-frequency aggregate dominates exactly like every
n-gram statistic in this repo, and partial aggregation (map-side
combine) applies because the key is the gram hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dish_data_pipeline_spark.cache_registry import tracked_persist
from dish_data_pipeline_spark.ops.portable import duck_phash, spark_phash
from dish_data_pipeline_spark.ops.text import TOKEN_RE


def mask_duplicate_spans(
    df: DataFrame,
    n: int = 5,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per doc: (id, n_tokens, n_removed, removed_frac, clean_text)
    with every cross-doc duplicated n-gram span deleted."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if min_df < 2:
        raise ValueError(f"min_df must be >= 2, got {min_df}")
    toks = F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), 0)
    gram_h = spark_phash(f"concat_ws(chr(32), slice(_toks, i, {n}))")
    grams_expr = (
        f"CASE WHEN size(_toks) >= {n} THEN "
        f"transform(sequence(1, size(_toks) - {n - 1}), "
        f"i -> struct(CAST(i AS BIGINT) AS start, {gram_h} AS gh)) "
        "ELSE array() END"
    )
    base = tracked_persist(
        df.select(F.col(id_col).alias("_id"), toks.alias("_toks"))
    )
    grams = base.select(
        "_id", F.explode(F.expr(grams_expr)).alias("_g")
    ).select("_id", "_g.start", "_g.gh")
    grams = tracked_persist(grams)
    dup = (
        grams.groupBy("gh")
        .agg(F.countDistinct("_id").alias("_df"))
        .filter(F.col("_df") >= min_df)
        .select("gh")
    )
    starts = (
        grams.join(dup, "gh")
        .groupBy("_id")
        .agg(F.collect_list("start").alias("_starts"))
    )
    covered = (
        f"array_distinct(flatten(transform(_starts, "
        f"s -> sequence(s, s + {n - 1}))))"
    )
    return (
        base.join(starts, "_id", "left")
        .withColumn("_starts", F.coalesce("_starts", F.expr("array()")))
        .selectExpr(
            "_id",
            "_toks",
            f"{covered} AS _cov",
        )
        .selectExpr(
            f"_id AS {id_col}",
            "CAST(size(_toks) AS BIGINT) AS n_tokens",
            "CAST(size(_cov) AS BIGINT) AS n_removed",
            "CAST(size(_cov) AS DOUBLE) / CAST(greatest(size(_toks), 1) "
            "AS DOUBLE) AS removed_frac",
            # CASE guard: sequence(1, 0) steps BACKWARD on empty docs;
            # BIGINT bounds so array_except's element types match _cov
            "CASE WHEN size(_toks) = 0 THEN '' ELSE "
            "concat_ws(' ', transform(array_except("
            "sequence(CAST(1 AS BIGINT), CAST(size(_toks) AS BIGINT)), "
            "_cov), p -> element_at(_toks, CAST(p AS INT)))) END "
            "AS clean_text",
        )
    )


def mask_duplicate_spans_sql(
    src_sql: str,
    n: int = 5,
    min_df: int = 2,
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin: identical gram hashes, coverage and rewrite."""
    gh = duck_phash(f"array_to_string(t[i:i + {n - 1}], ' ')")
    return f"""
WITH src AS ({src_sql}),
tok AS (SELECT {id_col} AS id,
               regexp_extract_all(text, '{TOKEN_RE}') AS t FROM src),
grams AS (
  SELECT id, CAST(i AS BIGINT) AS start, {gh} AS gh
  FROM tok, UNNEST(generate_series(1, greatest(len(t) - {n - 1}, 0)))
       AS u(i)),
dup AS (SELECT gh FROM grams GROUP BY gh
        HAVING COUNT(DISTINCT id) >= {min_df}),
starts AS (
  SELECT id, list(start) AS ss FROM grams
  WHERE gh IN (SELECT gh FROM dup) GROUP BY id),
cov AS (
  SELECT tok.id, tok.t,
         list_distinct(flatten(list_transform(COALESCE(s.ss, []),
           x -> generate_series(x, x + {n - 1})))) AS cv
  FROM tok LEFT JOIN starts s ON s.id = tok.id)
SELECT id AS {id_col},
       CAST(len(t) AS BIGINT) AS n_tokens,
       CAST(len(cv) AS BIGINT) AS n_removed,
       CAST(len(cv) AS DOUBLE) / CAST(greatest(len(t), 1) AS DOUBLE)
         AS removed_frac,
       COALESCE(array_to_string(list_transform(
         list_filter(generate_series(1, len(t)),
                     p -> NOT list_contains(cv, p)),
         p -> t[p]), ' '), '') AS clean_text
FROM cov
"""
