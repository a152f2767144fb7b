"""Benchmark decontamination: flag training documents that share a
word n-gram with an evaluation/benchmark set (the standard
n-gram-collision decontamination of GPT-3 appendix C / PaLM §8 —
public method descriptions; typical production n is 8-13, scaled
down for test corpora).

Scale shape: both sides explode to hashed word n-grams (map-side,
``ops.portable`` 60-bit hash so the DuckDB oracle replicates the
gram keys bitwise). The benchmark side is DISTINCT'd and — being a
benchmark, i.e. orders of magnitude smaller than the corpus —
broadcast: the contamination check is then a broadcast semi-join
that never shuffles the corpus, followed by one per-doc count
aggregation. At 100 TB the corpus-side gram relation is wide but
map-local; only (doc_id, matched-gram-hash) pairs reach the shuffle,
and only for contaminated docs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dish_data_pipeline_spark.cache_registry import tracked_persist
from dish_data_pipeline_spark.ops.portable import spark_phash
from dish_data_pipeline_spark.ops.text import TOKEN_RE


def _gram_hashes(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, gram_hash) pairs: hashed word n-grams per document."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), 0)
    grams = F.expr(
        f"CASE WHEN size(_toks) >= {n} THEN "
        f"transform(sequence(1, size(_toks) - {n - 1}), "
        f"i -> {spark_phash(f'concat_ws(chr(32), slice(_toks, i, {n}))')}) "
        "ELSE array() END"
    )
    return df.select(F.col(id_col), toks.alias("_toks")).select(
        id_col, F.explode(grams).alias("gram_hash")
    )


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Per-corpus-document contamination counts against ``benchmark``.

    Returns ``(id, n_grams, n_contaminated, contamination_frac,
    contaminated)`` — every corpus doc appears, clean docs with zero
    counts (a decontamination pass must be able to KEEP the clean
    set, not just list offenders).
    """
    # consumed twice (per-doc totals + hit counts): persist so the
    # corpus is tokenized+hashed once (LRU-evictable after the action)
    doc_grams = tracked_persist(_gram_hashes(corpus, id_col, text_col, n))
    bench_grams = F.broadcast(
        _gram_hashes(benchmark, id_col, text_col, n)
        .select("gram_hash")
        .distinct()
    )
    per_doc = doc_grams.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    hits = (
        doc_grams.join(bench_grams, "gram_hash", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated"))
    )
    joined = (
        corpus.select(id_col)
        .join(per_doc, id_col, "left")
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
        )
    )
    frac = F.col("n_contaminated").cast("double") / F.greatest(
        F.col("n_grams"), F.lit(1)
    ).cast("double")
    return joined.withColumn("contamination_frac", frac).withColumn(
        "contaminated", (F.col("n_contaminated") > 0).cast("int")
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    max_frac: float = 0.0,
) -> DataFrame:
    """Drop corpus docs whose contamination fraction exceeds
    ``max_frac`` (default: any shared n-gram disqualifies)."""
    report = contamination_report(corpus, benchmark, id_col, text_col, n)
    keep = report.filter(F.col("contamination_frac") <= max_frac).select(id_col)
    return corpus.join(keep, id_col, "left_semi")
