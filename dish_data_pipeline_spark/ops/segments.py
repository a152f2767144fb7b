"""Segment-level exact dedup: remove token chunks duplicated across
documents (the paragraph/line-dedup of CCNet — Wenzek et al. 2020
§3.1 — and Lee et al. 2021's exact-substring motivation, re-expressed
over fixed-size non-overlapping token windows because this corpus has
no newline structure; with newline-delimited text the tokenizer swap
is one expression).

Reference scope: the reference pipeline (pipeline/data_pipeline.py)
dedups whole rows by key; segment dedup is corpus-scale NEW surface
for training-data preparation.

Scale shape (the 100 TB story):
- chunking and hashing are map-side (one pass over text, no UDF);
- the duplicate census is ONE groupBy on the 60-bit segment hash —
  partial aggregation (map-side combine) means each executor emits
  one row per distinct local hash, and reducer load is partitioned
  by hash, never resident per-executor;
- the verdict rejoins on the same hash key (co-partitioned with the
  census shuffle, AQE-coalesced);
- reassembly is one groupBy per document — bounded by document
  length, never corpus size.
No broadcast of the corpus, no all-pairs comparison, no driver
state. Keep-first semantics (the smallest ``id`` retains a
duplicated segment) make the output deterministic and
engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dish_data_pipeline_spark.ops.portable import spark_phash
from dish_data_pipeline_spark.ops.text import TOKEN_RE


def _segments(
    df: DataFrame, id_col: str, text_col: str, seg_tokens: int
) -> DataFrame:
    """One row per (doc, segment): ``(id, pos, seg, seg_hash)`` where
    ``seg`` is the pos-th non-overlapping ``seg_tokens``-token window
    (last window may be short)."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), 0)
    # sequence(0, -1) counts DOWN in Spark — guard empty docs.
    segs = F.expr(
        "CASE WHEN size(_toks) > 0 THEN "
        f"transform(sequence(0, CAST(ceil(size(_toks) / {seg_tokens}.0) AS INT) - 1), "
        f"i -> struct(i AS pos, concat_ws(' ', slice(_toks, i * {seg_tokens} + 1, "
        f"{seg_tokens})) AS seg)) "
        "ELSE array() END"
    )
    return (
        df.select(F.col(id_col), toks.alias("_toks"))
        .select(id_col, F.explode(segs).alias("s"))
        .select(id_col, F.col("s.pos").alias("pos"), F.col("s.seg").alias("seg"))
        .withColumn("seg_hash", F.expr(spark_phash("seg")))
    )


def segment_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_tokens: int = 10,
    max_docs: int = 1,
    impl: str = "window",
) -> DataFrame:
    """Strip segments that appear in more than ``max_docs`` distinct
    documents, keeping each duplicated segment only in the document
    with the smallest ``id`` (keep-first). Returns every input doc:
    ``(id, text_deduped, n_segments, n_kept)`` — a doc whose segments
    were all duplicated elsewhere survives with empty text, so a
    downstream quality gate (not silent data loss) decides its fate.

    Two physical strategies, same results (cross-tested):

    - ``impl="window"`` (default): the census (distinct-doc count +
      first doc per segment hash) as window functions over the
      seg_hash partitioning — ONE linear pipeline, tokenize+hash
      runs once with no persist, one shuffle by hash + one by doc
      (measured ~1.6× faster than the join strategy at sf0.1).
      Caveat: a corpus-hot boilerplate hash lands one window
      partition, and AQE cannot split windows.
    - ``impl="census"``: groupBy census (map-side-combined, hot keys
      collapse in the combiners) + equi-join back — AQE's skew-join
      splitting applies to the rejoin, so this is the strategy for
      corpora with pathologically hot segments (the same hot-key
      routing judgement as dup_ngram_coverage's broadcast path).
    """
    if impl not in ("window", "census"):
        raise ValueError(f"unknown impl {impl!r} (expected 'window' or 'census')")
    if impl == "census":
        return _segment_dedup_census(df, id_col, text_col, seg_tokens, max_docs)
    from pyspark.sql import Window

    seg = _segments(df, id_col, text_col, seg_tokens)
    w_ord = Window.partitionBy("seg_hash").orderBy(id_col)
    w_all = Window.partitionBy("seg_hash")
    ranked = seg.withColumn("_dr", F.dense_rank().over(w_ord))
    stats = ranked.withColumn("_n_docs", F.max("_dr").over(w_all)).withColumn(
        "_first_doc", F.min(id_col).over(w_all)
    )
    keep = (F.col("_n_docs") <= max_docs) | (
        F.col(id_col) == F.col("_first_doc")
    )
    per_doc = stats.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(keep, F.struct("pos", "seg")))
                ),
                lambda x: x["seg"],
            ),
            " ",
        ).alias("text_deduped"),
        F.count(F.when(keep, F.lit(1))).alias("n_kept"),
        F.count(F.lit(1)).alias("n_segments"),
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("text_deduped", F.lit("")).alias("text_deduped"),
            F.coalesce("n_segments", F.lit(0)).alias("n_segments"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )


def _segment_dedup_census(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seg_tokens: int,
    max_docs: int,
) -> DataFrame:
    """The AQE-skew-splittable strategy: groupBy census + rejoin.
    The segment relation feeds both the census and the rejoin, so it
    is registered in the cache registry (released by the caller's
    stage boundary / bench isolation)."""
    from dish_data_pipeline_spark.cache_registry import tracked_persist

    seg = tracked_persist(_segments(df, id_col, text_col, seg_tokens))
    census = seg.groupBy("seg_hash").agg(
        F.countDistinct(id_col).alias("_n_docs"),
        F.min(id_col).alias("_first_doc"),
    )
    keep = (F.col("_n_docs") <= max_docs) | (
        F.col(id_col) == F.col("_first_doc")
    )
    per_doc = (
        seg.join(census, "seg_hash")
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(keep, F.struct("pos", "seg")))
                    ),
                    lambda x: x["seg"],
                ),
                " ",
            ).alias("text_deduped"),
            F.count(F.when(keep, F.lit(1))).alias("n_kept"),
            F.count(F.lit(1)).alias("n_segments"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("text_deduped", F.lit("")).alias("text_deduped"),
            F.coalesce("n_segments", F.lit(0)).alias("n_segments"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )
