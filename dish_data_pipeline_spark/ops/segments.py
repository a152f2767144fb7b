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
) -> DataFrame:
    """Strip segments that appear in more than ``max_docs`` distinct
    documents, keeping each duplicated segment only in the document
    with the smallest ``id`` (keep-first). Returns every input doc:
    ``(id, text_deduped, n_segments, n_kept)`` — a doc whose segments
    were all duplicated elsewhere survives with empty text, so a
    downstream quality gate (not silent data loss) decides its fate.
    """
    # Single-pass shape: the census (distinct-doc count + first doc
    # per segment hash) is computed as window functions over the
    # seg_hash partitioning instead of a groupBy census + rejoin —
    # that folds 3 consumers of the segment relation (census, rejoin,
    # totals) into ONE linear pipeline: tokenize+hash runs once with
    # no persist, and the relation is shuffled once by seg_hash and
    # once by doc id (round 3's persist+rejoin shape ran 2.6× over
    # baseline re-scanning the persisted text). dense_rank-max gives
    # the distinct-doc count without countDistinct (unsupported over
    # windows). Skew note: a corpus-hot boilerplate hash lands one
    # window partition (AQE can't split windows the way it splits
    # joins) — at 60-bit hash granularity a single segment would
    # need ~billions of repeats before one reducer is at risk, and
    # the heavy ``seg`` text column rides the same single shuffle the
    # old rejoin needed anyway.
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
