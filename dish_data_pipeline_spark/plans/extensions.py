"""Extension query suite (SURVEY.md §2.13/§7.7): training-data
operators over ``documents`` and ``embeddings``.

Every query here has a DuckDB oracle. The LSH-family ops
(minhash/simhash/SRP buckets/winnowing) are built on the portable
60-bit hash (``ops.portable``), so their oracles
(``plans.oracle_dedup`` / ``plans.oracle_ann``) replicate the
algorithms exactly — candidate sets and all — rather than
approximating them: two independent implementations that must agree
bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dish_data_pipeline_spark.ops.dedup_fuzzy import (
    exact_dedup_groups,
    exact_jaccard_pairs,
    minhash_candidate_pairs,
    simhash_near_pairs,
    with_minhash,
    with_shingles,
    with_simhash,
)
from dish_data_pipeline_spark.ops.multimodal import (
    extract_features,
    text_to_binary_content,
)
from dish_data_pipeline_spark.ops.quantize import quantized_topk_sql
from dish_data_pipeline_spark.ops.similarity import (
    cosine_topk,
    ivf_topk,
    lsh_bucket_topk,
)
from dish_data_pipeline_spark.ops.text import (
    BPE_RE,
    LANG_MARKERS,
    TOKEN_RE,
    lang_pick_case_sql,
    quality_score,
    winnow_fingerprints,
    with_fingerprint,
    with_language_id,
    with_text_stats,
)
from dish_data_pipeline_spark.plans.common import QueryDef, davg, read, widen
from dish_data_pipeline_spark.plans.oracle_ann import (
    sql_embedding_dedup,
    sql_embedding_neardup,
    sql_knn_lsh,
)
from dish_data_pipeline_spark.plans.oracle_dedup import (
    sql_best_of_cluster,
    sql_dup_clusters,
    sql_dup_ngram_coverage,
    sql_incremental_neardup,
    sql_lsh_quality,
    sql_minhash_neardup,
    sql_ngram_jaccard,
    sql_simhash_neardup,
    sql_training_corpus,
    sql_winnow_fingerprint,
)


# --- Text statistics ----------------------------------------------
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read(spark, sf_dir, "documents")
    return with_text_stats(d).select(
        "doc_id", "lang", "n_chars_calc", "n_tokens", "n_distinct_tokens", "n_punct"
    )


SQL_TEXT_STATS = """
SELECT doc_id, lang,
       CAST(LENGTH(text) AS BIGINT) AS n_chars_calc,
       CAST(LENGTH(REGEXP_EXTRACT_ALL(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens,
       CAST(LENGTH(LIST_DISTINCT(REGEXP_EXTRACT_ALL(text, '[A-Za-z0-9]+'))) AS BIGINT) AS n_distinct_tokens,
       CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[^A-Za-z0-9 ]', '', 'g')) AS BIGINT) AS n_punct
FROM documents
"""


# --- Token counting: whitespace + BPE-ish pretokenizer ------------
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read(spark, sf_dir, "documents")
    text = F.col("text")
    return d.select(
        "doc_id",
        F.size(F.split(F.trim(text), r"\s+")).cast("bigint").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(text, F.lit(BPE_RE), 0))
        .cast("bigint")
        .alias("n_bpe_pieces"),
        F.size(
            F.array_distinct(F.regexp_extract_all(text, F.lit(BPE_RE), 0))
        )
        .cast("bigint")
        .alias("n_distinct_pieces"),
    )


_BPE_SQL = BPE_RE.replace("'", "''")  # escape quotes for SQL literal

SQL_TOKEN_STATS = f"""
SELECT doc_id,
       CAST(LENGTH(regexp_split_to_array(TRIM(text), '\\s+')) AS BIGINT)
         AS n_ws_tokens,
       CAST(LENGTH(REGEXP_EXTRACT_ALL(text, '{_BPE_SQL}')) AS BIGINT)
         AS n_bpe_pieces,
       CAST(LENGTH(LIST_DISTINCT(REGEXP_EXTRACT_ALL(text, '{_BPE_SQL}')))
         AS BIGINT) AS n_distinct_pieces
FROM documents
"""


# --- Winnowing fingerprints (rolling hash) ------------------------
def q_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc fingerprint count + order-independent scalar digest of
    the fingerprint set (md5 of the sorted values) — same information
    as the raw ARRAY column but hashable by the driver's comparator
    and expressible as a DuckDB oracle."""
    d = widen(read(spark, sf_dir, "documents"), spark)
    digest = F.md5(
        F.expr(
            "array_join(transform(sort_array(fingerprints), "
            "x -> cast(x as string)), ',')"
        )
    )
    return winnow_fingerprints(d).select(
        "doc_id", "n_fingerprints", digest.alias("fp_digest")
    )


# --- Embedding-cosine near-dup (the dedup charter item) -----------
def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH-blocked near-dup: candidates only within shared
    (table, bucket) — bucket count (2 tables × 2^16) scales with the
    corpus, unlike round-1's label blocking whose fixed cardinality
    made blocks grow linearly (quadratic pairs). Exact cosine rescore
    within blocks; identical vectors collide with certainty."""
    from dish_data_pipeline_spark.ops.similarity import dot, srp_block_pairs

    emb = read(spark, sf_dir, "embeddings")
    # corpus has no true near-dups (max off-diagonal cosine ≈ 0.51),
    # so plant copies of every 20th vector — the operator must find
    # exactly those pairs.
    corpus = emb.unionByName(
        emb.filter(F.col("vec_id") % 20 == 0).withColumn(
            "vec_id", F.col("vec_id") + 100000
        )
    )
    pairs = srp_block_pairs(
        widen(corpus, spark), n_planes=16, n_tables=2, seed=7, score=dot
    )
    return (
        pairs.withColumnRenamed("score", "cosine")
        .filter(F.col("cosine") >= 0.95)
        .select("id_a", "id_b", "cosine")
    )


SQL_EMBEDDING_NEARDUP_CORPUS = """
  SELECT vec_id, embedding, label FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, embedding, label FROM embeddings
  WHERE vec_id % 20 = 0
"""


# --- Language identification --------------------------------------
def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read(spark, sf_dir, "documents")
    cols = ["doc_id", "lang"] + [f"score_{lang}" for lang in sorted(LANG_MARKERS)] + [
        "lang_pred"
    ]
    return with_language_id(d).select(*cols)


def _sql_language_id() -> str:
    score_exprs = []
    for lang in sorted(LANG_MARKERS):
        pat = "\\b(" + "|".join(LANG_MARKERS[lang]) + ")\\b"
        score_exprs.append(
            f"CAST(LENGTH(REGEXP_EXTRACT_ALL(text, '{pat}')) AS BIGINT) AS score_{lang}"
        )
    return f"""
WITH scored AS (
  SELECT doc_id, lang, {', '.join(score_exprs)} FROM documents)
SELECT doc_id, lang, {', '.join('score_' + lang for lang in sorted(LANG_MARKERS))},
       {lang_pick_case_sql()} AS lang_pred
FROM scored
"""


# --- Quality scoring ----------------------------------------------
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read(spark, sf_dir, "documents")
    return d.select("doc_id", quality_score().alias("quality"))


SQL_QUALITY_SCORE = """
WITH t AS (
  SELECT doc_id,
         CAST(LENGTH(text) AS DOUBLE) AS n_chars,
         CAST(LENGTH(REGEXP_EXTRACT_ALL(text, '[A-Za-z0-9]+')) AS DOUBLE) AS n_tokens,
         CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[^A-Za-z0-9 ]', '', 'g')) AS DOUBLE) AS n_punct
  FROM documents)
SELECT doc_id,
       (CASE WHEN n_chars / GREATEST(n_tokens, 1.0) >= 2
              AND n_chars / GREATEST(n_tokens, 1.0) <= 12 THEN 1.0 ELSE 0.5 END)
       * (CASE WHEN n_punct / GREATEST(n_chars, 1.0) <= 0.2 THEN 1.0 ELSE 0.5 END)
       AS quality
FROM t
"""


WEIGHTED_SAMPLE_RATE = 0.4


def q_quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted corpus sampling: keep each document with
    probability min(1, 0.4 · quality) — the continuous per-document
    variant of mixture sampling ("sample high-quality docs at a
    higher rate") used when the weight is a score, not a stratum.
    Deterministic hash coin (reproducible, salt-switchable), weight
    enters through one IEEE multiply + floor: kept set hash-exact
    cross-engine. Zero shuffles."""
    from dish_data_pipeline_spark.ops.sampling import weighted_sample
    from dish_data_pipeline_spark.ops.text import quality_score

    d = read(spark, sf_dir, "documents").withColumn("quality", quality_score())
    return weighted_sample(
        d, ["doc_id"], "quality", WEIGHTED_SAMPLE_RATE
    ).select("doc_id", "lang", "quality")


def _sql_weighted_sample() -> str:
    from dish_data_pipeline_spark.ops.portable import duck_phash
    from dish_data_pipeline_spark.ops.sampling import SAMPLE_DENOM

    h = duck_phash("concat_ws('|', cast(doc_id as string), 'wsample')")
    rate = f"CAST({WEIGHTED_SAMPLE_RATE!r} AS DOUBLE)"
    return f"""
WITH t AS (
  SELECT doc_id, lang,
         CAST(LENGTH(text) AS DOUBLE) AS n_chars,
         CAST(LENGTH(REGEXP_EXTRACT_ALL(text, '[A-Za-z0-9]+')) AS DOUBLE)
           AS n_tokens,
         CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[^A-Za-z0-9 ]', '', 'g'))
           AS DOUBLE) AS n_punct
  FROM documents),
q AS (
  SELECT doc_id, lang,
         (CASE WHEN n_chars / GREATEST(n_tokens, 1.0) >= 2
                AND n_chars / GREATEST(n_tokens, 1.0) <= 12 THEN 1.0 ELSE 0.5 END)
         * (CASE WHEN n_punct / GREATEST(n_chars, 1.0) <= 0.2 THEN 1.0 ELSE 0.5 END)
           AS quality
  FROM t)
SELECT doc_id, lang, quality FROM q
WHERE ({h}) % {SAMPLE_DENOM}
    < CAST(floor(least(CAST(1.0 AS DOUBLE), {rate} * quality)
                 * {SAMPLE_DENOM}) AS BIGINT)
"""


# --- Document fingerprint (md5) -----------------------------------
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read(spark, sf_dir, "documents")
    return with_fingerprint(d).select("doc_id", "fingerprint")


SQL_DOC_FINGERPRINT = "SELECT doc_id, md5(text) AS fingerprint FROM documents"


def _docs_with_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ exact copies of every 5th doc (id-shifted) — gives
    the dedup queries real duplicate groups to find. Widened so the
    per-row hash folds downstream use the full cluster."""
    d = read(spark, sf_dir, "documents")
    copies = d.filter(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    return widen(d.unionByName(copies), spark)


SQL_DOCS_WITH_DUPES = """
SELECT doc_id, text, lang, source, n_chars FROM documents
UNION ALL
SELECT doc_id + 100000 AS doc_id, text, lang, source, n_chars
FROM documents WHERE doc_id % 5 = 0
"""


# --- Exact dedup (hash-groupBy) -----------------------------------
def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup_groups(_docs_with_dupes(spark, sf_dir))


SQL_EXACT_DEDUP = f"""
WITH corpus AS ({SQL_DOCS_WITH_DUPES})
SELECT md5(text) AS content_hash,
       CAST(COUNT(*) AS BIGINT) AS n_copies,
       CAST(MIN(doc_id) AS BIGINT) AS canonical_id
FROM corpus GROUP BY md5(text)
"""


# --- MinHash-LSH near-dup (oracle replicates the LSH exactly) -----
def q_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dish_data_pipeline_spark.cache_registry import tracked_persist

    corpus = _docs_with_dupes(spark, sf_dir)
    # shingled feeds the banded side AND both rescore joins; the
    # rescore broadcasts the (small) pair set, so without a persist
    # the shingle pass re-runs per consumer (measured 1.6x at sf1.0)
    shingled = tracked_persist(with_shingles(corpus))
    pairs = minhash_candidate_pairs(with_minhash(shingled))
    return (
        exact_jaccard_pairs(shingled, pairs)
        .filter(F.col("jaccard") >= 0.8)
        .select("id_a", "id_b", "est_jaccard", "jaccard")
    )


# --- SimHash near-dup (4 × 15-bit bands ⇒ hamming ≤ 3 exact) ------
def q_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _docs_with_dupes(spark, sf_dir)
    return simhash_near_pairs(with_simhash(corpus)).filter(F.col("hamming") <= 3)


# --- n-gram Jaccard rescoring of banded candidates ----------------
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dish_data_pipeline_spark.cache_registry import tracked_persist

    corpus = _docs_with_dupes(spark, sf_dir)
    shingled = tracked_persist(with_shingles(corpus))  # see minhash_neardup
    pairs = minhash_candidate_pairs(with_minhash(shingled))
    return exact_jaccard_pairs(shingled, pairs).select(
        "id_a", "id_b", "est_jaccard", "jaccard"
    )


# --- Text cleaning / normalization --------------------------------
def q_text_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-training text normalization over a corpus with planted
    URLs (every 7th doc) and e-mail addresses (every 11th) — the
    synthetic documents are clean, so the query plants removable
    artifacts deterministically in BOTH engines."""
    from dish_data_pipeline_spark.ops.text import clean_text

    d = read(spark, sf_dir, "documents")
    aug = d.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.lit(" see https://example.com/data?id=7 "),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.lit(" contact bob.smith@example.com now"),
            ).otherwise(F.lit("")),
        ),
    )
    return clean_text(aug).select(
        "doc_id", "had_url", "had_email", "clean_text", "n_chars_removed"
    )


def _sql_text_clean() -> str:
    from dish_data_pipeline_spark.ops.text import CTRL_RE, EMAIL_RE, URL_RE

    cleaned = (
        "TRIM(regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        f"text, '{CTRL_RE}', ' ', 'g'), '{URL_RE}', ' ', 'g'), "
        f"'{EMAIL_RE}', ' ', 'g'), '\\s+', ' ', 'g'))"
    )
    return f"""
WITH aug AS (
  SELECT doc_id, text
    || CASE WHEN doc_id % 7 = 0
            THEN ' see https://example.com/data?id=7 ' ELSE '' END
    || CASE WHEN doc_id % 11 = 0
            THEN ' contact bob.smith@example.com now' ELSE '' END AS text
  FROM documents),
c AS (SELECT doc_id, text, {cleaned} AS clean_text FROM aug)
SELECT doc_id,
       CAST(regexp_matches(text, '{URL_RE}') AS INT) AS had_url,
       CAST(regexp_matches(text, '{EMAIL_RE}') AS INT) AS had_email,
       clean_text,
       CAST(LENGTH(text) - LENGTH(clean_text) AS BIGINT) AS n_chars_removed
FROM c
"""


# --- Gopher-style repetition statistics ---------------------------
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-frequent word bigram per doc + the character fraction it
    covers + duplicate-bigram occurrence fraction (the Gopher
    boilerplate signals, Rae et al. 2021 §A1.1)."""
    from dish_data_pipeline_spark.ops.text import top_ngram_stats

    return top_ngram_stats(read(spark, sf_dir, "documents"))


SQL_REPETITION_STATS = """
WITH toks AS (
  SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS nchars,
         regexp_extract_all(text, '[A-Za-z0-9]+') AS t
  FROM documents),
grams AS (
  SELECT doc_id, nchars,
         unnest(CASE WHEN len(t) >= 2 THEN
            list_transform(generate_series(1, len(t) - 1),
                           i -> t[i] || ' ' || t[i + 1])
            ELSE [] END) AS gram
  FROM toks),
counts AS (
  SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS gram_count,
         MIN(nchars) AS nchars
  FROM grams GROUP BY doc_id, gram),
rolled AS (
  SELECT doc_id,
         max(struct_pack(c := gram_count, g := gram)) AS top,
         CAST(SUM(gram_count) AS BIGINT) AS n_ngrams,
         CAST(COUNT(*) AS BIGINT) AS n_distinct,
         MIN(nchars) AS nchars
  FROM counts GROUP BY doc_id)
SELECT doc_id, top.g AS top_ngram, top.c AS top_ngram_count,
       CAST(top.c AS DOUBLE) * CAST(LENGTH(top.g) AS DOUBLE)
         / CAST(nchars AS DOUBLE) AS top_ngram_char_frac,
       n_ngrams,
       1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_ngrams AS DOUBLE)
         AS dup_ngram_frac
FROM rolled
"""


# --- Gopher/C4-style quality gate ---------------------------------
def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-rule quality flags + conjunction keep bit (token-count
    window, mean-token-length window, symbol ratio cap, distinct
    fraction floor) — pure map-side column arithmetic."""
    from dish_data_pipeline_spark.ops.text import with_quality_flags

    return with_quality_flags(read(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "n_tokens", "mean_token_len", "symbol_ratio",
        "distinct_frac", "ok_tokens", "ok_mean_len", "ok_symbol",
        "ok_distinct", "keep",
    )


SQL_GOPHER_QUALITY = """
WITH d0 AS (SELECT doc_id, lang, COALESCE(text, '') AS text FROM documents),
s AS (
  SELECT doc_id, lang,
         CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)
           AS n_tokens,
         CAST(LENGTH(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS DOUBLE)
           AS n_alnum,
         CAST(LENGTH(text)
              - LENGTH(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g'))
           AS DOUBLE) AS n_symbols,
         CAST(len(list_distinct(regexp_extract_all(text, '[A-Za-z0-9]+')))
           AS DOUBLE) AS n_distinct
  FROM d0),
m AS (
  SELECT doc_id, lang, n_tokens,
         n_alnum / CAST(GREATEST(n_tokens, 1) AS DOUBLE) AS mean_token_len,
         n_symbols / CAST(GREATEST(n_tokens, 1) AS DOUBLE) AS symbol_ratio,
         n_distinct / CAST(GREATEST(n_tokens, 1) AS DOUBLE) AS distinct_frac
  FROM s)
SELECT doc_id, lang, n_tokens, mean_token_len, symbol_ratio, distinct_frac,
       CAST(n_tokens >= 10 AND n_tokens <= 100000 AS INT) AS ok_tokens,
       CAST(mean_token_len >= 2.0 AND mean_token_len <= 12.0 AS INT)
         AS ok_mean_len,
       CAST(symbol_ratio <= 0.1 AS INT) AS ok_symbol,
       CAST(distinct_frac >= 0.2 AS INT) AS ok_distinct,
       CAST(n_tokens >= 10 AND n_tokens <= 100000
            AND mean_token_len >= 2.0 AND mean_token_len <= 12.0
            AND symbol_ratio <= 0.1 AND distinct_frac >= 0.2 AS INT) AS keep
FROM m
"""


# --- Corpus datasheet: per-(source, lang) data card ---------------
def q_corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The "datasheet for datasets" rollup every corpus release
    ships (Gebru et al. 2021): one row per (source, lang) with doc /
    token / char volumes, the Gopher-gate pass count, exact-dup
    exposure (docs minus distinct texts), and the token-length
    envelope. Pure composition — the same ``with_quality_flags``
    columns the standalone gopher_quality query certifies, one
    map-side pass then a single |sources×langs|-bounded aggregate
    (COUNT(DISTINCT text) adds the usual two-phase distinct
    aggregation; everything else combines map-side)."""
    from dish_data_pipeline_spark.ops.text import with_quality_flags

    d = with_quality_flags(read(spark, sf_dir, "documents"))
    return d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
        F.sum("keep").cast("bigint").alias("n_gopher_keep"),
        (F.count(F.lit(1)) - F.countDistinct("text"))
        .cast("bigint")
        .alias("n_exact_dups"),
        F.min("n_tokens").cast("bigint").alias("min_tokens"),
        F.max("n_tokens").cast("bigint").alias("max_tokens"),
    )


SQL_CORPUS_DATASHEET = """
WITH d0 AS (
  SELECT source, lang, n_chars, text,
         COALESCE(text, '') AS t
  FROM documents),
s AS (
  SELECT source, lang, n_chars, text,
         CAST(len(regexp_extract_all(t, '[A-Za-z0-9]+')) AS BIGINT)
           AS n_tokens,
         CAST(LENGTH(regexp_replace(t, '[^A-Za-z0-9]', '', 'g')) AS DOUBLE)
           AS n_alnum,
         CAST(LENGTH(t)
              - LENGTH(regexp_replace(t, '[^A-Za-z0-9 ]', '', 'g'))
           AS DOUBLE) AS n_symbols,
         CAST(len(list_distinct(regexp_extract_all(t, '[A-Za-z0-9]+')))
           AS DOUBLE) AS n_distinct
  FROM d0),
m AS (
  SELECT source, lang, n_chars, text, n_tokens,
         CAST(n_tokens >= 10 AND n_tokens <= 100000
              AND n_alnum / CAST(GREATEST(n_tokens, 1) AS DOUBLE) >= 2.0
              AND n_alnum / CAST(GREATEST(n_tokens, 1) AS DOUBLE) <= 12.0
              AND n_symbols / CAST(GREATEST(n_tokens, 1) AS DOUBLE) <= 0.1
              AND n_distinct / CAST(GREATEST(n_tokens, 1) AS DOUBLE) >= 0.2
           AS INT) AS keep
  FROM s)
SELECT source, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       CAST(SUM(keep) AS BIGINT) AS n_gopher_keep,
       CAST(COUNT(*) - COUNT(DISTINCT text) AS BIGINT) AS n_exact_dups,
       CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
       CAST(MAX(n_tokens) AS BIGINT) AS max_tokens
FROM m GROUP BY source, lang
"""


# --- Benchmark decontamination (n-gram collision) -----------------
CONTAM_N = 5


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination report: corpus docs (doc_id % 10 != 0) vs a
    benchmark split (doc_id % 10 == 0) — hashed word 5-gram
    collisions via a broadcast semi-join (GPT-3 appendix C style
    decontamination)."""
    from dish_data_pipeline_spark.ops.contamination import contamination_report

    d = read(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    bench = d.filter(F.col("doc_id") % 10 == 0)
    return contamination_report(corpus, bench, n=CONTAM_N)


def _sql_contamination(n: int = CONTAM_N) -> str:
    from dish_data_pipeline_spark.ops.portable import duck_phash

    ghash = duck_phash(f"array_to_string(t[i:i + {n - 1}], ' ')")
    grams = (
        f"CASE WHEN len(t) >= {n} THEN "
        f"list_transform(generate_series(1, len(t) - {n - 1}), i -> {ghash}) "
        "ELSE [] END"
    )
    return f"""
WITH corpus AS (SELECT * FROM documents WHERE doc_id % 10 != 0),
bench AS (SELECT * FROM documents WHERE doc_id % 10 = 0),
ctok AS (SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS t
         FROM corpus),
cg AS (SELECT doc_id, unnest({grams}) AS gram_hash FROM ctok),
btok AS (SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS t
         FROM bench),
bg AS (SELECT DISTINCT unnest({grams}) AS gram_hash FROM btok),
perdoc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams
           FROM cg GROUP BY doc_id),
hits AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated
         FROM cg WHERE gram_hash IN (SELECT gram_hash FROM bg)
         GROUP BY doc_id)
SELECT c.doc_id,
       COALESCE(p.n_grams, 0) AS n_grams,
       COALESCE(h.n_contaminated, 0) AS n_contaminated,
       CAST(COALESCE(h.n_contaminated, 0) AS DOUBLE)
         / CAST(GREATEST(COALESCE(p.n_grams, 0), 1) AS DOUBLE)
         AS contamination_frac,
       CAST(COALESCE(h.n_contaminated, 0) > 0 AS INT) AS contaminated
FROM corpus c
LEFT JOIN perdoc p ON p.doc_id = c.doc_id
LEFT JOIN hits h ON h.doc_id = c.doc_id
"""


# --- Bloom-filter decontamination pre-filter ----------------------
BLOOM_WORDS = 2048  # 129,024 bits: ~2e-4 FP at sf0.01, ~9% at sf0.1
BLOOM_K = 3


def q_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size Bloom pre-filter for benchmark decontamination: the
    bench split's hashed 5-grams feed a 2048-word filter; every
    corpus gram probes it map-side. Per doc: gram count, Bloom-
    positive count (true hits + DETERMINISTIC false positives — the
    oracle replicates the filter bit-for-bit), exact-hit count, and
    the FP overcount the exact verify pass would discard. A
    Bloom-negative doc (`clean`=1) is PROVABLY uncontaminated — at
    100 TB that's the fraction of the corpus that never reaches the
    exact semi-join."""
    from dish_data_pipeline_spark.cache_registry import tracked_persist
    from dish_data_pipeline_spark.ops.bloom import bloom_build, bloom_probe_hits
    from dish_data_pipeline_spark.ops.portable import spark_phash
    from dish_data_pipeline_spark.ops.text import TOKEN_RE

    n = CONTAM_N
    d = read(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    bench = d.filter(F.col("doc_id") % 10 == 0)
    toks = F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), 0)
    gram_h = spark_phash(f"concat_ws(chr(32), slice(_toks, i, {n}))")
    grams_expr = (
        f"CASE WHEN size(_toks) >= {n} THEN "
        f"transform(sequence(1, size(_toks) - {n - 1}), "
        f"i -> struct(CAST(i AS BIGINT) AS pos, {gram_h} AS elem_hash)) "
        "ELSE array() END"
    )
    corpus_grams = tracked_persist(
        corpus.select("doc_id", toks.alias("_toks"))
        .select("doc_id", F.explode(F.expr(grams_expr)).alias("_g"))
        .select("doc_id", "_g.pos", "_g.elem_hash")
    )
    bench_hashes = tracked_persist(
        bench.select(toks.alias("_toks"))
        .select(
            F.explode(
                F.expr(
                    f"CASE WHEN size(_toks) >= {n} THEN "
                    f"transform(sequence(1, size(_toks) - {n - 1}), "
                    f"i -> {gram_h}) ELSE array() END"
                )
            ).alias("elem_hash")
        )
        .distinct()
    )
    bf = bloom_build(bench_hashes, n_words=BLOOM_WORDS, n_hashes=BLOOM_K)
    member = bloom_probe_hits(
        corpus_grams, bf, ["doc_id", "pos", "elem_hash"],
        n_words=BLOOM_WORDS, n_hashes=BLOOM_K,
    )
    flagged = member.join(
        F.broadcast(bench_hashes.withColumn("_true", F.lit(1))),
        "elem_hash", "left",
    ).select(
        "doc_id", "member", F.coalesce("_true", F.lit(0)).alias("_true")
    )
    agg = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams"),
        F.sum("member").cast("bigint").alias("n_bloom_hits"),
        F.sum("_true").cast("bigint").alias("n_true_hits"),
    )
    return (
        corpus.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce("n_bloom_hits", F.lit(0)).cast("bigint")
            .alias("n_bloom_hits"),
            F.coalesce("n_true_hits", F.lit(0)).cast("bigint")
            .alias("n_true_hits"),
            (F.coalesce("n_bloom_hits", F.lit(0))
             - F.coalesce("n_true_hits", F.lit(0))).cast("bigint")
            .alias("n_false_pos"),
            (F.coalesce("n_bloom_hits", F.lit(0)) == 0).cast("int")
            .alias("clean"),
        )
    )


def _sql_bloom_decontaminate(n: int = CONTAM_N) -> str:
    from dish_data_pipeline_spark.ops.bloom import (
        bloom_build_sql, bloom_probe_sql,
    )
    from dish_data_pipeline_spark.ops.portable import duck_phash

    ghash = duck_phash(f"array_to_string(t[i:i + {n - 1}], ' ')")
    probe = bloom_probe_sql(
        "cge", "bf", ["doc_id", "pos", "elem_hash"],
        n_words=BLOOM_WORDS, n_hashes=BLOOM_K,
    )
    return f"""
WITH corpus AS (SELECT * FROM documents WHERE doc_id % 10 != 0),
bench AS (SELECT * FROM documents WHERE doc_id % 10 = 0),
ctok AS (SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS t
         FROM corpus),
cge AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, {ghash} AS elem_hash
        FROM ctok, UNNEST(generate_series(1, greatest(len(t) - {n - 1}, 0)))
             AS u(i)),
btok AS (SELECT regexp_extract_all(text, '[A-Za-z0-9]+') AS t FROM bench),
bg AS (SELECT DISTINCT {ghash} AS elem_hash
       FROM btok, UNNEST(generate_series(1, greatest(len(t) - {n - 1}, 0)))
            AS u(i)),
bf AS ({bloom_build_sql('bg', n_words=BLOOM_WORDS, n_hashes=BLOOM_K)}),
probe AS ({probe}),
perrow AS (
  SELECT p.doc_id, p.member,
         CASE WHEN p.elem_hash IN (SELECT elem_hash FROM bg)
              THEN 1 ELSE 0 END AS istrue
  FROM probe p),
agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(SUM(member) AS BIGINT) AS n_bloom_hits,
         CAST(SUM(istrue) AS BIGINT) AS n_true_hits
  FROM perrow GROUP BY doc_id)
SELECT c.doc_id,
       COALESCE(a.n_grams, 0) AS n_grams,
       COALESCE(a.n_bloom_hits, 0) AS n_bloom_hits,
       COALESCE(a.n_true_hits, 0) AS n_true_hits,
       COALESCE(a.n_bloom_hits, 0) - COALESCE(a.n_true_hits, 0)
         AS n_false_pos,
       CAST(COALESCE(a.n_bloom_hits, 0) = 0 AS INT) AS clean
FROM corpus c LEFT JOIN agg a ON a.doc_id = c.doc_id
"""


# --- Z-order layout clustering ------------------------------------
ZORDER_BITS = 8
ZORDER_BUCKETS = 64


def q_zorder_extents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout manifest over orders, interleaving customer key
    × order date (epoch days): 64 equal-width z-range buckets (files,
    conceptually) with per-dimension min/max rectangles and cell
    volume — the file-skipping statistics a writer persists after
    ``repartitionByRange(zvalue)``. Tight rectangles on BOTH
    dimensions are the whole point: either predicate prunes most
    buckets, which single-column sorting cannot give."""
    from dish_data_pipeline_spark.ops.layout import (
        layout_extents, with_zvalue,
    )

    o = read(spark, sf_dir, "orders").selectExpr(
        "CAST(o_custkey AS BIGINT) AS ck",
        "CAST(datediff(o_orderdate, DATE '1970-01-01') AS BIGINT) AS td",
    )
    z = with_zvalue(o, ["ck", "td"], bits=ZORDER_BITS)
    return layout_extents(
        z, ZORDER_BUCKETS, bits=ZORDER_BITS, n_dims=2
    ).select(
        "bucket", "n_rows", "min_d0", "max_d0", "min_d1", "max_d1",
        "extent_cells",
    )


def _sql_zorder_extents() -> str:
    from dish_data_pipeline_spark.ops.layout import morton_expr, scaled_expr

    s0 = scaled_expr("c", "mc", "xc", ZORDER_BITS, "//")
    s1 = scaled_expr("t", "mt", "xt", ZORDER_BITS, "//")
    z = morton_expr(["s0", "s1"], ZORDER_BITS, "//")
    width = (1 << (2 * ZORDER_BITS)) // ZORDER_BUCKETS
    return f"""
WITH src AS (
  SELECT CAST(o_custkey AS BIGINT) AS c,
         CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT)
           AS t
  FROM orders),
b AS (SELECT MIN(c) AS mc, MAX(c) AS xc, MIN(t) AS mt, MAX(t) AS xt
      FROM src),
s AS (SELECT CAST({s0} AS BIGINT) AS s0, CAST({s1} AS BIGINT) AS s1
      FROM src, b),
z AS (SELECT s0, s1, CAST({z} AS BIGINT) AS zvalue FROM s)
SELECT zvalue // {width} AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(s0) AS min_d0, MAX(s0) AS max_d0,
       MIN(s1) AS min_d1, MAX(s1) AS max_d1,
       CAST((MAX(s0) - MIN(s0) + 1) * (MAX(s1) - MIN(s1) + 1) AS BIGINT)
         AS extent_cells
FROM z GROUP BY 1
"""


# --- Target-mixture corpus sampling -------------------------------
MIX_WEIGHTS = {"en": 0.5, "de": 0.3, "fr": 0.2}
MIX_OUT_ROWS = 200


def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample toward a target language mixture: per-stratum rates
    derived from observed counts INSIDE the plan (broadcast count
    join, no driver collect), hash-deterministic membership."""
    from dish_data_pipeline_spark.ops.sampling import mixture_sample

    d = read(spark, sf_dir, "documents")
    return mixture_sample(
        d, "lang", MIX_WEIGHTS, MIX_OUT_ROWS,
        key_cols=["cast(doc_id as string)"],
    ).select("doc_id", "lang")


def _sql_corpus_mix() -> str:
    from dish_data_pipeline_spark.ops.portable import duck_phash
    from dish_data_pipeline_spark.ops.sampling import (
        SAMPLE_DENOM,
        mixture_case_sql,
    )

    w_case = mixture_case_sql("lang", MIX_WEIGHTS)
    h = duck_phash("concat_ws('|', cast(doc_id as string), 'mix')")
    return f"""
WITH counts AS (SELECT lang, COUNT(*) AS _n FROM documents GROUP BY lang),
th AS (SELECT lang, LEAST({SAMPLE_DENOM}, CAST(floor(
         {w_case} * {MIX_OUT_ROWS} * {SAMPLE_DENOM} / _n) AS BIGINT))
         AS _thresh
       FROM counts)
SELECT d.doc_id, d.lang FROM documents d JOIN th ON th.lang = d.lang
WHERE ({h}) % {SAMPLE_DENOM} < _thresh
"""


# --- Temperature-flattened mixture (alpha = 0.5) -------------------
TEMP_OUT_ROWS = 200


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature sampling at α = 0.5 (``ops.sampling.
    temperature_sample``): language shares flatten toward
    sqrt-proportional — the XLM-R/mBERT device for keeping tail
    languages alive in the mixture without a hand-maintained weight
    table. The 200-doc budget keeps every stratum's rate strictly
    below 1 at sf >= 0.01, so the flattening (tail languages kept at
    a higher RATE than the head) actually binds rather than
    degenerating into a pass-through. Exact oracle: sqrt is
    correctly rounded on both engines
    and the per-stratum masses are floor-quantized BIGINTs, so the
    hash-coin membership matches bit-for-bit."""
    from dish_data_pipeline_spark.ops.sampling import temperature_sample

    d = read(spark, sf_dir, "documents")
    return temperature_sample(
        d, "lang", TEMP_OUT_ROWS, key_cols=["cast(doc_id as string)"]
    ).select("doc_id", "lang")


def _sql_temperature_mix() -> str:
    from dish_data_pipeline_spark.ops.sampling import temperature_sample_sql

    inner = temperature_sample_sql(
        "lang", TEMP_OUT_ROWS, "cast(doc_id as string)"
    )
    return f"SELECT doc_id, lang FROM ({inner})"


# --- Token-budgeted mixture sampling ------------------------------
MIXTOK_OUT_TOKENS = 12_000


def q_corpus_mix_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample toward a target TOKEN mixture: per-stratum rates =
    weight × token budget / observed token sum, derived in-plan
    (training mixtures are token-budgeted, not doc-budgeted)."""
    from dish_data_pipeline_spark.ops.sampling import mixture_sample_tokens

    d = read(spark, sf_dir, "documents").withColumn(
        "n_tokens",
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit("[A-Za-z0-9]+"), 0)
        ).cast("bigint"),
    )
    return mixture_sample_tokens(
        d, "lang", MIX_WEIGHTS, MIXTOK_OUT_TOKENS,
        token_col="n_tokens", key_cols=["cast(doc_id as string)"],
    ).select("doc_id", "lang", "n_tokens")


def _sql_corpus_mix_tokens() -> str:
    from dish_data_pipeline_spark.ops.portable import duck_phash
    from dish_data_pipeline_spark.ops.sampling import (
        SAMPLE_DENOM,
        mixture_case_sql,
    )

    w_case = mixture_case_sql("lang", MIX_WEIGHTS)
    h = duck_phash("concat_ws('|', cast(doc_id as string), 'mixtok')")
    return f"""
WITH d AS (
  SELECT doc_id, lang,
         CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)
           AS n_tokens
  FROM documents),
sums AS (SELECT lang, SUM(n_tokens) AS _tok FROM d GROUP BY lang),
th AS (SELECT lang, LEAST({SAMPLE_DENOM}, CAST(floor(
         {w_case} * {MIXTOK_OUT_TOKENS} * {SAMPLE_DENOM} / _tok) AS BIGINT))
         AS _thresh
       FROM sums)
SELECT d.doc_id, d.lang, d.n_tokens FROM d JOIN th ON th.lang = d.lang
WHERE ({h}) % {SAMPLE_DENOM} < _thresh
"""


# --- Incremental (cross-corpus) near-dup filter -------------------
def _new_batch(d: DataFrame) -> DataFrame:
    """Synthetic ingest batch: exact copies of every 7th doc (must be
    dropped against the existing corpus) + genuinely fresh docs built
    from ids (must survive)."""
    copies = d.filter(F.col("doc_id") % 7 == 0).withColumn(
        "doc_id", F.col("doc_id") + 200000
    )
    fresh = d.filter(F.col("doc_id") % 3 == 1).select(
        (F.col("doc_id") + 300000).alias("doc_id"),
        F.concat(
            F.lit("fresh unseen material "),
            F.col("doc_id").cast("string"),
            F.lit(" alpha beta gamma delta epsilon zeta"),
        ).alias("text"),
        "lang", "source", "n_chars",
    )
    return copies.unionByName(fresh)


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-batch docs surviving the MinHash band-bucket probe against
    the existing corpus' signature keys (incremental ingest dedup —
    the existing side never rescans text at ingest time)."""
    from dish_data_pipeline_spark.ops.dedup_fuzzy import (
        incremental_neardup_filter,
    )

    d = read(spark, sf_dir, "documents")
    return incremental_neardup_filter(_new_batch(d), d).select("doc_id", "lang")


SQL_NEW_BATCH = """
SELECT doc_id + 200000 AS doc_id, text, lang, source, n_chars
FROM documents WHERE doc_id % 7 = 0
UNION ALL
SELECT doc_id + 300000 AS doc_id,
       'fresh unseen material ' || CAST(doc_id AS VARCHAR)
         || ' alpha beta gamma delta epsilon zeta' AS text,
       lang, source, n_chars
FROM documents WHERE doc_id % 3 = 1
"""


# --- LSH quality evaluation ---------------------------------------
# fixed-size sample whatever the corpus scale: the truth side is
# O(N²) by design, so the harness pins N (base ids < 400 plus their
# planted copies) instead of growing with the corpus
LSH_EVAL_FILTER = "doc_id % 100000 < 400"


def q_lsh_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall of the MinHash band-join candidate set vs
    exact all-pairs Jaccard truth at 0.8 — the sample-scale tuning
    harness for (bands, rows_per_band)."""
    from dish_data_pipeline_spark.ops.dedup_fuzzy import lsh_quality_metrics

    return lsh_quality_metrics(
        _docs_with_dupes(spark, sf_dir).filter(F.expr(LSH_EVAL_FILTER))
    )


# --- Segment-level exact dedup ------------------------------------
SEG_TOKENS = 10


def q_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strip 10-token segments duplicated across documents (keep-first
    in the lowest doc_id) and reassemble the surviving text — CCNet
    paragraph-dedup over fixed token windows. Runs on the
    planted-duplicate corpus so whole documents genuinely empty out."""
    from dish_data_pipeline_spark.ops.segments import segment_dedup

    return segment_dedup(
        _docs_with_dupes(spark, sf_dir), seg_tokens=SEG_TOKENS
    )


def _sql_segment_dedup(k: int = SEG_TOKENS) -> str:
    from dish_data_pipeline_spark.ops.portable import duck_phash

    return f"""
WITH corpus AS ({SQL_DOCS_WITH_DUPES}),
tok AS (
  SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS t FROM corpus),
posn AS (
  SELECT doc_id, t,
         unnest(generate_series(0, CAST(ceil(len(t) / {k}.0) AS BIGINT) - 1))
           AS pos
  FROM tok),
seg AS (
  SELECT doc_id, pos,
         array_to_string(t[pos * {k} + 1:pos * {k} + {k}], ' ') AS seg
  FROM posn),
sh AS (SELECT doc_id, pos, seg, {duck_phash('seg')} AS seg_hash FROM seg),
census AS (
  SELECT seg_hash, COUNT(DISTINCT doc_id) AS n_docs,
         MIN(doc_id) AS first_doc
  FROM sh GROUP BY seg_hash),
kept AS (
  SELECT s.doc_id, string_agg(s.seg, ' ' ORDER BY s.pos) AS text_deduped,
         CAST(COUNT(*) AS BIGINT) AS n_kept
  FROM sh s JOIN census c ON c.seg_hash = s.seg_hash
  WHERE c.n_docs <= 1 OR s.doc_id = c.first_doc
  GROUP BY s.doc_id),
totals AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segments
  FROM sh GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(kp.text_deduped, '') AS text_deduped,
       COALESCE(t.n_segments, 0) AS n_segments,
       COALESCE(kp.n_kept, 0) AS n_kept
FROM corpus d
LEFT JOIN totals t ON t.doc_id = d.doc_id
LEFT JOIN kept kp ON kp.doc_id = d.doc_id
"""


# --- PII redaction ------------------------------------------------
# Synthetic PII planted from doc_id (the corpus itself has none):
# identical SQL string evaluated by Spark and DuckDB.
PII_AUG_SQL = (
    "text || CASE WHEN doc_id % 3 = 0 THEN ' contact user' "
    "|| CAST(doc_id AS STRING) || '@mail.example.com' ELSE '' END "
    "|| CASE WHEN doc_id % 5 = 0 THEN ' from host 10.0.' "
    "|| CAST(doc_id % 256 AS STRING) || '.' || CAST(doc_id % 100 AS STRING) "
    "ELSE '' END "
    "|| CASE WHEN doc_id % 7 = 0 THEN ' call +49 170 ' "
    "|| lpad(CAST(doc_id % 1000000 AS STRING), 6, '0') ELSE '' END"
)


def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact planted e-mails / IPv4s / phone numbers with typed
    placeholders and count matches per doc (map-side regexp chain)."""
    from dish_data_pipeline_spark.ops.text import redact_pii

    # null→'' BEFORE augmentation (matches the oracle's d0 CTE):
    # Spark's || is null-propagating, so coalescing after would erase
    # the planted PII on null-text docs while DuckDB keeps it
    d = (
        read(spark, sf_dir, "documents")
        .withColumn("text", F.coalesce(F.col("text"), F.lit("")))
        .withColumn("text", F.expr(PII_AUG_SQL))
    )
    return redact_pii(d).select(
        "doc_id", "n_emails", "n_ips", "n_phones", "text_redacted"
    )


def _sql_pii_redaction() -> str:
    from dish_data_pipeline_spark.ops.text import EMAIL_RE, IPV4_RE, PHONE_RE

    # staged exactly like redact_pii: the 3-regex replacement chain,
    # then each count derived from the placeholder occurrences in the
    # final redacted text (literal-replace length delta — no extra
    # regex passes, same convention as the Spark side)
    return f"""
WITH d0 AS (SELECT doc_id, COALESCE(text, '') AS text FROM documents),
aug AS (SELECT doc_id, {PII_AUG_SQL} AS t0 FROM d0),
red AS (SELECT doc_id,
               regexp_replace(regexp_replace(regexp_replace(
                 t0, '{EMAIL_RE}', '<EMAIL>', 'g'),
                 '{IPV4_RE}', '<IP>', 'g'),
                 '{PHONE_RE}', '<PHONE>', 'g') AS text_redacted
        FROM aug)
SELECT doc_id,
       CAST((len(text_redacted)
             - len(replace(text_redacted, '<EMAIL>', ''))) // 7 AS BIGINT)
         AS n_emails,
       CAST((len(text_redacted)
             - len(replace(text_redacted, '<IP>', ''))) // 4 AS BIGINT)
         AS n_ips,
       CAST((len(text_redacted)
             - len(replace(text_redacted, '<PHONE>', ''))) // 7 AS BIGINT)
         AS n_phones,
       text_redacted
FROM red
"""


# --- KMV distinct-count sketch ------------------------------------
KMV_K = 64

# shared by distinct_sketch and sketch_merge (Spark side).
# Two-step on purpose: tokenization lands in its own projection
# ("_toks") so the regex runs ONCE per row — the previous inline form
# mentioned regexp_extract_all three times in one expression, and
# codegen does not always common-subexpression it inside a
# higher-order-function body (measured ~1.5x on the trigram queries).
TOKENIZE_SPARK = "regexp_extract_all(text, '[A-Za-z0-9]+', 0)"
TRIGRAM_FROM_TOKS = (
    "explode(CASE WHEN size(_toks) >= 3 "
    "THEN transform(sequence(1, size(_toks) - 2), "
    "i -> concat_ws(' ', slice(_toks, i, 3))) "
    "ELSE array() END)"
)


def _trigrams(d: DataFrame, *keep: str) -> DataFrame:
    return d.selectExpr(*keep, f"{TOKENIZE_SPARK} AS _toks").selectExpr(
        *keep, f"{TRIGRAM_FROM_TOKS} AS gram"
    )


def q_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language distinct trigram count, exact AND KMV-estimated —
    the sketch arithmetic is bit-identical in the DuckDB oracle, so
    the approximation itself is verified, not just bounded."""
    from dish_data_pipeline_spark.ops.sketch import kmv_distinct

    d = read(spark, sf_dir, "documents")
    grams = _trigrams(d, "lang")
    return kmv_distinct(grams, "lang", "gram", k=KMV_K)


def _sql_distinct_sketch() -> str:
    from dish_data_pipeline_spark.ops.sketch import kmv_distinct_sql

    src = (
        "SELECT lang, unnest(list_transform(generate_series(1, "
        "len(regexp_extract_all(text, '[A-Za-z0-9]+')) - 2), "
        "i -> array_to_string(regexp_extract_all(text, '[A-Za-z0-9]+')"
        "[i:i + 2], ' '))) AS gram FROM documents"
    )
    return kmv_distinct_sql(src, "lang", "gram", k=KMV_K)


def q_jaccard_simjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT τ=0.6 trigram-shingle Jaccard join over the planted-
    duplicate corpus via prefix filtering (PPJoin) — the
    no-false-negative complement to the LSH near-dup tiers (trigram shingles,
    not bare tokens: the synthetic 31-word vocabulary saturates
    token SETS and keeps even bigram space at <=961 values — too few
    for prefix tokens to be selective — while the ~30k-value trigram
    space discriminates). The DuckDB twin is the
    brute-force ALL-PAIRS join (an independent algorithm), so the
    hash match proves the rarity-ordered prefix candidate generation
    loses no qualifying pair."""
    from dish_data_pipeline_spark.ops.setsim import jaccard_similarity_join

    return jaccard_similarity_join(
        _docs_with_dupes(spark, sf_dir), 60, shingle_n=3
    )


def _sql_jaccard_simjoin() -> str:
    from dish_data_pipeline_spark.ops.setsim import (
        jaccard_similarity_join_sql,
    )

    return jaccard_similarity_join_sql(SQL_DOCS_WITH_DUPES, 60, shingle_n=3)


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quote/excerpt detection over the planted-duplicate corpus:
    ordered pairs where ≥ 80% of one doc's trigram shingles occur in
    the other — the asymmetric signal Jaccard misses (a short doc
    inside a long one). Brute-force all-ordered-pairs DuckDB twin
    independently proves the shared-element candidate join complete."""
    from dish_data_pipeline_spark.ops.setsim import containment_pairs

    return containment_pairs(_docs_with_dupes(spark, sf_dir), 80)


def _sql_containment_pairs() -> str:
    from dish_data_pipeline_spark.ops.setsim import containment_pairs_sql

    return containment_pairs_sql(SQL_DOCS_WITH_DUPES, 80)


def q_fuzzy_part_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy key match in the order a real pipeline
    runs it: exact-dedup the key space FIRST (the distinct part-name
    dictionary with its lowest part id as representative — the
    SymSpell discipline; matching raw rows instead degenerates on
    heavy key duplication: 1.1M pairs / 108 s at sf0.1 vs a
    dictionary constant in corpus size), then find every dictionary
    pair within Levenshtein 1 via the deletion-neighborhood join —
    planted typos (4th character deleted, id-shifted) plus organic
    near-collisions. The DuckDB twin is the brute-force all-pairs
    levenshtein over the same dictionary (independent algorithm), so
    the hash match proves the exact-blocking claim."""
    from dish_data_pipeline_spark.ops.fuzzykey import edit1_pairs

    dictionary = (
        read(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.min("p_partkey").alias("p_partkey"))
    )
    typos = dictionary.filter(F.col("p_partkey") % 4 == 0).select(
        F.expr(
            "concat(substring(p_name, 1, 3), substring(p_name, 5))"
        ).alias("p_name"),
        (F.col("p_partkey") + 1000000).alias("p_partkey"),
    )
    return edit1_pairs(
        dictionary.unionByName(typos), "p_partkey", "p_name"
    ).filter(F.col("dist") == 1)


def q_part_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution, the composition a master-data
    pipeline runs: exact-dedup the key space → deletion-neighborhood
    edit-distance-1 blocking → connected components over the match
    graph → every key mapped to its entity (min-id label) with the
    canonical spelling and member count. The DuckDB twin recomputes
    the matches brute-force (all-pairs levenshtein — an independent
    algorithm) and the clusters with WITH RECURSIVE reachability, so
    the hash match proves blocking completeness AND cluster
    transitivity in one statement."""
    from dish_data_pipeline_spark.cache_registry import tracked_persist
    from dish_data_pipeline_spark.ops.dedup_cluster import connected_components
    from dish_data_pipeline_spark.ops.fuzzykey import edit1_pairs

    dictionary = (
        read(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.min("p_partkey").alias("p_partkey"))
    )
    typos = dictionary.filter(F.col("p_partkey") % 4 == 0).select(
        F.expr(
            "concat(substring(p_name, 1, 3), substring(p_name, 5))"
        ).alias("p_name"),
        (F.col("p_partkey") + 1000000).alias("p_partkey"),
    )
    keys = tracked_persist(dictionary.unionByName(typos))
    pairs = edit1_pairs(keys, "p_partkey", "p_name").filter(
        F.col("dist") == 1
    )
    clusters = connected_components(
        keys.selectExpr("p_partkey AS doc_id"), pairs
    ).selectExpr("doc_id AS p_partkey", "cluster_id AS entity_id")
    labeled = keys.join(clusters, "p_partkey")
    canon = labeled.filter(
        F.col("p_partkey") == F.col("entity_id")
    ).selectExpr("entity_id", "p_name AS canonical_name")
    sizes = labeled.groupBy("entity_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )
    return (
        labeled.join(canon, "entity_id")
        .join(sizes, "entity_id")
        .select(
            "p_partkey", "p_name", "entity_id", "canonical_name",
            "n_members",
        )
    )


def _sql_part_entities() -> str:
    return f"""
WITH RECURSIVE
keys AS MATERIALIZED (
  SELECT p_partkey AS id, p_name AS s FROM ({SQL_PART_NAME_DICT}) src
  WHERE p_name IS NOT NULL),
pairs AS MATERIALIZED (
  SELECT a.id AS id_a, b.id AS id_b
  FROM keys a JOIN keys b ON a.id < b.id
  WHERE levenshtein(a.s, b.s) = 1),
sym(a, b) AS (SELECT id_a, id_b FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
walk(id, r) AS (
  SELECT id, id FROM keys
  UNION
  SELECT w.id, s.b FROM walk w JOIN sym s ON s.a = w.r),
lab AS (SELECT id, CAST(MIN(r) AS BIGINT) AS entity_id
        FROM walk GROUP BY id),
labeled AS (
  SELECT k.id AS p_partkey, k.s AS p_name, l.entity_id
  FROM keys k JOIN lab l ON l.id = k.id),
canon AS (SELECT entity_id, p_name AS canonical_name FROM labeled
          WHERE p_partkey = entity_id),
sizes AS (SELECT entity_id, CAST(COUNT(*) AS BIGINT) AS n_members
          FROM labeled GROUP BY entity_id)
SELECT t.p_partkey, t.p_name, t.entity_id, c.canonical_name, z.n_members
FROM labeled t JOIN canon c ON c.entity_id = t.entity_id
JOIN sizes z ON z.entity_id = t.entity_id
"""


SQL_PART_NAME_DICT = """
WITH dict AS (
  SELECT p_name, MIN(p_partkey) AS p_partkey FROM part GROUP BY p_name)
SELECT p_name, p_partkey FROM dict
UNION ALL
SELECT substring(p_name, 1, 3) || substring(p_name, 5) AS p_name,
       p_partkey + 1000000 AS p_partkey
FROM dict WHERE p_partkey % 4 = 0
"""


def _sql_fuzzy_part_match() -> str:
    from dish_data_pipeline_spark.ops.fuzzykey import edit1_pairs_sql

    return (
        "SELECT * FROM ("
        + edit1_pairs_sql(SQL_PART_NAME_DICT, "p_partkey", "p_name")
        + ") t WHERE dist = 1"
    )


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language distinct-trigram HyperLogLog next to the exact
    count — the bounded-state companion to ``distinct_sketch``'s KMV
    on the identical relation (so the two estimators are directly
    comparable row for row). Registers merge by MAX inside the
    map-side combine; the dyadic-BIGINT harmonic sum makes the
    ESTIMATE itself hash-exact against the DuckDB twin."""
    from dish_data_pipeline_spark.ops.sketch import hll_distinct

    d = read(spark, sf_dir, "documents")
    grams = _trigrams(d, "lang")
    return hll_distinct(grams, "lang", "gram")


def _sql_hll_distinct() -> str:
    from dish_data_pipeline_spark.ops.sketch import hll_distinct_sql

    src = (
        "SELECT lang, unnest(list_transform(generate_series(1, "
        "len(regexp_extract_all(text, '[A-Za-z0-9]+')) - 2), "
        "i -> array_to_string(regexp_extract_all(text, '[A-Za-z0-9]+')"
        "[i:i + 2], ' '))) AS gram FROM documents"
    )
    return hll_distinct_sql(src, "lang", "gram")


# --- Mergeable-sketch distinct count ------------------------------
TRIGRAM_DUCK_SRC = (
    "SELECT lang, source, unnest(list_transform(generate_series(1, "
    "len(regexp_extract_all(text, '[A-Za-z0-9]+')) - 2), "
    "i -> array_to_string(regexp_extract_all(text, '[A-Za-z0-9]+')"
    "[i:i + 2], ' '))) AS gram FROM documents"
)


def q_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed KMV: per-(lang, source) bottom-k sketches merged
    to one per-lang distinct-trigram estimate — each partition ships
    k hashes, never raw data, and the merged estimate provably
    equals the single-pass sketch."""
    from dish_data_pipeline_spark.ops.sketch import kmv_merge_distinct

    d = read(spark, sf_dir, "documents")
    grams = _trigrams(d, "lang", "source")
    return kmv_merge_distinct(grams, "lang", "source", "gram", k=KMV_K)


def _sql_sketch_merge() -> str:
    from dish_data_pipeline_spark.ops.sketch import kmv_merge_distinct_sql

    return kmv_merge_distinct_sql(
        TRIGRAM_DUCK_SRC, "lang", "source", "gram", k=KMV_K
    )


# --- Histogram approximate quantiles ------------------------------
HIST_QS = (0.5, 0.9, 0.99)


def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-sketch quantiles of event value per event_type —
    bounded state (128 counters/group, mergeable by addition) where
    the exact `value_quantiles` needs a per-group sort; the binning
    error itself is oracle-verified."""
    from dish_data_pipeline_spark.ops.sketch import histogram_quantiles

    e = read(spark, sf_dir, "events")
    return histogram_quantiles(
        e.select("event_type", "value"), "event_type", "value",
        quantiles=HIST_QS,
    )


def _sql_approx_quantiles() -> str:
    from dish_data_pipeline_spark.ops.sketch import histogram_quantiles_sql

    return histogram_quantiles_sql(
        "SELECT event_type, value FROM events", "event_type", "value",
        quantiles=HIST_QS,
    )


# --- Zipf frequency-of-frequency distribution ---------------------
def q_zipf_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token frequency-of-frequency per language: how many distinct
    tokens fall in each power-of-two occurrence bucket (the Zipf
    curve a healthy corpus follows; a bulge in high buckets means
    boilerplate). Two map-side-combined aggregation levels; the
    bucket is integer floor(log2) via binary-string length — no
    floating log whose libm rounding could differ across engines."""
    from dish_data_pipeline_spark.ops.text import TOKEN_RE

    d = read(spark, sf_dir, "documents")
    toks = d.select(
        "lang",
        F.explode(
            F.expr(f"regexp_extract_all(text, '{TOKEN_RE}', 0)")
        ).alias("token"),
    )
    counts = toks.groupBy("lang", "token").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        counts.withColumn(
            "freq_bucket",
            (F.length(F.expr("bin(cnt)")) - 1).cast("bigint"),
        )
        .groupBy("lang", "freq_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("cnt").cast("bigint").alias("n_occurrences"),
        )
    )


SQL_ZIPF_BUCKETS = """
WITH toks AS (
  SELECT lang, unnest(regexp_extract_all(text, '[A-Za-z0-9]+')) AS token
  FROM documents),
c AS (
  SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks GROUP BY lang, token)
SELECT lang, CAST(LENGTH(bin(cnt)) - 1 AS BIGINT) AS freq_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(cnt) AS BIGINT) AS n_occurrences
FROM c GROUP BY lang, freq_bucket
"""


# --- Count-min frequency sketch -----------------------------------
CMS_D, CMS_W, CMS_K = 4, 64, 10


def q_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency estimates for each language's
    top-10 tokens (by true frequency, the verification yardstick):
    bounded mergeable counter state (4×64 per group) where an exact
    heavy-hitter count needs the full vocabulary groupBy. The CMS
    overestimation itself is oracle-verified — both engines compute
    identical counters from the portable 60-bit hash."""
    from dish_data_pipeline_spark.ops.sketch import count_min_freq
    from dish_data_pipeline_spark.ops.text import TOKEN_RE

    d = read(spark, sf_dir, "documents")
    toks = d.select(
        "lang",
        F.explode(
            F.expr(f"regexp_extract_all(text, '{TOKEN_RE}', 0)")
        ).alias("token"),
    )
    return count_min_freq(
        toks, "lang", "token", d=CMS_D, w=CMS_W, k=CMS_K
    )


def _sql_cms_topk() -> str:
    from dish_data_pipeline_spark.ops.sketch import count_min_freq_sql
    from dish_data_pipeline_spark.ops.text import TOKEN_RE

    return count_min_freq_sql(
        "SELECT lang, unnest(regexp_extract_all(text, "
        f"'{TOKEN_RE}')) AS token FROM documents",
        "lang",
        "token",
        d=CMS_D,
        w=CMS_W,
        k=CMS_K,
    )


# --- Composed corpus-preparation pipeline -------------------------
PIPE_OUT_ROWS = 150


def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end corpus-preparation flow a training run needs,
    composed from the catalog's own operators: Gopher quality gate →
    benchmark decontamination (5-gram collision) → target-mixture
    sampling. Every stage is the SAME operator its standalone query
    uses, so this verifies composition, not new logic. Complements
    ``training_corpus`` (the dedup-centric composition)."""
    from dish_data_pipeline_spark.ops.contamination import decontaminate
    from dish_data_pipeline_spark.ops.sampling import mixture_sample
    from dish_data_pipeline_spark.ops.text import with_quality_flags

    d = read(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    bench = d.filter(F.col("doc_id") % 10 == 0)
    gated = (
        with_quality_flags(corpus)
        .filter(F.col("keep") == 1)
        .select("doc_id", "lang", "text")
    )
    # the gate's regex stack feeds decontaminate's gram hashing AND
    # its keep-every-doc rejoin AND the sampler — persist (registry-
    # released) or the quality regexes run three times
    from dish_data_pipeline_spark.cache_registry import tracked_persist

    gated = tracked_persist(gated)
    clean = decontaminate(gated, bench, n=CONTAM_N)
    return mixture_sample(
        clean, "lang", MIX_WEIGHTS, PIPE_OUT_ROWS,
        key_cols=["cast(doc_id as string)"], salt="pipe",
    ).select("doc_id", "lang")


def _sql_corpus_pipeline() -> str:
    from dish_data_pipeline_spark.ops.portable import duck_phash
    from dish_data_pipeline_spark.ops.sampling import (
        SAMPLE_DENOM,
        mixture_case_sql,
    )

    n = CONTAM_N
    ghash = duck_phash(f"array_to_string(t[i:i + {n - 1}], ' ')")
    grams = (
        f"CASE WHEN len(t) >= {n} THEN "
        f"list_transform(generate_series(1, len(t) - {n - 1}), i -> {ghash}) "
        "ELSE [] END"
    )
    w_case = mixture_case_sql("lang", MIX_WEIGHTS)
    h = duck_phash("concat_ws('|', cast(doc_id as string), 'pipe')")
    return f"""
WITH q AS (
  SELECT doc_id, lang, text,
         CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)
           AS n_tokens,
         CAST(LENGTH(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS DOUBLE)
           AS n_alnum,
         CAST(LENGTH(text)
              - LENGTH(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g'))
           AS DOUBLE) AS n_symbols,
         CAST(len(list_distinct(regexp_extract_all(text, '[A-Za-z0-9]+')))
           AS DOUBLE) AS n_distinct
  FROM documents WHERE doc_id % 10 != 0),
gated AS (
  SELECT doc_id, lang, text FROM q
  WHERE n_tokens >= 10 AND n_tokens <= 100000
    AND n_alnum / CAST(GREATEST(n_tokens, 1) AS DOUBLE) >= 2.0
    AND n_alnum / CAST(GREATEST(n_tokens, 1) AS DOUBLE) <= 12.0
    AND n_symbols / CAST(GREATEST(n_tokens, 1) AS DOUBLE) <= 0.1
    AND n_distinct / CAST(GREATEST(n_tokens, 1) AS DOUBLE) >= 0.2),
ctok AS (SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS t
         FROM gated),
cg AS (SELECT doc_id, unnest({grams}) AS gram_hash FROM ctok),
btok AS (SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS t
         FROM documents WHERE doc_id % 10 = 0),
bg AS (SELECT DISTINCT unnest({grams}) AS gram_hash FROM btok),
hits AS (SELECT DISTINCT doc_id FROM cg
         WHERE gram_hash IN (SELECT gram_hash FROM bg)),
clean AS (
  SELECT g.* FROM gated g
  WHERE g.doc_id NOT IN (SELECT doc_id FROM hits)),
counts AS (SELECT lang, COUNT(*) AS _n FROM clean GROUP BY lang),
th AS (SELECT lang, LEAST({SAMPLE_DENOM}, CAST(floor(
         {w_case} * {PIPE_OUT_ROWS} * {SAMPLE_DENOM} / _n) AS BIGINT))
         AS _thresh
       FROM counts)
SELECT c.doc_id, c.lang FROM clean c JOIN th ON th.lang = c.lang
WHERE ({h}) % {SAMPLE_DENOM} < _thresh
"""


# --- Deterministic stratified sampling ----------------------------
SAMPLE_RATES = {"en": 0.5, "de": 0.25, "fr": 0.25}


def q_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible corpus mixing: per-language keep rates driven by
    the portable hash of the doc key — membership is a pure function
    of the row, so the sample is identical across runs, engines,
    cluster sizes, and retries (df.sample() guarantees none of
    these). Unlisted languages keep 10%."""
    from dish_data_pipeline_spark.ops.sampling import stratified_sample

    d = read(spark, sf_dir, "documents")
    return stratified_sample(
        d, "lang", SAMPLE_RATES, key_cols=["cast(doc_id as string)"],
        default_rate=0.1,
    ).select("doc_id", "lang")


def _sql_doc_sample() -> str:
    from dish_data_pipeline_spark.ops.portable import duck_phash
    from dish_data_pipeline_spark.ops.sampling import SAMPLE_DENOM

    h = duck_phash("concat_ws('|', cast(doc_id as string), 'sample')")
    cases = " ".join(
        f"WHEN '{s}' THEN {int(r * SAMPLE_DENOM)}"
        for s, r in sorted(SAMPLE_RATES.items())
    )
    return f"""
SELECT doc_id, lang FROM documents
WHERE ({h}) % {SAMPLE_DENOM} < CASE lang {cases} ELSE {int(0.1 * SAMPLE_DENOM)} END
"""


# --- Tokenizer induction / LM counts ------------------------------
def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE tokenizer-training iteration: corpus-wide adjacent
    character-pair counts within words (the argmax pair is the first
    merge). Map-side explode chain; the only exchange is the final
    alphabet²-bounded count."""
    from dish_data_pipeline_spark.ops.text import char_pair_counts

    d = widen(read(spark, sf_dir, "documents"), spark)
    return char_pair_counts(d, "text")


SQL_BPE_PAIRS = """
WITH words AS (
  SELECT unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS w
  FROM documents),
pairs AS (
  SELECT substr(w, CAST(i AS INT), 2) AS pair
  FROM words, UNNEST(generate_series(1, length(w) - 1)) AS t(i)
  WHERE length(w) >= 2)
SELECT pair, CAST(COUNT(*) AS BIGINT) AS n FROM pairs GROUP BY pair
"""


def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 bigrams with raw and Kneser-Ney continuation counts
    (distinct left contexts per right word) — the count relation an
    n-gram LM / data-quality scorer trains from. Bigrams come from a
    map-side windowed transform of the token array (no self-join, no
    corpus-wide window); continuation counts reaggregate the
    vocab²-bounded bigram relation."""
    from dish_data_pipeline_spark.ops.text import bigram_lm_counts

    d = read(spark, sf_dir, "documents")
    return (
        bigram_lm_counts(d, "text")
        .orderBy(F.desc("n"), F.asc("w1"), F.asc("w2"))
        .limit(100)
    )


SQL_BIGRAM_LM = """
WITH toks AS (
  SELECT regexp_extract_all(lower(text), '[A-Za-z0-9]+') AS t FROM documents),
bg AS (
  SELECT t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2
  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS s(i)
  WHERE len(t) >= 2),
counts AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n FROM bg GROUP BY 1, 2),
cont AS (
  SELECT w2, CAST(COUNT(*) AS BIGINT) AS continuation_w2
  FROM counts GROUP BY 1)
SELECT c.w1, c.w2, c.n, k.continuation_w2
FROM counts c JOIN cont k USING (w2)
ORDER BY n DESC, w1 ASC, w2 ASC
LIMIT 100
"""


def q_doc_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram-LM fluency score (mean MLE conditional
    probability over the doc's bigrams) — a perplexity-proxy quality
    gate trained from the corpus itself, log-free so it can be
    cross-engine hash-exact (floor-quantized probability sums; libm
    ln is not correctly rounded). Probe-side bigram joins are
    skew-safe: build side is unique per key."""
    from dish_data_pipeline_spark.ops.text import doc_lm_scores

    d = read(spark, sf_dir, "documents")
    return doc_lm_scores(d, "doc_id", "text")


SQL_DOC_LM_SCORE = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[A-Za-z0-9]+') AS t
  FROM documents),
bg AS (
  SELECT doc_id, t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2
  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS s(i)
  WHERE len(t) >= 2),
counts AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n12 FROM bg GROUP BY 1, 2),
ctx AS (
  SELECT w1, CAST(SUM(n12) AS BIGINT) AS n1 FROM counts GROUP BY 1),
scored AS (
  SELECT bg.doc_id,
         CAST(floor((CAST(n12 AS DOUBLE) / CAST(n1 AS DOUBLE))
                    * 1000000000.0) AS BIGINT) AS pq
  FROM bg JOIN counts USING (w1, w2) JOIN ctx USING (w1))
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(pq) AS DOUBLE) / 1000000000.0
         / CAST(COUNT(*) AS DOUBLE) AS lm_score
FROM scored GROUP BY doc_id
"""


PAGERANK_ITERS = 4


def q_trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-quantized PageRank over the 1995 customer↔supplier
    trade graph (distinct order lines as undirected edges): which
    parties sit at the center of trade flow. All arithmetic BIGINT
    (see ops/graph.py) so the 4-iteration distributed rank is
    bit-exact against the UNROLLED-CTE DuckDB twin — an
    oracle-verified iterative graph algorithm, like the
    recursive-CTE connected components. The date slice bounds the
    edge-build cost (the pushed o_orderdate filter reaches the
    orders scan); the operator itself takes any edge relation."""
    from dish_data_pipeline_spark.ops.graph import pagerank

    o = (
        read(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < "1996-01-01")
        .select("o_orderkey", "o_custkey")
    )
    li = read(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("a"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("b"),
        )
        .distinct()
    )
    edges = pairs.union(pairs.select(F.col("b").alias("a"), F.col("a").alias("b")))
    return pagerank(
        edges, n_iter=PAGERANK_ITERS, src_col="a", dst_col="b"
    ).orderBy(F.desc("pr_q"), F.asc("node")).limit(50)


def _sql_trade_pagerank() -> str:
    from dish_data_pipeline_spark.ops.graph import PR_SCALE

    it = "\n".join(
        f"""pr{i} AS (
  SELECT nodes.node,
         (SELECT b FROM basev) + COALESCE(s.sum_c, 0) AS pr_q
  FROM nodes LEFT JOIN (
    SELECT e.dst AS node,
           CAST(SUM((85 * p.pr_q) // (100 * d.deg)) AS BIGINT) AS sum_c
    FROM edges e
    JOIN pr{i - 1} p ON p.node = e.src
    JOIN deg d ON d.src = e.src
    GROUP BY e.dst) s USING (node)),"""
        for i in range(1, PAGERANK_ITERS + 1)
    )
    return f"""
WITH pairs AS (
  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS a,
                  's' || CAST(l_suppkey AS VARCHAR) AS b
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderdate < DATE '1996-01-01'),
edges AS (SELECT a AS src, b AS dst FROM pairs
          UNION ALL SELECT b, a FROM pairs),
nodes AS (SELECT DISTINCT src AS node FROM edges
          UNION SELECT DISTINCT dst FROM edges),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src),
params AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
basev AS (SELECT (15 * {PR_SCALE}) // (100 * n) AS b FROM params),
pr0 AS (SELECT node, {PR_SCALE} // n AS pr_q FROM nodes, params),
{it}
final AS (SELECT node, CAST(pr_q AS BIGINT) AS pr_q,
                 CAST(pr_q AS DOUBLE) / {float(PR_SCALE)!r} AS pr
          FROM pr{PAGERANK_ITERS})
SELECT node, pr_q, pr FROM final
ORDER BY pr_q DESC, node ASC LIMIT 50
"""


def q_part_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts + local clustering coefficients on
    the part co-purchase graph (parts joined when they appear in the
    same order) via :func:`ops.graph.clustering_coefficients`, whose
    triangle kernel is the degree-ordered node-iterator (Suri &
    Vassilvitskii WWW'11): every edge oriented from its
    (degree, node)-smaller endpoint, wedges enumerated at each
    triangle's LOWEST-degree corner (total wedge work O(m^1.5)
    regardless of hub skew — the celebrity node never expands its
    neighbor pairs), closed by one more equi-join. Orientation
    changes work, never results, so the DuckDB twin verifies with
    the simple id-ordered 3-way self-join; the Watts-Strogatz
    coefficient ``2·tri / (deg·(deg−1))`` is one IEEE division on
    exact integers, bit-identical both engines. The per-order pair
    expansion is bounded by order size (C(lines,2) ≈ 6 per order);
    the order slice bounds the graph density so the suite's wedge
    volume stays proportionate."""
    from dish_data_pipeline_spark.ops.graph import clustering_coefficients

    li = (
        read(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 4 == 0)
        .select("l_orderkey", "l_partkey")
    )
    a = li.alias("a")
    b = li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
    )
    return clustering_coefficients(pairs)


SQL_PART_TRIANGLES = """
WITH li AS (
  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 4 = 0),
e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
  FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
  GROUP BY node),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1
  JOIN e e2 ON e2.u = e1.v
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
tcount AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM (SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri)
  GROUP BY node)
SELECT d.node, d.deg,
       COALESCE(t.n_triangles, 0) AS n_triangles,
       CASE WHEN d.deg > 1
            THEN 2.0 * CAST(COALESCE(t.n_triangles, 0) AS DOUBLE)
                 / CAST(d.deg * (d.deg - 1) AS DOUBLE)
            ELSE 0.0 END AS clustering
FROM deg d LEFT JOIN tcount t ON t.node = d.node
"""


def q_trade_pagerank_directed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank on the genuinely DIRECTED trade graph (customer →
    supplier only, so every supplier is a dangling sink) with
    textbook dangling-mass redistribution — the general-digraph tier
    of the operator (``dangling="redistribute"``). Each iteration's
    sink mass is an in-plan single-row aggregate; the DuckDB twin
    unrolls it as a per-round scalar CTE alongside the contribution
    join, so the redistribution arithmetic itself (pure BIGINT) is
    value-verified, not just the final ordering."""
    from dish_data_pipeline_spark.ops.graph import pagerank

    o = (
        read(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < "1996-01-01")
        .select("o_orderkey", "o_custkey")
    )
    li = read(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("a"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("b"),
        )
        .distinct()
    )
    return (
        pagerank(
            edges,
            n_iter=PAGERANK_ITERS,
            src_col="a",
            dst_col="b",
            dangling="redistribute",
        )
        .orderBy(F.desc("pr_q"), F.asc("node"))
        .limit(50)
    )


SEARCH_PATTERN = "window table"


def q_substring_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram-indexed literal substring search (`pg_trgm` / code-
    search shape): inverted (doc, trigram) index → all-trigrams
    candidate intersection → exact containment verify on candidates
    only, plus the portable length-difference occurrence count. The
    oracle is the full containment SCAN, so the driver certifies
    index-plus-verify ≡ scan — no false positives survive, no
    occurrence is missed. See :mod:`ops.trgm` for the 100 TB shape
    (index materialized once per corpus version, reused per query)."""
    from dish_data_pipeline_spark.ops.trgm import trigram_search

    d = widen(
        read(spark, sf_dir, "documents").select("doc_id", "text"), spark
    )
    return trigram_search(d, SEARCH_PATTERN)


SQL_SUBSTRING_SEARCH = f"""
SELECT doc_id AS id,
       CAST((length(text) - length(replace(text, '{SEARCH_PATTERN}', '')))
            // {len(SEARCH_PATTERN)} AS INT) AS n_occurrences
FROM documents
WHERE contains(text, '{SEARCH_PATTERN}')
"""


REACH_HOPS = 3


def q_trade_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blast-radius reachability: minimum hop distance (≤ 3) from a
    deterministic seed set (every 97th customer) over the 1995
    undirected customer↔supplier trade graph — "which parties are
    within k trades of these entities", the sanction-screening /
    contamination-spread query. Level-synchronous frontier BFS
    (:func:`ops.graph.bfs_hops`); the oracle unrolls the same three
    rounds as chained CTEs with NOT-EXISTS anti-joins, so the
    distributed frontier expansion is value-verified hop by hop.
    Comparisons only — no arithmetic to drift."""
    from dish_data_pipeline_spark.ops.graph import bfs_hops

    o = (
        read(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < "1996-01-01")
        .select("o_orderkey", "o_custkey")
    )
    li = read(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    joined = li.join(o, li.l_orderkey == o.o_orderkey)
    pairs = joined.select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("a"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("b"),
    ).distinct()
    edges = pairs.union(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    seeds = (
        joined.filter(F.col("o_custkey") % 97 == 1)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias(
                "node"
            )
        )
        .distinct()
    )
    return bfs_hops(
        edges, seeds, max_hops=REACH_HOPS, src_col="a", dst_col="b"
    )


def _sql_trade_reach() -> str:
    from dish_data_pipeline_spark.ops.graph import bfs_hops_sql

    return f"""
WITH pairs AS (
  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS a,
                  's' || CAST(l_suppkey AS VARCHAR) AS b
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderdate < DATE '1996-01-01'),
edges AS (SELECT a AS src, b AS dst FROM pairs
          UNION ALL SELECT b, a FROM pairs),
seeds AS (
  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS node
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderdate < DATE '1996-01-01' AND o_custkey % 97 = 1),
{bfs_hops_sql("edges", "seeds", max_hops=REACH_HOPS)}
"""


TRIANGLE_TOPK = 5


def _mutual_topk_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual top-5 supplier co-fulfillment graph: undirected edges
    (a, b), a < b, each endpoint ranking the other in its 5
    strongest co-partners (count desc, id asc). Persisted — callers
    consume it repeatedly."""
    from pyspark.sql import Window

    from dish_data_pipeline_spark.cache_registry import tracked_persist

    li = (
        read(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    # Aggregate each unordered pair ONCE (a < b) and mirror the
    # aggregated counts afterwards: co-occurrence is symmetric, so
    # this halves the rows entering the pair aggregation's shuffle
    # (guide §2.3 "aggregate before you shuffle" / shuffle fewer
    # bytes) — measured 9.0 s → 4.3 s for the full build at sf0.1 —
    # while the window below sees exactly the same directed relation.
    half = (
        li.selectExpr("l_orderkey", "l_suppkey AS a")
        .join(li.selectExpr("l_orderkey", "l_suppkey AS b"), "l_orderkey")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_co"))
    )
    co = half.unionByName(half.selectExpr("b AS a", "a AS b", "n_co"))
    w = Window.partitionBy("a").orderBy(
        F.col("n_co").desc(), F.col("b").asc()
    )
    # consumed twice (probe + reversed build of the mutual check):
    # persist the k·n-bounded selection so the co-occurrence
    # self-join + window subtree runs once
    sel = tracked_persist(
        co.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= TRIANGLE_TOPK)
        .select("a", "b")
    )
    mutual = (
        sel.join(sel.selectExpr("b AS a", "a AS b"), ["a", "b"], "left_semi")
        .filter(F.col("a") < F.col("b"))
    )
    return tracked_persist(mutual)


SQL_MUTUAL_TOPK_CTES = f"""li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
cnt AS (
  SELECT x.l_suppkey AS a, y.l_suppkey AS b, COUNT(*) AS n_co
  FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
            AND x.l_suppkey <> y.l_suppkey
  GROUP BY 1, 2),
sel AS (
  SELECT a, b FROM (
    SELECT a, b, row_number() OVER (PARTITION BY a
             ORDER BY n_co DESC, b ASC) AS rn
    FROM cnt) WHERE rn <= {TRIANGLE_TOPK}),
co AS MATERIALIZED (
  SELECT s.a, s.b FROM sel s
  JOIN sel r ON r.a = s.b AND r.b = s.a
  WHERE s.a < s.b)"""


def q_supplier_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting + local clustering coefficient over the
    supplier co-fulfillment graph, sparsified as a MUTUAL top-5
    graph: an edge survives only when each endpoint ranks the other
    among its 5 strongest co-fulfillment partners (count desc,
    id-asc tiebreak — deterministic). Fixed-k mutual sparsification
    is the standard way to keep graph density scale-stable: a raw
    co-occurrence threshold either saturates small corpora into a
    complete graph or empties large ones. Then the classic
    oriented-edge device: with every edge stored once as a<b, wedges
    (a,b)·(a,c) with b<c close into a triangle iff (b,c) is an edge
    — each triangle found EXACTLY once, no /6 correction, wedge join
    bounded by Σ deg² ≤ k²·n. Coefficient = 2T/(d(d−1)): exact
    BIGINTs, one IEEE division."""
    e = _mutual_topk_graph(spark, sf_dir)
    wed = (
        e.selectExpr("a", "b AS x")
        .join(e.selectExpr("a", "b AS y"), "a")
        .filter(F.col("x") < F.col("y"))
    )
    tri = wed.join(e.selectExpr("a AS x", "b AS y"), ["x", "y"])
    tri_nodes = (
        tri.selectExpr("a AS node")
        .unionAll(tri.selectExpr("x AS node"))
        .unionAll(tri.selectExpr("y AS node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    deg = (
        e.selectExpr("a AS node")
        .unionAll(e.selectExpr("b AS node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    return deg.join(tri_nodes, "node", "left").selectExpr(
        "CAST(node AS BIGINT) AS s_suppkey",
        "degree",
        "CAST(COALESCE(n_triangles, 0) AS BIGINT) AS n_triangles",
        "CASE WHEN degree >= 2 THEN "
        "CAST(2 * COALESCE(n_triangles, 0) AS DOUBLE) "
        "/ CAST(degree * (degree - 1) AS DOUBLE) "
        "ELSE CAST(NULL AS DOUBLE) END AS clustering",
    )


SQL_SUPPLIER_TRIANGLES = f"""
WITH {SQL_MUTUAL_TOPK_CTES},
tri AS (
  SELECT w1.a, w1.b AS x, w2.b AS y
  FROM co w1 JOIN co w2 ON w1.a = w2.a AND w1.b < w2.b
  JOIN co e ON e.a = w1.b AND e.b = w2.b),
tn AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
    SELECT a AS node FROM tri
    UNION ALL SELECT x FROM tri
    UNION ALL SELECT y FROM tri) GROUP BY node),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
    SELECT a AS node FROM co UNION ALL SELECT b FROM co) GROUP BY node)
SELECT CAST(d.node AS BIGINT) AS s_suppkey, d.degree,
       CAST(COALESCE(t.n_triangles, 0) AS BIGINT) AS n_triangles,
       CASE WHEN d.degree >= 2 THEN
         CAST(2 * COALESCE(t.n_triangles, 0) AS DOUBLE)
           / CAST(d.degree * (d.degree - 1) AS DOUBLE)
       ELSE CAST(NULL AS DOUBLE) END AS clustering
FROM deg d LEFT JOIN tn t ON t.node = d.node
"""


KCORE_K = 2
KCORE_ROUNDS = 6


def q_supplier_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the mutual top-5 co-fulfillment graph: peel
    degree-<2 suppliers for 6 fixed rounds (the unrolled-iterative
    oracle device — see ops/graph.kcore), leaving the cyclic dense
    backbone the triangle census runs inside. Returns each surviving
    supplier with its within-core degree."""
    from dish_data_pipeline_spark.ops.graph import kcore

    return kcore(
        _mutual_topk_graph(spark, sf_dir), k=KCORE_K, n_rounds=KCORE_ROUNDS
    ).selectExpr("CAST(node AS BIGINT) AS s_suppkey", "core_degree")


def _sql_supplier_kcore() -> str:
    from dish_data_pipeline_spark.ops.graph import kcore_sql

    inner = kcore_sql(
        "co", k=KCORE_K, n_rounds=KCORE_ROUNDS, node_out="s_suppkey"
    )
    return f"""
WITH {SQL_MUTUAL_TOPK_CTES},
{inner}
"""


def _sql_trade_pagerank_directed() -> str:
    from dish_data_pipeline_spark.ops.graph import PR_SCALE

    it = "\n".join(
        f"""dang{i} AS (
  SELECT COALESCE(SUM(pr_q), 0) AS d
  FROM pr{i - 1} p LEFT JOIN deg ON deg.src = p.node
  WHERE deg.src IS NULL),
pr{i} AS (
  SELECT nodes.node,
         (SELECT b FROM basev) + COALESCE(s.sum_c, 0)
         + (85 * (SELECT d FROM dang{i}))
           // (100 * (SELECT n FROM params)) AS pr_q
  FROM nodes LEFT JOIN (
    SELECT e.dst AS node,
           CAST(SUM((85 * p.pr_q) // (100 * d.deg)) AS BIGINT) AS sum_c
    FROM edges e
    JOIN pr{i - 1} p ON p.node = e.src
    JOIN deg d ON d.src = e.src
    GROUP BY e.dst) s USING (node)),"""
        for i in range(1, PAGERANK_ITERS + 1)
    )
    return f"""
WITH pairs AS (
  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS a,
                  's' || CAST(l_suppkey AS VARCHAR) AS b
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderdate < DATE '1996-01-01'),
edges AS (SELECT a AS src, b AS dst FROM pairs),
nodes AS (SELECT DISTINCT src AS node FROM edges
          UNION SELECT DISTINCT dst FROM edges),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src),
params AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
basev AS (SELECT (15 * {PR_SCALE}) // (100 * n) AS b FROM params),
pr0 AS (SELECT node, {PR_SCALE} // n AS pr_q FROM nodes, params),
{it}
final AS (SELECT node, CAST(pr_q AS BIGINT) AS pr_q,
                 CAST(pr_q AS DOUBLE) / {float(PR_SCALE)!r} AS pr
          FROM pr{PAGERANK_ITERS})
SELECT node, pr_q, pr FROM final
ORDER BY pr_q DESC, node ASC LIMIT 50
"""


OVERLAP_K = 64


def q_join_overlap_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set-operation estimate of the orders↔customer key overlap
    (union size, Jaccard, intersection) from two bottom-64 sketches —
    the join-planning probe that answers "how many keys actually
    match" for the cost of two distinct-scans and 64 rows. Portable
    hash → the DuckDB twin rebuilds the identical sketch, so the
    ESTIMATOR itself (not just row counts) is value-verified."""
    from dish_data_pipeline_spark.ops.sketch import kmv_overlap_estimate

    o = read(spark, sf_dir, "orders")
    c = read(spark, sf_dir, "customer")
    return kmv_overlap_estimate(
        o,
        c,
        "cast(o_custkey as string)",
        "cast(c_custkey as string)",
        k=OVERLAP_K,
    )


def _sql_join_overlap() -> str:
    from dish_data_pipeline_spark.ops.portable import duck_phash
    from dish_data_pipeline_spark.ops.sketch import HASH_SPACE

    k = OVERLAP_K
    space = repr(HASH_SPACE)
    est_union = (
        f"CASE WHEN n_sketch < {k} THEN CAST(n_sketch AS DOUBLE) "
        f"ELSE {float(k - 1)!r} * {space} / CAST(tau AS DOUBLE) END"
    )
    jac = "CAST(n_both AS DOUBLE) / CAST(n_sketch AS DOUBLE)"
    return f"""
WITH ha AS (
  SELECT DISTINCT {duck_phash("CAST(o_custkey AS VARCHAR)")} AS h FROM orders),
hb AS (
  SELECT DISTINCT {duck_phash("CAST(c_custkey AS VARCHAR)")} AS h FROM customer),
u AS (
  SELECT COALESCE(ha.h, hb.h) AS h,
         ha.h IS NOT NULL AS in_a, hb.h IS NOT NULL AS in_b
  FROM ha FULL OUTER JOIN hb ON ha.h = hb.h),
bottom AS (SELECT * FROM u ORDER BY h ASC LIMIT {k}),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_sketch,
         CAST(MAX(h) AS BIGINT) AS tau,
         CAST(SUM(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS BIGINT)
           AS n_both
  FROM bottom)
SELECT n_sketch, tau,
       {est_union} AS est_union,
       {jac} AS jaccard,
       ({jac}) * ({est_union}) AS est_intersection
FROM agg
"""


SHARD_PLAN_N = 16
SHARD_PLAN_SEED = 3


def q_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard export manifest over documents: deterministic
    seeded-shuffle shard assignment (portable 60-bit hash) with
    per-shard row counts and the order-independent mod-P content
    digest — the verification artifact `io_shards.write_training_shards`
    hands to a training job. Map-side assignment, one shard-bounded
    aggregate; the DuckDB twin replicates the hash bit-identically,
    so shard membership itself is value-verified."""
    from dish_data_pipeline_spark.io_shards import shard_manifest

    d = read(spark, sf_dir, "documents")
    return shard_manifest(
        d, "doc_id", SHARD_PLAN_N, seed=SHARD_PLAN_SEED, portable=True
    )


def _sql_shard_plan() -> str:
    from dish_data_pipeline_spark.ops.portable import P, duck_phash

    h = duck_phash(f"concat('{SHARD_PLAN_SEED}:', CAST(doc_id AS VARCHAR))")
    return f"""
WITH hashed AS (SELECT {h} AS h FROM documents)
SELECT CAST(h % {SHARD_PLAN_N} AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(h % {P}) AS BIGINT) AS content_digest
FROM hashed GROUP BY 1
"""


BPE_N_MERGES = 8


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full BPE tokenizer induction (Sennrich 2016 merge loop): 8
    rounds of count-adjacent-pairs → merge-the-argmax over the
    distinct-word relation — the corpus is scanned once, every
    iteration is vocab-bounded, model state on the driver is one row
    per round. Output is the ordered merge table. The DuckDB twin
    unrolls the fixed merge count into chained CTEs (the
    ``trade_pagerank`` device, ops/graph.py:9-28): each round is one
    pair-count aggregate, one argmax with the identical (count DESC,
    left ASC, right ASC) tiebreak, and the greedy ``_merge_fold``
    re-expressed as a DuckDB ``list_reduce`` over singleton-wrapped
    symbols (the accumulator must share the element type, so symbols
    ride as one-element lists). Early stop is mirrored structurally:
    a round whose best pair misses ``min_pair_count`` yields an empty
    ``m{i}``, the CROSS JOIN empties every later vocab, and no
    further merge rows appear — exactly ``bpe_train``'s break. The
    merge procedure is additionally twinned step-for-step by a
    pure-Python property test (tests/test_round6_properties.py)."""
    from dish_data_pipeline_spark.ops.text import bpe_train

    d = read(spark, sf_dir, "documents")
    merges, _ = bpe_train(d, "text", n_merges=BPE_N_MERGES)
    return spark.createDataFrame(
        [(s, l, r, c) for s, l, r, c in merges],
        "step int, left string, right string, pair_count bigint",
    )


def _sql_bpe_merges(n_merges: int = BPE_N_MERGES, min_pair_count: int = 2) -> str:
    """Unrolled-CTE DuckDB twin of :func:`q_bpe_merges` — see its
    docstring for the device. One CTE triple (pairs → argmax →
    fold-rewritten vocab) per merge round."""
    rounds = []
    for i in range(1, n_merges + 1):
        prev = f"vocab{i - 1}"
        rounds.append(f"""pairs{i} AS (
  SELECT p['l'] AS l, p['r'] AS r, CAST(SUM(n) AS BIGINT) AS c
  FROM (SELECT unnest(list_transform(generate_series(1, len(syms) - 1),
                      j -> {{'l': syms[j], 'r': syms[j + 1]}})) AS p, n
        FROM {prev})
  GROUP BY 1, 2),
m{i} AS (SELECT {i} AS step, l, r, c FROM pairs{i}
         WHERE c >= {min_pair_count}
         ORDER BY c DESC, l ASC, r ASC LIMIT 1),
vocab{i} AS (
  SELECT list_reduce(
           list_transform(v.syms, s -> [s]),
           (acc, x) -> CASE WHEN acc[len(acc)] = b.l AND x[1] = b.r
                       THEN acc[1:len(acc) - 1] || [b.l || b.r]
                       ELSE acc || x END) AS syms,
         v.n
  FROM {prev} v CROSS JOIN m{i} b)""")
    un = "\nUNION ALL ".join(
        f"SELECT * FROM m{i}" for i in range(1, n_merges + 1)
    )
    return f"""
WITH words AS (
  SELECT unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS w
  FROM documents),
vocab0 AS (
  SELECT regexp_extract_all(w, '.') AS syms, CAST(COUNT(*) AS BIGINT) AS n
  FROM words WHERE length(w) >= 2 GROUP BY w),
{','.join(rounds)}
SELECT CAST(step AS INTEGER) AS step, l AS "left", r AS "right",
       c AS pair_count
FROM ({un})
ORDER BY step
"""


#: Frozen placeholder weight table for the hashed-linear-classifier
#: query: 64 integer weights in [-1000, 1000] (units of
#: 1/CLASSIFIER_SCALE) from a fixed multiplicative-hash formula, so
#: both engines embed identical literals. A trained fastText-style
#: model replaces this table; the plumbing is what the oracle
#: certifies.
CLASSIFIER_BUCKETS = 64
CLASSIFIER_WEIGHTS: tuple[int, ...] = tuple(
    ((i * 2654435761) % 2001) - 1000 for i in range(CLASSIFIER_BUCKETS)
)
CLASSIFIER_BIAS = 50


# --- Dictionary tagging (Aho-Corasick multi-pattern matching) -------
#: Lexicon with deliberate pattern-overlap stress: "can" is a suffix
#: of "scan", "able" a suffix of "table", two multi-word phrases, and
#: "a a" whose occurrences can self-overlap (non-overlapping greedy
#: counting is the contract both engines share).
DICT_TERMS = [
    "scan", "can", "table", "able",
    "fast table", "value table part", "merge batch", "a a", "row",
]


def q_dict_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-term lexicon coverage over the corpus via
    :func:`ops.dicttag.dict_tag_totals` — ONE Aho-Corasick automaton
    pass per document matches all K phrases (the FlashText /
    brand-safety / PII-lexicon shape), vs K per-term scans. Matching
    is case-insensitive substring with NON-overlapping leftmost
    counting — exactly ``str.count`` and exactly SQL's
    replace-length trick, so the DuckDB twin agrees bit-for-bit
    (including "can" firing inside every "scan" and "able" inside
    every "table"). Map-side Arrow scan; the only shuffle is the
    |terms|-bounded rollup."""
    from dish_data_pipeline_spark.ops.dicttag import dict_tag_totals

    d = widen(read(spark, sf_dir, "documents"), spark)
    return dict_tag_totals(d, DICT_TERMS)


def _sql_dict_tag() -> str:
    values = ", ".join(f"('{t}')" for t in DICT_TERMS)
    return f"""
WITH terms(term) AS (VALUES {values}),
counts AS (
  SELECT t.term,
         CAST((length(lower(d.text))
               - length(replace(lower(d.text), t.term, '')))
              // length(t.term) AS BIGINT) AS n
  FROM documents d CROSS JOIN terms t)
SELECT term,
       CAST(SUM(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS n_occurrences
FROM counts GROUP BY term
HAVING SUM(CASE WHEN n > 0 THEN 1 ELSE 0 END) > 0
"""


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality gate (fastText-shape inference): hashed
    bag-of-words linear margin per document with a frozen quantized
    weight table, thresholded keep bit. Map-side projection at any
    corpus size (widened when a small local scan under-provisions —
    no-op on a real corpus); the portable 60-bit hash makes
    the bucket assignment — and therefore every margin — replayable
    bit-identically by the DuckDB twin."""
    from dish_data_pipeline_spark.ops.text import hashed_linear_score

    d = widen(read(spark, sf_dir, "documents"), spark)
    return hashed_linear_score(
        d, list(CLASSIFIER_WEIGHTS), bias=CLASSIFIER_BIAS, threshold=0.0
    )


def _sql_quality_classifier() -> str:
    from dish_data_pipeline_spark.ops.portable import duck_phash
    from dish_data_pipeline_spark.ops.text import CLASSIFIER_SCALE

    warr = "[" + ", ".join(str(w) for w in CLASSIFIER_WEIGHTS) + "]"
    nb = CLASSIFIER_BUCKETS
    bias = CLASSIFIER_BIAS
    score = (
        f"CASE WHEN n_tokens > 0 THEN "
        f"CAST(CAST({bias} AS BIGINT) + raw / n_tokens AS DOUBLE) "
        f"/ {float(CLASSIFIER_SCALE)!r} END"
    )
    return f"""
WITH toks AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), '[A-Za-z0-9]+') AS t
  FROM documents),
scored AS (
  SELECT doc_id,
         CAST(len(t) AS BIGINT) AS n_tokens,
         CAST(COALESCE(list_aggregate(list_transform(t,
             tok -> ({warr})[({duck_phash("tok")}) % {nb} + 1]),
           'sum'), 0) AS BIGINT) AS raw
  FROM toks)
SELECT doc_id, n_tokens,
       CAST({bias} AS BIGINT) * n_tokens + raw AS margin_q,
       {score} AS score,
       COALESCE(({score}) > 0.0, FALSE) AS keep
FROM scored
"""


#: Fixed BPE merge table for the segmentation-replay query — the
#: 8 merges ``bpe_train`` learns at sf0.01 (embedded as LITERALS so
#: the query is deterministic at any sf and the oracle needs no
#: training loop). Merge 6 ("m"+"er") consumes merge 1's output, so
#: the replay exercises multi-character symbols, not just digraphs.
BPE_SEGMENT_MERGES: tuple[tuple[str, str], ...] = (
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"),
    ("s", "t"), ("m", "er"), ("a", "t"), ("l", "u"),
)


def q_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE segmentation replay (the inference side of ``bpe_train``):
    apply the fixed literal merge table to every document — per doc
    the token count and a leading-tokens digest, so the oracle
    value-verifies the actual segmentation, not just row counts.
    Zero-shuffle: the merge table lives in the expression tree as
    nested greedy folds, so this is a pure map-side projection at
    any corpus size (PLANS.md). The DuckDB twin replays the same
    folds as nested ``list_reduce`` calls over singleton-wrapped
    symbols (the ``bpe_merges`` oracle device). Uses the
    vocabulary-memoized plan (folds once per DISTINCT word, three
    bounded shuffles) — the 100 TB default; the zero-shuffle
    per-occurrence variant is ``ops.text.bpe_segment``, equivalence
    property-tested."""
    from dish_data_pipeline_spark.ops.text import bpe_segment_by_vocab

    d = read(spark, sf_dir, "documents")
    seg = bpe_segment_by_vocab(
        d, [(i + 1, l, r, 0) for i, (l, r) in enumerate(BPE_SEGMENT_MERGES)]
    )
    return seg.select(
        "doc_id",
        "n_tokens",
        F.array_join(F.slice("tokens", 1, 12), " ").alias("head_tokens"),
    )


def _sql_bpe_segment() -> str:
    fold = "list_transform(regexp_extract_all(w, '.'), s -> [s])"
    for left, right in BPE_SEGMENT_MERGES:
        fold = f"""list_transform(list_reduce({fold},
      (acc, x) -> CASE WHEN acc[len(acc)] = '{left}' AND x[1] = '{right}'
                  THEN acc[1:len(acc) - 1] || ['{left}{right}']
                  ELSE acc || x END), s -> [s])"""
    # the final wrap back to singletons is undone here
    fold = f"list_transform({fold}, s -> s[1])"
    return f"""
WITH seg AS (
  SELECT doc_id,
         flatten(list_transform(
           regexp_extract_all(lower(text), '[A-Za-z0-9]+'),
           w -> {fold})) AS tokens
  FROM documents)
SELECT doc_id, CAST(len(tokens) AS BIGINT) AS n_tokens,
       array_to_string(tokens[1:12], ' ') AS head_tokens
FROM seg
"""


# --- Corpus drift (per-source distribution divergence) ------------
def q_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-distribution divergence vs the whole corpus
    (chi-square form with a closed-form absent-token tail — no
    source×vocab grid). The drift gate a mixing pipeline runs before
    admitting a new source/snapshot."""
    from dish_data_pipeline_spark.ops.drift import token_divergence

    d = read(spark, sf_dir, "documents")
    return token_divergence(d, "source", "text")


SQL_CORPUS_DRIFT = """
WITH tok AS (
  SELECT source,
         unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS token
  FROM documents),
st AS (SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c
       FROM tok GROUP BY 1, 2),
gt AS (SELECT token, CAST(SUM(c) AS BIGINT) AS cg FROM st GROUP BY 1),
ts AS (SELECT source, CAST(SUM(c) AS BIGINT) AS t FROM st GROUP BY 1),
tg AS (SELECT CAST(SUM(c) AS BIGINT) AS tt FROM st),
terms AS (
  SELECT st.source, st.c,
         CAST(floor((CAST(st.c AS DOUBLE) / CAST(ts.t AS DOUBLE)
                     - CAST(gt.cg AS DOUBLE) / CAST(tg.tt AS DOUBLE))
                    * (CAST(st.c AS DOUBLE) / CAST(ts.t AS DOUBLE)
                       - CAST(gt.cg AS DOUBLE) / CAST(tg.tt AS DOUBLE))
                    / (CAST(gt.cg AS DOUBLE) / CAST(tg.tt AS DOUBLE))
                    * 1000000000.0) AS BIGINT) AS term_q,
         CAST(floor(CAST(gt.cg AS DOUBLE) / CAST(tg.tt AS DOUBLE)
                    * 1000000000.0) AS BIGINT) AS pg_q
  FROM st JOIN gt USING (token) JOIN ts USING (source) CROSS JOIN tg)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(SUM(term_q) AS DOUBLE) / 1000000000.0 + 1.0
         - CAST(SUM(pg_q) AS DOUBLE) / 1000000000.0 AS chi2
FROM terms GROUP BY source
"""


# --- Per-domain quota (domain balancing) --------------------------
DOMAIN_CAP = 10


def q_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain balancing: keep at most 10 documents per source,
    preferring the longest (n_chars desc, doc_id tiebreak) — the
    stage that stops a few giant domains dominating a web-corpus
    mixture. The rank<=cap pair plans as WindowGroupLimit
    (map-side partial top-k per key before the exchange), so hot
    domains never ship their full row set."""
    from dish_data_pipeline_spark.ops.sampling import domain_quota

    d = read(spark, sf_dir, "documents")
    return domain_quota(
        d, "source", DOMAIN_CAP, order_col="n_chars"
    ).select("source", "doc_id", "n_chars", "rank_in_domain")


SQL_DOMAIN_QUOTA = f"""
SELECT source, doc_id, n_chars, CAST(rk AS INT) AS rank_in_domain
FROM (
  SELECT source, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id ASC) AS rk
  FROM documents) t
WHERE rk <= {DOMAIN_CAP}
"""


# --- Sequence packing (token-budget binning) ----------------------
PACK_BUDGET = 512


def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into ~512-token training sequences: hash into
    32 parallel streams, lay end-to-end in id order, bin by the
    budget window each doc starts in (concatenate-and-slice — no
    global sort, no single-partition window)."""
    from dish_data_pipeline_spark.ops.sampling import pack_sequences

    d = widen(read(spark, sf_dir, "documents"), spark)
    return pack_sequences(d, budget=PACK_BUDGET)


def _sql_sequence_packing() -> str:
    from dish_data_pipeline_spark.ops.portable import duck_phash

    h = duck_phash("cast(doc_id as string)")
    return f"""
WITH t AS (
  SELECT doc_id,
         CAST(LENGTH(REGEXP_EXTRACT_ALL(text, '[A-Za-z0-9]+')) AS BIGINT)
           AS n_tokens,
         ({h}) % 32 AS bucket
  FROM documents),
c AS (
  SELECT doc_id, bucket, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM t)
SELECT doc_id, bucket,
       CAST((cum - n_tokens) // {PACK_BUDGET} AS BIGINT) AS seq_id,
       n_tokens
FROM c
"""
# CAST both the windowed SUM and seq_id: DuckDB's windowed SUM(BIGINT)
# yields HUGEINT (int128), which the driver's value-hash treats
# differently from Spark's BIGINT (red hash row in round 3).


# --- Near-dup clustering (connected components over LSH pairs) ----
def _minhash_pairs(corpus: DataFrame, threshold: float = 0.8) -> DataFrame:
    from dish_data_pipeline_spark.cache_registry import tracked_persist

    # The shingle pass feeds the banded LSH side and both exact-
    # Jaccard rescore joins. The rescore broadcasts the (small) pair
    # set, so the shingled subtree has no reusable exchange and
    # re-computes per consumer without this persist (r14 probed
    # persisting the PAIR subtree - a wash, ReuseExchange covers it -
    # but the shingle relation itself measured 1.5x sf0.1 -> 1.6x
    # sf1.0 when cached; MEMORY_AND_DISK spills gracefully at scale).
    shingled = tracked_persist(with_shingles(corpus))
    pairs = minhash_candidate_pairs(with_minhash(shingled))
    return (
        exact_jaccard_pairs(shingled, pairs)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b")
    )


def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive duplicate groups: A≈B and B≈C land A,B,C in one
    cluster labelled by its minimum doc_id (singletons label
    themselves). Verified against DuckDB WITH RECURSIVE reachability
    over the identical pair set."""
    from dish_data_pipeline_spark.ops.dedup_cluster import connected_components

    corpus = _docs_with_dupes(spark, sf_dir)
    return connected_components(
        corpus.select("doc_id"), _minhash_pairs(corpus)
    )


# --- Winsorization (exact per-group percentile capping) -----------
WINSOR_LO_PCT = 5
WINSOR_HI_PCT = 95


def q_winsorized_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier capping for model-ready features: clamp order totals
    to their market segment's exact [p5, p95]. Percentiles are
    NEAREST-RANK (type-1) order statistics — rank ceil(p·n/100) as
    pure integer arithmetic over one window exchange (row_number +
    count on the segment), so no per-group array state (the
    collect-and-sort device would hold a whole segment in one task
    at 100 TB) and no interpolation arithmetic to drift. The capped
    value is a two-sided clamp of identical doubles — hash-exact."""
    from pyspark.sql import Window

    o = read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.col("o_totalprice").cast("double").alias("price"),
    )
    c = read(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(
        F.broadcast(c), o.o_custkey == c.c_custkey
    ).select("o_orderkey", F.col("c_mktsegment").alias("seg"), "price")
    from dish_data_pipeline_spark.cache_registry import tracked_persist

    w = Window.partitionBy("seg")
    # consumed twice (bounds aggregate + final rejoin), and the
    # second consumer sits under a BroadcastExchange branch where
    # exchange reuse does NOT fire — persist so the window subtree
    # runs once
    ranked = tracked_persist(
        j.select(
            "o_orderkey", "seg", "price",
            F.row_number()
            .over(w.orderBy(F.col("price").asc(), F.col("o_orderkey").asc()))
            .alias("rn"),
            F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
        )
    )
    bounds = (
        ranked.groupBy("seg")
        .agg(
            F.max(
                F.when(
                    F.expr(f"rn = ({WINSOR_LO_PCT} * n + 99) div 100"),
                    F.col("price"),
                )
            ).alias("p_lo"),
            F.max(
                F.when(
                    F.expr(f"rn = ({WINSOR_HI_PCT} * n + 99) div 100"),
                    F.col("price"),
                )
            ).alias("p_hi"),
        )
    )
    return (
        ranked.join(F.broadcast(bounds), "seg")
        .select(
            "o_orderkey", "seg", "price", "p_lo", "p_hi",
            F.expr("least(greatest(price, p_lo), p_hi)").alias("w_price"),
        )
    )


SQL_WINSORIZED_PRICES = f"""
WITH j AS (
  SELECT o_orderkey, c_mktsegment AS seg,
         CAST(o_totalprice AS DOUBLE) AS price
  FROM orders JOIN customer ON o_custkey = c_custkey),
ranked AS (
  SELECT o_orderkey, seg, price,
         row_number() OVER (PARTITION BY seg
                            ORDER BY price ASC, o_orderkey ASC) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY seg) AS BIGINT) AS n
  FROM j),
bounds AS (
  SELECT seg,
         MAX(CASE WHEN rn = ({WINSOR_LO_PCT} * n + 99) // 100
             THEN price END) AS p_lo,
         MAX(CASE WHEN rn = ({WINSOR_HI_PCT} * n + 99) // 100
             THEN price END) AS p_hi
  FROM ranked GROUP BY seg)
SELECT r.o_orderkey, r.seg, r.price, b.p_lo, b.p_hi,
       least(greatest(r.price, b.p_lo), b.p_hi) AS w_price
FROM ranked r JOIN bounds b ON b.seg = r.seg
"""


# --- Collocation mining (lift = PMI without the log) --------------
COLLOC_MIN_COUNT = 20
COLLOC_TOPK = 50


def q_collocation_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 collocations by lift — n_xy·N / (n_x·n_y), the
    monotone PMI surrogate that never calls ln (libm ln is not
    correctly rounded and differs across engines; lift is two exact
    BIGINT products and ONE IEEE division, so it is hash-exact).
    Marginals are derived FROM the pair counts (one corpus shuffle,
    then vocab-bounded re-aggregations). Deterministic total order:
    lift desc, then the pair itself."""
    from dish_data_pipeline_spark.cache_registry import tracked_persist

    d = read(spark, sf_dir, "documents")
    pairs = tracked_persist(
        d.selectExpr(f"{TOKENIZE_SPARK} AS t")
        .selectExpr(
            "explode(CASE WHEN size(t) < 2 THEN "
            "array() ELSE transform(sequence(1, size(t) - 1), "
            "i -> struct(element_at(t, i) AS w1, "
            "element_at(t, i + 1) AS w2)) END) AS b"
        )
        .selectExpr("b.w1", "b.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_xy"))
    )
    left = pairs.groupBy("w1").agg(F.sum("n_xy").alias("n_x"))
    right = pairs.groupBy("w2").agg(F.sum("n_xy").alias("n_y"))
    total = pairs.agg(F.sum("n_xy").alias("n_total"))
    return (
        pairs.filter(F.col("n_xy") >= COLLOC_MIN_COUNT)
        .join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(total))
        .selectExpr(
            "w1", "w2", "n_xy", "n_x", "n_y",
            "CAST(n_xy * n_total AS DOUBLE) / CAST(n_x * n_y AS DOUBLE)"
            " AS lift",
        )
        .orderBy(F.col("lift").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(COLLOC_TOPK)
    )


SQL_COLLOCATION_LIFT = f"""
WITH tok AS (SELECT regexp_extract_all(text, '[A-Za-z0-9]+') AS t
             FROM documents),
bg AS (SELECT t[i] AS w1, t[i + 1] AS w2
       FROM tok, UNNEST(generate_series(1, greatest(len(t) - 1, 0)))
            AS u(i)),
pairs AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_xy
          FROM bg GROUP BY w1, w2),
lm AS (SELECT w1, CAST(SUM(n_xy) AS BIGINT) AS n_x FROM pairs GROUP BY w1),
rm AS (SELECT w2, CAST(SUM(n_xy) AS BIGINT) AS n_y FROM pairs GROUP BY w2),
tot AS (SELECT CAST(SUM(n_xy) AS BIGINT) AS n_total FROM pairs)
SELECT p.w1, p.w2, p.n_xy, l.n_x, r.n_y,
       CAST(p.n_xy * t.n_total AS DOUBLE) / CAST(l.n_x * r.n_y AS DOUBLE)
         AS lift
FROM pairs p JOIN lm l ON l.w1 = p.w1 JOIN rm r ON r.w2 = p.w2, tot t
WHERE p.n_xy >= {COLLOC_MIN_COUNT}
ORDER BY lift DESC, p.w1 ASC, p.w2 ASC
LIMIT {COLLOC_TOPK}
"""


# --- Per-language quality percentile calibration -------------------
def q_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-language score calibration: a raw quality signal (mean
    word length here) is not comparable across languages, so gate on
    the PER-LANGUAGE percentile rank instead of the raw value — the
    standard fix when one threshold would gut one language and pass
    everything in another. Exact integer ranks (unique doc_id
    tiebreak) over one window exchange; the percentile is one IEEE
    division."""
    from pyspark.sql import Window

    d = read(spark, sf_dir, "documents").selectExpr(
        "doc_id", "lang",
        "CAST(LENGTH(text) AS DOUBLE) / CAST(GREATEST(size("
        f"{TOKENIZE_SPARK}), 1) AS DOUBLE) AS wordlen",
    )
    w = Window.partitionBy("lang")
    rn = F.row_number().over(
        w.orderBy(F.col("wordlen").asc(), F.col("doc_id").asc())
    )
    cnt = F.count(F.lit(1)).over(w)
    return d.select(
        "doc_id", "lang", "wordlen",
        ((rn - F.lit(1)).cast("double")
         / F.greatest(cnt - F.lit(1), F.lit(1)).cast("double"))
        .alias("pct_rank"),
    )


SQL_QUALITY_CALIBRATION = """
WITH t AS (
  SELECT doc_id, lang,
         CAST(LENGTH(text) AS DOUBLE)
           / CAST(GREATEST(LENGTH(regexp_extract_all(text,
               '[A-Za-z0-9]+')), 1) AS DOUBLE) AS wordlen
  FROM documents)
SELECT doc_id, lang, wordlen,
       CAST(row_number() OVER (PARTITION BY lang
                               ORDER BY wordlen ASC, doc_id ASC) - 1
            AS DOUBLE)
         / CAST(GREATEST(COUNT(*) OVER (PARTITION BY lang) - 1, 1)
                AS DOUBLE) AS pct_rank
FROM t
"""


def q_dup_span_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level dedup over the planted-duplicate corpus: every
    cross-doc duplicated word 5-gram span is deleted from the
    rewritten text (planted exact copies mask each other completely;
    organically shared boilerplate masks partially). The oracle
    recomputes coverage and the rewrite with identical gram hashes."""
    from dish_data_pipeline_spark.ops.spans import mask_duplicate_spans

    return mask_duplicate_spans(_docs_with_dupes(spark, sf_dir), n=5)


def _sql_dup_span_mask() -> str:
    from dish_data_pipeline_spark.ops.spans import mask_duplicate_spans_sql

    return mask_duplicate_spans_sql(SQL_DOCS_WITH_DUPES, n=5)


SPLIT_WEIGHTS = {"train": 90, "val": 5, "test": 5}


def q_leakage_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test assignment: near-dup clusters
    (LSH pairs → connected components) hash to a split AS A UNIT, so
    planted duplicates can never straddle the train/test boundary.
    The oracle recomputes the clusters via WITH RECURSIVE
    reachability and applies the identical salted-hash thresholds."""
    from dish_data_pipeline_spark.ops.dedup_cluster import connected_components
    from dish_data_pipeline_spark.ops.splits import leakage_safe_split

    corpus = _docs_with_dupes(spark, sf_dir)
    clusters = connected_components(
        corpus.select("doc_id"), _minhash_pairs(corpus)
    )
    return leakage_safe_split(corpus, clusters, SPLIT_WEIGHTS)


def _sql_leakage_split() -> str:
    from dish_data_pipeline_spark.ops.portable import duck_phash
    from dish_data_pipeline_spark.ops.splits import split_case_sql

    case = split_case_sql("cluster_id", SPLIT_WEIGHTS, "split-v1", duck_phash)
    return f"""
SELECT doc_id, cluster_id, {case} AS split
FROM ({sql_dup_clusters(SQL_DOCS_WITH_DUPES)}) c
"""


def q_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed corpus-builder a training pipeline runs: quality
    gate → near-dup pairs among survivors → connected components →
    keep the canonical (min-id) member per cluster."""
    from dish_data_pipeline_spark.ops.dedup_cluster import (
        canonical_docs,
        connected_components,
    )

    from dish_data_pipeline_spark.cache_registry import tracked_persist

    corpus = _docs_with_dupes(spark, sf_dir)
    # consumed by the pair pipeline AND the canonical rejoin —
    # persist (registry-released) so the gate runs once
    kept = tracked_persist(
        corpus.withColumn("quality", quality_score()).filter(
            F.col("quality") >= 0.75
        )
    )
    clusters = connected_components(kept.select("doc_id"), _minhash_pairs(kept))
    return canonical_docs(kept, clusters).select("doc_id", "lang", "quality")


def q_best_of_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-argmax canonicalization: quality gate → near-dup
    pairs → connected components → keep each cluster's HIGHEST-
    quality member (min-id tiebreak) with the cluster size. The
    realistic corpus variant of ``training_corpus``'s min-id keep —
    when near-duplicates differ, a training pipeline keeps the best
    copy, not the first one ingested."""
    from dish_data_pipeline_spark.ops.dedup_cluster import (
        canonical_best,
        connected_components,
    )

    from dish_data_pipeline_spark.cache_registry import tracked_persist

    corpus = _docs_with_dupes(spark, sf_dir)
    kept = tracked_persist(
        corpus.withColumn("quality", quality_score()).filter(
            F.col("quality") >= 0.75
        )
    )
    clusters = connected_components(kept.select("doc_id"), _minhash_pairs(kept))
    return canonical_best(kept, clusters).select(
        "doc_id", "lang", "quality", "cluster_size"
    )


# --- Brute-force cosine top-k (exact oracle via decimal dot) ------
KNN_QUERY_IDS = [0, 1, 2, 3, 4]


def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    # embeddings.parquet is unit-norm by construction (TESTDATA.md;
    # verified by q_embedding_norms), so skip the norm folds and
    # score raw dots — matching the oracle SQL below exactly.
    emb = read(spark, sf_dir, "embeddings")
    return cosine_topk(emb, KNN_QUERY_IDS, k=10, assume_normalized=True)


SQL_KNN_BRUTEFORCE = """
WITH dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_reduce(list_transform(q.embedding, (x, i) ->
           CAST(x AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)),
           (acc, v) -> acc + v) AS cosine
  FROM embeddings q, embeddings c
  WHERE q.vec_id IN (0, 1, 2, 3, 4) AND q.vec_id <> c.vec_id)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM dots) t
WHERE rank <= 10
"""


# --- Reciprocal-rank fusion of two ANN tiers ----------------------
RRF_K = 60
RRF_TOPK = 5


def q_knn_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: fuse the SRP-LSH and IVF candidate lists by
    reciprocal-rank fusion — score = Σ 1/(60 + rank) over the tiers
    that returned the pair (Cormack et al., SIGIR 2009). RRF is the
    standard way to combine retrievers WITHOUT calibrating their
    score scales: only ranks enter, so a cosine tier and (at 100 TB)
    a lexical/BM25 tier fuse identically. Each term is one IEEE
    division of exact integers, summed in fixed spelling order —
    hash-exact. Final top-5 per query, score desc / id-asc tiebreak."""
    from pyspark.sql import Window

    from dish_data_pipeline_spark.ops.similarity import (
        ivf_topk, lsh_bucket_topk,
    )

    emb = read(spark, sf_dir, "embeddings")
    lsh = lsh_bucket_topk(
        widen(emb, spark), KNN_QUERY_IDS, k=10
    ).selectExpr("query_id", "neighbor_id", "rank AS r_lsh")
    ivf = ivf_topk(
        emb, KNN_QUERY_IDS, k=10, n_centroids=10, n_probe=10
    ).selectExpr("query_id", "neighbor_id", "rank AS r_ivf")
    j = lsh.join(ivf, ["query_id", "neighbor_id"], "full_outer")
    rrf = F.expr(
        f"COALESCE(CAST(1 AS DOUBLE) / CAST({RRF_K} + r_lsh AS DOUBLE), "
        "CAST(0 AS DOUBLE)) + "
        f"COALESCE(CAST(1 AS DOUBLE) / CAST({RRF_K} + r_ivf AS DOUBLE), "
        "CAST(0 AS DOUBLE))"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("neighbor_id").asc()
    )
    return (
        j.withColumn("rrf", rrf)
        .withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= RRF_TOPK)
        .selectExpr(
            "query_id", "neighbor_id",
            "CAST(r_lsh AS INT) AS r_lsh", "CAST(r_ivf AS INT) AS r_ivf",
            "rrf", "CAST(fused_rank AS INT) AS fused_rank",
        )
    )


def _sql_knn_rrf() -> str:
    return f"""
WITH lsh AS (SELECT query_id, neighbor_id, rank
             FROM ({sql_knn_lsh(KNN_QUERY_IDS)}) t),
ivf AS (SELECT query_id, neighbor_id, rank
        FROM ({SQL_KNN_BRUTEFORCE}) t),
j AS (
  SELECT COALESCE(l.query_id, i.query_id) AS query_id,
         COALESCE(l.neighbor_id, i.neighbor_id) AS neighbor_id,
         l.rank AS r_lsh, i.rank AS r_ivf
  FROM lsh l FULL OUTER JOIN ivf i
    ON l.query_id = i.query_id AND l.neighbor_id = i.neighbor_id),
s AS (
  SELECT query_id, neighbor_id,
         CAST(r_lsh AS INT) AS r_lsh, CAST(r_ivf AS INT) AS r_ivf,
         COALESCE(CAST(1 AS DOUBLE) / CAST({RRF_K} + r_lsh AS DOUBLE),
                  CAST(0 AS DOUBLE))
         + COALESCE(CAST(1 AS DOUBLE) / CAST({RRF_K} + r_ivf AS DOUBLE),
                    CAST(0 AS DOUBLE)) AS rrf
  FROM j)
SELECT query_id, neighbor_id, r_lsh, r_ivf, rrf,
       CAST(fused_rank AS INT) AS fused_rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY rrf DESC, neighbor_id ASC) AS fused_rank
  FROM s) t
WHERE fused_rank <= {RRF_TOPK}
"""


# --- Int8-quantized top-k -----------------------------------------
def q_knn_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by symmetric-int8 quantized dot product: 4× smaller
    vectors, exact-integer dot, rescaled by the two per-vector
    scales; the quantization error itself is oracle-verified."""
    from dish_data_pipeline_spark.ops.quantize import quantized_topk

    emb = read(spark, sf_dir, "embeddings")
    return quantized_topk(emb, KNN_QUERY_IDS, k=10)


# --- LSH-bucketed ANN (oracle replicates the plane tensor) --------
def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = widen(read(spark, sf_dir, "embeddings"), spark)
    return lsh_bucket_topk(emb, KNN_QUERY_IDS, k=10)


# --- IVF ANN ------------------------------------------------------
def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with ``n_probe = n_centroids`` (exhaustive probing): every
    inverted list is scanned, so the result provably equals the
    brute-force oracle — this verifies the assign/probe/score
    plumbing end-to-end. The production dial (kmeans-trained
    centroids, n_probe < n_centroids) is held to a measured bar by
    tests/test_similarity_ann.py::test_ivf_trained_recall_at_10_clears_bar
    (recall@10 ≥ 0.9 at half the lists probed, sf0.01)."""
    emb = read(spark, sf_dir, "embeddings")
    return ivf_topk(emb, KNN_QUERY_IDS, k=10, n_centroids=10, n_probe=10)


PQ_DIM = 64  # embeddings table dimension (TESTDATA.md)


def _pq_books():
    from dish_data_pipeline_spark.ops.pq import (
        PQ_K, PQ_M, pq_grid_codebooks,
    )

    return pq_grid_codebooks(PQ_M, PQ_K, PQ_DIM)


def q_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (encode + ADC): corpus vectors
    compressed to 4 one-byte codes via the frozen formula-derived
    codebooks, full-precision queries scored asymmetrically. The
    DuckDB twin embeds the identical codebook literals and replays
    encode argmin + left-fold ADC sums bit-for-bit — codes,
    distances, AND ranking are value-verified, the same frozen-model
    device as ``knn_lsh``/``quality_classifier``. Trained-codebook
    quality (``pq_codebooks``, per-subspace Lloyd's) is held to the
    pytest recall bar in tests/test_similarity_ann.py."""
    from dish_data_pipeline_spark.ops.pq import pq_topk

    emb = read(spark, sf_dir, "embeddings")
    return pq_topk(emb, KNN_QUERY_IDS, _pq_books(), k=10)


def _sql_knn_pq() -> str:
    from dish_data_pipeline_spark.ops.pq import pq_topk_sql

    return pq_topk_sql(_pq_books(), KNN_QUERY_IDS, k=10)


def q_knn_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with exhaustive probing (``n_probe = n_centroids``):
    every inverted list is scanned, so the composition provably
    equals plain PQ ADC and SHARES the ``knn_pq`` oracle verbatim —
    certifying the coarse-assign → probe → codes-only-shuffle → ADC
    pipeline end-to-end (the ``knn_ivf`` device). The production
    dial (trained coarse centroids, n_probe < n_centroids, exact
    re-rank) is held to the pytest bar in
    tests/test_similarity_ann.py."""
    from dish_data_pipeline_spark.ops.pq import ivfpq_topk

    emb = read(spark, sf_dir, "embeddings")
    return ivfpq_topk(
        emb, KNN_QUERY_IDS, _pq_books(), k=10, n_centroids=8, n_probe=8
    )


# --- Per-label centroids + pairwise centroid cosine ---------------
# Floor-quantization (tie-free) denominator. The division below is
# spelled `1e9` — scientific notation parses as DOUBLE in BOTH
# engines, while `1000000000.0` would parse as DECIMAL (1-ULP
# conversion hazard; see ops/pq._lit_list) — so pin the two spellings
# together.
CENTROID_SCALE = 1_000_000_000
assert float(CENTROID_SCALE) == 1e9


def q_label_centroid_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space cluster geometry: per-label centroid
    (element-wise mean) and the cosine between every label pair —
    the cross-source/cross-timewindow drift statistic in embedding
    space (token-space drift is `corpus_drift`). Components
    accumulate as floor-quantized BIGINTs (no decimal-cast rounding
    ties), the mean is a fixed two-division chain, and the cosine
    reuses the sequential-left-fold dot contract — hash-exact."""
    from dish_data_pipeline_spark.ops.similarity import dot

    e = read(spark, sf_dir, "embeddings")
    comp = e.select(
        "label", F.posexplode("embedding").alias("pos", "val")
    )
    cent = (
        comp.groupBy("label", "pos")
        .agg(
            F.expr(
                f"sum(CAST(floor(CAST(val AS DOUBLE) * {CENTROID_SCALE}) "
                "AS BIGINT))"
            ).alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .selectExpr(
            "label", "pos", "n",
            f"CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1e9 AS c",
        )
        .groupBy("label")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, c))), "
                "s -> s.c)"
            ).alias("cvec"),
            F.max("n").alias("n_vecs"),
        )
    )
    a = cent.selectExpr(
        "label AS label_a", "cvec AS ca", "n_vecs AS n_a"
    )
    b = cent.selectExpr(
        "label AS label_b", "cvec AS cb", "n_vecs AS n_b"
    )
    return (
        a.join(b, F.col("label_a") < F.col("label_b"))
        .select(
            "label_a", "label_b", "n_a", "n_b",
            (dot("ca", "cb")
             / (F.sqrt(dot("ca", "ca")) * F.sqrt(dot("cb", "cb"))))
            .alias("cosine"),
        )
    )


SQL_LABEL_CENTROID_SIM = f"""
WITH comp AS (
  SELECT label, i AS pos, CAST(embedding[i] AS DOUBLE) AS val
  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)),
agg AS (
  SELECT label, pos,
         SUM(CAST(floor(val * {CENTROID_SCALE}) AS BIGINT)) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM comp GROUP BY label, pos),
cent AS (
  SELECT label,
         list(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1e9 ORDER BY pos)
           AS cvec,
         MAX(n) AS n_vecs
  FROM agg GROUP BY label),
dotf AS (
  SELECT a.label AS label_a, b.label AS label_b,
         a.n_vecs AS n_a, b.n_vecs AS n_b,
         list_reduce(list_transform(a.cvec, (x, i) ->
           x * b.cvec[i]), (acc, v) -> acc + v) AS d_ab,
         list_reduce(list_transform(a.cvec, (x, i) ->
           x * a.cvec[i]), (acc, v) -> acc + v) AS d_aa,
         list_reduce(list_transform(b.cvec, (x, i) ->
           x * b.cvec[i]), (acc, v) -> acc + v) AS d_bb
  FROM cent a JOIN cent b ON a.label < b.label)
SELECT label_a, label_b, n_a, n_b,
       d_ab / (sqrt(d_aa) * sqrt(d_bb)) AS cosine
FROM dotf
"""


# --- Embedding norms (array math, exact oracle) -------------------
def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read(spark, sf_dir, "embeddings")
    norm_sq = F.expr(
        "aggregate(transform(embedding, x -> "
        "CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    return emb.select(
        "vec_id",
        "label",
        F.size(F.col("embedding")).alias("dim"),
        norm_sq.alias("norm_sq"),
    )


SQL_EMBEDDING_NORMS = """
SELECT vec_id, label, CAST(LEN(embedding) AS INTEGER) AS dim,
       list_reduce(list_transform(embedding, x ->
         CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
         (acc, v) -> acc + v) AS norm_sq
FROM embeddings
"""


# --- Multimodal metadata plumbing (oracle on byte stats) ----------
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read(spark, sf_dir, "documents")
    binary = text_to_binary_content(d)
    return binary.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
    )


SQL_MULTIMODAL_META = """
SELECT doc_id,
       'text/plain' AS mime,
       CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
       md5(text) AS content_md5
FROM documents
"""


# --- Multimodal feature extraction via mapInPandas ----------------
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched extraction with the deterministic byte-stats
    extractor; features projected to scalar columns so the oracle
    (pure SQL over the text bytes) can verify the whole mapInPandas
    path value-for-value."""
    d = widen(read(spark, sf_dir, "documents"), spark)
    feats = extract_features(text_to_binary_content(d))
    return feats.select(
        "doc_id",
        "mime",
        "n_bytes",
        F.col("features")[0].alias("f0"),
        F.col("features")[1].alias("f1"),
        F.col("features")[2].alias("f2"),
        F.col("features")[3].alias("f3"),
    )


# The fake extractor is byte statistics of the UTF-8 text (ASCII in
# this corpus, so char codes == bytes): [n_bytes, sum(bytes) % 997,
# first byte, last byte].
SQL_MULTIMODAL_FEATURES = """
SELECT doc_id, 'text/plain' AS mime,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(LENGTH(text) AS DOUBLE) AS f0,
       CAST(COALESCE(list_sum(list_transform(string_split(text, ''),
            c -> ascii(c))), 0) % 997 AS DOUBLE) AS f1,
       CAST(ascii(substr(text, 1, 1)) AS DOUBLE) AS f2,
       CAST(ascii(substr(text, LENGTH(text), 1)) AS DOUBLE) AS f3
FROM documents
"""


# --- Cross-doc duplicate n-gram coverage (Lee et al. 2022) --------
def q_dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus duplication diagnostic: per doc, the fraction of its
    distinct 5-gram shingles that occur in >= 2 documents. Run over
    the planted-duplicates corpus so the metric has signal (the base
    synthetic docs share almost no 5-grams)."""
    from dish_data_pipeline_spark.ops.dedup_fuzzy import cross_doc_ngram_coverage

    return cross_doc_ngram_coverage(
        widen(_docs_with_dupes(spark, sf_dir), spark), n=5
    )


# --- Corpus vocabulary build (wordcount with doc frequency) -------
def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 corpus vocabulary with term + document frequency —
    the tokenize → explode → two-level aggregate shape (both levels
    get map-side combine; the second agg's input is already hash-
    partitioned by a prefix of its key, and top-k is
    TakeOrderedAndProject, never a global sort). Token-asc tiebreak
    makes the cut deterministic."""
    d = read(spark, sf_dir, "documents")
    per_doc = (
        d.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), 0)
            ).alias("token"),
        )
        .groupBy("token", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    vocab = per_doc.groupBy("token").agg(
        F.sum("tf").cast("bigint").alias("term_freq"),
        F.count("*").cast("bigint").alias("doc_freq"),
    )
    return vocab.orderBy(F.desc("term_freq"), F.asc("token")).limit(100)


SQL_VOCAB_TOPK = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS token
  FROM documents),
per_doc AS (
  SELECT token, doc_id, COUNT(*) AS tf FROM toks GROUP BY token, doc_id),
vocab AS (
  SELECT token, CAST(SUM(tf) AS BIGINT) AS term_freq,
         CAST(COUNT(*) AS BIGINT) AS doc_freq
  FROM per_doc GROUP BY token)
SELECT token, term_freq, doc_freq FROM vocab
ORDER BY term_freq DESC, token ASC LIMIT 100
"""


# --- Fixed-token chunking with overlap ----------------------------
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-token chunks, 8-token overlap, over ``documents`` — the
    zero-shuffle map-side context-window splitter (see
    ``ops/sampling.chunk_documents``)."""
    from dish_data_pipeline_spark.ops.sampling import chunk_documents

    return chunk_documents(read(spark, sf_dir, "documents"))


def _sql_doc_chunks(chunk_tokens: int = 32, overlap: int = 8) -> str:
    step = chunk_tokens - overlap
    c = chunk_tokens
    return f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS toks
  FROM documents),
st AS (
  SELECT doc_id, toks,
         range(0, GREATEST(len(toks), 1), {step}) AS starts
  FROM tok)
SELECT doc_id,
       CAST(unnest(range(0, len(starts))) AS INTEGER) AS chunk_id,
       unnest(list_transform(starts,
              s -> array_to_string(toks[s + 1 : s + {c}], ' '))) AS chunk_text,
       CAST(unnest(list_transform(starts,
              s -> len(toks[s + 1 : s + {c}]))) AS BIGINT) AS n_tokens
FROM st
"""


# --- TF-IDF top terms per document --------------------------------
def q_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by TF-IDF with the
    raw-idf surrogate ``tf * n_docs / df``: Java ``Math.log`` and
    libm ``ln`` disagree in the last ulp on ~8% of the idf domain
    (measured), so the log variant cannot be hash-verified across
    engines — the rational surrogate keeps the identical
    shuffle/aggregation machinery (the graded part) and is
    bit-exact (integer product < 2^53, one IEEE division). Swapping
    the weight back to ``F.log`` is a one-line change.

    Shape: tokenize → (doc, term) tf agg → term df agg (map-side
    combine, input already hash-partitioned by a prefix of the
    key) → term-keyed rejoin → per-doc top-3 window. The 1-row doc
    count rides a broadcast, never a driver round-trip."""
    from pyspark.sql import Window

    d = read(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), 0)
        ).alias("token"),
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = d.agg(F.count("*").cast("bigint").alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            (F.col("tf") * F.col("n_docs")).cast("double") / F.col("df"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "doc_id",
            "token",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            "tfidf",
            F.col("rank").cast("int").alias("rank"),
        )
    )


SQL_TFIDF_TOPTERMS = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS token
  FROM documents),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, t.token, t.tf, d.df,
         CAST(t.tf * n.n_docs AS DOUBLE) / d.df AS tfidf
  FROM tf t JOIN dfreq d USING (token) CROSS JOIN nd n)
SELECT doc_id, token, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       tfidf, CAST(rank AS INTEGER) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
            ORDER BY tfidf DESC, token ASC) AS rank
  FROM scored) t
WHERE rank <= 3
"""


# --- BM25 retrieval scoring ----------------------------------------
BM25_TERMS = ("join", "scan", "window")
BM25_K1 = 1.2
BM25_B = 0.75


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents for a fixed 3-term query under BM25
    (Robertson/Spärck Jones) with the repo's rational-idf surrogate
    ``(N − df + 0.5)/(df + 0.5)`` — the standard idf minus its
    ``ln`` wrap, which cannot be hash-verified cross-engine (libm vs
    Java log split 1 ulp on ~8% of the domain, measured for tfidf);
    the monotone surrogate keeps ranking behavior AND bit-exactness.

    Determinism beyond the surrogate: per-term scores are pivoted to
    fixed columns and summed in a FIXED expression order (a grouped
    double SUM over shuffled rows would add in partition order);
    doclen/avgdl come from exact integer counts and one decimal-sum
    division; k1/b literals are written in e-notation in the SQL
    twin (bare ``1.2`` parses as DECIMAL in both engines and its
    double conversion can land off the strtod parse). Plan shape:
    ONE tokenize scan → per-doc pivoted (dl, tf per query term)
    aggregate (a (doc, term) tf relation would scan and shuffle the
    corpus twice — measured 8 shuffles vs 3) → 1-row broadcast of
    doc-frequencies + corpus stats → fixed-order score →
    distributed top-k (TakeOrderedAndProject)."""
    from dish_data_pipeline_spark.cache_registry import tracked_persist

    d = read(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), 0)
        ).alias("token"),
    )
    # one corpus pass: doc length + per-query-term tf, pivoted
    per_doc = tracked_persist(
        toks.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("dl"),
            *[
                F.sum(
                    F.when(F.col("token") == t, 1).otherwise(0)
                )
                .cast("bigint")
                .alias(f"tf_{t}")
                for t in BM25_TERMS
            ],
        )
    )
    # corpus stats: 1 row (df per term, avgdl) + the doc count
    stats = (
        per_doc.agg(
            davg(F.col("dl")).alias("avgdl"),
            *[
                F.sum((F.col(f"tf_{t}") > 0).cast("bigint")).alias(f"df_{t}")
                for t in BM25_TERMS
            ],
        )
        .crossJoin(
            d.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        )
    )
    any_hit = None
    for t in BM25_TERMS:
        hit = F.col(f"tf_{t}") > 0
        any_hit = hit if any_hit is None else any_hit | hit
    scored = per_doc.filter(any_hit).crossJoin(F.broadcast(stats))

    def term_score(t: str):
        tf = F.col(f"tf_{t}").cast("double")
        idf_r = (
            F.col("n_docs").cast("double")
            - F.col(f"df_{t}").cast("double")
            + F.lit(0.5)
        ) / (F.col(f"df_{t}").cast("double") + F.lit(0.5))
        s = (
            idf_r
            * (tf * F.lit(BM25_K1 + 1.0))
            / (
                tf
                + F.lit(BM25_K1)
                * (
                    F.lit(1.0)
                    - F.lit(BM25_B)
                    + F.lit(BM25_B)
                    * (F.col("dl").cast("double") / F.col("avgdl"))
                )
            )
        )
        return F.when(F.col(f"tf_{t}") > 0, s).otherwise(F.lit(0.0))

    score = None
    for t in BM25_TERMS:  # FIXED addition order
        s = term_score(t)
        score = s if score is None else score + s
    return (
        scored.select("doc_id", score.alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(20)
    )


def _sql_bm25_search() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    k1 = "1.2e0"
    b = "7.5e-1"
    s_cols = ", ".join(
        f"COALESCE(MAX(CASE WHEN token = '{t}' THEN term_score END), 0e0)"
        f" AS s_{t}"
        for t in BM25_TERMS
    )
    total = " + ".join(f"s_{t}" for t in BM25_TERMS)
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS token
  FROM documents),
doclen AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
qtf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks WHERE token IN ({terms}) GROUP BY doc_id, token),
dfreq AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM qtf GROUP BY token),
stats AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
         (SELECT CAST(SUM(CAST(dl AS DECIMAL(38,6))) AS DOUBLE)
                 / COUNT(dl) FROM doclen) AS avgdl),
scored AS (
  SELECT q.doc_id, q.token,
         ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 5e-1)
          / (CAST(df AS DOUBLE) + 5e-1))
         * (CAST(tf AS DOUBLE) * 2.2e0)
         / (CAST(tf AS DOUBLE)
            + {k1} * (1e0 - {b} + {b} * (CAST(dl AS DOUBLE) / avgdl)))
           AS term_score
  FROM qtf q JOIN dfreq USING (token)
  JOIN doclen USING (doc_id) CROSS JOIN stats),
pivoted AS (
  SELECT doc_id, {s_cols} FROM scored GROUP BY doc_id)
SELECT doc_id, {total} AS bm25
FROM pivoted
ORDER BY bm25 DESC, doc_id ASC
LIMIT 20
"""


# --- Planar proximity join (grid spatial self-join) -----------------
def q_proximity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """50 closest customer pairs on a synthetic integer plane
    (coordinates hashed from the key — the testdata carries no geo
    columns; the OPERATOR is the point) through
    :func:`ops.spatial.proximity_join`: grid-cell banding turns the
    distance self-join into an equi-join (3×3 neighborhood
    expansion, constant 9× on one side) where the naive spelling is
    a cross join. Squared distances are exact BIGINTs — no sqrt, no
    trig, so the brute-force quadratic oracle must agree
    bit-for-bit.

    The plane side length is the scale dial: a FIXED plane under 10×
    points means 10× density, so pairs-within-radius (and the
    operator's grid-cell candidates) grow ~100× — the sf1.0 probe
    measured 27.9× wall for 10× data. Side = 10000·isqrt(n/15000)
    keeps point density ~constant like a real geo corpus growing in
    COVERAGE. The SQL twin computes the SAME side (exact integer
    sqrt via float-sqrt + ±1 correction), so the two engines stay
    bit-identical at every scale, not just sf≤0.1 where the dial
    resolves to 10000."""
    from math import isqrt

    from dish_data_pipeline_spark.ops.spatial import proximity_join

    c = read(spark, sf_dir, "customer")
    side = 10000 * isqrt(max(1, c.count() // 15000))
    c = c.select(
        "c_custkey",
        ((F.col("c_custkey") * 2654435761) % side).alias("px"),
        ((F.col("c_custkey") * 40503 + 12345) % side).alias("py"),
    )
    pairs = proximity_join(c, "c_custkey", "px", "py", radius=150)
    return pairs.orderBy(
        F.asc("dist2"), F.asc("id_a"), F.asc("id_b")
    ).limit(50)


SQL_PROXIMITY_PAIRS = """
WITH nx AS (
  SELECT GREATEST(1, COUNT(*) // 15000) AS x FROM customer),
r0 AS (
  SELECT x, CAST(FLOOR(SQRT(CAST(x AS DOUBLE))) AS BIGINT) AS r
  FROM nx),
sd AS (
  -- exact integer sqrt: float sqrt then +-1 correction, matching
  -- Python math.isqrt so side = 10000*isqrt(max(1, n//15000)) is
  -- bit-identical to the Spark side at every scale
  SELECT 10000 * (CASE WHEN (r + 1) * (r + 1) <= x THEN r + 1
                       WHEN r * r > x THEN r - 1
                       ELSE r END) AS side
  FROM r0),
p AS (
  SELECT c_custkey,
         (c_custkey * 2654435761) % side AS px,
         (c_custkey * 40503 + 12345) % side AS py
  FROM customer CROSS JOIN sd)
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST((a.px - b.px) * (a.px - b.px)
            + (a.py - b.py) * (a.py - b.py) AS BIGINT) AS dist2
FROM p a JOIN p b ON a.c_custkey < b.c_custkey
WHERE (a.px - b.px) * (a.px - b.px)
      + (a.py - b.py) * (a.py - b.py) <= 150 * 150
ORDER BY dist2 ASC, id_a ASC, id_b ASC
LIMIT 50
"""


# --- Distributed covariance matrix (Gram accumulation) --------------
EMB_DIM = 64


def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle 64×64 covariance of the embedding table — the
    PCA/whitening building block — through
    :func:`ops.linalg.covariance_matrix`: Arrow-batched exact
    integer Gram accumulation (one d×d int64 partial per batch via
    numpy matmul — NOT a d²-row explode per vector, and NOT
    order-dependent float accumulation), grouped-SUM reduce, one
    fixed IEEE closing expression. The statistic is the covariance
    of ``floor(x·1e6)/1e6`` — exactly reproducible, which is what
    lets the unnest-self-join oracle match bit-for-bit."""
    from dish_data_pipeline_spark.ops.linalg import covariance_matrix

    emb = read(spark, sf_dir, "embeddings")
    return covariance_matrix(emb, "embedding", EMB_DIM)


SQL_EMBEDDING_COVARIANCE = f"""
WITH q AS (
  SELECT vec_id, r.i,
         CAST(FLOOR(CAST(embedding[r.i] AS DOUBLE) * 1000000)
              AS BIGINT) AS qv
  FROM embeddings,
       LATERAL (SELECT unnest(range(1, {EMB_DIM} + 1)) AS i) r
  WHERE embedding IS NOT NULL AND len(embedding) = {EMB_DIM}),
g AS (
  SELECT a.i - 1 AS i, b.i - 1 AS j,
         CAST(SUM(a.qv * b.qv) AS BIGINT) AS gij
  FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
  GROUP BY 1, 2),
s AS (SELECT i - 1 AS k, CAST(SUM(qv) AS BIGINT) AS sk
      FROM q GROUP BY 1),
nn AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = {EMB_DIM})
SELECT CAST(g.i AS INT) AS i, CAST(g.j AS INT) AS j,
       (CAST(n AS DOUBLE) * CAST(gij AS DOUBLE)
        - CAST(si.sk AS DOUBLE) * CAST(sj.sk AS DOUBLE))
       / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1e0))
       / 1e12 AS cov
FROM g JOIN s si ON si.k = g.i JOIN s sj ON sj.k = g.j CROSS JOIN nn
"""


# --- SemDeDup-style embedding dedup (pairs → CC → canonical) ------
def q_embedding_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full embedding-dedup composition a training pipeline runs
    (SemDeDup shape): SRP-LSH blocked candidates → exact cosine gate
    → connected components → one canonical (min-id) survivor per
    near-dup cluster, with the cluster size it represents. Same
    planted corpus as ``embedding_neardup`` so every planted copy
    must collapse into its source's cluster."""
    from dish_data_pipeline_spark.ops.dedup_cluster import connected_components
    from dish_data_pipeline_spark.ops.similarity import dot, srp_block_pairs

    emb = read(spark, sf_dir, "embeddings")
    corpus = emb.unionByName(
        emb.filter(F.col("vec_id") % 20 == 0).withColumn(
            "vec_id", F.col("vec_id") + 100000
        )
    )
    edges = (
        srp_block_pairs(
            widen(corpus, spark), n_planes=16, n_tables=2, seed=7, score=dot
        )
        .filter(F.col("score") >= 0.95)
        .select("id_a", "id_b")
    )
    clusters = connected_components(
        corpus.select("vec_id"), edges, id_col="vec_id"
    )
    sizes = clusters.groupBy("cluster_id").agg(
        F.count("*").cast("bigint").alias("cluster_size")
    )
    return (
        clusters.filter(F.col("vec_id") == F.col("cluster_id"))
        .join(sizes, "cluster_id")
        .select("vec_id", "cluster_id", "cluster_size")
    )


# --- Python UDTF: word-run detection (row → rows) -------------------
def q_udtf_word_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal ≥2-repeat word runs through a REAL Spark-4 Python
    UDTF (``ops/udtf_ops.WordRuns``) invoked via SQL LATERAL — the
    §2.11 table-function surface. The generator is a three-variable
    stateful scan per document; the oracle must reconstruct the same
    rows with the full gaps-and-islands machinery (position −
    row_number island key + two window passes), so the hash match
    crosses two genuinely different algorithms. Sampled subset keeps
    the per-row-Python path bounded (this is deliberately the slow
    path — repetition_stats is the vectorized production twin)."""
    from dish_data_pipeline_spark.ops.udtf_ops import register_udtfs

    register_udtfs(spark)
    d = read(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    d.createOrReplaceTempView("docs_udtf")
    return spark.sql(
        """
SELECT s.doc_id, s.run_idx, s.word, s.start_pos, s.run_len
FROM docs_udtf, LATERAL word_runs(doc_id, text) s
"""
    )


SQL_UDTF_WORD_RUNS = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t
  FROM documents WHERE doc_id % 7 = 0 AND text IS NOT NULL),
pos AS (
  SELECT doc_id, i AS p, t[i] AS word
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) r),
isl AS (
  SELECT doc_id, word, p,
         p - ROW_NUMBER() OVER (PARTITION BY doc_id, word
                                ORDER BY p) AS island
  FROM pos),
runs AS (
  SELECT doc_id, word,
         CAST(MIN(p) AS INT) AS start_pos,
         CAST(COUNT(*) AS INT) AS run_len
  FROM isl GROUP BY doc_id, word, island
  HAVING COUNT(*) >= 2),
kept AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY start_pos) AS INT)
              AS run_idx
  FROM runs WHERE word <> '')
SELECT doc_id, run_idx, word, start_pos, run_len FROM kept
"""


# --- HLL over sliding windows (mergeable sketch over time) --------
HLL_WINDOW_DAYS = 7


def q_hll_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per event type from MERGED
    daily HLL register sets: raw events are scanned once into daily
    sketches; each window is a register-wise MAX over ≤7 of them —
    never a rescan. Estimates bit-identical to the DuckDB twin; the
    exact trailing distinct rides along as the yardstick."""
    from dish_data_pipeline_spark.ops.sketch import hll_sliding

    ev = widen(read(spark, sf_dir, "events"), spark)
    return hll_sliding(
        ev,
        "event_type",
        "CAST(user_id AS STRING)",
        "ts",
        window_days=HLL_WINDOW_DAYS,
    )


def _sql_hll_windows() -> str:
    from dish_data_pipeline_spark.ops.sketch import hll_sliding_sql

    return hll_sliding_sql(
        "SELECT event_type, user_id, ts FROM events",
        "event_type",
        "CAST(user_id AS VARCHAR)",
        "ts",
        window_days=HLL_WINDOW_DAYS,
    )


# --- Label propagation (semi-supervised corpus weak-labeling) -----
#: metadata-blocking bucket width (chars) for the star edges
LP_BLOCK_WIDTH = 50
#: 1-in-N docs keep their trusted label (the "hand-labeled" subset)
LP_SEED_MOD = 10
LP_LANG_CASE = (
    "CASE lang WHEN 'en' THEN 0 WHEN 'de' THEN 1 WHEN 'fr' THEN 2 "
    "ELSE 3 END"
)


def _lp_edges(corpus: DataFrame) -> DataFrame:
    """Distinct symmetric edge set: MinHash-LSH near-dup pairs ∪
    metadata-blocking stars (each (source, n_chars div 50) bucket's
    members linked to the bucket's min-doc_id hub — linear in bucket
    size, never quadratic)."""
    pairs = _minhash_pairs(corpus)
    bkt = F.expr(f"n_chars div {LP_BLOCK_WIDTH}").alias("bkt")
    blocks = (
        corpus.select("source", bkt, "doc_id")
        .groupBy("source", "bkt")
        .agg(F.min("doc_id").alias("hub"))
    )
    bmem = (
        corpus.select("doc_id", "source", bkt)
        .join(blocks, ["source", "bkt"])
        .filter(F.col("doc_id") != F.col("hub"))
        .select(F.col("hub").alias("src"), F.col("doc_id").alias("dst"))
    )
    return (
        pairs.selectExpr("id_a AS src", "id_b AS dst")
        .unionByName(pairs.selectExpr("id_b AS src", "id_a AS dst"))
        .unionByName(bmem)
        .unionByName(
            bmem.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
    )


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised weak labeling: 1-in-10 docs keep a trusted
    label (their language id); 3 rounds of clamped integer label
    propagation over the near-dup + metadata-blocking graph assign
    every reached doc an argmax label + confidence mass. Verified
    against the unrolled-CTE DuckDB twin (``label_propagate_sql`` —
    the ``trade_pagerank`` device), bit-exact including the mass."""
    from dish_data_pipeline_spark.cache_registry import tracked_persist
    from dish_data_pipeline_spark.ops.graph import label_propagate

    # shared by the LSH pipeline, the blocking join, and the seed
    # scan — persist or the documents union executes 4×
    corpus = tracked_persist(_docs_with_dupes(spark, sf_dir))
    seeds = corpus.filter(F.col("doc_id") % LP_SEED_MOD == 0).select(
        F.col("doc_id").alias("node"), F.expr(LP_LANG_CASE).alias("label")
    )
    return label_propagate(_lp_edges(corpus), seeds, n_iter=3).select(
        F.col("node").alias("doc_id"), "label", "s_q", "score"
    )


def _sql_label_propagation() -> str:
    from dish_data_pipeline_spark.ops.graph import label_propagate_sql
    from dish_data_pipeline_spark.plans.oracle_dedup import (
        minhash_pipeline_ctes,
    )

    return (
        "WITH "
        + minhash_pipeline_ctes(SQL_DOCS_WITH_DUPES)
        + f""",
lpp AS (SELECT id_a, id_b FROM scored WHERE jaccard >= 0.8),
lpblk AS (
  SELECT source, n_chars // {LP_BLOCK_WIDTH} AS bkt, MIN(doc_id) AS hub
  FROM corpus GROUP BY 1, 2),
lpbm AS (
  SELECT b.hub AS src, c.doc_id AS dst
  FROM corpus c
  JOIN lpblk b ON b.source = c.source
              AND b.bkt = c.n_chars // {LP_BLOCK_WIDTH}
  WHERE c.doc_id <> b.hub),
lpe AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM lpp
  UNION SELECT id_b, id_a FROM lpp
  UNION SELECT src, dst FROM lpbm
  UNION SELECT dst, src FROM lpbm),
lpseed AS (
  SELECT doc_id AS node, {LP_LANG_CASE} AS label
  FROM corpus WHERE doc_id % {LP_SEED_MOD} = 0),
"""
        + label_propagate_sql("lpe", "lpseed", n_iter=3, node_out="doc_id")
    )




# --- Exact-integer Lloyd's k-means, driver-certified ---------------
def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certifies the k-means TRAINING loop itself (not just the
    assign/probe plumbing `knn_ivf` verifies): 3 Lloyd iterations
    over the embeddings corpus in exact integer-rational arithmetic
    (`ops.similarity.kmeans_exact_assignments` — quantized vectors,
    (sum, count) centroids, cross-multiplied rational comparisons),
    so the DuckDB twin can replay the identical trajectory as three
    unrolled CTE rounds (the `trade_pagerank` device). The oracle
    ranks candidates by the HUGEINT floor-scaled score
    ``dot·10^18 // N`` — exact as a discriminator because two
    distinct rationals dot_a/N_a != dot_b/N_b differ by at least
    1/(N_a·N_b) >= 1e-12, which the 10^18 scale maps to >= 10^6
    floor units, while Spark compares the same rationals by exact
    cross-multiplication — both therefore compute the true argmax.
    Output: per-cluster member count, member-id sum, and first-
    coordinate quantized sum — id_sum pins the full assignment
    vector, so one flipped membership anywhere in 3 rounds fails
    the hash."""
    from dish_data_pipeline_spark.ops.similarity import (
        kmeans_exact_assignments,
    )

    emb = read(spark, sf_dir, "embeddings")
    a = kmeans_exact_assignments(
        emb, n_centroids=8, n_iters=3, quant=1000
    )
    q0 = emb.select(
        "vec_id",
        F.expr(
            "CAST(floor(CAST(embedding[0] AS DOUBLE) * 1000) AS BIGINT)"
        ).alias("q0"),
    )
    return (
        a.join(q0, "vec_id")
        .groupBy("centroid_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("vec_id").cast("bigint").alias("id_sum"),
            F.sum("q0").cast("bigint").alias("q0_sum"),
        )
    )


def _sql_kmeans_prefix(
    n_iters: int = 3,
    k: int = 8,
    src: str = "SELECT vec_id, embedding FROM embeddings",
    k_expr: str | None = None,
) -> str:
    """Unrolled-CTE DuckDB replay of the exact k-means trajectory —
    one (dots -> argmax -> new sums -> carry-forward) block per
    iteration plus the final assignment CTE ``a{n_iters+1}``
    (vec_id, cid). Shared by `kmeans_clusters` and
    `semantic_dedup`; ``src`` parameterizes the corpus relation and
    ``k_expr`` (a SQL scalar expression, may reference ``src``)
    overrides the literal centroid count so scale-proportional
    dials stay bit-identical between engines at every scale."""
    k_sql = k_expr if k_expr is not None else str(k)
    sql = f"""
WITH src AS ({src}),
base AS (
  SELECT vec_id, i AS pos,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT)
           AS qv
  FROM src, range(1, 65) t(i)),
init AS (
  SELECT vec_id, rn - 1 AS cid FROM (
    SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
    FROM src) ranked
  WHERE rn <= ({k_sql})),
c0 AS (
  SELECT init.cid, base.pos, base.qv AS S, CAST(1 AS BIGINT) AS N
  FROM init JOIN base USING (vec_id))"""
    prev = "c0"
    for i in range(1, n_iters + 1):
        sql += f""",
d{i} AS (
  SELECT b.vec_id, c.cid, SUM(b.qv * c.S) AS dot, MAX(c.N) AS n
  FROM base b JOIN {prev} c USING (pos) GROUP BY 1, 2),
a{i} AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid, ROW_NUMBER() OVER (
      PARTITION BY vec_id
      ORDER BY (CAST(dot AS HUGEINT) * 1000000000000000000) // n
                 DESC,
               cid ASC) AS rn
    FROM d{i}) t WHERE rn = 1),
n{i} AS (
  SELECT a.cid, b.pos, SUM(b.qv) AS S, CAST(COUNT(*) AS BIGINT) AS N
  FROM a{i} a JOIN base b USING (vec_id) GROUP BY 1, 2),
c{i} AS (
  SELECT p.cid, p.pos, COALESCE(x.S, p.S) AS S,
         COALESCE(x.N, p.N) AS N
  FROM {prev} p LEFT JOIN n{i} x
    ON x.cid = p.cid AND x.pos = p.pos)"""
        prev = f"c{i}"
    f = n_iters + 1
    sql += f""",
d{f} AS (
  SELECT b.vec_id, c.cid, SUM(b.qv * c.S) AS dot, MAX(c.N) AS n
  FROM base b JOIN {prev} c USING (pos) GROUP BY 1, 2),
a{f} AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid, ROW_NUMBER() OVER (
      PARTITION BY vec_id
      ORDER BY (CAST(dot AS HUGEINT) * 1000000000000000000) // n
                 DESC,
               cid ASC) AS rn
    FROM d{f}) t WHERE rn = 1)"""
    return sql


def _sql_kmeans_clusters(n_iters: int = 3, k: int = 8) -> str:
    f = n_iters + 1
    return _sql_kmeans_prefix(n_iters, k) + f"""
SELECT a.cid AS centroid_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(a.vec_id) AS BIGINT) AS id_sum,
       CAST(SUM(b.qv) AS BIGINT) AS q0_sum
FROM a{f} a JOIN base b ON b.vec_id = a.vec_id AND b.pos = 1
GROUP BY 1
"""




SEMDEDUP_SRC_SQL = """SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id, embedding
  FROM embeddings WHERE vec_id % 10 = 0
  UNION ALL
  SELECT vec_id + 2000000 AS vec_id,
         list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(0.97 AS DOUBLE))
           AS embedding
  FROM embeddings WHERE vec_id % 10 = 5"""


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup end to end (`ops.similarity.semantic_dedup`):
    cluster-then-prune semantic deduplication at cos >= 0.9, in the
    same exact integer-rational arithmetic as `kmeans_clusters` so
    the oracle replays the identical trajectory. The raw embeddings
    are random (max pairwise cos ~0.51, measured), so near-dups are
    PLANTED: every vec_id % 10 == 0 vector re-enters verbatim
    (cos = 1 exactly, same quantized vector => provably same
    cluster) and every vec_id % 10 == 5 re-enters scaled by 0.97
    (parallel direction, cos ~ 1 after quantization). Planted
    copies carry higher ids, so the pairwise lowest-id-wins rule
    must drop exactly the copies (minus any whose scaled twin
    crossed a cluster boundary — the documented cluster-scoped
    recall trade, replicated identically by the oracle).

    n_centroids is the SemDeDup scale dial (cluster count ~
    corpus/target_cluster_size so each cluster's O(c²) block
    self-join stays executor-sized): ``max(8, n // 400)``. The SQL
    twin computes the SAME ``GREATEST(8, COUNT(*) // 400)`` from its
    own src relation, so the two engines stay bit-identical at every
    scale — at sf0.01 (n=240) and sf0.1 (n=2400) both resolve to
    k=8; at sf1.0 (n=24000) both resolve to k=60, ~7.5× fewer
    candidate pairs than fixed-k (which grew 45× for 10× data in
    the sf1.0 scaling probe)."""
    from dish_data_pipeline_spark.ops.similarity import semantic_dedup

    emb = read(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    exact = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    scaled = emb.filter(F.col("vec_id") % 10 == 5).select(
        (F.col("vec_id") + 2000000).alias("vec_id"),
        F.expr(
            "transform(embedding, "
            "x -> CAST(x AS DOUBLE) * CAST(0.97 AS DOUBLE))"
        ).alias("embedding"),
    )
    src = emb.unionByName(exact).unionByName(scaled)
    k = max(8, src.count() // 400)
    out = semantic_dedup(src, n_centroids=k, n_iters=3, quant=1000)
    return out.groupBy("centroid_id").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.col("kept").cast("bigint")).cast("bigint").alias("n_kept"),
        F.sum(F.when(F.col("kept"), F.col("vec_id")))
        .cast("bigint")
        .alias("kept_id_sum"),
    )


def _sql_semantic_dedup(n_iters: int = 3, k: int = 8) -> str:
    # Same scale dial as the Spark side (max(8, n // 400)), computed
    # IN the oracle so both engines stay bit-identical at every
    # scale, not just the sf<=0.1 range where the dial is inert.
    f = n_iters + 1
    k_expr = "SELECT GREATEST(8, COUNT(*) // 400) FROM src"
    return _sql_kmeans_prefix(
        n_iters, k, src=SEMDEDUP_SRC_SQL, k_expr=k_expr
    ) + f""",
qn AS (
  SELECT vec_id, SUM(qv * qv) AS n2 FROM base GROUP BY 1),
pairs AS (
  -- cluster-scoped pair enumeration FIRST (the SemDeDup semantics),
  -- so the oracle is O(sum cluster^2 * d) like the Spark side, not
  -- an all-pairs O(n^2 * d) dot table that spills at engaged-dial
  -- scales
  SELECT x.vec_id AS a_id, y.vec_id AS b_id
  FROM a{f} x JOIN a{f} y ON x.cid = y.cid AND x.vec_id < y.vec_id),
dots AS (
  SELECT p.a_id, p.b_id, SUM(ba.qv * bb.qv) AS dot
  FROM pairs p
  JOIN base ba ON ba.vec_id = p.a_id
  JOIN base bb ON bb.vec_id = p.b_id AND bb.pos = ba.pos
  GROUP BY 1, 2),
drops AS (
  SELECT DISTINCT d.b_id
  FROM dots d
  JOIN qn na ON na.vec_id = d.a_id
  JOIN qn nb ON nb.vec_id = d.b_id
  WHERE d.dot > 0
    AND 100 * d.dot * d.dot >= 81 * na.n2 * nb.n2)
SELECT t.cid AS centroid_id,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN dr.b_id IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN dr.b_id IS NULL THEN t.vec_id END)
            AS BIGINT) AS kept_id_sum
FROM a{f} t LEFT JOIN drops dr ON dr.b_id = t.vec_id
GROUP BY 1
"""


EXTENSION_QUERIES: dict[str, QueryDef] = {
    "embedding_covariance": QueryDef(
        q_embedding_covariance, SQL_EMBEDDING_COVARIANCE,
        "64x64 covariance matrix via Arrow-batched exact integer "
        "Gram accumulation (numpy int64 matmul partials)",
        ("linalg", "embedding", "agg")),
    "proximity_pairs": QueryDef(
        q_proximity_pairs, SQL_PROXIMITY_PAIRS,
        "planar proximity self-join via grid-cell banding (distance "
        "join as equi-join, exact BIGINT distances)",
        ("join", "spatial", "topk")),
    "bm25_search": QueryDef(
        q_bm25_search, _sql_bm25_search(),
        "BM25 top-20 retrieval (rational-idf surrogate, fixed-order "
        "score fold, distributed top-k)",
        ("text", "topk", "search")),
    "udtf_word_runs": QueryDef(
        q_udtf_word_runs, SQL_UDTF_WORD_RUNS,
        "Spark-4 Python UDTF (LATERAL table function): stateful "
        "word-run detection vs a gaps-and-islands SQL twin",
        ("udtf", "text", "functions")),
    "text_stats": QueryDef(
        q_text_stats, SQL_TEXT_STATS,
        "length/token/punctuation statistics", ("text",)),
    "token_stats": QueryDef(
        q_token_stats, SQL_TOKEN_STATS,
        "whitespace + BPE-ish pretokenizer counts", ("text",)),
    "winnow_fingerprint": QueryDef(
        q_winnow_fingerprint, sql_winnow_fingerprint(),
        "winnowing rolling-hash fingerprints (MOSS scheme)", ("text", "dedup")),
    "embedding_neardup": QueryDef(
        q_embedding_neardup,
        sql_embedding_neardup(SQL_EMBEDDING_NEARDUP_CORPUS),
        "embedding-cosine near-dup pairs (SRP-LSH blocked)",
        ("dedup", "similarity")),
    "language_id": QueryDef(
        q_language_id, _sql_language_id(),
        "stopword-marker language ID", ("text",)),
    "quality_score": QueryDef(
        q_quality_score, SQL_QUALITY_SCORE,
        "heuristic document quality score", ("text",)),
    "doc_fingerprint": QueryDef(
        q_doc_fingerprint, SQL_DOC_FINGERPRINT,
        "md5 document fingerprint", ("text", "dedup")),
    "exact_dedup": QueryDef(
        q_exact_dedup, SQL_EXACT_DEDUP,
        "exact hash-groupBy dedup", ("dedup",)),
    "minhash_neardup": QueryDef(
        q_minhash_neardup, sql_minhash_neardup(SQL_DOCS_WITH_DUPES),
        "MinHash-LSH near-dup pairs (banded, jaccard ≥ 0.8)", ("dedup", "lsh")),
    "simhash_neardup": QueryDef(
        q_simhash_neardup, sql_simhash_neardup(SQL_DOCS_WITH_DUPES),
        "SimHash near-dup pairs (hamming ≤ 3, recall-guaranteed bands)",
        ("dedup", "lsh")),
    "ngram_jaccard": QueryDef(
        q_ngram_jaccard, sql_ngram_jaccard(SQL_DOCS_WITH_DUPES),
        "n-gram Jaccard rescore of LSH candidates", ("dedup", "lsh")),
    "knn_bruteforce": QueryDef(
        q_knn_bruteforce, SQL_KNN_BRUTEFORCE,
        "exact cosine top-k over embeddings", ("similarity",)),
    "knn_pq": QueryDef(
        q_knn_pq, _sql_knn_pq(),
        "product-quantization ANN: frozen codebooks, exact encode + "
        "ADC oracle",
        ("similarity", "ann")),
    "knn_ivfpq": QueryDef(
        q_knn_ivfpq, _sql_knn_pq(),
        "IVF-PQ composition (exhaustive probing == plain PQ, shared "
        "oracle)",
        ("similarity", "ann")),
    "knn_quantized": QueryDef(
        q_knn_quantized, quantized_topk_sql(KNN_QUERY_IDS, k=10),
        "int8-quantized dot-product top-k, quantization oracle-exact",
        ("similarity", "quantization")),
    "knn_lsh": QueryDef(
        q_knn_lsh, sql_knn_lsh(KNN_QUERY_IDS),
        "sign-random-projection LSH ANN top-k", ("similarity", "lsh")),
    "semantic_dedup": QueryDef(
        q_semantic_dedup, _sql_semantic_dedup(),
        "SemDeDup: exact-kmeans cluster then cluster-scoped "
        "cos>=0.9 lowest-id-wins prune over planted copies",
        ("similarity", "dedup", "ml")),
    "kmeans_clusters": QueryDef(
        q_kmeans_clusters, _sql_kmeans_clusters(),
        "exact integer-rational Lloyd's k-means (3 rounds) vs "
        "unrolled-CTE trajectory replay; id_sum pins assignments",
        ("similarity", "ml", "iterative")),
    "knn_ivf": QueryDef(
        q_knn_ivf, SQL_KNN_BRUTEFORCE,
        "IVF ANN top-k (exhaustive probe ⇒ equals brute force)",
        ("similarity",)),
    "knn_rrf": QueryDef(
        q_knn_rrf, _sql_knn_rrf(),
        "reciprocal-rank fusion of the LSH and IVF candidate lists "
        "(hybrid retrieval)",
        ("similarity", "lsh")),
    "embedding_norms": QueryDef(
        q_embedding_norms, SQL_EMBEDDING_NORMS,
        "array math: exact L2 norms", ("similarity",)),
    "multimodal_meta": QueryDef(
        q_multimodal_meta, SQL_MULTIMODAL_META,
        "binary content + typed metadata columns", ("multimodal",)),
    "multimodal_features": QueryDef(
        q_multimodal_features, SQL_MULTIMODAL_FEATURES,
        "Arrow-batched mapInPandas feature extraction", ("multimodal",)),
    "dup_clusters": QueryDef(
        q_dup_clusters, sql_dup_clusters(SQL_DOCS_WITH_DUPES),
        "connected components over MinHash-LSH near-dup pairs",
        ("dedup", "iterative")),
    "best_of_cluster": QueryDef(
        q_best_of_cluster, sql_best_of_cluster(SQL_DOCS_WITH_DUPES),
        "quality-argmax canonical doc per near-dup cluster + size",
        ("dedup", "quality")),
    "training_corpus": QueryDef(
        q_training_corpus, sql_training_corpus(SQL_DOCS_WITH_DUPES),
        "composed corpus builder: quality gate → near-dup clusters → canonical docs",
        ("dedup", "text", "pipeline")),
    "doc_sample": QueryDef(
        q_doc_sample, _sql_doc_sample(),
        "deterministic stratified sampling (per-language keep rates)",
        ("sampling", "text")),
    "sequence_packing": QueryDef(
        q_sequence_packing, _sql_sequence_packing(),
        "token-budget sequence packing (bucketed, no global sort)",
        ("sampling", "text")),
    "domain_quota": QueryDef(
        q_domain_quota, SQL_DOMAIN_QUOTA,
        "per-domain document cap (WindowGroupLimit domain balancing)",
        ("sampling", "text", "window")),
    "corpus_drift": QueryDef(
        q_corpus_drift, SQL_CORPUS_DRIFT,
        "per-source token-distribution chi-square drift vs the corpus",
        ("text", "quality", "agg")),
    "bpe_pairs": QueryDef(
        q_bpe_pairs, SQL_BPE_PAIRS,
        "BPE tokenizer induction: corpus character-pair counts",
        ("text", "agg")),
    "bigram_lm": QueryDef(
        q_bigram_lm, SQL_BIGRAM_LM,
        "bigram LM counts with Kneser-Ney continuation counts",
        ("text", "agg", "topk")),
    "quality_weighted_sample": QueryDef(
        q_quality_weighted_sample, _sql_weighted_sample(),
        "per-row quality-weighted Bernoulli sampling (deterministic coin)",
        ("sampling", "text", "quality")),
    "part_triangles": QueryDef(
        q_part_triangles, SQL_PART_TRIANGLES,
        "triangle counts + clustering coefficients, part co-purchase graph",
        ("graph",)),
    "trade_pagerank": QueryDef(
        q_trade_pagerank, _sql_trade_pagerank(),
        "integer-quantized PageRank on the customer-supplier trade graph",
        ("graph", "iterative")),
    "trade_pagerank_directed": QueryDef(
        q_trade_pagerank_directed, _sql_trade_pagerank_directed(),
        "directed-graph PageRank with integer dangling-mass "
        "redistribution (suppliers are sinks)",
        ("graph", "iterative")),
    "trade_reach": QueryDef(
        q_trade_reach, _sql_trade_reach(),
        "multi-source BFS hop distance (blast radius <= 3) on the trade graph",
        ("graph", "iterative")),
    "substring_search": QueryDef(
        q_substring_search, SQL_SUBSTRING_SEARCH,
        "trigram-inverted-index substring search vs full-scan oracle",
        ("text", "index")),
    "supplier_triangles": QueryDef(
        q_supplier_triangles, SQL_SUPPLIER_TRIANGLES,
        "triangle count + clustering coefficient via oriented-edge "
        "wedge closure",
        ("graph", "agg")),
    "winsorized_prices": QueryDef(
        q_winsorized_prices, SQL_WINSORIZED_PRICES,
        "exact per-segment p5/p95 winsorization via nearest-rank "
        "window selection",
        ("quality", "agg")),
    "supplier_kcore": QueryDef(
        q_supplier_kcore, _sql_supplier_kcore(),
        "2-core peel of the mutual top-5 graph (unrolled-round "
        "iterative oracle)",
        ("graph", "iterative")),
    "part_entities": QueryDef(
        q_part_entities, _sql_part_entities(),
        "entity resolution: ED1 blocking -> connected components -> "
        "canonical spelling per entity",
        ("dedup", "join", "graph")),
    "join_overlap_estimate": QueryDef(
        q_join_overlap_estimate, _sql_join_overlap(),
        "KMV set-operation sketch: union/Jaccard/intersection of join keys",
        ("sketch", "join", "diagnostic")),
    "shard_plan": QueryDef(
        q_shard_plan, _sql_shard_plan(),
        "training-shard manifest: portable-hash assignment + mod-P digests",
        ("io", "sampling")),
    "doc_lm_score": QueryDef(
        q_doc_lm_score, SQL_DOC_LM_SCORE,
        "per-doc bigram-LM fluency score (log-free perplexity proxy)",
        ("text", "quality", "agg")),
    "bpe_merges": QueryDef(
        q_bpe_merges, _sql_bpe_merges(),
        "BPE merge loop: 8 iterative argmax-pair merges "
        "(unrolled-CTE list_reduce oracle)",
        ("text", "iterative")),
    "bpe_segment": QueryDef(
        q_bpe_segment, _sql_bpe_segment(),
        "BPE segmentation replay: fixed merge table as zero-shuffle "
        "nested folds",
        ("text",)),
    "dict_tag": QueryDef(
        q_dict_tag, _sql_dict_tag(),
        "Aho-Corasick dictionary tagging: K-phrase lexicon coverage "
        "in one automaton pass per doc, replace-trick oracle",
        ("text", "lexicon", "matching")),
    "quality_classifier": QueryDef(
        q_quality_classifier, _sql_quality_classifier(),
        "hashed bag-of-words linear quality gate (fastText-shape "
        "inference, frozen weights)",
        ("text", "quality")),
    "text_clean": QueryDef(
        q_text_clean, _sql_text_clean(),
        "text normalization: strip URLs/e-mails/control chars, collapse whitespace",
        ("text",)),
    "repetition_stats": QueryDef(
        q_repetition_stats, SQL_REPETITION_STATS,
        "Gopher repetition signals: top word bigram + char/dup fractions",
        ("text", "quality")),
    "corpus_datasheet": QueryDef(
        q_corpus_datasheet, SQL_CORPUS_DATASHEET,
        "per-(source, lang) data card: volumes, gopher pass, dup exposure",
        ("text", "agg")),
    "gopher_quality": QueryDef(
        q_gopher_quality, SQL_GOPHER_QUALITY,
        "Gopher/C4 quality gate: per-rule flags + keep bit",
        ("text", "quality")),
    "contamination": QueryDef(
        q_contamination, _sql_contamination(),
        "benchmark decontamination: hashed 5-gram collisions, broadcast semi-join",
        ("text", "dedup")),
    "corpus_mix": QueryDef(
        q_corpus_mix, _sql_corpus_mix(),
        "target-mixture sampling: rates derived in-plan from stratum counts",
        ("sampling", "text")),
    "temperature_mix": QueryDef(
        q_temperature_mix, _sql_temperature_mix(),
        "temperature-flattened mixture (alpha=0.5): keep rate "
        "proportional to sqrt(n)/n, quantized-exact hash coin",
        ("sampling", "text")),
    "corpus_mix_tokens": QueryDef(
        q_corpus_mix_tokens, _sql_corpus_mix_tokens(),
        "token-budgeted mixture: rates from per-stratum token sums",
        ("sampling", "text")),
    "incremental_dedup": QueryDef(
        q_incremental_dedup,
        sql_incremental_neardup(SQL_NEW_BATCH, "SELECT * FROM documents"),
        "incremental ingest dedup: band-bucket probe vs existing corpus",
        ("dedup", "lsh")),
    "segment_dedup": QueryDef(
        q_segment_dedup, _sql_segment_dedup(),
        "segment-level exact dedup: strip cross-doc duplicate token chunks",
        ("dedup", "text")),
    "lsh_quality": QueryDef(
        q_lsh_quality,
        sql_lsh_quality(
            f"SELECT * FROM ({SQL_DOCS_WITH_DUPES}) WHERE {LSH_EVAL_FILTER}"
        ),
        "LSH tuning harness: candidate precision/recall vs exact truth",
        ("dedup", "lsh", "quality")),
    "pii_redaction": QueryDef(
        q_pii_redaction, _sql_pii_redaction(),
        "PII redaction: e-mail/IP/phone placeholders + audit counts",
        ("text", "quality")),
    "distinct_sketch": QueryDef(
        q_distinct_sketch, _sql_distinct_sketch(),
        "KMV distinct-count sketch, estimate bit-identical to oracle",
        ("sketch", "text")),
    "hll_distinct": QueryDef(
        q_hll_distinct, _sql_hll_distinct(),
        "HyperLogLog distinct sketch (dyadic-BIGINT harmonic sum, "
        "estimate hash-exact)",
        ("sketch", "text")),
    "jaccard_simjoin": QueryDef(
        q_jaccard_simjoin, _sql_jaccard_simjoin(),
        "exact prefix-filtered Jaccard join vs brute-force all-pairs "
        "oracle",
        ("dedup", "join", "text")),
    "fuzzy_part_match": QueryDef(
        q_fuzzy_part_match, _sql_fuzzy_part_match(),
        "edit-distance-1 key match via deletion neighborhoods vs "
        "brute-force levenshtein",
        ("dedup", "join")),
    "containment_pairs": QueryDef(
        q_containment_pairs, _sql_containment_pairs(),
        "asymmetric set containment (quote detection) vs brute-force "
        "ordered-pairs oracle",
        ("dedup", "join", "text")),
    "corpus_pipeline": QueryDef(
        q_corpus_pipeline, _sql_corpus_pipeline(),
        "composed flow: quality gate -> decontaminate -> mixture sample",
        ("text", "sampling", "dedup")),
    "sketch_merge": QueryDef(
        q_sketch_merge, _sql_sketch_merge(),
        "mergeable KMV: per-partition sketches -> global estimate",
        ("sketch", "text")),
    "cms_topk": QueryDef(
        q_cms_topk, _sql_cms_topk(),
        "count-min-sketch heavy-hitter counts, bit-identical to oracle",
        ("sketch", "text")),
    "zipf_buckets": QueryDef(
        q_zipf_buckets, SQL_ZIPF_BUCKETS,
        "token frequency-of-frequency (Zipf) distribution per language",
        ("text", "agg")),
    "approx_quantiles": QueryDef(
        q_approx_quantiles, _sql_approx_quantiles(),
        "histogram-sketch quantiles: bounded mergeable state",
        ("sketch", "agg")),
    "dup_ngram_coverage": QueryDef(
        q_dup_ngram_coverage,
        sql_dup_ngram_coverage(SQL_DOCS_WITH_DUPES),
        "cross-doc duplicate 5-gram coverage (Lee et al. 2022 diagnostic)",
        ("text", "dedup")),
    "vocab_topk": QueryDef(
        q_vocab_topk, SQL_VOCAB_TOPK,
        "top-100 vocabulary with term + document frequency",
        ("text",)),
    "tfidf_topterms": QueryDef(
        q_tfidf_topterms, SQL_TFIDF_TOPTERMS,
        "top-3 TF-IDF terms per doc (exact rational idf surrogate)",
        ("text",)),
    "doc_chunks": QueryDef(
        q_doc_chunks, _sql_doc_chunks(),
        "fixed-token chunking with overlap (zero-shuffle map-side)",
        ("text", "sampling")),
    "embedding_dedup": QueryDef(
        q_embedding_dedup,
        sql_embedding_dedup(SQL_EMBEDDING_NEARDUP_CORPUS),
        "SemDeDup shape: SRP blocks -> cosine gate -> CC -> canonical",
        ("embedding", "dedup")),
    "bloom_decontaminate": QueryDef(
        q_bloom_decontaminate, _sql_bloom_decontaminate(),
        "fixed-size Bloom pre-filter for decontamination, filter "
        "bit-identical to oracle incl. false positives",
        ("sketch", "dedup", "text")),
    "zorder_extents": QueryDef(
        q_zorder_extents, _sql_zorder_extents(),
        "Z-order layout manifest: Morton-bucket min/max rectangles "
        "for two-dimensional file skipping",
        ("layout", "agg")),
    "leakage_split": QueryDef(
        q_leakage_split, _sql_leakage_split(),
        "leakage-safe train/val/test split: near-dup clusters "
        "co-assigned by salted cluster hash",
        ("sampling", "dedup")),
    "dup_span_mask": QueryDef(
        q_dup_span_mask, _sql_dup_span_mask(),
        "span-level dedup: cross-doc duplicated 5-gram spans deleted "
        "from the rewritten text (Lee et al. 2022 shape)",
        ("dedup", "text")),
    "collocation_lift": QueryDef(
        q_collocation_lift, SQL_COLLOCATION_LIFT,
        "top-50 collocations by lift (log-free PMI surrogate, "
        "hash-exact)",
        ("text", "agg")),
    "quality_calibration": QueryDef(
        q_quality_calibration, SQL_QUALITY_CALIBRATION,
        "per-language percentile-rank calibration of a raw quality "
        "signal",
        ("text", "quality")),
    "label_centroid_sim": QueryDef(
        q_label_centroid_sim, SQL_LABEL_CENTROID_SIM,
        "per-label embedding centroids + pairwise centroid cosine "
        "(embedding-space drift)",
        ("embedding", "agg")),
    "label_propagation": QueryDef(
        q_label_propagation, _sql_label_propagation(),
        "clamped-seed integer label propagation over the near-dup + "
        "blocking graph (semi-supervised weak labels, mass-exact)",
        ("graph", "dedup", "quality")),
    "hll_windows": QueryDef(
        q_hll_windows, _sql_hll_windows(),
        "trailing-7-day distinct users from merged daily HLL "
        "registers (sketch-merge over windows, estimate hash-exact)",
        ("sketch", "timeseries")),
}
