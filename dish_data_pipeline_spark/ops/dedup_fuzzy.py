"""Exact and near-duplicate detection for document corpora.

Pipeline-shapes (all shuffle-bounded, SURVEY.md §7.4.6):

- exact: md5/sha2 content hash → groupBy hash (map-side combine).
- MinHash + LSH: token shingles → n minhash values (universal-hash
  permutations of a portable 60-bit hash) → band buckets → candidate
  pairs only within buckets (never all-pairs) → optional exact
  Jaccard rescore.
- SimHash: per-token 60-bit hashes folded into a sign-vector
  fingerprint; candidates share one of 4 × 15-bit fingerprint bands,
  which by pigeonhole GUARANTEES recall for hamming ≤ 3 (one flipped
  bit can dirty at most one band; 3 flips leave ≥ 1 of 4 bands
  clean). At larger corpora, grow the fingerprint (two 60-bit
  hashes → 120 bits, 4 × 30-bit bands) rather than shrinking bands:
  band width controls bucket count (2^15 = 32768 per band here),
  band COUNT minus one is the guaranteed hamming radius.

Everything is built from JVM-side higher-order functions
(``transform``/``aggregate`` over ``ops.portable`` hashes) — no
Python in the hot path, fully deterministic, so results are
reproducible across runs, engines (the DuckDB oracles replicate
these pipelines exactly), and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dish_data_pipeline_spark.cache_registry import tracked_persist
from dish_data_pipeline_spark.ops.portable import perm_coeffs, perm_expr, spark_phash
from dish_data_pipeline_spark.ops.text import TOKEN_RE


def with_exact_hash(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("content_hash", F.md5(F.col(text_col)))


def exact_dedup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per distinct content: hash, copy count, canonical
    (minimum) id. ``n_copies > 1`` rows are the duplicate groups."""
    return (
        with_exact_hash(df, text_col)
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(F.col(id_col)).alias("canonical_id"),
        )
    )


def with_shingles(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct n-token shingles per document (token = [A-Za-z0-9]+).

    Implemented as tokens → sliding join of n consecutive tokens via
    ``transform`` over indices — pure SQL expressions.
    """
    tokens = F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), 0)
    df = df.withColumn("_tokens", tokens)
    shingle_expr = (
        f"array_distinct(CASE WHEN size(_tokens) < {n} THEN array(array_join(_tokens, ' ')) "
        f"ELSE transform(sequence(0, size(_tokens) - {n}), "
        f"i -> array_join(slice(_tokens, i + 1, {n}), ' ')) END)"
    )
    return df.withColumn("shingles", F.expr(shingle_expr)).drop("_tokens")


def with_minhash(df: DataFrame, n_hashes: int = 16, seed: int = 42) -> DataFrame:
    """MinHash signature: permutation i = min over shingles of a
    universal hash ``((phash(s) % P) * a_i + b_i) % P``.

    Cost shape: each shingle STRING is hashed once (the expensive
    part, O(len)); the n_hashes permutations then remix that 60-bit
    value (O(1) integer ops each) — n× cheaper than hashing the
    string n times, same min-wise-independence quality. The hash is
    ``ops.portable`` so the DuckDB oracle computes the identical
    signature."""
    base = df.withColumn(
        "_ph", F.expr(f"transform(shingles, s -> {spark_phash('s')})")
    )
    sig = F.array(
        *[
            F.expr(f"array_min(transform(_ph, x -> {perm_expr('x', a, b)}))")
            for a, b in perm_coeffs(n_hashes, seed)
        ]
    )
    return base.withColumn("minhash", sig).drop("_ph")


def with_band_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    bands: int = 4,
    rows_per_band: int = 4,
) -> DataFrame:
    """Banded LSH relation: one row per (doc, band) with the band's
    bucket hash — ``(_id, minhash, band_id, band_hash)``. The band
    hash is the portable 60-bit hash of the dash-joined band values,
    so the DuckDB oracle reproduces the exact buckets. Map-side only;
    this is the relation a 100 TB pipeline persists as its signature
    table."""
    band_str = (
        f"array_join(transform(slice(minhash, {{start}}, {rows_per_band}), "
        "x -> cast(x as string)), '-')"
    )
    return df.select(
        F.col(id_col).alias("_id"),
        F.col("minhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.expr(
                            spark_phash(band_str.format(start=b * rows_per_band + 1))
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("_id", "minhash", "band.band_id", "band.band_hash")


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    bands: int = 4,
    rows_per_band: int = 4,
) -> DataFrame:
    """LSH banding: docs sharing any band bucket become candidate
    pairs; estimated Jaccard = fraction of matching minhashes.

    The band join is a plain equi-join on (band_id, band_hash) —
    shuffle partitions by bucket, no all-pairs blowup. Output:
    (id_a < id_b, est_jaccard).
    """
    banded = with_band_buckets(df, id_col, bands, rows_per_band)
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.expr(
                "CAST(size(filter(zip_with(a.minhash, b.minhash, (x, y) -> x = y), "
                "v -> v)) AS DOUBLE) / CAST(size(a.minhash) AS DOUBLE)"
            ).alias("est_jaccard"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs


def incremental_neardup_filter(
    new: DataFrame,
    existing: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    seed: int = 42,
    shingle_n: int = 3,
    bands: int = 4,
    rows_per_band: int = 4,
) -> DataFrame:
    """Incremental ingestion dedup: drop NEW-batch docs that are
    exact or near-duplicates of the EXISTING corpus (share any
    MinHash band bucket — the same collision rule as
    ``minhash_candidate_pairs``, so recall matches the batch
    pipeline). Returns the surviving ``new`` rows unchanged.

    Scale shape: both sides reduce to their banded bucket relations
    map-side; the existing side ships only DISTINCT
    ``(band_id, band_hash)`` keys — at 100 TB that signature table is
    precomputed once per corpus version and reused every ingest, so
    each incremental batch costs one bucket equi-join against keys,
    never a rescan of corpus text and never an all-pairs comparison.
    Within-batch duplicates are left to the batch operators
    (``minhash_candidate_pairs`` on the survivors).
    """

    def banded(df: DataFrame) -> DataFrame:
        return with_band_buckets(
            with_minhash(with_shingles(df, text_col, shingle_n), n_hashes, seed),
            id_col,
            bands,
            rows_per_band,
        )

    new_bands = banded(new).select("_id", "band_id", "band_hash")
    existing_keys = banded(existing).select("band_id", "band_hash").distinct()
    hit_ids = (
        new_bands.join(existing_keys, ["band_id", "band_hash"], "left_semi")
        .select(F.col("_id").alias(id_col))
        .distinct()
    )
    return new.join(hit_ids, id_col, "left_anti")


# One definition of exact shingle Jaccard over (sh_a, sh_b) columns,
# shared by the rescorer and the evaluation harness (the DuckDB
# oracle's list_filter/list_contains formula is its twin).
JACCARD_SQL = (
    "CAST(size(array_intersect(sh_a, sh_b)) AS DOUBLE) / "
    "CAST(size(array_union(sh_a, sh_b)) AS DOUBLE)"
)


def lsh_quality_metrics(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    n_hashes: int = 16,
    seed: int = 42,
    shingle_n: int = 3,
    bands: int = 4,
    rows_per_band: int = 4,
) -> DataFrame:
    """Evaluation harness: precision/recall of the banded-LSH
    candidate set against exact all-pairs shingle-Jaccard truth at
    ``threshold``. Returns ONE row: ``(n_candidates, n_true_pairs,
    true_positives, precision, recall)``.

    The truth side is a deliberate O(N²) rescore — this is the
    "measure, don't guess" tool you run on a SAMPLE to tune
    ``(bands, rows_per_band)`` against a target recall before a
    production pass (the theoretical S-curve ``1-(1-s^r)^b`` tells
    you where to look; this measures where you actually are on your
    corpus). Never run it on the full corpus.

    An empty candidate or truth set yields precision/recall 1.0 (no
    false positives / nothing to find), so a clean sample reads as a
    pass, not a NULL, in a tuning loop. The shingle relation feeds
    the candidate pipeline and both truth sides — persisted
    (MEMORY_AND_DISK, LRU-evictable after the caller's action, the
    ``srp_block_pairs`` convention)."""
    sh = tracked_persist(
        with_shingles(df, text_col, shingle_n).select(F.col(id_col), "shingles")
    )
    cand = minhash_candidate_pairs(
        with_minhash(sh, n_hashes, seed), id_col, bands, rows_per_band
    ).select("id_a", "id_b")
    a = sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    truth = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("_j", F.expr(JACCARD_SQL))
        .filter(F.col("_j") >= threshold)
        .select("id_a", "id_b")
    )
    tp = cand.join(truth, ["id_a", "id_b"], "left_semi")
    m = (
        cand.agg(F.count(F.lit(1)).alias("n_candidates"))
        .crossJoin(truth.agg(F.count(F.lit(1)).alias("n_true_pairs")))
        .crossJoin(tp.agg(F.count(F.lit(1)).alias("true_positives")))
    )
    return m.select(
        "n_candidates",
        "n_true_pairs",
        "true_positives",
        F.expr(
            "CASE WHEN n_candidates = 0 THEN CAST(1.0 AS DOUBLE) "
            "ELSE CAST(true_positives AS DOUBLE) / n_candidates END"
        ).alias("precision"),
        F.expr(
            "CASE WHEN n_true_pairs = 0 THEN CAST(1.0 AS DOUBLE) "
            "ELSE CAST(true_positives AS DOUBLE) / n_true_pairs END"
        ).alias("recall"),
    )


def exact_jaccard_pairs(
    shingled: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Rescore candidate pairs with exact shingle Jaccard."""
    sh = shingled.select(F.col(id_col).alias("_jid"), F.col("shingles"))
    out = (
        pairs.join(sh.withColumnRenamed("shingles", "sh_a"), pairs.id_a == F.col("_jid"))
        .drop("_jid")
        .join(sh.withColumnRenamed("shingles", "sh_b"), pairs.id_b == F.col("_jid"))
        .drop("_jid")
        .withColumn("jaccard", F.expr(JACCARD_SQL))
        .drop("sh_a", "sh_b")
    )
    return out


def with_simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 60) -> DataFrame:
    """SimHash fingerprint: per-token portable 60-bit hash, fold sign
    counts per bit, sign → bit.

    Implemented as pure per-row higher-order expressions (token
    hashes computed once, then one ``aggregate`` fold per bit) —
    ZERO shuffles: every fingerprint is computed map-side where the
    document already lives, which is the property that matters at
    100 TB (an explode/groupBy formulation costs a full shuffle of
    the tokenized corpus and measured ~1.5× slower at sf0.1).
    Note: ``shiftright()`` not ``>>`` — Spark's lambda parser does
    not accept the operator form inside higher-order functions.
    """
    hashes = (
        f"transform(array_distinct(regexp_extract_all(`{text_col}`, "
        f"'{TOKEN_RE}', 0)), t -> {spark_phash('t')})"
    )
    bit_sums = ", ".join(
        f"aggregate(_h, 0, (acc, h) -> acc + "
        f"CASE WHEN (shiftright(h, {j}) & 1) = 1 THEN 1 ELSE -1 END)"
        for j in range(bits)
    )
    pack = (
        "aggregate(array("
        + ", ".join(
            f"CASE WHEN _b[{j}] >= 0 THEN CAST({2**j} AS BIGINT) "
            "ELSE CAST(0 AS BIGINT) END"
            for j in range(bits)
        )
        + "), CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    return (
        df.withColumn("_h", F.expr(hashes))
        .withColumn("_b", F.expr(f"array({bit_sums})"))
        .withColumn("simhash", F.expr(pack))
        .drop("_h", "_b")
    )


def simhash_near_pairs(
    df_with_simhash: DataFrame,
    id_col: str = "doc_id",
    bits: int = 60,
    band_bits: int = 15,
) -> DataFrame:
    """Near-dup candidates: docs sharing any of the 4 × 15-bit
    simhash bands. Pigeonhole: hamming ≤ bands-1 = 3 GUARANTEES a
    shared band, so a downstream ``hamming <= 3`` filter sees every
    qualifying pair (the round-1 geometry, 3 × 16-bit bands, only
    guaranteed hamming ≤ 2 and silently missed hamming-3 pairs).
    Output pairs with exact hamming distance."""
    n_bands = bits // band_bits
    mask = (1 << band_bits) - 1
    banded = df_with_simhash.select(
        F.col(id_col).alias("_id"),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.expr(f"(simhash >> {b * band_bits}) & {mask}").alias(
                            "band_val"
                        ),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("_id", "simhash", "band.band_id", "band.band_val")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def cross_doc_ngram_coverage(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    hot_df_threshold: int = 1000,
) -> DataFrame:
    """Per-document duplicate n-gram coverage: the fraction of a
    doc's distinct n-gram shingles that also occur in at least one
    OTHER document — the corpus-level duplication diagnostic from
    Lee et al., "Deduplicating Training Data Makes Language Models
    Better" (2022), used to decide whether fuzzy dedup is worth
    running and to audit its effect afterwards.

    Shape for 100 TB: shingles are hashed to the portable 60-bit
    value BEFORE any shuffle, so every keyed step works on a
    fixed-width long, never the raw n-gram string. Doc frequency is
    a groupBy-count (map-side partial aggregation collapses even a
    corpus-wide boilerplate shingle to one row per input
    partition), and the frequency rejoin uses the two-path hot-key
    pattern rather than trusting the optimizer: AQE's skew split
    only rewrites a join whose BOTH children are direct shuffle
    stages, and the frequency side here sits behind its own
    aggregate, so the hot shingle's reducer could never be split
    (verified: OptimizeSkewedJoin never fires on this shape; a
    COUNT window would be strictly worse — one unsplittable task).
    Instead, keys with document frequency >= ``hot_df_threshold``
    are broadcast and their rows map-side-joined (never shuffled);
    only cold keys take the shuffle join, which is skew-free by
    construction. The broadcast side is bounded by the same
    invariant that makes the pattern safe at any scale: at most
    total_shingle_rows / hot_df_threshold keys can be hot. The
    hashed relation is persisted so the expensive (regexp tokenize
    + md5 per shingle) pipeline feeds both paths from one
    computation — MEMORY_AND_DISK, LRU-evictable after the action,
    same convention as the SRP signature relation; a 100 TB run
    would checkpoint it. The per-doc rollup is one more keyed
    shuffle — no all-pairs step anywhere. Returns (id_col,
    n_ngrams, n_dup_ngrams, dup_coverage); the ratio is one IEEE
    division of exact BIGINT counts, so it is partitioning-
    invariant and oracle-comparable.
    """
    doc_shingle = (
        with_shingles(df.select(id_col, text_col), text_col, n)
        .select(F.col(id_col), F.explode("shingles").alias("_s"))
        # shingles are already distinct per doc (with_shingles), so
        # each (doc, hash) row is unique and COUNT(*) per hash below
        # is exactly the shingle's document frequency.
        .withColumn("_h", F.expr(spark_phash("_s")))
        .select(id_col, "_h")
    )
    doc_shingle = tracked_persist(doc_shingle)
    freq = doc_shingle.groupBy("_h").agg(F.count("*").alias("_df"))
    hot = F.broadcast(freq.filter(F.col("_df") >= hot_df_threshold))
    hot_rows = doc_shingle.join(hot, "_h")
    cold_rows = doc_shingle.join(
        hot.select("_h"), "_h", "left_anti"
    ).join(freq.filter(F.col("_df") < hot_df_threshold), "_h")
    return (
        hot_rows.unionByName(cold_rows)
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_ngrams"),
            F.count(F.when(F.col("_df") >= 2, 1))
            .cast("bigint")
            .alias("n_dup_ngrams"),
        )
        .withColumn(
            "dup_coverage",
            F.col("n_dup_ngrams").cast("double") / F.col("n_ngrams"),
        )
    )
