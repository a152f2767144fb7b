"""Exact and near-duplicate detection for document corpora.

Pipeline-shapes (all shuffle-bounded, SURVEY.md §7.4.6):

- exact: md5/sha2 content hash → groupBy hash (map-side combine).
- MinHash + LSH: token shingles → n minhash values (deterministic
  xxhash64 permutations) → band buckets → candidate pairs only
  within buckets (never all-pairs) → optional exact Jaccard rescore.
- SimHash: per-token 64-bit hashes folded into a sign-vector
  fingerprint; near-dups share banded fingerprint halves.

Everything is built from JVM-side higher-order functions
(``transform``/``aggregate``/``xxhash64``) — no Python in the hot
path, fully deterministic (fixed seeds), so results are reproducible
across runs and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
    seeded hash. Deterministic for a fixed seed.

    Cost shape: each shingle STRING is hashed once (the expensive
    part, O(len)); the n_hashes permutations then re-hash that
    64-bit value (O(1) each) — n× cheaper than hashing the string
    n times, same min-wise-independence quality."""
    base = df.withColumn(
        "_h", F.expr("transform(shingles, s -> xxhash64(s))")
    )
    sig = F.array(
        *[
            F.expr(f"array_min(transform(_h, x -> xxhash64(x, {seed + i})))")
            for i in range(n_hashes)
        ]
    )
    return base.withColumn("minhash", sig).drop("_h")


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
    banded = df.select(
        F.col(id_col).alias("_id"),
        F.col("minhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.xxhash64(
                            F.expr(
                                f"slice(minhash, {b * rows_per_band + 1}, {rows_per_band})"
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("_id", "minhash", "band.band_id", "band.band_hash")

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
        .withColumn(
            "jaccard",
            F.expr(
                "CAST(size(array_intersect(sh_a, sh_b)) AS DOUBLE) / "
                "CAST(size(array_union(sh_a, sh_b)) AS DOUBLE)"
            ),
        )
        .drop("sh_a", "sh_b")
    )
    return out


def with_simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 48) -> DataFrame:
    """SimHash fingerprint: per-token xxhash64, fold sign counts per
    bit, sign → bit.

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
        f"'{TOKEN_RE}', 0)), t -> xxhash64(t))"
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
    bits: int = 48,
    band_bits: int = 16,
) -> DataFrame:
    """Near-dup candidates: docs sharing any 16-bit simhash band
    (pigeonhole: hamming ≤ bands-1 guarantees a shared band).
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
