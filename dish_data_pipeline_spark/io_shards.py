"""Training-shard exporter: the last step of a training-data
pipeline — write the prepared corpus as a deterministic, balanced,
pseudo-randomly shuffled shard layout a training job can consume,
plus a manifest recording what each shard holds.

Design (Spark-first, 100 TB posture):

- **Deterministic shuffle as a feature.** Training wants examples in
  random order, reproducibly. Shard assignment is
  ``pmod(xxhash64(seed, key), n_shards)`` and the within-shard order
  is (hash, key) — a seeded permutation computed map-side, no global
  sort, no single-partition window (the classic ``row_number()``
  global-order exporter serializes the entire corpus through one
  task; this never does).
- **One exchange total**: rows move once, straight to their shard's
  writer (``repartition(n_shards, shard)`` + partitionBy). A hash
  collision between shard ids in one task partition just means that
  task writes two shard directories — layout is still exactly one
  directory per shard, each internally sorted.
- **Manifest from the data, not the filesystem**: per-shard row
  counts and an order-independent content digest (XOR-free exact
  BIGINT sum of row hashes) — enough for a consumer to verify a
  shard without re-reading the corpus, and identical across reruns
  by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dish_data_pipeline_spark.ops.portable import P as _DIGEST_MOD
from dish_data_pipeline_spark.ops.portable import spark_phash

SHARD_COL = "shard"


def with_shard_assignment(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    seed: int = 0,
    portable: bool = False,
) -> DataFrame:
    """Add the deterministic shard id (``pmod(hash(seed, key),
    n_shards)``) and the within-shard shuffle key.

    ``portable=False`` (production) hashes with ``xxhash64``;
    ``portable=True`` uses the ``ops.portable`` 60-bit md5 hash,
    whose DuckDB spelling is bit-identical — that is what lets the
    shard plan be verified value-exactly against the SQL oracle
    (catalog query ``shard_plan``). Same layout semantics either
    way; the portable hash costs ~2-3× on the hash step only."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if key_col not in df.columns:
        raise ValueError(f"key column {key_col!r} absent from input")
    taken = {SHARD_COL, "_order"} & set(df.columns)
    if taken:  # withColumn would silently overwrite user data
        raise ValueError(
            f"input already has column(s) {sorted(taken)} — rename them "
            "before sharding"
        )
    if portable:
        h = F.expr(
            spark_phash(f"concat('{int(seed)}:', cast({key_col} as string))")
        )
    else:
        h = F.xxhash64(F.lit(int(seed)), F.col(key_col))
    return df.withColumn(SHARD_COL, F.pmod(h, F.lit(int(n_shards)))).withColumn(
        "_order", h
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    seed: int = 0,
) -> None:
    """Write ``path/shard=K/`` parquet directories: deterministic
    seeded shuffle, one directory per shard, rows sorted by
    (hash, key) within each shard."""
    assigned = with_shard_assignment(df, key_col, n_shards, seed)
    (
        assigned.repartition(int(n_shards), SHARD_COL)
        .sortWithinPartitions(SHARD_COL, "_order", key_col)
        .drop("_order")
        .write.mode("overwrite")
        .partitionBy(SHARD_COL)
        .parquet(path)
    )


def shard_manifest(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    seed: int = 0,
    portable: bool = False,
) -> DataFrame:
    """The manifest the export above implies, computed from the data
    itself: per shard, row count and an order-independent content
    digest — the exact BIGINT sum of ``hash mod P`` (P = 2³¹−1)
    per row, associative so Spark's partial-aggregation order cannot
    change it, and bounded so the sum cannot overflow BIGINT below
    ~4×10⁹ rows per shard (a raw 64-bit-hash sum would wrap silently
    under non-ANSI and THROW under ANSI). Rerunning on identical
    input yields an identical manifest; a consumer re-derives a
    shard's digest after download and compares."""
    assigned = with_shard_assignment(df, key_col, n_shards, seed, portable)
    return assigned.groupBy(SHARD_COL).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.pmod(F.col("_order"), F.lit(_DIGEST_MOD)))
        .cast("bigint")
        .alias("content_digest"),
    )


def read_shard(spark: SparkSession, path: str, shard: int) -> DataFrame:
    """Read one shard back (partition-pruned scan — only that shard's
    directory is listed/read)."""
    return spark.read.parquet(path).filter(F.col(SHARD_COL) == int(shard))
