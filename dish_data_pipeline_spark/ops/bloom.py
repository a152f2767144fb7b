"""Portable Bloom filter: build a bit-set over hashed elements, probe
membership — the classic broadcast pre-filter for 100 TB semi-joins
(Bloom, CACM 1970; the same device Spark's own runtime row-level
filtering uses for shuffle pruning).

Why it earns a place next to the exact broadcast semi-join
(``ops/contamination.py``): the exact gram set of a benchmark is
unbounded state (every distinct gram hash), but the Bloom filter is
FIXED-SIZE regardless of how many elements went in — ``n_words``
63-bit words, chosen once from the expected cardinality and target
false-positive rate. At 100 TB the filter for a billion-gram
reference set at 1% FP is a few GiB of bigints that broadcast to
every executor; probing is then map-side bit arithmetic with zero
shuffle of the corpus. False positives only ever ADD candidates, so
the standard composition is bloom-probe (cheap, map-side) → exact
verify of the survivors (the existing semi-join) — the filter cuts
the verify join's probe side by (1 − selectivity − FP).

Determinism contract: every bit index derives from the 60-bit
portable md5 hash (``ops.portable``) pushed through the same
universal-hash permutations both engines evaluate in exact int64
arithmetic, so the DuckDB oracle replicates the filter BIT FOR BIT —
including its false positives. Word layout uses 63 bits per word
(bit 63 never set): DuckDB raises on ``1::BIGINT << 63`` and the
sign bit would change ``bit_or`` semantics in neither engine but
readability in both.

Scale shape: build = map-side explode of k (word, mask) pairs per
element, one ``bit_or`` aggregation over at most ``n_words`` groups
(bounded model state, like k-means centroids). Probe = map-side
explode of the same k pairs joined against the ≤ ``n_words``-row
filter relation — Spark broadcasts it — then one per-element AND
fold. The corpus never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dish_data_pipeline_spark.ops.portable import perm_coeffs

BITS_PER_WORD = 63  # DuckDB overflows on 1<<63; stay under the sign bit

#: Mersenne modulus of the universal hash family (ops.portable.P).
from dish_data_pipeline_spark.ops.portable import P as _P


def bloom_coeffs(n_hashes: int, seed: int = 7) -> list[tuple[int, int]]:
    """The k (a, b) permutation pairs — fixed by seed so Spark, DuckDB
    and Python all see the same hash family."""
    return perm_coeffs(n_hashes, seed=seed)


def _bit_exprs(
    h_expr: str, n_words: int, coeffs: list[tuple[int, int]], idiv: str
) -> list[tuple[str, str]]:
    """Per hash i: (word_expr, bit_in_word_expr) SQL fragments over
    ``h_expr``. All-integer arithmetic — identical semantics in both
    engines; only the integer-division spelling differs (Spark
    ``div``, DuckDB ``//``), so callers pass ``idiv``."""
    n_bits = n_words * BITS_PER_WORD
    out = []
    for a, b in coeffs:
        bit = f"(((({h_expr}) % {_P}) * {a} + {b}) % {_P}) % {n_bits}"
        out.append(
            (f"({bit}) {idiv} {BITS_PER_WORD}", f"({bit}) % {BITS_PER_WORD}")
        )
    return out


def bloom_build(
    elems: DataFrame,
    hash_col: str = "elem_hash",
    n_words: int = 1024,
    n_hashes: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Aggregate a Bloom filter over ``elems[hash_col]`` (60-bit
    portable hashes). Returns the sparse filter relation
    ``(word bigint, bits bigint)`` — at most ``n_words`` rows, words
    with no bits set are absent (probe treats absent as zero)."""
    pairs = _bit_exprs(hash_col, n_words, bloom_coeffs(n_hashes, seed), "div")
    struct_sql = ", ".join(
        f"struct(CAST({w} AS BIGINT) AS word, "
        f"shiftleft(CAST(1 AS BIGINT), CAST({b} AS INT)) AS mask)"
        for w, b in pairs
    )
    return (
        elems.select(F.expr(f"explode(array({struct_sql}))").alias("_wb"))
        .select("_wb.word", "_wb.mask")
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )


def bloom_probe_hits(
    probes: DataFrame,
    bloom: DataFrame,
    key_cols: list[str],
    hash_col: str = "elem_hash",
    n_words: int = 1024,
    n_hashes: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Per probe row: ``member`` = 1 iff every hash bit is set in the
    filter (Bloom-positive — true hit or deterministic false
    positive). ``key_cols`` must uniquely identify probe rows so
    multiplicity survives the bit-fold aggregation."""
    pairs = _bit_exprs(hash_col, n_words, bloom_coeffs(n_hashes, seed), "div")
    struct_sql = ", ".join(
        f"struct(CAST({w} AS BIGINT) AS word, "
        f"shiftleft(CAST(1 AS BIGINT), CAST({b} AS INT)) AS mask)"
        for w, b in pairs
    )
    exploded = probes.select(
        *key_cols, F.expr(f"explode(array({struct_sql}))").alias("_wb")
    ).select(*key_cols, "_wb.word", "_wb.mask")
    joined = exploded.join(F.broadcast(bloom), "word", "left").withColumn(
        "_hit",
        (
            F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask"))
            == F.col("mask")
        ).cast("int"),
    )
    return joined.groupBy(*key_cols).agg(
        (F.sum("_hit") == F.lit(len(pairs))).cast("int").alias("member")
    )


def bloom_build_sql(
    elem_src: str,
    n_words: int = 1024,
    n_hashes: int = 4,
    seed: int = 7,
) -> str:
    """DuckDB twin of :func:`bloom_build`: selects (word, bits) from
    ``elem_src`` — a relation in scope with an ``elem_hash`` BIGINT
    column."""
    pairs = _bit_exprs("elem_hash", n_words, bloom_coeffs(n_hashes, seed), "//")
    build_rows = " UNION ALL ".join(
        f"SELECT CAST({w} AS BIGINT) AS word, "
        f"(CAST(1 AS BIGINT) << CAST({b} AS INT)) AS mask FROM {elem_src}"
        for w, b in pairs
    )
    return (
        f"SELECT word, bit_or(mask) AS bits FROM ({build_rows}) GROUP BY word"
    )


def bloom_probe_sql(
    probe_src: str,
    bloom_cte: str,
    key_cols: list[str],
    n_words: int = 1024,
    n_hashes: int = 4,
    seed: int = 7,
) -> str:
    """DuckDB twin of :func:`bloom_probe_hits`: per probe-row member
    bit. ``probe_src`` must expose ``key_cols`` + ``elem_hash``;
    ``bloom_cte`` is the name of a (word, bits) relation in scope."""
    pairs = _bit_exprs("elem_hash", n_words, bloom_coeffs(n_hashes, seed), "//")
    keys = ", ".join(key_cols)
    probe_rows = " UNION ALL ".join(
        f"SELECT {keys}, CAST({w} AS BIGINT) AS word, "
        f"(CAST(1 AS BIGINT) << CAST({b} AS INT)) AS mask FROM {probe_src}"
        for w, b in pairs
    )
    return f"""
SELECT {keys},
       CAST(SUM(CASE WHEN (COALESCE(f.bits, 0) & p.mask) = p.mask
                THEN 1 ELSE 0 END) = {len(pairs)} AS INT) AS member
FROM ({probe_rows}) p LEFT JOIN {bloom_cte} f ON f.word = p.word
GROUP BY {keys}
"""
