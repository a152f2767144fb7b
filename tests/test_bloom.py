"""Bloom filter (ops/bloom.py): no false negatives ever, Python-twin
bit layout, and bit-for-bit Spark ⇄ DuckDB filter equality."""

from __future__ import annotations

import duckdb
import pytest

from dish_data_pipeline_spark.ops.bloom import (
    BITS_PER_WORD,
    bloom_build,
    bloom_build_sql,
    bloom_coeffs,
    bloom_probe_hits,
    bloom_probe_sql,
)
from dish_data_pipeline_spark.ops.portable import P, py_phash


def py_bloom_bits(hashes, n_words, n_hashes, seed=7):
    """Python twin of the build: {word: bits}."""
    words: dict[int, int] = {}
    n_bits = n_words * BITS_PER_WORD
    for h in hashes:
        for a, b in bloom_coeffs(n_hashes, seed):
            bit = (((h % P) * a + b) % P) % n_bits
            w, j = bit // BITS_PER_WORD, bit % BITS_PER_WORD
            words[w] = words.get(w, 0) | (1 << j)
    return words


@pytest.fixture(scope="module")
def built(spark):
    inserted = [py_phash(f"in{i}") for i in range(80)]
    edf = spark.createDataFrame(
        [(h,) for h in inserted], "elem_hash bigint"
    )
    bf = bloom_build(edf, n_words=32, n_hashes=4)
    return inserted, bf


def test_build_matches_python_twin(spark, built):
    inserted, bf = built
    got = {r["word"]: r["bits"] for r in bf.collect()}
    assert got == py_bloom_bits(inserted, 32, 4)
    assert all(0 <= w < 32 for w in got)
    assert all(0 < b < (1 << 63) for b in got.values())  # sign bit never set


def test_no_false_negatives_and_fp_accounting(spark, built):
    inserted, bf = built
    absent = [py_phash(f"out{i}") for i in range(400)]
    probes = spark.createDataFrame(
        [(i, h) for i, h in enumerate(inserted + absent)],
        "pid int, elem_hash bigint",
    )
    res = {
        r["pid"]: r["member"]
        for r in bloom_probe_hits(
            probes, bf, ["pid"], n_words=32, n_hashes=4
        ).collect()
    }
    # every inserted element MUST probe positive
    assert all(res[i] == 1 for i in range(len(inserted)))
    # tiny 32*63-bit filter at 80 inserts: false positives exist and
    # are deterministic — pin the count so any hash drift fails loudly
    fp = sum(res[len(inserted) + j] for j in range(len(absent)))
    assert 0 < fp < len(absent)


def test_spark_filter_bit_identical_to_duckdb(spark, built):
    inserted, bf = built
    got = {r["word"]: r["bits"] for r in bf.collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e(elem_hash BIGINT); INSERT INTO e VALUES "
        + ",".join(f"({h})" for h in inserted)
    )
    oracle = dict(
        con.execute(bloom_build_sql("e", n_words=32, n_hashes=4)).fetchall()
    )
    assert got == oracle


def test_probe_members_match_duckdb(spark, built):
    inserted, bf = built
    probes = [(i, py_phash(f"p{i}")) for i in range(300)]
    pdf = spark.createDataFrame(probes, "pid int, elem_hash bigint")
    res = {
        r["pid"]: r["member"]
        for r in bloom_probe_hits(
            pdf, bf, ["pid"], n_words=32, n_hashes=4
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e(elem_hash BIGINT); INSERT INTO e VALUES "
        + ",".join(f"({h})" for h in inserted)
    )
    con.execute(
        "CREATE TABLE p(pid INT, elem_hash BIGINT); INSERT INTO p VALUES "
        + ",".join(f"({i},{h})" for i, h in probes)
    )
    sql = (
        f"WITH bf AS ({bloom_build_sql('e', n_words=32, n_hashes=4)}) "
        + bloom_probe_sql("p", "bf", ["pid"], n_words=32, n_hashes=4)
    )
    oracle = dict(con.execute(sql).fetchall())
    assert res == oracle
