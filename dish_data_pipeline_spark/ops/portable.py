"""Cross-engine deterministic hashing (Spark SQL ⇄ DuckDB SQL).

Spark's ``xxhash64`` does not exist in DuckDB, so any operator built
on it can only get a rows-only correctness check. ``md5`` exists in
BOTH engines with identical output, and both can turn its leading 15
hex chars into the same non-negative 60-bit integer:

- Spark:  ``cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint)``
- DuckDB: fold ``strpos('0123456789abcdef', …)`` over the 15 chars.

Verified bit-identical (h('hello') = 419982666956583591 in both).

On top of that, *permutations* for MinHash use classic universal
hashing ``((h mod P) * a + b) mod P`` with P = 2^31 - 1: every
intermediate fits in int64 ((P-1)² ≈ 4.6e18 < 2^63), so Spark's
wrapping arithmetic and DuckDB's checked arithmetic agree exactly.

This is what upgrades MinHash-LSH / SimHash / winnowing / SRP-LSH
from rows-only checks to full value-hash oracle verification: the
DuckDB oracle replicates the algorithm EXACTLY — including its
false-negative behavior — instead of approximating it.

The cost vs ``xxhash64`` is one md5 per hashed token/shingle/gram
(~2-3× the raw hash cost, still JVM-side and map-side). At 100 TB
you may swap ``spark_phash`` back to ``xxhash64`` for peak speed;
every operator takes the hash SQL as a string, so it is one line.
"""

from __future__ import annotations

P = 2_147_483_647  # Mersenne prime 2^31 - 1: universal-hash modulus


def spark_phash(expr: str) -> str:
    """Spark SQL: 60-bit md5-derived hash of a string expression."""
    return f"cast(conv(substring(md5({expr}), 1, 15), 16, 10) as bigint)"


def duck_phash(expr: str) -> str:
    """DuckDB SQL: the same 60-bit hash (hex fold via strpos)."""
    return (
        "list_reduce(list_transform(range(1, 16), j -> "
        f"CAST(strpos('0123456789abcdef', substr(md5({expr}), j, 1)) - 1 "
        "AS BIGINT)), (acc, v) -> acc * 16 + v)"
    )


def py_phash(s: str) -> int:
    """Python twin (for tests / planted-case construction)."""
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def perm_coeffs(n: int, seed: int = 42) -> list[tuple[int, int]]:
    """n deterministic (a, b) pairs for ``((h % P) * a + b) % P``
    universal hashing — derived from a fixed LCG so every engine,
    run, and cluster size sees the same permutations."""
    out = []
    x = seed & 0xFFFFFFFFFFFFFFFF
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        a = x % (P - 1) + 1  # non-zero multiplier
        x = (x * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        b = x % P
        out.append((a, b))
    return out


def perm_expr(h_expr: str, a: int, b: int) -> str:
    """Same SQL text evaluates identically in Spark and DuckDB."""
    return f"((({h_expr}) % {P}) * {a} + {b}) % {P}"


def py_perm(h: int, a: int, b: int) -> int:
    return ((h % P) * a + b) % P
