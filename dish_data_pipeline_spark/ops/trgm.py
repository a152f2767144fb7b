"""Trigram-indexed substring search — LIKE '%pat%' without the scan.

A literal substring predicate over a 100 TB corpus cannot afford a
full text scan per query. The standard fix (PostgreSQL ``pg_trgm``,
code-search engines) is an inverted character-trigram index: a
document can contain the pattern only if it contains EVERY trigram
of the pattern, so the index join produces a small candidate set and
only candidates get the exact (and expensive) containment check.
False positives are eliminated by verification; false negatives are
impossible — every substring occurrence contributes all its
trigrams.

Scale shape: the index is ``(id, trigram)`` distinct pairs —
buildable once per corpus version (one explode + distinct, map-side
until the dedup shuffle) and reusable across every query, exactly
like the MinHash signature table in ``ops/dedup_fuzzy``. A query
touches only the index rows of its own trigrams (an ``IN`` filter
that prunes at the scan), aggregates candidates by id, and
rehydrates just those documents for verification. Patterns shorter
than 3 chars degrade to the full containment scan — there is no
index to use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _trigram_array(col):
    """Array of every 3-char window of ``col`` (duplicates kept) —
    empty below length 3: sequence(1, n) steps BACKWARD for n < 1,
    it does not produce an empty array."""
    return F.when(
        F.length(col) < 3, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(col) - 2),
            lambda i: col.substr(i, F.lit(3)),
        )
    )


def trigram_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The inverted index: one ``(id, tg)`` row per distinct trigram
    per document. Materialize/persist this once per corpus version
    and share it across queries."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(_trigram_array(F.col(text_col)))).alias(
            "tg"
        ),
    )


def _pattern_trigrams(pattern: str) -> list[str]:
    return sorted({pattern[i : i + 3] for i in range(len(pattern) - 2)})


def trigram_search(
    docs: DataFrame,
    pattern: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    index: DataFrame | None = None,
) -> DataFrame:
    """Documents containing literal ``pattern``, with the exact
    occurrence count: ``(id, n_occurrences INT)``. Pass a
    pre-materialized :func:`trigram_index` to skip the index build;
    occurrence counting is the portable length-difference integer
    arithmetic (no regex, no overlap semantics — counts
    non-overlapping replace()-style occurrences)."""
    if not pattern:
        raise ValueError("pattern must be non-empty")
    occurrences = (
        (
            F.length(F.col(text_col))
            - F.length(F.replace(F.col(text_col), F.lit(pattern)))
        )
        / F.lit(len(pattern))
    ).cast("int")
    if len(pattern) < 3:
        # no trigram to index on — honest full scan
        return docs.filter(F.contains(F.col(text_col), F.lit(pattern))).select(
            F.col(id_col).alias("id"), occurrences.alias("n_occurrences")
        )
    idx = index if index is not None else trigram_index(docs, id_col, text_col)
    pats = _pattern_trigrams(pattern)
    candidates = (
        idx.filter(F.col("tg").isin(pats))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") == len(pats))
        .select("id")
    )
    return (
        docs.join(
            candidates, docs[id_col] == candidates["id"], "left_semi"
        )
        .filter(F.contains(F.col(text_col), F.lit(pattern)))
        .select(F.col(id_col).alias("id"), occurrences.alias("n_occurrences"))
    )
