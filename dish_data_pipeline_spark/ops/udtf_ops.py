"""Python user-defined TABLE functions (Spark 4 ``@udtf``) — the
row-to-rows half of the §2.11 UDF surface (the UDAF half runs
through Arrow ``mapInPandas``/``applyInPandas`` in
``ops/multimodal.py`` and ``streaming/stateful.py``).

A UDTF is the slow path (per-row Python generator) — the right tool
ONLY where each input row expands into a variable number of output
rows under stateful logic that built-in generators (`explode`,
`posexplode`, `inline`, `stack`) can't express in one pass. The
demonstration here is run-length detection over a document's token
stream: emit one row per maximal run of ≥ 2 consecutive identical
words. Inside the generator that's a three-variable scan; in pure
SQL it's the full gaps-and-islands dance (position − row_number
island key, two window passes) — which is exactly what the DuckDB
oracle twin does, making the correctness check also a non-trivial
second implementation.

Tokenization contract (kept trivially portable): split on single
spaces (consecutive separators yield empty tokens in BOTH Python
``split(' ')`` and SQL ``string_split(x, ' ')``), positions 1-based
over the RAW split array, empty tokens never start a reported run.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(
    returnType=(
        "doc_id bigint, run_idx int, word string, "
        "start_pos int, run_len int"
    )
)
class WordRuns:
    """One input row → one row per maximal ≥2-repeat word run."""

    def eval(self, doc_id, text):  # noqa: D102 — UDTF contract method
        if text is None:
            return
        run_idx = 0
        prev, start, n = None, 0, 0
        toks = text.split(" ")
        for pos, tok in enumerate(toks + [None], start=1):
            if tok == prev and tok is not None:
                n += 1
                continue
            if prev is not None and prev != "" and n >= 2:
                run_idx += 1
                yield doc_id, run_idx, prev, start, n
            prev, start, n = tok, pos, 1


def register_udtfs(spark) -> None:
    """Register the module's UDTFs for SQL LATERAL use (idempotent)."""
    spark.udtf.register("word_runs", WordRuns)
