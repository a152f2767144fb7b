"""Dictionary tagging: multi-pattern substring matching over a
broadcast phrase dictionary (Aho-Corasick) — the FlashText /
brand-safety / PII-term / topic-lexicon shape every training-data
pipeline runs ("which of these K phrases occur in each document, how
often"). One automaton pass per document matches ALL K terms in
O(len(text) + matches), vs O(K·len) for per-term scans — at K in the
tens of thousands the difference is the job.

Semantics: case-insensitive, NON-OVERLAPPING leftmost-greedy
occurrence counting per term — exactly Python ``str.count`` and
exactly SQL's ``(length(x) - length(replace(x, t, ''))) /
length(t)``, which is what makes the operator oracle-verifiable
cross-engine bit-for-bit. Distinct terms count independently (two
terms may overlap each other; occurrences of ONE term don't).

100 TB shape: the automaton is built once on the driver from the
term list (bounded: the dictionary is a model artifact, not data),
ships to executors inside the Arrow UDF closure, and the scan is
map-side (`mapInPandas`) — the only shuffle is the final per-term
aggregate over a relation bounded by |terms| × matched docs.

Reference parity: none (capability extension, SURVEY.md §2.13) —
the reference has no text operators at all.
"""

from __future__ import annotations

from collections import deque
from typing import Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_automaton(terms: Iterable[str]) -> dict:
    """Aho-Corasick automaton over lowercased terms: goto trie,
    BFS failure links, and per-node output term ids. Plain dicts so
    the structure pickles cheaply into the UDF closure."""
    terms = [t.lower() for t in terms]
    if not terms or any(not t for t in terms):
        raise ValueError("terms must be non-empty strings")
    if len(set(terms)) != len(terms):
        raise ValueError("terms must be distinct after lowercasing")
    goto: list[dict[str, int]] = [{}]
    out: list[list[int]] = [[]]
    for tid, term in enumerate(terms):
        node = 0
        for ch in term:
            nxt = goto[node].get(ch)
            if nxt is None:
                goto.append({})
                out.append([])
                nxt = len(goto) - 1
                goto[node][ch] = nxt
            node = nxt
        out[node].append(tid)
    fail = [0] * len(goto)
    q: deque[int] = deque(goto[0].values())
    while q:
        node = q.popleft()
        for ch, nxt in goto[node].items():
            q.append(nxt)
            f = fail[node]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[nxt] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != nxt else 0
            out[nxt] = out[nxt] + out[fail[nxt]]
    return {
        "goto": goto,
        "fail": fail,
        "out": out,
        "terms": terms,
        "lens": [len(t) for t in terms],
    }


def count_terms(auto: dict, text: str) -> dict[int, int]:
    """→ {term id: non-overlapping leftmost occurrence count}. One
    automaton pass collects every match END position per term; the
    greedy left-to-right filter then reproduces ``str.count``."""
    goto, fail, out = auto["goto"], auto["fail"], auto["out"]
    lens = auto["lens"]
    ends: dict[int, list[int]] = {}
    node = 0
    for i, ch in enumerate(text):
        while node and ch not in goto[node]:
            node = fail[node]
        node = goto[node].get(ch, 0)
        for tid in out[node]:
            ends.setdefault(tid, []).append(i)
    counts: dict[int, int] = {}
    for tid, positions in ends.items():
        L = lens[tid]
        n = 0
        last_end = -1
        for e in positions:  # ascending by construction
            if e - L + 1 > last_end:
                n += 1
                last_end = e
        counts[tid] = n
    return counts


def dict_tag(
    df: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (id_col, term STRING, n BIGINT) — one row per (document,
    matched term), n = non-overlapping occurrence count. Documents
    matching nothing produce no rows (semi-join them back for a
    keep/drop gate). Map-side Arrow scan; no shuffle here."""
    import pandas as pd  # noqa: PLC0415

    auto = build_automaton(terms)
    term_list = auto["terms"]

    def scan(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids: list = []
            out_terms: list[str] = []
            ns: list[int] = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                for tid, n in count_terms(auto, text.lower()).items():
                    ids.append(doc_id)
                    out_terms.append(term_list[tid])
                    ns.append(n)
            yield pd.DataFrame({id_col: ids, "term": out_terms, "n": ns})

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, text_col).mapInPandas(
        scan, f"{id_col} {id_type}, term string, n bigint"
    )


def dict_tag_totals(
    df: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-term corpus rollup: (term, n_docs, n_occurrences) — the
    lexicon coverage report. One shuffle (the |terms|-bounded agg)."""
    tags = dict_tag(df, terms, id_col, text_col)
    return tags.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n").cast("bigint").alias("n_occurrences"),
    )
