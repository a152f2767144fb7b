"""ops/dicttag.py — Aho-Corasick dictionary tagging.

The load-bearing property: for EVERY term, the automaton's
non-overlapping count equals Python's ``str.count`` (which equals the
oracle's replace-length trick) — pinned by hypothesis over adversarial
alphabets where terms are substrings, prefixes, and suffixes of each
other and of the text.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dish_data_pipeline_spark.ops.dicttag import (
    build_automaton,
    count_terms,
    dict_tag,
    dict_tag_totals,
)

TERMS = ["a", "ab", "ba", "aba", "bb", "abab", "b a", "aa"]


def _counts(text: str) -> dict[str, int]:
    auto = build_automaton(TERMS)
    got = count_terms(auto, text.lower())
    return {auto["terms"][tid]: n for tid, n in got.items()}


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="ab ", max_size=60))
def test_matches_str_count_exactly(text):
    got = _counts(text)
    low = text.lower()
    for t in TERMS:
        assert got.get(t, 0) == low.count(t), (text, t)


def test_overlap_and_suffix_cases():
    # "can" inside "scan"; "able" inside "table"; self-overlap "aa"
    auto = build_automaton(["scan", "can", "table", "able", "aa"])
    names = auto["terms"]

    def c(text):
        return {names[t]: n for t, n in count_terms(auto, text).items()}

    assert c("scan the scanner") == {"scan": 2, "can": 2}
    assert c("a table is stable") == {"table": 2, "able": 2}
    # "aaaa".count("aa") == 2 (non-overlapping), not 3
    assert c("aaaa") == {"aa": 2}


def test_automaton_input_validation():
    with pytest.raises(ValueError, match="non-empty"):
        build_automaton([])
    with pytest.raises(ValueError, match="non-empty"):
        build_automaton(["ok", ""])
    with pytest.raises(ValueError, match="distinct"):
        build_automaton(["Dup", "dup"])  # collide after lowercasing


def test_dict_tag_spark_roundtrip(spark):
    df = spark.createDataFrame(
        [
            (1, "Scan the table FAST table"),
            (2, "nothing here"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    tags = dict_tag(df, ["scan", "table", "fast table", "zzz"])
    got = {(r.doc_id, r.term): r.n for r in tags.collect()}
    assert got == {
        (1, "scan"): 1,
        (1, "table"): 2,
        (1, "fast table"): 1,
    }
    totals = {
        r.term: (r.n_docs, r.n_occurrences)
        for r in dict_tag_totals(
            df, ["scan", "table", "fast table", "zzz"]
        ).collect()
    }
    assert totals == {
        "scan": (1, 1),
        "table": (1, 2),
        "fast table": (1, 1),
    }
