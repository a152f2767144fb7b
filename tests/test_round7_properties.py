"""Round-7 property tests: batched BPE merge selection
(ops/text.bpe_train batch_m), the multi-pair fold, and the
versioned-manifest commit ordering invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dish_data_pipeline_spark.ops.text import (
    _merge_fold,
    _merge_fold_multi,
    bpe_train,
)


def test_multi_fold_equals_sequential_folds_for_disjoint_pairs(spark):
    """The batch-acceptance rule's payoff: one combined pass over
    disjoint pairs == sequential single-pair passes, symbol by
    symbol."""
    words = ["erin", "stow", "terse", "aaaa", "wrist", "snore", "x"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    syms = F.split("w", "")
    pairs = [("e", "r"), ("s", "t"), ("o", "w")]

    combined = df.select(_merge_fold_multi(syms, pairs).alias("s"))
    seq = syms
    for left, right in pairs:
        seq = _merge_fold(seq, left, right)
    sequential = df.select(seq.alias("s"))
    assert [r.s for r in combined.collect()] == [
        r.s for r in sequential.collect()
    ]


def test_batched_bpe_equals_exact_when_merges_disjoint(spark):
    """A corpus whose top pairs are mutually non-interacting and
    whose counts are strictly separated (no created pair can
    overtake): batch_m=4 must reproduce exact greedy verbatim."""
    text = " ".join(["er"] * 40 + ["st"] * 30 + ["ow"] * 20 + ["in"] * 10)
    df = spark.createDataFrame([(text,)], "text string")
    exact, _ = bpe_train(df, "text", n_merges=4, batch_m=1)
    batched, _ = bpe_train(df, "text", n_merges=4, batch_m=4)
    assert batched == exact == [
        (1, "e", "r", 40), (2, "s", "t", 30), (3, "o", "w", 20),
        (4, "i", "n", 10),
    ]


def test_batched_bpe_prefix_rule_stops_at_interaction(spark):
    """Candidate 2 shares a symbol with candidate 1 → the batch must
    end after candidate 1 (its application would invalidate the
    pre-batch count of candidate 2), falling back to per-round
    behavior — so the result again equals exact greedy."""
    # (a,b) leads; (b,c) interacts with it via 'b'
    text = " ".join(["abz"] * 5 + ["bcz"] * 4)
    df = spark.createDataFrame([(text,)], "text string")
    exact, _ = bpe_train(df, "text", n_merges=3, batch_m=1)
    batched, _ = bpe_train(df, "text", n_merges=3, batch_m=3)
    assert batched == exact


def test_batched_bpe_respects_min_pair_count(spark):
    df = spark.createDataFrame([("er er st",)], "text string")
    merges, _ = bpe_train(df, "text", n_merges=5, batch_m=5, min_pair_count=2)
    # (s,t) appears once — below the floor; batch must not absorb it
    assert merges == [(1, "e", "r", 2)]


def test_batched_bpe_rejects_bad_batch_m(spark):
    df = spark.createDataFrame([("ab",)], "text string")
    with pytest.raises(ValueError, match="batch_m"):
        bpe_train(df, "text", n_merges=1, batch_m=0)


def test_stream_zscore_bit_identical_to_batch_on_null_interleaved(
    spark, tmp_path
):
    """The round-7 contract: stream_zscore replays the batch
    rolling_zscore chain exactly — NULL rows consume ROWS-frame
    slots and the sums are floor-quantized — so on NULL-interleaved,
    in-order input the two tiers are equal to the bit, not to a
    tolerance."""
    import datetime as dt
    import json

    from pyspark.sql.types import (
        DoubleType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from dish_data_pipeline_spark.ops.timeseries import rolling_zscore
    from dish_data_pipeline_spark.streaming.stateful import stream_zscore

    series = [10.3, None, 11.7, 13.1, None, 30.9, 12.4, None, None, 11.05]
    base = dt.datetime(2024, 1, 1)
    schema = StructType(
        [
            StructField("k", StringType()),
            StructField("ts", TimestampType()),
            StructField("value", DoubleType()),
        ]
    )
    indir = tmp_path / "in"
    indir.mkdir()
    for b, sl in ((1, slice(0, 4)), (2, slice(4, None))):  # two batches
        with open(indir / f"b{b}.json", "w") as f:
            for i, v in list(enumerate(series))[sl]:
                f.write(json.dumps({
                    "k": "a",
                    "ts": f"2024-01-01T00:{i:02d}:00Z",
                    "value": v,
                }) + "\n")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(indir))
    )
    q = (
        stream_zscore(stream, key_cols=("k",), window_rows=4, threshold=2.0)
        .writeStream.format("memory")
        .queryName("z7")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.ts.minute: (r.value, r.zscore, r.is_anomaly)
        for r in spark.sql("SELECT * FROM z7").collect()
    }

    batch_in = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate(series)],
        "k string, bucket bigint, value double",
    )
    want = {
        r.bucket: (r.value, r.zscore, r.is_anomaly)
        for r in rolling_zscore(batch_in, "k", window_rows=4,
                               threshold=2.0).collect()
    }
    assert len(got) == len(series)
    for i in range(len(series)):
        assert got[i] == want[i], (i, got[i], want[i])


def test_pagerank_star_digraph_pins_dangling_contract(spark):
    """Star digraph a→c, b→c: c is a sink. The documented contract
    (ops/graph.py): sink mass is NOT redistributed — a and b decay
    to the teleport base while c holds base + damped spokes — and
    total mass is therefore < SCALE. A Python twin of the integer
    recurrence pins the exact fixed-point values."""
    from dish_data_pipeline_spark.ops.graph import PR_SCALE, pagerank

    edges = spark.createDataFrame(
        [("a", "c"), ("b", "c")], "src string, dst string"
    )
    got = {r.node: r.pr_q for r in pagerank(edges, n_iter=3).collect()}

    n, dnum, dden = 3, 85, 100
    base = ((dden - dnum) * PR_SCALE) // (dden * n)
    pr = {v: PR_SCALE // n for v in "abc"}
    for _ in range(3):
        contrib_c = (dnum * pr["a"]) // dden + (dnum * pr["b"]) // dden
        pr = {"a": base, "b": base, "c": base + contrib_c}
    assert got == pr
    # the deviation from textbook PageRank the docstring documents:
    # sink mass leaks, so totals fall below one unit of SCALE
    assert sum(got.values()) < PR_SCALE
    # symmetrizing restores a closed system (mass conserved up to
    # per-edge floor truncation)
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    got_sym = {r.node: r.pr_q for r in pagerank(sym, n_iter=3).collect()}
    assert sum(got_sym.values()) > PR_SCALE - 100


def test_pagerank_redistribute_conserves_mass_on_star(spark):
    """dangling='redistribute': the star digraph's sink mass is
    spread uniformly each round (textbook behavior), so total mass
    stays within per-node floor truncation of SCALE, and a Python
    twin of the integer recurrence pins exact values."""
    from dish_data_pipeline_spark.ops.graph import PR_SCALE, pagerank

    edges = spark.createDataFrame(
        [("a", "c"), ("b", "c")], "src string, dst string"
    )
    got = {
        r.node: r.pr_q
        for r in pagerank(edges, n_iter=3, dangling="redistribute").collect()
    }

    n, dnum, dden = 3, 85, 100
    base = ((dden - dnum) * PR_SCALE) // (dden * n)
    pr = {v: PR_SCALE // n for v in "abc"}
    for _ in range(3):
        share = (dnum * pr["c"]) // (dden * n)  # c is the only sink
        contrib_c = (dnum * pr["a"]) // dden + (dnum * pr["b"]) // dden
        pr = {
            "a": base + share,
            "b": base + share,
            "c": base + contrib_c + share,
        }
    assert got == pr
    # mass conserved up to floor truncation (few units of 1/SCALE)
    assert PR_SCALE - sum(got.values()) < 100

    import pytest as _pytest

    with _pytest.raises(ValueError, match="dangling"):
        pagerank(edges, n_iter=1, dangling="teleport")


def test_hashed_linear_score_margin_and_edges(spark):
    """Python twin of the hashed-classifier margin on a tiny corpus,
    plus the edge contracts: empty text → NULL score / keep=False,
    empty weights rejected."""
    import hashlib

    import pytest as _pytest
    from pyspark.sql import Row

    from dish_data_pipeline_spark.ops.text import (
        CLASSIFIER_SCALE,
        hashed_linear_score,
    )

    weights = [7, -13, 29, -3]

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 4

    d = spark.createDataFrame(
        [Row(doc_id=0, text="Alpha beta ALPHA"), Row(doc_id=1, text="...")]
    )
    got = {
        r.doc_id: r
        for r in hashed_linear_score(d, weights, bias=100, threshold=0.0)
        .collect()
    }
    raw = 2 * weights[bucket("alpha")] + weights[bucket("beta")]
    assert got[0].n_tokens == 3
    assert got[0].margin_q == 100 * 3 + raw
    assert got[0].score == (100 + raw / 3) / CLASSIFIER_SCALE
    assert got[0].keep == (got[0].score > 0.0)
    assert got[1].n_tokens == 0
    assert got[1].score is None and got[1].keep is False

    with _pytest.raises(ValueError, match="weights"):
        hashed_linear_score(d, [])


def test_bpe_segment_vocab_path_equals_zero_shuffle_path(spark):
    """bpe_segment (zero-shuffle per-occurrence folds) and
    bpe_segment_by_vocab (fold per distinct word + positional
    regroup) must agree token for token — including repeated words,
    multi-char merges, and a wordless document."""
    from pyspark.sql import Row

    from dish_data_pipeline_spark.ops.text import (
        bpe_segment,
        bpe_segment_by_vocab,
    )

    merges = [(1, "e", "r", 0), (2, "t", "h", 0), (3, "th", "er", 0)]
    d = spark.createDataFrame(
        [
            Row(doc_id=0, text="the weather is rather ethereal"),
            Row(doc_id=1, text="ERror Error error"),
            Row(doc_id=2, text="..."),
        ]
    )
    a = {
        r.doc_id: (r.tokens, r.n_tokens)
        for r in bpe_segment(d, merges).collect()
    }
    b = {
        r.doc_id: (r.tokens, r.n_tokens)
        for r in bpe_segment_by_vocab(d, merges).collect()
    }
    assert a == b
    assert a[2] == ([], 0)
    assert a[0][0][:4] == ["th", "e", "w", "e"]  # 'the' → [th, e]


def test_jaccard_simjoin_exact_vs_bruteforce(spark):
    """The prefix-filtered join must return EXACTLY the pairs a
    brute-force python twin finds — completeness (no pair lost to
    the prefix bound) and precision (integer acceptance) on a corpus
    with planted near-dups, disjoint docs, and an empty doc."""
    import itertools
    import re

    from pyspark.sql import Row

    from dish_data_pipeline_spark.ops.setsim import jaccard_similarity_join

    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "the quick brown fox jumps over the lazy cat",
        3: "the quick brown fox jumps over the lazy dog",  # exact dup of 1
        4: "completely different words entirely here now",
        5: "",
        6: "quick brown fox",
    }
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in texts.items()]
    )
    got = {
        (r.id_a, r.id_b): (r.n_inter, r.n_union)
        for r in jaccard_similarity_join(df, 60).collect()
    }

    sets = {
        i: set(re.findall("[A-Za-z0-9]+", t.lower()))
        for i, t in texts.items()
        if re.findall("[A-Za-z0-9]+", t.lower())
    }
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if inter * 100 >= union * 60:
            want[(a, b)] = (inter, union)
    assert got == want
    assert (1, 3) in got and got[(1, 3)][0] == got[(1, 3)][1]  # exact dup
    assert (1, 2) in got  # near dup
    assert not any(4 in pair or 5 in pair for pair in got)

    # shingle mode: exact dup still 1.0, near-dup pair now judged on
    # order-sensitive bigrams
    got2 = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_similarity_join(df, 60, shingle_n=2).collect()
    }
    assert got2[(1, 3)] == 1.0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="tau_pct"):
        jaccard_similarity_join(df, 0)
    with _pytest.raises(ValueError, match="shingle_n"):
        jaccard_similarity_join(df, 60, shingle_n=0)


def test_edit1_pairs_exact_vs_bruteforce(spark):
    """Deletion-neighborhood blocking must find EXACTLY the pairs a
    brute-force python levenshtein finds at distance <= 1 —
    substitution, insertion/deletion, equality, NULL keys, empty
    strings, and a >1 pair that must NOT appear."""
    import itertools

    from pyspark.sql import Row

    from dish_data_pipeline_spark.ops.fuzzykey import edit1_pairs

    keys = {
        1: "kettle", 2: "kettle",   # equal → dist 0
        3: "kettlz",                # substitution of 1
        4: "ketle",                 # deletion of 1
        5: "skettle",               # insertion of 1
        6: "teapot",                # far from all
        7: None,                    # never matches
        8: "", 9: "",               # empty == empty (dist 0)
        10: "a",                    # 1 insert from ""
    }
    df = spark.createDataFrame(
        [Row(k=i, s=v) for i, v in keys.items()],
        "k int, s string",
    )
    got = {
        (r.id_a, r.id_b): r.dist for r in edit1_pairs(df, "k", "s").collect()
    }

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = {
        (a, b): lev(keys[a], keys[b])
        for a, b in itertools.combinations(sorted(k for k in keys
                                                  if keys[k] is not None), 2)
        if lev(keys[a], keys[b]) <= 1
    }
    assert got == want
    assert got[(1, 2)] == 0 and got[(1, 3)] == 1 and got[(1, 4)] == 1
    assert got[(1, 5)] == 1 and got[(8, 9)] == 0 and got[(8, 10)] == 1
    assert not any(6 in p or 7 in p for p in got)


def test_rolling_robust_zscore_resists_masking(spark):
    """The robust gate's reason to exist: an outlier INSIDE the
    trailing window inflates stddev enough to mask the next spike
    for the variance gate, while median/MAD barely move. Known
    values verify the median/MAD selection arithmetic too."""
    from dish_data_pipeline_spark.ops.timeseries import (
        rolling_robust_zscore,
        rolling_zscore,
    )

    series = [10.0, 10.0, 11.0, 10.0, 11.0, 200.0, 10.0, 80.0]
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(series)],
        "k string, bucket bigint, value double",
    )
    robust = {
        r.bucket: (r.robust_z, r.is_anomaly)
        for r in rolling_robust_zscore(df, "k", window_rows=6,
                                       threshold=3.0).collect()
    }
    classic = {
        r.bucket: r.is_anomaly
        for r in rolling_zscore(df, "k", window_rows=6,
                                threshold=3.0).collect()
    }
    # index 7 (value 80 after the 200-spike entered the window):
    # stddev gate is masked, MAD gate still fires
    assert classic[7] is False
    assert robust[7][1] is True
    # exact selection arithmetic: trail of 7 = [10,11,10,11,200,10]
    # sorted → med (10+11)/2 = 10.5; devs [.5×5, 189.5] → mad 0.5
    assert robust[7][0] == (80.0 - 10.5) / 0.5
    assert robust[6] == ((10.0 - 10.5) / 0.5, False)
    # the documented zero-MAD degeneracy: the near-constant window
    # before the first spike has MAD 0 → NULL score, flag False —
    # the variance gate catches that one (complementary failure
    # modes, which is why the two flags ship side by side)
    assert robust[5] == (None, False) and classic[5] is True
    # insufficient history → NULL score, flag False
    assert robust[0] == (None, False)


def test_containment_pairs_finds_quote_jaccard_misses(spark):
    """The asymmetric case Jaccard can't see: a short doc fully
    quoted inside a long one — containment(a→b) = 1.0 while Jaccard
    stays far below any useful threshold. Python twin verifies the
    counts; direction matters (the long doc is NOT contained in the
    short one)."""
    from pyspark.sql import Row

    from dish_data_pipeline_spark.ops.setsim import (
        containment_pairs,
        jaccard_similarity_join,
    )

    quote = "the five boxing wizards jump quickly tonight"
    book = (
        "chapter one begins here with many other words and then "
        + quote
        + " appears verbatim among plenty of surrounding narrative "
        "text that keeps going for a while longer still"
    )
    df = spark.createDataFrame(
        [Row(doc_id=1, text=quote), Row(doc_id=2, text=book),
         Row(doc_id=3, text="unrelated material entirely")]
    )
    got = {
        (r.id_a, r.id_b): (r.n_inter, r.n_a, r.containment)
        for r in containment_pairs(df, 80, shingle_n=3).collect()
    }
    # quote ⊂ book: all 5 of the quote's trigrams appear in the book
    assert got[(1, 2)][2] == 1.0 and got[(1, 2)][0] == got[(1, 2)][1] == 5
    assert (2, 1) not in got  # asymmetry: the book is not contained
    assert not any(3 in p for p in got)
    # and Jaccard at a MUCH lower bar still misses the pair
    jac = {
        (r.id_a, r.id_b)
        for r in jaccard_similarity_join(df, 30, shingle_n=3).collect()
    }
    assert (1, 2) not in jac

    import pytest as _pytest

    with _pytest.raises(ValueError, match="tau_pct"):
        containment_pairs(df, 0)


def test_kcore_peels_paths_keeps_cycles(spark):
    from dish_data_pipeline_spark.ops.graph import kcore

    # triangle 1-2-3 with a pendant path 3-4-5: the path cascades
    # away under k=2, the triangle survives with degrees 2
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "a int, b int"
    )
    got = {r["node"]: r["core_degree"]
           for r in kcore(edges, k=2, n_rounds=4).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_fixed_rounds_bound_cascade(spark):
    from dish_data_pipeline_spark.ops.graph import kcore

    # a pure path of 6 nodes needs 3 peel rounds to vanish under
    # k=2; with only 1 round the middle survives (fixed-round
    # contract), with 3 it is empty
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "a int, b int"
    )
    assert kcore(edges, k=2, n_rounds=3).count() == 0
    partial = {r["node"] for r in kcore(edges, k=2, n_rounds=1).collect()}
    assert partial == {3, 4}


def test_kcore_matches_duckdb_twin_on_random_graph(spark):
    import random

    import duckdb

    from dish_data_pipeline_spark.ops.graph import kcore, kcore_sql

    rng = random.Random(7)
    edges = sorted({tuple(sorted(rng.sample(range(30), 2)))
                    for _ in range(60)})
    df = spark.createDataFrame(edges, "a int, b int")
    got = {(r["node"], r["core_degree"])
           for r in kcore(df, k=3, n_rounds=5).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE e(a INT, b INT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    sql = "WITH " + kcore_sql("e", k=3, n_rounds=5)
    oracle = {(int(a), int(d)) for a, d in con.execute(sql).fetchall()}
    assert got == oracle


def test_bfs_hops_chain_distances(spark):
    from dish_data_pipeline_spark.ops.graph import bfs_hops

    # path 1-2-3-4-5, undirected; seed {1}: hops capped at 3
    und = [(i, i + 1) for i in range(1, 5)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src int, dst int"
    )
    seeds = spark.createDataFrame([(1,)], "node int")
    got = {(r["node"], r["hops"])
           for r in bfs_hops(edges, seeds, max_hops=3).collect()}
    assert got == {(1, 0), (2, 1), (3, 2), (4, 3)}


def test_bfs_hops_early_exit_and_min_label(spark):
    from dish_data_pipeline_spark.ops.graph import bfs_hops

    # two seeds; node 3 reachable from both — takes the MINIMUM hop;
    # component {9,10} unreachable; frontier empties before max_hops
    und = [(1, 2), (2, 3), (4, 3), (9, 10)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src int, dst int"
    )
    seeds = spark.createDataFrame([(1,), (4,)], "node int")
    got = {(r["node"], r["hops"])
           for r in bfs_hops(edges, seeds, max_hops=9).collect()}
    assert got == {(1, 0), (4, 0), (2, 1), (3, 1)}


def test_bfs_hops_matches_duckdb_twin_on_random_graph(spark):
    import random

    import duckdb

    from dish_data_pipeline_spark.ops.graph import bfs_hops, bfs_hops_sql

    rng = random.Random(13)
    und = sorted({tuple(sorted(rng.sample(range(40), 2)))
                  for _ in range(50)})
    edges_list = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(edges_list, "src int, dst int")
    seeds = spark.createDataFrame([(0,), (7,)], "node int")
    got = {(r["node"], r["hops"])
           for r in bfs_hops(df, seeds, max_hops=3).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE e(src INT, dst INT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges_list)
    con.execute("CREATE TABLE s(node INT)")
    con.executemany("INSERT INTO s VALUES (?)", [(0,), (7,)])
    sql = "WITH " + bfs_hops_sql("e", "s", max_hops=3)
    oracle = {(int(n), int(h)) for n, h in con.execute(sql).fetchall()}
    assert got == oracle


def test_trigram_search_false_positive_rejected(spark):
    from pyspark.sql import Row

    from dish_data_pipeline_spark.ops.trgm import trigram_search

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="abcdef twice abcdef"),
            Row(doc_id=2, text="has abcd and cdef but not joined"),
            Row(doc_id=3, text="nothing relevant"),
        ]
    )
    got = {(r.id, r.n_occurrences)
           for r in trigram_search(docs, "abcdef").collect()}
    # doc 2 contains every trigram of 'abcdef' except bcd? it has
    # abc,bcd(abcd),cde,def(cdef) — ALL trigrams, yet not the
    # substring: the candidate set includes it, verification drops it
    assert got == {(1, 2)}


def test_trigram_search_short_pattern_full_scan(spark):
    from pyspark.sql import Row

    from dish_data_pipeline_spark.ops.trgm import trigram_search

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="xyxy"), Row(doc_id=2, text="zz")]
    )
    got = {(r.id, r.n_occurrences)
           for r in trigram_search(docs, "xy").collect()}
    assert got == {(1, 2)}


def test_trigram_search_prebuilt_index_equivalent(spark):
    from pyspark.sql import Row

    from dish_data_pipeline_spark.ops.trgm import (
        trigram_index,
        trigram_search,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(
            ["spark sql engine", "sql spark", "engine room", "spa rks"])]
    )
    idx = trigram_index(docs).persist()
    a = {(r.id, r.n_occurrences)
         for r in trigram_search(docs, "spark").collect()}
    b = {(r.id, r.n_occurrences)
         for r in trigram_search(docs, "spark", index=idx).collect()}
    idx.unpersist()
    assert a == b == {(0, 1), (1, 1)}


def test_trigram_array_short_text_empty(spark):
    from pyspark.sql import Row

    from dish_data_pipeline_spark.ops.trgm import trigram_index

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="ab"), Row(doc_id=2, text="abc")]
    )
    rows = trigram_index(docs).collect()
    assert [(r.id, r.tg) for r in rows] == [(2, "abc")]
