"""Planted-case tests for the corpus-diagnostic ops added with the
``dup_ngram_coverage`` / ``vocab_topk`` / ``embedding_dedup``
catalog entries."""

from __future__ import annotations

from pyspark.sql import functions as F

from dish_data_pipeline_spark.ops.dedup_cluster import connected_components
from dish_data_pipeline_spark.ops.dedup_fuzzy import cross_doc_ngram_coverage
from dish_data_pipeline_spark.ops.similarity import dot, srp_block_pairs


def test_ngram_coverage_planted_extremes(spark):
    """An exact copy pair must score coverage 1.0; a doc sharing no
    5-gram with anyone must score 0.0."""
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, shared),
        (2, shared),
        (3, "one two three four five six seven eight nine ten"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r.asDict()
        for r in cross_doc_ngram_coverage(df, n=5).collect()
    }
    assert got[1]["dup_coverage"] == 1.0
    assert got[2]["dup_coverage"] == 1.0
    assert got[3]["dup_coverage"] == 0.0
    # 10 tokens -> 6 distinct 5-gram shingles each
    assert got[1]["n_ngrams"] == 6
    assert got[3]["n_dup_ngrams"] == 0


def test_ngram_coverage_partial_overlap(spark):
    """A doc sharing a prefix with another scores the exact shared
    fraction, computed against a Python twin."""
    a = "w1 w2 w3 w4 w5 w6 w7 w8"
    b = "w1 w2 w3 w4 w5 x6 x7 x8"

    def shingles(text: str, n: int = 5) -> set[str]:
        toks = text.split()
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    sa, sb = shingles(a), shingles(b)
    df = spark.createDataFrame([(1, a), (2, b)], ["doc_id", "text"])
    got = {
        r["doc_id"]: r.asDict()
        for r in cross_doc_ngram_coverage(df, n=5).collect()
    }
    assert got[1]["n_ngrams"] == len(sa)
    assert got[1]["n_dup_ngrams"] == len(sa & sb)
    assert got[1]["dup_coverage"] == len(sa & sb) / len(sa)
    assert got[2]["dup_coverage"] == len(sa & sb) / len(sb)


def test_ngram_coverage_short_doc_single_shingle(spark):
    """Docs shorter than n tokens collapse to one whole-text shingle
    (the with_shingles contract) and still divide safely."""
    df = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc"), (3, "")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in cross_doc_ngram_coverage(df, n=5).collect()
    }
    assert got[1] == {
        "doc_id": 1, "n_ngrams": 1, "n_dup_ngrams": 1, "dup_coverage": 1.0
    }
    assert got[3]["n_ngrams"] == 1 and got[3]["dup_coverage"] == 0.0


def test_embedding_dedup_collapses_planted_copies(spark):
    """Two planted duplicate groups collapse to their min-id
    canonical with the right cluster size; singletons survive as
    size-1 clusters."""
    vecs = {
        0: [1.0, 0.0, 0.0, 0.0],
        1: [0.0, 1.0, 0.0, 0.0],
        2: [1.0, 0.0, 0.0, 0.0],   # copy of 0
        3: [0.0, 0.0, 1.0, 0.0],
        4: [0.0, 1.0, 0.0, 0.0],   # copy of 1
        5: [0.0, 1.0, 0.0, 0.0],   # copy of 1
    }
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    edges = (
        srp_block_pairs(df, n_planes=8, n_tables=2, seed=7, dim=4, score=dot)
        .filter(F.col("score") >= 0.95)
        .select("id_a", "id_b")
    )
    clusters = connected_components(df.select("vec_id"), edges, id_col="vec_id")
    sizes = clusters.groupBy("cluster_id").agg(
        F.count("*").cast("bigint").alias("cluster_size")
    )
    survivors = {
        r["vec_id"]: r["cluster_size"]
        for r in clusters.filter(F.col("vec_id") == F.col("cluster_id"))
        .join(sizes, "cluster_id")
        .collect()
    }
    assert survivors == {0: 2, 1: 3, 3: 1}


def test_vocab_topk_counts_match_python(spark, sf_dir):
    """Term/doc frequencies of the top tokens equal a Python twin
    computed from the raw parquet."""
    import re
    from collections import Counter

    import duckdb

    from dish_data_pipeline_spark.plans.extensions import q_vocab_topk

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    tf: Counter[str] = Counter()
    df_: Counter[str] = Counter()
    for _, text in rows:
        toks = re.findall("[A-Za-z0-9]+", text.lower())
        tf.update(toks)
        df_.update(set(toks))
    got = q_vocab_topk(spark, sf_dir).collect()
    assert len(got) == min(100, len(tf))
    expect = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[: len(got)]
    assert [(r["token"], r["term_freq"]) for r in got] == expect
    assert all(r["doc_freq"] == df_[r["token"]] for r in got)


def test_ngram_coverage_hot_shingle_broadcast_path(spark):
    """A boilerplate phrase shared by thousands of docs is the
    coverage op's hot key. AQE's skew split can never rescue the
    frequency rejoin (the frequency side sits behind its own
    aggregate, and OptimizeSkewedJoin only splits joins whose both
    children are direct shuffle stages — verified empirically), so
    the op must route hot keys through the broadcast path: their
    rows map-side-join and never hit a shuffled reducer."""
    from pyspark.sql import Row

    n_hot, n_cold = 2000, 60
    # each doc: 4 unique tokens then a shared 5-token boilerplate
    # tail -> exactly one of its 5 shingles is corpus-wide hot
    boiler = "standard legal disclaimer boilerplate footer"
    rows = [
        Row(doc_id=i, text=f"u{i}a u{i}b u{i}c u{i}d {boiler}")
        for i in range(n_hot)
    ] + [
        Row(
            doc_id=10_000 + i,
            text=f"totally distinct filler number{i} with words alpha{i} beta{i} gamma{i}",
        )
        for i in range(n_cold)
    ]
    cov = cross_doc_ngram_coverage(
        spark.createDataFrame(rows), n=5, hot_df_threshold=1000
    )
    got = {r["doc_id"]: r["dup_coverage"] for r in cov.collect()}
    plan = cov._jdf.queryExecution().executedPlan().toString()

    # 9 tokens -> 5 shingles; only the all-boilerplate one is shared
    assert all(got[i] == 0.2 for i in range(n_hot))
    assert all(got[10_000 + i] == 0.0 for i in range(n_cold))
    # hot rows take broadcast joins (positive join + anti split);
    # only cold keys reach the sort-merge/shuffled side
    assert "BroadcastHashJoin" in plan, plan


def test_tfidf_topterms_matches_python(spark, sf_dir):
    """Top-3 terms per doc equal a Python twin of the rational-idf
    scoring, including the (tfidf desc, token asc) tiebreak."""
    import re
    from collections import Counter

    import duckdb

    from dish_data_pipeline_spark.plans.extensions import q_tfidf_topterms

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    n_docs = len(rows)
    tf: dict[int, Counter] = {}
    df_: Counter = Counter()
    for doc_id, text in rows:
        toks = Counter(re.findall("[A-Za-z0-9]+", text.lower()))
        tf[doc_id] = toks
        df_.update(toks.keys())
    expect = {}
    for doc_id, toks in tf.items():
        scored = sorted(
            ((t, c, df_[t], (c * n_docs) / df_[t]) for t, c in toks.items()),
            key=lambda x: (-x[3], x[0]),
        )[:3]
        expect[doc_id] = [
            (t, c, d, s, r + 1) for r, (t, c, d, s) in enumerate(scored)
        ]
    got: dict[int, list] = {}
    for r in q_tfidf_topterms(spark, sf_dir).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["token"], r["tf"], r["df"], r["tfidf"], r["rank"])
        )
    for doc_id in got:
        got[doc_id].sort(key=lambda x: x[4])
    assert got == expect
