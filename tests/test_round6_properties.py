"""Property tests for the round-6 operators. Each operator is
twinned by an independent pure-Python implementation on random
inputs — shapes the fixed corpus doesn't cover (repeated symbols,
single-word corpora, merge chains that cascade)."""

from __future__ import annotations

import collections
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dish_data_pipeline_spark.ops.text import bpe_train

SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# Tiny alphabet so pair merges collide and cascade (aa+a, ab+ba …).
WORDS = st.lists(
    st.text(alphabet="ab1", min_size=1, max_size=6),
    min_size=1,
    max_size=30,
)


def _twin_bpe(texts, n_merges, min_pair_count=2):
    wc = collections.Counter(
        w
        for t in texts
        for w in re.findall("[A-Za-z0-9]+", t.lower())
        if len(w) >= 2
    )
    vo = {w: list(w) for w in wc}
    merges = []
    for step in range(1, n_merges + 1):
        pc = collections.Counter()
        for w, syms in vo.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wc[w]
        if not pc:
            break
        (left, right), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_pair_count:
            break
        merges.append((step, left, right, c))
        for w, syms in vo.items():
            acc = []
            for s in syms:
                if acc and acc[-1] == left and s == right:
                    acc[-1] = left + right
                else:
                    acc.append(s)
            vo[w] = acc
    vocab = sorted((tuple(v), wc[w]) for w, v in vo.items())
    return merges, vocab


@SLOW
@given(WORDS)
def test_bpe_train_matches_python_twin(spark, words):
    texts = [" ".join(words[i : i + 5]) for i in range(0, len(words), 5)]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    merges, vocab = bpe_train(df, "text", n_merges=4)
    tw_merges, tw_vocab = _twin_bpe(texts, 4)
    assert merges == tw_merges
    got_vocab = sorted((tuple(r.syms), r.n) for r in vocab.collect())
    assert got_vocab == tw_vocab


def test_bpe_train_greedy_overlap_and_early_stop(spark):
    # "aaaa" ×3: pair (a,a) counts 9 (overlapping), first merge makes
    # [aa, aa]; second merge (aa, aa) makes [aaaa]; then no pair is
    # left anywhere and training stops early.
    df = spark.createDataFrame([("aaaa aaaa aaaa",)], "text string")
    merges, vocab = bpe_train(df, "text", n_merges=10)
    assert merges == [(1, "a", "a", 9), (2, "aa", "aa", 3)]
    assert [(tuple(r.syms), r.n) for r in vocab.collect()] == [(("aaaa",), 3)]

    import pytest

    with pytest.raises(ValueError, match="n_merges"):
        bpe_train(df, "text", n_merges=0)


import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # user
        st.sampled_from(["s", "v", "c", "p"]),
        st.integers(min_value=0, max_value=3000),  # seconds offset
    ),
    min_size=1,
    max_size=40,
)


@SLOW
@given(EVENTS)
def test_funnel_counts_matches_python_twin(spark, events):
    from dish_data_pipeline_spark.ops.timeseries import funnel_counts

    base = dt.datetime(2024, 5, 1)
    rows = [
        Row(user_id=u, event_type=t, ts=base + dt.timedelta(seconds=s))
        for u, t, s in events
    ]
    steps = [(n, F.col("event_type") == n[0]) for n in ("sstep", "vstep", "cstep")]
    got = funnel_counts(
        spark.createDataFrame(rows), "user_id", "ts", steps
    ).collect()[0]

    counts = {"sstep": 0, "vstep": 0, "cstep": 0}
    for u in {e[0] for e in events}:
        mine = [(t, s) for uu, t, s in events if uu == u]
        prev = None
        for idx, name in enumerate(("sstep", "vstep", "cstep")):
            qual = [
                s for t, s in mine
                if t == name[0] and (idx == 0 or s > prev)
            ]
            if not qual:
                break
            prev = min(qual)
            counts[name] += 1
    assert (got["n_sstep"], got["n_vstep"], got["n_cstep"]) == (
        counts["sstep"], counts["vstep"], counts["cstep"]
    )


@SLOW
@given(EVENTS)
def test_sessionize_matches_python_twin(spark, events):
    from dish_data_pipeline_spark.ops.timeseries import sessionize

    GAP = 600
    base = dt.datetime(2024, 5, 1)
    rows = [
        Row(event_id=i, user_id=u, ts=base + dt.timedelta(seconds=s))
        for i, (u, _t, s) in enumerate(events)
    ]
    got = sorted(
        (r.user_id, r.session_seq, r.n_events, r.duration_sec)
        for r in sessionize(
            spark.createDataFrame(rows), "ts", ["user_id"], GAP,
            tiebreakers=["event_id"],
        ).collect()
    )
    twin = []
    for u in {e[0] for e in events}:
        secs = sorted(
            (s, i) for i, (uu, _t, s) in enumerate(events) if uu == u
        )
        sessions: list[list[int]] = []
        prev = None
        for s, _i in secs:
            if prev is None or s - prev >= GAP:
                sessions.append([s])
            else:
                sessions[-1].append(s)
            prev = s
        for seq, sess in enumerate(sessions, start=1):
            twin.append((u, seq, len(sess), max(sess) - min(sess)))
    assert got == sorted(twin)


def test_snapshot_diff_changed_only_and_summary(spark):
    from dish_data_pipeline_spark.operators.diff import diff_summary, snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "k int, v string"
    )
    full = snapshot_diff(old, new, ["k"])
    assert {r.k: r.change_type for r in full.collect()} == {
        1: "unchanged", 2: "update", 3: "delete", 4: "insert"
    }
    delta = snapshot_diff(old, new, ["k"], include_unchanged=False)
    assert sorted(r.k for r in delta.collect()) == [2, 3, 4]
    summary = {
        r.change_type: r.n_rows for r in diff_summary(old, new, ["k"]).collect()
    }
    assert summary == {"unchanged": 1, "update": 1, "delete": 1, "insert": 1}


@SLOW
@given(WORDS)
def test_bpe_segment_matches_twin_and_train_vocab(spark, words):
    from dish_data_pipeline_spark.ops.text import bpe_segment

    texts = [" ".join(words[i : i + 5]) for i in range(0, len(words), 5)]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id int, text string")
    merges, vocab = bpe_train(df, "text", n_merges=3)
    got = {
        r.doc_id: list(r.tokens)
        for r in bpe_segment(df, merges, "text").collect()
    }
    for i, t in enumerate(texts):
        toks = []
        for w in re.findall("[A-Za-z0-9]+", t.lower()):
            syms = list(w)
            for _s, left, right, _c in merges:
                acc = []
                for s in syms:
                    if acc and acc[-1] == left and s == right:
                        acc[-1] = left + right
                    else:
                        acc.append(s)
                syms = acc
            toks.extend(syms)
        assert got[i] == toks, (i, t)
    # replaying the merges over the training corpus reproduces the
    # trained vocab's segmentation for every word of length >= 2
    trained = {tuple(r.syms) for r in vocab.collect()}
    per_word = set()
    for t in texts:
        for w in re.findall("[A-Za-z0-9]+", t.lower()):
            if len(w) < 2:
                continue
            syms = list(w)
            for _s, left, right, _c in merges:
                acc = []
                for s in syms:
                    if acc and acc[-1] == left and s == right:
                        acc[-1] = left + right
                    else:
                        acc.append(s)
                syms = acc
            per_word.add(tuple(syms))
    assert per_word == trained


def test_doc_lm_scores_known_values(spark):
    from dish_data_pipeline_spark.ops.text import doc_lm_scores

    # corpus bigrams: (a,b)x2 from doc0+doc1, (b,a)x1, (b,c)x1
    # ctx: n(a)=2, n(b)=2 -> p(b|a)=1.0, p(a|b)=0.5, p(c|b)=0.5
    df = spark.createDataFrame(
        [(0, "a b c"), (1, "a b"), (2, "b a")],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in doc_lm_scores(df).collect()}
    assert out[0].n_bigrams == 2 and abs(out[0].lm_score - 0.75) < 1e-9
    assert out[1].n_bigrams == 1 and abs(out[1].lm_score - 1.0) < 1e-9
    assert out[2].n_bigrams == 1 and abs(out[2].lm_score - 0.5) < 1e-9


def test_stream_debounce_custom_key_schema(spark, tmp_path):
    """Non-default key_cols: output schema and labels derive from the
    input schema (round-6 fix — was hardcoded to user_id/event_type)."""
    import json

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from dish_data_pipeline_spark.streaming.stateful import stream_debounce

    schema = StructType(
        [
            StructField("device", StringType()),
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
        ]
    )
    indir = tmp_path / "in"
    indir.mkdir()
    rows = [
        {"device": "d1", "event_id": 0, "ts": "2024-01-01T00:00:00Z"},
        {"device": "d1", "event_id": 1, "ts": "2024-01-01T00:00:03Z"},
        {"device": "d2", "event_id": 2, "ts": "2024-01-01T00:00:04Z"},
        {"device": "d1", "event_id": 3, "ts": "2024-01-01T00:00:12Z"},
    ]
    with open(indir / "b1.json", "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows) + "\n")
    stream = spark.readStream.schema(schema).json(str(indir))
    out = stream_debounce(stream, 10, key_cols=("device",))
    assert [f.name for f in out.schema.fields] == ["device", "event_id", "ts"]
    assert out.schema["device"].dataType == StringType()
    q = (
        out.writeStream.format("memory")
        .queryName("debounced_custom")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.device, r.event_id)
        for r in spark.sql("SELECT * FROM debounced_custom").collect()
    }
    assert got == {("d1", 0), ("d2", 2), ("d1", 3)}

    import pytest

    with pytest.raises(ValueError, match="absent"):
        stream_debounce(stream, 10, key_cols=("nope",))


def test_stream_zscore_matches_batch_statistic_across_batches(spark, tmp_path):
    """Feeding a series through stream_zscore in TWO micro-batches
    reproduces the batch rolling_zscore statistic on the same rows
    (trailing-3 window carried through the state store)."""
    import json
    import math

    from pyspark.sql.types import (
        DoubleType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from dish_data_pipeline_spark.streaming.stateful import stream_zscore

    series = [10.0, 11.0, 13.0, 30.0, 12.0, 11.5]
    schema = StructType(
        [
            StructField("k", StringType()),
            StructField("ts", TimestampType()),
            StructField("value", DoubleType()),
        ]
    )
    indir = tmp_path / "in"
    indir.mkdir()

    def ev(i, v):
        return json.dumps({"k": "a", "ts": f"2024-01-01T00:{i:02d}:00Z", "value": v})

    with open(indir / "b1.json", "w") as f:
        f.write("\n".join(ev(i, v) for i, v in enumerate(series[:3])) + "\n")
    with open(indir / "b2.json", "w") as f:
        f.write("\n".join(ev(i + 3, v) for i, v in enumerate(series[3:])) + "\n")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(indir))
    )
    q = (
        stream_zscore(stream, key_cols=("k",), window_rows=3, threshold=2.0)
        .writeStream.format("memory")
        .queryName("zscored")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.ts.minute: (r.zscore, r.is_anomaly)
        for r in spark.sql("SELECT * FROM zscored").collect()
    }
    assert len(got) == len(series)
    # python twin of the shared trailing-window statistic
    for i, x in enumerate(series):
        trail = series[max(0, i - 3) : i]
        n = len(trail)
        expect = None
        if n >= 2:
            mean = sum(trail) / n
            var = sum(u * u for u in trail) / n - mean * mean
            if var > 0:
                expect = (x - mean) / math.sqrt(var)
        z, flag = got[i]
        if expect is None:
            assert z is None and flag is False
        else:
            assert abs(z - expect) < 1e-12
            assert flag == (abs(expect) > 2.0)
    # index 3 (value 30 after 10,11,13) must flag
    assert got[3][1] is True


def test_funnel_times_guards(spark):
    from dish_data_pipeline_spark.ops.timeseries import funnel_times

    df = spark.createDataFrame(
        [(1, "s", 1)], "user_id int, event_type string, ts int"
    )
    import pytest

    with pytest.raises(ValueError, match="non-empty"):
        funnel_times(df, "user_id", "ts", [])
    dup = [("a", F.col("event_type") == "s"), ("a", F.col("event_type") == "v")]
    with pytest.raises(ValueError, match="duplicate"):
        funnel_times(df, "user_id", "ts", dup)
    clash = [("event_type", F.col("event_type") == "s")]
    df2 = df.withColumn("event_type_ts", F.lit(1))
    with pytest.raises(ValueError, match="clashing"):
        funnel_times(df2, "user_id", "ts", clash)


def test_kmv_overlap_estimate_accuracy_and_exact_tail(spark):
    from dish_data_pipeline_spark.ops.sketch import kmv_overlap_estimate

    # |A| = 3000, |B| = 2000, |A∩B| = 1000 (ids 2000-2999)
    a = spark.range(0, 3000).selectExpr("id AS k")
    b = spark.range(2000, 4000).selectExpr("id AS k")
    row = kmv_overlap_estimate(
        a, b, "cast(k as string)", "cast(k as string)", k=256
    ).collect()[0]
    assert row.n_sketch == 256
    # KMV error ~ 1/sqrt(k) ≈ 6%; allow 4 sigma
    assert abs(row.est_union - 4000) / 4000 < 0.25
    assert abs(row.est_intersection - 1000) / 1000 < 0.45
    assert 0.0 < row.jaccard < 1.0

    # fewer distinct keys than k -> sketch IS the exact universe
    small_a = spark.range(0, 30).selectExpr("id AS k")
    small_b = spark.range(20, 50).selectExpr("id AS k")
    r2 = kmv_overlap_estimate(
        small_a, small_b, "cast(k as string)", "cast(k as string)", k=256
    ).collect()[0]
    assert r2.n_sketch == 50
    assert r2.est_union == 50.0
    assert abs(r2.est_intersection - 10.0) < 1e-9

    import pytest

    with pytest.raises(ValueError, match="k must be"):
        kmv_overlap_estimate(a, b, "k", "k", k=1)


def test_pagerank_matches_integer_twin_and_ranks_hub_first(spark):
    from dish_data_pipeline_spark.ops.graph import PR_SCALE, pagerank

    # star graph: hub h connected to a,b,c (undirected)
    und = [("h", "a"), ("h", "b"), ("h", "c")]
    edges = und + [(d, s) for s, d in und]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.pr_q for r in pagerank(df, n_iter=3).collect()}

    # integer twin
    nodes = sorted({n for e in edges for n in e})
    deg = {}
    for s, _d in edges:
        deg[s] = deg.get(s, 0) + 1
    n = len(nodes)
    base = (15 * PR_SCALE) // (100 * n)
    pr = {v: PR_SCALE // n for v in nodes}
    for _ in range(3):
        nxt = {v: base for v in nodes}
        for s, d in edges:
            nxt[d] += (85 * pr[s]) // (100 * deg[s])
        pr = nxt
    assert got == pr
    # hub outranks leaves; leaves tie exactly (integer determinism)
    assert got["h"] > got["a"] == got["b"] == got["c"]
    # mass is conserved up to the documented floor loss
    assert sum(got.values()) <= PR_SCALE
    assert sum(got.values()) > PR_SCALE - len(edges) * 3 - n * 3

    import pytest

    with pytest.raises(ValueError, match="n_iter"):
        pagerank(df, n_iter=0)
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping_num=0)


def test_weighted_sample_rate_tracks_weight_and_is_reproducible(spark):
    from dish_data_pipeline_spark.ops.sampling import weighted_sample

    df = spark.range(20000).selectExpr(
        "id AS k",
        # weights 0.25 / 0.5 / 1.0 in equal thirds
        "CAST(CASE id % 3 WHEN 0 THEN 0.25 WHEN 1 THEN 0.5 ELSE 1.0 END"
        " AS DOUBLE) AS w",
    )
    kept = weighted_sample(df, ["k"], "w", base_rate=0.6)
    by_w = {
        r.w: r.n
        for r in kept.groupBy("w").count().withColumnRenamed("count", "n").collect()
    }
    # expected keep rates: 0.15 / 0.30 / 0.60 of ~6667 each
    for w, expect in [(0.25, 0.15), (0.5, 0.30), (1.0, 0.60)]:
        got = by_w[w] / (20000 / 3)
        assert abs(got - expect) < 0.03, (w, got)
    # reproducible; different salt = different draw
    again = weighted_sample(df, ["k"], "w", base_rate=0.6)
    assert kept.exceptAll(again).count() == 0
    other = weighted_sample(df, ["k"], "w", base_rate=0.6, salt="other")
    assert other.exceptAll(kept).count() > 0
    # weights > 1/base_rate cap at probability 1 (everything kept)
    allkept = weighted_sample(
        df.selectExpr("k", "CAST(99.0 AS DOUBLE) AS w"), ["k"], "w", 0.6
    )
    assert allkept.count() == 20000

    import pytest

    with pytest.raises(ValueError, match="base_rate"):
        weighted_sample(df, ["k"], "w", 0)


def test_pagerank_empty_edges_raises(spark):
    import pytest

    from dish_data_pipeline_spark.ops.graph import pagerank

    empty = spark.createDataFrame([], "src string, dst string")
    with pytest.raises(ValueError, match="empty"):
        pagerank(empty)


def test_sessionize_rejects_reserved_extra_agg_names(spark):
    import pytest

    from dish_data_pipeline_spark.ops.timeseries import sessionize

    df = spark.createDataFrame(
        [(1, 1, dt.datetime(2024, 1, 1))], "event_id int, user_id int, ts timestamp"
    )
    with pytest.raises(ValueError, match="clash"):
        sessionize(df, "ts", ["user_id"], 60,
                   extra_aggs={"n_events": F.count(F.lit(1))})


def test_stream_zscore_null_value_does_not_poison_window(spark, tmp_path):
    import json

    from pyspark.sql.types import (
        DoubleType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from dish_data_pipeline_spark.streaming.stateful import stream_zscore

    schema = StructType(
        [
            StructField("k", StringType()),
            StructField("ts", TimestampType()),
            StructField("value", DoubleType()),
        ]
    )
    indir = tmp_path / "in"
    indir.mkdir()
    rows = [
        {"k": "a", "ts": "2024-01-01T00:00:00Z", "value": 10.0},
        {"k": "a", "ts": "2024-01-01T00:01:00Z", "value": 11.0},
        {"k": "a", "ts": "2024-01-01T00:02:00Z", "value": None},
        {"k": "a", "ts": "2024-01-01T00:03:00Z", "value": 13.0},
        {"k": "a", "ts": "2024-01-01T00:04:00Z", "value": 400.0},  # spike
    ]
    with open(indir / "b1.json", "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows) + "\n")
    stream = spark.readStream.schema(schema).json(str(indir))
    q = (
        stream_zscore(stream, key_cols=("k",), window_rows=3, threshold=2.0)
        .writeStream.format("memory")
        .queryName("zscored_null")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.ts.minute: (r.value, r.zscore, r.is_anomaly)
        for r in spark.sql("SELECT * FROM zscored_null").collect()
    }
    assert len(got) == 5
    assert got[2] == (None, None, False)  # the NULL row itself
    # the spike right after the NULL is still flagged — the NULL
    # occupies a ROWS-frame slot (window slots = [11, None, 13], the
    # batch semantics), and the stats skip it instead of going NaN
    assert got[4][2] is True and got[4][1] is not None
