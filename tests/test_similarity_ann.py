"""ANN variants vs brute force: recall sanity on the real
embeddings table (label clusters)."""

from __future__ import annotations

from dish_data_pipeline_spark.ops.similarity import (
    cosine_topk,
    ivf_topk,
    lsh_bucket_topk,
)
from dish_data_pipeline_spark.plans.common import read


def _truth(spark, sf_dir, qids, k):
    exact = cosine_topk(read(spark, sf_dir, "embeddings"), qids, k=k)
    out = {}
    for r in exact.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_ivf_recall_reasonable(spark, sf_dir):
    qids = [0, 1, 2]
    truth = _truth(spark, sf_dir, qids, 10)
    approx = ivf_topk(read(spark, sf_dir, "embeddings"), qids, k=10, n_probe=3)
    got = {}
    for r in approx.collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    # every query returns k candidates; recall over probed lists > 0
    hits = sum(len(truth[q] & got.get(q, set())) for q in qids)
    total = sum(len(truth[q]) for q in qids)
    assert hits / total >= 0.3, f"IVF recall {hits}/{total}"


def test_ivf_scores_match_bruteforce_on_overlap(spark, sf_dir):
    qids = [0]
    exact = {
        r.neighbor_id: r.cosine
        for r in cosine_topk(read(spark, sf_dir, "embeddings"), qids, k=10).collect()
    }
    approx = {
        r.neighbor_id: r.cosine
        for r in ivf_topk(read(spark, sf_dir, "embeddings"), qids, k=10).collect()
    }
    for nid in set(exact) & set(approx):
        assert exact[nid] == approx[nid]  # same scorer, bit-identical


def test_lsh_subset_of_corpus(spark, sf_dir):
    emb = read(spark, sf_dir, "embeddings")
    ids = {r.vec_id for r in emb.select("vec_id").collect()}
    out = lsh_bucket_topk(emb, [0, 1], k=5)
    for r in out.collect():
        assert r.neighbor_id in ids and r.neighbor_id not in (r.query_id,)
