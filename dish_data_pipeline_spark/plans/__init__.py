"""Query catalog: every operator from SURVEY.md §2 (+ §2.13
extensions) expressed as a named (spark_fn, oracle_sql) pair.

``QUERIES[name].fn`` takes ``(spark, sf_dir)`` and returns a
DataFrame; ``QUERIES[name].sql`` is the DuckDB-equivalent ANSI SQL
(None for genuinely non-SQL-expressible ops, which get rows-only
checks). This backs ``__spark_entry__.queries()`` /
``oracle_sql()``.
"""

from dish_data_pipeline_spark.plans.common import QueryDef
from dish_data_pipeline_spark.plans.parity import PARITY_QUERIES
from dish_data_pipeline_spark.plans.breadth import BREADTH_QUERIES
from dish_data_pipeline_spark.plans.analytics import ANALYTICS_QUERIES
from dish_data_pipeline_spark.plans.tpch_extra import TPCH_EXTRA_QUERIES
from dish_data_pipeline_spark.plans.extensions import EXTENSION_QUERIES

_ALL: dict[str, QueryDef] = {
    **PARITY_QUERIES,
    **BREADTH_QUERIES,
    **ANALYTICS_QUERIES,
    **TPCH_EXTRA_QUERIES,
    **EXTENSION_QUERIES,
}

# The driver checks entries in dict order under a bounded budget
# (~50 rows per round), so the LEAST-driver-verified queries go
# FIRST. Round-6 rotation: new queries (zero driver history) lead,
# then the 11 queries whose last green driver row is round 3
# (positions 51-61 of the round-5 head, past the 50-row budget),
# then the 50 certified in round 4 (CORRECTNESS_r04.json order); the
# 50 certified fresh in round 5 rotate to the back.
_DRIVER_UNCHECKED_HEAD = [
    # new this round — zero driver history
    "shard_plan",  # training-shard manifest (portable hash)
    "key_skew_profile",  # heavy-key diagnostic for salting decisions
    "join_overlap_estimate",  # KMV union/Jaccard/intersection sketch
    "trade_pagerank",  # integer-exact PageRank (unrolled-CTE oracle)
    "quality_weighted_sample",  # continuous-weight deterministic sampling
    "doc_lm_score",  # bigram-LM fluency score (log-free)
    "bpe_merges",  # iterative BPE merge loop (rows-only)
    "funnel_steps",  # parameterized 4-stage funnel
    "diff_summary_orders",  # reconciliation per-type counts
    # last driver row r3 — past the budget cutoff in rounds 4 AND 5
    "lsh_quality",
    "pii_redaction",
    "distinct_sketch",
    "corpus_pipeline",
    "sketch_merge",
    "approx_quantiles",
    "dup_ngram_coverage",
    "vocab_topk",
    "tfidf_topterms",
    "doc_chunks",
    "embedding_dedup",
    # last driver row r4
    "sessionize",
    "sequence_packing",
    "cms_topk",
    "best_of_cluster",
    "customer_distribution",
    "zipf_buckets",
    "asof_nearest",
    "promo_revenue",
    "top_supplier",
    "rollup_events",
    "set_ops",
    "asof_signup",
    "range_bucket_join",
    "pivot_events",
    "unpivot_lineitem",
    "json_fields",
    "string_funcs",
    "date_funcs",
    "forecast_revenue",
    "small_qty_revenue",
    "cube_events",
    "raw_zone_roundtrip",
    "enrich_metadata",
    "partitioned_merge",
    "scd2_orders",
    "value_quantiles",
    "large_orders",
    "max_order_per_customer",
    "rank_suite",
    "sql_interface",
    "profile_events",
    "nation_trade",
    "returned_items",
    "disjunctive_revenue",
    "idle_rich_customers",
    "text_stats",
    "token_stats",
    "embedding_neardup",
    "language_id",
    "quality_score",
    "doc_fingerprint",
    "exact_dedup",
    "knn_bruteforce",
    "embedding_norms",
    "keep_latest_events",
    "dedup_first_wins",
    "dup_key_counts",
    "dq_summary",
    "flatten_struct",
    "sanitize_json",
]

QUERIES: dict[str, QueryDef] = {name: _ALL[name] for name in _DRIVER_UNCHECKED_HEAD}
QUERIES.update(
    {name: qd for name, qd in _ALL.items() if name not in _DRIVER_UNCHECKED_HEAD}
)

__all__ = ["QUERIES", "QueryDef"]
