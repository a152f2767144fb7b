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
# FIRST. Round-5 rotation: new queries (zero driver history) lead,
# followed by the 43 queries whose last green driver row is round 3
# (round 4 spent its 50-row budget on the then-unchecked head,
# pushing these past the cutoff). The 50 queries certified fresh in
# round 4 (CORRECTNESS_r04.json, all green) rotate to the back.
_DRIVER_UNCHECKED_HEAD = [
    # new this round — zero driver history
    "min_cost_supplier",  # TPC-H Q2 (correlated MIN)
    "important_parts",  # TPC-H Q11 (HAVING vs global scalar)
    "supplier_part_counts",  # TPC-H Q16 (NOT IN + count-distinct)
    "excess_ship_suppliers",  # TPC-H Q20 (nested IN chain)
    "domain_quota",  # per-domain cap (WindowGroupLimit)
    "gap_fill_events",  # hourly resample + forward fill
    "corpus_drift",  # per-source distribution divergence
    "bpe_pairs",  # BPE pair counting (tokenizer induction)
    "bigram_lm",  # bigram + continuation counts
    "snapshot_diff_orders",  # keyed reconciliation delta
    "funnel_conversion",  # ordered-step funnel counts
    "cohort_retention",  # cohort × month retention matrix
    "debounce_events",  # burst collapse (gap-chain first event)
    "anomaly_events",  # gap-filled trailing z-score flags
    "order_priority_check",  # TPC-H Q4 (EXISTS)
    "shipmode_priority",  # TPC-H Q12 (2-branch conditional agg)
    "small_qty_avg_gate",  # TPC-H Q17 (correlated scalar avg)
    "waiting_suppliers",  # TPC-H Q21 (EXISTS + NOT EXISTS)
    # last driver row r3 — not re-checked in round 4
    "scalar_casts",
    "upsert_orders",
    "upsert_keep_latest",
    "semi_anti_join",
    "pricing_summary",
    "topk_revenue",
    "region_revenue",
    "window_running",
    "rolling_window",
    "volume_shipping",
    "market_share",
    "product_profit",
    "winnow_fingerprint",
    "minhash_neardup",
    "simhash_neardup",
    "ngram_jaccard",
    "knn_quantized",
    "knn_lsh",
    "knn_ivf",
    "multimodal_meta",
    "multimodal_features",
    "dup_clusters",
    "training_corpus",
    "doc_sample",
    "text_clean",
    "repetition_stats",
    "gopher_quality",
    "contamination",
    "corpus_mix",
    "corpus_mix_tokens",
    "incremental_dedup",
    "segment_dedup",
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
]

QUERIES: dict[str, QueryDef] = {name: _ALL[name] for name in _DRIVER_UNCHECKED_HEAD}
QUERIES.update(
    {name: qd for name, qd in _ALL.items() if name not in _DRIVER_UNCHECKED_HEAD}
)

__all__ = ["QUERIES", "QueryDef"]
