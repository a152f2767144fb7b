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
# FIRST. Round-4 rotation: the two round-3 red rows lead (sessionize
# crashed on TIMESTAMP_NTZ, sequence_packing's oracle returned an
# int128 column — both fixed this round and needing fresh driver
# certification), followed by the 36 queries whose last green driver
# row is round 1/2 (round 3 spent its 50-row budget on the
# then-unchecked head, pushing these past the cutoff). The 48
# queries certified fresh in round 3 rotate to the back.
_DRIVER_UNCHECKED_HEAD = [
    # round-3 red rows, fixed this round — certify first
    "sessionize",
    "sequence_packing",
    # new this round — zero driver history
    "cms_topk",
    "best_of_cluster",
    "customer_distribution",
    "zipf_buckets",
    "asof_nearest",
    "promo_revenue",
    "top_supplier",
    # last driver row r1/r2 — not re-checked in round 3
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
]

QUERIES: dict[str, QueryDef] = {name: _ALL[name] for name in _DRIVER_UNCHECKED_HEAD}
QUERIES.update(
    {name: qd for name, qd in _ALL.items() if name not in _DRIVER_UNCHECKED_HEAD}
)

__all__ = ["QUERIES", "QueryDef"]
