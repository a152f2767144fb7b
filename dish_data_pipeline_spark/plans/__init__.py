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

QUERIES: dict[str, QueryDef] = {
    **PARITY_QUERIES,
    **BREADTH_QUERIES,
    **ANALYTICS_QUERIES,
    **TPCH_EXTRA_QUERIES,
    **EXTENSION_QUERIES,
}

__all__ = ["QUERIES", "QueryDef"]
