"""Query catalog: every operator from SURVEY.md §2 (+ §2.13
extensions) expressed as a named (spark_fn, oracle_sql) pair.

``QUERIES[name].fn`` takes ``(spark, sf_dir)`` and returns a
DataFrame; ``QUERIES[name].sql`` is the DuckDB-equivalent ANSI SQL
(None for genuinely non-SQL-expressible ops, which get rows-only
checks). This backs ``__spark_entry__.queries()`` /
``oracle_sql()``.

The driver certifies entries in dict order under a bounded budget
(~50 per round), so ``QUERIES`` presents the catalog in
least-recently-driver-verified order. That ordering is GENERATED
(``plans/rotation.py``, written by ``tools/gen_rotation_head.py``
from the recorded ``CORRECTNESS_r*.json`` history) — regenerate it
when adding catalog queries; ``tests/test_queries.py`` fails if it
goes stale.
"""

from dish_data_pipeline_spark.plans.common import QueryDef
from dish_data_pipeline_spark.plans.parity import PARITY_QUERIES
from dish_data_pipeline_spark.plans.breadth import BREADTH_QUERIES
from dish_data_pipeline_spark.plans.analytics import ANALYTICS_QUERIES
from dish_data_pipeline_spark.plans.tpch_extra import TPCH_EXTRA_QUERIES
from dish_data_pipeline_spark.plans.extensions import EXTENSION_QUERIES
from dish_data_pipeline_spark.plans.rotation import DRIVER_ROTATION_ORDER

_ALL: dict[str, QueryDef] = {
    **PARITY_QUERIES,
    **BREADTH_QUERIES,
    **ANALYTICS_QUERIES,
    **TPCH_EXTRA_QUERIES,
    **EXTENSION_QUERIES,
}


def catalog_definition_order() -> list[str]:
    """Catalog names in module-definition order — the tiebreak the
    rotation generator uses for never-driver-verified queries."""
    return list(_ALL)


# Rotation list and catalog are maintained separately; tolerate a
# mid-edit skew (new query not yet regenerated) by appending
# stragglers in definition order rather than KeyError-ing the whole
# package import. The test suite still flags the staleness.
QUERIES: dict[str, QueryDef] = {
    name: _ALL[name] for name in DRIVER_ROTATION_ORDER if name in _ALL
}
QUERIES.update(
    {name: qd for name, qd in _ALL.items() if name not in QUERIES}
)

__all__ = ["QUERIES", "QueryDef", "catalog_definition_order"]
