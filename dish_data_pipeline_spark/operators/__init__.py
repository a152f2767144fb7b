"""Operator library: pure ``DataFrame -> DataFrame`` functions.

One module per SURVEY.md §2 family:

- flatten  — F1 recursive struct flatten, P3 complex→JSON sanitize
- enrich   — P1/P2 load metadata, lineage, raw-zone partitions
- dedup    — D1 first-wins, D2 keyed, W1/D3 keep-latest window
- quality  — Q1-Q5 data-quality rule engine
- upsert   — J1/J2 MERGE-semantics upsert composition
- audit    — S4 audit-table rows
"""

from dish_data_pipeline_spark.operators.flatten import (
    flatten_struct_columns,
    sanitize_complex_columns,
)
from dish_data_pipeline_spark.operators.enrich import (
    add_load_metadata,
    with_date_partitions,
    with_lineage,
)
from dish_data_pipeline_spark.operators.dedup import (
    dedup_first_wins,
    dedup_keyed,
    keep_latest,
)
from dish_data_pipeline_spark.operators.quality import run_data_quality_checks
from dish_data_pipeline_spark.operators.upsert import upsert, upsert_keep_latest
from dish_data_pipeline_spark.operators.audit import audit_row

__all__ = [
    "flatten_struct_columns",
    "sanitize_complex_columns",
    "add_load_metadata",
    "with_date_partitions",
    "with_lineage",
    "dedup_first_wins",
    "dedup_keyed",
    "keep_latest",
    "run_data_quality_checks",
    "upsert",
    "upsert_keep_latest",
    "audit_row",
]
