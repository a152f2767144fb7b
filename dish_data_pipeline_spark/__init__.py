"""dish_data_pipeline_spark — a PySpark-native analytics engine.

A ground-up Spark re-expression of the capabilities of the reference
ETL pipeline (sujiram/dish-data-pipeline): paginated REST ingestion,
recursive JSON flattening, data-quality gating, staging loads,
MERGE-style upserts, and audit logging — plus large-scale
training-data operators (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB workloads.

Architecture: every operator is a pure ``DataFrame -> DataFrame``
function built on the DataFrame/SQL API so Catalyst owns the physical
plan (pushdown, pruning, join strategy, AQE). No custom Catalyst
rules are needed (SURVEY.md §4.2); custom code is confined to the
REST source, the upsert composition, and the DQ/audit library.
"""

__version__ = "0.1.0"

from dish_data_pipeline_spark.session import get_spark

__all__ = ["get_spark", "__version__"]
