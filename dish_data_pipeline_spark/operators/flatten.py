"""Nested-structure flattening and complex-column sanitizing.

Capability parity with the reference's ``json_normalize(records,
sep="_")`` flatten (reference pipeline/data_pipeline.py:73-76) and
``sanitize_dataframe``'s per-cell ``json.dumps`` of residual
list/dict values (reference pipeline/data_pipeline.py:20-23).

Spark-first design: both are *schema-driven projections* — a single
``select`` over expressions derived by walking ``df.schema``. No UDF,
no row-wise Python; the projection stays inside whole-stage codegen
and nested-schema pruning lets Catalyst prune unused struct leaves at
the parquet scan.

Note the reference does NOT explode arrays — ``json_normalize``
leaves list cells intact, which sanitize then stringifies. We mirror
that: arrays/maps are kept (or JSON-stringified by
``sanitize_complex_columns``), never exploded here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType, StructType


def _flatten_exprs(
    schema: StructType, prefix_path: str, prefix_name: str, sep: str
) -> list[Column]:
    cols: list[Column] = []
    for field in schema.fields:
        path = f"{prefix_path}`{field.name}`" if prefix_path else f"`{field.name}`"
        name = f"{prefix_name}{sep}{field.name}" if prefix_name else field.name
        if isinstance(field.dataType, StructType):
            cols.extend(_flatten_exprs(field.dataType, path + ".", name, sep))
        else:
            cols.append(F.col(path).alias(name))
    return cols


def flatten_struct_columns(df: DataFrame, sep: str = "_") -> DataFrame:
    """Recursively flatten struct columns: ``a.b.c`` → ``a_b_c``.

    Arbitrary nesting depth; arrays and maps are left as-is (same
    semantics as the reference's json_normalize, which only descends
    dicts). Pure projection — one ``select``, no shuffle.
    """
    return df.select(*_flatten_exprs(df.schema, "", "", sep))


def sanitize_complex_columns(df: DataFrame) -> DataFrame:
    """JSON-stringify every remaining Array/Map/Struct column.

    Vectorized replacement for the reference's row-wise
    ``apply(lambda x: json.dumps(x) ...)`` (reference
    pipeline/data_pipeline.py:20-23): schema tells us exactly which
    columns are complex, ``F.to_json`` converts them JVM-side.
    """
    exprs: list[Column] = []
    for field in df.schema.fields:
        if isinstance(field.dataType, (ArrayType, MapType, StructType)):
            exprs.append(F.to_json(F.col(f"`{field.name}`")).alias(field.name))
        else:
            exprs.append(F.col(f"`{field.name}`"))
    return df.select(*exprs)


def normalize_records(df: DataFrame, sep: str = "_") -> DataFrame:
    """Full F1+P3 pipeline: flatten structs, then stringify leftovers.

    Equivalent of the reference's ``flatten_and_clean`` core
    (pipeline/data_pipeline.py:73-82) minus metadata enrichment
    (see enrich.add_load_metadata).
    """
    return sanitize_complex_columns(flatten_struct_columns(df, sep=sep))
