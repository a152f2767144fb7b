"""Scalar-function library: named equivalents of the reference's
X1-X9 surface (SURVEY.md §2.9) plus the determinism helpers the
oracle suite relies on.

All are thin wrappers over ``pyspark.sql.functions`` — they exist to
make reference-parity auditable (one name per X-row) and to keep the
non-ANSI/UTC semantics in one place.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_json_str(col: Column | str) -> Column:
    """X1 — complex value → JSON string (reference json.dumps,
    pipeline/data_pipeline.py:22)."""
    return F.to_json(F.col(col) if isinstance(col, str) else col)


def utc_now() -> Column:
    """X2 — current UTC timestamp (requires UTC session tz, which
    session.get_spark pins; reference pd.Timestamp.now(tz='UTC'))."""
    return F.current_timestamp()


def fmt_date(col: Column | str, fmt: str = "yyyy-MM-dd") -> Column:
    """X3 — date → string (reference .strftime('%Y-%m-%d'))."""
    return F.date_format(col, fmt)


def safe_to_date(col: Column | str) -> Column:
    """X4 — string → date with invalid → null (reference
    pd.to_datetime(errors='coerce'); requires non-ANSI mode, which
    plans.common.ensure_session_confs pins)."""
    return F.to_date(col)


def as_string(col: Column | str) -> Column:
    """X5/X8 — any → string (reference astype(str) / CAST AS STRING)."""
    return (F.col(col) if isinstance(col, str) else col).cast("string")


def safe_to_timestamp(col: Column | str) -> Column:
    """X6 — string → tz-aware-UTC timestamp (UTC session)."""
    return F.to_timestamp(col)


def date_key(col: Column | str) -> Column:
    """X7 — timestamp/date normalize for join predicates (reference
    date() in the MERGE key)."""
    return F.to_date(col)


def is_recoverable_issue(issue: str) -> bool:
    """X9 — the driver-side 'duplicate' containment routing."""
    from dish_data_pipeline_spark.operators.quality import is_recoverable

    return is_recoverable(issue)


def decimal_sum(col: Column | str, scale: int = 6) -> Column:
    """Order-independent double sum (exact decimal accumulation) —
    the engine's determinism contract for float aggregates."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(38,{scale})")).cast("double")


def sequential_dot(a: str, b: str) -> Column:
    """Deterministic sequential-fold dot product over two array
    columns (see ops.similarity.DOT_EXPR)."""
    from dish_data_pipeline_spark.ops.similarity import dot

    return dot(a, b)


__all__ = [
    "to_json_str",
    "utc_now",
    "fmt_date",
    "safe_to_date",
    "as_string",
    "safe_to_timestamp",
    "date_key",
    "is_recoverable_issue",
    "decimal_sum",
    "sequential_dot",
]
