"""The local oracle checker's dtype-class gate (tools/check_oracle.py)
must catch the two driver-hash drift classes that r8 proved the
float-value comparison hides:

- Spark decimal output fetches as object(Decimal) while the DuckDB
  twin fetches float64 (benford_prices: bare fractional literals
  typed decimal(17,17) vs DECIMAL(16,16));
- DuckDB SUM(BIGINT) fetches HUGEINT→float64 while Spark emits int64
  (collocation_lift marginals) — `123` vs `123.0` under the driver's
  canonicalization.

Pure pandas, no Spark session.
"""

from __future__ import annotations

import datetime as dt
import decimal
import os
import sys

import pandas as pd

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)
from check_oracle import compare, dtype_class  # noqa: E402


def test_dtype_classes():
    assert dtype_class(pd.Series([1, 2])) == "int"
    assert dtype_class(pd.Series([1.0, 2.5])) == "float"
    assert dtype_class(pd.Series([True, False])) == "bool"
    assert dtype_class(pd.Series(["a", None])) == "object"
    assert dtype_class(pd.Series([decimal.Decimal("0.5")])) == "decimal"
    assert dtype_class(pd.Series([dt.date(2024, 1, 1)])) == "datetime"
    assert dtype_class(pd.Series(pd.to_datetime(["2024-01-01"]))) == "datetime"
    assert dtype_class(pd.Series([None, None])) == "empty"


def test_compare_flags_decimal_vs_float_same_values():
    # identical VALUES — the r8 benford class: only the dtype drifts
    a = pd.DataFrame({"d": [1], "x": [decimal.Decimal("0.3010299956639812")]})
    b = pd.DataFrame({"d": [1], "x": [0.3010299956639812]})
    problems = compare("t", a, b)
    assert any("dtype class" in p for p in problems), problems


def test_compare_flags_int_vs_float_same_values():
    # the r8 collocation class: HUGEINT fetched as float64
    a = pd.DataFrame({"n": pd.Series([123, 456], dtype="int64")})
    b = pd.DataFrame({"n": pd.Series([123.0, 456.0], dtype="float64")})
    problems = compare("t", a, b)
    assert any("dtype class" in p for p in problems), problems


def test_compare_clean_on_matching_classes():
    a = pd.DataFrame({"n": [1, 2], "x": [0.5, 1.5], "s": ["a", "b"]})
    b = pd.DataFrame({"n": [2, 1], "x": [1.5, 0.5], "s": ["b", "a"]})
    assert compare("t", a, b) == []  # order-insensitive, classes match


def test_compare_still_reports_value_mismatch():
    a = pd.DataFrame({"x": [1.0]})
    b = pd.DataFrame({"x": [2.0]})
    assert any("mismatch" in p for p in compare("t", a, b))
