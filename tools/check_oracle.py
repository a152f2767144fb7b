"""Local replica of the driver's correctness gate.

Runs every catalog query via Spark AND its DuckDB oracle SQL on the
same parquet, then compares row count, column names, and sorted
values (exact for ints/strings/dates, exact-or-reported-diff for
doubles). Use before every commit:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dish_data_pipeline_spark import get_spark
from dish_data_pipeline_spark.io import TPCH_TABLES
from dish_data_pipeline_spark.plans import QUERIES


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None)
        elif s.dtype == object:
            import datetime as _dt

            non_null = s.dropna()
            if len(non_null) and all(
                isinstance(v, _dt.date) for v in non_null
            ):
                df[c] = pd.to_datetime(s)
            else:
                # lists / misc objects → string for stable sorting
                df[c] = s.map(lambda v: "<null>" if v is None else str(v))
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("boolean")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def dtype_class(s: pd.Series) -> str:
    """Coarse dtype class as the driver's value-hash would see it.

    The float comparison in compare() hides engine typing drift that
    the driver hash does NOT forgive: Spark decimal columns fetch as
    object(Decimal) while DuckDB DECIMAL/HUGEINT fetch as float64, and
    an int64-vs-float64 pair hashes as `123` vs `123.0`.  Classifying
    the *fetched* dtypes and demanding equality catches both classes
    (the r8 `benford_prices` / `collocation_lift` fails) before the
    driver does.
    """
    import datetime as _dt
    import decimal as _dec

    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    non_null = s.dropna()
    if len(non_null) == 0:
        return "empty"
    if all(isinstance(v, _dec.Decimal) for v in non_null):
        return "decimal"
    if all(isinstance(v, (_dt.date, _dt.datetime)) for v in non_null):
        return "datetime"
    return "object"


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count {len(spark_pdf)} vs {len(oracle_pdf)}")
    sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        problems.append(f"columns {sc} vs {oc}")
        return problems
    for c in sc:
        ca, cb = dtype_class(spark_pdf[c]), dtype_class(oracle_pdf[c])
        if "empty" in (ca, cb):
            continue
        if ca != cb:
            problems.append(f"col {c}: dtype class spark={ca} vs oracle={cb}")
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    if len(a) != len(b):
        return problems
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            avn = av.astype(float).to_numpy()
            bvn = bv.astype(float).to_numpy()
            both_nan = np.isnan(avn) & np.isnan(bvn)
            eq = (avn == bvn) | both_nan
            if not eq.all():
                diff = np.nanmax(np.abs(np.where(eq, 0, avn - bvn)))
                problems.append(
                    f"col {c}: {int((~eq).sum())} float mismatches, max |Δ|={diff:.3e}"
                )
        else:
            neq = ~(av.eq(bv) | (av.isna() & bv.isna()))
            if neq.any():
                i = int(neq.idxmax())
                problems.append(
                    f"col {c}: {int(neq.sum())} mismatches, first at row {i}: "
                    f"{av.iloc[i]!r} vs {bv.iloc[i]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TPCH_TABLES:
        # tables may be a single file (driver testdata) or a
        # directory of part files (scaled shards)
        p = os.path.join(sf_dir, f"{t}.parquet")
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
        )
    n_fail = 0
    for name, qd in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spdf = qd.fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL {name}: spark raised {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        if qd.sql is None:
            print(f"ok   {name}: rows-only, {len(spdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            opdf = con.execute(qd.sql).fetchdf()
        except Exception as exc:
            print(f"FAIL {name}: duckdb raised {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        problems = compare(name, spdf, opdf)
        if problems:
            n_fail += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"ok   {name}: {len(spdf)} rows match ({time.time()-t0:.1f}s)")
    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
