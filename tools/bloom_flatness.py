"""Isolate the bloom-indexed WRITE from the read for the two
lakehouse write-roundtrip certifications and measure per-row
throughput across scale decades.

SCALING.md's sf0.1→sf1.0 table shows `bloom_point_lookup` (11.57×)
and `forget_user_roundtrip` (11.50×) as the only ≥10× growth entries,
explained there as linear-with-write-amplification: both queries
WRITE a bloom-indexed manifest table before querying it, so their
wall is dominated by the write. This tool converts that argument
into a measurement: it times ONLY the bloom-indexed `create()` (the
write-amplified step — parquet encode + per-file min/max stats +
per-file bloom build) on the `orders` table at each given scale and
reports rows/sec. Flat rows/sec (±20%) across a decade = the step is
linear and the ≥10× entries are write volume, not a superlinear
plan.

    python tools/bloom_flatness.py <sf_dir> [<sf_dir> ...] [--sweeps 3]

Appends nothing; prints one JSON line (paste into SCALING.md's
appendix).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dish_data_pipeline_spark import get_spark  # noqa: E402
from dish_data_pipeline_spark.io import read_parquet  # noqa: E402
from dish_data_pipeline_spark.io_backends import (  # noqa: E402
    ManifestParquetBackend,
)


def time_bloom_create(spark, sf_dir: str) -> tuple[int, float]:
    """One timed bloom-indexed create of the orders table, exactly
    the write step of q_bloom_point_lookup/q_forget_user_roundtrip
    (8 orderkey-range files, min/max stats on o_orderkey, bloom on
    o_custkey). The input is cached first so the measurement is the
    WRITE, not the scan."""
    o = read_parquet(spark, os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    o = o.repartitionByRange(8, F.col("o_orderkey")).sortWithinPartitions(
        "o_orderkey"
    )
    o.persist()
    n = o.count()  # materialize input outside the timed region
    path = os.path.join(
        tempfile.gettempdir(), f"bloomflat_{os.getpid()}_{time.time_ns()}"
    )
    be = ManifestParquetBackend()
    t0 = time.perf_counter()
    be.create(o, path, stats_cols=["o_orderkey"], bloom_cols=["o_custkey"])
    dt = time.perf_counter() - t0
    o.unpersist()
    shutil.rmtree(path, ignore_errors=True)
    return n, dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dirs", nargs="+")
    ap.add_argument("--sweeps", type=int, default=3)
    args = ap.parse_args()
    spark = get_spark()
    results = {}
    for sf_dir in args.sf_dirs:
        times = []
        n = 0
        for _ in range(args.sweeps):
            n, dt = time_bloom_create(spark, sf_dir)
            times.append(dt)
        med = statistics.median(times)
        results[sf_dir] = {
            "rows": n,
            "median_write_sec": round(med, 3),
            "sweeps_sec": [round(t, 3) for t in times],
            "rows_per_sec": round(n / med),
        }
        print(f"{sf_dir}: {n} rows, median {med:.2f}s, "
              f"{n / med:,.0f} rows/s", file=sys.stderr)
    rates = [r["rows_per_sec"] for r in results.values()]
    summary = {
        "metric": "bloom_indexed_create_rows_per_sec",
        "results": results,
        "max_over_min_rate": round(max(rates) / min(rates), 3),
        "flat_within_20pct": max(rates) / min(rates) <= 1.25,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
