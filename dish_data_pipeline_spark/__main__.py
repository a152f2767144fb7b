"""CLI entry: run feeds end to end or catalog queries.

Reference parity: ``python pipeline/data_pipeline.py --run_type full``
(pipeline/data_pipeline.py:274-278) — except the reference parses
``--run_type`` and never uses it (defect ledger item 1); here the
flag actually selects behavior.

    python -m dish_data_pipeline_spark feed --name daily_visits \
        --base-url http://api --warehouse /data/wh
    python -m dish_data_pipeline_spark query --name pricing_summary \
        --sf-dir /root/testdata/sf0.01
"""

from __future__ import annotations

import argparse
import sys

from dish_data_pipeline_spark import get_spark


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="dish_data_pipeline_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    feed_p = sub.add_parser("feed", help="run one ingestion feed end to end")
    feed_p.add_argument("--name", required=True)
    feed_p.add_argument("--endpoint", default=None)
    feed_p.add_argument("--base-url", required=True)
    feed_p.add_argument("--warehouse", required=True)
    feed_p.add_argument("--keys", default="visit_date,source_file")
    feed_p.add_argument("--required", default="visit_date,total_visits")

    query_p = sub.add_parser("query", help="run a catalog query and show it")
    query_p.add_argument("--name", required=True)
    query_p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    query_p.add_argument("--limit", type=int, default=20)
    query_p.add_argument("--explain", action="store_true")

    args = parser.parse_args(argv)
    spark = get_spark("dish-data-pipeline-cli")

    if args.cmd == "feed":
        from dish_data_pipeline_spark.pipeline import FeedConfig, run_feed

        feed = FeedConfig(
            name=args.name,
            endpoint=args.endpoint or args.name,
            keys=args.keys.split(","),
            required=args.required.split(","),
        )
        res = run_feed(spark, feed, args.base_url, args.warehouse)
        print(f"{res.table}: {res.status} ({res.record_count} rows)")
        for issue in res.issues:
            print(f"  issue: {issue}")
        return 0 if res.status == "SUCCESS" else 1

    from dish_data_pipeline_spark.plans import QUERIES

    if args.name not in QUERIES:
        print(f"unknown query {args.name!r}; known: {', '.join(sorted(QUERIES))}")
        return 2
    df = QUERIES[args.name].fn(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
