"""Dump `.explain("formatted")` for catalog queries to plans/<round>/.

Usage: python tools/dump_plans.py <suffix> <query> [query ...]
Writes plans/$DISH_PLANS_ROUND (default r15)/<query>_<suffix>.txt. Runs each query's fn (some
catalog queries execute work eagerly inside fn; the captured plan is
the returned DataFrame's physical plan — for roundtrip/replay queries
that is the materialized-result plan, which is exactly what changes
when a driver collect() roundtrip is replaced by a JVM-side
checkpoint)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dish_data_pipeline_spark import get_spark
from dish_data_pipeline_spark.plans import QUERIES


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("DISH_PLANS_ROUND", "r15"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
