"""Capture .explain("formatted") for every bench headline query into
plans/<round>/<query>_<tag>.txt (tag = before/after; round from
$PLANS_ROUND, default r14).

Usage: python tools/capture_plans.py <tag> [query ...]
Driver-side only (planning, no execution) — safe to run beside a bench.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from druid_spark import DruidSparkEngine
from druid_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("PLANS_OUT") or os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans", os.environ.get("PLANS_ROUND", "r14"))


def formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("capture_plans", cpus=4)
    engine = DruidSparkEngine(spark, data_dir=SF_DIR)
    import bench
    queries = bench.build_queries(engine)
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            p = formatted(fn())
        except Exception as e:
            p = f"ERROR: {type(e).__name__}: {e}"
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(p)
        print(f"wrote {path} ({len(p)} bytes)")


if __name__ == "__main__":
    main()
