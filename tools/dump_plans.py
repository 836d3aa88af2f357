"""Dump .explain("formatted") for named queries to plans/<tag>/<name>_<suffix>.txt.

Usage: python tools/dump_plans.py <suffix> <name> [<name> ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       DFDQ_PLANS_TAG     (default r17)

Plan capture only — the DataFrame is built (lifecycle queries run their
scenario actions) but the terminal action is never collected, so the
dump reflects the declared query's final plan shape.
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag = os.environ.get("DFDQ_PLANS_TAG", "r17")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    out_dir = os.path.join(repo, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    from datafusion_delta_queries_spark.operators import registry
    from datafusion_delta_queries_spark.operators.llm_pipeline import (
        release_shared,
    )
    from datafusion_delta_queries_spark.session import get_spark

    spark = get_spark("dfdq-plans")
    queries, _ = registry()
    for name in names:
        fn = queries.get(name)
        if fn is None:
            print(f"SKIP unknown query {name}", file=sys.stderr)
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # keep going; record the failure
            plan = f"PLAN CAPTURE FAILED: {ex}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        release_shared()
        print(f"dumped {name}_{suffix}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
