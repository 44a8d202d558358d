"""Capture .explain("formatted") for a list of registered queries.

Usage: python examples/capture_plans.py <suffix> <query> [<query> ...]

Writes plans/$SPARK_GRAFT_PLAN_ROUND (default r10)/<query>_<suffix>.txt
for each named query. The plan
is taken from the DataFrame the query builder returns; streaming ops
therefore capture their grade-tail plan (their trigger work happens
inside foreachBatch and is audited by the in-op io/fold records
instead).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from ziggurat_spark.queries import all_queries
    from ziggurat_spark.session import get_session

    spark = get_session(app_name="capture_plans")
    specs = all_queries()
    outdir = os.path.join(
        REPO, "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r10")
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = specs[name].spark(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
