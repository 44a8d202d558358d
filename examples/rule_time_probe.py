"""Where does per-action JVM overhead go? Run one registered query,
then dump the catalyst RuleExecutor's cumulative per-rule time for
the whole session (analyzer + optimizer + AQE rules all report
through it). Rules that dominate and provably cannot fire on the
fold-shaped plans are candidates for spark.sql.optimizer.excludedRules.

Usage: python examples/rule_time_probe.py <query_name> [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from ziggurat_spark.queries import all_queries
    from ziggurat_spark.session import get_session

    spark = get_session(app_name=f"ruletime_{name}")
    specs = all_queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from ziggurat_spark.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).write.format("noop").mode(
            "overwrite"
        ).save()

    # reset the cumulative counters AFTER warmup so the dump below is
    # the query's own bill
    jvm = spark._jvm
    jvm.org.apache.spark.sql.catalyst.rules.RuleExecutor.resetMetrics()

    t0 = time.perf_counter()
    df = specs[name].spark(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    print(f"wall: {wall:.2f}s")

    dump = jvm.org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent()
    print(dump)


if __name__ == "__main__":
    main()
