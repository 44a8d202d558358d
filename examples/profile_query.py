"""Profile one registered query's wall time, attributing Spark action
time to the engine source line that triggered it.

Usage: python examples/profile_query.py <query_name> [sf_dir]

Runs the query once to warm the session/scans, then profiles a second
run with cProfile and prints the top engine-code callsites by
cumulative time (py4j round-trips — collect/write/checkpoint — are
charged to the ziggurat_spark caller line).
"""

from __future__ import annotations

import cProfile
import os
import pstats
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

    spark = get_session(app_name=f"profile_{name}")
    spec = all_queries()[name]

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    @pandas_udf("long", PandasUDFType.SCALAR)
    def _warm(v):
        return v

    spark.range(32).repartition(32).select(_warm("id")).collect()
    from ziggurat_spark.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).write.format("noop").mode(
            "overwrite"
        ).save()

    def run() -> float:
        t0 = time.perf_counter()
        df = spec.spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    w = run()
    print(f"warm pass: {w:.2f}s", flush=True)

    prof = cProfile.Profile()
    prof.enable()
    t = run()
    prof.disable()
    print(f"profiled pass: {t:.2f}s")
    st = pstats.Stats(prof)
    st.sort_stats("cumulative")
    # engine callsites only: filter to our repo paths
    print("\n== top engine callsites (cumulative) ==")
    st.print_stats("ziggurat_spark|__spark_entry__|examples", 40)


if __name__ == "__main__":
    main()
