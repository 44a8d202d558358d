"""A/B measurement harness: time a subset of registered queries under
optional extra Spark confs, with the bench's own warmup + noop-sink
methodology (median of N passes).

Usage:
  python examples/bench_subset.py q1,q2,... [passes] [k=v;k=v...]

Prints one JSON line {query: median_sec} plus the total.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    names = sys.argv[1].split(",")
    n_passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    extra = {}
    if len(sys.argv) > 3 and sys.argv[3]:
        for kv in sys.argv[3].split(";"):
            k, v = kv.split("=", 1)
            extra[k] = v
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from ziggurat_spark.queries import all_queries
    from ziggurat_spark.session import get_session

    spark = get_session(app_name="bench_subset", extra_conf=extra)
    specs = all_queries()

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

    passes: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(n_passes):
        for name in names:
            t0 = time.perf_counter()
            df = specs[name].spark(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            passes[name].append(time.perf_counter() - t0)
    timings = {
        n: round(statistics.median(v), 3) for n, v in passes.items()
    }
    out = {
        "total": round(sum(timings.values()), 2),
        "conf": extra,
        "queries": timings,
        "passes": {n: [round(x, 3) for x in v] for n, v in passes.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
