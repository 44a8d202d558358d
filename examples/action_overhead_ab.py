"""Decompose the ~350ms per-exchange-action overhead at tiny scale:
time the same 1-exchange groupBy+noop (and a 2-exchange window chain)
under toggled runtime confs: AQE on/off, codegen on/off, shuffle
compression, AQE coalescing. All runtime-settable confs.

Usage: python examples/action_overhead_ab.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from ziggurat_spark.session import get_session

    spark = get_session(app_name="action_ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    base = spark.range(10000).select(
        F.col("id"),
        F.pmod(F.xxhash64("id"), F.lit(16)).alias("kb"),
    )
    w = Window.partitionBy("kb").orderBy(F.desc("id"))

    def one_exchange(i):
        base.withColumn("v", F.lit(i + 100)).groupBy("kb").agg(
            F.sum("v")
        ).write.format("noop").mode("overwrite").save()

    def two_exchange(i):
        base.withColumn("v", F.lit(i).cast("long")).unionByName(
            base.withColumn("v", F.lit(i + 1).cast("long"))
        ).withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") == 1
        ).groupBy("kb").agg(F.count("*")).write.format("noop").mode(
            "overwrite"
        ).save()

    def timeit(label, fn, n=20):
        for i in range(3):
            fn(i + 7777)  # warm this conf state
        t0 = time.perf_counter()
        for i in range(n):
            fn(i)
        dt = (time.perf_counter() - t0) / n
        print(f"{label}: {dt * 1000:7.1f} ms/action", flush=True)
        return dt

    combos = [
        ("baseline                       ", {}),
        ("AQE off                        ", {"spark.sql.adaptive.enabled": "false"}),
        ("codegen off                    ", {"spark.sql.codegen.wholeStage": "false"}),
        ("AQE off + codegen off          ", {
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.codegen.wholeStage": "false",
        }),
        ("constraintPropagation off      ", {
            "spark.sql.constraintPropagation.enabled": "false",
        }),
    ]
    defaults = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.codegen.wholeStage": "true",
        "spark.sql.constraintPropagation.enabled": "true",
    }
    for label, conf in combos:
        for k, v in defaults.items():
            spark.conf.set(k, conf.get(k, v))
        timeit("1ex " + label, one_exchange)
        timeit("2ex " + label, two_exchange)


if __name__ == "__main__":
    main()
