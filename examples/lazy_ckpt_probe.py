"""Validate the two candidate per-trigger optimizations:

A. eager localCheckpoint + collect  (2 actions)  vs
   lazy  localCheckpoint + collect  (1 action)
B. two sequential tiny parquet writes vs the same two overlapped on
   a 2-thread pool (guide 2.6).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from ziggurat_spark.session import get_session

    spark = get_session(app_name="lazy_ckpt_probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def frame(i):
        return (
            spark.range(20000)
            .select(
                (F.col("id") + i).alias("id"),
                F.pmod(F.xxhash64("id"), F.lit(16)).alias("kb"),
            )
            .groupBy("kb")
            .agg(F.count("*").alias("n"), F.sum("id").alias("s"))
        )

    N = 15
    # warm
    frame(0).localCheckpoint().select("kb").distinct().collect()

    t0 = time.perf_counter()
    for i in range(N):
        df = frame(i).localCheckpoint()
        df.select("kb").distinct().collect()
        df.unpersist()
    ea = (time.perf_counter() - t0) / N
    print(f"A eager ckpt + collect : {ea * 1000:.0f} ms")

    t0 = time.perf_counter()
    for i in range(N):
        df = frame(i).localCheckpoint(eager=False)
        df.select("kb").distinct().collect()
        df.unpersist()
    la = (time.perf_counter() - t0) / N
    print(f"A lazy  ckpt + collect : {la * 1000:.0f} ms")

    d = tempfile.mkdtemp(prefix="zs_probe_w_")
    t0 = time.perf_counter()
    for i in range(N):
        frame(i).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, "w1")
        )
        frame(i + 1).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, "w2")
        )
    seq = (time.perf_counter() - t0) / N
    print(f"B sequential 2 writes  : {seq * 1000:.0f} ms")

    pool = ThreadPoolExecutor(max_workers=2)
    t0 = time.perf_counter()
    for i in range(N):
        f1 = pool.submit(
            lambda i=i: frame(i)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(d, "w3"))
        )
        f2 = pool.submit(
            lambda i=i: frame(i + 1)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(d, "w4"))
        )
        f1.result()
        f2.result()
    par = (time.perf_counter() - t0) / N
    print(f"B parallel 2 writes    : {par * 1000:.0f} ms")


if __name__ == "__main__":
    main()
