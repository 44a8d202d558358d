"""Quantify per-job driver overhead components in local mode:

1. same tiny plan repeated (codegen cache HIT)
2. tiny plan with a changing literal (codegen cache MISS per job)
3. the same pair with wholeStage codegen off
4. AQE status inside foreachBatch (cloned session?)
5. per-job floor: empty-ish job latency

Usage: python examples/overhead_probe.py
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

    from ziggurat_spark.session import get_session

    spark = get_session(app_name="overhead_probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    base = spark.range(10000).select(
        F.col("id"),
        F.pmod(F.xxhash64("id"), F.lit(16)).alias("kb"),
    )

    def timeit(label, fn, n=20):
        t0 = time.perf_counter()
        for i in range(n):
            fn(i)
        dt = (time.perf_counter() - t0) / n
        print(f"{label}: {dt * 1000:.1f} ms/job")
        return dt

    # warm
    base.groupBy("kb").count().write.format("noop").mode(
        "overwrite"
    ).save()

    timeit(
        "1 same-plan groupBy+noop           ",
        lambda i: base.groupBy("kb")
        .count()
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    timeit(
        "2 changing-literal groupBy+noop    ",
        lambda i: base.withColumn("v", F.lit(i + 100))
        .groupBy("kb")
        .agg(F.sum("v"))
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    # window + union plan, changing literal (the fold-shaped plan)
    from pyspark.sql.window import Window

    w = Window.partitionBy("kb").orderBy(F.desc("id"))
    timeit(
        "3 window+union changing-literal    ",
        lambda i: base.withColumn("v", F.lit(i).cast("long"))
        .unionByName(base.withColumn("v", F.lit(i + 1).cast("long")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    timeit(
        "4 changing-literal, codegen OFF    ",
        lambda i: base.withColumn("v", F.lit(i + 500))
        .groupBy("kb")
        .agg(F.sum("v"))
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    timeit(
        "5 collect 16 ints (control-plane)  ",
        lambda i: base.withColumn("x", F.lit(i))
        .select("kb")
        .distinct()
        .collect(),
    )
    t0 = time.perf_counter()
    for i in range(20):
        spark.range(10).write.format("noop").mode("overwrite").save()
    print(
        f"6 near-empty job floor             : "
        f"{(time.perf_counter() - t0) / 20 * 1000:.1f} ms/job"
    )

    # 7: AQE inside foreachBatch?
    import tempfile

    srcdir = tempfile.mkdtemp(prefix="zs_probe_src_")
    spark.range(100).write.mode("overwrite").parquet(srcdir)
    seen = {}

    def fb(b, bid):
        s = b.sparkSession
        seen["aqe"] = s.conf.get("spark.sql.adaptive.enabled")
        seen["shuffle_parts"] = s.conf.get("spark.sql.shuffle.partitions")
        n = b.groupBy((F.col("id") % 7).alias("k")).count()
        seen["npart_after_groupby"] = n.rdd.getNumPartitions()
        m = spark.read.parquet(srcdir).groupBy(
            (F.col("id") % 7).alias("k")
        ).count()
        seen["outer_npart_after_groupby"] = m.rdd.getNumPartitions()

    st = (
        spark.readStream.schema(spark.read.parquet(srcdir).schema)
        .parquet(srcdir)
        .writeStream.foreachBatch(fb)
        .option(
            "checkpointLocation",
            tempfile.mkdtemp(prefix="zs_probe_ck_"),
        )
        .trigger(availableNow=True)
        .start()
    )
    st.awaitTermination()
    print("7 foreachBatch env:", seen)


if __name__ == "__main__":
    main()
