"""SparkSession bootstrap tuned for this engine.

Local testing runs on ``local[N]``; the config below is chosen so the
same logical plans scale to a real cluster: AQE on (runtime re-plan,
skew-join splitting, partition coalescing), UTC session timezone (so
results are engine/timezone independent and match the DuckDB oracle),
Arrow enabled for the Pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_session(
    app_name: str = "ziggurat_spark",
    master: str | None = None,
    shuffle_partitions: str | int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) the engine's SparkSession.

    Every knob here matters at scale:

    - ``spark.sql.adaptive.*``: AQE re-plans joins at runtime from
      observed sizes — converts sort-merge joins to broadcast when a
      side turns out small, splits skewed shuffle partitions.
    - ``spark.sql.shuffle.partitions``: sized to cores locally; on a
      real cluster AQE coalescing makes the initial number forgiving.
    - ``spark.sql.session.timeZone=UTC``: deterministic timestamp
      semantics (DuckDB oracle is UTC-naive).
    - Arrow: vectorized Python interchange for the
      ``mapInPandas``/``pandas_udf`` paths (handler execution,
      embedding ops).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    sp = str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", sp)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Driver-generated parquet stores nanosecond timestamps, which
        # Spark's reader rejects; read them as raw int64 nanos and
        # convert at load (tables.load_table) — truncation to micros
        # matches DuckDB's own ns→us handling.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        # File listing above this many paths runs as a Spark JOB
        # (default threshold 32). The streaming state layouts read
        # O(100) small bucket/shard directories per trigger; on the
        # local filesystem a driver-side listing of those is
        # sub-millisecond while the listing job costs a full driver-
        # orchestrated job round trip. On an object-store cluster,
        # where a sequential listing of hundreds of prefixes IS slow,
        # set SPARK_GRAFT_LIST_JOB_THRESHOLD back down (e.g. 32).
        .config(
            "spark.sql.sources.parallelPartitionDiscovery.threshold",
            os.environ.get("SPARK_GRAFT_LIST_JOB_THRESHOLD", "512"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
