"""Outcome routing & retry math as pure column logic (Z07–Z09).

The reference dispatches on a handler's return keyword
(:success/:retry/:skip/:dead-letter — mapper.clj:55-65), decrements a
retry counter carried in the message (producer.clj:288-293), and
computes exponential backoff ``((2^n)-1)*timeout`` with
``n = clamp(min(25, retry-count) - message-retry-count, 1, ..)``
(producer.clj:175-224, MAX_EXPONENTIAL_RETRIES=25 at :20).

Here each rule is a deterministic column expression over ``events``
so the DuckDB oracle can hash-check the exact semantics. The live
streaming engine reuses the same expressions
(ziggurat_spark.operators.routing / functions.backoff).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ziggurat_spark.functions.backoff import backoff_ms_expr
from ziggurat_spark.scratch import scratch_dir
from ziggurat_spark.operators.routing import outcome_expr, retry_step_exprs
from ziggurat_spark.queries.registry import register
from ziggurat_spark.tables import load_table


def _sized_state(fn):
    """Engine-driven micro-batch queries pin shuffle/state partitions
    at checkpoint time — size them to batch volume like the streaming
    surface does (see queries/streaming_surface.py)."""
    from ziggurat_spark.queries.streaming_surface import (
        _sized_state as _impl,
    )

    return _impl(fn)


@register(
    "z07_outcome_dispatch",
    oracle=(
        "SELECT event_id, CASE WHEN value < 10.0 THEN 'retry' "
        "WHEN value < 20.0 THEN 'skip' WHEN value < 30.0 THEN 'dead-letter' "
        "ELSE 'success' END AS outcome FROM events ORDER BY event_id"
    ),
    doc="R1 mapper-func dispatch (mapper.clj:55-65) as a CASE column.",
    tags=("routing",),
)
def z07(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    return e.select("event_id", outcome_expr(F.col("value")).alias("outcome")).orderBy(
        "event_id"
    )


@register(
    "z08_retry_state_machine",
    oracle=(
        "SELECT event_id, "
        "CASE WHEN event_id % 7 = 0 THEN 5 ELSE (event_id % 7) - 1 END AS next_attempt, "
        "(event_id % 7) = 0 AS to_dead_set FROM events ORDER BY event_id"
    ),
    doc=(
        "R2 retry decrement / DLQ split (producer.clj:288-293) with "
        "max_retries=5 and attempt := event_id % 7 as the fixture."
    ),
    tags=("routing",),
)
def z08(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    attempt = (F.col("event_id") % 7).cast("int")
    next_attempt, to_dead_set = retry_step_exprs(attempt, max_retries=5)
    return e.select(
        "event_id",
        next_attempt.alias("next_attempt"),
        to_dead_set.alias("to_dead_set"),
    ).orderBy("event_id")


@register(
    "z09_exponential_backoff",
    oracle=(
        "SELECT g AS message_retry_count, "
        "(power(2, greatest(1, least(25, 5) - g)) - 1) * 5000 AS backoff_ms "
        "FROM (SELECT DISTINCT event_id % 6 AS g FROM events) s ORDER BY g"
    ),
    doc=(
        "R3 exponential backoff ((2^n)-1)*t, n clamped >= 1, cap 25 "
        "(producer.clj:204, :20); t=5000ms, retry-count=5."
    ),
    tags=("routing",),
)
def z09(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    g = e.select((F.col("event_id") % 6).alias("g")).distinct()
    return g.select(
        F.col("g").alias("message_retry_count"),
        backoff_ms_expr(
            F.col("g"), retry_count=5, timeout_ms=5000, exponential=True
        ).alias("backoff_ms"),
    ).orderBy("message_retry_count")


@register(
    "x_route_pipeline",
    oracle=(
        "WITH routed AS (SELECT "
        "CASE WHEN value < 10 THEN 'retry' WHEN value < 20 THEN 'skip' "
        "WHEN value < 30 THEN 'dead-letter' ELSE 'success' END AS outcome, "
        "CAST(json_extract(props, '$.k') AS INT) AS k, "
        "CASE WHEN event_id % 7 = 0 THEN 5 ELSE event_id % 7 - 1 END "
        "AS next_attempt "
        "FROM events WHERE ts >= TIMESTAMP '2024-01-02 00:00:00') "
        "SELECT outcome, count(*) AS n, "
        "CAST(sum(k) AS BIGINT) AS sum_k, "
        "min((power(2, greatest(1, least(25, 5) - next_attempt)) - 1) * 5000) "
        "AS min_backoff_ms, "
        "max((power(2, greatest(1, least(25, 5) - next_attempt)) - 1) * 5000) "
        "AS max_backoff_ms "
        "FROM routed GROUP BY outcome ORDER BY outcome"
    ),
    doc=(
        "The FLAGSHIP route pipeline (what entry() runs) as a graded "
        "query: staleness filter (T2) → JSON middleware (T6) → "
        "outcome dispatch (R1) → retry state machine (R2, "
        "producer.clj:288-293) → exponential backoff (R3, the exact "
        "((2^n)-1)*t formula from producer.clj:204) → per-outcome "
        "tallies (the metrics surface). Every stage is a column "
        "expression inside one codegen span; the only shuffle is the "
        "4-group aggregate."
    ),
    tags=("routing", "pipeline"),
)
def x_route_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    from ziggurat_spark.functions.backoff import backoff_ms_expr
    from ziggurat_spark.operators.routing import outcome_expr, retry_step_exprs

    e = load_table(spark, sf, "events")
    fresh = e.filter(
        F.col("ts") >= F.lit("2024-01-02 00:00:00").cast("timestamp")
    )
    parsed = fresh.withColumn(
        "k", F.get_json_object("props", "$.k").cast("int")
    )
    routed = parsed.withColumn("outcome", outcome_expr(F.col("value")))
    attempt = (F.col("event_id") % 7).cast("int")
    next_attempt, _to_dead = retry_step_exprs(attempt, max_retries=5)
    routed = routed.withColumn("next_attempt", next_attempt).withColumn(
        "backoff_ms", backoff_ms_expr(F.col("next_attempt"), exponential=True)
    )
    return (
        routed.groupBy("outcome")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("backoff_ms").alias("min_backoff_ms"),
            F.max("backoff_ms").alias("max_backoff_ms"),
        )
        .orderBy("outcome")
    )


@register(
    "x_deadset_replay",
    oracle=(
        "WITH dead AS (SELECT event_id FROM events "
        "WHERE value >= 20 AND value < 30), "
        "sel AS (SELECT event_id FROM dead ORDER BY event_id LIMIT 25) "
        "SELECT CAST((SELECT count(*) FROM dead) AS BIGINT) AS dead_before, "
        "CAST(least(25, (SELECT count(*) FROM dead)) AS BIGINT) AS replayed, "
        "CAST((SELECT count(*) FROM dead) "
        "- least(25, (SELECT count(*) FROM dead)) AS BIGINT) AS dead_after, "
        "CAST((SELECT coalesce(sum(event_id), 0) FROM dead) "
        "- (SELECT coalesce(sum(event_id), 0) FROM sel) AS BIGINT) "
        "AS offset_sum_after"
    ),
    doc=(
        "R7 dead-set REPLAY (dead_set.clj:6-16, HTTP layer "
        "resource/dead_set.clj:64-77) exercised end-to-end in the "
        "graded surface: a real streaming route dead-letters the "
        "value∈[20,30) rows, then dead_set_replay(25) moves the 25 "
        "first-dead messages (died_at ties broken by offset — the "
        "Kafka-coordinate the envelope carries, = event_id here) "
        "back through a succeeding handler. Graded values: counts "
        "before/after plus the offset-sum of what remains — proving "
        "WHICH rows were replayed, not just how many. The oracle "
        "derives the same from pure relational math over events."
    ),
    tags=("routing", "retry", "streaming"),
)
@_sized_state
def x_deadset_replay(spark: SparkSession, sf: str) -> DataFrame:

    from ziggurat_spark.queries.streaming_surface import _stream_events
    from ziggurat_spark.streaming.engine import Route, ZigguratEngine

    workdir = scratch_dir("zs_deadset_replay_")
    engine = ZigguratEngine(spark, workdir, app_name="deadset_replay_query")
    route = Route(
        name="replay_route",
        # carry the Kafka coordinate: offset := event_id (without it
        # ensure_envelope null-fills offset and replay order/checksum
        # would be meaningless)
        source=lambda: _stream_events(spark, sf).withColumn(
            "offset", F.col("event_id")
        ),
        handler=lambda df: df.withColumn(
            "outcome", outcome_expr(F.col("value"))
        ),
        oldest_processed_s=None,  # no wall clock in a graded result
        timestamp_col="ts",
    )
    engine.register_route(route)
    q = engine.start_route("replay_route", trigger_available_now=True)
    q.awaitTermination()

    dead = engine.fabric.dead_set_table()
    dead_before = dead.count() if dead is not None else 0
    replayed = engine.fabric.dead_set_replay(
        "replay_route", 25, process=lambda env: env.count()
    )
    after = engine.fabric.dead_set_table()
    if after is not None:
        row = after.agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum("offset"), F.lit(0)).alias("s"),
        ).collect()[0]
        dead_after, offset_sum_after = row["n"], row["s"]
    else:
        dead_after, offset_sum_after = 0, 0
    # JVM-side literal row (see x_stream_route_outcomes: avoids the
    # Python-worker respawn a createDataFrame would pay post-stream)
    return spark.range(1).select(
        F.lit(dead_before).cast("bigint").alias("dead_before"),
        F.lit(replayed).cast("bigint").alias("replayed"),
        F.lit(dead_after).cast("bigint").alias("dead_after"),
        F.lit(offset_sum_after).cast("bigint").alias("offset_sum_after"),
    )


@register(
    "x_deadset_replay_channel",
    oracle=(
        "WITH chan AS (SELECT event_id FROM events "
        "WHERE value >= 20 AND value < 30), "
        "route_d AS (SELECT event_id FROM events WHERE value < 10), "
        "sel AS (SELECT event_id FROM chan ORDER BY event_id LIMIT 25) "
        "SELECT CAST((SELECT count(*) FROM chan) AS BIGINT) "
        "AS chan_dead_before, "
        "CAST(least(25, (SELECT count(*) FROM chan)) AS BIGINT) AS replayed, "
        "CAST((SELECT count(*) FROM chan) "
        "- least(25, (SELECT count(*) FROM chan)) AS BIGINT) "
        "AS chan_dead_after, "
        "CAST((SELECT coalesce(sum(event_id), 0) FROM chan) "
        "- (SELECT coalesce(sum(event_id), 0) FROM sel) AS BIGINT) "
        "AS chan_offset_sum_after, "
        "CAST((SELECT count(*) FROM route_d) AS BIGINT) AS route_dead_after, "
        "CAST(least(25, (SELECT count(*) FROM chan)) AS BIGINT) "
        "AS delivered_to_channel"
    ),
    doc=(
        "R7 CHANNEL-scoped dead-set replay (resource/dead_set.clj:"
        "25-44 + messaging/dead_set.clj:15-16) end-to-end: the main "
        "handler fans value∈[20,30) rows to channel 'audit' whose "
        "1-phase 'retry' outcome dead-letters them under the "
        "channel's disabled retry policy, while value<10 rows "
        "dead-letter at the ROUTE level. OpsServer.replay(channel="
        "'audit') then replays the 25 first-dead CHANNEL rows "
        "through the CHANNEL handler (now succeeding). Graded: both "
        "queues' counts before/after — the route-level queue must be "
        "untouched (queue scoping), the channel queue shrinks by "
        "exactly the replayed offsets (offset-sum checksum), and the "
        "channel handler saw exactly the replayed rows (delivered_"
        "to_channel) — proving replay dispatches to publish-to-"
        "channel-instant-queue semantics, not the main handler."
    ),
    tags=("routing", "retry", "streaming", "channels"),
)
@_sized_state
def x_deadset_replay_channel(spark: SparkSession, sf: str) -> DataFrame:

    from ziggurat_spark.queries.streaming_surface import _stream_events
    from ziggurat_spark.streaming.engine import Route, ZigguratEngine
    from ziggurat_spark.streaming.ops_server import OpsServer
    from ziggurat_spark.streaming.retry_fabric import RetryConfig

    workdir = scratch_dir("zs_deadset_replay_ch_")
    engine = ZigguratEngine(spark, workdir, app_name="deadset_replay_ch_query")
    delivered = {"n": 0}
    phase = {"replay": False}

    def channel_handler(df: DataFrame) -> DataFrame:
        if phase["replay"]:
            delivered["n"] += df.count()
            return df  # success: consume the replayed rows
        return df.withColumn("outcome", F.lit("retry"))

    route = Route(
        name="replay_ch_route",
        source=lambda: _stream_events(spark, sf).withColumn(
            "offset", F.col("event_id")
        ),
        handler=lambda df: df.withColumn(
            "outcome",
            F.when(F.col("value") < 10, F.lit("dead-letter"))
            .when(
                (F.col("value") >= 20) & (F.col("value") < 30),
                F.lit("channel:audit"),
            )
            .otherwise(F.lit("success")),
        ),
        channels={"audit": channel_handler},
        # disabled channel retry: the handler's 'retry' outcome
        # dead-letters immediately with channel attribution
        channel_retry={"audit": RetryConfig(enabled=False)},
        oldest_processed_s=None,
        timestamp_col="ts",
    )
    engine.register_route(route)
    q = engine.start_route("replay_ch_route", trigger_available_now=True)
    q.awaitTermination()

    dead = engine.fabric.dead_set_table()
    ch = F.col("channel")
    row = dead.agg(
        F.sum(F.when(ch == "audit", 1).otherwise(0)).alias("nc"),
        F.sum(F.when(ch.isNull(), 1).otherwise(0)).alias("nr"),
    ).collect()[0]
    chan_dead_before = row["nc"] or 0

    # the production ops path (lock + channel dispatch), minus HTTP
    phase["replay"] = True
    ops = OpsServer(engine)
    try:
        ops.replay("replay_ch_route", 25, "audit")
    finally:
        ops._httpd.server_close()

    after = engine.fabric.dead_set_table()
    if after is not None:
        arow = after.agg(
            F.sum(F.when(ch == "audit", 1).otherwise(0)).alias("nc"),
            F.coalesce(
                F.sum(F.when(ch == "audit", F.col("offset"))), F.lit(0)
            ).alias("sc"),
            F.sum(F.when(ch.isNull(), 1).otherwise(0)).alias("nr"),
        ).collect()[0]
        chan_dead_after = arow["nc"] or 0
        chan_offset_sum_after = arow["sc"] or 0
        route_dead_after = arow["nr"] or 0
    else:
        chan_dead_after = chan_offset_sum_after = route_dead_after = 0
    return spark.range(1).select(
        F.lit(chan_dead_before).cast("bigint").alias("chan_dead_before"),
        F.lit(chan_dead_before - chan_dead_after)
        .cast("bigint")
        .alias("replayed"),
        F.lit(chan_dead_after).cast("bigint").alias("chan_dead_after"),
        F.lit(chan_offset_sum_after)
        .cast("bigint")
        .alias("chan_offset_sum_after"),
        F.lit(route_dead_after).cast("bigint").alias("route_dead_after"),
        F.lit(delivered["n"]).cast("bigint").alias("delivered_to_channel"),
    )


@register(
    "x_retry_pump",
    oracle=(
        "SELECT CAST(sum(CASE WHEN value < 10 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS pumped, CAST(0 AS BIGINT) AS still_queued, "
        "CAST(sum(CASE WHEN value < 10 THEN event_id ELSE 0 END) AS BIGINT) "
        "AS offset_sum FROM events"
    ),
    doc=(
        "The retry PUMP loop (S4/K5: delay-queue → instant-queue "
        "re-delivery, messaging/consumer.clj:122-135 + "
        "producer.clj:302-316) graded end-to-end: the route "
        "dead-ends value<10 rows into the retry table with "
        "next_attempt_at = now + backoff, then pump(now → +1h) "
        "delivers every due row to a succeeding handler and "
        "atomically swaps the queue. Graded: how many pumped, that "
        "the queue drained to zero, and the offset checksum proving "
        "exactly the retried rows were delivered. Backoff timestamps "
        "are wall-clock so the oracle grades set identity, not "
        "timing — the reference's own guarantee is also only "
        "'not before the TTL' (SURVEY §7.3)."
    ),
    tags=("routing", "retry", "streaming"),
)
@_sized_state
def x_retry_pump(spark: SparkSession, sf: str) -> DataFrame:
    from datetime import datetime, timedelta, timezone

    from ziggurat_spark.queries.streaming_surface import _stream_events
    from ziggurat_spark.streaming.engine import Route, ZigguratEngine

    workdir = scratch_dir("zs_retry_pump_")
    engine = ZigguratEngine(spark, workdir, app_name="retry_pump_query")
    route = Route(
        name="pump_route",
        source=lambda: _stream_events(spark, sf).withColumn(
            "offset", F.col("event_id")
        ),
        handler=lambda df: df.withColumn(
            "outcome", outcome_expr(F.col("value"))
        ),
        oldest_processed_s=None,
        timestamp_col="ts",
    )
    engine.register_route(route)
    q = engine.start_route("pump_route", trigger_available_now=True)
    q.awaitTermination()

    delivered: dict[str, int] = {"n": 0, "s": 0}

    def process(env, channel=None) -> None:
        row = env.agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum("offset"), F.lit(0)).alias("s"),
        ).collect()[0]
        delivered["n"] += row["n"]
        delivered["s"] += row["s"]

    horizon = datetime.now(timezone.utc) + timedelta(hours=1)
    pumped = engine.fabric.pump("pump_route", process, now=horizon)
    assert pumped == delivered["n"]
    left = engine.fabric.due("pump_route", now=horizon)
    still = left.count() if left is not None else 0
    return spark.range(1).select(
        F.lit(pumped).cast("bigint").alias("pumped"),
        F.lit(still).cast("bigint").alias("still_queued"),
        F.lit(delivered["s"]).cast("bigint").alias("offset_sum"),
    )


@register(
    "x_recursive_backoff_schedule",
    oracle=(
        "WITH RECURSIVE s(event_type, attempt, cum_wait_ms) AS ("
        "SELECT event_type, 1, CAST(0 AS BIGINT) "
        "FROM (SELECT DISTINCT event_type FROM events) t "
        "UNION ALL "
        "SELECT event_type, attempt + 1, "
        "cum_wait_ms + ((CAST(1 AS BIGINT) << attempt) - 1) * 5000 "
        "FROM s WHERE attempt < 25) "
        "SELECT event_type, attempt, cum_wait_ms FROM s "
        "ORDER BY event_type, attempt"
    ),
    doc=(
        "Recursive CTE (WITH RECURSIVE, Spark 4 / SPARK-24497): the "
        "cumulative exponential-backoff timetable — for each route "
        "(distinct event_type), when attempt k fires relative to "
        "first failure under R3's ((2^n)-1)*timeout formula "
        "(messaging/producer.clj:204, timeout 5000 ms, cap "
        "MAX_EXPONENTIAL_RETRIES=25). The recursion is the iterative "
        "plan shape Catalyst unions per step (25 bounded steps over "
        "a 5-row anchor — driver-light, executor-resident); integer "
        "shifts keep it exact. Engine spellings differ only in the "
        "shift operator (shiftleft vs <<)."
    ),
    tags=("routing", "retry", "recursive"),
)
def x_recursive_backoff_schedule(spark: SparkSession, sf: str) -> DataFrame:
    load_table(spark, sf, "events").select(
        "event_type"
    ).distinct().createOrReplaceTempView("zs_route_types")
    return spark.sql(
        "WITH RECURSIVE s(event_type, attempt, cum_wait_ms) AS ("
        "SELECT event_type, 1, CAST(0 AS BIGINT) FROM zs_route_types "
        "UNION ALL "
        "SELECT event_type, attempt + 1, "
        "cum_wait_ms + (shiftleft(1, attempt) - 1) * CAST(5000 AS BIGINT) "
        "FROM s WHERE attempt < 25) "
        "SELECT event_type, attempt, cum_wait_ms FROM s "
        "ORDER BY event_type, attempt"
    )


@register(
    "x_observed_metrics",
    oracle=(
        "SELECT count(*) AS n_rows, "
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sv100, "
        "CAST(sum(CASE WHEN value < 10 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_retryable FROM events"
    ),
    doc=(
        "T10 metrics taps graded: df.observe() attaches the counter "
        "aggregates to the SAME pass that produces the data — the "
        "Spark spelling of the reference's per-record metric taps "
        "(streams.clj:45-64), with zero extra scans (an Observation "
        "accumulates on executors during the one materialization). "
        "The graded row is the observed values themselves, so the "
        "oracle verifies the metric pipeline end-to-end, not just "
        "the data path."
    ),
    tags=("routing", "metrics", "observe"),
)
def x_observed_metrics(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Observation

    from ziggurat_spark.tables import load_table

    e = load_table(spark, sf, "events")
    obs = Observation("route_metrics")
    tapped = e.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("sv100"),
        F.sum(F.when(F.col("value") < 10, 1).otherwise(0))
        .cast("bigint")
        .alias("n_retryable"),
    )
    # one materialization drives both the data path and the metrics
    tapped.write.format("noop").mode("overwrite").save()
    got = obs.get
    return spark.range(1).select(
        F.lit(got["n_rows"]).cast("bigint").alias("n_rows"),
        F.lit(got["sv100"]).cast("bigint").alias("sv100"),
        F.lit(got["n_retryable"]).cast("bigint").alias("n_retryable"),
    )
