"""Runnable end-to-end demo: a ziggurat-style app on the Spark engine.

Mirrors the reference's user experience (init.clj:244-273): declare
routes as ``{"handler-fn": fn, "<channel>": fn}`` maps plus a config
file, call ``start()``, and the framework does the rest — staleness
filter, JSON middleware, outcome dispatch, retry fabric with
exponential backoff, channels, dead-set ops.

Run:  python examples/route_app.py  [sf_dir]

The Kafka topic is stood in by a file-replayed envelope table (the
exact columns spark.readStream.format("kafka") produces); swap
`file_stream_source` for `sources.kafka.kafka_stream_source` in a
real deployment and nothing else changes.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from ziggurat_spark.app import ZigguratApp  # noqa: E402
from ziggurat_spark.envelope import events_as_envelope  # noqa: E402
from ziggurat_spark.session import get_session  # noqa: E402
from ziggurat_spark.sources.files import file_stream_source  # noqa: E402
from ziggurat_spark.tables import load_table  # noqa: E402


def handler(df):
    """The user handler with JSON middleware composed around it, the
    reference's doc/middleware.md pattern: deserialize the raw value
    bytes (T6), then one column expression decides each record's
    outcome (mapper.clj's success/retry/skip/dead-letter contract,
    plus a channel). Because deserialization lives IN the handler,
    pump re-deliveries — which carry only the raw envelope, like RMQ
    carried the serialized payload — re-parse identically."""
    from ziggurat_spark.functions.middleware import json_value

    parsed = json_value(schema="k INT")(df)
    k = F.col("payload.k")
    return parsed.withColumn(
        "outcome",
        F.when(k < 5, "retry")
        .when(k < 10, "dead-letter")
        .when(k < 15, "skip")
        .when(k < 25, "channel:audit")
        .otherwise("success"),
    )


def audit_channel(df):
    """Channel worker (R8): runs on the audit slice, decoupled from
    source partitioning."""
    print(f"  [audit channel] received {df.count()} records")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = tempfile.mkdtemp(prefix="zs_example_")
    spark = get_session(app_name="route_app_example")

    # stand-in Kafka topic: events as the Kafka envelope, on disk
    topic_dir = os.path.join(work, "topic")
    events_as_envelope(load_table(spark, sf_dir, "events")).write.parquet(
        topic_dir
    )

    cfg = os.path.join(work, "config.json")
    with open(cfg, "w") as f:
        json.dump(
            {
                "ziggurat": {
                    "app-name": "route-app-example",
                    "retry": {"enabled": True, "count": 3},
                    "stream-router": {
                        "events": {
                            "oldest-processed-message-in-s": 10**10,
                            "channels": {
                                "audit": {"worker-count": 4}
                            },
                        }
                    },
                }
            },
            f,
        )

    app = ZigguratApp(
        spark,
        os.path.join(work, "engine"),
        sources={"events": lambda: file_stream_source(spark, topic_dir)},
        stream_routes={
            "events": {"handler-fn": handler, "audit": audit_channel}
        },
        config_path=cfg,
    )
    print(f"modes: {app.modes}")
    app.start()
    for q in app.engine.queries.values():
        q.awaitTermination()

    retry = app.engine.fabric.retry_table()
    dead = app.engine.fabric.dead_set_table()
    print(f"retry table:    {retry.count() if retry is not None else 0} rows")
    print(f"dead set:       {dead.count() if dead is not None else 0} rows")

    # R7 ops: peek the dead set, then pump due retries (S4/K5)
    peek = app.engine.fabric.dead_set_view("events", n=3)
    print(f"dead-set peek:  {[r['offset'] for r in peek.collect()] if peek is not None else []}")
    # pump at a +1h horizon: every backoff TTL has expired by then
    from datetime import datetime, timedelta, timezone

    horizon = datetime.now(timezone.utc) + timedelta(hours=1)
    pumped = app.engine.pump_retries("events", now=horizon)
    print(f"retry pump:     re-delivered {pumped} records")

    # HTTP ops surface (server/routes.clj:18-23 parity): ping +
    # dead-set management over real HTTP against the live engine
    import urllib.request

    from ziggurat_spark.streaming.ops_server import OpsServer

    srv = OpsServer(app.engine).start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/ping", timeout=10
        ) as r:
            print(f"GET /ping:      {r.status} {r.read().decode()!r}")
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}"
            "/v1/dead_set?count=2&topic-entity=events",
            timeout=30,
        ) as r:
            body = r.read().decode()
            print(f"GET /v1/dead_set: {r.status}, {len(body)} bytes")
    finally:
        srv.stop()

    app.stop()
    print("done.")


if __name__ == "__main__":
    main()
