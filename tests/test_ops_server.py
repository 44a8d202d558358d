"""HTTP ops surface — endpoint parity with server/routes.clj:18-23
and the dead-set resource validation (resource/dead_set.clj:40-94),
driven over real HTTP against a live engine."""

from __future__ import annotations

import json
import time
import urllib.request
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from ziggurat_spark.envelope import events_as_envelope
from ziggurat_spark.streaming.engine import Route, ZigguratEngine
from ziggurat_spark.streaming.ops_server import OpsServer
from ziggurat_spark.streaming.retry_fabric import RetryConfig
from ziggurat_spark.tables import load_table

NOW = datetime(2024, 2, 1, tzinfo=timezone.utc)


def call(port: int, method: str, path: str):
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}", method=method)
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, resp.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


@pytest.fixture()
def served(spark, tmp_path):
    engine = ZigguratEngine(spark, str(tmp_path / "work"))
    route = Route(
        name="events",
        source=lambda: None,
        handler=lambda df: df.withColumn(
            "outcome",
            F.when(F.col("k") % 2 == 0, "dead-letter").otherwise("success"),
        ),
        middleware=(
            lambda df: df.withColumn(
                "k",
                F.get_json_object(F.decode("value", "UTF-8"), "$.k").cast("int"),
            ),
        ),
        retry=RetryConfig(max_attempts=2, timeout_ms=0),
        oldest_processed_s=None,
    )
    engine.register_route(route)
    env = events_as_envelope(load_table(spark, "/root/testdata/sf0.001", "events"))
    engine.process_batch(route, env.limit(40), now=NOW)
    assert engine.fabric.dead_set_table() is not None
    server = OpsServer(engine).start()
    yield engine, server
    server.stop()


def test_ping(served):
    _, server = served
    assert call(server.port, "GET", "/ping") == (200, "pong")


def test_dead_set_view(served):
    engine, server = served
    dead = engine.fabric.dead_set_table().count()
    status, body = call(
        server.port, "GET", f"/v1/dead_set?count=5&topic-entity=events"
    )
    assert status == 200
    msgs = json.loads(body)["messages"]
    assert len(msgs) == min(5, dead)
    assert all(m["route"] == "events" for m in msgs)


def test_dead_set_validation(served):
    _, server = served
    assert call(server.port, "GET", "/v1/dead_set?count=0&topic-entity=events")[0] == 400
    assert call(server.port, "GET", "/v1/dead_set?count=x&topic-entity=events")[0] == 400
    assert call(server.port, "GET", "/v1/dead_set?count=3&topic-entity=nope")[0] == 400
    assert call(server.port, "GET", "/v1/nothing")[0] == 404


def test_dead_set_delete_async(served):
    engine, server = served
    before = engine.fabric.dead_set_table().count()
    status, body = call(
        server.port, "DELETE", f"/v1/dead_set?count=2&topic-entity=events"
    )
    assert status == 200 and "triggered" in json.loads(body)["message"]
    deadline = time.time() + 60
    while time.time() < deadline:
        # The async delete swaps the table directory underneath us;
        # a poll can catch the swap mid-flight (no dir, or listed
        # files gone by action time) — that's expected, retry.
        try:
            t = engine.fabric.dead_set_table()
            if t is not None and t.count() == before - 2:
                break
        except Exception:
            pass
        time.sleep(0.5)
    assert engine.fabric.dead_set_table().count() == before - 2


def test_dead_set_replay_async(served):
    """Replayed messages go back through the handler; this handler
    dead-letters them again, so the count returns to its start —
    what matters is the pipeline ran (attempt reset + redispatch)."""
    engine, server = served
    before = engine.fabric.dead_set_table().count()
    stats_before = len(engine.stats)
    status, _ = call(
        server.port, "POST", f"/v1/dead_set/replay?count=3&topic-entity=events"
    )
    assert status == 200
    # the directory is swapped by the background replay; tolerate
    # transient read failures while polling
    deadline = time.time() + 60
    final = -1
    while time.time() < deadline:
        try:
            if len(engine.stats) > stats_before:
                t = engine.fabric.dead_set_table()
                final = 0 if t is None else t.count()
                if final == before:
                    break
        except Exception:
            pass
        time.sleep(0.5)
    assert len(engine.stats) > stats_before  # replay batch processed
    # the replayed batch must contain exactly the 3 requested rows
    assert engine.stats[-1].total == 3
    assert final == before


def test_metrics_scrape(served):
    """GET /metrics serves the engine registry in Prometheus text
    format: the processed batch's counters and the consume-delay
    histogram are scrapeable (prometheus_exporter.clj:34-48)."""
    engine, server = served
    status, body = call(server.port, "GET", "/metrics")
    assert status == 200
    lines = body.strip().splitlines()
    metrics = {
        ln.split(" ")[0]: ln.split(" ")[1]
        for ln in lines
        if not ln.startswith("#")
    }
    # batch counters from the processed 40-row batch (20 even ks dead)
    assert metrics["ziggurat_spark_events_message_read"] == "40"
    assert (
        metrics["ziggurat_spark_events_message_processing_success"] == "20"
    )
    assert (
        metrics["ziggurat_spark_events_message_processing_dead_letter"]
        == "20"
    )
    # bare-namespace twins (multi-ns convention, metrics.clj:113-115)
    assert metrics["message_processing_success"] == "20"
    # the consume-delay histogram summary
    assert (
        metrics["ziggurat_spark_events_message_received_delay_histogram_count"]
        == "40"
    )
    assert "# TYPE ziggurat_spark_events_message_processing_success gauge" in body


def test_error_middleware_answers_500(served, monkeypatch):
    """wrap-errors parity (server/middleware.clj:29-36): an uncaught
    handler exception becomes a 500 with an Error body, not a dropped
    connection."""
    engine, server = served

    def boom(*a, **k):
        raise RuntimeError("storage exploded")

    monkeypatch.setattr(engine.fabric, "dead_set_view", boom)
    status, body = call(
        server.port, "GET", "/v1/dead_set?count=1&topic-entity=events"
    )
    assert status == 500
    assert "Error" in body and "storage exploded" in body


def test_request_metrics_counter(served):
    """wrap-with-metrics parity (middleware.clj:38-44): every request
    increments a requests-served counter labeled by bounded uri +
    status."""
    engine, server = served
    before = engine.metrics.counter(
        "ziggurat-spark.ops.http-server.requests-served./ping.200"
    )
    call(server.port, "GET", "/ping")
    call(server.port, "GET", "/nope")
    assert (
        engine.metrics.counter(
            "ziggurat-spark.ops.http-server.requests-served./ping.200"
        )
        == before + 1
    )
    assert (
        engine.metrics.counter(
            "ziggurat-spark.ops.http-server.requests-served.other.404"
        )
        >= 1
    )


# -- channel-scoped dead-set ops (resource/dead_set.clj:25-44) ----------


@pytest.fixture()
def served_channels(spark, tmp_path):
    """Route with a channel whose handler retries everything; the
    channel retry policy exhausts on the first hop (max_attempts=1),
    so channel deliveries dead-letter with channel='enrich' while the
    main handler dead-letters even keys at the route level."""
    engine = ZigguratEngine(spark, str(tmp_path / "work"))
    channel_seen: list[int] = []

    def channel_handler(df):
        channel_seen.append(df.count())
        return df.withColumn("outcome", F.lit("retry"))

    route = Route(
        name="events",
        source=lambda: None,
        handler=lambda df: df.withColumn(
            "outcome",
            F.when(F.col("k") % 3 == 0, "dead-letter")
            .when(F.col("k") % 3 == 1, "channel:enrich")
            .otherwise("success"),
        ),
        middleware=(
            lambda df: df.withColumn(
                "k",
                F.get_json_object(F.decode("value", "UTF-8"), "$.k").cast("int"),
            ),
        ),
        retry=RetryConfig(max_attempts=2, timeout_ms=0),
        channels={"enrich": channel_handler},
        channel_retry={"enrich": RetryConfig(max_attempts=1, timeout_ms=0)},
        oldest_processed_s=None,
    )
    engine.register_route(route)
    env = events_as_envelope(load_table(spark, "/root/testdata/sf0.001", "events"))
    engine.process_batch(route, env.limit(30), now=NOW)
    # channel deliveries enqueue one retry hop (attempt=0); pump once
    # so the channel handler's second 'retry' exhausts the 1-attempt
    # policy and the rows dead-letter with channel='enrich'
    from datetime import timedelta

    engine.pump_retries("events", now=NOW + timedelta(seconds=1))
    server = OpsServer(engine).start()
    yield engine, server, channel_seen
    server.stop()


def test_channel_dead_rows_partitioned_by_queue(served_channels):
    """Route-level view must NOT see channel rows and vice versa —
    the reference keeps a separate dead queue per channel
    (messaging/dead_set.clj:6-28)."""
    engine, server, _ = served_channels
    dead = engine.fabric.dead_set_table()
    n_route = dead.filter(F.col("channel").isNull()).count()
    n_chan = dead.filter(F.col("channel") == "enrich").count()
    assert n_route > 0 and n_chan > 0

    status, body = call(
        server.port, "GET", "/v1/dead_set?count=100&topic-entity=events"
    )
    msgs = json.loads(body)["messages"]
    assert status == 200 and len(msgs) == n_route
    assert all(m["channel"] is None for m in msgs)

    status, body = call(
        server.port,
        "GET",
        "/v1/dead_set?count=100&topic-entity=events&channel=enrich",
    )
    msgs = json.loads(body)["messages"]
    assert status == 200 and len(msgs) == n_chan
    assert all(m["channel"] == "enrich" for m in msgs)


def test_channel_validation(served_channels):
    _, server, _ = served_channels
    # unknown channel on a known route → 400 (validate-channel-or-
    # topic-entity, resource/dead_set.clj:25-26)
    assert (
        call(
            server.port,
            "GET",
            "/v1/dead_set?count=3&topic-entity=events&channel=nope",
        )[0]
        == 400
    )


def test_channel_retry_disabled_answers_404(spark, tmp_path):
    """retry-allowed? consults the CHANNEL's retry config for channel
    requests (resource/dead_set.clj:29-39) — a route with retry on
    but the channel's retry off must 404 the channel request and
    200 the route-level one."""
    engine = ZigguratEngine(spark, str(tmp_path / "work2"))
    route = Route(
        name="events",
        source=lambda: None,
        handler=lambda df: df.withColumn("outcome", F.lit("success")),
        retry=RetryConfig(max_attempts=2, timeout_ms=0, enabled=True),
        channels={"c1": lambda df: df},
        channel_retry={"c1": RetryConfig(enabled=False)},
        oldest_processed_s=None,
    )
    engine.register_route(route)
    server = OpsServer(engine).start()
    try:
        assert (
            call(
                server.port,
                "GET",
                "/v1/dead_set?count=1&topic-entity=events&channel=c1",
            )[0]
            == 404
        )
        assert (
            call(server.port, "GET", "/v1/dead_set?count=1&topic-entity=events")[0]
            == 200
        )
    finally:
        server.stop()


def test_channel_replay_hits_channel_handler(served_channels):
    """POST replay with channel=C must deliver the rows to the
    CHANNEL handler (publish-to-channel-instant-queue,
    messaging/dead_set.clj:15-16), not the main route handler."""
    engine, server, channel_seen = served_channels
    dead = engine.fabric.dead_set_table()
    n_chan = dead.filter(F.col("channel") == "enrich").count()
    n_route = dead.filter(F.col("channel").isNull()).count()
    calls_before = list(channel_seen)
    stats_before = len(engine.stats)

    status, _ = call(
        server.port,
        "POST",
        "/v1/dead_set/replay?count=2&topic-entity=events&channel=enrich",
    )
    assert status == 200
    deadline = time.time() + 60
    while time.time() < deadline:
        if len(channel_seen) > len(calls_before):
            break
        time.sleep(0.5)
    # channel handler saw exactly the 2 replayed rows…
    assert channel_seen[len(calls_before):] == [2]
    # …and the MAIN handler never ran (no new batch stats)
    assert len(engine.stats) == stats_before
    # replay resets attempt, so the handler's 'retry' outcome lands
    # the 2 rows in the RETRY queue attributed to the channel — the
    # channel dead queue shrank by 2, the route-level one untouched
    deadline = time.time() + 60
    while time.time() < deadline:
        try:
            t = engine.fabric.dead_set_table()
            if (
                t is not None
                and t.filter(F.col("channel") == "enrich").count()
                == n_chan - 2
            ):
                break
        except Exception:
            pass
        time.sleep(0.5)
    t = engine.fabric.dead_set_table()
    assert t.filter(F.col("channel") == "enrich").count() == n_chan - 2
    assert t.filter(F.col("channel").isNull()).count() == n_route
    rt = engine.fabric.retry_table()
    assert rt.filter(F.col("channel") == "enrich").count() == 2


def test_channel_delete_scoped(served_channels):
    engine, server, _ = served_channels
    dead = engine.fabric.dead_set_table()
    n_chan = dead.filter(F.col("channel") == "enrich").count()
    n_route = dead.filter(F.col("channel").isNull()).count()
    status, _ = call(
        server.port,
        "DELETE",
        "/v1/dead_set?count=1&topic-entity=events&channel=enrich",
    )
    assert status == 200
    deadline = time.time() + 60
    while time.time() < deadline:
        try:
            t = engine.fabric.dead_set_table()
            if t.filter(F.col("channel") == "enrich").count() == n_chan - 1:
                break
        except Exception:
            pass
        time.sleep(0.5)
    t = engine.fabric.dead_set_table()
    assert t.filter(F.col("channel") == "enrich").count() == n_chan - 1
    # route-level rows untouched
    assert t.filter(F.col("channel").isNull()).count() == n_route
