"""Observability parity — dual-namespace counters (metrics.clj:113-
115), outcome counters (mapper.clj:56-65), read counter (streams.clj
:45-54), delay histogram (kafka_delay.clj:5-13), failure path
(mapper.clj:66-69), and the streaming listener."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from ziggurat_spark.envelope import events_as_envelope
from ziggurat_spark.streaming.engine import Route, ZigguratEngine
from ziggurat_spark.streaming.metrics import (
    MetricsRegistry,
    ZigguratQueryListener,
)
from ziggurat_spark.streaming.retry_fabric import RetryConfig
from ziggurat_spark.tables import load_table

SF = "/root/testdata/sf0.001"
NOW = datetime(2024, 2, 1, 0, 0, 0, tzinfo=timezone.utc)


def handler(df):
    k = F.col("k")
    return df.withColumn(
        "outcome",
        F.when(k % 10 == 0, "retry")
        .when(k % 10 == 1, "dead-letter")
        .when(k % 10 == 2, "skip")
        .otherwise("success"),
    )


def json_mw(df):
    return df.withColumn(
        "k", F.get_json_object(F.decode("value", "UTF-8"), "$.k").cast("int")
    )


@pytest.fixture()
def engine(spark, tmp_path):
    return ZigguratEngine(spark, str(tmp_path / "work"), app_name="myapp")


@pytest.fixture()
def envelope_df(spark):
    return events_as_envelope(load_table(spark, SF, "events"))


def test_outcome_and_read_counters_dual_namespace(engine, envelope_df):
    stats = engine.process_batch(
        engine.routes.setdefault(
            "events",
            Route(
                name="events",
                source=lambda: None,
                handler=handler,
                middleware=(json_mw,),
                retry=RetryConfig(max_attempts=2, timeout_ms=0),
                oldest_processed_s=None,
            ),
        ),
        envelope_df,
        now=NOW,
    )
    m = engine.metrics
    # fully-qualified AND bare namespaces, reference naming
    assert m.counter("myapp.events.message.read") == stats.total == 1000
    assert m.counter("message.read") == 1000
    assert m.counter("myapp.events.message-processing.success") == stats.success
    assert m.counter("message-processing.retry") == stats.retry
    assert m.counter("myapp.events.message-processing.dead-letter") == (
        stats.dead_letter
    )
    # delay histogram saw every routed record
    h = m.histograms["myapp.events.message-received-delay-histogram"]
    assert h.count == 1000
    assert h.mean > 0  # NOW is after every 2024-01 event timestamp


def test_failure_path_counts_and_requeues(engine, envelope_df):
    def exploding(df):
        return df.withColumn(
            "outcome", F.when(F.col("value").isNotNull(), "success")
        ).withColumn("boom", F.assert_true(F.length("topic") > 9000))

    route = Route(
        name="events",
        source=lambda: None,
        handler=exploding,
        retry=RetryConfig(max_attempts=2, timeout_ms=0),
        oldest_processed_s=None,
    )
    engine.register_route(route)
    # mapper.clj:66-69 parity: the Throwable is CAUGHT — failure
    # metric + whole-delivery retry, then processing continues (the
    # reference never crashes the stream thread on a handler error)
    stats = engine.process_batch(route, envelope_df.limit(10), now=NOW)
    assert stats.failure == 10
    assert engine.metrics.counter("myapp.events.message-processing.failure") == 10
    rt = engine.fabric.retry_table()
    assert rt is not None and rt.count() == 10  # whole delivery re-enqueued


def test_streaming_listener_records_progress(spark, engine, envelope_df, tmp_path):
    src_dir = str(tmp_path / "src")
    envelope_df.limit(100).write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    route = Route(
        name="listen",
        source=lambda: spark.readStream.schema(schema).parquet(src_dir),
        handler=handler,
        middleware=(json_mw,),
        retry=RetryConfig(max_attempts=2, timeout_ms=60_000),
        oldest_processed_s=None,
    )
    engine.register_route(route)
    listener = ZigguratQueryListener(engine.metrics).attach(spark)
    try:
        q = engine.start_route("listen")
        q.awaitTermination(120)
        engine.stop_route("listen")
        # listener events are delivered asynchronously
        import time

        deadline = time.time() + 30
        while (
            engine.metrics.counter("myapp.listen.streaming-query.input-rows") < 100
            and time.time() < deadline
        ):
            time.sleep(0.5)
    finally:
        listener.detach()
    assert engine.metrics.counter("myapp.listen.streaming-query.input-rows") == 100
    assert engine.metrics.counter("myapp.listen.streaming-query.batches") >= 1


def test_channel_metrics(engine, envelope_df):
    route = Route(
        name="events",
        source=lambda: None,
        handler=lambda df: df.withColumn(
            "outcome",
            F.when(F.col("k") % 10 == 3, "channel:audit").otherwise("success"),
        ),
        middleware=(json_mw,),
        channels={"audit": lambda df: None},
        retry=RetryConfig(max_attempts=2, timeout_ms=0),
        oldest_processed_s=None,
    )
    engine.register_route(route)
    stats = engine.process_batch(route, envelope_df, now=NOW)
    assert stats.channel > 0
    assert (
        engine.metrics.counter("myapp.events.audit.message-processing.success")
        == stats.channel
    )


def test_prometheus_text_format():
    """Exposition parity with prometheus_exporter.clj:20-31: counters
    export as gauges, histograms as summaries with _count/_sum (plus
    the registry's bounded _min/_max), names sanitized to the
    exposition grammar."""
    reg = MetricsRegistry(service_name="svc")
    reg.inc("route_a", "message-processing", "success", 7)
    reg.report_histogram("route_a", "message-received-delay-histogram", 250.0, n=2)
    text = reg.prometheus_text()
    assert "# TYPE svc_route_a_message_processing_success gauge" in text
    assert "svc_route_a_message_processing_success 7" in text
    # bare-namespace twin (multi-ns convention)
    assert "\nmessage_processing_success 7" in text
    assert "# TYPE svc_route_a_message_received_delay_histogram summary" in text
    assert "svc_route_a_message_received_delay_histogram_count 2" in text
    assert "svc_route_a_message_received_delay_histogram_sum 500.0" in text
    assert "svc_route_a_message_received_delay_histogram_min 250.0" in text
    assert "svc_route_a_message_received_delay_histogram_max 250.0" in text
    # every line is a comment or `name value`
    for line in text.strip().splitlines():
        assert line.startswith("# TYPE ") or len(line.split(" ")) == 2


# -- StatsD exporter (clj_statsd_metrics_wrapper.clj parity) ------------


def _statsd_pair():
    import socket

    from ziggurat_spark.streaming.metrics import MetricsRegistry, StatsdExporter

    srv = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    srv.bind(("127.0.0.1", 0))
    srv.settimeout(5)
    reg = MetricsRegistry()
    exp = StatsdExporter(port=srv.getsockname()[1], env="test")
    reg.exporters.append(exp)
    return reg, exp, srv


def _drain(srv, n):
    out = []
    for _ in range(n):
        out.append(srv.recv(4096).decode())
    return out


def test_statsd_counter_datagrams():
    """update-counter parity: '<ns>.<metric>:<n>|c|@1.0' under BOTH
    namespaces, DogStatsD tags appended; topic tag only on the bare
    namespace (remove-topic-tag-for-old-namespace)."""
    reg, exp, srv = _statsd_pair()
    try:
        reg.inc("orders", "message-processing", "success", 3)
        lines = sorted(_drain(srv, 2))
        assert (
            "message-processing.success:3|c|@1.0"
            "|#actor:ziggurat-spark,env:test,topic_entity:orders" in lines
        )
        assert (
            "ziggurat-spark.orders.message-processing.success:3|c|@1.0"
            "|#actor:ziggurat-spark,env:test" in lines
        )
        # registry store unaffected by the exporter
        assert reg.counter("ziggurat-spark.orders.message-processing.success") == 3
    finally:
        exp.terminate()
        srv.close()


def test_statsd_timing_datagrams():
    """update-timing parity: '<ns>:<ms>|ms|@1.0' per sample."""
    reg, exp, srv = _statsd_pair()
    try:
        reg.report_histogram("orders", "message-received-delay-histogram", 12.5)
        lines = sorted(_drain(srv, 2))
        assert (
            "message-received-delay-histogram:12.5|ms|@1.0"
            "|#actor:ziggurat-spark,env:test,topic_entity:orders" in lines
        )
        assert (
            "ziggurat-spark.orders.message-received-delay-histogram:12.5"
            "|ms|@1.0|#actor:ziggurat-spark,env:test" in lines
        )
    finally:
        exp.terminate()
        srv.close()


def test_statsd_timing_multiplicity_one_datagram_per_variant():
    """n samples of one value → ONE datagram per namespace variant
    with @{1/n}: the statsd server's 1/rate scale-up reconstructs the
    count without n sendto() calls on the listener thread."""
    reg, exp, srv = _statsd_pair()
    try:
        reg.report_histogram("orders", "delay", 12.5, n=4)
        lines = sorted(_drain(srv, 2))
        assert lines == sorted(
            [
                "delay:12.5|ms|@0.25"
                "|#actor:ziggurat-spark,env:test,topic_entity:orders",
                "ziggurat-spark.orders.delay:12.5|ms|@0.25"
                "|#actor:ziggurat-spark,env:test",
            ]
        )
        # nothing further queued: exactly 2 packets total
        import socket

        srv.settimeout(0.2)
        try:
            srv.recv(4096)
            raise AssertionError("extra datagram emitted")
        except socket.timeout:
            pass
    finally:
        exp.terminate()
        srv.close()


def test_statsd_timing_multiplicity_splits_at_rate_floor():
    """Boundary of the 1e-8 rate floor (round-4 advisor): at
    n = 1e8 one datagram per variant still encodes the multiplicity
    exactly (@0.00000001); at n = 1e8 + 3 the stamp would clamp, so
    the count is SPLIT into a full-cap datagram plus a remainder
    datagram — the server-side 1/rate scale-up again reconstructs
    the exact count."""
    import socket

    reg, exp, srv = _statsd_pair()
    cap = 10**8
    try:
        reg.report_histogram("orders", "delay", 2.5, n=cap)
        lines = _drain(srv, 2)
        assert all("|ms|@0.00000001|" in ln for ln in lines), lines

        reg.report_histogram("orders", "delay", 2.5, n=cap + 3)
        lines = sorted(_drain(srv, 4))
        full = [ln for ln in lines if "|ms|@0.00000001|" in ln]
        rest = [ln for ln in lines if "|ms|@0.33333333" in ln]
        assert len(full) == 2 and len(rest) == 2, lines

        srv.settimeout(0.2)
        try:
            srv.recv(4096)
            raise AssertionError("extra datagram emitted")
        except socket.timeout:
            pass
    finally:
        exp.terminate()
        srv.close()


def test_statsd_rate_actually_samples():
    """rate < 1.0 must drop packets client-side — an always-send
    client stamped @rate makes the server over-count by 1/rate."""
    import socket

    reg, exp, srv = _statsd_pair()
    try:
        exp.rate = 0.0  # degenerate: sample probability zero
        reg.inc("orders", "ns", "m", 1)
        reg.report_histogram("orders", "delay", 1.0, n=10)
        srv.settimeout(0.2)
        try:
            srv.recv(4096)
            raise AssertionError("rate=0 exporter emitted a datagram")
        except socket.timeout:
            pass
        # registry store itself is unaffected by exporter sampling
        assert reg.counter("ziggurat-spark.orders.ns.m") == 1
    finally:
        exp.terminate()
        srv.close()


def test_statsd_never_blocks_on_dead_daemon():
    """Fire-and-forget: closed socket / no listener must not raise."""
    from ziggurat_spark.streaming.metrics import MetricsRegistry, StatsdExporter

    reg = MetricsRegistry()
    exp = StatsdExporter(port=1)  # nothing listens there
    reg.exporters.append(exp)
    reg.inc("r", "ns", "m", 1)
    exp.terminate()
    reg.inc("r", "ns", "m", 1)  # after terminate: swallowed OSError
    assert reg.counter("ns.m") == 2
