"""ZigguratApp end-to-end: config file → validated routes → real
streaming run → outcome tallies (init.clj main-flow parity)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from ziggurat_spark.app import ZigguratApp, derive_modes, validate_route_shape
from ziggurat_spark.envelope import events_as_envelope
from ziggurat_spark.sources import file_stream_source
from ziggurat_spark.tables import load_table

SF = os.environ.get("ZS_TEST_SF", "/root/testdata/sf0.001")


def _handler(df):
    return df.withColumn(
        "outcome",
        F.when(F.col("offset") % 5 == 0, "retry").otherwise("success"),
    )


def _write_config(tmp_path, retry_enabled=True):
    p = tmp_path / "config.json"
    p.write_text(
        json.dumps(
            {
                "ziggurat": {
                    "app-name": "apptest",
                    "retry": {"enabled": retry_enabled, "count": 2},
                    "stream-router": {
                        "events": {
                            "oldest-processed-message-in-s": 10**10
                        }
                    },
                }
            }
        )
    )
    return str(p)


def test_derive_modes_parity():
    assert derive_modes({"r": {}}, None) == [
        "management-api",
        "worker",
        "stream-worker",
    ]
    assert derive_modes(None, {"b": {}}) == [
        "management-api",
        "worker",
        "batch-worker",
    ]
    with pytest.raises(ValueError, match="stream_routes or batch_routes"):
        derive_modes(None, None)


def test_route_shape_validation():
    with pytest.raises(ValueError, match="missing handler-fn"):
        validate_route_shape({"r": {}})
    with pytest.raises(ValueError, match="not callable"):
        validate_route_shape({"r": {"handler-fn": 42}})


def test_unknown_route_rejected(spark, tmp_path):
    cfg = _write_config(tmp_path)
    with pytest.raises(ValueError, match="ghost.*isn't present"):
        ZigguratApp(
            spark,
            str(tmp_path / "work"),
            sources={"ghost": lambda: None},
            stream_routes={"ghost": {"handler-fn": _handler}},
            config_path=cfg,
        )


def test_app_runs_route_from_config(spark, tmp_path):
    """Full lifecycle: envelope parquet replayed through the app's
    streaming query; retry policy and staleness horizon come from
    the config file, tallies from the engine's one-pass aggregate."""
    env_dir = str(tmp_path / "envelope")
    events_as_envelope(load_table(spark, SF, "events")).write.parquet(env_dir)
    cfg = _write_config(tmp_path)

    app = ZigguratApp(
        spark,
        str(tmp_path / "work"),
        sources={"events": lambda: file_stream_source(spark, env_dir)},
        stream_routes={"events": {"handler-fn": _handler}},
        config_path=cfg,
    )
    route = app.engine.routes["events"]
    assert route.retry.enabled and route.retry.max_attempts == 2
    assert route.oldest_processed_s == 10**10

    app.start()
    for q in app.engine.queries.values():
        q.awaitTermination()
    app.stop()

    total = sum(s.total for s in app.engine.stats)
    retries = sum(s.retry for s in app.engine.stats)
    n = load_table(spark, SF, "events").count()
    assert total == n
    expected_retry = (
        load_table(spark, SF, "events")
        .filter(F.col("event_id") % 5 == 0)
        .count()
    )
    assert retries == expected_retry
    # retry rows actually landed in the fabric
    pending = app.engine.fabric.retry_table()
    assert pending is not None and pending.count() == expected_retry


def test_stream_joins_alpha_gated(spark, tmp_path):
    """streams.clj:163-170: a stream-joins route is skipped (with a
    warning) unless the alpha-features flag is on."""
    import warnings as w

    from ziggurat_spark.app import build_routes

    cfg = {
        "ziggurat": {
            "stream-router": {"j": {"consumer-type": "stream-joins"}}
        }
    }
    spec = {"j": {"handler-fn": _handler}}
    srcs = {"j": lambda: None}
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        routes = build_routes(cfg, spec, srcs)
    assert routes == []
    assert any("alpha feature" in str(x.message) for x in caught)

    cfg["ziggurat"]["alpha-features"] = {"stream-joins": True}
    routes = build_routes(cfg, spec, srcs)
    assert [r.name for r in routes] == ["j"]


def test_app_runs_batch_route(spark, tmp_path):
    """A batch route (non-streaming source) starts as one bounded
    poll cycle (S3) — config comes from the batch-routes section."""
    p = tmp_path / "config.json"
    p.write_text(
        json.dumps(
            {
                "ziggurat": {
                    "app-name": "apptest",
                    "retry": {"enabled": True, "count": 2},
                    "batch-routes": {
                        "bulk": {"oldest-processed-message-in-s": 10**10}
                    },
                }
            }
        )
    )
    env = events_as_envelope(load_table(spark, SF, "events"))
    app = ZigguratApp(
        spark,
        str(tmp_path / "work"),
        sources={"bulk": lambda: env},
        batch_routes={"bulk": {"handler-fn": _handler}},
        config_path=str(p),
    )
    assert app.engine.routes["bulk"].oldest_processed_s == 10**10
    app.start()
    app.stop()
    total = sum(s.total for s in app.engine.stats if s.route == "bulk")
    assert total == load_table(spark, SF, "events").count()
