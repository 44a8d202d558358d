"""Config subsystem parity tests (config.clj / init.clj behaviors)."""

from __future__ import annotations

import json

import pytest

from ziggurat_spark.config import (
    DEFAULT_CONFIG,
    channel_retry_config,
    deep_merge,
    env_overlay,
    get_in_config,
    interpolate,
    load_config,
    retry_config_from,
    validate_routes_against_config,
)


def test_defaults_mirror_reference():
    """Spot-check the default map against config.clj:19-53."""
    z = DEFAULT_CONFIG["ziggurat"]
    assert z["retry"] == {"count": 5, "enabled": False}
    assert z["jobs"]["instant"] == {"worker-count": 4, "prefetch-count": 4}
    assert z["rabbit-mq"]["delay"]["queue-timeout-ms"] == 5000
    assert z["http-server"]["thread-count"] == 100
    assert z["rabbit-mq-connection"]["publish-retry"]["back-off-ms"] == 5000


def test_deep_merge_last_wins_and_recurses():
    """config.clj:62-69: recurse only when both sides are maps."""
    a = {"x": {"y": 1, "z": 2}, "w": 1}
    b = {"x": {"y": 9}, "w": {"now": "a-map"}}
    out = deep_merge(a, b)
    assert out == {"x": {"y": 9, "z": 2}, "w": {"now": "a-map"}}
    # inputs untouched
    assert a["x"]["y"] == 1


def test_interpolation_formats_queue_templates():
    """config.clj:55-60: %s templates take the app name."""
    out = interpolate(DEFAULT_CONFIG, "myapp")
    assert (
        out["ziggurat"]["rabbit-mq"]["delay"]["queue-name"]
        == "myapp_delay_queue"
    )
    # non-template strings pass through
    assert out["ziggurat"]["log-format"] == "text"


def test_env_overlay_parses_types():
    """clonfig parity: env var named by the joined path overrides,
    with bool/int parsing."""
    cfg = {"ziggurat": {"retry": {"enabled": False, "count": 5}}}
    env = {"ZIGGURAT_RETRY_ENABLED": "true", "ZIGGURAT_RETRY_COUNT": "7"}
    out = env_overlay(cfg, env)
    assert out["ziggurat"]["retry"] == {"enabled": True, "count": 7}


def test_load_config_layering(tmp_path):
    """defaults < file < env, with app-name interpolation."""
    p = tmp_path / "config.json"
    p.write_text(
        json.dumps(
            {
                "ziggurat": {
                    "app-name": "orders",
                    "retry": {"enabled": True},
                    "stream-router": {
                        "route-1": {"channels": {"audit": {}}}
                    },
                }
            }
        )
    )
    cfg = load_config(str(p), env={"ZIGGURAT_RETRY_ENABLED": "false"})
    # env wins over file
    assert get_in_config(cfg, ["retry", "enabled"]) is False
    # file wins over defaults (count untouched)
    assert get_in_config(cfg, ["retry", "count"]) == 5
    # defaults interpolated with the file's app-name
    assert (
        get_in_config(cfg, ["rabbit-mq", "instant", "queue-name"])
        == "orders_instant_queue"
    )


def test_validate_routes_missing_route_raises():
    """init.clj:213: unknown route -> error naming the route."""
    cfg = {"ziggurat": {"stream-router": {"known": {}}}}
    with pytest.raises(ValueError, match="unknown.*isn't present"):
        validate_routes_against_config(cfg, {"unknown": {"handler-fn": 1}})


def test_validate_routes_channel_subset():
    """init.clj:214-216: registered channels must be configured."""
    cfg = {
        "ziggurat": {
            "stream-router": {"r": {"channels": {"audit": {}}}}
        }
    }
    validate_routes_against_config(cfg, {"r": {"handler-fn": 1, "audit": 2}})
    with pytest.raises(ValueError, match="channel.*ghost"):
        validate_routes_against_config(
            cfg, {"r": {"handler-fn": 1, "ghost": 2}}
        )


def test_retry_config_bridge_channel_exponential():
    """producer.clj:175-224: channel retry override selects the
    exponential backoff mode; timeout comes from the delay queue."""
    cfg = {
        "ziggurat": {
            "retry": {"count": 5, "enabled": True},
            "rabbit-mq": {"delay": {"queue-timeout-ms": 2500}},
            "stream-router": {
                "r": {
                    "channels": {
                        "c": {"retry": {"type": "exponential", "count": 3}}
                    }
                }
            },
        }
    }
    rc = retry_config_from(cfg, "r", "c")
    assert rc.exponential and rc.max_attempts == 3 and rc.timeout_ms == 2500
    base = retry_config_from(cfg)
    assert not base.exponential and base.max_attempts == 5
    assert channel_retry_config(cfg, "r", "c")["count"] == 3


def test_env_overrides_default_only_paths(tmp_path):
    """clonfig parity: an env var must override a path that exists
    ONLY in the defaults — with or without a config file."""
    cfg = load_config(None, env={"ZIGGURAT_RETRY_ENABLED": "true"})
    assert get_in_config(cfg, ["retry", "enabled"]) is True
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"ziggurat": {"app-name": "svc"}}))
    cfg = load_config(
        str(p), env={"ZIGGURAT_STREAMS_OLDEST_PROCESSED_MESSAGE_IN_S": "60"}
    )
    assert (
        get_in_config(cfg, ["streams", "oldest-processed-message-in-s"])
        == 60
    )


def test_interpolation_covers_file_values(tmp_path):
    """%s templates in the USER's config interpolate with app-name,
    like the reference's interpolate-config over the whole merged
    tree (config.clj:55-60)."""
    p = tmp_path / "c.json"
    p.write_text(
        json.dumps(
            {
                "ziggurat": {
                    "app-name": "svc",
                    "rabbit-mq": {
                        "delay": {"queue-name": "%s_custom_delay"}
                    },
                }
            }
        )
    )
    cfg = load_config(str(p), env={})
    assert (
        get_in_config(cfg, ["rabbit-mq", "delay", "queue-name"])
        == "svc_custom_delay"
    )
