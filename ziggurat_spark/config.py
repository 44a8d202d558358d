"""Configuration subsystem — parity with the reference's
`src/ziggurat/config.clj`.

Semantics mirrored:

- layered defaults deep-merged under user config
  (`config.clj:19-53` default map, `config.clj:62-69` deep-merge,
  last-value-wins, recursing only when both sides are maps);
- ``%s`` app-name interpolation of string values
  (`config.clj:55-60` interpolate-config — queue/exchange name
  templates like ``"%s_delay_queue"``);
- environment-variable overlay (`config.clj:80-81` via clonfig:
  every config path can be overridden by the env var named after
  the joined upper-cased path, e.g. ``ZIGGURAT_RETRY_ENABLED``);
- accessors `ziggurat_config`/`rabbitmq_config`/`get_in_config`/
  `channel_retry_config` (`config.clj:92-121`);
- route-vs-config cross-validation (`init.clj:202-224`): a
  registered route must exist in config, and its channels must be
  a subset of the configured channels.

The file format is JSON (our `config.edn` stand-in — the EDN
reader is Clojure-specific; the *layering semantics* are what the
reference defines, not the syntax). Keys use the reference's
kebab-case names so a ziggurat `config.edn` translates 1:1.

What does NOT carry over: RabbitMQ connection/queue topology
settings configure nothing here — on Spark the retry fabric is a
table + column math (SURVEY §2.1 K2-K6), so `:rabbit-mq` keys map
onto `RetryConfig` (timeout, backoff mode) and the rest are
accepted-but-inert for config-file compatibility.
"""

from __future__ import annotations

import json
import os
from typing import Any, Mapping

from ziggurat_spark.streaming.retry_fabric import RetryConfig

#: Mirror of `config.clj:19-53` (`default-config`), kebab-case keys.
DEFAULT_CONFIG: dict[str, Any] = {
    "ziggurat": {
        "nrepl-server": {"port": 70171},
        "statsd": {"port": 8125, "enabled": False},
        "sentry": {
            "enabled": False,
            "worker-count": 10,
            "queue-size": 10,
            "thread-termination-wait-s": 1,
        },
        "rabbit-mq-connection": {
            "port": 5672,
            "username": "guest",
            "password": "guest",
            "channel-timeout": 2000,
            "publish-retry": {
                "back-off-ms": 5000,
                "non-recoverable-exception": {
                    "enabled": True,
                    "back-off-ms": 5000,
                    "count": 5,
                },
            },
        },
        "jobs": {"instant": {"worker-count": 4, "prefetch-count": 4}},
        "rabbit-mq": {
            "delay": {
                "queue-name": "%s_delay_queue",
                "exchange-name": "%s_delay_exchange",
                "dead-letter-exchange": "%s_instant_exchange",
                "queue-timeout-ms": 5000,
            },
            "instant": {
                "queue-name": "%s_instant_queue",
                "exchange-name": "%s_instant_exchange",
            },
            "dead-letter": {
                "queue-name": "%s_dead_letter_queue",
                "exchange-name": "%s_dead_letter_exchange",
            },
        },
        "retry": {"count": 5, "enabled": False},
        "http-server": {
            "middlewares": {"swagger": {"enabled": False}},
            "port": 8080,
            "thread-count": 100,
        },
        "prometheus": {"port": 8002, "enabled": True},
        "new-relic": {"report-errors": False},
        "log-format": "text",
        # Spark-engine stream defaults (streams.clj:22-32 equivalents)
        "streams": {
            "buffered-records-per-partition": 10000,
            "commit-interval-ms": 15000,
            "auto-offset-reset": "latest",
            "oldest-processed-message-in-s": 604800,
        },
    }
}


def deep_merge(*maps: Mapping[str, Any]) -> dict[str, Any]:
    """`config.clj:62-69`: merge right-over-left; recurse only when
    every colliding value is a map, else the last value wins."""
    out: dict[str, Any] = {}
    for m in maps:
        for k, v in m.items():
            if k in out and isinstance(out[k], Mapping) and isinstance(v, Mapping):
                out[k] = deep_merge(out[k], v)
            else:
                out[k] = v if not isinstance(v, Mapping) else deep_merge({}, v)
    return out


def interpolate(config: Any, app_name: str | None) -> Any:
    """`config.clj:55-60`: format ``%s`` templates with the app name
    (every string value, recursively). No-op without an app name."""
    if app_name is None:
        return config
    if isinstance(config, Mapping):
        return {k: interpolate(v, app_name) for k, v in config.items()}
    if isinstance(config, str) and "%s" in config:
        return config.replace("%s", app_name)
    return config


def _parse_env_value(raw: str) -> Any:
    low = raw.strip().lower()
    if low in ("true", "false"):
        return low == "true"
    try:
        return int(raw)
    except ValueError:
        pass
    try:
        return float(raw)
    except ValueError:
        pass
    return raw


def _env_name(path: tuple[str, ...]) -> str:
    return "_".join(p.upper().replace("-", "_") for p in path)


def env_overlay(
    config: Mapping[str, Any], env: Mapping[str, str]
) -> dict[str, Any]:
    """clonfig parity (`config.clj:80-81`): every path present in the
    config can be overridden by the env var named after the joined,
    upper-cased, underscored path — ``{"ziggurat": {"retry":
    {"enabled": ...}}}`` answers to ``ZIGGURAT_RETRY_ENABLED``.
    Values parse as bool/int/float before falling back to string."""

    def walk(node: Any, path: tuple[str, ...]) -> Any:
        if isinstance(node, Mapping):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        raw = env.get(_env_name(path))
        return _parse_env_value(raw) if raw is not None else node

    return walk(config, ())


def load_config(
    path: str | None = None,
    env: Mapping[str, str] | None = None,
) -> dict[str, Any]:
    """Layered load (`config.clj:86-91` defstate): defaults ←
    config file ← environment, with app-name interpolation of the
    defaults (queue-name templates) before the merge."""
    env = os.environ if env is None else env
    file_cfg: dict[str, Any] = {}
    if path:
        with open(path) as f:
            file_cfg = json.load(f)
    # defaults ← file, THEN the env overlay over the merged tree —
    # so an env var can override a path that only the defaults
    # declare (clonfig reads env for every key, not just file keys),
    # THEN %s interpolation over every string in the final config
    # (the reference interpolates the whole merged config, not just
    # its defaults — config.clj:55-60).
    merged = deep_merge(DEFAULT_CONFIG, file_cfg)
    merged = env_overlay(merged, env)
    app_name = (
        merged.get("ziggurat", {}).get("app-name")
        if isinstance(merged.get("ziggurat"), Mapping)
        else None
    )
    return interpolate(merged, app_name)


# -- accessors (config.clj:92-121) --------------------------------------


def ziggurat_config(config: Mapping[str, Any]) -> Mapping[str, Any]:
    return config.get("ziggurat", {})


def rabbitmq_config(config: Mapping[str, Any]) -> Mapping[str, Any]:
    return ziggurat_config(config).get("rabbit-mq", {})


def get_in_config(
    config: Mapping[str, Any], keys: list[str], default: Any = None
) -> Any:
    node: Any = ziggurat_config(config)
    for k in keys:
        if not isinstance(node, Mapping) or k not in node:
            return default
        node = node[k]
    return node


def channel_retry_config(
    config: Mapping[str, Any], topic_entity: str, channel: str
) -> Mapping[str, Any] | None:
    """`config.clj:117-121`."""
    return get_in_config(
        config, ["stream-router", topic_entity, "channels", channel, "retry"]
    )


# -- route cross-validation (init.clj:202-224) ---------------------------


def validate_routes_against_config(
    config: Mapping[str, Any],
    routes: Mapping[str, Mapping[str, Any]],
    route_type: str = "stream-router",
) -> None:
    """A registered route must exist under ``route_type`` in config;
    its channel names must be a subset of the configured channels
    (`init.clj:202-216` — same error shapes)."""
    for topic_entity, handler_map in routes.items():
        route_config = get_in_config(config, [route_type, topic_entity])
        if route_config is None:
            raise ValueError(
                f"Error! Route {topic_entity} isn't present in the "
                f"{route_type} config"
            )
        channels = {k for k in handler_map if k != "handler-fn"}
        config_channels = set(
            get_in_config(config, [route_type, topic_entity, "channels"], {})
        )
        if not channels.issubset(config_channels):
            diff = ",".join(sorted(channels - config_channels))
            raise ValueError(
                f"Error! The channel(s) {diff} aren't present in the "
                f"channels config of {route_type}"
            )


# -- bridge into the engine's typed config -------------------------------


def retry_config_from(
    config: Mapping[str, Any],
    topic_entity: str | None = None,
    channel: str | None = None,
) -> RetryConfig:
    """Build the engine's RetryConfig from layered config: global
    ``:retry`` (count/enabled, `config.clj:45-46`), the delay-queue
    timeout (`config.clj:40`), and — for channels — the per-channel
    retry override incl. ``:type :exponential``
    (`producer.clj:175-224` backoff selection)."""
    retry = dict(get_in_config(config, ["retry"], {}))
    if topic_entity and channel:
        override = channel_retry_config(config, topic_entity, channel)
        if override:
            retry.update(override)
    timeout_ms = get_in_config(
        config, ["rabbit-mq", "delay", "queue-timeout-ms"], 5000
    )
    return RetryConfig(
        enabled=bool(retry.get("enabled", False)),
        max_attempts=int(retry.get("count", 5)),
        timeout_ms=int(timeout_ms),
        exponential=retry.get("type") == "exponential",
    )


def alpha_feature_enabled(config: Mapping[str, Any], feature: str) -> bool:
    """`streams.clj:166`: alpha features are config-gated under
    ``:alpha-features`` (e.g. stream-joins topologies build only when
    ``[:alpha-features :stream-joins]`` is truthy)."""
    return bool(get_in_config(config, ["alpha-features", feature], False))
