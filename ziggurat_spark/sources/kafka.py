"""Kafka sources and sinks — S1/S2/S3 and K1 of the inventory.

The reference subscribes each route to a topic REGEX with byte-array
serdes and ingestion-time extraction (streams.clj:181-190, pattern at
184, serdes 31-32, extractor 42-43), one KStream per :input-topics
entry for stream-joins (171-175), and a polling batch consumer with
max-poll-records (kafka_consumer/consumer.clj:25-37,
consumer_handler.clj:98-115). The producer pool (producer.clj:66-112)
sends key/value bytes to a topic.

Spark-first: `spark.readStream.format("kafka")` already emits the
exact envelope the reference assembles by hand — key/value BINARY,
topic, partition, offset, timestamp, headers — so source = options,
no transform layer:

| reference                           | option                        |
|-------------------------------------|-------------------------------|
| topic-pattern subscribe             | subscribePattern              |
| :input-topics list (stream joins)   | one reader per topic (subscribe) |
| byte-array serdes                   | (native: value/key BINARY)    |
| headers via HeaderTransformer       | includeHeaders=true           |
| max-poll-records batching           | maxOffsetsPerTrigger          |
| auto-offset-reset latest            | startingOffsets=latest        |
| poll loop → micro-batches           | trigger/foreachBatch (engine) |

These builders only CONFIGURE the reader/writer (the kafka connector
jar and a broker are not present in the test environment; tests
assert the option assembly and use file sources for execution).

Scale: one source DataFrame per route; Spark parallelism follows
topic partitions at the scan and is decoupled after any exchange —
the engine's `parallelism` repartition replaces the channels
pattern (doc/CONCEPTS.md:20-43).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def kafka_options(
    brokers: str,
    *,
    topic_pattern: str | None = None,
    topics: list[str] | None = None,
    include_headers: bool = True,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
    extra: dict[str, str] | None = None,
) -> dict[str, str]:
    """Assemble the option map (exactly one of pattern/topics)."""
    if topics is not None and not topics:
        raise ValueError("topics must be non-empty when provided")
    if (topic_pattern is None) == (topics is None):
        raise ValueError("exactly one of topic_pattern / topics is required")
    opts = {
        "kafka.bootstrap.servers": brokers,
        "startingOffsets": starting_offsets,
        "includeHeaders": "true" if include_headers else "false",
    }
    if topic_pattern is not None:
        opts["subscribePattern"] = topic_pattern
    else:
        opts["subscribe"] = ",".join(topics)
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    opts.update(extra or {})
    return opts


def kafka_stream_source(
    spark: SparkSession, brokers: str, topic_pattern: str, **kw
) -> DataFrame:
    """S1: streaming source over a topic regex (origin-topic)."""
    opts = kafka_options(brokers, topic_pattern=topic_pattern, **kw)
    return spark.readStream.format("kafka").options(**opts).load()


def kafka_stream_sources(
    spark: SparkSession, brokers: str, input_topics: list[str], **kw
) -> list[DataFrame]:
    """S2: one source per :input-topics entry, for windowed joins
    (streams.clj:171-175) — feed to operators.stream_joins."""
    return [
        spark.readStream.format("kafka")
        .options(**kafka_options(brokers, topics=[t], **kw))
        .load()
        for t in input_topics
    ]


def kafka_batch_source(
    spark: SparkSession,
    brokers: str,
    topic_pattern: str,
    max_poll_records: int = 500,
    **kw,
) -> DataFrame:
    """S3: the batch-consumer route — same stream source bounded per
    trigger by max-poll-records (doc/kafka_produce_consume.md:83);
    the engine runs it with foreachBatch like the poll loop."""
    return kafka_stream_source(
        spark,
        brokers,
        topic_pattern,
        max_offsets_per_trigger=max_poll_records,
        **kw,
    )


def kafka_sink_writer(
    df: DataFrame, brokers: str, topic: str, checkpoint: str | None = None
):
    """K1: producer send. Expects `key`/`value` BINARY (and optional
    `partition`) columns — the producer.clj:87-112 signature. Returns
    the configured writer; caller calls .save() (batch) or .start()
    (streaming)."""
    if df.isStreaming:
        w = (
            df.writeStream.format("kafka")
            .option("kafka.bootstrap.servers", brokers)
            .option("topic", topic)
        )
        if checkpoint:
            w = w.option("checkpointLocation", checkpoint)
        return w
    return (
        df.write.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
    )


# -- config → Kafka property assembly (config.clj:139-300 parity) --------

#: config.clj:139-146 — consumer config renames (kebab-case keys).
CONSUMER_CONFIG_MAPPING = {
    "auto-offset-reset-config": "auto-offset-reset",
    "commit-interval-ms": "auto-commit-interval-ms",
    "consumer-group-id": "group-id",
    "default-api-timeout-ms-config": "default-api-timeout-ms",
    "key-deserializer-class-config": "key-deserializer",
    "session-timeout-ms-config": "session-timeout-ms",
    "value-deserializer-class-config": "value-deserializer",
}

#: config.clj:148-151.
PRODUCER_CONFIG_MAPPING = {
    "key-serializer-class": "key-serializer",
    "retries-config": "retries",
    "value-serializer-class": "value-serializer",
}

#: config.clj:153-160.
STREAMS_CONFIG_MAPPING = {
    "auto-offset-reset-config": "auto-offset-reset",
    "default-api-timeout-ms-config": "default-api-timeout-ms",
    "changelog-topic-replication-factor": "replication-factor",
    "session-timeout-ms-config": "session-timeout-ms",
    "stream-threads-count": "num-stream-threads",
}

#: config.clj:162-174 — route keys that are NOT Kafka properties.
NON_KAFKA_CONFIG_KEYS = frozenset(
    {
        "channels",
        "consumer-type",
        "input-topics",
        "join-cfg",
        "oldest-processed-message-in-s",
        "origin-topic",
        "poll-timeout-ms-config",
        "producer",
        "thread-count",
        "enabled",
        "manual-commit-enabled",
        "jaas",
    }
)


def kafka_properties(
    mapping_table: dict[str, str], config: dict
) -> dict[str, str]:
    """config.clj:199-206 set-property over a config map: rename via
    the mapping table, kebab-case → dotted property names, values
    normalized to trimmed strings; non-Kafka route keys skipped."""
    out: dict[str, str] = {}
    for k, v in config.items():
        if k in NON_KAFKA_CONFIG_KEYS or v is None:
            continue
        prop = mapping_table.get(k, k).replace("-", ".")
        # normalize-value parity: Clojure (str true) = "true"
        if isinstance(v, bool):
            v = "true" if v else "false"
        out[prop] = str(v).strip()
    return out


def create_jaas_properties(
    username: str | None, password: str | None, login_module: str
) -> str:
    """config.clj:209-213 — the exact JAAS template: blank
    credentials are omitted, not rendered empty."""

    def blank(s):
        return s is None or not str(s).strip()

    parts = ""
    if not blank(username):
        parts += f' username="{username}"'
    if not blank(password):
        parts += f' password="{password}"'
    return f"{login_module} required{parts};"


def _apply_auth(
    props: dict[str, str], auth: dict, mapping: dict[str, str] | None = None
) -> dict[str, str]:
    """Shared SASL/SSL assembly (config.clj:215-231 + 233-300):
    JAAS from the nested :jaas map, then mechanism / protocol /
    login-callback-handler under their canonical Kafka names
    (putIfAbsent = first-wins), then the WHOLE map through the
    section's set-property (reduce-kv in the reference — which also
    re-sets mechanism/protocol/login-callback-handler under their raw
    dotted names, faithfully reproduced; the Kafka client ignores
    unknown keys)."""
    jaas = auth.get("jaas")
    if jaas is not None:
        props["sasl.jaas.config"] = create_jaas_properties(
            jaas.get("username"), jaas.get("password"), jaas.get("login-module")
        )
    for key, prop in (
        ("mechanism", "sasl.mechanism"),
        ("protocol", "security.protocol"),
        ("login-callback-handler", "sasl.login.callback.handler.class"),
    ):
        if auth.get(key) is not None:
            props.setdefault(prop, str(auth[key]))
    props.update(kafka_properties(mapping or {}, auth))
    return props


def build_ssl_properties(
    props: dict[str, str],
    ssl_config: dict | None,
    mapping: dict[str, str] | None = None,
):
    """config.clj:233-263 — applied only when :enabled is true
    (boolean true or the string \"true\")."""
    if not ssl_config or ssl_config.get("enabled") not in (True, "true"):
        return props
    return _apply_auth(props, ssl_config, mapping)


def build_sasl_properties(
    props: dict[str, str],
    sasl_config: dict | None,
    mapping: dict[str, str] | None = None,
):
    """config.clj:265-300 — applied only when :enabled is true."""
    if not sasl_config or sasl_config.get("enabled") not in (True, "true"):
        return props
    return _apply_auth(props, sasl_config, mapping)


def build_properties(
    mapping_table: dict[str, str],
    config_map: dict,
    ssl_config: dict | None = None,
    sasl_config: dict | None = None,
) -> dict[str, str]:
    """config.clj:300-322 build-properties: SSL first, SASL second,
    then the section config-map — so a section may override auth
    properties, exactly the documented precedence. Use with
    CONSUMER/PRODUCER/STREAMS_CONFIG_MAPPING for the three
    build-*-config-properties partials (config.clj:324-331)."""
    props: dict[str, str] = {}
    build_ssl_properties(props, ssl_config, mapping_table)
    build_sasl_properties(props, sasl_config, mapping_table)
    props.update(kafka_properties(mapping_table, config_map))
    return props


def as_spark_kafka_options(props: dict[str, str]) -> dict[str, str]:
    """Kafka client properties → Spark source/sink options: Spark
    passes through everything under the ``kafka.`` prefix."""
    return {f"kafka.{k}": v for k, v in props.items()}
