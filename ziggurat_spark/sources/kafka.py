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
