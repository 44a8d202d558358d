"""Source/sink builders — option assembly (no broker in this env)
and the file-source execution path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ziggurat_spark.sources.files import file_stream_source
from ziggurat_spark.sources.kafka import kafka_options


def test_kafka_pattern_options():
    opts = kafka_options(
        "b:9092", topic_pattern="^orders-.*", max_offsets_per_trigger=500
    )
    assert opts["subscribePattern"] == "^orders-.*"
    assert opts["kafka.bootstrap.servers"] == "b:9092"
    assert opts["startingOffsets"] == "latest"  # streams.clj:25 default
    assert opts["includeHeaders"] == "true"
    assert opts["maxOffsetsPerTrigger"] == "500"
    assert "subscribe" not in opts


def test_kafka_topic_list_options():
    opts = kafka_options("b:9092", topics=["t1", "t2"], include_headers=False)
    assert opts["subscribe"] == "t1,t2"
    assert opts["includeHeaders"] == "false"


def test_kafka_options_exclusive():
    with pytest.raises(ValueError):
        kafka_options("b:9092")
    with pytest.raises(ValueError):
        kafka_options("b:9092", topic_pattern="x", topics=["y"])


def test_file_stream_source_runs(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.range(10).withColumn("v", F.col("id") * 2).write.parquet(src)
    stream = file_stream_source(spark, src, max_files_per_trigger=1)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("fss")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert spark.sql("SELECT count(*) n FROM fss").collect()[0].n == 10


# -- config → Kafka property assembly (config.clj:139-300) ---------------


def test_kafka_properties_mapping_and_skip():
    from ziggurat_spark.sources.kafka import (
        STREAMS_CONFIG_MAPPING,
        kafka_properties,
    )

    props = kafka_properties(
        STREAMS_CONFIG_MAPPING,
        {
            "auto-offset-reset-config": "latest",
            "stream-threads-count": 4,
            "origin-topic": "should-be-skipped",
            "channels": {"x": 1},
            "session-timeout-ms-config": 60000,
        },
    )
    assert props == {
        "auto.offset.reset": "latest",
        "num.stream.threads": "4",
        "session.timeout.ms": "60000",
    }


def test_jaas_template_blank_credentials_omitted():
    from ziggurat_spark.sources.kafka import create_jaas_properties

    assert (
        create_jaas_properties("u", "p", "org.example.Plain")
        == 'org.example.Plain required username="u" password="p";'
    )
    # blank creds: the template must not render empty username=/password=
    assert (
        create_jaas_properties(None, "  ", "org.example.Plain")
        == "org.example.Plain required;"
    )


def test_sasl_properties_gated_and_first_wins():
    from ziggurat_spark.sources.kafka import build_sasl_properties

    cfg = {
        "enabled": True,
        "mechanism": "SCRAM-SHA-512",
        "protocol": "SASL_SSL",
        "jaas": {
            "username": "user",
            "password": "pass",
            "login-module": "org.apache.kafka.common.security.scram.ScramLoginModule",
        },
    }
    props = build_sasl_properties({}, cfg)
    assert props["sasl.mechanism"] == "SCRAM-SHA-512"
    assert props["security.protocol"] == "SASL_SSL"
    assert props["sasl.jaas.config"].startswith(
        "org.apache.kafka.common.security.scram.ScramLoginModule required"
    )
    # disabled → untouched
    assert build_sasl_properties({}, {**cfg, "enabled": False}) == {}
    # putIfAbsent semantics: an existing protocol is not overwritten
    pre = {"security.protocol": "SASL_PLAINTEXT"}
    assert (
        build_sasl_properties(pre, cfg)["security.protocol"]
        == "SASL_PLAINTEXT"
    )


def test_ssl_properties_pass_through_and_spark_prefix():
    from ziggurat_spark.sources.kafka import (
        as_spark_kafka_options,
        build_ssl_properties,
    )

    props = build_ssl_properties(
        {},
        {
            "enabled": "true",
            "ssl-keystore-location": "/tmp/ks.jks",
            "ssl-keystore-password": "secret",
        },
    )
    assert props["ssl.keystore.location"] == "/tmp/ks.jks"
    opts = as_spark_kafka_options(props)
    assert opts["kafka.ssl.keystore.location"] == "/tmp/ks.jks"
