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
