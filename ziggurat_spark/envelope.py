"""The message envelope — Spark-native MessagePayload.

The reference wraps each Kafka record in a MessagePayload
(message_payload.clj:4) enriched with key/headers/metadata
(streams.clj:125-132, header_transformer.clj:8-14). Spark's Kafka
source already produces exactly that shape as columns; this module
pins the canonical schema so file-backed test sources, the retry
fabric and the dead set all speak the same envelope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Envelope columns (FIXTURES.md §2.1): what spark.readStream
#: .format("kafka").option("includeHeaders", True) emits, plus the
#: retry counter the reference carries in-message
#: (producer.clj:288-293).
ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
        T.StructField("topic", T.StringType(), True),
        T.StructField("partition", T.IntegerType(), True),
        T.StructField("offset", T.LongType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField(
            "headers",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", T.StringType(), True),
                        T.StructField("value", T.BinaryType(), True),
                    ]
                )
            ),
            True,
        ),
        T.StructField("attempt", T.IntegerType(), True),
    ]
)

ENVELOPE_COLUMNS = tuple(f.name for f in ENVELOPE_SCHEMA.fields)


def ensure_envelope(df: DataFrame) -> DataFrame:
    """Add any missing envelope columns as typed NULLs/defaults so
    arbitrary sources (files in tests, kafka in prod) line up."""
    existing = set(df.columns)
    for field in ENVELOPE_SCHEMA.fields:
        if field.name not in existing:
            df = df.withColumn(field.name, F.lit(None).cast(field.dataType))
    return df


def events_as_envelope(events: DataFrame) -> DataFrame:
    """Adapt the test `events` table into envelope shape: user_id is
    the record key, the JSON props string is the value payload —
    mirrors the string-serde route of the reference's test config
    (config.test.edn :using-string-serde)."""
    env = events.select(
        F.encode(F.col("user_id").cast("string"), "UTF-8").alias("key"),
        F.encode(F.col("props"), "UTF-8").alias("value"),
        F.lit("events").alias("topic"),
        F.pmod(F.col("user_id"), F.lit(32)).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("ts").alias("timestamp"),
        F.col("event_type"),
        F.col("value").alias("payload_value"),
    )
    return ensure_envelope(env)
