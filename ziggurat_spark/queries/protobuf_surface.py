"""Executable protobuf middleware surface (T4/T5/T7 + R4 poison).

The reference's default middleware is protobuf: byte payload → map
(middleware/default.clj:36-85), with recursive google.protobuf.Struct
flattening (default.clj:9-34) and a batch key+value variant
(batch/batch_proto_deserializer.clj:4-21); its tests run real encoded
Person/Photo messages (test/ziggurat/middleware/default_test.clj:12-74
over resources/proto/person.proto, example.proto). This environment
has no spark-protobuf jar/protoc/google.protobuf, so these queries
execute the same semantics through the pure-Python wire-format codec
(functions/protowire.py) — encode real table rows to wire bytes,
decode through the middleware, and let DuckDB recompute the expected
values directly from the tables. A lossless roundtrip is exactly what
the oracle certifies.

Scale shape: encode/decode are Arrow-batched Pandas UDFs (one Python
hop per direction); all projection/aggregation stays JVM-side after
``from_json`` typing. With the jar present, `protobuf_value`
(from_protobuf) replaces the Python hop entirely.
"""

from __future__ import annotations

# module-level so pandas_udf type-hint resolution ('pd.Series' under
# postponed annotations) finds it in __globals__
import pandas as pd  # noqa: F401

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ziggurat_spark.scratch import scratch_dir
from ziggurat_spark.functions.middleware import (
    poison_split,
    protobuf_key_value_py,
    protobuf_value_py,
)
from ziggurat_spark.functions.protowire import Descriptor, Field
from ziggurat_spark.queries.registry import register
from ziggurat_spark.tables import load_table

#: resources/proto/person.proto — Person{id=1,name=2,email=3,likes=4,
#: characters=5 google.protobuf.Struct}
PERSON = Descriptor(
    "Person",
    (
        Field(1, "id", "int32"),
        Field(2, "name", "string"),
        Field(3, "email", "string"),
        Field(4, "likes", "string"),
        Field(5, "characters", "struct"),
    ),
)

PERSON_SCHEMA = (
    "id INT, name STRING, email STRING, likes STRING, "
    "characters STRUCT<balance: DOUBLE, nation: DOUBLE, tags: ARRAY<STRING>>"
)

#: resources/proto/example.proto — Photo{id=1,path=2,image=6} with
#: nested Tag{person_id=1,y_coord=3,width=4,height=5}; `tags` is this
#: surface's repeated-field exercise of the nested type.
TAG = Descriptor(
    "Tag",
    (
        Field(1, "person_id", "int32"),
        Field(3, "y_coord", "int32"),
        Field(4, "width", "int32"),
        Field(5, "height", "int32"),
    ),
)
PHOTO = Descriptor(
    "Photo",
    (
        Field(1, "id", "int32"),
        Field(2, "path", "string"),
        Field(6, "image", "bytes"),
        Field(7, "tags", "message", repeated=True, message=TAG),
    ),
)
PHOTO_SCHEMA = (
    "id INT, path STRING, image STRING, "
    "tags ARRAY<STRUCT<person_id: INT, y_coord: INT, width: INT, height: INT>>"
)

ORDER_KEY = Descriptor("OrderKey", (Field(1, "order_id", "int64"),))
ORDER_VAL = Descriptor(
    "OrderVal",
    (
        Field(1, "status", "string"),
        Field(2, "total_cents", "int64"),
        Field(3, "priority", "string"),
    ),
)


def _encode_person(df: DataFrame) -> DataFrame:
    """customer rows → Person wire bytes (deterministic test payloads)."""
    import json

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from ziggurat_spark.functions import protowire

    @pandas_udf("binary")
    def enc(col: pd.Series) -> pd.Series:
        out = []
        for row in col:
            m = json.loads(row)
            m["characters"] = {
                "balance": m.pop("balance"),
                "nation": float(m.pop("nation")),
                "tags": [m["likes"], None],
            }
            out.append(protowire.encode(m, PERSON))
        return pd.Series(out, dtype=object)

    payload = F.to_json(
        F.struct(
            F.col("c_custkey").cast("int").alias("id"),
            F.col("c_name").alias("name"),
            F.concat(F.lower(F.col("c_name")), F.lit("@example.com")).alias(
                "email"
            ),
            F.col("c_mktsegment").alias("likes"),
            F.col("c_acctbal").alias("balance"),
            F.col("c_nationkey").alias("nation"),
        )
    )
    # spread the Python codec across cores (single source file
    # otherwise serializes the whole Arrow chain into one task)
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    return df.select(enc(payload).alias("value"))


@register(
    "x_proto_roundtrip_person",
    oracle=(
        "SELECT CAST(c_custkey AS INT) AS id, c_name AS name, "
        "lower(c_name) || '@example.com' AS email, "
        "c_mktsegment AS likes, c_acctbal AS balance, "
        "CAST(c_nationkey AS DOUBLE) AS nation, c_mktsegment AS tag0 "
        "FROM customer ORDER BY id"
    ),
    doc=(
        "T4+T5: encode customers as Person wire bytes (incl. a "
        "google.protobuf.Struct field with number/string/list/null "
        "values), decode through the wire-codec middleware, project "
        "the typed payload. Oracle recomputes from the table — a "
        "hash match proves the roundtrip lossless "
        "(middleware/default.clj:36-85, person.proto)."
    ),
    tags=("protobuf",),
)
def x_proto_roundtrip_person(spark: SparkSession, sf: str) -> DataFrame:
    encoded = _encode_person(load_table(spark, sf, "customer"))
    decoded = protobuf_value_py(PERSON, PERSON_SCHEMA)(encoded)
    p = F.col("payload")
    return decoded.select(
        p["id"].alias("id"),
        p["name"].alias("name"),
        p["email"].alias("email"),
        p["likes"].alias("likes"),
        p["characters"]["balance"].alias("balance"),
        p["characters"]["nation"].alias("nation"),
        p["characters"]["tags"][0].alias("tag0"),
    ).orderBy("id")


@register(
    "x_proto_struct_flatten",
    oracle=(
        "SELECT doc_id, path, value_json FROM ("
        "  SELECT doc_id, 'meta.lang' AS path, to_json(lang) AS value_json"
        "    FROM documents"
        "  UNION ALL SELECT doc_id, 'meta.n_chars',"
        "    to_json(CAST(n_chars AS DOUBLE)) FROM documents"
        "  UNION ALL SELECT doc_id, 'flags.0', to_json(source) FROM documents"
        "  UNION ALL SELECT doc_id, 'archived', 'null' FROM documents"
        ") ORDER BY doc_id, path"
    ),
    doc=(
        "T5 recursive Struct flatten parity (default.clj:9-34): encode "
        "a Struct {meta:{lang,n_chars}, flags:[source], archived:null} "
        "per document, decode, and emit dotted-path/value rows — "
        "null_value→None, struct_value→recurse, list_value→indexed."
    ),
    tags=("protobuf",),
)
def x_proto_struct_flatten(spark: SparkSession, sf: str) -> DataFrame:
    import json

    import pandas as pd

    from ziggurat_spark.functions import protowire

    docs = load_table(spark, sf, "documents").select(
        "doc_id", "lang", "n_chars", "source"
    )

    def flatten(it):
        for pdf in it:
            rows = []
            for doc_id, lang, n_chars, source in zip(
                pdf["doc_id"], pdf["lang"], pdf["n_chars"], pdf["source"]
            ):
                struct_obj = {
                    "meta": {"lang": lang, "n_chars": float(n_chars)},
                    "flags": [source],
                    "archived": None,
                }
                # wire roundtrip, then the reference's recursive walk
                plain = protowire.decode_struct(
                    protowire.encode_struct(struct_obj)
                )

                def walk(prefix, v):
                    if isinstance(v, dict):
                        for k, sub in v.items():
                            walk(f"{prefix}.{k}" if prefix else k, sub)
                    elif isinstance(v, list):
                        for i, sub in enumerate(v):
                            walk(f"{prefix}.{i}", sub)
                    else:
                        rows.append((doc_id, prefix, json.dumps(v)))

                walk("", plain)
            yield pd.DataFrame(
                rows, columns=["doc_id", "path", "value_json"]
            )

    return (
        docs.mapInPandas(
            flatten, "doc_id LONG, path STRING, value_json STRING"
        ).orderBy("doc_id", "path")
    )


@register(
    "x_proto_batch_kv",
    oracle=(
        "SELECT status, count(*) AS n, CAST(sum(total_cents) AS BIGINT)"
        " AS cents, CAST(sum(o_orderkey) AS BIGINT) AS key_sum FROM ("
        "  SELECT o_orderkey, o_orderstatus AS status,"
        "         CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents"
        "  FROM orders) GROUP BY status ORDER BY status"
    ),
    doc=(
        "T7 batch key+value proto deserializer "
        "(batch_proto_deserializer.clj:4-21): key and value are "
        "separate wire-encoded messages; decode both, join-key check "
        "implicit in the aggregation over decoded values."
    ),
    tags=("protobuf",),
)
def x_proto_batch_kv(spark: SparkSession, sf: str) -> DataFrame:
    import json

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from ziggurat_spark.functions import protowire

    @pandas_udf("key binary, value binary")
    def enc_kv(col: pd.Series) -> pd.DataFrame:
        # one Arrow pass encodes both sides — two separate UDFs would
        # double the Python transfer for test-data synthesis
        keys, vals = [], []
        for row in col:
            m = json.loads(row)
            keys.append(
                protowire.encode({"order_id": int(m.pop("order_id"))}, ORDER_KEY)
            )
            vals.append(protowire.encode(m, ORDER_VAL))
        return pd.DataFrame({"key": keys, "value": vals})

    # one parquet file would run the whole Python codec chain in a
    # single task; spread the Arrow batches across the cores (the
    # Kafka source this stands in for has partition parallelism)
    orders = load_table(spark, sf, "orders").repartition(
        spark.sparkContext.defaultParallelism
    )
    kv = enc_kv(
        F.to_json(
            F.struct(
                F.col("o_orderkey").alias("order_id"),
                F.col("o_orderstatus").alias("status"),
                F.round(F.col("o_totalprice") * 100)
                .cast("long")
                .alias("total_cents"),
                F.col("o_orderpriority").alias("priority"),
            )
        )
    )
    encoded = orders.select(kv.alias("kv")).select(
        F.col("kv.key").alias("key"), F.col("kv.value").alias("value")
    )
    decoded = protobuf_key_value_py(
        ORDER_KEY,
        "order_id LONG",
        ORDER_VAL,
        "status STRING, total_cents LONG, priority STRING",
    )(encoded)
    return (
        decoded.groupBy(F.col("payload")["status"].alias("status"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("payload")["total_cents"]).alias("cents"),
            # consuming the decoded KEY keeps Catalyst from pruning
            # the key-deserializer path out of the plan — T7's whole
            # point is that BOTH sides decode
            F.sum(F.col("key_payload")["order_id"]).alias("key_sum"),
        )
        .orderBy("status")
    )


@register(
    "x_proto_nested_repeated",
    oracle=(
        "SELECT id, path, image_text, tag_idx, person_id, y_coord FROM ("
        "  SELECT CAST(doc_id AS INT) AS id,"
        "         source || '/' || doc_id AS path,"
        "         substr(text, 1, 8) AS image_text,"
        "         0 AS tag_idx, CAST(doc_id % 5 AS INT) AS person_id,"
        "         CAST(n_chars AS INT) AS y_coord FROM documents"
        "  UNION ALL"
        "  SELECT CAST(doc_id AS INT), source || '/' || doc_id,"
        "         substr(text, 1, 8), 1, CAST(doc_id % 3 AS INT),"
        "         0 FROM documents"
        ") ORDER BY id, tag_idx"
    ),
    doc=(
        "T4 nested + repeated message fields and a bytes field "
        "(example.proto Photo/Tag): encode two Tag sub-messages and a "
        "UTF-8 bytes image per document, decode, posexplode the "
        "repeated field. Bytes survive via the canonical base64 "
        "mapping and are decoded back for the oracle comparison."
    ),
    tags=("protobuf",),
)
def x_proto_nested_repeated(spark: SparkSession, sf: str) -> DataFrame:
    import json

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from ziggurat_spark.functions import protowire

    @pandas_udf("binary")
    def enc(col: pd.Series) -> pd.Series:
        out = []
        for row in col:
            m = json.loads(row)
            msg = {
                "id": m["id"],
                "path": m["path"],
                "image": m["image_text"].encode("utf-8"),
                "tags": [
                    {
                        "person_id": m["id"] % 5,
                        "y_coord": m["y_coord"],
                        "width": 0,
                        "height": 0,
                    },
                    {
                        "person_id": m["id"] % 3,
                        "y_coord": 0,
                        "width": 0,
                        "height": 0,
                    },
                ],
            }
            out.append(protowire.encode(msg, PHOTO))
        return pd.Series(out, dtype=object)

    docs = load_table(spark, sf, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    encoded = docs.select(
        enc(
            F.to_json(
                F.struct(
                    F.col("doc_id").cast("int").alias("id"),
                    F.concat_ws("/", F.col("source"), F.col("doc_id")).alias(
                        "path"
                    ),
                    F.substring(F.col("text"), 1, 8).alias("image_text"),
                    F.col("n_chars").cast("int").alias("y_coord"),
                )
            )
        ).alias("value")
    )
    decoded = protobuf_value_py(PHOTO, PHOTO_SCHEMA)(encoded)
    p = F.col("payload")
    return (
        decoded.select(
            p["id"].alias("id"),
            p["path"].alias("path"),
            # canonical JSON carries bytes as base64; unbase64 + cast
            # recovers the UTF-8 text for the oracle comparison
            F.unbase64(p["image"]).cast("string").alias("image_text"),
            F.posexplode(p["tags"]).alias("tag_idx", "tag"),
        )
        .select(
            "id",
            "path",
            "image_text",
            "tag_idx",
            F.col("tag")["person_id"].alias("person_id"),
            F.col("tag")["y_coord"].alias("y_coord"),
        )
        .orderBy("id", "tag_idx")
    )


@register(
    "x_proto_poison_shunt",
    oracle=(
        "SELECT CAST(sum(CASE WHEN c_custkey % 10 = 0 THEN 1 ELSE 0 END)"
        " AS BIGINT) AS poison, "
        "CAST(sum(CASE WHEN c_custkey % 10 <> 0 THEN 1 ELSE 0 END)"
        " AS BIGINT) AS good, "
        "CAST(sum(CASE WHEN c_custkey % 10 <> 0 "
        "THEN CAST(c_custkey AS INT) ELSE 0 END) AS BIGINT) AS id_sum "
        "FROM customer"
    ),
    doc=(
        "R4 over proto payloads: every 10th record is corrupted to "
        "undecodable bytes; the middleware yields NULL payloads which "
        "poison_split shunts to the dead set as-is "
        "(messaging/consumer.clj:28-48) while good rows keep typed "
        "fields."
    ),
    tags=("protobuf", "routing"),
)
def x_proto_poison_shunt(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer")
    encoded = _encode_person(cust.filter(F.col("c_custkey") % 10 != 0))
    # truncated garbage: a dangling length-delimited header (field 2,
    # wire 2, declared length 200 with no bytes following)
    poison = (
        cust.filter(F.col("c_custkey") % 10 == 0)
        .select(F.expr("X'12C8'").alias("value"))
    )
    decoded = protobuf_value_py(PERSON, PERSON_SCHEMA)(
        encoded.unionByName(poison)
    )
    good, bad = poison_split(decoded)
    # one pass over the split union keeps the oracle to a single row;
    # the split itself is what R4 exercises
    return (
        bad.select(F.lit(None).cast("int").alias("id"))
        .unionByName(good.select(F.col("payload")["id"].alias("id")))
        .agg(
            F.sum(F.when(F.col("id").isNull(), 1).otherwise(0)).alias(
                "poison"
            ),
            F.sum(F.when(F.col("id").isNotNull(), 1).otherwise(0)).alias(
                "good"
            ),
            F.sum(F.coalesce(F.col("id").cast("long"), F.lit(0))).alias(
                "id_sum"
            ),
        )
    )


@register(
    "x_route_proto_pipeline",
    oracle=(
        "WITH routed AS (SELECT CASE "
        "WHEN c_custkey % 10 = 0 THEN 'dead-letter' "  # corrupted bytes
        "WHEN c_acctbal < 0 THEN 'retry' "
        "WHEN c_custkey % 3 = 0 THEN 'skip' ELSE 'success' END AS o "
        "FROM customer) "
        "SELECT CAST(count(*) AS BIGINT) AS total, "
        "CAST(sum(CASE WHEN o = 'success' THEN 1 ELSE 0 END) AS BIGINT) "
        "AS success, "
        "CAST(sum(CASE WHEN o = 'skip' THEN 1 ELSE 0 END) AS BIGINT) "
        "AS skip, "
        "CAST(sum(CASE WHEN o = 'retry' THEN 1 ELSE 0 END) AS BIGINT) "
        "AS retry_queued, "
        "CAST(sum(CASE WHEN o = 'dead-letter' THEN 1 ELSE 0 END) AS BIGINT)"
        " AS dead_lettered FROM routed"
    ),
    doc=(
        "The reference's DEFAULT dataflow, end-to-end in the engine: "
        "proto-encoded payloads (every 10th corrupted) run through a "
        "real engine route whose middleware is the wire-codec proto "
        "deserializer (T4), the handler dispatches on DECODED fields "
        "(R1: negative balance → retry, custkey%3 → skip, NULL "
        "payload → dead-letter, the R4 poison path), and the graded "
        "counts come from the retry/dead-set FABRIC TABLES plus batch "
        "stats — proving middleware, dispatch, and side effects "
        "together, not just the column math."
    ),
    tags=("protobuf", "routing", "pipeline"),
)
def x_route_proto_pipeline(spark: SparkSession, sf: str) -> DataFrame:

    from ziggurat_spark.envelope import ensure_envelope
    from ziggurat_spark.streaming.engine import Route, ZigguratEngine
    from ziggurat_spark.streaming.retry_fabric import RetryConfig

    cust = load_table(spark, sf, "customer")
    good = _encode_person(cust.filter(F.col("c_custkey") % 10 != 0))
    poison = (
        cust.filter(F.col("c_custkey") % 10 == 0)
        .select(F.expr("X'12C8'").alias("value"))
    )
    env_src = ensure_envelope(good.unionByName(poison))

    p = F.col("payload")
    handler = lambda df: df.withColumn(  # noqa: E731
        "outcome",
        F.when(p.isNull(), "dead-letter")
        .when(p["characters"]["balance"] < 0, "retry")
        .when(p["id"] % 3 == 0, "skip")
        .otherwise("success"),
    )
    workdir = scratch_dir("zs_proto_route_")
    engine = ZigguratEngine(spark, workdir, app_name="proto_route_query")
    engine.register_route(
        Route(
            name="proto_route",
            source=lambda: env_src,
            middleware=(protobuf_value_py(PERSON, PERSON_SCHEMA),),
            handler=handler,
            retry=RetryConfig(max_attempts=3, timeout_ms=60_000),
            oldest_processed_s=None,
        )
    )
    stats = engine.run_batch_route("proto_route")
    rt = engine.fabric.retry_table()
    dt = engine.fabric.dead_set_table()
    retry_queued = 0 if rt is None else rt.count()
    dead_lettered = 0 if dt is None else dt.count()
    return spark.range(1).select(
        F.lit(stats.total).cast("bigint").alias("total"),
        F.lit(stats.success).cast("bigint").alias("success"),
        F.lit(stats.skip).cast("bigint").alias("skip"),
        F.lit(retry_queued).cast("bigint").alias("retry_queued"),
        F.lit(dead_lettered).cast("bigint").alias("dead_lettered"),
    )
