"""Source/sink format round-trips in the GRADED surface: each query
writes a slice of `events` to a non-parquet format in a fresh temp
dir, reads it back with an explicit schema, and aggregates — proving
the engine's CSV and JSON read/write paths under the oracle contract
(the reference's serde surface is byte[]/String/proto per route,
streams.clj:31-32; a Spark engine's equivalent breadth is its file
formats).

The aggregate is computed from the re-read copy, the oracle from the
original table — they match only if the round-trip is lossless for
the projected columns. Timestamps are carried as ISO strings (CSV
has no type system; JSON round-trips them as strings by schema), and
doubles as exact integer hundredths.

Scale shape: writes repartition to a handful of files locally but
the path is the standard distributed writer — at 100 TB the same
plan writes one file per task with no driver involvement.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ziggurat_spark.queries.registry import register
from ziggurat_spark.scratch import scratch_dir
from ziggurat_spark.tables import load_table

_AGG_ORACLE = (
    "SELECT event_type, count(*) AS n, "
    "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sv100, "
    "min(event_id) AS min_id, max(event_id) AS max_id "
    "FROM events GROUP BY event_type ORDER BY event_type"
)


def _projected(spark: SparkSession, sf: str) -> DataFrame:
    return load_table(spark, sf, "events").select(
        "event_id",
        "event_type",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v100"),
        F.col("ts").cast("string").alias("ts_iso"),
    )


def _agg(df: DataFrame) -> DataFrame:
    return (
        df.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("v100").alias("sv100"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
        )
        .orderBy("event_type")
    )


_RT_SCHEMA = "event_id BIGINT, event_type STRING, v100 BIGINT, ts_iso STRING"


@register(
    "x_csv_roundtrip",
    oracle=_AGG_ORACLE,
    doc=(
        "CSV sink → source round-trip: write the projected events "
        "slice as headered CSV, read it back with an explicit "
        "schema (never inferSchema — a second full scan at 100 TB), "
        "aggregate the copy. Matching the oracle (which reads the "
        "original parquet) proves the format path is lossless for "
        "typed integer/string columns."
    ),
    tags=("sources", "csv"),
)
def x_csv_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    # the temp dir outlives the call — the returned plan reads from it
    # lazily (no collect/createDataFrame: the result stays JVM-side)
    out = scratch_dir("zs_csv_rt_")
    path = os.path.join(out, "events_csv")
    _projected(spark, sf).write.mode("overwrite").option("header", "true").csv(
        path
    )
    back = spark.read.schema(_RT_SCHEMA).option("header", "true").csv(path)
    return _agg(back)


@register(
    "x_json_roundtrip",
    oracle=_AGG_ORACLE,
    doc=(
        "JSON-lines sink → source round-trip with an explicit read "
        "schema — the same path the JSON middleware (T6, "
        "middleware/json.clj) rides in streaming routes, proven "
        "lossless under the oracle contract. Schema-on-read keeps "
        "the parse single-pass and columnar."
    ),
    tags=("sources", "json"),
)
def x_json_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    out = scratch_dir("zs_json_rt_")
    path = os.path.join(out, "events_json")
    _projected(spark, sf).write.mode("overwrite").json(path)
    back = spark.read.schema(_RT_SCHEMA).json(path)
    return _agg(back)


@register(
    "x_orc_roundtrip",
    oracle=_AGG_ORACLE,
    doc=(
        "ORC sink → source round-trip: the third columnar format "
        "(after parquet, the native testdata format) — typed, "
        "stats-bearing, predicate-pushdown-capable, and fully "
        "splittable, so the same plan shape holds at 100 TB. The "
        "re-read uses the writer's embedded schema (ORC is "
        "self-describing; no inferSchema scan needed)."
    ),
    tags=("sources", "orc"),
)
def x_orc_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    out = scratch_dir("zs_orc_rt_")
    path = os.path.join(out, "events_orc")
    _projected(spark, sf).write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return _agg(back)


@register(
    "x_partitioned_pruning",
    oracle=(
        "SELECT event_type, count(*) AS n, "
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sv100 "
        "FROM events WHERE event_type IN ('click', 'view') "
        "GROUP BY event_type ORDER BY event_type"
    ),
    doc=(
        "Hive-style partitioned write → partition-pruned read: events "
        "written partitionBy(event_type), re-read with an IN filter "
        "that must prune to 2 of 5 directories BEFORE any I/O (the "
        "plan's PartitionFilters, asserted in test_plan_quality) — "
        "the single most important layout decision at 100 TB, where "
        "a date/tenant partition column turns a full-corpus scan "
        "into a touched-partitions scan. The partition column comes "
        "back as a directory-derived string; values aggregate "
        "exactly as the original-table oracle."
    ),
    tags=("sources", "partitioning", "pushdown"),
)
def x_partitioned_pruning(spark: SparkSession, sf: str) -> DataFrame:
    out = scratch_dir("zs_part_prune_")
    path = os.path.join(out, "events_by_type")
    load_table(spark, sf, "events").select(
        "event_id",
        "event_type",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v100"),
    ).write.mode("overwrite").partitionBy("event_type").parquet(path)
    back = (
        spark.read.parquet(path)
        .filter(F.col("event_type").isin("click", "view"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("v100").alias("sv100"))
        .orderBy("event_type")
    )
    return back


@register(
    "x_text_roundtrip",
    oracle=(
        "SELECT count(*) AS n, "
        "CAST(sum(len(text)) AS BIGINT) AS chars, "
        "CAST(sum(ascii(text)) AS BIGINT) AS first_sum "
        "FROM documents"
    ),
    doc=(
        "Line-oriented text sink → source round-trip: the documents "
        "corpus written as raw text (one doc per line — valid here: "
        "the corpus is newline-free; a real pipeline would escape or "
        "use a framed format) and re-read with spark.read.text. "
        "Count, total characters and a first-codepoint checksum are "
        "recomputed from the re-read copy against the original-table "
        "oracle — losslessness of the line framing, not just row "
        "count."
    ),
    tags=("sources", "text"),
)
def x_text_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    out = scratch_dir("zs_text_rt_")
    path = os.path.join(out, "docs_text")
    load_table(spark, sf, "documents").select("text").write.mode(
        "overwrite"
    ).text(path)
    back = spark.read.text(path)
    return back.agg(
        F.count("*").alias("n"),
        F.sum(F.length("value")).alias("chars"),
        F.sum(F.ascii("value")).cast("bigint").alias("first_sum"),
    )


@register(
    "x_xml_roundtrip",
    oracle=_AGG_ORACLE,
    doc=(
        "XML sink → source round-trip (Spark 4 ships the XML "
        "datasource natively): the projected events slice written "
        "with rowTag framing, re-read with an explicit schema "
        "(never schema inference — a second full parse at 100 TB), "
        "aggregated against the original-table oracle. Completes "
        "the format family: columnar (parquet/ORC), delimited "
        "(CSV), semi-structured (JSON/XML), raw (text)."
    ),
    tags=("sources", "xml"),
)
def x_xml_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    out = scratch_dir("zs_xml_rt_")
    path = os.path.join(out, "events_xml")
    _projected(spark, sf).write.mode("overwrite").format("xml").option(
        "rowTag", "event"
    ).save(path)
    back = (
        spark.read.format("xml")
        .schema(_RT_SCHEMA)
        .option("rowTag", "event")
        .load(path)
    )
    return _agg(back)


@register(
    "x_csv_permissive_corrupt",
    oracle=(
        "SELECT event_type, count(*) AS n, "
        "CAST(sum(CASE WHEN event_id % 97 = 0 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_bad, "
        "CAST(sum(CASE WHEN event_id % 97 <> 0 THEN "
        "CAST(round(value * 100) AS BIGINT) END) AS BIGINT) AS sv100_good, "
        "CAST(sum(CASE WHEN event_id % 97 = 0 THEN "
        "length(CAST(event_id AS VARCHAR)) + length(event_type) + 6 END) "
        "AS BIGINT) AS bad_bytes "
        "FROM events GROUP BY event_type ORDER BY event_type"
    ),
    doc=(
        "PERMISSIVE malformed-record capture — the batch-source "
        "spelling of the poison shunt (R4, messaging/consumer.clj:"
        "28-48: undeserializable payload → dead set AS-IS, pipeline "
        "keeps going). Every 97th event is written with a "
        "non-numeric value field; the CSV reader under "
        "mode=PERMISSIVE parses what it can, nulls the bad field, "
        "and preserves the COMPLETE raw line in the "
        "columnNameOfCorruptRecord column — graded here by "
        "byte-length checksum of those raw lines (the oracle "
        "recomputes each corrupt line's exact length from the "
        "original table), plus good-row sums proving unaffected "
        "rows parse losslessly. Per-partition streaming parse, no "
        "driver involvement; the corrupt column prunes away when "
        "unused, so the happy path pays nothing at 100 TB."
    ),
    tags=("sources", "csv", "poison"),
)
def x_csv_permissive_corrupt(spark: SparkSession, sf: str) -> DataFrame:
    out = scratch_dir("zs_csv_perm_") + "/data"
    e = load_table(spark, sf, "events")
    line = F.concat_ws(
        ",",
        F.col("event_id").cast("string"),
        F.col("event_type"),
        F.when(F.col("event_id") % 97 == 0, F.lit("oops")).otherwise(
            F.expr("CAST(round(value * 100) AS BIGINT)").cast("string")
        ),
    )
    e.select(line.alias("value")).write.text(out)
    parsed = (
        spark.read.schema(
            "event_id LONG, event_type STRING, v100 LONG, _corrupt STRING"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(out)
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.count("_corrupt").alias("n_bad"),
            F.sum("v100").alias("sv100_good"),
            F.sum(F.length("_corrupt")).alias("bad_bytes"),
        )
        .orderBy("event_type")
    )


@register(
    "x_binary_file_source",
    oracle=(
        "SELECT doc_id, octet_length(encode(text)) AS n_bytes, "
        "sha256(text) AS digest "
        "FROM documents WHERE doc_id % 50 = 0 ORDER BY doc_id"
    ),
    doc=(
        "binaryFile source — the multimodal ingestion front door "
        "(SURVEY §7 north star: image/audio/video arrive as opaque "
        "files). A deterministic subset of documents is materialized "
        "as one file per asset; format('binaryFile') reads them back "
        "as (path, length, content BINARY) rows, and the grade "
        "checks per-asset byte length + sha256 against the oracle's "
        "independent recomputation from the source table — proving "
        "content arrives bit-perfect and ids recover from paths. "
        "The driver-side file write is test scaffolding only (real "
        "assets already sit in object storage); the READ path is "
        "the production plan: distributed scan, one task per file "
        "group, content never touches the driver. At 100 TB pair "
        "it with pathGlobFilter/recursiveFileLookup and the "
        "mapInPandas decode plumbing graded in x_multimodal_decode."
    ),
    tags=("sources", "binary", "multimodal"),
)
def x_binary_file_source(spark: SparkSession, sf: str) -> DataFrame:
    d = (
        load_table(spark, sf, "documents")
        .where(F.col("doc_id") % 50 == 0)
        .select("doc_id", "text")
    )
    out = scratch_dir("zs_binsrc_")
    for row in d.collect():  # scaffolding: materialize test assets
        with open(os.path.join(out, f"doc_{row['doc_id']}.bin"), "wb") as fh:
            fh.write(row["text"].encode("utf-8"))
    files = spark.read.format("binaryFile").load(out)
    return (
        files.select(
            F.regexp_extract(
                F.col("path"), r"doc_(\d+)\.bin$", 1
            ).cast("bigint").alias("doc_id"),
            F.col("length").alias("n_bytes"),
            F.sha2("content", 256).alias("digest"),
        )
        .orderBy("doc_id")
    )


@register(
    "x_small_file_compaction",
    oracle=(
        "SELECT count(*) AS n_rows, "
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) "
        "AS sv100, min(event_id) AS min_id, max(event_id) AS max_id, "
        "CAST(64 AS INT) AS files_before, CAST(4 AS INT) AS files_after "
        "FROM events"
    ),
    doc=(
        "Small-file compaction — the table-maintenance op every "
        "streaming sink needs (micro-batches write a file per "
        "partition per trigger; a day of 1-minute triggers = "
        "thousands of KB-files whose open/footer overhead dominates "
        "scans). events lands as 64 tiny files, then compacts via "
        "repartition(4) into 4 right-sized ones; the query VERIFIES "
        "the physical file counts itself (raising on a miss — the "
        "graded literals are asserted, not decorative) and grades "
        "byte-level data integrity (count/sum/min/max) from the "
        "compacted copy against the original table. At 100 TB this "
        "is the same repartition-write running per partition-folder "
        "with target_size = maxPartitionBytes; Delta/Iceberg "
        "OPTIMIZE is this op behind a txn log."
    ),
    tags=("sources", "layout", "compaction"),
)
def x_small_file_compaction(spark: SparkSession, sf: str) -> DataFrame:
    base = scratch_dir("zs_compact_")
    tiny, packed = base + "/tiny", base + "/packed"
    e = load_table(spark, sf, "events").select(
        "event_id",
        "ts",
        "event_type",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v100"),
    )
    e.repartition(64).write.parquet(tiny)

    def _count(d: str) -> int:
        return sum(
            1 for f in os.listdir(d) if f.endswith(".parquet")
        )

    files_before = _count(tiny)
    if files_before != 64:
        raise AssertionError(f"expected 64 tiny files, got {files_before}")
    spark.read.parquet(tiny).repartition(4).write.parquet(packed)
    files_after = _count(packed)
    if files_after != 4:
        raise AssertionError(f"expected 4 compacted files, got {files_after}")
    # the returned plan reads only the compacted copy lazily; the 64
    # tiny files served their purpose — drop them now
    import shutil

    shutil.rmtree(tiny)
    return spark.read.parquet(packed).agg(
        F.count("*").alias("n_rows"),
        F.sum("v100").alias("sv100"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
        F.lit(files_before).alias("files_before"),
        F.lit(files_after).alias("files_after"),
    )


@register(
    "x_parquet_merge_schema",
    oracle=(
        "SELECT count(*) AS n_rows, "
        "CAST(sum(CASE WHEN event_id % 2 = 0 THEN "
        "CAST(round(value * 100) AS BIGINT) END) AS BIGINT) AS sv100, "
        "CAST(sum(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_typed, "
        "CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_valued "
        "FROM events"
    ),
    doc=(
        "Parquet schema evolution on read (mergeSchema): two file "
        "batches with DIFFERENT column sets — an old producer wrote "
        "(event_id, v100), an upgraded one writes (event_id, "
        "event_type) — land in one dataset; the merged read "
        "reconciles the union schema and null-fills each side's "
        "missing column. Graded: total rows plus per-side presence "
        "counts and the value sum, which only balance if no row "
        "lost a column it had or gained a phantom value. The "
        "file-level twin of x_union_by_name's relational union — "
        "how a year of drifting producers reads as ONE table at "
        "100 TB (with the footer-merge cost paid once at listing)."
    ),
    tags=("sources", "parquet", "schema-evolution"),
)
def x_parquet_merge_schema(spark: SparkSession, sf: str) -> DataFrame:
    out = scratch_dir("zs_mergeschema_") + "/data"
    e = load_table(spark, sf, "events")
    old = e.where(F.col("event_id") % 2 == 0).select(
        "event_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v100"),
    )
    new = e.where(F.col("event_id") % 2 == 1).select(
        "event_id", "event_type"
    )
    old.write.parquet(out)
    new.write.mode("append").parquet(out)
    back = spark.read.option("mergeSchema", "true").parquet(out)
    return back.agg(
        F.count("*").alias("n_rows"),
        F.sum("v100").alias("sv100"),
        F.count("event_type").alias("n_typed"),
        F.count("v100").alias("n_valued"),
    )


@register(
    "x_json_permissive_corrupt",
    oracle=(
        "SELECT event_type, count(*) AS n, "
        "CAST(sum(CASE WHEN event_id % 89 = 0 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_bad, "
        "CAST(sum(CASE WHEN event_id % 89 <> 0 THEN "
        "CAST(round(value * 100) AS BIGINT) END) AS BIGINT) AS sv100_good "
        "FROM events GROUP BY event_type ORDER BY event_type"
    ),
    doc=(
        "JSON-lines PERMISSIVE malformed-record capture — the T6 "
        "middleware's file-source twin of x_csv_permissive_corrupt: "
        "every 89th record is written with truncated JSON (an "
        "unclosed object); the reader under mode=PERMISSIVE parses "
        "the good lines, nulls the bad one's typed fields and "
        "preserves the raw line in columnNameOfCorruptRecord. "
        "Graded per type: row conservation, corrupt counts and the "
        "good-row value sum. Note the JSON reader (unlike CSV) "
        "nulls ALL typed columns of a corrupt line, so the type "
        "key is carried via the file layout (partitioned write) "
        "instead — which also demonstrates corrupt-capture and "
        "partition columns composing."
    ),
    tags=("sources", "json", "poison"),
)
def x_json_permissive_corrupt(spark: SparkSession, sf: str) -> DataFrame:
    out = scratch_dir("zs_json_perm_") + "/data"
    e = load_table(spark, sf, "events")
    line = F.when(
        F.col("event_id") % 89 == 0,
        F.concat(F.lit('{"event_id": '), F.col("event_id").cast("string")),
    ).otherwise(
        F.to_json(
            F.struct(
                F.col("event_id"),
                F.expr("CAST(round(value * 100) AS BIGINT)").alias("v100"),
            )
        )
    )
    e.select("event_type", line.alias("value")).write.partitionBy(
        "event_type"
    ).text(out)
    parsed = (
        spark.read.schema(
            "event_id LONG, v100 LONG, _corrupt STRING, event_type STRING"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(out)
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.count("_corrupt").alias("n_bad"),
            F.sum("v100").alias("sv100_good"),
        )
        .orderBy("event_type")
    )


@register(
    "x_csv_quoted_multiline",
    oracle=(
        "SELECT count(*) AS n_rows, "
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sv100, "
        "CAST(sum(length(event_type) + 7) AS BIGINT) AS payload_chars "
        "FROM events"
    ),
    doc=(
        "CSV quoting round-trip with embedded delimiters AND "
        "newlines: each row carries a payload field containing a "
        "comma and a line break ('<type>, no.\\n<nl>'), written with "
        "standard quoting and read back with multiLine=true — the "
        "parser capability that separates a real CSV reader from "
        "split(','). Graded: row conservation, value sum, and the "
        "exact payload character count (delimiter + newline "
        "included). multiLine caveat documented: quoted-newline "
        "files are not line-splittable, so at 100 TB this mode "
        "costs per-FILE parallelism — keep newline payloads in "
        "parquet/JSON instead; this grades that the engine handles "
        "them correctly when inherited."
    ),
    tags=("sources", "csv", "quoting"),
)
def x_csv_quoted_multiline(spark: SparkSession, sf: str) -> DataFrame:
    out = scratch_dir("zs_csv_quote_") + "/data"
    e = load_table(spark, sf, "events")
    # newline kept interior: the CSV writer's default
    # ignoreTrailingWhiteSpace would trim a trailing one
    payload = F.concat(
        F.col("event_type"), F.lit(", no.\n!")
    )
    e.select(
        "event_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v100"),
        payload.alias("payload"),
    ).write.option("header", "true").csv(out)
    back = (
        spark.read.schema("event_id LONG, v100 LONG, payload STRING")
        .option("header", "true")
        .option("multiLine", "true")
        .csv(out)
    )
    return back.agg(
        F.count("*").alias("n_rows"),
        F.sum("v100").alias("sv100"),
        F.sum(F.length("payload")).cast("bigint").alias("payload_chars"),
    )
