"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed by Arrow-batched Pandas functions.

The reference has no media handling (it moves opaque Kafka ``byte[]``
payloads — streams.clj:31-32 keeps byte-array serdes end-to-end);
this module is the north-star extension that gives the engine the
decode / feature-extract / resize / frame-sample stages a training-
data pipeline needs, with the *Spark-side* contract fully real:

- the asset schema (binary content + typed meta struct),
- ``mapInPandas`` over Arrow batches (never per-row Python),
- fan-out semantics for frame sampling (one input row → N rows),
- parallelism decoupled from input file layout via repartition.

The codec step itself is pluggable. This container ships no PIL /
ffmpeg / torchcodec, so the default codec is a clearly-marked
DETERMINISTIC FAKE (stable bytes→value hashing, not real pixels) and
``require_real_codec=True`` raises NotImplementedError at the exact
seam where a real decoder plugs in. Swapping in a real library
changes only `_decode_fake` — no plan, schema, or batching changes.

Scale: every stage is mapInPandas — embarrassingly parallel, zero
shuffle (repartition only when the caller asks for more parallelism
than input splits). Content bytes stream through Arrow; the 100 TB
shape is bounded by `spark.sql.execution.arrow.maxRecordsPerBatch`
and executor memory per batch, both respected here by processing
batch-by-batch instead of collecting the iterator.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical multimodal asset envelope. `content` is opaque bytes;
#: `meta` carries the typed, modality-specific header fields.
ASSET_META = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", ASSET_META),
    ]
)

DECODED_SCHEMA = T.StructType(
    list(ASSET_SCHEMA.fields)
    + [
        T.StructField("decoded_ok", T.BooleanType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def _no_real_codec(*_a: Any, **_k: Any) -> None:
    raise NotImplementedError(
        "real media decoding needs PIL/ffmpeg/torchcodec, which this "
        "environment does not ship; pass codec=<your decoder> or use "
        "the deterministic fake (require_real_codec=False)"
    )


def _decode_fake(content: bytes, dim: int) -> list[float]:
    """DETERMINISTIC FAKE decode+featurize: sha256-expand the bytes
    into `dim` floats in [0, 1). Stable across runs/partitions — the
    plumbing contract (shape, dtype, null behavior) is what's real."""
    out: list[float] = []
    counter = 0
    while len(out) < dim:
        h = hashlib.sha256(content + counter.to_bytes(4, "big")).digest()
        out.extend(b / 256.0 for b in h)
        counter += 1
    return out[:dim]


def decode_and_featurize(
    df: DataFrame,
    feature_dim: int = 16,
    codec: Callable[[bytes, int], list[float]] | None = None,
    require_real_codec: bool = False,
    parallelism: int | None = None,
) -> DataFrame:
    """Decode + feature-extract over Arrow batches (mapInPandas).

    NULL/empty content → decoded_ok=false, feature=NULL (the poison
    contract, same shape as middleware.poison_split inputs).
    """
    if require_real_codec and codec is None:
        _no_real_codec()
    impl = codec or _decode_fake
    if parallelism:
        df = df.repartition(parallelism)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ok = pdf["content"].map(lambda c: c is not None and len(c) > 0)
            pdf = pdf.assign(
                decoded_ok=ok,
                feature=[
                    impl(bytes(c), feature_dim) if o else None
                    for c, o in zip(pdf["content"], ok)
                ],
            )
            yield pdf

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    codec: Callable[[bytes, int, int], bytes] | None = None,
    require_real_codec: bool = False,
) -> DataFrame:
    """Resize stage: content → transformed content + updated meta.

    The fake keeps a deterministic function of (bytes, w, h) so
    downstream stages see realistic-shaped, stable data.
    """
    if require_real_codec and codec is None:
        _no_real_codec()
    impl = codec or (
        lambda c, w, h: hashlib.sha256(c + f"{w}x{h}".encode()).digest()
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [
                None
                if m is None
                else {**m, "width": width, "height": height}
                for m in pdf["meta"]
            ]
            content = [
                None if c is None else impl(bytes(c), width, height)
                for c in pdf["content"]
            ]
            yield pdf.assign(content=content, meta=meta)

    return df.mapInPandas(run, schema=ASSET_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_ms: int,
    max_frames: int = 32,
    codec: Callable[[bytes, int], bytes] | None = None,
    require_real_codec: bool = False,
) -> DataFrame:
    """Frame sampling: one video row → N frame rows (fan-out inside
    mapInPandas; the output row count is data-dependent, which is the
    part Spark needs a mapInPandas — not a scalar UDF — for).

    Frames are taken at t = 0, every_ms, 2*every_ms, ... capped at
    max_frames, bounded by meta.duration_ms.
    """
    if require_real_codec and codec is None:
        _no_real_codec()
    impl = codec or (
        lambda c, i: hashlib.sha256(c + i.to_bytes(4, "big")).digest()
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "asset_id": [],
                "frame_idx": [],
                "frame_ts_ms": [],
                "frame": [],
            }
            # zip over columns, not iterrows: no per-row Series boxing
            for asset_id, content, meta in zip(
                pdf["asset_id"], pdf["content"], pdf["meta"]
            ):
                if content is None or meta is None:
                    continue
                duration = meta["duration_ms"] or 0
                n = min(max_frames, int(duration // every_ms) + 1)
                for i in range(n):
                    out["asset_id"].append(asset_id)
                    out["frame_idx"].append(i)
                    out["frame_ts_ms"].append(i * every_ms)
                    out["frame"].append(impl(bytes(content), i))
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


def documents_as_assets(documents: DataFrame, modality: str = "image") -> DataFrame:
    """Adapter for tests/benchmarks: stand the `documents` table's
    UTF-8 bytes in for media payloads, with plausible meta."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.lit(modality).alias("modality"),
        F.encode("text", "UTF-8").alias("content"),
        F.struct(
            F.lit("fake").alias("format"),
            F.lit(64).cast("int").alias("width"),
            F.lit(48).cast("int").alias("height"),
            F.lit(16_000).cast("int").alias("sample_rate"),
            (F.length("text").cast("long") * 10).alias("duration_ms"),
        ).alias("meta"),
    )


CHUNK_SCHEMA = (
    "asset_id LONG, chunk_idx INT, start_byte LONG, n_bytes INT, "
    "chunk BINARY"
)


def chunk_waveform(
    df: DataFrame,
    win_bytes: int,
    hop_bytes: int,
    max_chunks: int = 64,
) -> DataFrame:
    """Audio chunking: raw waveform bytes → overlapping windows of
    ``win_bytes`` every ``hop_bytes`` (the speech-pipeline framing
    step: PCM → model-sized segments with overlap). Unlike decode,
    framing is pure byte arithmetic — this path is REAL in this
    environment, no codec seam. One video/audio row fans out to N
    chunk rows (data-dependent row count → mapInPandas, not a scalar
    UDF). The trailing partial window is kept (ASR pipelines pad it
    model-side); rows cap at ``max_chunks``.

    Scale: chunks leave this operator ~win/hop× the input bytes —
    size ``spark.sql.files.maxPartitionBytes`` for the INPUT so the
    fan-out stays within executor memory, and let downstream
    repartition by chunk count if feature extraction follows.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "asset_id": [],
                "chunk_idx": [],
                "start_byte": [],
                "n_bytes": [],
                "chunk": [],
            }
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                if content is None:
                    continue
                b = bytes(content)
                if not b:
                    continue
                n = min(max_chunks, (len(b) - 1) // hop_bytes + 1)
                for i in range(n):
                    s = i * hop_bytes
                    ch = b[s : s + win_bytes]
                    out["asset_id"].append(asset_id)
                    out["chunk_idx"].append(i)
                    out["start_byte"].append(s)
                    out["n_bytes"].append(len(ch))
                    out["chunk"].append(ch)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=CHUNK_SCHEMA)
