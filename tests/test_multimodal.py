"""Multimodal plumbing — the Spark-side contract (schema, Arrow
batching, fan-out, null/poison behavior) is real; codecs are
deterministic fakes (see operators/multimodal.py docstring)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from ziggurat_spark.operators.multimodal import (
    ASSET_SCHEMA,
    decode_and_featurize,
    documents_as_assets,
    resize_images,
    sample_frames,
)
from ziggurat_spark.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def assets(spark):
    docs = load_table(spark, SF, "documents").limit(50)
    return documents_as_assets(docs)


def test_asset_adapter_schema(assets):
    # simpleString compares names+types, not nullability flags
    assert assets.schema.simpleString() == ASSET_SCHEMA.simpleString()
    row = assets.first()
    assert isinstance(row.content, (bytes, bytearray))
    assert row.meta.width == 64


def test_decode_features_shape_and_determinism(assets):
    out = decode_and_featurize(assets, feature_dim=8)
    rows = out.orderBy("asset_id").collect()
    assert len(rows) == assets.count() > 0  # all() below is vacuous on []
    assert all(r.decoded_ok for r in rows)
    assert all(len(r.feature) == 8 for r in rows)
    assert all(0.0 <= v < 1.0 for r in rows for v in r.feature)
    # deterministic across runs
    again = decode_and_featurize(assets, feature_dim=8).orderBy("asset_id").collect()
    assert [r.feature for r in rows] == [r.feature for r in again]


def test_decode_null_content_is_poison(spark):
    df = spark.createDataFrame(
        [Row(asset_id=1, modality="image", content=None, meta=None)],
        ASSET_SCHEMA,
    )
    r = decode_and_featurize(df).first()
    assert r.decoded_ok is False and r.feature is None


def test_real_codec_seam_raises(assets):
    with pytest.raises(NotImplementedError, match="real media decoding"):
        decode_and_featurize(assets, require_real_codec=True)


def test_resize_updates_meta_keeps_schema(assets):
    out = resize_images(assets, 8, 8)
    assert out.schema == ASSET_SCHEMA
    r = out.first()
    assert (r.meta.width, r.meta.height) == (8, 8)
    assert len(r.content) == 32  # fake codec emits a sha256 digest


def test_frame_sampling_fanout(assets):
    frames = sample_frames(assets, every_ms=100, max_frames=4)
    counts = (
        frames.groupBy("asset_id").agg(F.count("*").alias("n")).collect()
    )
    # every doc here is longer than 300 chars → duration caps at 4 frames
    assert all(c.n == 4 for c in counts)
    one = frames.filter(
        (F.col("asset_id") == counts[0].asset_id)
    ).orderBy("frame_idx").collect()
    assert [f.frame_idx for f in one] == [0, 1, 2, 3]
    assert [f.frame_ts_ms for f in one] == [0, 100, 200, 300]
    # distinct frames from the same content (codec mixes the index)
    assert len({bytes(f.frame) for f in one}) == 4


def test_chunk_waveform_geometry(spark):
    """Framing math: window/hop/cap/trailing-partial, byte-exact."""
    from ziggurat_spark.operators.multimodal import chunk_waveform

    rows = [(1, bytes(range(10))), (2, b"abc"), (3, None), (4, b"")]
    df = spark.createDataFrame(rows, "asset_id LONG, content BINARY")
    out = chunk_waveform(df, win_bytes=4, hop_bytes=3, max_chunks=3).collect()
    by_asset = {}
    for r in out:
        by_asset.setdefault(r["asset_id"], []).append(r)
    # asset 1: len 10, hop 3 → starts 0,3,6 (cap 3 of 4 natural)
    a1 = sorted(by_asset[1], key=lambda r: r["chunk_idx"])
    assert [(r["start_byte"], r["n_bytes"]) for r in a1] == [(0, 4), (3, 4), (6, 4)]
    assert bytes(a1[1]["chunk"]) == bytes([3, 4, 5, 6])
    # asset 2: one short chunk, trailing partial kept
    a2 = by_asset[2]
    assert len(a2) == 1 and a2[0]["n_bytes"] == 3
    # null / empty content → no rows
    assert 3 not in by_asset and 4 not in by_asset
