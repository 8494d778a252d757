"""Multimodal binary plumbing: Arrow batch path is real, codecs are
clearly-stubbed (SURVEY extension spec: plumbing real, decode stubbed)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_online_retail_spark.catalog import load_table
from etl_online_retail_spark.multimodal.binary import (
    FEATURE_SCHEMA,
    IMAGE_FEATURE_SCHEMA,
    binary_features,
    decode_image,
    frame_sample_stub,
    image_features,
    synthetic_png_media,
    to_media_table,
)

SF = "/root/testdata/sf0.001"


def test_media_table_schema_and_meta(spark):
    docs = load_table(spark, "documents", SF)
    media = to_media_table(docs)
    assert dict(media.dtypes)["content"] == "binary"
    row = media.filter(F.col("media_id") == media.select(
        F.min("media_id")).collect()[0][0]).collect()[0]
    assert row.meta.size_bytes == len(row.content)


def test_binary_features_via_arrow(spark):
    docs = load_table(spark, "documents", SF).limit(20)
    feats = binary_features(to_media_table(docs))
    assert feats.schema == FEATURE_SCHEMA
    rows = feats.collect()
    assert len(rows) == 20
    for r in rows:
        assert r.byte_len > 0
        assert len(r.header_hex) <= 16
        int(r.header_hex, 16)  # valid hex


def test_codec_stubs_raise_clearly():
    # non-PNG formats still need a library this container lacks
    with pytest.raises(NotImplementedError, match="imaging library"):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 16)  # JPEG SOI
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        frame_sample_stub(b"\x00\x00\x00 ftypmp4")


def test_image_features_real_png_decode(spark):
    docs = load_table(spark, "documents", SF).limit(25)
    media = synthetic_png_media(docs)
    feats = image_features(media)
    assert feats.schema == IMAGE_FEATURE_SCHEMA
    for r in feats.collect():
        assert r.width == 1 + r.media_id % 16
        assert r.height == 1 + r.media_id % 8
        assert r.channels == 3 and r.bit_depth == 8
        assert r.mean_pixel == float(r.media_id % 256)
