"""AVIF/HEIC via the libheif ctypes binding (multimodal/heif.py, r9):
real AV1 + HEVC still-image round trips, brand-sniff dispatch, the
exact-solid-fixture contract the avif_image_stats oracle rides on, and
the honest-unavailability boundary."""

from __future__ import annotations

import pytest

from etl_online_retail_spark.catalog import load_table
from etl_online_retail_spark.multimodal import heif
from etl_online_retail_spark.multimodal.binary import decode_image

SF = "/root/testdata/sf0.001"

needs_avif = pytest.mark.skipif(not heif.avif_available(),
                                reason="libheif/AV1 not in environment")
needs_heic = pytest.mark.skipif(not heif.heic_available(),
                                reason="libheif/HEVC not in environment")


@needs_avif
def test_avif_solid_roundtrip_is_bit_exact():
    """The avif_image_stats oracle's load-bearing claim: solid frames
    survive quality-100 AV1 EXACTLY (constant Y, neutral chroma)."""
    for i in (0, 1, 7, 64, 127, 128, 200, 255, 300, 511):
        w, h, v = 1 + i % 16, 1 + i % 8, i % 256
        payload = heif.avif_encode_rgb(bytes([v]) * (w * h * 3), w, h,
                                       quality=100)
        assert payload[8:12] == b"avif"
        img = heif.decode_heif(payload)
        assert (img.width, img.height, img.channels) == (w, h, 3)
        assert set(img.pixels) == {v}


@needs_heic
def test_heic_solid_roundtrip_is_bit_exact():
    for i in (0, 33, 128, 255, 400):
        w, h, v = 1 + i % 16, 1 + i % 8, i % 256
        payload = heif.heic_encode_rgb(bytes([v]) * (w * h * 3), w, h,
                                       quality=100)
        assert payload[8:12] == b"heic"
        img = heif.decode_heif(payload)
        assert (img.width, img.height, img.channels) == (w, h, 3)
        assert set(img.pixels) == {v}


@needs_avif
def test_avif_gradient_roundtrip_is_lossy_but_bounded():
    """Non-solid content proves this is a REAL transform codec: the
    round trip is not bit-exact (it genuinely quantizes) but stays
    perceptually tight at quality 90."""
    import numpy as np

    w, h = 48, 32
    x = np.linspace(0, 255, w)
    y = np.linspace(255, 0, h)
    arr = np.stack([np.tile(x, (h, 1)),
                    np.tile(y[:, None], (1, w)),
                    np.full((h, w), 128.0)], axis=-1).astype(np.uint8)
    payload = heif.avif_encode_rgb(arr.tobytes(), w, h, quality=90)
    img = heif.decode_heif(payload)
    assert (img.width, img.height, img.channels) == (w, h, 3)
    out = np.frombuffer(img.pixels, dtype=np.uint8).reshape(h, w, 3)
    err = np.abs(out.astype(int) - arr.astype(int))
    assert err.mean() < 6.0 and err.max() < 32


@needs_avif
def test_avif_alpha_decodes_with_four_channels():
    w, h = 8, 6
    rgba = bytes([120, 50, 200, 90]) * (w * h)
    payload = heif.avif_encode_rgba(rgba, w, h, quality=100)
    img = heif.decode_heif(payload)
    assert (img.width, img.height, img.channels) == (w, h, 4)
    assert set(img.pixels[3::4]) <= {89, 90, 91}   # alpha plane intact
    assert set(img.pixels[0::4]) <= {119, 120, 121}


def test_is_heif_sniffs_brands_not_video_mp4():
    # handcrafted minimal ftyp boxes: brand decides the route
    avif_hdr = b"\x00\x00\x00\x18ftypavif\x00\x00\x00\x00avifmif1"
    isom_hdr = b"\x00\x00\x00\x18ftypisom\x00\x00\x00\x00isomavc1"
    assert heif.is_heif(avif_hdr)
    assert heif.is_heif(b"\x00\x00\x00\x18ftypheic" + b"\x00" * 8)
    assert not heif.is_heif(isom_hdr)       # video mp4 -> demux path
    assert not heif.is_heif(b"\x00\x00")    # too short
    assert not heif.is_heif(b"RIFF\x00\x00\x00\x00WEBP")


@needs_avif
def test_avif_decodes_through_image_dispatch():
    v = 211
    payload = heif.avif_encode_rgb(bytes([v]) * (10 * 6 * 3), 10, 6,
                                   quality=100)
    f = decode_image(payload)
    assert f == {"width": 10, "height": 6, "channels": 3,
                 "bit_depth": 8, "mean_pixel": float(v)}


@needs_heic
def test_heic_decodes_through_image_dispatch():
    v = 42
    payload = heif.heic_encode_rgb(bytes([v]) * (5 * 4 * 3), 5, 4,
                                   quality=100)
    f = decode_image(payload)
    assert f["width"] == 5 and f["mean_pixel"] == float(v)


def test_unavailable_library_raises_honestly(monkeypatch):
    monkeypatch.setattr(heif, "_LIB", None)
    monkeypatch.setattr(heif, "_LOAD_ERR", "forced by test")
    assert not heif.heif_available()
    assert not heif.avif_available()
    with pytest.raises(NotImplementedError, match="libheif"):
        heif.decode_heif(b"\x00\x00\x00\x18ftypavif" + b"\x00" * 8)
    with pytest.raises(NotImplementedError, match="libheif"):
        heif.avif_encode_rgb(b"\x00" * 3, 1, 1)


@needs_avif
def test_corrupt_payload_raises_valueerror():
    """Garbage after a valid ftyp raises ValueError SPECIFICALLY — never
    garbage pixels, and never NotImplementedError: libheif reports
    structural garbage as code 3 (Unsupported_filetype) depending on
    where parsing dies, but a brand whose codec IS linked cannot be
    "unsupported", so the r10 classification maps it to the corrupt-input
    class. Quarantine flows that skip capability gaps must not skip
    corrupt data."""
    with pytest.raises(ValueError, match="libheif"):
        heif.decode_heif(b"\x00\x00\x00\x18ftypavif" + b"\x00" * 64)
    with pytest.raises(ValueError, match="libheif"):
        heif.decode_heif(b"\x00\x00\x00\x18ftypavif")  # truncated box


def test_foreign_filetype_is_a_capability_gap():
    """A code-3 parse failure on a structural brand naming NO codec
    (mif1) stays NotImplementedError under the classification: we cannot
    prove it corrupt rather than carrying a format this build lacks. A
    payload that is not HEIF at all never reaches code 3 — libheif
    reports it as Invalid_input (code 2), which is plain ValueError (the
    dispatch layer never routes such bytes here anyway)."""
    if not heif.heif_available():
        pytest.skip("libheif not in environment")
    with pytest.raises(NotImplementedError, match="libheif"):
        heif.decode_heif(b"\x00\x00\x00\x18ftypmif1" + b"\x00" * 64)
    with pytest.raises(ValueError, match="libheif"):
        heif.decode_heif(b"GIF89a" + b"\x00" * 32)   # foreign filetype


@needs_avif
def test_avif_oracle_probe_measures_roundtrip():
    """The registration gate is a MEASURED round trip, not plugin
    presence: exact in this container; False when the library is gone
    (and, by construction, when a different encoder build breaks the
    solid-frame exactness)."""
    heif._ROUNDTRIP_EXACT.clear()
    try:
        assert heif.avif_oracle_exact()
        assert heif._ROUNDTRIP_EXACT[heif.COMPRESSION_AV1]  # cached
    finally:
        heif._ROUNDTRIP_EXACT.clear()


def test_avif_oracle_probe_false_without_library(monkeypatch):
    monkeypatch.setattr(heif, "_LIB", None)
    monkeypatch.setattr(heif, "_LOAD_ERR", "forced by test")
    monkeypatch.setattr(heif, "_ROUNDTRIP_EXACT", {})
    assert not heif.avif_oracle_exact()


@needs_avif
def test_encode_validates_buffer_length():
    with pytest.raises(ValueError, match="width\\*height"):
        heif.avif_encode_rgb(b"\x00" * 5, 2, 2)
    with pytest.raises(ValueError, match="channels"):
        heif._encode(heif.COMPRESSION_AV1, b"\x00" * 8, 2, 2, 100,
                     channels=2)


@needs_avif
def test_multi_image_heif_burst_roundtrip():
    """HEIC-burst shape: several top-level images in ONE file; decode_all
    walks them in container order, decode_heif still picks the primary
    (the first encoded image)."""
    frames = [(bytes([v]) * (6 * 4 * 3), 6, 4) for v in (10, 150, 240)]
    payload = heif.avif_encode_burst(frames, quality=100)
    imgs = heif.decode_heif_all(payload)
    assert [set(i.pixels) for i in imgs] == [{10}, {150}, {240}]
    assert all((i.width, i.height, i.channels) == (6, 4, 3) for i in imgs)
    primary = heif.decode_heif(payload)
    assert set(primary.pixels) == {10}
    # single-image payloads: decode_all == [decode]
    single = heif.avif_encode_rgb(bytes([77]) * (3 * 3 * 3), 3, 3)
    only, = heif.decode_heif_all(single)
    assert only == heif.decode_heif(single)


@needs_avif
def test_avif_resizes_to_png():
    from etl_online_retail_spark.multimodal import png
    from etl_online_retail_spark.multimodal.binary import resize_image

    v = 77
    payload = heif.avif_encode_rgb(bytes([v]) * (12 * 8 * 3), 12, 8,
                                   quality=100)
    out = png.decode_png(resize_image(payload, 4, 4))
    assert (out.width, out.height) == (4, 4)
    assert set(out.pixels) == {v}


@needs_avif
def test_avif_spark_stage_matches_closed_form(spark):
    from etl_online_retail_spark.multimodal.binary import (
        image_features,
        synthetic_avif_media,
    )

    docs = load_table(spark, "documents", SF).limit(16)
    rows = image_features(synthetic_avif_media(docs)).collect()
    assert len(rows) == 16
    for r in rows:
        assert r.width == 1 + r.media_id % 16
        assert r.height == 1 + r.media_id % 8
        assert r.channels == 3 and r.bit_depth == 8
        assert r.mean_pixel == float(r.media_id % 256)
