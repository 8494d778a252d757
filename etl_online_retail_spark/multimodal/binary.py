"""Opaque-binary media columns + Arrow-batched feature extraction.

Pattern: media rows are (id, content: binary, meta: struct<mime,size>);
decode / feature-extract / resize / frame-sample run as mapInPandas over
Arrow batches - the only layer that should ever hold raw bytes in Python.
Batch sizing: binary payloads dominate memory, so real deployments set
spark.sql.execution.arrow.maxRecordsPerBatch to keep
(records x avg_payload) within executor memory; the plumbing here is
payload-size-agnostic.

PNG decodes FOR REAL via the stdlib codec in multimodal/png.py (zlib
inflate + scanline unfilter), JPEG — baseline AND progressive — via
multimodal/jpeg.py (Huffman + IDCT + Annex G scans), GIF via multimodal/gif.py (LZW) and lossless WebP
via multimodal/webp.py (VP8L prefix coding); remaining codecs (lossy
WebP, mp3/aac audio, mp4/webm video) still need libraries this
container does not ship and stay stubbed behind the same signatures. binary_features additionally extracts deterministic
byte-level features (length, header hex) so the full Spark path - binary
column -> Arrow batch -> pandas -> result schema - is oracle-checkable
even where no real codec exists.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("content", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType()),
        T.StructField("size_bytes", T.LongType()),
    ])),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("byte_len", T.IntegerType()),
    T.StructField("header_hex", T.StringType()),
])


def _id_partitions(docs: DataFrame, id_col: str) -> DataFrame:
    """The id relation every synthetic-media generator renders from,
    spread across the session's default parallelism: the render loops
    are real per-payload Python codecs inside mapInPandas, so an
    unpartitioned source would serialize the whole corpus through one
    task (measured 10x on the block-looped codecs at sf0.1). Same rule
    a production decode pool applies to its work queue."""
    n = max(1, docs.sparkSession.sparkContext.defaultParallelism)
    return (docs.select(F.col(id_col).cast("long").alias("media_id"))
            .repartition(n))


def to_media_table(docs: DataFrame, id_col: str = "doc_id",
                   payload_col: str = "text",
                   mime: str = "application/octet-stream") -> DataFrame:
    """Build a media table from any source column by treating its UTF-8
    bytes as the opaque payload (stand-in for real image/audio ingestion,
    which would arrive as binary already)."""
    content = F.encode(F.col(payload_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("media_id"),
        content.alias("content"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(content).cast("long").alias("size_bytes"),
        ).alias("meta"),
    )


def binary_features(media: DataFrame, header_bytes: int = 8) -> DataFrame:
    """Arrow-batched byte-level feature extraction via mapInPandas.

    This is the exact plumbing a real decoder uses (same batch shape, same
    schema contract); only the per-payload function differs. Deterministic,
    so a SQL oracle can verify the full path.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["content"]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "byte_len": payloads.map(len).astype("int32"),
                "header_hex": payloads.map(
                    lambda b: bytes(b)[:header_bytes].hex().upper()),
            })

    return media.select("media_id", "content").mapInPandas(extract, FEATURE_SCHEMA)


IMAGE_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("bit_depth", T.IntegerType()),
    T.StructField("mean_pixel", T.DoubleType()),
])


def decode_image(content: bytes) -> dict:
    """Decode one image payload to dimension/channel/intensity features.

    PNG and JPEG (baseline SOF0 AND progressive SOF2, incl. successive
    approximation) decode for real via the stdlib codecs
    (multimodal/png.py — zlib inflate + scanline unfilter;
    multimodal/jpeg.py — Huffman + IDCT + the T.81 Annex G progressive
    scan machinery); other formats still need an imaging library this
    container does not ship and raise NotImplementedError with the same
    signature a PIL-backed body would keep. Routing is by magic bytes,
    the same dispatch a production decoder pool uses.
    """
    from etl_online_retail_spark.multimodal import bmp as _bmp
    from etl_online_retail_spark.multimodal import gif as _gif
    from etl_online_retail_spark.multimodal import heif as _heif
    from etl_online_retail_spark.multimodal import jpeg as _jpeg
    from etl_online_retail_spark.multimodal import png as _png
    from etl_online_retail_spark.multimodal import tiff as _tiff
    from etl_online_retail_spark.multimodal import webp as _webp

    content = bytes(content)
    if content[:8] == _png.PNG_SIGNATURE:
        img = _png.decode_png(content)
    elif content[:2] == _jpeg.JPEG_SOI:
        img = _jpeg.decode_jpeg(content)
    elif content[:6] in _gif.GIF_MAGICS:
        img = _gif.decode_gif(content).frames[0]  # still view: first frame
    elif content[:4] in (b"II*\x00", b"MM\x00*"):
        # TIFF 6.0 (r11, multimodal/tiff.py): either byte order;
        # uncompressed, TIFF-LZW or PackBits strips, optional
        # horizontal-differencing predictor
        img = _tiff.decode_tiff(content)
    elif content[:2] == b"BM":
        img = _bmp.decode_bmp(content)
    elif (content[:4] == _webp.RIFF_MAGIC
          and content[8:12] == _webp.WEBP_MAGIC):
        # VP8L pure-Python; lossy VP8 / VP8X via the libwebp binding
        # (multimodal/native.py, r7) when the library is present
        img = _webp.decode_webp(content)
    elif _heif.is_heif(content):
        # AVIF (AV1) / HEIC (HEVC) stills via the libheif binding (r9,
        # multimodal/heif.py); ftyp brand sniff keeps video mp4 (isom)
        # on the container-demux path
        img = _heif.decode_heif(content)
    else:
        raise NotImplementedError(
            "only PNG, JPEG (baseline + progressive), GIF, TIFF "
            "(none/LZW/PackBits), BMP (24-bit BI_RGB), lossless "
            "WebP (plus lossy WebP via libwebp and AVIF/HEIC via "
            "libheif when those libraries are present) decode in "
            "this environment; other formats require "
            "libraries not present in this container"
        )
    return {
        "width": img.width,
        "height": img.height,
        "channels": img.channels,
        "bit_depth": img.bit_depth,
        "mean_pixel": img.mean_pixel(),
    }


def image_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL image decode via mapInPandas.

    Same batch shape and schema contract as binary_features, but the
    per-payload function actually decodes (PNG today). Rows whose payload
    is not a decodable format surface as an error — callers filter by
    mime/signature first, mirroring how a production pipeline routes
    payloads to per-format decoder pools.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image(b) for b in pdf["content"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": pd.Series([f["width"] for f in feats], dtype="int32"),
                "height": pd.Series([f["height"] for f in feats], dtype="int32"),
                "channels": pd.Series([f["channels"] for f in feats], dtype="int32"),
                "bit_depth": pd.Series([f["bit_depth"] for f in feats], dtype="int32"),
                "mean_pixel": pd.Series([f["mean_pixel"] for f in feats], dtype="float64"),
            })

    return media.select("media_id", "content").mapInPandas(
        extract, IMAGE_FEATURE_SCHEMA)


def _solid_media(docs: DataFrame, id_col: str, max_w: int, max_h: int,
                 encode, value=lambda i: i % 256) -> DataFrame:
    """THE closed-form fixture contract every synthetic-media oracle
    depends on, in one place: width = 1 + id % max_w, height =
    1 + id % max_h, every RGB sample = value(id) (default id % 256;
    the JPEG family passes 2 * (id % 128) for its even-intensity
    bit-exactness argument). `encode(pixels, w, h) -> bytes` supplies
    the codec; everything else — the id partitioning, the Arrow batch
    shape, the (media_id, content) schema — is shared, so a change to
    the contract cannot silently diverge between codecs.

    The payload is a pure function of (w, h, v) — a space bounded by
    the fixture moduli (<= 256 distinct for the defaults, vs 5000 rows
    at sf0.1) — so each task memoizes encodes on that key and renders
    every DISTINCT payload exactly once (guide §4.5 amortization; §8
    problem knowledge the optimizer cannot see). Bit-identical output:
    the encoders are deterministic functions of (pixels, w, h). The
    memo is task-local and rebuilt from scratch on every execution —
    no state survives a run, nothing is keyed on the input path."""

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict = {}
        for pdf in batches:
            ids = pdf["media_id"]
            payloads = []
            for i in ids:
                w, h = 1 + int(i) % max_w, 1 + int(i) % max_h
                v = value(int(i))
                p = memo.get((w, h, v))
                if p is None:
                    p = memo[(w, h, v)] = encode(bytes([v]) * (w * h * 3),
                                                 w, h)
                payloads.append(p)
            yield pd.DataFrame({"media_id": ids, "content": payloads})

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])
    return _id_partitions(docs, id_col).mapInPandas(render, out_schema)


def synthetic_png_media(docs: DataFrame, id_col: str = "doc_id",
                        max_w: int = 16, max_h: int = 8) -> DataFrame:
    """Render one deterministic solid-gray PNG per row (real encoder).

    Dimensions and intensity are closed-form in the id (_solid_media),
    so a SQL oracle can verify the decoded features exactly while the
    Spark side genuinely encodes and decodes PNG bytes. Encoding runs in
    the same Arrow-batched boundary as decoding.
    """
    from etl_online_retail_spark.multimodal import png as _png

    return _solid_media(
        docs, id_col, max_w, max_h,
        lambda pix, w, h: _png.encode_png(pix, w, h, color_type=2))


def synthetic_webp_media(docs: DataFrame, id_col: str = "doc_id",
                         max_w: int = 16, max_h: int = 8) -> DataFrame:
    """Render one deterministic solid-gray lossless WebP per row (real
    VP8L encoder, multimodal/webp.py) — the _solid_media contract, so
    the SQL oracle verifies the decoded features in closed form while
    the Spark side genuinely encodes and decodes WebP bytes."""
    from etl_online_retail_spark.multimodal import webp as _webp

    return _solid_media(
        docs, id_col, max_w, max_h,
        lambda pix, w, h: _webp.encode_webp_lossless(pix, w, h, channels=3))


def synthetic_tiff_media(docs: DataFrame, id_col: str = "doc_id",
                         max_w: int = 16, max_h: int = 8) -> DataFrame:
    """Render one deterministic solid-gray TIFF per row — LZW-compressed
    strips, so the query genuinely exercises the from-spec TIFF-LZW
    encoder AND decoder (multimodal/tiff.py) under the _solid_media
    closed-form oracle contract."""
    from etl_online_retail_spark.multimodal import tiff as _tiff

    return _solid_media(
        docs, id_col, max_w, max_h,
        lambda pix, w, h: _tiff.encode_tiff(pix, w, h, channels=3,
                                            compression="lzw"))


def synthetic_bmp_media(docs: DataFrame, id_col: str = "doc_id",
                        max_w: int = 16, max_h: int = 8) -> DataFrame:
    """One deterministic solid-gray 24-bit BMP per row (bottom-up BGR
    storage, multimodal/bmp.py) under the _solid_media contract."""
    from etl_online_retail_spark.multimodal import bmp as _bmp

    return _solid_media(
        docs, id_col, max_w, max_h,
        lambda pix, w, h: _bmp.encode_bmp(pix, w, h))


def synthetic_lossy_webp_media(docs: DataFrame, id_col: str = "doc_id",
                               max_w: int = 16, max_h: int = 8) -> DataFrame:
    """One deterministic solid-gray LOSSY WebP (VP8) per row, encoded
    by the libwebp binding at quality 100 (multimodal/native.py, r7).
    _solid_media contract; the solid value v = id % 256 survives the
    lossy path within +-1 intensity step (measured over all 256 v:
    chroma-subsampled YUV round-trip error), which is exactly the
    invariant webp_lossy_image_stats asserts."""
    from etl_online_retail_spark.multimodal import native as _native

    return _solid_media(
        docs, id_col, max_w, max_h,
        lambda pix, w, h: _native.webp_encode_rgb_lossy(pix, w, h,
                                                        quality=100.0))


def synthetic_avif_media(docs: DataFrame, id_col: str = "doc_id",
                         max_w: int = 16, max_h: int = 8) -> DataFrame:
    """One deterministic solid-gray AVIF (real AV1 via libheif+aom) per
    row, quality 100 (_solid_media contract). Solid frames round-trip
    BIT-EXACTLY at quality 100 (constant Y = v, Cb = Cr = 128 — measured
    over all 512 (v, dims) combinations on libheif 1.15.1 + aom/dav1d),
    so the decoded features keep the exact closed-form oracle the
    lossless codecs use, no tolerance band needed."""
    from etl_online_retail_spark.multimodal import heif as _heif

    return _solid_media(
        docs, id_col, max_w, max_h,
        lambda pix, w, h: _heif.avif_encode_rgb(pix, w, h, quality=100))


def lossy_webp_roundtrip_features(media: DataFrame) -> DataFrame:
    """Decode lossy WebP payloads through the ordinary decode_image
    dispatch and assert the lossy contract against the fixture's known
    solid value v = media_id % 256: header dims are exact, and every
    decoded sample sits within one intensity step of v. The bound is
    the honest lossy oracle — the exact decoded value is a libwebp
    rounding detail, not a closed form of v."""

    from etl_online_retail_spark.multimodal import webp as _webp

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["content"]):
                img = _webp.decode_webp(bytes(payload))
                v = int(mid) % 256
                err = max(abs(b - v) for b in img.pixels) \
                    if img.pixels else 255
                rows.append((int(mid), img.width, img.height,
                             img.channels, bool(err <= 1)))
            out = pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "channels", "err_le_1"])
            out["width"] = out["width"].astype("int32")
            out["height"] = out["height"].astype("int32")
            out["channels"] = out["channels"].astype("int32")
            yield out

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("err_le_1", T.BooleanType()),
    ])
    return media.mapInPandas(extract, out_schema)


_PNG_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> PNG color type


def resize_image(content: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resize of a decodable payload (PNG, baseline
    JPEG, lossless WebP or — when libheif is present — AVIF/HEIC in),
    re-encoded as PNG (lossless out — resizing shouldn't add a second
    lossy generation). Pure stdlib plus the dlopen-gated bindings, same
    per-payload shape a PIL-backed body would keep."""
    from etl_online_retail_spark.multimodal import bmp as _bmp
    from etl_online_retail_spark.multimodal import heif as _heif
    from etl_online_retail_spark.multimodal import jpeg as _jpeg
    from etl_online_retail_spark.multimodal import png as _png
    from etl_online_retail_spark.multimodal import tiff as _tiff
    from etl_online_retail_spark.multimodal import webp as _webp

    content = bytes(content)
    if content[:8] == _png.PNG_SIGNATURE:
        img = _png.decode_png(content)
    elif content[:2] == _jpeg.JPEG_SOI:
        img = _jpeg.decode_jpeg(content)
    elif (content[:4] == _webp.RIFF_MAGIC
          and content[8:12] == _webp.WEBP_MAGIC):
        img = _webp.decode_webp(content)
    elif content[:4] in (b"II*\x00", b"MM\x00*"):
        img = _tiff.decode_tiff(content)
    elif content[:2] == b"BM":
        img = _bmp.decode_bmp(content)
    elif _heif.is_heif(content):
        img = _heif.decode_heif(content)
    else:
        raise NotImplementedError(
            "resize supports PNG, baseline JPEG, lossless WebP, TIFF, "
            "BMP and (via libheif) AVIF/HEIC payloads here")
    import numpy as np

    ch = img.channels
    # vectorized nearest-neighbor gather (r8): identical indices to the
    # old per-pixel loop (sy = y*H//out_h, sx = x*W//out_w), evaluated as
    # one numpy fancy-index over the (H, W, ch) view. At fixture size the
    # bench row doesn't move (JPEG Huffman decode dominates), but the
    # resize stage's own ceiling goes from ~us/PIXEL of Python to a
    # memory-bandwidth gather — the term that matters on real-resolution
    # images (10^6 pixels each)
    src = np.frombuffer(bytes(img.pixels), dtype=np.uint8).reshape(
        img.height, img.width, ch)
    sy = (np.arange(out_h, dtype=np.int64) * img.height) // out_h
    sx = (np.arange(out_w, dtype=np.int64) * img.width) // out_w
    out = src[sy[:, None], sx[None, :]]
    return _png.encode_png(out.tobytes(), out_w, out_h,
                           color_type=_PNG_COLOR_TYPE[ch])


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Arrow-batched resize stage: (media_id, content) -> (media_id,
    content) at the target dimensions. The standard normalize-resolution
    step in an image-training pipeline, in the same mapInPandas boundary
    as decoding."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "content": [resize_image(b, out_w, out_h)
                            for b in pdf["content"]],
            })

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])
    return media.select("media_id", "content").mapInPandas(run, out_schema)


def synthetic_jpeg_media(docs: DataFrame, id_col: str = "doc_id",
                         max_w: int = 16, max_h: int = 8) -> DataFrame:
    """Render one deterministic solid-gray baseline JPEG per row (real
    encoder). Twin of synthetic_png_media with one deliberate change: the
    intensity is EVEN (2 * (id % 128)) so the decode is bit-exact — the
    only nonzero coefficient is the luma DC 8*(v-128), whose quantization
    by 16 hits no rounding knife-edge when (v-128) is even, and the chroma
    planes are exactly 128 (multimodal/jpeg.py determinism notes). That
    keeps the decoded features closed-form in the id for the SQL oracle
    while the Spark side genuinely encodes and decodes JPEG bytes.
    """
    from etl_online_retail_spark.multimodal import jpeg as _jpeg

    return _solid_media(
        docs, id_col, max_w, max_h,
        lambda pix, w, h: _jpeg.encode_jpeg(pix, w, h, channels=3),
        value=lambda i: 2 * (i % 128))


def synthetic_progressive_jpeg_media(docs: DataFrame, id_col: str = "doc_id",
                                     max_w: int = 16,
                                     max_h: int = 8) -> DataFrame:
    """Render one deterministic solid-gray PROGRESSIVE JPEG per row
    (SOF2 with successive approximation — all four progressive scan
    kinds: DC first/refine and AC first/refine). Same closed-form
    contract as synthetic_jpeg_media: even intensity keeps the decode
    bit-exact (identical quantized coefficients, only the scan script
    differs), so the oracle stays analytic in the id while the Spark
    side genuinely decodes a multi-scan entropy stream.
    """
    from etl_online_retail_spark.multimodal import jpeg as _jpeg

    return _solid_media(
        docs, id_col, max_w, max_h,
        lambda pix, w, h: _jpeg.encode_progressive_jpeg(
            pix, w, h, channels=3, successive=True),
        value=lambda i: 2 * (i % 128))


def frame_sample(content: bytes, every_n: int = 30) -> list[tuple[int, bytes]]:
    """Sample every n-th frame of a video payload -> [(frame_idx, jpeg)].

    MJPEG (back-to-back baseline JPEG frames — a real public format) is
    sampled FOR REAL via the structure-aware splitter in multimodal/jpeg;
    container formats (mp4/webm) still need ffmpeg/pyav and raise with
    the signature a real demuxer body would keep."""
    from etl_online_retail_spark.multimodal import jpeg as _jpeg
    from etl_online_retail_spark.multimodal import mp4 as _mp4

    content = bytes(content)
    if content[:2] == _jpeg.JPEG_SOI:
        frames = _jpeg.split_mjpeg(content)
        return [(i, frames[i]) for i in range(0, len(frames), every_n)]
    if _mp4.is_mp4(content):
        # REAL demux (ISO BMFF box walk, multimodal/mp4.py): the sampled
        # payloads are the track's codec samples (e.g. H.264 AUs) as
        # opaque bytes — decodable frames only for MJPEG-style tracks;
        # decoding AVC/HEVC payloads still needs ffmpeg-class codecs.
        info = _mp4.demux_mp4(content)
        vid = next((t for t in info.tracks if t.handler == "vide"), None)
        if vid is None or not vid.samples:
            raise ValueError("mp4 has no video track with a sample table")
        return _mp4.extract_samples(content, vid, every_n)
    from etl_online_retail_spark.multimodal import webm as _webm

    if _webm.is_webm(content):
        # REAL demux (EBML walk, multimodal/webm.py): SimpleBlock
        # payloads (VP8/VP9 frames) as opaque bytes, same split as mp4.
        return _webm.extract_frames(_webm.demux_webm(content),
                                    every_n=every_n)
    raise NotImplementedError(
        "video frame sampling beyond MJPEG and MP4/WebM demux requires "
        "ffmpeg/pyav, not present here"
    )


AUDIO_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("duration_ms", T.DoubleType()),
    T.StructField("mean_abs", T.DoubleType()),
])


def audio_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL audio decode: per-clip rate/channels/duration/
    amplitude features — the triage columns an audio-training pipeline
    filters on before the expensive model stages. Dispatches on magic
    bytes: RIFF/WAVE (linear PCM, G.711 mu-law, IMA ADPCM — wav.py) and
    fLaC (lossless compressed — flac.py); both clip types expose the
    same feature surface."""
    from etl_online_retail_spark.multimodal import flac as _flac
    from etl_online_retail_spark.multimodal import wav as _wav

    def _decode(b: bytes):
        if b[:4] == _flac.FLAC_MAGIC:
            return _flac.decode_flac(b)
        return _wav.decode_wav(b)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            clips = [_decode(bytes(b)) for b in pdf["content"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "sample_rate": pd.Series(
                    [c.sample_rate for c in clips], dtype="int32"),
                "channels": pd.Series(
                    [c.channels for c in clips], dtype="int32"),
                "n_frames": pd.Series(
                    [c.n_frames for c in clips], dtype="int32"),
                "duration_ms": pd.Series(
                    [c.duration_ms() for c in clips], dtype="float64"),
                "mean_abs": pd.Series(
                    [c.mean_abs() for c in clips], dtype="float64"),
            })

    return media.select("media_id", "content").mapInPandas(
        extract, AUDIO_FEATURE_SCHEMA)


def synthetic_wav_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One deterministic PCM clip per row: mono 16-bit at 8 kHz,
    n = 800 + 80*(id % 10) constant-amplitude samples of value
    (id % 2000) - 1000 — duration and mean amplitude are closed-form in
    the id (n is a multiple of 8, so duration_ms = n/8 is exact in
    DOUBLE) while Spark genuinely encodes and decodes RIFF bytes."""
    from etl_online_retail_spark.multimodal import wav as _wav

    import numpy as np

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # payload = f(n, v): <= 2000 distinct keys (see _solid_media on
        # why a task-local memo of distinct payloads is bit-identical)
        memo: dict = {}
        for pdf in batches:
            ids = pdf["media_id"]
            payloads = []
            for i in ids:
                i = int(i)
                n = 800 + 80 * (i % 10)
                v = (i % 2000) - 1000
                p = memo.get((n, v))
                if p is None:
                    p = memo[(n, v)] = _wav.encode_wav(
                        np.full(n, v, dtype=np.int64), 8000)
                payloads.append(p)
            yield pd.DataFrame({"media_id": ids, "content": payloads})

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])
    return _id_partitions(docs, id_col).mapInPandas(render, out_schema)


def synthetic_webm_media(docs: DataFrame,
                         id_col: str = "doc_id") -> DataFrame:
    """One deterministic minimal WebM per row (real EBML builder,
    multimodal/webm.py): n = 1 + id % 8 opaque VP9-labeled frames of
    6 + id % 7 bytes at 40 ms per frame, width 128 + 32*(id % 4) — the
    demux features are analytic in the id while Spark genuinely walks
    the element tree and SimpleBlock lacing."""
    from etl_online_retail_spark.multimodal import webm as _webm

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # payload = f(i % 256, size): n and width are functions of
        # i % 256; <= 1792 distinct keys (memo contract: _solid_media)
        memo: dict = {}
        for pdf in batches:
            ids = pdf["media_id"]
            payloads = []
            for i in ids:
                i = int(i)
                n = 1 + i % 8
                size = 6 + i % 7
                p = memo.get((i % 256, size))
                if p is None:
                    frames = [bytes([(i + f) % 256]) * size
                              for f in range(n)]
                    p = memo[(i % 256, size)] = _webm.build_webm(
                        frames, codec_id="V_VP9",
                        width=128 + 32 * (i % 4), height=96)
                payloads.append(p)
            yield pd.DataFrame({"media_id": ids, "content": payloads})

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])
    return _id_partitions(docs, id_col).mapInPandas(render, out_schema)


WEBM_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("doctype", T.StringType()),
    T.StructField("codec_id", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("total_frame_bytes", T.LongType()),
])


def webm_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL WebM/EBML demux via mapInPandas — the
    container-metadata triage for the other video format a crawl meets,
    beside mp4_features."""
    from etl_online_retail_spark.multimodal import webm as _webm

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in WEBM_FEATURE_SCHEMA}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                info = _webm.demux_webm(bytes(content))
                t = info.tracks[0]
                rows["media_id"].append(mid)
                rows["doctype"].append(info.doctype)
                rows["codec_id"].append(t.codec_id)
                rows["width"].append(t.width)
                rows["height"].append(t.height)
                rows["duration_ms"].append(info.duration_ms())
                rows["n_frames"].append(len(t.frames))
                rows["total_frame_bytes"].append(
                    sum(len(b) for _, b in t.frames))
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(
        extract, WEBM_FEATURE_SCHEMA)


def synthetic_adpcm_media(docs: DataFrame,
                          id_col: str = "doc_id") -> DataFrame:
    """One deterministic IMA-ADPCM clip per row (REAL 4:1 compressed
    audio, wav.py format 0x11): mono at 8 kHz, n = 40 + 8*(id % 9)
    constant samples of value (id % 2000) - 1000, block_align 36 (65
    samples per block) so clips span one-to-two blocks incl. padded
    partial finals. Constant signals survive the lossy codec BIT-EXACTLY
    (step[0] = 7 makes the zero nibble reconstruct diff 0 — see
    encode_wav_adpcm), and n is a multiple of 8, so every decoded
    feature stays closed-form in the id while Spark genuinely runs the
    quantize/reconstruct feedback loop over block-structured nibbles."""
    from etl_online_retail_spark.multimodal import wav as _wav

    import numpy as np

    # no render memo here (unlike _solid_media): the payload key
    # (i % 9, i % 2000) has lcm 18000 distinct values — more than the
    # sf0.1 corpus, so a memo would never hit
    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["media_id"]
            payloads = []
            for i in ids:
                i = int(i)
                n = 40 + 8 * (i % 9)
                v = (i % 2000) - 1000
                payloads.append(_wav.encode_wav_adpcm(
                    np.full(n, v, dtype=np.int64), 8000, block_align=36))
            yield pd.DataFrame({"media_id": ids, "content": payloads})

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])
    return _id_partitions(docs, id_col).mapInPandas(render, out_schema)


def synthetic_flac_media(docs: DataFrame,
                         id_col: str = "doc_id") -> DataFrame:
    """One deterministic FLAC clip per row (REAL lossless compressed
    audio, multimodal/flac.py): mono 16-bit at 8 kHz, a sawtooth
    s_k = k mod m with period m = 8 * (1 + id % 8) repeated
    reps = 30 + id % 5 times (n = m * reps samples, always a multiple
    of 8 so duration_ms = n / 8 is exact in DOUBLE). The ramp makes the
    order-1 fixed predictor's residual constant except at period wraps,
    so Spark genuinely exercises predictor selection + Rice coding and
    real compression — while losslessness keeps every decoded feature
    closed-form in the id: mean_abs = (m - 1) / 2 exactly."""
    from etl_online_retail_spark.multimodal import flac as _flac

    import numpy as np

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # payload = f(m, reps): 40 distinct keys vs 5000 rows at sf0.1
        # (memo contract: _solid_media)
        memo: dict = {}
        for pdf in batches:
            ids = pdf["media_id"]
            payloads = []
            for i in ids:
                i = int(i)
                m = 8 * (1 + i % 8)
                reps = 30 + i % 5
                p = memo.get((m, reps))
                if p is None:
                    wave = np.tile(np.arange(m, dtype=np.int64), reps)
                    # 1024-sample blocks: the longer clips (m >= 32)
                    # still span multiple frames, so the frame walk is
                    # exercised, at 1/4 the per-frame overhead of 256
                    # (r7; every output feature is block-size
                    # independent)
                    p = memo[(m, reps)] = _flac.encode_flac(
                        wave, 8000, block_size=1024)
                payloads.append(p)
            yield pd.DataFrame({"media_id": ids, "content": payloads})

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])
    return _id_partitions(docs, id_col).mapInPandas(render, out_schema)


def synthetic_ulaw_media(docs: DataFrame,
                         id_col: str = "doc_id") -> DataFrame:
    """One deterministic G.711 mu-law clip per row: mono 8 kHz square
    wave of n = 800 + 80*(id % 10) samples at amplitude
    A(id) = 132 * (2^(1 + id % 6) - 1) — amplitudes chosen as EXACT
    mu-law codewords (m=0 rungs of the companding ladder), so the lossy
    compand->expand round-trip is bit-exact and mean_abs = A(id) stays
    closed-form for the oracle while Spark genuinely runs the ITU
    algebra both ways."""
    from etl_online_retail_spark.multimodal import wav as _wav

    import numpy as np

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # payload = f(n, a): 30 distinct keys vs 5000 rows at sf0.1
        # (memo contract: _solid_media)
        memo: dict = {}
        for pdf in batches:
            ids = pdf["media_id"]
            payloads = []
            for i in ids:
                i = int(i)
                n = 800 + 80 * (i % 10)
                a = 132 * (2 ** (1 + i % 6) - 1)
                p = memo.get((n, a))
                if p is None:
                    wave = np.empty(n, dtype=np.int64)
                    wave[0::2] = a
                    wave[1::2] = -a
                    p = memo[(n, a)] = _wav.encode_wav(wave, 8000,
                                                       audio_format=7)
                payloads.append(p)
            yield pd.DataFrame({"media_id": ids, "content": payloads})

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])
    return _id_partitions(docs, id_col).mapInPandas(render, out_schema)


# kept as the documented stub surface for codec DECODE of demuxed samples
def frame_sample_stub(content: bytes, every_n: int = 30) -> list[bytes]:
    """Placeholder for decoding demuxed AVC/HEVC/VP9 sample payloads to
    pixels (mp4/webm DEMUX is real — multimodal/mp4.py — the codec
    decode of its samples is what still needs ffmpeg)."""
    raise NotImplementedError(
        "video frame sampling requires ffmpeg/pyav, not present here"
    )


def synthetic_mp4_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One deterministic minimal MP4 per row (real builder, multimodal/
    mp4.py): n_samples = 1 + id % 7 opaque payloads of 8 + id % 9 bytes,
    timescale 1000 with 100 units per sample, avc1 fourcc, width/height
    closed-form in the id — so the demux features are analytic for the
    SQL oracle while the Spark side genuinely walks the box tree."""
    from etl_online_retail_spark.multimodal import mp4 as _mp4

    # no render memo here (unlike _solid_media): the payload key
    # (i % 256, i % 7, i % 9, i % 8) has lcm 16128 distinct values —
    # more than the sf0.1 corpus, so a memo would never hit
    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["media_id"]
            payloads = []
            for i in ids:
                n = 1 + int(i) % 7
                size = 8 + int(i) % 9
                samples = [bytes([(int(i) + s) % 256]) * size
                           for s in range(n)]
                payloads.append(_mp4.build_mp4(
                    samples, timescale=1000,
                    codec="avc1", width=64 + 16 * (int(i) % 8), height=64))
            yield pd.DataFrame({"media_id": ids, "content": payloads})

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])
    return _id_partitions(docs, id_col).mapInPandas(render, out_schema)


MP4_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("major_brand", T.StringType()),
    T.StructField("handler", T.StringType()),
    T.StructField("codec", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("n_samples", T.IntegerType()),
    T.StructField("total_sample_bytes", T.LongType()),
])


def mp4_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL container demux via mapInPandas: box-tree walk,
    movie/track metadata, full sample-table expansion — the product a
    video curation pipeline filters on before any codec ever runs."""
    from etl_online_retail_spark.multimodal import mp4 as _mp4

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in MP4_FEATURE_SCHEMA}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                info = _mp4.demux_mp4(bytes(content))
                t = info.tracks[0]
                rows["media_id"].append(mid)
                rows["major_brand"].append(info.major_brand)
                rows["handler"].append(t.handler)
                rows["codec"].append(t.codec)
                rows["width"].append(t.width)
                rows["height"].append(t.height)
                rows["duration_ms"].append(info.duration_ms())
                rows["n_samples"].append(len(t.samples))
                rows["total_sample_bytes"].append(
                    sum(sz for _, sz in t.samples))
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(
        extract, MP4_FEATURE_SCHEMA)


FRAME_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_pixel", T.DoubleType()),
])


def video_frame_features(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Arrow-batched frame sampling + per-frame decode: one output row per
    SAMPLED frame. The fan-out (rows out > rows in) happens inside the
    batch, the schema contract stays columnar — the shape a video
    pretraining pipeline uses for frame-level filtering/captioning."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ws, hs, means = [], [], [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                for i, frame in frame_sample(content, every_n):
                    f = decode_image(frame)
                    ids.append(mid)
                    idxs.append(i)
                    ws.append(f["width"])
                    hs.append(f["height"])
                    means.append(f["mean_pixel"])
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "width": pd.Series(ws, dtype="int32"),
                "height": pd.Series(hs, dtype="int32"),
                "mean_pixel": pd.Series(means, dtype="float64"),
            })

    return media.select("media_id", "content").mapInPandas(
        extract, FRAME_FEATURE_SCHEMA)


def synthetic_mjpeg_media(docs: DataFrame, id_col: str = "doc_id",
                          max_frames: int = 5) -> DataFrame:
    """One deterministic MJPEG clip per row: 1 + id % max_frames solid
    even-gray frames, frame f's intensity = 2 * ((id + 7*f) % 128) — all
    closed-form in (id, frame index) so frame-level decode results are
    SQL-oracle-checkable (see synthetic_jpeg_media for why even gray is
    bit-exact)."""
    from etl_online_retail_spark.multimodal import jpeg as _jpeg

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # clip = f(i % 128, n_frames): w, h and every frame intensity
        # are functions of i % 128; <= 128 * max_frames distinct keys
        # (memo contract: _solid_media)
        memo: dict = {}
        for pdf in batches:
            ids = pdf["media_id"]
            payloads = []
            for i in ids:
                i = int(i)
                nf = 1 + i % max_frames
                clip = memo.get((i % 128, nf))
                if clip is None:
                    w, h = 1 + i % 16, 1 + i % 8
                    clip = memo[(i % 128, nf)] = b"".join(
                        _jpeg.encode_jpeg(
                            bytes([2 * ((i + 7 * f) % 128)]) * (w * h * 3),
                            w, h, channels=3)
                        for f in range(nf))
                payloads.append(clip)
            yield pd.DataFrame({"media_id": ids, "content": payloads})

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])
    return _id_partitions(docs, id_col).mapInPandas(render, out_schema)


def synthetic_gif_media(docs: DataFrame, id_col: str = "doc_id",
                        max_w: int = 16, max_h: int = 8) -> DataFrame:
    """One deterministic solid-gray single-frame GIF per row (real LZW
    encoder, multimodal/gif.py) — the synthetic_png_media pattern: width
    = 1 + id % max_w, height = 1 + id % max_h, every palette index (and,
    through the grayscale table, every RGB sample) = id % 256, so the
    oracle verifies the decoded features in closed form."""
    from etl_online_retail_spark.multimodal import gif as _gif

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # payload = f(w, h, v): <= 256 distinct keys for the defaults
        # (memo contract: _solid_media)
        memo: dict = {}
        for pdf in batches:
            ids = pdf["media_id"]
            payloads = []
            for i in ids:
                i = int(i)
                w, h, v = 1 + i % max_w, 1 + i % max_h, i % 256
                p = memo.get((w, h, v))
                if p is None:
                    p = memo[(w, h, v)] = _gif.encode_gif(
                        [bytes([v]) * (w * h)], w, h)
                payloads.append(p)
            yield pd.DataFrame({"media_id": ids, "content": payloads})

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])
    return _id_partitions(docs, id_col).mapInPandas(render, out_schema)


def synthetic_animated_gif_media(docs: DataFrame, id_col: str = "doc_id",
                                 max_frames: int = 4) -> DataFrame:
    """One deterministic ANIMATED GIF per row: 1 + id % max_frames solid
    frames, frame f's gray value = (id + 85*f) % 256 — closed-form in
    (id, frame index) like synthetic_mjpeg_media, so per-frame decode is
    SQL-oracle-checkable."""
    from etl_online_retail_spark.multimodal import gif as _gif

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # clip = f(i % 256, n_frames): w, h and every frame value are
        # functions of i % 256; <= 256 * max_frames distinct keys
        # (memo contract: _solid_media)
        memo: dict = {}
        for pdf in batches:
            ids = pdf["media_id"]
            payloads = []
            for i in ids:
                i = int(i)
                nf = 1 + i % max_frames
                p = memo.get((i % 256, nf))
                if p is None:
                    w, h = 1 + i % 16, 1 + i % 8
                    frames = [bytes([(i + 85 * f) % 256]) * (w * h)
                              for f in range(nf)]
                    p = memo[(i % 256, nf)] = _gif.encode_gif(frames, w, h)
                payloads.append(p)
            yield pd.DataFrame({"media_id": ids, "content": payloads})

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])
    return _id_partitions(docs, id_col).mapInPandas(render, out_schema)


def gif_frame_features(media: DataFrame) -> DataFrame:
    """Per-frame decode of (possibly animated) GIF payloads: one output
    row per frame — the container-structure twin of video_frame_features
    (MJPEG), driven by GIF's image-descriptor walk rather than marker
    scanning. Same columnar fan-out contract and output schema."""
    from etl_online_retail_spark.multimodal import gif as _gif

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ws, hs, means = [], [], [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                img = _gif.decode_gif(bytes(content))
                for fi, frame in enumerate(img.frames):
                    ids.append(mid)
                    idxs.append(fi)
                    ws.append(frame.width)
                    hs.append(frame.height)
                    means.append(frame.mean_pixel())
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "width": pd.Series(ws, dtype="int32"),
                "height": pd.Series(hs, dtype="int32"),
                "mean_pixel": pd.Series(means, dtype="float64"),
            })

    return media.select("media_id", "content").mapInPandas(
        extract, FRAME_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# perceptual image hashing: dHash (difference hash) over genuinely
# decoded pixels — the image-side near-duplicate primitive (re-encoded /
# resized copies of one motif hash identically; exact-dhash grouping is
# then a plain hash aggregation, and a hamming-ball extension bands on
# hash bytes exactly like SimHash does for text).

DHASH_GRID = 8


def image_dhash(media: DataFrame, grid: int = DHASH_GRID) -> DataFrame:
    """Arrow-batched dHash: decode -> integer luma -> nearest-neighbor
    downsample to (grid+1) x grid -> each bit says "right neighbor is
    brighter". Output (media_id, dhash_hi, dhash_lo) — the 64-bit hash
    split into two BIGINT halves so it stays integer-exact on every
    engine. Decode genuinely runs (stdlib PNG/JPEG codecs); only the
    sampling arithmetic afterwards is closed-form.
    """

    def dhash_one(content: bytes) -> tuple[int, int]:
        from etl_online_retail_spark.multimodal import jpeg as _jpeg
        from etl_online_retail_spark.multimodal import png as _png

        content = bytes(content)
        if content[:8] == _png.PNG_SIGNATURE:
            img = _png.decode_png(content)
        elif content[:2] == _jpeg.JPEG_SOI:
            img = _jpeg.decode_jpeg(content)
        else:
            raise NotImplementedError("PNG/baseline-JPEG only")
        ch, w, h = img.channels, img.width, img.height
        px = img.pixels

        def luma(x: int, y: int) -> int:
            o = (y * w + x) * ch
            if ch >= 3:
                return (px[o] + px[o + 1] + px[o + 2]) // 3
            return px[o]

        xs = [min(x * w // (grid + 1), w - 1) for x in range(grid + 1)]
        ys = [min(y * h // grid, h - 1) for y in range(grid)]
        bits = 0
        for yi, y in enumerate(ys):
            for xi in range(grid):
                if luma(xs[xi + 1], y) > luma(xs[xi], y):
                    bits |= 1 << (yi * grid + xi)
        return bits >> 32, bits & 0xFFFFFFFF

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pairs = [dhash_one(b) for b in pdf["content"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "dhash_hi": pd.Series([p[0] for p in pairs], dtype="int64"),
                "dhash_lo": pd.Series([p[1] for p in pairs], dtype="int64"),
            })

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("dhash_hi", T.LongType()),
        T.StructField("dhash_lo", T.LongType()),
    ])
    return media.select("media_id", "content").mapInPandas(run, schema)


def synthetic_pattern_media(docs: DataFrame, id_col: str = "doc_id",
                            n_motifs: int = 16, grid: int = DHASH_GRID
                            ) -> DataFrame:
    """One deterministic patterned PNG per row: motif m = id % n_motifs,
    pixel value v(m, x, y) = (m*37 + x*x + y*11) % 256 at width
    2*(grid+1), height grid. Same-motif rows are pixel-identical (the
    planted near-duplicates); the value function is closed-form in the
    id so a SQL oracle can verify the dHash bits analytically while the
    Spark side genuinely encodes and decodes PNG bytes."""
    from etl_online_retail_spark.multimodal import png as _png

    w, h = 2 * (grid + 1), grid

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # payload = f(motif): n_motifs (16) distinct keys vs 5000 rows
        # at sf0.1 — same-motif rows are pixel-identical BY CONTRACT
        # (the planted near-duplicates), so the memo renders each motif
        # once per task (memo contract: _solid_media)
        memo: dict = {}
        for pdf in batches:
            ids = pdf["media_id"]
            payloads = []
            for i in ids:
                m = int(i) % n_motifs
                p = memo.get(m)
                if p is None:
                    buf = bytearray()
                    for y in range(h):
                        for x in range(w):
                            v = (m * 37 + x * x + y * 11) % 256
                            buf += bytes([v, v, v])
                    p = memo[m] = _png.encode_png(bytes(buf), w, h,
                                                  color_type=2)
                payloads.append(p)
            yield pd.DataFrame({"media_id": ids, "content": payloads})

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])
    return _id_partitions(docs, id_col).mapInPandas(render, out_schema)


def dhash_near_pairs(hashed: DataFrame, max_hamming: int = 6,
                     id_col: str = "media_id") -> DataFrame:
    """Near-duplicate IMAGE pairs from dHashes: band the 64-bit hash
    into its 8 bytes and self-join per band — by pigeonhole, any pair
    within hamming distance 7 (8 bands - 1) shares at least one whole
    byte, so banding finds every such pair without the all-pairs join
    (the same candidate-bounding shape SimHash uses for text). The XOR
    popcount then verifies candidates exactly.

    Output (id_a, id_b, hamming), id_a < id_b, hamming <= max_hamming
    (must stay <= 7 for the completeness guarantee)."""
    if max_hamming > 7:
        raise ValueError("8-byte banding is only complete for hamming <= 7")
    bands = F.array(*[
        F.struct(F.lit(k).alias("band"),
                 (F.shiftright(F.col("dhash_lo" if k < 4 else "dhash_hi"),
                               8 * (k % 4)) % 256).alias("val"))
        for k in range(8)
    ])
    rel = (hashed.select(F.col(id_col), "dhash_hi", "dhash_lo",
                         F.explode(bands).alias("_b"))
           .select(id_col, "dhash_hi", "dhash_lo",
                   F.col("_b.band").alias("band"),
                   F.col("_b.val").alias("val")))
    a = rel.select(F.col(id_col).alias("id_a"),
                   F.col("dhash_hi").alias("_ha"),
                   F.col("dhash_lo").alias("_la"), "band", "val")
    b = rel.select(F.col(id_col).alias("id_b"),
                   F.col("dhash_hi").alias("_hb"),
                   F.col("dhash_lo").alias("_lb"), "band", "val")
    ham = (F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
           + F.bit_count(F.col("_la").bitwiseXOR(F.col("_lb"))))
    return (a.join(b, ["band", "val"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", ham.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
            .distinct())


AUDIO_SPECTRAL_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("dominant_bin", T.IntegerType()),
    T.StructField("dominant_hz", T.DoubleType()),
    T.StructField("peak_ratio", T.DoubleType()),
])


def audio_spectral_features(media: DataFrame, n_fft: int = 1024) -> DataFrame:
    """REAL frequency-domain audio analysis: per clip, decode the WAV and
    run an n_fft-point real DFT (numpy rfft) over the first n_fft mono
    samples (zero-padded if shorter); report the dominant non-DC bin, its
    frequency in Hz, and its share of total spectral power.

    The model-pipeline shape: spectral triage (is this speech-band? pure
    tone? silence?) runs as one BLAS-class kernel per Arrow batch before
    any expensive encoder sees the audio. Scales like every mapInPandas
    stage here — linear in clips, no shuffle.
    """
    import numpy as np

    from etl_online_retail_spark.multimodal import wav as _wav

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, bins, hzs, ratios = [], [], [], []
            for media_id, b in zip(pdf["media_id"], pdf["content"]):
                clip = _wav.decode_wav(bytes(b))
                x = np.zeros(n_fft, dtype=np.float64)
                mono = np.asarray(clip.samples[:n_fft], dtype=np.float64)
                x[:len(mono)] = mono
                mag = np.abs(np.fft.rfft(x))
                power = mag * mag
                k = 1 + int(power[1:].argmax())  # skip DC
                total = float(power[1:].sum())
                ids.append(media_id)
                bins.append(k)
                hzs.append(k * clip.sample_rate / n_fft)
                ratios.append(float(power[k]) / total if total > 0 else 0.0)
            yield pd.DataFrame({
                "media_id": ids,
                "dominant_bin": pd.Series(bins, dtype="int32"),
                "dominant_hz": pd.Series(hzs, dtype="float64"),
                "peak_ratio": pd.Series(ratios, dtype="float64"),
            })

    return media.select("media_id", "content").mapInPandas(
        extract, AUDIO_SPECTRAL_SCHEMA)


def synthetic_tone_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One deterministic pure-tone PCM clip per row: mono 16-bit, 8 kHz,
    1024 samples of a sine at 250 * (1 + id % 8) Hz. Each tone frequency
    is BIN-ALIGNED for a 1024-point DFT (250 Hz = bin 32 exactly), so the
    spectral argmax is closed-form in the id — the oracle states
    dominant_bin = 32 * (1 + id % 8) while Spark genuinely renders,
    RIFF-encodes, decodes, and Fourier-transforms the waveform.
    """
    import numpy as np

    from etl_online_retail_spark.multimodal import wav as _wav

    t_axis = np.arange(1024, dtype=np.float64) / 8000.0

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # payload = f(tone frequency): 8 distinct keys vs 5000 rows at
        # sf0.1 (memo contract: _solid_media)
        memo: dict = {}
        for pdf in batches:
            ids = pdf["media_id"]
            payloads = []
            for i in ids:
                f = 250 * (1 + int(i) % 8)
                p = memo.get(f)
                if p is None:
                    wave = np.rint(8000 * np.sin(2 * np.pi * f * t_axis))
                    p = memo[f] = _wav.encode_wav(
                        wave.astype(np.int64), 8000)
                payloads.append(p)
            yield pd.DataFrame({"media_id": ids, "content": payloads})

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])
    return _id_partitions(docs, id_col).mapInPandas(render, out_schema)
