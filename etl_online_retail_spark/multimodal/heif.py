"""HEIF-family codecs (AVIF = AV1-in-HEIF, HEIC = HEVC-in-HEIF) via a
ctypes binding to the system's libheif — the second native binding after
libwebp (multimodal/native.py), and the same honesty contract: dlopen-
gated so environments without the library keep the NotImplementedError
boundary instead of a fake.

Why libheif binds where libjpeg/libpng could not (native.py's note):
its public C API is OPAQUE POINTERS plus one tiny by-value struct
(heif_error = {int code, int subcode, const char* message}) — no
version-dependent struct layouts, no jmp_buf error handling. The one
ABI limitation found while probing: ctypes callbacks cannot RETURN a
struct by value, which rules out the heif_writer memory sink, so
encoded bytes leave through heif_context_write_to_file on a tempfile
(a worker-local /tmp file per payload; ~0.1 ms against a multi-ms
encode).

This container ships libheif 1.15.1 linked against dav1d + aom (AV1
decode/encode) and libde265 + x265 (HEVC decode/encode) — probed, not
assumed: availability helpers ask heif_have_decoder_for_format /
heif_have_encoder_for_format per compression format, so a build with
different plugins degrades per-format instead of lying.

Measured in-container (512 (intensity, dims) combinations, fixture
shapes up to 16x8): solid-color frames round-trip BIT-EXACTLY through
both AVIF and HEIC at lossy quality 100 — solid gray has constant
Y = v and Cb = Cr = 128, which 4:2:0 subsampling and the DC-only
transform preserve — so the avif_image_stats oracle is exact closed
form, not a tolerance band. AVIF ~1.6 ms/encode + ~4 ms/decode per
fixture payload; HEIC ~25 ms/encode (x265 setup cost dominates tiny
frames).

Reference parity: the reference pipeline has no media surface at all
(minkminkk/etl-online-retail etl.py handles tabular retail rows only);
this module is part of the training-data extension surface (SURVEY.md
multimodal family). Scale contract: same as every codec module — runs
one payload at a time inside Arrow-batched mapInPandas; parallelism
across payloads is the scale axis.
"""

from __future__ import annotations

import ctypes
import os
import tempfile
from ctypes import (
    POINTER,
    Structure,
    byref,
    c_char_p,
    c_int,
    c_size_t,
    c_uint8,
    c_void_p,
    string_at,
)
from dataclasses import dataclass

# public heif.h enum values (stable across the 1.x ABI)
_COLORSPACE_RGB = 1
_CHROMA_INTERLEAVED_RGB = 10
_CHROMA_INTERLEAVED_RGBA = 11
_CHANNEL_INTERLEAVED = 10
COMPRESSION_HEVC = 1
COMPRESSION_AV1 = 4

# ISO-BMFF ftyp major brands that are HEIF still images (not video mp4)
HEIF_BRANDS = {b"avif", b"avis", b"heic", b"heix", b"hevc", b"hevx",
               b"mif1", b"msf1"}


class _HeifError(Structure):
    _fields_ = [("code", c_int), ("subcode", c_int), ("message", c_char_p)]


_LIB: ctypes.CDLL | None = None
_LOAD_ERR: str | None = None


def _load() -> ctypes.CDLL | None:
    global _LIB, _LOAD_ERR
    if _LIB is not None or _LOAD_ERR is not None:
        return _LIB
    for name in ("libheif.so.1", "libheif.so", "libheif.1.dylib",
                 "libheif.dylib"):
        try:
            lib = ctypes.CDLL(name)
            _bind(lib)
        except (OSError, AttributeError):
            # AttributeError = loaded but missing an entry point (pre-1.15
            # libheif lacks the have_*_for_format probes): treat as
            # unavailable so callers get the honest NotImplementedError
            continue
        _LIB = lib
        return lib
    _LOAD_ERR = "libheif shared library not found"
    return None


def _bind(lib: ctypes.CDLL) -> None:
    e = _HeifError
    protos = {
        "heif_context_alloc": (c_void_p, []),
        "heif_context_free": (None, [c_void_p]),
        "heif_context_read_from_memory_without_copy":
            (e, [c_void_p, c_void_p, c_size_t, c_void_p]),
        "heif_context_get_primary_image_handle":
            (e, [c_void_p, POINTER(c_void_p)]),
        "heif_image_handle_get_width": (c_int, [c_void_p]),
        "heif_image_handle_get_height": (c_int, [c_void_p]),
        "heif_image_handle_has_alpha_channel": (c_int, [c_void_p]),
        "heif_image_handle_release": (None, [c_void_p]),
        "heif_decode_image":
            (e, [c_void_p, POINTER(c_void_p), c_int, c_int, c_void_p]),
        "heif_image_get_plane_readonly":
            (POINTER(c_uint8), [c_void_p, c_int, POINTER(c_int)]),
        "heif_image_release": (None, [c_void_p]),
        "heif_image_create":
            (e, [c_int, c_int, c_int, c_int, POINTER(c_void_p)]),
        "heif_image_add_plane": (e, [c_void_p, c_int, c_int, c_int, c_int]),
        "heif_image_get_plane":
            (POINTER(c_uint8), [c_void_p, c_int, POINTER(c_int)]),
        "heif_context_get_encoder_for_format":
            (e, [c_void_p, c_int, POINTER(c_void_p)]),
        "heif_encoder_set_lossy_quality": (e, [c_void_p, c_int]),
        "heif_encoder_release": (None, [c_void_p]),
        "heif_context_encode_image":
            (e, [c_void_p, c_void_p, c_void_p, c_void_p, POINTER(c_void_p)]),
        "heif_context_write_to_file": (e, [c_void_p, c_char_p]),
        "heif_have_decoder_for_format": (c_int, [c_int]),
        "heif_have_encoder_for_format": (c_int, [c_int]),
        # multi-image files (HEIC bursts / image sequences): top-level
        # image enumeration beside the primary-image path
        "heif_context_get_number_of_top_level_images": (c_int, [c_void_p]),
        "heif_context_get_list_of_top_level_image_IDs":
            (c_int, [c_void_p, POINTER(ctypes.c_uint32), c_int]),
        "heif_context_get_image_handle":
            (e, [c_void_p, ctypes.c_uint32, POINTER(c_void_p)]),
    }
    for name, (restype, argtypes) in protos.items():
        fn = getattr(lib, name)  # AttributeError -> unavailable
        fn.restype = restype
        fn.argtypes = argtypes


# heif_error_code 4 (Unsupported_feature) always means "this build can't
# handle the format". Code 3 (Unsupported_filetype) is AMBIGUOUS: libheif
# also reports structurally-corrupt payloads as 3 depending on where
# parsing dies, so mapping 3 unconditionally to NotImplementedError would
# let quarantine flows that treat capability gaps as skippable silently
# pass over corrupt data (r10 advice). _check therefore maps only 4 by
# itself; the payload-reading entry points classify 3 via the brand sniff
# + per-format codec probes (_unsupported_filetype_class).
_CODE_UNSUPPORTED_FILETYPE = 3
_CODE_UNSUPPORTED_FEATURE = 4

# ftyp brand -> compression format, for classifying code-3 errors. The
# structural brands (mif1/msf1) name no codec, so a code-3 on them stays
# a capability gap (we cannot prove the payload is corrupt rather than
# carrying a codec this build lacks).
_BRAND_FORMAT = {b"avif": COMPRESSION_AV1, b"avis": COMPRESSION_AV1,
                 b"heic": COMPRESSION_HEVC, b"heix": COMPRESSION_HEVC,
                 b"hevc": COMPRESSION_HEVC, b"hevx": COMPRESSION_HEVC}


def _check(err: _HeifError, what: str,
           unsupported_filetype: type | None = None) -> None:
    """Raise on a non-zero heif_error. `unsupported_filetype` is the
    exception class for code 3 when the caller has classified the payload
    (corrupt -> ValueError, genuine capability gap ->
    NotImplementedError); without a classification code 3 defaults to
    ValueError — the loud, quarantinable surface."""
    if err.code != 0:
        msg = (err.message or b"").decode("utf-8", "replace")
        text = (f"libheif {what} failed (code {err.code}/"
                f"{err.subcode}): {msg}")
        if err.code == _CODE_UNSUPPORTED_FEATURE:
            raise NotImplementedError(text)
        if (err.code == _CODE_UNSUPPORTED_FILETYPE
                and unsupported_filetype is not None):
            raise unsupported_filetype(text)
        raise ValueError(text)


def _unsupported_filetype_class(content: bytes) -> type:
    """The honest exception class for a code-3 parse failure on `content`:
    a payload whose sniffed brand's codec IS linked in this build cannot
    be "unsupported" — it is corrupt (ValueError); a foreign filetype or
    a brand whose codec this build lacks is a capability gap
    (NotImplementedError)."""
    if not is_heif(content):
        return NotImplementedError
    fmt = _BRAND_FORMAT.get(content[8:12])
    lib = _load()
    if (fmt is not None and lib is not None
            and bool(lib.heif_have_decoder_for_format(fmt))):
        return ValueError
    return NotImplementedError


def heif_available() -> bool:
    """The library itself loaded (independent of per-format plugins)."""
    return _load() is not None


def _format_available(fmt: int) -> bool:
    lib = _load()
    return (lib is not None
            and bool(lib.heif_have_decoder_for_format(fmt))
            and bool(lib.heif_have_encoder_for_format(fmt)))


def avif_available() -> bool:
    """libheif present AND an AV1 decoder + encoder plugin linked."""
    return _format_available(COMPRESSION_AV1)


def heic_available() -> bool:
    """libheif present AND an HEVC decoder + encoder plugin linked."""
    return _format_available(COMPRESSION_HEVC)


_ROUNDTRIP_EXACT: dict[int, bool] = {}


def format_roundtrip_exact(fmt: int) -> bool:
    """One ACTUAL encode+decode of a solid frame, checked bit-exact.

    The avif_image_stats oracle's closed form rests on solid frames
    surviving quality-100 lossy encoding exactly — measured on this
    container's libheif 1.15.1 + aom/dav1d, but a build with a different
    default encoder (rav1e/SvtAv1) or different default params need not
    preserve it (r10 advice). Gating oracle registration on this probe
    instead of plugin PRESENCE (avif_available) means such a build
    degrades to "query unregistered" instead of a hash-red oracle row.
    Probed once per format per process (~10 ms); any failure — inexact
    pixels, wrong dims, or an exception — reads as inexact.
    """
    if fmt in _ROUNDTRIP_EXACT:
        return _ROUNDTRIP_EXACT[fmt]
    ok = False
    if _format_available(fmt):
        try:
            w, h, v = 8, 6, 128
            px = bytes([v]) * (w * h * 3)
            img = decode_heif(_encode(fmt, px, w, h, quality=100))
            ok = (img.width, img.height, img.channels) == (w, h, 3) \
                and img.pixels == px
        except Exception:
            ok = False
    _ROUNDTRIP_EXACT[fmt] = ok
    return ok


def avif_oracle_exact() -> bool:
    """avif_available() AND the solid round trip measured bit-exact —
    the registration gate for avif_image_stats' closed-form oracle."""
    return format_roundtrip_exact(COMPRESSION_AV1)


def _require() -> ctypes.CDLL:
    lib = _load()
    if lib is None:
        raise NotImplementedError(
            "HEIF-family codecs (AVIF/HEIC) need libheif, which this "
            f"environment does not provide ({_LOAD_ERR})")
    return lib


def is_heif(content: bytes) -> bool:
    """ISO-BMFF ftyp sniff for a HEIF still-image brand. Distinguishes
    AVIF/HEIC payloads from video mp4 (brand isom/mp42), which routes to
    the container demux instead of the image decoder."""
    return (len(content) >= 12 and content[4:8] == b"ftyp"
            and content[8:12] in HEIF_BRANDS)


@dataclass(frozen=True)
class HeifImage:
    """Same shape as PngImage/JpegImage — decode_image's dispatch builds
    its feature dict from these attributes."""
    width: int
    height: int
    bit_depth: int
    channels: int
    pixels: bytes  # row-major, channels interleaved

    def mean_pixel(self) -> float:
        if not self.pixels:
            return 0.0
        return sum(self.pixels) / len(self.pixels)


def _decode_handle(lib: ctypes.CDLL, handle: c_void_p) -> HeifImage:
    """Decode one image handle to interleaved 8-bit RGB(A)."""
    alpha = bool(lib.heif_image_handle_has_alpha_channel(handle))
    chroma = (_CHROMA_INTERLEAVED_RGBA if alpha
              else _CHROMA_INTERLEAVED_RGB)
    img = c_void_p()
    _check(lib.heif_decode_image(handle, byref(img), _COLORSPACE_RGB,
                                 chroma, None), "decode_image")
    try:
        w = lib.heif_image_handle_get_width(handle)
        h = lib.heif_image_handle_get_height(handle)
        nch = 4 if alpha else 3
        stride = c_int(0)
        plane = lib.heif_image_get_plane_readonly(
            img, _CHANNEL_INTERLEAVED, byref(stride))
        if not plane:
            raise ValueError("libheif returned no interleaved plane")
        base = ctypes.addressof(plane.contents)
        pixels = b"".join(
            string_at(base + r * stride.value, w * nch)
            for r in range(h))
    finally:
        lib.heif_image_release(img)
    return HeifImage(width=w, height=h, bit_depth=8, channels=nch,
                     pixels=pixels)


def _read_context(lib: ctypes.CDLL, content: bytes):
    """Parse `content` (bytes) into a heif_context. The caller must keep
    the RETURNED BYTES OBJECT alive as long as the context (without_copy
    semantics) — ctypes passes the bytes' internal buffer straight to
    libheif, no Python-side copy."""
    ctx = lib.heif_context_alloc()
    if not ctx:
        raise MemoryError("heif_context_alloc returned NULL")
    try:
        _check(lib.heif_context_read_from_memory_without_copy(
            ctx, content, len(content), None), "read_from_memory",
            unsupported_filetype=_unsupported_filetype_class(content))
    except Exception:
        # _check raises ValueError OR NotImplementedError (unsupported
        # format); either way the native context must not leak — a
        # long-lived executor decoding a mixed corpus would otherwise
        # grow unbounded native memory invisible to the Python GC
        lib.heif_context_free(ctx)
        raise
    return ctx, content


def decode_heif(content: bytes) -> HeifImage:
    """Decode an AVIF or HEIC payload's PRIMARY image."""
    lib = _require()
    ctx, _buf = _read_context(lib, bytes(content))
    try:
        handle = c_void_p()
        _check(lib.heif_context_get_primary_image_handle(
            ctx, byref(handle)), "get_primary_image_handle")
        try:
            return _decode_handle(lib, handle)
        finally:
            lib.heif_image_handle_release(handle)
    finally:
        lib.heif_context_free(ctx)


def decode_heif_all(content: bytes) -> list[HeifImage]:
    """Decode EVERY top-level image of a multi-image HEIF (HEIC burst /
    multi-frame AVIF still file) in the container's ID order — the
    gif_frame_stats analogue for the HEIF family. Single-image payloads
    return a one-element list whose member equals decode_heif's."""
    lib = _require()
    ctx, _buf = _read_context(lib, bytes(content))
    try:
        n = lib.heif_context_get_number_of_top_level_images(ctx)
        if n <= 0:
            raise ValueError("HEIF payload lists no top-level images")
        ids = (ctypes.c_uint32 * n)()
        got = lib.heif_context_get_list_of_top_level_image_IDs(ctx, ids, n)
        out: list[HeifImage] = []
        for i in range(min(n, got)):
            handle = c_void_p()
            _check(lib.heif_context_get_image_handle(ctx, ids[i],
                                                     byref(handle)),
                   "get_image_handle")
            try:
                out.append(_decode_handle(lib, handle))
            finally:
                lib.heif_image_handle_release(handle)
        return out
    finally:
        lib.heif_context_free(ctx)


def _make_image(lib: ctypes.CDLL, pixels: bytes, width: int, height: int,
                channels: int) -> c_void_p:
    if channels not in (3, 4):
        raise ValueError("channels must be 3 (RGB) or 4 (RGBA)")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixels must be width*height*{channels} interleaved bytes")
    chroma = (_CHROMA_INTERLEAVED_RGBA if channels == 4
              else _CHROMA_INTERLEAVED_RGB)
    img = c_void_p()
    _check(lib.heif_image_create(width, height, _COLORSPACE_RGB,
                                 chroma, byref(img)),
           "image_create")
    try:
        _check(lib.heif_image_add_plane(img, _CHANNEL_INTERLEAVED, width,
                                        height, 8), "add_plane")
        stride = c_int(0)
        plane = lib.heif_image_get_plane(img, _CHANNEL_INTERLEAVED,
                                         byref(stride))
        if not plane:
            raise ValueError("libheif returned no writable plane")
        base = ctypes.addressof(plane.contents)
        row_bytes = width * channels
        for r in range(height):
            ctypes.memmove(base + r * stride.value,
                           pixels[r * row_bytes:(r + 1) * row_bytes],
                           row_bytes)
    except Exception:
        lib.heif_image_release(img)
        raise
    return img


def _write_context(lib: ctypes.CDLL, ctx: c_void_p) -> bytes:
    # ctypes callbacks cannot return heif_error by value, so the
    # heif_writer memory sink is unusable; a worker-local tempfile
    # is the portable byte path (see module docstring)
    fd, path = tempfile.mkstemp(suffix=".heif")
    os.close(fd)
    try:
        _check(lib.heif_context_write_to_file(ctx, path.encode()),
               "write_to_file")
        with open(path, "rb") as fh:
            return fh.read()
    finally:
        os.unlink(path)


def _encode_frames(fmt: int, frames: list[tuple[bytes, int, int]],
                   quality: int, channels: int = 3) -> bytes:
    """Encode one or more (pixels, width, height) frames as top-level
    images of a single HEIF file (one = ordinary still; several = a
    burst/multi-image file, the HEIF shape camera bursts ship in)."""
    lib = _require()
    if not lib.heif_have_encoder_for_format(fmt):
        raise NotImplementedError(
            "this libheif build has no encoder plugin for format "
            f"{fmt} (AV1 needs aom/rav1e/SvtAv1, HEVC needs x265)")
    if not frames:
        raise ValueError("at least one frame is required")
    ctx = lib.heif_context_alloc()
    if not ctx:
        raise MemoryError("heif_context_alloc returned NULL")
    try:
        enc = c_void_p()
        _check(lib.heif_context_get_encoder_for_format(
            ctx, fmt, byref(enc)), "get_encoder_for_format")
        try:
            _check(lib.heif_encoder_set_lossy_quality(enc, quality),
                   "set_lossy_quality")
            for pixels, width, height in frames:
                img = _make_image(lib, pixels, width, height, channels)
                try:
                    _check(lib.heif_context_encode_image(
                        ctx, img, enc, None, None), "encode_image")
                finally:
                    lib.heif_image_release(img)
        finally:
            lib.heif_encoder_release(enc)
        return _write_context(lib, ctx)
    finally:
        lib.heif_context_free(ctx)


def _encode(fmt: int, pixels: bytes, width: int, height: int,
            quality: int, channels: int = 3) -> bytes:
    return _encode_frames(fmt, [(pixels, width, height)], quality, channels)


def avif_encode_burst(frames: list[tuple[bytes, int, int]],
                      quality: int = 100) -> bytes:
    """Multi-image AVIF: every frame a top-level image in one file."""
    return _encode_frames(COMPRESSION_AV1, frames, quality)


def avif_encode_rgb(pixels: bytes, width: int, height: int,
                    quality: int = 100) -> bytes:
    """Real AV1 still image in a HEIF container (ftyp brand `avif`)."""
    return _encode(COMPRESSION_AV1, pixels, width, height, quality)


def avif_encode_rgba(pixels: bytes, width: int, height: int,
                     quality: int = 100) -> bytes:
    """AV1 + alpha auxiliary image — exercises the alpha decode branch."""
    return _encode(COMPRESSION_AV1, pixels, width, height, quality,
                   channels=4)


def heic_encode_rgb(pixels: bytes, width: int, height: int,
                    quality: int = 100) -> bytes:
    """Real HEVC still image in a HEIF container (ftyp brand `heic`)."""
    return _encode(COMPRESSION_HEVC, pixels, width, height, quality)
