"""Minimal pure-stdlib PNG codec (zlib inflate + scanline unfilter).

Closes the "codec is a stub" gap for one real format without adding any
dependency: struct + zlib + binascii are enough for 8-bit PNGs
(gray / RGB / RGBA; sequential AND Adam7-interlaced since r11), which
covers the fixture and synthetic-media paths this engine tests. The encoder exists so tests and queries can
fabricate valid PNGs deterministically (the container has no imaging
library to make fixtures with); it can apply any of the five PNG filter
types per row, which makes round-trip tests exercise every unfilter
branch of the decoder.

Format reference: the public PNG specification (RFC 2083) — signature,
chunk layout (length, type, data, CRC32), IHDR fields, IDAT zlib stream,
per-scanline filter byte, filters 0-4 (None, Sub, Up, Average, Paeth).

Scale note: these functions only ever run inside Arrow-batched
mapInPandas (multimodal/binary.py) on one payload at a time; images in
this harness are tiny synthetic fixtures, so the per-pixel Python loops
in the sequential filters are acceptable. A production deployment swaps
in a native decoder behind the same signatures.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel IN THE SCANLINES (palette images
# carry one index per pixel on the wire; decode expands to RGB)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


@dataclass(frozen=True)
class PngImage:
    width: int
    height: int
    bit_depth: int
    color_type: int
    channels: int
    pixels: bytes  # unfiltered scanlines, row-major, channels interleaved

    def mean_pixel(self) -> float:
        """Mean over every sample (all channels pooled)."""
        if not self.pixels:
            return 0.0
        return sum(self.pixels) / len(self.pixels)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
    return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_row(ftype: int, row: bytes, prev: bytes, bpp: int) -> bytes:
    """Apply PNG filter `ftype` to one raw scanline (encoder side)."""
    if ftype == 0:
        return row
    out = bytearray(len(row))
    for i, x in enumerate(row):
        a = row[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) // 2
        elif ftype == 4:
            pred = _paeth(a, b, c)
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[i] = (x - pred) & 0xFF
    return bytes(out)


def _unfilter_row(ftype: int, row: bytearray, prev: bytes, bpp: int) -> None:
    """Reverse PNG filter `ftype` in place (decoder side)."""
    if ftype == 0:
        return
    for i in range(len(row)):
        a = row[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) // 2
        elif ftype == 4:
            pred = _paeth(a, b, c)
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        row[i] = (row[i] + pred) & 0xFF


def encode_png(pixels: bytes, width: int, height: int, color_type: int = 2,
               filter_type: int = 0, interlace: bool = False,
               palette: bytes | None = None) -> bytes:
    """Encode raw 8-bit samples as a valid PNG.

    `pixels` is row-major interleaved samples, len == width * height *
    channels. `filter_type` applies that filter to every scanline — the
    compression is usually worse than an adaptive encoder, but the output
    is spec-valid and exercises the matching decoder branch.
    interlace=True serializes the seven Adam7 passes (r11 — decode_png
    reverses them; previously rejected loudly).

    color_type=3 (r11): `pixels` is width*height PALETTE INDICES and
    `palette` the 3*n RGB table written as the PLTE chunk — the indexed
    form small web graphics actually ship.
    """
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported color type {color_type}")
    ch = _CHANNELS[color_type]
    expected = width * height * ch
    if len(pixels) != expected:
        raise ValueError(f"pixel buffer is {len(pixels)} bytes, "
                         f"expected {expected}")
    if color_type == 3:
        if palette is None or len(palette) % 3 or not palette:
            raise ValueError("color_type=3 needs a 3*n-byte palette")
        if max(pixels) >= len(palette) // 3:
            raise ValueError("palette index out of range")
    elif palette is not None:
        raise ValueError("palette is only meaningful for color_type=3")
    if interlace:
        raw = bytearray(_encode_adam7(pixels, width, height, ch))
    else:
        stride = width * ch
        prev = bytes(stride)
        raw = bytearray()
        for y in range(height):
            row = pixels[y * stride:(y + 1) * stride]
            raw.append(filter_type)
            raw += _filter_row(filter_type, row, prev, ch)
            prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0,
                       1 if interlace else 0)
    plte = _chunk(b"PLTE", palette) if color_type == 3 else b""
    return (PNG_SIGNATURE
            + _chunk(b"IHDR", ihdr)
            + plte
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


def decode_png(data: bytes) -> PngImage:
    """Parse + inflate + unfilter an 8-bit PNG (sequential or Adam7)."""
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = None
    color_type = bit_depth = None
    idat = bytearray()
    plte = b""
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated PNG chunk header")
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk body")
        (crc,) = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if bit_depth != 8:
                raise ValueError(f"only 8-bit PNGs supported, got {bit_depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard compression/filter method")
            if interlace not in (0, 1):
                raise ValueError(f"unknown PNG interlace method {interlace}")
            adam7 = interlace == 1
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    ch = _CHANNELS[color_type]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if adam7:
        pix = _decode_adam7(raw, width, height, ch)
    else:
        if len(raw) != (stride + 1) * height:
            raise ValueError(f"IDAT decodes to {len(raw)} bytes, "
                             f"expected {(stride + 1) * height}")
        out = bytearray()
        prev = bytes(stride)
        for y in range(height):
            ftype = raw[y * (stride + 1)]
            row = bytearray(
                raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
            _unfilter_row(ftype, row, prev, ch)
            out += row
            prev = bytes(row)
        pix = bytes(out)
    if color_type == 3:
        # indexed color (r11): expand through the PLTE table to RGB —
        # the same palette-mapped feature view the GIF decoder gives
        # (tRNS transparency is ignored, like GIF's; documented)
        if not plte or len(plte) % 3:
            raise ValueError("palette PNG missing a valid PLTE chunk")
        lut = [plte[3 * i:3 * i + 3] for i in range(len(plte) // 3)]
        try:
            pix = b"".join(lut[i] for i in pix)
        except IndexError:
            raise ValueError("PNG palette index out of range") from None
        return PngImage(width=width, height=height, bit_depth=8,
                        color_type=3, channels=3, pixels=pix)
    return PngImage(width=width, height=height, bit_depth=8,
                    color_type=color_type, channels=ch, pixels=pix)


# Adam7 (PNG spec §8.2): seven sub-images, each independently filtered —
# (x start, x step, y start, y step) per pass; empty passes (a dimension
# smaller than the pass offset) contribute no scanlines at all.
_ADAM7 = ((0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
          (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2))


def _decode_adam7(raw: bytes, width: int, height: int, ch: int) -> bytes:
    out = bytearray(width * height * ch)
    pos = 0
    for x0, xs, y0, ys in _ADAM7:
        pw = (width - x0 + xs - 1) // xs
        ph = (height - y0 + ys - 1) // ys
        if pw <= 0 or ph <= 0:
            continue
        stride = pw * ch
        prev = bytes(stride)
        for j in range(ph):
            if pos + 1 + stride > len(raw):
                raise ValueError("IDAT too short for the Adam7 passes")
            ftype = raw[pos]
            row = bytearray(raw[pos + 1:pos + 1 + stride])
            pos += 1 + stride
            _unfilter_row(ftype, row, prev, ch)
            prev = bytes(row)
            y = y0 + j * ys
            base = y * width * ch
            for i in range(pw):
                off = base + (x0 + i * xs) * ch
                out[off:off + ch] = row[i * ch:(i + 1) * ch]
    if pos != len(raw):
        raise ValueError("IDAT length does not match the Adam7 passes")
    return bytes(out)


def _encode_adam7(pixels: bytes, width: int, height: int, ch: int) -> bytes:
    """Pass-serialized scanlines (filter 0 per row — valid PNG; the
    encoder's job here is a correct round-trip/witness partner, not
    ratio)."""
    raw = bytearray()
    for x0, xs, y0, ys in _ADAM7:
        pw = (width - x0 + xs - 1) // xs
        ph = (height - y0 + ys - 1) // ys
        if pw <= 0 or ph <= 0:
            continue
        for j in range(ph):
            y = y0 + j * ys
            raw.append(0)
            base = y * width * ch
            for i in range(pw):
                off = base + (x0 + i * xs) * ch
                raw += pixels[off:off + ch]
    return bytes(raw)
