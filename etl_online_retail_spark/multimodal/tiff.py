"""Baseline TIFF 6.0 codec (pure stdlib) — the scanned-document format.

TIFF is the one raster format a document-scan corpus ships that the
multimodal surface did not yet decode. This implements the baseline
RGB/grayscale profile from the PUBLIC TIFF 6.0 specification (Adobe,
1992): header + first IFD walk under either byte order ("II" little /
"MM" big endian), 8-bit samples, chunky planar configuration, single or
multi strip, Compression values 1 (none), 5 (TIFF-LZW) and 32773
(PackBits RLE — the fax/scan pipeline staple), and Predictor 2
(horizontal differencing, §14 — the companion that makes LZW bite on
photographic data; real LZW TIFFs ship with it).

The LZW variant is TIFF's own (spec §13), NOT the GIF one the repo
already ships (multimodal/gif.py): codes pack MSB-first (GIF packs
LSB-first), symbols are always 8-bit with Clear=256 / EOI=257, code
width grows 9→12 bits with the spec's EarlyChange convention (the
width bumps one code EARLY — when the next table index reaches
2^width - 1, not 2^width), and the table resets via an explicit Clear
once index 4094 is reached. Encoder and decoder both live here and are
round-trip + reset-path tested (tests/test_multimodal.py).

Feature surface matches the other codecs (PngImage shape): width,
height, channels, bit_depth, pixels (row-major, top-down, interleaved),
mean_pixel().
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

CLEAR = 256
EOI = 257
FIRST = 258
MAX_CODE = 4094  # spec: emit Clear when the next index would be 4094

_INVERT_TABLE = bytes(255 - i for i in range(256))


@dataclass
class TiffImage:
    width: int
    height: int
    bit_depth: int
    channels: int
    pixels: bytes  # row-major top-down, channels interleaved

    def mean_pixel(self) -> float:
        if not self.pixels:
            return 0.0
        return sum(self.pixels) / len(self.pixels)


# ---------------------------------------------------------------------------
# TIFF-LZW (spec §13): MSB-first variable-width codes with EarlyChange


def lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((bitbuf >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = FIRST
    width = 9
    put(CLEAR, width)
    omega = b""
    for byte in data:
        k = bytes([byte])
        if omega + k in table:
            omega += k
            continue
        put(table[omega], width)
        table[omega + k] = next_code
        next_code += 1
        omega = k
        # spec §13 width rule: the COMPRESSOR bumps when the code value
        # it just ADDED is 511/1023/2047 (added value = next_code - 1,
        # so the test reads next_code == 2^width); the DECOMPRESSOR
        # bumps one value earlier (510/1022/2046) because its table
        # runs one entry behind — see lzw_decode. At 4094 the table
        # resets via an explicit Clear (12-bit codes until then).
        if next_code == MAX_CODE:
            put(table[omega], width)
            put(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = FIRST
            width = 9
            omega = b""
        elif next_code == (1 << width) and width < 12:
            width += 1
    if omega:
        put(table[omega], width)
        # the decoder ADDS an entry for this final code (value
        # next_code - 1) and applies its 510/1022/2046 rule before
        # reading EOI — mirror that bump so EOI lands at the width the
        # decoder will read it with
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
    put(EOI, width)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes) -> bytes:
    out = bytearray()
    pos = 0  # bit position

    def get(width: int) -> int:
        nonlocal pos
        end = pos + width
        if end > len(data) * 8:
            return EOI  # truncated stream: stop cleanly
        code = 0
        p = pos
        while p < end:
            byte = data[p >> 3]
            take = min(8 - (p & 7), end - p)
            shift = 8 - (p & 7) - take
            code = (code << take) | ((byte >> shift) & ((1 << take) - 1))
            p += take
        pos = end
        return code

    table: list[bytes] = []

    def reset() -> None:
        nonlocal table
        table = [bytes([i]) for i in range(256)] + [b"", b""]

    reset()
    width = 9
    old: bytes | None = None
    while True:
        code = get(width)
        if code == EOI:
            break
        if code == CLEAR:
            reset()
            width = 9
            code = get(width)
            if code == EOI:
                break
            if code >= len(table):
                raise ValueError("TIFF-LZW: bad code after Clear")
            out += table[code]
            old = table[code]
            continue
        if old is None:
            raise ValueError("TIFF-LZW: stream must start with Clear")
        if code < len(table):
            entry = table[code]
            table.append(old + entry[:1])
        elif code == len(table):
            entry = old + old[:1]
            table.append(entry)
        else:
            raise ValueError(f"TIFF-LZW: code {code} beyond table")
        out += entry
        old = entry
        # EarlyChange on the decode side: grow when the NEXT entry to
        # be created would need the wider code
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
    return bytes(out)


# ---------------------------------------------------------------------------
# container


def packbits_encode(data: bytes) -> bytes:
    """Apple PackBits RLE (TIFF 6.0 §9): runs of 2-128 equal bytes as
    (257-n, byte); literal spans of 1-128 as (n-1, bytes).

    Token policy: a run of >= 2 at a token start is emitted as a run;
    2-runs INSIDE a literal stay literal (a run token would not be
    cheaper) except a trailing 2-run at the buffer end. The walk is per
    equal-RUN, not per byte (r12): numpy finds every run boundary in one
    diff pass, so the Python loop's iteration count is the number of
    runs — for scanned-document content (long flat spans) that is a
    small fraction of the byte count; for incompressible content it
    degrades to the old per-byte cost, no worse. Token-for-token
    identical to the per-byte walk (fuzz-asserted in
    tests/test_multimodal.py)."""
    n = len(data)
    if n == 0:
        return b""
    import numpy as np

    arr = np.frombuffer(data, dtype=np.uint8)
    # starts[k] = first index of run k; rlen[k] = its length
    starts = np.concatenate(
        ([0], np.flatnonzero(np.diff(arr)) + 1)).astype(np.int64)
    rlen = np.diff(np.concatenate((starts, [n])))
    starts_l = starts.tolist()
    rlen_l = rlen.tolist()
    n_runs = len(starts_l)

    out = bytearray()
    k = 0           # current run index
    used = 0        # bytes of run k already consumed
    while k < n_runs:
        i = starts_l[k] + used
        rem = rlen_l[k] - used
        take = min(rem, 128)
        if take >= 2:
            out.append(257 - take)
            out.append(data[i])
            used += take
            if used == rlen_l[k]:
                k += 1
                used = 0
            continue
        # literal span: swallow whole 1/2-runs until a >=3 run, a
        # trailing 2-run at the buffer end, or the 128-byte cap (which
        # may split a 2-run — the leftover byte seeds the next token)
        start = i
        k += 1
        used = 0
        while k < n_runs and i + rem - start < 128:
            nxt = rlen_l[k]
            if nxt >= 3 or (nxt == 2 and starts_l[k] + 2 >= n):
                break
            room = 128 - (i + rem - start)
            if nxt > room:
                used = room
                rem += room
                break
            rem += nxt
            k += 1
        else:
            # cap landed exactly on a run boundary, or data exhausted
            pass
        end = min(start + 128, i + rem)
        out.append(end - start - 1)
        out += data[start:end]
    return bytes(out)


def packbits_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        h = data[i]
        i += 1
        if h < 128:                      # literal of h+1 bytes
            if i + h + 1 > len(data):
                raise ValueError("truncated PackBits literal")
            out += data[i:i + h + 1]
            i += h + 1
        elif h > 128:                    # run of 257-h copies
            if i >= len(data):
                raise ValueError("truncated PackBits run")
            out += bytes([data[i]]) * (257 - h)
            i += 1
        # h == 128: no-op, per spec
    return bytes(out)


def _predict2_encode(pixels: bytes, width: int, height: int,
                     channels: int) -> bytes:
    """Horizontal differencing (TIFF 6.0 §14, Predictor=2): each sample
    minus its left neighbor in the same channel — what makes LZW bite
    on photographic data, and how real LZW TIFFs ship. One vectorized
    mod-256 subtraction over the (rows, cols, channels) cube (r12 —
    uint8 arithmetic wraps exactly like the spec's & 0xFF; was a
    per-byte Python loop that capped the LZW+predictor path at
    ~2 Mpx/s/core)."""
    import numpy as np

    cube = (np.frombuffer(pixels, dtype=np.uint8)
            .reshape(height, width, channels))
    out = cube.copy()
    out[:, 1:, :] -= cube[:, :-1, :]
    return out.tobytes()


def _predict2_decode(diff: bytes, width: int, height: int,
                     channels: int) -> bytes:
    """Inverse of horizontal differencing: a running mod-256 sum along
    each row per channel — one uint8 cumsum (accumulating IN uint8
    wraps mod 256, which is the exact inverse of the encoder's wrapped
    subtraction)."""
    import numpy as np

    cube = (np.frombuffer(diff, dtype=np.uint8)
            .reshape(height, width, channels))
    return np.cumsum(cube, axis=1, dtype=np.uint8).tobytes()


def encode_tiff(pixels: bytes, width: int, height: int, channels: int = 3,
                compression: str = "lzw", predictor: int = 1) -> bytes:
    """One-strip chunky little-endian ("II") baseline TIFF.

    compression: "none" (1), "lzw" (5) or "packbits" (32773);
    predictor 2 (horizontal differencing) composes with lzw — the
    combination real LZW TIFFs ship."""
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match dimensions")
    if predictor not in (1, 2):
        raise ValueError("predictor must be 1 (none) or 2 (horizontal)")
    comp = {"none": 1, "lzw": 5, "packbits": 32773}[compression]
    payload = (_predict2_encode(pixels, width, height, channels)
               if predictor == 2 else pixels)
    if comp == 1:
        strip = payload
    elif comp == 5:
        strip = lzw_encode(payload)
    else:
        strip = packbits_encode(payload)
    photometric = 2 if channels >= 3 else 1

    # layout: header(8) | IFD | BitsPerSample values | strip
    base_tags = [
        (256, 3, 1, width),            # ImageWidth
        (257, 3, 1, height),           # ImageLength
        (259, 3, 1, comp),             # Compression
        (262, 3, 1, photometric),      # PhotometricInterpretation
        (277, 3, 1, channels),         # SamplesPerPixel
        (278, 3, 1, height),           # RowsPerStrip (single strip)
        (279, 4, 1, len(strip)),       # StripByteCounts
    ]
    if predictor == 2:
        base_tags.append((317, 3, 1, 2))   # Predictor
    n_tags = len(base_tags) + 2            # + BitsPerSample, StripOffsets
    ifd_size = 2 + n_tags * 12 + 4
    bits_off = 8 + ifd_size
    bits_extra = 2 * channels if channels > 2 else 0
    strip_off = bits_off + bits_extra
    # BitsPerSample inline rules: one SHORT fits the value field as-is;
    # TWO SHORTs pack side by side ("<HH", 8, 8 == the LONG 0x00080008
    # little-endian — the count==1 fallback wrote [8, 0] for gray+alpha,
    # an invalid file; r11 review find); more than two go via offset.
    if channels == 1:
        bps_val = 8
    elif channels == 2:
        bps_val = 0x0008_0008
    else:
        bps_val = bits_off
    tags = sorted(base_tags + [
        (258, 3, channels, bps_val),
        (273, 4, 1, strip_off),        # StripOffsets
    ])
    out = bytearray()
    out += b"II" + struct.pack("<HI", 42, 8)
    out += struct.pack("<H", n_tags)
    for tag, typ, count, val in tags:
        out += struct.pack("<HHI", tag, typ, count)
        if typ == 3 and count == 1:
            out += struct.pack("<HH", val, 0)  # SHORT packs low bytes
        else:
            out += struct.pack("<I", val)
    out += struct.pack("<I", 0)  # next IFD
    if channels > 2:
        out += struct.pack(f"<{channels}H", *([8] * channels))
    out += strip
    return bytes(out)


def decode_tiff(data: bytes) -> TiffImage:
    if data[:4] == b"II*\x00":
        e = "<"
    elif data[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF payload")

    def u16(off: int) -> int:
        try:
            return struct.unpack_from(e + "H", data, off)[0]
        except struct.error:
            raise ValueError("truncated or corrupt TIFF") from None

    def u32(off: int) -> int:
        try:
            return struct.unpack_from(e + "I", data, off)[0]
        except struct.error:
            raise ValueError("truncated or corrupt TIFF") from None

    ifd = u32(4)
    n = u16(ifd)
    tags: dict[int, tuple[int, int, int]] = {}
    for i in range(n):
        off = ifd + 2 + i * 12
        tag, typ, count = u16(off), u16(off + 2), u32(off + 4)
        tags[tag] = (typ, count, off + 8)

    def values(tag: int, default: list[int] | None = None) -> list[int]:
        if tag not in tags:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        typ, count, voff = tags[tag]
        if typ not in (3, 4):
            raise ValueError(
                f"TIFF tag {tag} has unsupported field type {typ}")
        size = {3: 2, 4: 4}[typ]
        read = u16 if typ == 3 else u32
        if size * count > 4:
            voff = u32(voff)
        return [read(voff + i * size) for i in range(count)]

    width = values(256)[0]
    height = values(257)[0]
    # adversarial-header guard: dimensions drive the output allocation,
    # so refuse absurd claims before touching pixel data (the fixture
    # ceiling is generous; a real decoder pool sizes this to its
    # per-payload memory budget)
    if not (0 < width <= (1 << 20) and 0 < height <= (1 << 20)) or \
            width * height > (1 << 26):
        raise ValueError(f"implausible TIFF dimensions {width}x{height}")
    channels = values(277, [1])[0]
    bits = values(258, [8] * channels)
    if set(bits) != {8}:
        raise NotImplementedError("only 8-bit TIFF samples supported")
    comp = values(259, [1])[0]
    if values(284, [1])[0] != 1:
        raise NotImplementedError("only chunky planar TIFF supported")
    offsets = values(273)
    counts = values(279)
    if comp == 1:
        pixels = b"".join(data[o:o + c] for o, c in zip(offsets, counts))
    elif comp == 5:
        # per spec LZW applies per strip; decode each strip separately
        pixels = b"".join(
            lzw_decode(data[o:o + c]) for o, c in zip(offsets, counts))
    elif comp == 32773:
        pixels = b"".join(
            packbits_decode(data[o:o + c]) for o, c in zip(offsets, counts))
    else:
        raise NotImplementedError(f"TIFF compression {comp} not supported")
    want = width * height * channels
    if len(pixels) < want:
        raise ValueError("TIFF strip data shorter than image")
    pixels = pixels[:want]
    pred = values(317, [1])[0]
    if pred == 2:
        # horizontal differencing is row-local, so undoing it over the
        # assembled image is strip-layout-independent
        pixels = _predict2_decode(pixels, width, height, channels)
    elif pred != 1:
        raise NotImplementedError(f"TIFF predictor {pred} not supported")
    photo = values(262, [1])[0]
    if photo == 0:
        # WhiteIsZero (the fax/scan default for bilevel-descended
        # grayscale): 0 means WHITE, so intensity is the complement —
        # decoding it as-is would serve silently inverted features
        # (r11 review find). Inverting IS the correct decode; translate
        # runs the complement as one C table lookup instead of a
        # per-byte generator.
        pixels = pixels.translate(_INVERT_TABLE)
    elif photo not in (1, 2):
        raise NotImplementedError(
            f"TIFF photometric {photo} not supported (palette/CMYK/"
            f"YCbCr need their own decode paths)")
    return TiffImage(width=width, height=height, bit_depth=8,
                     channels=channels, pixels=pixels)
