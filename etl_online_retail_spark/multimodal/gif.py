"""Stdlib-only GIF codec (GIF89a): LZW decode/encode, multi-frame.

Third REAL image codec beside multimodal/png.py (zlib+unfilter) and
multimodal/jpeg.py (Huffman+DCT), and the first ANIMATED one — a GIF's
frame sequence gives the media pipeline a second video-shaped payload
(beside MJPEG) whose frame sampling exercises true container structure,
not byte scanning. Pure stdlib: the only non-trivial machinery is GIF's
variable-width LSB-first LZW, implemented from the specification
(GIF89a, CompuServe 1990) below.

Scope (documented line in the sand, like the other codecs): 87a/89a,
global and local color tables, multiple image descriptors (animation),
extension blocks skipped (graphic-control delays surfaced per frame).
Interlaced images deinterlace for real (r11 — the appendix-E four-pass
row order; previously rejected loudly).

Encoder exists to render deterministic fixtures the oracle can verify in
closed form (the synthetic_png_media pattern) — it always writes a
256-entry grayscale global table; interlace=True writes pass-ordered
rows with the descriptor flag, giving the decoder's deinterlace a
round-trip partner (and giflib a compliance view of the same streams).

LZW convention notes (the classic off-by-one pair, derived in lockstep):
the encoder grows its code width after defining entry 2^width (next_code
reaches (1 << code_size) + 1), the decoder after defining entry
2^width - 1 (next_code reaches 1 << code_size) — one apart because the
decoder's table trails the encoder's by exactly one entry. Both stop
growing the table at 4096 (no clear-code resets emitted; a full table
keeps coding with the frozen dictionary, which real decoders accept).
"""

from __future__ import annotations

from dataclasses import dataclass

GIF_MAGICS = (b"GIF87a", b"GIF89a")

_MAX_CODE = 4096          # 12-bit cap, per spec
_MIN_CODE_SIZE = 8        # we always code over a 256-entry palette


# ---------------------------------------------------------------------------
# LZW bitstream

def lzw_encode(data: bytes, min_code_size: int = _MIN_CODE_SIZE) -> bytes:
    """GIF-flavor LZW: variable 9..12-bit codes, LSB-first packing."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    code_size = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        if next_code < _MAX_CODE:
            table[wc] = next_code
            next_code += 1
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        w = bytes([ch])
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes, min_code_size: int = _MIN_CODE_SIZE) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    next_code = eoi + 1
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while True:
        while nbits < code_size:
            if pos >= len(data):
                return bytes(out)  # tolerate missing explicit EOI
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            code_size = min_code_size + 1
            del table[eoi + 1:]
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= clear:
                raise ValueError(
                    f"corrupt LZW stream: first code after clear must be "
                    f"a literal, got {code}")
            entry = table[code]
        elif code < next_code:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"corrupt LZW stream: code {code} > {next_code}")
        out += entry
        if prev is not None and next_code < _MAX_CODE:
            table.append(prev + entry[:1])
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    raise AssertionError("unreachable")


# ---------------------------------------------------------------------------
# container

@dataclass
class GifFrame:
    width: int
    height: int
    indices: bytes                        # width*height palette indices
    palette: bytes                        # 3*n_colors RGB bytes
    delay_cs: int = 0                     # centiseconds, from the GCE

    @property
    def channels(self) -> int:
        return 3

    @property
    def bit_depth(self) -> int:
        return 8

    def mean_pixel(self) -> float:
        """Mean over every RGB sample (the image_features convention)."""
        if not self.indices:
            return 0.0
        pal = self.palette
        total = sum(pal[3 * i] + pal[3 * i + 1] + pal[3 * i + 2]
                    for i in self.indices)
        return total / (3.0 * len(self.indices))


@dataclass
class GifImage:
    width: int                            # logical screen
    height: int
    frames: list[GifFrame]


def _u16(b: bytes, off: int) -> int:
    if off + 2 > len(b):
        raise ValueError("truncated GIF header field")
    return b[off] | (b[off + 1] << 8)


def decode_gif(data: bytes) -> GifImage:
    data = bytes(data)
    if data[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF payload")
    if len(data) < 13:
        raise ValueError("truncated GIF logical screen descriptor")
    sw, sh = _u16(data, 6), _u16(data, 8)
    packed = data[10]
    pos = 13
    gct = b""
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = data[pos:pos + 3 * n]
        pos += 3 * n

    frames: list[GifFrame] = []
    delay_cs = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:                 # trailer
            break
        if block == 0x21:                 # extension: label + sub-blocks
            if pos >= len(data):
                raise ValueError("truncated GIF extension block")
            label = data[pos]
            pos += 1
            sub_start = pos
            while pos < len(data) and data[pos] != 0:
                pos += data[pos] + 1
            if pos >= len(data):
                raise ValueError("truncated GIF extension block")
            if label == 0xF9 and data[sub_start] >= 3:
                delay_cs = _u16(data, sub_start + 2)
            pos += 1                      # block terminator
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        if pos + 9 > len(data):
            raise ValueError("truncated GIF image descriptor")
        fw, fh = _u16(data, pos + 4), _u16(data, pos + 6)
        fpacked = data[pos + 8]
        pos += 9
        interlaced = bool(fpacked & 0x40)
        palette = gct
        if fpacked & 0x80:                # local color table
            n = 2 << (fpacked & 0x07)
            palette = data[pos:pos + 3 * n]
            pos += 3 * n
        if not palette:
            raise ValueError("GIF frame without any color table")
        if pos >= len(data):
            raise ValueError("truncated GIF image data")
        min_code_size = data[pos]
        pos += 1
        lzw = bytearray()
        while pos < len(data) and data[pos] != 0:
            ln = data[pos]
            if pos + 1 + ln > len(data):
                raise ValueError("truncated GIF image data")
            lzw += data[pos + 1:pos + 1 + ln]
            pos += ln + 1
        if pos >= len(data):
            raise ValueError("truncated GIF image data")
        pos += 1                          # sub-block terminator
        indices = lzw_decode(bytes(lzw), min_code_size)[:fw * fh]
        if len(indices) < fw * fh:
            raise ValueError("truncated GIF image data")
        if interlaced:
            indices = _deinterlace(indices, fw, fh)
        frames.append(GifFrame(fw, fh, indices, palette, delay_cs))
        delay_cs = 0
    if not frames:
        raise ValueError("GIF with no image data")
    return GifImage(sw, sh, frames)


def _interlace_order(height: int) -> list[int]:
    """GIF89a appendix E interlace: rows are stored in four passes —
    every 8th row from 0, every 8th from 4, every 4th from 2, every
    2nd from 1. Returns storage order -> actual row index."""
    order: list[int] = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, height, step))
    return order


def _deinterlace(indices: bytes, width: int, height: int) -> bytes:
    out = bytearray(width * height)
    for stored, actual in enumerate(_interlace_order(height)):
        out[actual * width:(actual + 1) * width] = \
            indices[stored * width:(stored + 1) * width]
    return bytes(out)


def _interlace(indices: bytes, width: int, height: int) -> bytes:
    out = bytearray(width * height)
    for stored, actual in enumerate(_interlace_order(height)):
        out[stored * width:(stored + 1) * width] = \
            indices[actual * width:(actual + 1) * width]
    return bytes(out)


GRAYSCALE_PALETTE = bytes(v for i in range(256) for v in (i, i, i))


def encode_gif(frames: list[bytes], width: int, height: int,
               palette: bytes = GRAYSCALE_PALETTE,
               delay_cs: int = 10, interlace: bool = False) -> bytes:
    """GIF89a with a 256-entry global table; each element of `frames` is
    width*height palette indices. Multi-frame inputs get per-frame
    graphic-control extensions (animation). interlace=True stores rows
    in the appendix-E four-pass order with the descriptor flag set
    (r11 — decode_gif reverses it; previously rejected loudly)."""
    if len(palette) != 256 * 3:
        raise ValueError("encoder expects a 256-entry palette")
    out = bytearray(b"GIF89a")
    out += bytes((width & 0xFF, width >> 8, height & 0xFF, height >> 8,
                  0xF7, 0, 0))            # GCT present, 8-bit, 256 entries
    out += palette
    for idx in frames:
        if len(idx) != width * height:
            raise ValueError("frame size mismatch")
        if len(frames) > 1:
            out += bytes((0x21, 0xF9, 4, 0,
                          delay_cs & 0xFF, delay_cs >> 8, 0, 0))
        out += bytes((0x2C, 0, 0, 0, 0,
                      width & 0xFF, width >> 8,
                      height & 0xFF, height >> 8,
                      0x40 if interlace else 0))
        out.append(_MIN_CODE_SIZE)
        lzw = lzw_encode(_interlace(idx, width, height)
                         if interlace else idx)
        for off in range(0, len(lzw), 255):
            chunk = lzw[off:off + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
