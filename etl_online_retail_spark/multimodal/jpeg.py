"""Minimal pure-stdlib baseline JPEG codec (Huffman + 8x8 DCT).

Second real format for the media path (after multimodal/png.py), again
with zero dependencies: struct + math are enough for 8-bit JPEG
(ITU-T T.81) — baseline sequential (SOF0) AND progressive (SOF2, r6):
spectral selection and successive approximation per Annex G, all four
scan kinds (DC/AC x first/refinement) with end-of-band runs. The decoder
handles grayscale and YCbCr with any sampling factors <= 2 (4:4:4,
4:2:2, 4:2:0), restart markers, and the standard marker stream
(SOI/APPn/COM/DQT/SOF0/SOF2/DHT/DRI/multi-SOS/EOI); the encoders emit
spec-valid baseline and progressive streams with the Annex K tables so
tests and queries can fabricate fixtures deterministically — and because
both encoders share one quantization pipeline, decode(progressive) is
asserted pixel-identical to decode(baseline) on random images.

Format reference: the public JPEG specification (ITU-T T.81 / ISO 10918):
marker layout, zig-zag order, Annex K.1/K.2 quantization tables, Annex
K.3 typical Huffman tables, F.1/F.2 entropy coding procedures, Annex G
progressive procedures (G.1.2.1-G.1.2.3; the refinement correction-bit
buffering follows the same discipline libjpeg's encoder documents).

Determinism notes (the oracle relies on these):
  * Quantization rounds half away from zero (matches SQL ROUND), not
    banker's rounding.
  * RGB->YCbCr output is rounded to integers before the DCT, so constant
    inputs produce bit-exact constant planes.
  * For a solid-gray image with EVEN intensity v, the decoded image is
    exactly v everywhere: the only nonzero coefficient is the luma DC
    8*(v-128), quantized by 16 to (v-128)/2 with no rounding knife-edge,
    and the chroma planes are exactly 128 (see synthetic_jpeg_media).

Scale note: like png.py, this only ever runs inside Arrow-batched
mapInPandas (multimodal/binary.py) on one payload at a time; fixtures are
tiny. A production deployment swaps in libjpeg-turbo behind the same
signatures.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass

JPEG_SOI = b"\xff\xd8"

# zig-zag index i (coefficient emission order) -> natural raster index
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.1 / K.2 quantization tables, natural raster order
STD_LUMA_Q = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
STD_CHROMA_Q = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])

_COS = [[math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)]
        for x in range(8)]
_ALPHA = [1.0 / math.sqrt(2.0)] + [1.0] * 7


def _round_half_away(x: float) -> int:
    """ROUND()-compatible rounding (half away from zero, not banker's)."""
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def _rha_array(x):
    """_round_half_away over a numpy array (elementwise, same algebra)."""
    import numpy as np

    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))


def _cos_basis():
    """M[x][u] = cos((2x+1)u*pi/16) and the alpha normalizers as numpy —
    the separable-DCT basis both the batched FDCT (encode) and IDCT
    (decode) contract against (T.81 A.3.3):

        IDCT: out[y,x] = 1/4 * sum_v a_v COS[y][v] sum_u a_u c[v,u] COS[x][u]
        FDCT: out[v,u] = 1/4 * a_u a_v sum_y COS[y][v] sum_x s[y,x] COS[x][u]
    """
    import numpy as np

    cos = np.array(_COS, dtype=np.float64)          # cos[x][u]
    alpha = np.array(_ALPHA, dtype=np.float64)
    return cos, alpha


# ---------------------------------------------------------------------------
# Huffman coding (T.81 Annex C table construction, F.1.2/F.2.2 procedures)

def _huff_decode_table(bits: list[int], vals: list[int]) -> dict:
    """(code length, code) -> symbol, canonical T.81 code assignment."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict:
    """symbol -> (code, length)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over a de-stuffed entropy segment."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("ran off the end of the entropy-coded segment")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


class _BitWriter:
    """MSB-first bit writer with 0xFF byte stuffing (B.1.1.5)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        """Pad the final partial byte with 1-bits (B.1.1.5)."""
        while self.n:
            self.write(1, 1)


def _decode_symbol(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy segment")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t low-order bits to a signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    """Bit category of a signed coefficient (F.1.2.1.2)."""
    return abs(v).bit_length()


# ---------------------------------------------------------------------------
# decoder

@dataclass(frozen=True)
class JpegImage:
    width: int
    height: int
    bit_depth: int
    channels: int  # 1 = grayscale, 3 = RGB (converted from YCbCr)
    pixels: bytes  # row-major, channels interleaved

    def mean_pixel(self) -> float:
        """Mean over every sample (all channels pooled)."""
        if not self.pixels:
            return 0.0
        return sum(self.pixels) / len(self.pixels)


@dataclass
class _Component:
    cid: int
    h: int
    v: int
    tq: int       # quant table id
    td: int = 0   # DC huffman table id (from SOS)
    ta: int = 0   # AC huffman table id (from SOS)


def _split_entropy(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """De-stuff the scan into restart-delimited segments; return (segments,
    position of the terminating marker)."""
    segments: list[bytearray] = [bytearray()]
    i = pos
    while i < len(data):
        b = data[i]
        if b != 0xFF:
            segments[-1].append(b)
            i += 1
            continue
        m = data[i + 1] if i + 1 < len(data) else 0xD9
        if m == 0x00:            # stuffed 0xFF data byte
            segments[-1].append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segments.append(bytearray())
            i += 2
        else:                    # EOI or next marker: scan over
            break
    return [bytes(s) for s in segments], i


def _block_dc(br: _BitReader, coef: list[int], pred: int, dc_tab: dict,
              ah: int, al: int) -> int:
    """DC pass for one block (first when ah==0, refinement otherwise).
    Returns the new predictor (first pass only uses it)."""
    if ah == 0:
        t = _decode_symbol(br, dc_tab)
        pred += _extend(br.read_bits(t), t)
        coef[0] = pred << al
    elif br.read_bit():
        coef[0] |= 1 << al
    return pred

def _block_ac_first(br: _BitReader, coef: list[int], ss: int, se: int,
                    al: int, ac_tab: dict, eobrun: int) -> int:
    """First AC pass (G.1.2.2) over zigzag band [ss, se]; returns the
    remaining end-of-band run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_symbol(br, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r < 15:  # EOBn: run of (1<<r)+bits blocks incl. this one
                return (1 << r) - 1 + (br.read_bits(r) if r else 0)
            k += 16     # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC coefficient index overran the band")
        coef[ZIGZAG[k]] = _extend(br.read_bits(s), s) << al
        k += 1
    return 0

def _block_ac_refine(br: _BitReader, coef: list[int], ss: int, se: int,
                     al: int, ac_tab: dict, eobrun: int) -> int:
    """Refinement AC pass (G.1.2.3): correction bits for history-nonzero
    coefficients, insertion of newly-nonzero ones. Returns the remaining
    end-of-band run (this block consumes one when inside a run)."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_symbol(br, ac_tab)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:
                    eobrun = (1 << r) + (br.read_bits(r) if r else 0)
                    break  # correction-bit tail below ends this block
                # r == 15: ZRL — skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("refinement scan carries s > 1")
                val = p1 if br.read_bit() else m1
            while k <= se:
                pos = ZIGZAG[k]
                if coef[pos] != 0:
                    if br.read_bit() and (coef[pos] & p1) == 0:
                        coef[pos] += p1 if coef[pos] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                coef[ZIGZAG[k]] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            pos = ZIGZAG[k]
            if coef[pos] != 0:
                if br.read_bit() and (coef[pos] & p1) == 0:
                    coef[pos] += p1 if coef[pos] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun

def _run_scan(scan_comps: list, segments: list[bytes], ss: int, se: int,
              ah: int, al: int, progressive: bool,
              coefs: dict, geom: dict, mcus_x: int, mcus_y: int,
              dc_tables: dict, ac_tables: dict,
              restart_interval: int) -> None:
    """Entropy-decode one scan into the coefficient grids.

    Baseline: the classic interleaved DC+AC MCU walk. Progressive: a DC
    scan (interleaved over the padded grid when ns > 1) or a
    single-component AC band scan in raster order over the REAL block
    grid (padding blocks carry DC only — same samples baseline edge
    replication produces). Restart markers reset predictors and the
    end-of-band run every `restart_interval` MCUs/blocks.
    """
    seg_iter = iter(segments)
    br = _BitReader(next(seg_iter))
    if not progressive:
        pred = {c.cid: 0 for c in scan_comps}
        for mcu in range(mcus_x * mcus_y):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br = _BitReader(next(seg_iter))
                pred = {c.cid: 0 for c in scan_comps}
            mx, my = mcu % mcus_x, mcu // mcus_x
            for c in scan_comps:
                bwf = geom[c.cid][0]
                for by in range(c.v):
                    for bx in range(c.h):
                        coef = coefs[c.cid][(my * c.v + by) * bwf
                                            + mx * c.h + bx]
                        t = _decode_symbol(br, dc_tables[c.td])
                        pred[c.cid] += _extend(br.read_bits(t), t)
                        coef[0] = pred[c.cid]
                        k = 1
                        while k < 64:
                            rs = _decode_symbol(br, ac_tables[c.ta])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break        # EOB
                            k += r
                            coef[ZIGZAG[k]] = _extend(br.read_bits(s), s)
                            k += 1
        return
    if ss == 0:  # DC scan (first or refinement)
        if se != 0:
            raise ValueError("progressive scan mixes DC and AC bands")
        if len(scan_comps) > 1:  # interleaved: padded MCU walk
            pred = {c.cid: 0 for c in scan_comps}
            for mcu in range(mcus_x * mcus_y):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    br = _BitReader(next(seg_iter))
                    pred = {c.cid: 0 for c in scan_comps}
                mx, my = mcu % mcus_x, mcu // mcus_x
                for c in scan_comps:
                    bwf = geom[c.cid][0]
                    for by in range(c.v):
                        for bx in range(c.h):
                            coef = coefs[c.cid][(my * c.v + by) * bwf
                                                + mx * c.h + bx]
                            pred[c.cid] = _block_dc(
                                br, coef, pred[c.cid],
                                dc_tables[c.td], ah, al)
            return
        c = scan_comps[0]
        bwf, _, bw, bh = geom[c.cid]
        pred0 = 0
        for unit in range(bw * bh):
            if restart_interval and unit and unit % restart_interval == 0:
                br = _BitReader(next(seg_iter))
                pred0 = 0
            coef = coefs[c.cid][(unit // bw) * bwf + unit % bw]
            pred0 = _block_dc(br, coef, pred0, dc_tables[c.td], ah, al)
        return
    # AC band scan: exactly one component, raster over real blocks
    if len(scan_comps) != 1:
        raise ValueError("progressive AC scan must be single-component")
    c = scan_comps[0]
    bwf, _, bw, bh = geom[c.cid]
    block_fn = _block_ac_refine if ah else _block_ac_first
    eobrun = 0
    for unit in range(bw * bh):
        if restart_interval and unit and unit % restart_interval == 0:
            br = _BitReader(next(seg_iter))
            eobrun = 0
        coef = coefs[c.cid][(unit // bw) * bwf + unit % bw]
        eobrun = block_fn(br, coef, ss, se, al, ac_tables[c.ta], eobrun)


def decode_jpeg(data: bytes) -> JpegImage:
    """Decode an 8-bit JPEG: baseline sequential (SOF0) or progressive
    (SOF2, spectral selection + successive approximation per T.81 G)."""
    if data[:2] != JPEG_SOI:
        raise ValueError("not a JPEG: missing SOI marker")
    qtables: dict[int, list[int]] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    comps: list[_Component] = []
    width = height = None
    restart_interval = 0
    progressive = False
    any_scan = False
    pos = 2
    # per-component quantized-coefficient grids (natural order within a
    # block), MCU-padded — scans accumulate into them; dequant + IDCT
    # happen once at the end, which is also exactly what the baseline
    # single-scan case needs
    coefs: dict[int, list[list[int]]] = {}
    geom: dict[int, tuple[int, int, int, int]] = {}  # bwf,bhf,bw,bh
    mcus_x = mcus_y = hmax = vmax = 0

    def init_grids() -> None:
        nonlocal mcus_x, mcus_y, hmax, vmax
        hmax = max(c.h for c in comps)
        vmax = max(c.v for c in comps)
        mcus_x = -(-width // (8 * hmax))
        mcus_y = -(-height // (8 * vmax))
        for c in comps:
            bwf, bhf = mcus_x * c.h, mcus_y * c.v
            cw = -(-width * c.h // hmax)    # component sample dims
            ch_ = -(-height * c.v // vmax)
            bw, bh = -(-cw // 8), -(-ch_ // 8)  # real (unpadded) blocks
            geom[c.cid] = (bwf, bhf, bw, bh)
            coefs[c.cid] = [[0] * 64 for _ in range(bwf * bhf)]

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / stray RSTn
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                zz = body[i + 1:i + 65]
                nat = [0] * 64
                for k in range(64):
                    nat[ZIGZAG[k]] = zz[k]
                qtables[tq] = nat
                i += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                table = _huff_decode_table(bits, vals)
                (dc_tables if tc == 0 else ac_tables)[th] = table
                i += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            prec, height, width, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append(_Component(cid, hv >> 4, hv & 0x0F, tq))
            init_grids()
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"SOF{marker - 0xC0}: only baseline sequential (SOF0) and "
                f"progressive (SOF2) JPEGs are supported by this codec")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if width is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            order = {c.cid: c for c in comps}
            scan_comps = []
            for s in range(ns):
                cid, tdta = body[1 + 2 * s], body[2 + 2 * s]
                comp = order[cid]
                comp.td, comp.ta = tdta >> 4, tdta & 0x0F
                scan_comps.append(comp)
            ss, se, ahl = body[1 + 2 * ns:4 + 2 * ns]
            ah, al = ahl >> 4, ahl & 0x0F
            segments, pos = _split_entropy(data, pos)
            _run_scan(scan_comps, segments, ss, se, ah, al, progressive,
                      coefs, geom, mcus_x, mcus_y, dc_tables, ac_tables,
                      restart_interval)
            any_scan = True
            if not progressive:
                break
        # APPn / COM / others: skipped via seglen
    if width is None or not any_scan:
        raise ValueError("JPEG missing SOF or SOS")

    # dequantize + IDCT every (padded) block into the sample planes —
    # vectorized over ALL blocks at once (r8, the FLAC discipline): the
    # separable IDCT is two 8x8 matmuls per block, so the whole
    # component is one (n, 8, 8) einsum pair instead of n Python
    # _idct2 calls (the decoder's hot tail after the Huffman bit walk).
    # M[x][u] = alpha_u * cos((2x+1)u*pi/16) is the same basis the
    # scalar path folds; only the 8-term summation ORDER can differ
    # (BLAS dot vs sequential loop), which is ulp-level and invisible
    # to the bit-exact fixtures (DC-only blocks: single-term sums).
    import numpy as np

    m_basis = np.array([[_ALPHA[u] * _COS[x][u] for u in range(8)]
                        for x in range(8)], dtype=np.float64)
    planes: dict[int, "np.ndarray"] = {}
    for c in comps:
        q = np.array(qtables[c.tq], dtype=np.float64)
        bwf, bhf = geom[c.cid][0], geom[c.cid][1]
        x_blocks = (np.array(coefs[c.cid], dtype=np.float64) * q) \
            .reshape(-1, 8, 8)
        # tmp[n,v,x] = sum_u coef[n,v,u] * M[x,u]; out[n,y,x] =
        # 0.25 * sum_v M[y,v] * tmp[n,v,x] — exactly _idct2's algebra
        tmp = x_blocks @ m_basis.T
        px = 0.25 * np.einsum("yv,nvx->nyx", m_basis, tmp) + 128.0
        # _round_half_away, vectorized: floor(x+.5) for x>=0 else
        # ceil(x-.5), then the 0..255 clamp
        v = np.where(px >= 0, np.floor(px + 0.5), np.ceil(px - 0.5))
        v = np.clip(v, 0, 255).astype(np.uint8)
        planes[c.cid] = (v.reshape(bhf, bwf, 8, 8)
                         .transpose(0, 2, 1, 3)
                         .reshape(bhf * 8, bwf * 8))

    if len(comps) == 1:
        plane = planes[comps[0].cid]
        return JpegImage(width, height, 8, 1,
                         plane[:height, :width].tobytes())
    if len(comps) != 3:
        raise ValueError(f"{len(comps)}-component JPEGs unsupported")

    # upsample (nearest-index gather, same sx/sy arithmetic as the old
    # per-pixel loop) + one vectorized color transform; the per-pixel
    # float expressions are elementwise, so results are bit-identical
    # to the scalar path
    yy = np.arange(height, dtype=np.int64)
    xx = np.arange(width, dtype=np.int64)
    sub = {}
    for c in comps:
        sy = (yy * c.v) // vmax
        sx = (xx * c.h) // hmax
        sub[c.cid] = planes[c.cid][sy[:, None], sx[None, :]] \
            .astype(np.float64)
    yc, cbc, crc = comps
    lum, cb, cr = sub[yc.cid], sub[cbc.cid], sub[crc.cid]
    r = lum + 1.402 * (cr - 128)
    g = lum - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = lum + 1.772 * (cb - 128)
    rgb = np.stack([r, g, b], axis=-1)
    rgb = np.where(rgb >= 0, np.floor(rgb + 0.5), np.ceil(rgb - 0.5))
    out = np.clip(rgb, 0, 255).astype(np.uint8)
    return JpegImage(width, height, 8, 3, out.tobytes())


def split_mjpeg(data: bytes) -> list[bytes]:
    """Split an MJPEG stream (back-to-back baseline JPEG frames) into
    per-frame byte strings by walking the marker STRUCTURE — never by
    scanning for SOI bytes, which can legitimately appear inside marker
    payloads (e.g. 0xFFD8 in a quantization table)."""
    frames = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos:pos + 2] != JPEG_SOI:
            raise ValueError(f"expected SOI at byte {pos}")
        start = pos
        pos += 2
        while True:
            if pos + 2 > n:
                raise ValueError("truncated MJPEG frame")
            if data[pos] != 0xFF:
                raise ValueError(f"expected marker at byte {pos}")
            marker = data[pos + 1]
            if marker == 0xD9:  # EOI
                pos += 2
                break
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
            if marker == 0xDA:  # SOS: skip header then entropy data
                pos += 2 + seglen
                _, pos = _split_entropy(data, pos)
            else:
                pos += 2 + seglen
        frames.append(data[start:pos])
    return frames


# ---------------------------------------------------------------------------
# encoder

def _encode_block(bw: _BitWriter, coef: list[int], pred: int,
                  dc_tab: dict, ac_tab: dict) -> int:
    """Huffman-encode one quantized block (natural order); returns new DC
    predictor."""
    dc = coef[0]
    diff = dc - pred
    t = _category(diff)
    code, length = dc_tab[t]
    bw.write(code, length)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    for k in range(1, 64):
        v = coef[ZIGZAG[k]]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tab[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_tab[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, length = ac_tab[0x00]  # EOB
        bw.write(code, length)
    return dc


def _quantized_block_grid(plane, pw: int, ph: int, bwf: int, bhf: int,
                          q: list[int]) -> list[list[int]]:
    """Quantized FDCT coefficients for EVERY (MCU-padded) block of one
    component plane, batched (r8 — the encoder twin of the decoder's
    batched IDCT): edge-replicate the (ph, pw) int plane to the padded
    block grid, level-shift, run the separable FDCT as two matmuls over
    all blocks at once, divide by the quantizer and round half away from
    zero. Output: one length-64 natural-raster-order int list per block,
    indexed bi = by * bwf + bx — the exact values the old per-block
    _block_at -> _fdct2 -> _quantize chain produced (elementwise ops are
    order-identical; only the 8-term DCT summation order can shift at
    ulp level, which the /q + round step absorbs except exactly at a
    rounding knife-edge the fixtures avoid by construction)."""
    import numpy as np

    cos, alpha = _cos_basis()
    padded = np.pad(plane.astype(np.float64) - 128.0,
                    ((0, bhf * 8 - ph), (0, bwf * 8 - pw)), mode="edge")
    blocks = (padded.reshape(bhf, 8, bwf, 8)
              .transpose(0, 2, 1, 3).reshape(-1, 8, 8))
    # tmp[n,y,u] = sum_x s[n,y,x] * COS[x][u]; out[n,v,u] =
    # 0.25*a_u*a_v * sum_y COS[y][v] * tmp[n,y,u]
    tmp = blocks @ cos
    out = 0.25 * np.einsum("yv,nyu->nvu", cos, tmp) \
        * alpha[None, None, :] * alpha[None, :, None]
    coef = _rha_array(out / np.array(q, dtype=np.float64).reshape(8, 8))
    return [[int(x) for x in row] for row in
            coef.astype(np.int64).reshape(-1, 64)]


def _prepare_planes(pixels: bytes, width: int, height: int,
                    channels: int, subsample: bool):
    """Color-convert + (optionally) subsample into per-component planes;
    returns (planes, dims, samp) — shared by the baseline and progressive
    encoders so their coefficients are identical by construction. Planes
    are (ph, pw) int numpy arrays; the RGB->YCbCr transform and the 2x2
    chroma box average are vectorized elementwise (r8), bit-identical to
    the old per-pixel loops (same scalar op order per element; the box
    sum is exact integer arithmetic)."""
    import numpy as np

    if channels not in (1, 3):
        raise ValueError("channels must be 1 (gray) or 3 (RGB)")
    if len(pixels) != width * height * channels:
        raise ValueError(f"pixel buffer is {len(pixels)} bytes, expected "
                         f"{width * height * channels}")

    if channels == 1:
        planes = [np.frombuffer(pixels, dtype=np.uint8)
                  .reshape(height, width).astype(np.int32)]
        dims = [(width, height)]
        samp = [(1, 1)]
    else:
        arr = (np.frombuffer(pixels, dtype=np.uint8)
               .reshape(height, width, 3).astype(np.float64))
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        luma = _rha_array(0.299 * r + 0.587 * g + 0.114 * b) \
            .astype(np.int32)
        cb_full = _rha_array(128.0 - 0.168736 * r - 0.331264 * g
                             + 0.5 * b).astype(np.int32)
        cr_full = _rha_array(128.0 + 0.5 * r - 0.418688 * g
                             - 0.081312 * b).astype(np.int32)
        if subsample:
            cw, ch_ = -(-width // 2), -(-height // 2)

            def _avg(src):
                acc = np.zeros((ch_, cw), dtype=np.int64)
                n = np.zeros((ch_, cw), dtype=np.int64)
                for dy in (0, 1):
                    for dx in (0, 1):
                        s = src[dy::2, dx::2]
                        acc[:s.shape[0], :s.shape[1]] += s
                        n[:s.shape[0], :s.shape[1]] += 1
                return _rha_array(acc / n).astype(np.int32)

            planes = [luma, _avg(cb_full), _avg(cr_full)]
            dims = [(width, height), (cw, ch_), (cw, ch_)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [luma, cb_full, cr_full]
            dims = [(width, height)] * 3
            samp = [(1, 1)] * 3
    return planes, dims, samp


def encode_jpeg(pixels: bytes, width: int, height: int,
                channels: int = 3, subsample: bool = False) -> bytes:
    """Encode 8-bit samples as baseline JPEG with the Annex K tables.

    channels=1: grayscale; channels=3: RGB input, encoded as YCbCr —
    4:4:4, or 4:2:0 (2x2 luma sampling + averaged chroma) when
    `subsample` is set. `pixels` is row-major interleaved.
    """
    planes, dims, samp = _prepare_planes(pixels, width, height, channels,
                                         subsample)
    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))

    qtabs = [STD_LUMA_Q] + ([STD_CHROMA_Q] if channels == 3 else [])
    dc_enc = [_huff_encode_table(*_DC_LUMA)]
    ac_enc = [_huff_encode_table(*_AC_LUMA)]
    if channels == 3:
        dc_enc.append(_huff_encode_table(*_DC_CHROMA))
        ac_enc.append(_huff_encode_table(*_AC_CHROMA))

    # all blocks DCT'd + quantized in one batched pass per component
    # (r8); the MCU loop below only walks the entropy coder through them
    # in interleaved order
    grids = []
    for ci in range(channels):
        h, v = samp[ci]
        pw, ph = dims[ci]
        grids.append(_quantized_block_grid(
            planes[ci], pw, ph, mcus_x * h, mcus_y * v,
            qtabs[0 if ci == 0 else 1]))

    bw = _BitWriter()
    pred = [0] * channels
    for mcu in range(mcus_x * mcus_y):
        mx, my = mcu % mcus_x, mcu // mcus_x
        for ci in range(channels):
            h, v = samp[ci]
            bwf = mcus_x * h
            tq = 0 if ci == 0 else 1
            for by in range(v):
                for bx in range(h):
                    coef = grids[ci][(my * v + by) * bwf + (mx * h + bx)]
                    pred[ci] = _encode_block(bw, coef, pred[ci],
                                             dc_enc[tq], ac_enc[tq])
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(JPEG_SOI)
    for tq, q in enumerate(qtabs):
        zz = bytes(q[ZIGZAG[k]] for k in range(64))
        out += seg(0xDB, bytes([tq]) + zz)
    sof = struct.pack(">BHHB", 8, height, width, channels)
    for ci in range(channels):
        h, v = samp[ci]
        sof += bytes([ci + 1, (h << 4) | v, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)
    huff_specs = [(0, 0, _DC_LUMA), (1, 0, _AC_LUMA)]
    if channels == 3:
        huff_specs += [(0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA)]
    for tc, th, (bits, vals) in huff_specs:
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    sos = bytes([channels])
    for ci in range(channels):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (SOF2)

def _quantized_grids(planes, dims, samp, width, height, channels):
    """Quantized-coefficient grids for every (MCU-padded) block of every
    component — the shared input of all progressive scans."""
    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    qtabs = [STD_LUMA_Q] + ([STD_CHROMA_Q] if channels == 3 else [])
    grids = []
    for ci in range(channels):
        h, v = samp[ci]
        pw, ph = dims[ci]
        grids.append(_quantized_block_grid(
            planes[ci], pw, ph, mcus_x * h, mcus_y * v,
            qtabs[0 if ci == 0 else 1]))
    return grids, mcus_x, mcus_y


def _shift_to_zero(v: int, al: int) -> int:
    """Divide by 2^al rounding toward zero (the AC point transform)."""
    return (v >> al) if v >= 0 else -((-v) >> al)


def _write_amplitude(bw: _BitWriter, v: int, s: int) -> None:
    bw.write(v if v >= 0 else v + (1 << s) - 1, s)


def _encode_ac_first_block(bw: _BitWriter, coef: list[int], ss: int,
                           se: int, al: int, ac_tab: dict) -> None:
    run = 0
    for k in range(ss, se + 1):
        v = _shift_to_zero(coef[ZIGZAG[k]], al)
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tab[0xF0]
            bw.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_tab[(run << 4) | s]
        bw.write(code, length)
        _write_amplitude(bw, v, s)
        run = 0
    if run:
        code, length = ac_tab[0x00]  # EOB (run of exactly this block)
        bw.write(code, length)


def _encode_ac_refine_block(bw: _BitWriter, coef: list[int], ss: int,
                            se: int, al: int, ac_tab: dict) -> None:
    """Refinement AC scan for one block (G.1.2.3, per-block EOB): emit
    run/size symbols for newly-nonzero coefficients, buffering one
    correction bit per already-nonzero coefficient passed, flushed after
    each symbol's appended bits."""
    shifted = [_shift_to_zero(coef[ZIGZAG[k]], al) for k in range(ss, se + 1)]
    run = 0
    pending: list[int] = []
    # last newly-nonzero index: ZRL is only emitted while another new
    # coefficient is still coming (k <= eob_k); trailing zero runs are
    # the EOB's job. The ZRL check runs at EVERY nonzero position (the
    # libjpeg discipline) so correction bits buffered before the run
    # flush with the ZRL and bits after it wait for the next symbol —
    # the decoder reads them in exactly that order.
    eob_k = max((k for i, k in enumerate(range(ss, se + 1))
                 if abs(shifted[i]) == 1), default=ss - 1)
    for i, k in enumerate(range(ss, se + 1)):
        t = abs(shifted[i])
        if t == 0:
            run += 1
            continue
        while run > 15 and k <= eob_k:
            code, length = ac_tab[0xF0]
            bw.write(code, length)
            for b in pending:
                bw.write(b, 1)
            pending = []
            run -= 16
        if t > 1:  # history-nonzero: correction bit, run unaffected
            pending.append(t & 1)
            continue
        # newly-nonzero at this precision
        code, length = ac_tab[(run << 4) | 1]
        bw.write(code, length)
        bw.write(1 if shifted[i] > 0 else 0, 1)
        for b in pending:
            bw.write(b, 1)
        pending = []
        run = 0
    if run or pending:
        code, length = ac_tab[0x00]
        bw.write(code, length)
        for b in pending:
            bw.write(b, 1)


def encode_progressive_jpeg(pixels: bytes, width: int, height: int,
                            channels: int = 3, subsample: bool = False,
                            successive: bool = False) -> bytes:
    """Encode 8-bit samples as PROGRESSIVE JPEG (SOF2, Annex K tables).

    successive=False: spectral selection only — one interleaved DC scan,
    then each component's full AC band. successive=True additionally
    splits every band across two precision passes (Al=1 first, then the
    Ah=1/Al=0 refinement), exercising all four progressive scan kinds.
    The quantized coefficients come from the SAME pipeline as
    encode_jpeg, so decode(progressive bytes) is pixel-identical to
    decode(baseline bytes) of the same input — the equivalence the tests
    pin.
    """
    planes, dims, samp = _prepare_planes(pixels, width, height, channels,
                                         subsample)
    grids, mcus_x, mcus_y = _quantized_grids(planes, dims, samp,
                                             width, height, channels)
    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    qtabs = [STD_LUMA_Q] + ([STD_CHROMA_Q] if channels == 3 else [])
    dc_enc = [_huff_encode_table(*_DC_LUMA)]
    ac_enc = [_huff_encode_table(*_AC_LUMA)]
    if channels == 3:
        dc_enc.append(_huff_encode_table(*_DC_CHROMA))
        ac_enc.append(_huff_encode_table(*_AC_CHROMA))

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(JPEG_SOI)
    for tq, q in enumerate(qtabs):
        zz = bytes(q[ZIGZAG[k]] for k in range(64))
        out += seg(0xDB, bytes([tq]) + zz)
    sof = struct.pack(">BHHB", 8, height, width, channels)
    for ci in range(channels):
        h, v = samp[ci]
        sof += bytes([ci + 1, (h << 4) | v, 0 if ci == 0 else 1])
    out += seg(0xC2, sof)
    huff_specs = [(0, 0, _DC_LUMA), (1, 0, _AC_LUMA)]
    if channels == 3:
        huff_specs += [(0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA)]
    for tc, th, (bits, vals) in huff_specs:
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    def sos_header(comp_ixs, ss, se, ah, al) -> bytes:
        body = bytes([len(comp_ixs)])
        for ci in comp_ixs:
            t = 0 if ci == 0 else 1
            body += bytes([ci + 1, (t << 4) | t])
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    def dc_scan(ah: int, al: int) -> bytes:
        bw = _BitWriter()
        pred = [0] * channels
        for mcu in range(mcus_x * mcus_y):
            mx, my = mcu % mcus_x, mcu // mcus_x
            for ci in range(channels):
                h, v = samp[ci]
                bwf = mcus_x * h
                t_ix = 0 if ci == 0 else 1
                for by in range(v):
                    for bx in range(h):
                        dc = grids[ci][(my * v + by) * bwf
                                       + mx * h + bx][0]
                        if ah == 0:
                            val = dc >> al
                            diff = val - pred[ci]
                            pred[ci] = val
                            t = _category(diff)
                            code, length = dc_enc[t_ix][t]
                            bw.write(code, length)
                            if t:
                                _write_amplitude(bw, diff, t)
                        else:
                            bw.write((dc >> al) & 1, 1)
        bw.flush()
        return bytes(bw.out)

    def ac_scan(ci: int, al: int, refine: bool) -> bytes:
        bw = _BitWriter()
        h, v = samp[ci]
        bwf = mcus_x * h
        cw = -(-width * h // hmax)
        ch_ = -(-height * v // vmax)
        bw_, bh_ = -(-cw // 8), -(-ch_ // 8)  # real blocks only
        tab = ac_enc[0 if ci == 0 else 1]
        enc = _encode_ac_refine_block if refine else _encode_ac_first_block
        for by in range(bh_):
            for bx in range(bw_):
                enc(bw, grids[ci][by * bwf + bx], 1, 63, al, tab)
        bw.flush()
        return bytes(bw.out)

    first_al = 1 if successive else 0
    out += sos_header(list(range(channels)), 0, 0, 0, first_al)
    out += dc_scan(0, first_al)
    for ci in range(channels):
        out += sos_header([ci], 1, 63, 0, first_al)
        out += ac_scan(ci, first_al, refine=False)
    if successive:
        out += sos_header(list(range(channels)), 0, 0, 1, 0)
        out += dc_scan(1, 0)
        for ci in range(channels):
            out += sos_header([ci], 1, 63, 1, 0)
            out += ac_scan(ci, 0, refine=True)
    out += b"\xff\xd9"
    return bytes(out)
