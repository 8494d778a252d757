"""Pure-stdlib FLAC codec (lossless compressed audio).

Completes the audio family's compression ladder: linear PCM (wav.py),
companded G.711 mu-law, block-adaptive IMA ADPCM — and now FLAC, the
lossless compressed format real speech/music corpora actually ship in
(LibriSpeech, MLS and Common Voice derivatives distribute FLAC). The
whole format is public-spec integer algebra (RFC 9639 / the xiph.org
FLAC format document): no DSP library needed.

Decoder is full-surface for the feature set this repo ingests:
- STREAMINFO parse + skip of all other metadata blocks,
- frame sync walk with every blocksize/sample-rate/sample-size code,
- all four subframe types (CONSTANT, VERBATIM, FIXED orders 0-4, LPC
  any order with quantized-coefficient integer reconstruction),
- Rice residual both methods (4- and 5-bit parameters), any partition
  order, escape-coded raw partitions, wasted-bits shift,
- all stereo decorrelations (independent, left/side, right/side,
  mid/side with the parity-carry reconstruction),
- CRC-8 header check, CRC-16 frame check, and the STREAMINFO MD5 of
  the decoded stream — every integrity feature the spec defines.

Encoder is the subset a fixture/export path needs, but real: per-block
best-of fixed predictors 0-4 (residual-sum selection), optional
Levinson-Durbin LPC with coefficient quantization, optional stereo
decorrelation (auto-picks the cheapest of the four assignments),
exact-cost Rice parameter search with escape fallback, CRC8/CRC16/MD5
all emitted. decode(encode(x)) == x bit-exactly for every path — the
lossless contract the tests fuzz.

Reference behavior parity: the reference pipeline (etl.py:46-269) never
touches media; this module exists for the training-data extension
surface (SURVEY.md "multimodal"), same slot as png.py/jpeg.py.

Scale note: runs only inside Arrow-batched mapInPandas one payload at a
time (multimodal/binary.py); a deployment swaps in libFLAC/soundfile
behind the same signatures.
"""

from __future__ import annotations

import hashlib
import struct
from dataclasses import dataclass

import numpy as np

FLAC_MAGIC = b"fLaC"

# ---------------------------------------------------------------------------
# bit I/O (MSB-first, per spec)


class _BitWriter:
    def __init__(self) -> None:
        self._out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, bits: int) -> None:
        if bits == 0:
            return
        value &= (1 << bits) - 1
        self._acc = (self._acc << bits) | value
        self._nbits += bits
        while self._nbits >= 8:
            self._nbits -= 8
            self._out.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_signed(self, value: int, bits: int) -> None:
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, q: int) -> None:
        # spec unary: q zero bits then a one bit
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self._nbits:
            self.write(0, 8 - self._nbits)

    def getvalue(self) -> bytes:
        assert self._nbits == 0, "unaligned"
        return bytes(self._out)


class _BitReader:
    def __init__(self, data: bytes, bitpos: int = 0) -> None:
        self._data = data
        self._pos = bitpos

    @property
    def bitpos(self) -> int:
        return self._pos

    def remaining(self) -> int:
        return len(self._data) * 8 - self._pos

    def read(self, bits: int) -> int:
        if bits == 0:
            return 0
        if self.remaining() < bits:
            raise ValueError("FLAC bitstream truncated")
        v = 0
        pos = self._pos
        data = self._data
        while bits:
            byte_i, bit_i = divmod(pos, 8)
            take = min(bits, 8 - bit_i)
            chunk = (data[byte_i] >> (8 - bit_i - take)) & ((1 << take) - 1)
            v = (v << take) | chunk
            pos += take
            bits -= take
        self._pos = pos
        return v

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        if v >= 1 << (bits - 1):
            v -= 1 << bits
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 24:
                raise ValueError("runaway unary code (corrupt stream)")
        return q

    def align(self) -> None:
        self._pos = (self._pos + 7) & ~7


# ---------------------------------------------------------------------------
# CRCs (spec polynomials, init 0, no reflection)

_CRC8_TABLE = []
for _b in range(256):
    _c = _b
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07) & 0xFF if _c & 0x80 else (_c << 1) & 0xFF
    _CRC8_TABLE.append(_c)

_CRC16_TABLE = []
for _b in range(256):
    _c = _b << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005) & 0xFFFF if _c & 0x8000 \
            else (_c << 1) & 0xFFFF
    _CRC16_TABLE.append(_c)


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8_TABLE[c ^ b]
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC16_TABLE[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


# ---------------------------------------------------------------------------
# coded number (the UTF-8-like frame/sample index encoding)


def _write_coded_number(w: _BitWriter, v: int) -> None:
    if v < 0x80:
        w.write(v, 8)
        return
    # nbytes-byte form carries (7 - nbytes) + 6*(nbytes - 1) payload bits
    for nbytes in range(2, 8):
        if v < 1 << ((7 - nbytes) + 6 * (nbytes - 1)):
            break
    else:
        raise ValueError("coded number out of range")
    head_payload = 7 - nbytes
    w.write(((0xFF << (8 - nbytes)) & 0xFF)
            | ((v >> (6 * (nbytes - 1))) & ((1 << head_payload) - 1)), 8)
    for k in range(nbytes - 2, -1, -1):
        w.write(0x80 | ((v >> (6 * k)) & 0x3F), 8)


def _read_coded_number(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    ones = 0
    mask = 0x80
    while b0 & mask:
        ones += 1
        mask >>= 1
    if ones < 2 or ones > 7:
        raise ValueError("bad coded-number lead byte")
    v = b0 & ((1 << (7 - ones)) - 1) if ones < 7 else 0
    for _ in range(ones - 1):
        b = r.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("bad coded-number continuation byte")
        v = (v << 6) | (b & 0x3F)
    return v


# ---------------------------------------------------------------------------
# fixed predictors (the spec's five polynomial orders)

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _fixed_residual(s: np.ndarray, order: int) -> np.ndarray:
    r = s.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _predict_restore(warm: list[int], residual: list[int], coefs: list[int],
                     shift: int) -> list[int]:
    out = list(warm)
    order = len(coefs)
    for res in residual:
        acc = 0
        for j, c in enumerate(coefs):
            acc += c * out[-1 - j]
        out.append((acc >> shift) + res)
    return out


# ---------------------------------------------------------------------------
# Rice residual coding

_SR_CODES = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5, 22050: 6,
             24000: 7, 32000: 8, 44100: 9, 48000: 10, 96000: 11}
_SR_DECODE = {v: k for k, v in _SR_CODES.items()}
_BPS_CODES = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
_BPS_DECODE = {v: k for k, v in _BPS_CODES.items()}


def _zigzag(r: np.ndarray) -> np.ndarray:
    return np.where(r >= 0, r << 1, (-r << 1) - 1).astype(np.int64)


def _best_rice_param(u: np.ndarray) -> tuple[int, int]:
    """(param, exact bit cost) minimizing sum(u>>p) + n*(p+1)."""
    n = int(u.size)
    best_p, best_cost = 0, None
    for p in range(31):
        cost = int((u >> p).sum()) + n * (p + 1)
        if best_cost is None or cost < best_cost:
            best_p, best_cost = p, cost
        elif cost > best_cost * 2:
            break
    return best_p, best_cost


def _write_residual(w: _BitWriter, residual: np.ndarray) -> None:
    """Partition order 0, method picked by the parameter's width, with
    the spec's escape hatch when raw beats Rice."""
    u = _zigzag(residual.astype(np.int64))
    p, rice_cost = _best_rice_param(u)
    raw_bits = max((int(x).bit_length() + 1 for x in residual), default=1)
    raw_cost = raw_bits * int(u.size) + 5
    method = 0 if p < 15 else 1
    pbits = 4 if method == 0 else 5
    w.write(method, 2)
    w.write(0, 4)  # partition order 0
    if raw_cost < rice_cost:
        w.write((1 << pbits) - 1, pbits)  # escape
        w.write(raw_bits, 5)
        for x in residual:
            w.write_signed(int(x), raw_bits)
        return
    w.write(p, pbits)
    for x in u:
        x = int(x)
        w.write_unary(x >> p)
        w.write(x & ((1 << p) - 1), p)


def _read_residual(r: _BitReader, block_size: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.read(4)
    nparts = 1 << porder
    if block_size % nparts or (block_size >> porder) <= order and nparts > 1:
        raise ValueError("invalid residual partition order")
    out: list[int] = []
    for part in range(nparts):
        n = (block_size >> porder) - (order if part == 0 else 0)
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            for _ in range(n):
                out.append(r.read_signed(raw) if raw else 0)
            continue
        for _ in range(n):
            q = r.read_unary()
            u = (q << param) | r.read(param)
            out.append((u >> 1) if not (u & 1) else -((u + 1) >> 1))
    return out


# ---------------------------------------------------------------------------
# public clip type (mirrors wav.WavClip so audio_features can dispatch)


@dataclass(frozen=True)
class FlacClip:
    sample_rate: int
    channels: int
    bit_depth: int
    samples: np.ndarray  # interleaved int32/int64 LINEAR values

    @property
    def n_frames(self) -> int:
        return int(self.samples.size) // self.channels

    def duration_ms(self) -> float:
        return 1000.0 * self.n_frames / self.sample_rate

    def mean_abs(self) -> float:
        n = int(self.samples.size)
        if n == 0:
            return 0.0
        return int(np.abs(self.samples.astype(np.int64)).sum()) / n


# ---------------------------------------------------------------------------
# encoder


def _levinson_lpc(s: np.ndarray, order: int) -> list[float]:
    x = s.astype(np.float64)
    n = x.size
    auto = [float(np.dot(x[: n - k], x[k:])) for k in range(order + 1)]
    if auto[0] == 0.0:
        return [0.0] * order
    err = auto[0]
    coefs = [0.0] * order
    for i in range(order):
        acc = auto[i + 1]
        for j in range(i):
            acc -= coefs[j] * auto[i - j]
        k = acc / err
        new = coefs[:]
        new[i] = k
        for j in range(i):
            new[j] = coefs[j] - k * coefs[i - 1 - j]
        coefs = new
        err *= 1 - k * k
        if err <= 0:
            break
    return coefs


def _quantize_lpc(coefs: list[float], precision: int) -> tuple[list[int],
                                                               int]:
    cmax = max((abs(c) for c in coefs), default=0.0)
    if cmax == 0.0:
        return [0] * len(coefs), 0
    shift = precision - 1 - max(0, int(np.floor(np.log2(cmax))) + 1)
    shift = max(0, min(15, shift))
    lo, hi = -(1 << (precision - 1)), (1 << (precision - 1)) - 1
    q = [max(lo, min(hi, int(round(c * (1 << shift))))) for c in coefs]
    return q, shift


def _encode_subframe(w: _BitWriter, s: np.ndarray, bps: int,
                     force: str | None, lpc_order: int) -> None:
    n = int(s.size)
    s64 = s.astype(np.int64)
    if force == "verbatim":
        w.write(0, 1)
        w.write(0b000001, 6)
        w.write(0, 1)
        for x in s64:
            w.write_signed(int(x), bps)
        return
    if force is None and n and int(s64.min()) == int(s64.max()):
        w.write(0, 1)
        w.write(0b000000, 6)  # CONSTANT
        w.write(0, 1)
        w.write_signed(int(s64[0]), bps)
        return
    if lpc_order and n > lpc_order:
        coefs, shift = _quantize_lpc(_levinson_lpc(s64, lpc_order), 12)
        w.write(0, 1)
        w.write(0b100000 | (lpc_order - 1), 6)
        w.write(0, 1)
        for x in s64[:lpc_order]:
            w.write_signed(int(x), bps)
        w.write(12 - 1, 4)  # coefficient precision - 1
        w.write_signed(shift, 5)
        for c in coefs:
            w.write_signed(c, 12)
        pred = np.zeros(n - lpc_order, dtype=np.int64)
        hist = s64
        for j, c in enumerate(coefs):
            pred += c * hist[lpc_order - 1 - j: n - 1 - j]
        residual = s64[lpc_order:] - (pred >> shift)
        _write_residual(w, residual)
        return
    # best fixed order by exact Rice cost of the candidate residual
    best = None
    for order in range(min(4, n - 1) + 1):
        res = _fixed_residual(s64, order)
        if res.size and (int(res.max()) >= 1 << 62
                         or int(res.min()) <= -(1 << 62)):
            continue
        _, cost = _best_rice_param(_zigzag(res))
        cost += order * bps
        if best is None or cost < best[0]:
            best = (cost, order, res)
    _, order, residual = best
    w.write(0, 1)
    w.write(0b001000 | order, 6)  # FIXED
    w.write(0, 1)
    for x in s64[:order]:
        w.write_signed(int(x), bps)
    _write_residual(w, residual)


def encode_flac(samples, sample_rate: int, channels: int = 1,
                bit_depth: int = 16, block_size: int = 256,
                stereo_mode: str = "auto", force_subframe: str | None = None,
                lpc_order: int = 0) -> bytes:
    """Encode interleaved integer samples as a spec-complete FLAC file.

    stereo_mode (channels == 2 only): "auto" picks the cheapest of
    independent/left-side/right-side/mid-side per block by residual
    magnitude; or pin one of "independent", "left_side", "right_side",
    "mid_side". force_subframe="verbatim" pins the subframe type;
    lpc_order > 0 switches fixed predictors for quantized LPC.
    """
    arr = np.asarray(samples, dtype=np.int64)
    if arr.size % channels:
        raise ValueError("sample count not divisible by channels")
    lo, hi = -(1 << (bit_depth - 1)), (1 << (bit_depth - 1)) - 1
    if arr.size and not (int(arr.min()) >= lo and int(arr.max()) <= hi):
        raise ValueError(f"samples out of {bit_depth}-bit range")
    n_frames = int(arr.size) // channels
    chans = [arr[c::channels] for c in range(channels)]

    md5 = hashlib.md5()
    width = (bit_depth + 7) // 8
    if width == 1:
        md5.update((arr & 0xFF).astype(np.uint8).tobytes())
    elif width == 2:
        md5.update(arr.astype("<i2").tobytes())
    else:
        md5.update(b"".join(int(x).to_bytes(width, "little", signed=True)
                            for x in arr))

    frames = bytearray()
    sizes: list[int] = []
    for fi, start in enumerate(range(0, max(n_frames, 1), block_size)):
        bs = min(block_size, n_frames - start)
        if bs <= 0:
            break
        block = [c[start:start + bs] for c in chans]
        assignment = channels - 1
        subs: list[tuple[np.ndarray, int]] = [(b, bit_depth) for b in block]
        if channels == 2 and stereo_mode != "independent":
            left, right = block[0], block[1]
            side = left - right
            mid = (left + right) >> 1
            cand = {
                "independent": ([(left, bit_depth), (right, bit_depth)],
                                1,
                                int(np.abs(np.diff(left)).sum())
                                + int(np.abs(np.diff(right)).sum())),
                "left_side": ([(left, bit_depth), (side, bit_depth + 1)],
                              8,
                              int(np.abs(np.diff(left)).sum())
                              + int(np.abs(np.diff(side)).sum())),
                "right_side": ([(side, bit_depth + 1), (right, bit_depth)],
                               9,
                               int(np.abs(np.diff(side)).sum())
                               + int(np.abs(np.diff(right)).sum())),
                "mid_side": ([(mid, bit_depth), (side, bit_depth + 1)],
                             10,
                             int(np.abs(np.diff(mid)).sum())
                             + int(np.abs(np.diff(side)).sum())),
            }
            if stereo_mode == "auto":
                subs, assignment, _ = min(cand.values(), key=lambda t: t[2])
            else:
                subs, assignment, _ = cand[stereo_mode]

        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)   # reserved
        w.write(0, 1)   # fixed-blocksize strategy
        w.write(0b0111, 4)  # blocksize: 16-bit value - 1 at header end
        w.write(_SR_CODES.get(sample_rate, 0), 4)
        w.write(assignment, 4)
        w.write(_BPS_CODES.get(bit_depth, 0), 3)
        w.write(0, 1)   # reserved
        _write_coded_number(w, fi)
        w.write(bs - 1, 16)
        header = w.getvalue()
        w.write(_crc8(header), 8)
        for sub, bps in subs:
            _encode_subframe(w, sub, bps, force_subframe, lpc_order)
        w.align()
        body = w.getvalue()
        frames += body + struct.pack(">H", _crc16(body))
        sizes.append(len(body) + 2)

    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(min(sizes) if sizes else 0, 24)
    si.write(max(sizes) if sizes else 0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bit_depth - 1, 5)
    si.write(n_frames, 36)
    streaminfo = si.getvalue() + md5.digest()
    # metadata block header: last-block flag + type 0, 24-bit length
    return (FLAC_MAGIC + bytes([0x80])
            + len(streaminfo).to_bytes(3, "big") + streaminfo + frames)


# ---------------------------------------------------------------------------
# decoder


def _decode_subframe(r: _BitReader, bs: int, bps: int) -> list[int]:
    if r.read(1):
        raise ValueError("subframe padding bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
        bps -= wasted
    if stype == 0b000000:
        out = [r.read_signed(bps)] * bs
    elif stype == 0b000001:
        out = [r.read_signed(bps) for _ in range(bs)]
    elif 0b001000 <= stype <= 0b001100:
        order = stype & 0x07
        warm = [r.read_signed(bps) for _ in range(order)]
        res = _read_residual(r, bs, order)
        out = _predict_restore(warm, res, _FIXED_COEFS[order], 0)
    elif stype & 0b100000:
        order = (stype & 0x1F) + 1
        warm = [r.read_signed(bps) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC coefficient precision")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift is forbidden")
        coefs = [r.read_signed(precision) for _ in range(order)]
        res = _read_residual(r, bs, order)
        out = _predict_restore(warm, res, coefs, shift)
    else:
        raise ValueError(f"reserved subframe type {stype:#08b}")
    if wasted:
        out = [x << wasted for x in out]
    return out


def decode_flac(payload: bytes) -> FlacClip:
    """Parse a FLAC payload; verifies CRC-8, CRC-16 and the stream MD5."""
    if payload[:4] != FLAC_MAGIC:
        raise ValueError("not FLAC: missing fLaC magic")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated metadata block header")
        last = payload[pos] & 0x80
        btype = payload[pos] & 0x7F
        size = int.from_bytes(payload[pos + 1:pos + 4], "big")
        body = payload[pos + 4:pos + 4 + size]
        if len(body) != size:
            raise ValueError("truncated metadata block")
        if btype == 0:
            streaminfo = body
        pos += 4 + size
        if last:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("missing STREAMINFO")
    r = _BitReader(streaminfo)
    r.read(16)  # min blocksize
    r.read(16)  # max blocksize
    r.read(24)
    r.read(24)
    sample_rate = r.read(20)
    channels = r.read(3) + 1
    bit_depth = r.read(5) + 1
    total = r.read(36)
    md5_expect = streaminfo[18:34]

    chans: list[list[int]] = [[] for _ in range(channels)]
    fr = _BitReader(payload, pos * 8)
    while fr.remaining() >= 16:
        frame_start = fr.bitpos // 8
        if fr.read(14) != 0b11111111111110:
            raise ValueError("lost frame sync")
        fr.read(1)
        fr.read(1)  # blocking strategy
        bs_code = fr.read(4)
        sr_code = fr.read(4)
        assignment = fr.read(4)
        bps_code = fr.read(3)
        fr.read(1)
        _read_coded_number(fr)
        if bs_code == 0:
            raise ValueError("reserved blocksize code")
        elif bs_code == 1:
            bs = 192
        elif bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif bs_code == 6:
            bs = fr.read(8) + 1
        elif bs_code == 7:
            bs = fr.read(16) + 1
        else:
            bs = 256 << (bs_code - 8)
        if sr_code == 12:
            fr.read(8)
        elif sr_code in (13, 14):
            fr.read(16)
        elif sr_code == 15:
            raise ValueError("invalid sample-rate code")
        elif sr_code and _SR_DECODE.get(sr_code, sample_rate) != sample_rate:
            raise ValueError("frame sample rate contradicts STREAMINFO")
        bps = _BPS_DECODE.get(bps_code, bit_depth) if bps_code else bit_depth
        header_end = fr.bitpos // 8
        if fr.read(8) != _crc8(payload[frame_start:header_end]):
            raise ValueError("frame header CRC-8 mismatch")
        if assignment < 8:
            if assignment + 1 != channels:
                raise ValueError("channel assignment contradicts STREAMINFO")
            decoded = [_decode_subframe(fr, bs, bps)
                       for _ in range(channels)]
        elif assignment <= 10:
            if channels != 2:
                raise ValueError("stereo decorrelation in non-stereo stream")
            if assignment == 8:    # left/side
                left = _decode_subframe(fr, bs, bps)
                side = _decode_subframe(fr, bs, bps + 1)
                decoded = [left, [l - s for l, s in zip(left, side)]]
            elif assignment == 9:  # right/side
                side = _decode_subframe(fr, bs, bps + 1)
                right = _decode_subframe(fr, bs, bps)
                decoded = [[rr + s for rr, s in zip(right, side)], right]
            else:                  # mid/side
                mid = _decode_subframe(fr, bs, bps)
                side = _decode_subframe(fr, bs, bps + 1)
                left = [m + ((s + (s & 1)) >> 1) for m, s in zip(mid, side)]
                decoded = [left, [l - s for l, s in zip(left, side)]]
        else:
            raise ValueError("reserved channel assignment")
        fr.align()
        frame_end = fr.bitpos // 8
        if fr.read(16) != _crc16(payload[frame_start:frame_end]):
            raise ValueError("frame CRC-16 mismatch")
        for c in range(channels):
            chans[c].extend(decoded[c])

    if total:
        chans = [c[:total] for c in chans]
    inter = np.empty(len(chans[0]) * channels, dtype=np.int64)
    for c in range(channels):
        inter[c::channels] = chans[c]
    if md5_expect != b"\x00" * 16:
        md5 = hashlib.md5()
        width = (bit_depth + 7) // 8
        if width == 1:
            md5.update((inter & 0xFF).astype(np.uint8).tobytes())
        elif width == 2:
            md5.update(inter.astype("<i2").tobytes())
        else:
            md5.update(b"".join(int(x).to_bytes(width, "little", signed=True)
                                for x in inter))
        if md5.digest() != md5_expect:
            raise ValueError("decoded stream MD5 mismatch")
    return FlacClip(sample_rate=sample_rate, channels=channels,
                    bit_depth=bit_depth, samples=inter.astype(np.int32))
