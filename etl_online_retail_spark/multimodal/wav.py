"""Minimal pure-stdlib WAV (RIFF/PCM) codec.

Third media family (after PNG/JPEG images and MJPEG video): linear PCM
audio in a RIFF container — the interchange format audio training
pipelines ingest before feature extraction. struct is enough: RIFF/WAVE
header, fmt chunk (linear PCM format 1, 8- or 16-bit; G.711 mu-law
format 7 — the telephony companding every speech corpus eventually
meets, decoded through the ITU algebra below; or IMA/DVI ADPCM format
0x11 — the classic 4:1 compressed codec, r6, block-structured 4-bit
codes through the public step/index tables), data chunk of interleaved
little-endian samples. Unknown chunks (LIST, fact, ...) are skipped by
their declared size, the same rule as PNG ancillary chunks.

Format reference: the public RIFF/WAVE specification (Microsoft/IBM
multimedia programming interface) — canonical PCM layout.

Scale note: runs only inside Arrow-batched mapInPandas on one payload at
a time (multimodal/binary.py); fixtures are tiny. A deployment swaps in
soundfile/ffmpeg behind the same signatures.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

WAV_RIFF = b"RIFF"


@dataclass(frozen=True)
class WavClip:
    sample_rate: int
    channels: int
    bit_depth: int
    samples: np.ndarray  # interleaved int32; LINEAR values (mu-law pre-decoded)
    audio_format: int = 1  # 1 = linear PCM, 7 = G.711 mu-law source

    @property
    def n_frames(self) -> int:
        return int(self.samples.size) // self.channels

    def duration_ms(self) -> float:
        return 1000.0 * self.n_frames / self.sample_rate

    def mean_abs(self) -> float:
        """Mean absolute amplitude over every sample. Only UNSIGNED
        linear 8-bit PCM (audio_format 1) is centered on 128 per the PCM
        spec; mu-law (audio_format 7) decodes to SIGNED linear values
        even though the stored code width is 8 bits, so it takes no
        offset — applying one would skew any asymmetric or low-amplitude
        clip."""
        n = int(self.samples.size)
        if n == 0:
            return 0.0
        off = 128 if (self.bit_depth == 8 and self.audio_format == 1) else 0
        # int64 accumulator then one float division: identical result to
        # the scalar sum(abs(...))/n fold, at numpy speed
        total = int(np.abs(self.samples.astype(np.int64) - off).sum())
        return total / n


# --- G.711 mu-law companding (ITU-T G.711, the canonical algebra) ---

_ULAW_BIAS = 0x84
_ULAW_CLIP = 32635


import functools


@functools.lru_cache(maxsize=None)
def linear_to_ulaw(s: int) -> int:
    # memoized: fixtures and telephony audio reuse few distinct levels,
    # and the cache turns the per-sample bit walk into a dict hit
    sign = 0x80 if s < 0 else 0
    if s < 0:
        s = -s
    if s > _ULAW_CLIP:
        s = _ULAW_CLIP
    s += _ULAW_BIAS
    exponent = 7
    mask = 0x4000
    while exponent > 0 and not (s & mask):
        exponent -= 1
        mask >>= 1
    mantissa = (s >> (exponent + 3)) & 0x0F
    return ~(sign | (exponent << 4) | mantissa) & 0xFF


def ulaw_to_linear(u: int) -> int:
    u = ~u & 0xFF
    sign = u & 0x80
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    s = (((mantissa << 3) + _ULAW_BIAS) << exponent) - _ULAW_BIAS
    return -s if sign else s


# 256-entry expand table (numpy): decode is one vectorized LUT index
_ULAW_TABLE = None  # filled below ulaw_to_linear

# segment edges for the vectorized compander: biased magnitude in
# [2^(e+7), 2^(e+8)) has exponent e for e>=1; below 256 it's e=0
_ULAW_EDGES = np.array([1 << k for k in range(8, 15)], dtype=np.int64)


def _ulaw_encode_array(arr: np.ndarray) -> bytes:
    """Vectorized ITU-T G.711 compander: identical output to the scalar
    linear_to_ulaw bit walk (equality asserted over the full 16-bit
    domain in tests), at numpy speed for long clips."""
    arr = arr.astype(np.int64)
    sign = np.where(arr < 0, 0x80, 0)
    mag = np.minimum(np.abs(arr), _ULAW_CLIP) + _ULAW_BIAS
    exp = np.searchsorted(_ULAW_EDGES, mag, side="right")
    mant = (mag >> (exp + 3)) & 0x0F
    return ((~(sign | (exp << 4) | mant)) & 0xFF).astype(np.uint8).tobytes()


def encode_wav(samples, sample_rate: int, channels: int = 1,
               bit_depth: int = 16, audio_format: int = 1) -> bytes:
    """Encode interleaved samples (list or numpy array) as a canonical
    RIFF/WAVE file.

    audio_format 1: linear PCM at bit_depth. audio_format 7: G.711
    mu-law — `samples` are LINEAR values, companded here (bit_depth is
    forced to 8, the mu-law code width)."""
    arr = np.asarray(samples, dtype=np.int64)
    n = int(arr.size)
    if audio_format == 7:
        bit_depth = 8
        data = _ulaw_encode_array(arr)
    elif bit_depth == 16:
        if n and not (int(arr.min()) >= -32768 and int(arr.max()) <= 32767):
            raise ValueError("16-bit samples must be in [-32768, 32767]")
        data = arr.astype("<i2").tobytes()
    elif bit_depth == 8:
        if n and not (int(arr.min()) >= 0 and int(arr.max()) <= 255):
            raise ValueError("8-bit samples must be in [0, 255]")
        data = arr.astype(np.uint8).tobytes()
    else:
        raise ValueError("only 8- and 16-bit PCM supported")
    block_align = channels * bit_depth // 8
    fmt = struct.pack("<HHIIHH", audio_format, channels, sample_rate,
                      sample_rate * block_align, block_align, bit_depth)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return WAV_RIFF + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> WavClip:
    """Parse a RIFF/WAVE PCM payload; skips unknown chunks by size."""
    if payload[:4] != WAV_RIFF or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV: missing RIFF/WAVE header")
    pos = 12
    fmt = None
    data = None
    n_fact = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"fact":
            (n_fact,) = struct.unpack("<I", body[:4])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, channels, sample_rate, _, block_align, bit_depth = fmt
    if audio_format == WAVE_FORMAT_IMA_ADPCM:
        if channels != 1:
            raise ValueError("IMA-ADPCM decode is mono-only here")
        return WavClip(sample_rate=sample_rate, channels=1, bit_depth=4,
                       samples=_decode_adpcm_data(data, block_align,
                                                  n_fact),
                       audio_format=WAVE_FORMAT_IMA_ADPCM)
    if audio_format == 7:
        codes = np.frombuffer(data, dtype=np.uint8)
        return WavClip(sample_rate=sample_rate, channels=channels,
                       bit_depth=8,
                       samples=_ULAW_TABLE[codes],
                       audio_format=7)
    if audio_format != 1:
        raise ValueError(
            f"only PCM (1) and mu-law (7) supported, got {audio_format}")
    if bit_depth == 16:
        samples = np.frombuffer(data, dtype="<i2").astype(np.int32)
    elif bit_depth == 8:
        samples = np.frombuffer(data, dtype=np.uint8).astype(np.int32)
    else:
        raise ValueError(f"unsupported bit depth {bit_depth}")
    return WavClip(sample_rate=sample_rate, channels=channels,
                   bit_depth=bit_depth, samples=samples)


_ULAW_TABLE = np.array([ulaw_to_linear(u) for u in range(256)],
                       dtype=np.int32)


# ---------------------------------------------------------------------------
# IMA/DVI ADPCM (WAV format tag 0x11) — the classic 4:1 compressed-audio
# codec that is pure public-spec integer algebra (IMA "Recommended
# Practices for Enhancing Digital Audio Compatibility", the same tables
# every implementation ships). Mono only here — the fixture surface this
# repo needs; stereo interleaves 4-byte nibble groups per channel and
# slots in behind the same signatures.

WAVE_FORMAT_IMA_ADPCM = 0x11

_ADPCM_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_ADPCM_INDEX_ADJUST = [-1, -1, -1, -1, 2, 4, 6, 8]


def _adpcm_reconstruct(pred: int, index: int, nibble: int) -> tuple[int, int]:
    """One decoder step: (new predictor, new index)."""
    step = _ADPCM_STEPS[index]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    if nibble & 8:
        diff = -diff
    pred = max(-32768, min(32767, pred + diff))
    index = max(0, min(88, index + _ADPCM_INDEX_ADJUST[nibble & 7]))
    return pred, index


def _adpcm_quantize(diff: int, step: int) -> int:
    """One encoder step: the 4-bit code for a target difference."""
    nibble = 0
    if diff < 0:
        nibble = 8
        diff = -diff
    if diff >= step:
        nibble |= 4
        diff -= step
    if diff >= step >> 1:
        nibble |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        nibble |= 1
    return nibble


def encode_wav_adpcm(samples, sample_rate: int,
                     block_align: int = 256) -> bytes:
    """Encode mono 16-bit samples as an IMA-ADPCM WAV (format 0x11).

    Block layout per spec: 4-byte header (predictor int16 = the block's
    FIRST sample, step index uint8, reserved) + (block_align - 4) nibble
    bytes, low nibble first -> (block_align - 4) * 2 + 1 samples per
    block. The final partial block pads by repeating the last sample; a
    `fact` chunk records the true frame count and decode truncates to
    it. Exactness note the oracle leans on: step[0] = 7 makes the
    zero nibble reconstruct diff = 7 >> 3 = 0, so a CONSTANT signal
    encodes to all-zero nibbles and decodes back bit-exactly.
    """
    arr = np.asarray(samples, dtype=np.int64)
    if arr.size and not (int(arr.min()) >= -32768
                         and int(arr.max()) <= 32767):
        raise ValueError("ADPCM input must be 16-bit samples")
    spb = (block_align - 4) * 2 + 1  # samples per block
    n = int(arr.size)
    data = bytearray()
    index = 0
    i = 0
    while i < n:
        block = list(arr[i:i + spb])
        if len(block) < spb:
            block += [block[-1]] * (spb - len(block))
        pred = int(block[0])
        data += struct.pack("<hBB", pred, index, 0)
        nibbles = []
        for s in block[1:]:
            step = _ADPCM_STEPS[index]
            nib = _adpcm_quantize(int(s) - pred, step)
            pred, index = _adpcm_reconstruct(pred, index, nib)
            nibbles.append(nib)
        for j in range(0, len(nibbles), 2):
            data.append(nibbles[j] | (nibbles[j + 1] << 4))
        i += spb
    fmt = struct.pack("<HHIIHHHH", WAVE_FORMAT_IMA_ADPCM, 1, sample_rate,
                      sample_rate * block_align // spb, block_align, 4,
                      2, spb)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<II", 4, n)
            + b"data" + struct.pack("<I", len(data)) + bytes(data))
    return WAV_RIFF + struct.pack("<I", len(body)) + body


_ADPCM_STEPS_NP = np.array(_ADPCM_STEPS, dtype=np.int64)
_ADPCM_ADJUST_NP = np.array(_ADPCM_INDEX_ADJUST, dtype=np.int64)


def _decode_adpcm_blocks(blocks: np.ndarray) -> np.ndarray:
    """Vectorized IMA decode of FULL same-size blocks (r8): each block's
    header carries its own (predictor, step index), so blocks are
    independent — the feedback loop runs over nibble POSITIONS (2 per
    payload byte) while every block advances in lockstep as numpy int64
    lanes. Identical integer algebra to _adpcm_reconstruct (equality
    asserted against the scalar walk in tests); the scalar one-step
    helper remains the encoder's (its index chains ACROSS blocks, so
    encode is genuinely sequential)."""
    nb, ba = blocks.shape
    pred = blocks[:, 0].astype(np.int64) | (blocks[:, 1].astype(np.int64)
                                            << 8)
    pred = np.where(pred >= 0x8000, pred - 0x10000, pred)  # int16 LE
    index = np.clip(blocks[:, 2].astype(np.int64), 0, 88)
    payload = blocks[:, 4:]
    # low nibble first, then high — interleaved per byte
    nibs = np.empty((nb, 2 * (ba - 4)), dtype=np.int64)
    nibs[:, 0::2] = payload & 0x0F
    nibs[:, 1::2] = payload >> 4
    out = np.empty((nb, 1 + 2 * (ba - 4)), dtype=np.int32)
    out[:, 0] = pred
    for j in range(nibs.shape[1]):
        nib = nibs[:, j]
        step = _ADPCM_STEPS_NP[index]
        diff = (step >> 3)
        diff = diff + np.where(nib & 1, step >> 2, 0)
        diff = diff + np.where(nib & 2, step >> 1, 0)
        diff = diff + np.where(nib & 4, step, 0)
        diff = np.where(nib & 8, -diff, diff)
        pred = np.clip(pred + diff, -32768, 32767)
        index = np.clip(index + _ADPCM_ADJUST_NP[nib & 7], 0, 88)
        out[:, j + 1] = pred
    return out.reshape(-1)


def _decode_adpcm_data(data: bytes, block_align: int,
                       n_frames: int | None) -> np.ndarray:
    n_full = len(data) // block_align
    parts: list[np.ndarray] = []
    if n_full:
        blocks = (np.frombuffer(data, dtype=np.uint8,
                                count=n_full * block_align)
                  .reshape(n_full, block_align))
        parts.append(_decode_adpcm_blocks(blocks))
    tail = data[n_full * block_align:]
    if tail:  # short final block: the scalar walk handles any length
        if len(tail) < 4:
            raise ValueError("truncated ADPCM block header")
        pred, index, _ = struct.unpack("<hBB", tail[:4])
        index = max(0, min(88, index))
        out: list[int] = [pred]
        for byte in tail[4:]:
            for nib in (byte & 0x0F, byte >> 4):
                pred, index = _adpcm_reconstruct(pred, index, nib)
                out.append(pred)
        parts.append(np.array(out, dtype=np.int32))
    samples = (np.concatenate(parts) if parts
               else np.empty(0, dtype=np.int32))
    if n_frames is not None:
        samples = samples[:n_frames]
    return samples.astype(np.int32)
