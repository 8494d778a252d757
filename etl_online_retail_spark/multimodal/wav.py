"""Minimal pure-stdlib WAV (RIFF/PCM) codec.

Third media family (after PNG/JPEG images and MJPEG video): linear PCM
audio in a RIFF container — the interchange format audio training
pipelines ingest before feature extraction. struct is enough: RIFF/WAVE
header, fmt chunk (linear PCM format 1, 8- or 16-bit, or G.711 mu-law
format 7 — the telephony companding every speech corpus eventually
meets, decoded through the ITU algebra below), data chunk of interleaved
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
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, channels, sample_rate, _, _, bit_depth = fmt
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
