"""Minimal pure-stdlib WAV (RIFF/PCM) codec.

Third media family (after PNG/JPEG images and MJPEG video): linear PCM
audio in a RIFF container — the interchange format audio training
pipelines ingest before feature extraction. struct is enough: RIFF/WAVE
header, fmt chunk (PCM format 1, 8- or 16-bit), data chunk of interleaved
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

WAV_RIFF = b"RIFF"


@dataclass(frozen=True)
class WavClip:
    sample_rate: int
    channels: int
    bit_depth: int
    samples: list[int]  # interleaved, signed (16-bit) or unsigned (8-bit)

    @property
    def n_frames(self) -> int:
        return len(self.samples) // self.channels

    def duration_ms(self) -> float:
        return 1000.0 * self.n_frames / self.sample_rate

    def mean_abs(self) -> float:
        """Mean absolute amplitude over every sample (8-bit is centered
        on 128 per the PCM spec before taking the magnitude)."""
        if not self.samples:
            return 0.0
        off = 128 if self.bit_depth == 8 else 0
        return sum(abs(s - off) for s in self.samples) / len(self.samples)


def encode_wav(samples: list[int], sample_rate: int, channels: int = 1,
               bit_depth: int = 16) -> bytes:
    """Encode interleaved PCM samples as a canonical RIFF/WAVE file."""
    if bit_depth == 16:
        if any(not -32768 <= s <= 32767 for s in samples):
            raise ValueError("16-bit samples must be in [-32768, 32767]")
        data = struct.pack(f"<{len(samples)}h", *samples)
    elif bit_depth == 8:
        if any(not 0 <= s <= 255 for s in samples):
            raise ValueError("8-bit samples must be in [0, 255]")
        data = bytes(samples)
    else:
        raise ValueError("only 8- and 16-bit PCM supported")
    block_align = channels * bit_depth // 8
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
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
    if audio_format != 1:
        raise ValueError(f"only PCM (format 1) supported, got {audio_format}")
    if bit_depth == 16:
        samples = list(struct.unpack(f"<{len(data) // 2}h", data))
    elif bit_depth == 8:
        samples = list(data)
    else:
        raise ValueError(f"unsupported bit depth {bit_depth}")
    return WavClip(sample_rate=sample_rate, channels=channels,
                   bit_depth=bit_depth, samples=samples)
