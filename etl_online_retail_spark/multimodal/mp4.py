"""ISO BMFF (MP4/MOV) container demux — box-tree walk, no codec decode.

The honest boundary for container video in this environment: DEMUXING is
pure structure (ISO/IEC 14496-12 box grammar — public spec) and is
implemented for real; the codec payloads the demux yields (H.264/H.265
access units, AAC frames) stay opaque bytes — decoding them needs
ffmpeg-class libraries this container does not ship. That split mirrors
production sampling pipelines, which demux once and ship opaque sample
ranges to decoder pools.

Implemented grammar: size/type box headers (incl. 64-bit largesize),
containers (moov/trak/mdia/minf/stbl), ftyp brands, mvhd/mdhd timescale +
duration (versions 0 and 1), tkhd dimensions (16.16 fixed), hdlr handler
type, stsd sample-entry fourcc, and the full sample-table walk
(stts/stsc/stsz/stco/co64) that turns chunk offsets into per-sample
(offset, size) ranges — the demux product frame_sample slices.

The builder emits spec-valid minimal files so fixtures are deterministic
and the round trip (build -> demux) is closed-form for the SQL oracle,
exactly the png/jpeg/gif/webp codec-query discipline.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

FTYP_MAGIC_OFFSET = 4  # b"ftyp" at bytes [4:8] of every ISO BMFF file


def is_mp4(data: bytes) -> bool:
    return len(data) >= 8 and data[4:8] == b"ftyp"


@dataclass
class Mp4Track:
    track_id: int
    handler: str          # 'vide' / 'soun' / ...
    codec: str            # sample-entry fourcc, e.g. 'avc1', 'mp4a'
    timescale: int
    duration: int         # in track timescale units
    width: int = 0        # tkhd 16.16 fixed, integer part (video)
    height: int = 0
    samples: list[tuple[int, int]] = field(default_factory=list)  # (off, sz)


@dataclass
class Mp4Info:
    major_brand: str
    timescale: int        # movie timescale (mvhd)
    duration: int         # movie duration in timescale units
    tracks: list[Mp4Track]

    def duration_ms(self) -> int:
        if not self.timescale:
            return 0
        return self.duration * 1000 // self.timescale


_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts"}


def walk_boxes(data: bytes, start: int = 0, end: int | None = None):
    """Yield (type, header_size, body_start, body_end) for each box in
    [start, end); recursion is the caller's choice via _CONTAINERS."""
    end = len(data) if end is None else end
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos:pos + 4])
        btype = data[pos + 4:pos + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack(">Q", data[pos + 8:pos + 16])
            hdr = 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"malformed box {btype!r} at {pos}")
        yield btype, hdr, pos + hdr, pos + size
        pos += size


def _full_box(data: bytes, pos: int) -> tuple[int, int, int]:
    """(version, flags, body_start_after_fullbox_header)."""
    ver = data[pos]
    flags = int.from_bytes(data[pos + 1:pos + 4], "big")
    return ver, flags, pos + 4


def _expand_sample_table(stts, stsc, stsz, chunk_offsets):
    """Chunk offsets + stsc runs + per-sample sizes -> (offset, size) per
    sample, the 14496-12 8.7 walk."""
    n_samples = len(stsz)
    # stsc: list of (first_chunk, samples_per_chunk); expand to per-chunk
    per_chunk = []
    for i, (first, spc) in enumerate(stsc):
        last = (stsc[i + 1][0] - 1) if i + 1 < len(stsc) else len(chunk_offsets)
        per_chunk.extend([spc] * (last - first + 1))
    samples = []
    si = 0
    for ci, coff in enumerate(chunk_offsets):
        off = coff
        for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
            if si >= n_samples:
                break
            samples.append((off, stsz[si]))
            off += stsz[si]
            si += 1
    if si != n_samples:
        raise ValueError(f"sample table inconsistent: placed {si} of "
                         f"{n_samples} samples")
    return samples


def demux_mp4(data: bytes) -> Mp4Info:
    """Parse the box tree into movie + per-track metadata and per-sample
    (offset, size) ranges. Raises ValueError on malformed structure."""
    if not is_mp4(data):
        raise ValueError("not an ISO BMFF file (no ftyp)")
    major = ""
    mv_timescale = mv_duration = 0
    tracks: list[Mp4Track] = []

    def parse_stbl(body_start: int, body_end: int, trk: Mp4Track) -> None:
        stts: list[tuple[int, int]] = []
        stsc: list[tuple[int, int]] = []
        stsz: list[int] = []
        offsets: list[int] = []
        for bt, _, bs, be in walk_boxes(data, body_start, body_end):
            if bt == b"stsd":
                _, _, p = _full_box(data, bs)
                (n_entries,) = struct.unpack(">I", data[p:p + 4])
                if n_entries >= 1:
                    trk.codec = data[p + 8:p + 12].decode("latin-1")
            elif bt == b"stts":
                _, _, p = _full_box(data, bs)
                (n,) = struct.unpack(">I", data[p:p + 4])
                for i in range(n):
                    c, d = struct.unpack(">II", data[p + 4 + 8 * i:
                                                     p + 12 + 8 * i])
                    stts.append((c, d))
            elif bt == b"stsc":
                _, _, p = _full_box(data, bs)
                (n,) = struct.unpack(">I", data[p:p + 4])
                for i in range(n):
                    fc, spc, _sdi = struct.unpack(
                        ">III", data[p + 4 + 12 * i:p + 16 + 12 * i])
                    stsc.append((fc, spc))
            elif bt == b"stsz":
                _, _, p = _full_box(data, bs)
                fixed, n = struct.unpack(">II", data[p:p + 8])
                if fixed:
                    stsz = [fixed] * n
                else:
                    stsz = list(struct.unpack(
                        f">{n}I", data[p + 8:p + 8 + 4 * n]))
            elif bt in (b"stco", b"co64"):
                _, _, p = _full_box(data, bs)
                (n,) = struct.unpack(">I", data[p:p + 4])
                fmt, w = (">Q", 8) if bt == b"co64" else (">I", 4)
                offsets = [struct.unpack(fmt, data[p + 4 + w * i:
                                                   p + 4 + w * (i + 1)])[0]
                           for i in range(n)]
        if stsz and offsets and stsc:
            trk.samples = _expand_sample_table(stts, stsc, stsz, offsets)

    def parse_trak(body_start: int, body_end: int) -> None:
        trk = Mp4Track(0, "", "", 0, 0)
        for bt, _, bs, be in walk_boxes(data, body_start, body_end):
            if bt == b"tkhd":
                ver, _, p = _full_box(data, bs)
                # v0 body: c(4) m(4) id(4) res(4) dur(4) res(8)
                #          layer/alt/vol/res(8) matrix(36) w(4) h(4)
                if ver == 1:
                    (trk.track_id,) = struct.unpack(">I", data[p + 16:p + 20])
                    geo = p + 84
                else:
                    (trk.track_id,) = struct.unpack(">I", data[p + 8:p + 12])
                    geo = p + 72
                w, h = struct.unpack(">II", data[geo:geo + 8])
                trk.width, trk.height = w >> 16, h >> 16
            elif bt == b"mdia":
                for bt2, _, bs2, be2 in walk_boxes(data, bs, be):
                    if bt2 == b"mdhd":
                        ver, _, p = _full_box(data, bs2)
                        if ver == 1:
                            trk.timescale, trk.duration = struct.unpack(
                                ">IQ", data[p + 16:p + 28])
                        else:
                            trk.timescale, trk.duration = struct.unpack(
                                ">II", data[p + 8:p + 16])
                    elif bt2 == b"hdlr":
                        _, _, p = _full_box(data, bs2)
                        trk.handler = data[p + 4:p + 8].decode("latin-1")
                    elif bt2 == b"minf":
                        for bt3, _, bs3, be3 in walk_boxes(data, bs2, be2):
                            if bt3 == b"stbl":
                                parse_stbl(bs3, be3, trk)
        tracks.append(trk)

    for btype, _, bs, be in walk_boxes(data):
        if btype == b"ftyp":
            major = data[bs:bs + 4].decode("latin-1")
        elif btype == b"moov":
            for bt, _, bs2, be2 in walk_boxes(data, bs, be):
                if bt == b"mvhd":
                    ver, _, p = _full_box(data, bs2)
                    if ver == 1:
                        mv_timescale, mv_duration = struct.unpack(
                            ">IQ", data[p + 16:p + 28])
                    else:
                        mv_timescale, mv_duration = struct.unpack(
                            ">II", data[p + 8:p + 16])
                elif bt == b"trak":
                    parse_trak(bs2, be2)
    return Mp4Info(major, mv_timescale, mv_duration, tracks)


def extract_samples(data: bytes, track: Mp4Track,
                    every_n: int = 1) -> list[tuple[int, bytes]]:
    """Slice every n-th sample's bytes out of the file — opaque codec
    payloads (e.g. H.264 AUs), NOT decoded pixels."""
    out = []
    for i in range(0, len(track.samples), every_n):
        off, sz = track.samples[i]
        if off + sz > len(data):
            raise ValueError(f"sample {i} range [{off}, {off + sz}) runs "
                             "past end of file")
        out.append((i, data[off:off + sz]))
    return out


# ---------------------------------------------------------------------------
# builder (fixtures; also the write half of the round-trip tests)

def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _full(btype: bytes, ver: int, flags: int, body: bytes) -> bytes:
    return _box(btype, bytes([ver]) + flags.to_bytes(3, "big") + body)


def build_mp4(samples: list[bytes], *, major_brand: str = "isom",
              timescale: int = 1000, duration: int | None = None,
              handler: str = "vide", codec: str = "avc1",
              width: int = 0, height: int = 0,
              samples_per_chunk: int = 2) -> bytes:
    """Emit a minimal spec-valid single-track MP4 holding `samples` as
    opaque payloads, chunked `samples_per_chunk` at a time (so stsc/stco
    really get exercised). duration defaults to 100 units per sample."""
    n = len(samples)
    duration = 100 * n if duration is None else duration

    ftyp = _box(b"ftyp", major_brand.encode("latin-1") + b"\x00\x00\x02\x00"
                + b"isomiso2mp41")

    # sample entry: 8-byte reserved header + data-reference-index; enough
    # for a fourcc-reading demuxer, padded to VisualSampleEntry length for
    # video handlers
    entry_body = b"\x00" * 6 + struct.pack(">H", 1)
    if handler == "vide":
        entry_body += b"\x00" * 70  # pre_defined/reserved/geometry fields
    entry = _box(codec.encode("latin-1"), entry_body)
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, 100))
    # chunks of samples_per_chunk (last chunk may be short — encoded as a
    # second stsc run, the shape real muxers emit)
    full_chunks, rem = divmod(n, samples_per_chunk)
    stsc_runs = []
    if full_chunks:
        stsc_runs.append((1, samples_per_chunk, 1))
    if rem:
        stsc_runs.append((full_chunks + 1, rem, 1))
    if not stsc_runs:
        stsc_runs.append((1, 1, 1))
    stsc = _full(b"stsc", 0, 0, struct.pack(">I", len(stsc_runs))
                 + b"".join(struct.pack(">III", *r) for r in stsc_runs))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", len(s)) for s in samples))
    n_chunks = full_chunks + (1 if rem else 0)
    # chunk offsets are absolute file offsets into mdat — computed after
    # we know every header size, so build stco with placeholders first
    stco_body = struct.pack(">I", n_chunks) + b"\x00" * (4 * n_chunks)
    stco = _full(b"stco", 0, 0, stco_body)
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)

    vmhd = _full(b"vmhd", 0, 1, b"\x00" * 8)
    dinf = _box(b"dinf", _full(b"dref", 0, 0, struct.pack(">I", 1)
                               + _full(b"url ", 0, 1, b"")))
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4 + handler.encode("latin-1")
                 + b"\x00" * 12 + b"demux\x00")
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIII", 0, 0, timescale,
                                            duration)
                 + struct.pack(">HH", 0x55C4, 0))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", 0, 7, struct.pack(">IIII", 0, 0, 1, 0)
                 + struct.pack(">I", duration) + b"\x00" * 8
                 + struct.pack(">HHHH", 0, 0, 0, 0)
                 + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0,
                               0, 0, 0x40000000)
                 + struct.pack(">II", width << 16, height << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(b"mvhd", 0, 0, struct.pack(">IIII", 0, 0, timescale,
                                            duration)
                 + struct.pack(">I", 0x10000) + struct.pack(">H", 0x0100)
                 + b"\x00" * 10
                 + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0,
                               0, 0, 0x40000000)
                 + b"\x00" * 24 + struct.pack(">I", 2))
    moov = _box(b"moov", mvhd + trak)

    mdat_payload = b"".join(samples)
    header_len = len(ftyp) + len(moov)
    mdat_body_start = header_len + 8
    out = bytearray(ftyp + moov + _box(b"mdat", mdat_payload))
    # patch real chunk offsets into stco
    offsets = []
    off = mdat_body_start
    chunk_sizes = []
    i = 0
    while i < n:
        take = min(samples_per_chunk, n - i)
        chunk_sizes.append(sum(len(s) for s in samples[i:i + take]))
        i += take
    for cs in chunk_sizes:
        offsets.append(off)
        off += cs
    stco_pos = bytes(out).find(b"stco")
    patch = stco_pos + 4 + 4 + 4  # type + fullbox header + entry count
    for ci, o in enumerate(offsets):
        out[patch + 4 * ci:patch + 4 * (ci + 1)] = struct.pack(">I", o)
    return bytes(out)
