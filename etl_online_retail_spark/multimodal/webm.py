"""WebM/Matroska (EBML) container demux — element-tree walk, no codec
decode.

The sibling of multimodal/mp4.py for the other container a video crawl
meets: DEMUXING is pure public-spec structure (the EBML grammar of RFC
8794 plus the Matroska/WebM element IDs) and runs for real; the VP8/VP9/
Opus payloads the demux yields stay opaque bytes — decoding them needs
ffmpeg-class libraries this container does not ship.

Implemented grammar: EBML variable-length integers (both the ID form,
which keeps its marker bit, and the size form, which strips it), the
EBML header, Segment > Info (TimestampScale, Duration), Tracks >
TrackEntry (number, type, CodecID, Video PixelWidth/PixelHeight), and
Cluster > Timestamp + SimpleBlock (track varint + relative timestamp +
flags + payload) — the full path from file bytes to per-frame opaque
payloads.

The builder emits spec-valid minimal files so fixtures are deterministic
and build -> demux is closed-form for the SQL oracle — the same
discipline as the mp4 and image-codec queries.
"""

from __future__ import annotations

from dataclasses import dataclass, field

EBML_MAGIC = b"\x1aE\xdf\xa3"

# element IDs (with marker bit, as they appear on the wire)
_EBML = 0x1A45DFA3
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIXEL_W = 0xB0
_PIXEL_H = 0xBA
_CLUSTER = 0x1F43B675
_CLUSTER_TS = 0xE7
_SIMPLE_BLOCK = 0xA3
_DOCTYPE = 0x4282


def is_webm(data: bytes) -> bool:
    return data[:4] == EBML_MAGIC


def read_varint(data: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """Decode one EBML vint at pos -> (value, next_pos). IDs keep the
    length-marker bit (they are matched with it); sizes strip it."""
    if pos >= len(data):
        raise ValueError("EBML vint past end of data")
    first = data[pos]
    if first == 0:
        raise ValueError("invalid EBML vint (leading zero byte)")
    length = 8 - first.bit_length() + 1
    if pos + length > len(data):
        raise ValueError("truncated EBML vint")
    value = first if keep_marker else first & ((1 << (8 - length)) - 1)
    for i in range(1, length):
        value = (value << 8) | data[pos + i]
    return value, pos + length


def _read_element(data: bytes, pos: int) -> tuple[int, int, int]:
    """(element id, body_start, body_end) for the element at pos."""
    eid, p = read_varint(data, pos, keep_marker=True)
    size, p = read_varint(data, p, keep_marker=False)
    if p + size > len(data):
        raise ValueError(f"element 0x{eid:X} overruns the file")
    return eid, p, p + size


def walk_elements(data: bytes, start: int, end: int):
    pos = start
    while pos < end:
        eid, bs, be = _read_element(data, pos)
        yield eid, bs, be
        pos = be


def _uint(data: bytes, bs: int, be: int) -> int:
    return int.from_bytes(data[bs:be], "big")


@dataclass
class WebmTrack:
    number: int = 0
    track_type: int = 0   # 1 = video, 2 = audio
    codec_id: str = ""
    width: int = 0
    height: int = 0
    frames: list[tuple[int, bytes]] = field(default_factory=list)
    # (absolute timestamp in scale units, opaque payload)


@dataclass
class WebmInfo:
    doctype: str
    timestamp_scale: int   # ns per timestamp unit
    duration_units: float  # Duration element (timestamp units)
    tracks: list[WebmTrack]

    def duration_ms(self) -> int:
        return int(self.duration_units * self.timestamp_scale // 1_000_000)


def demux_webm(data: bytes) -> WebmInfo:
    """Parse EBML header + Segment into movie/track metadata and every
    SimpleBlock's (timestamp, opaque payload) per track."""
    if not is_webm(data):
        raise ValueError("not an EBML/WebM file")
    doctype = ""
    tscale = 1_000_000  # Matroska default
    duration = 0.0
    tracks: dict[int, WebmTrack] = {}

    for eid, bs, be in walk_elements(data, 0, len(data)):
        if eid == _EBML:
            for eid2, bs2, be2 in walk_elements(data, bs, be):
                if eid2 == _DOCTYPE:
                    doctype = data[bs2:be2].decode("latin-1")
        elif eid == _SEGMENT:
            cluster_ts = 0
            for eid2, bs2, be2 in walk_elements(data, bs, be):
                if eid2 == _INFO:
                    for e3, b3, e3e in walk_elements(data, bs2, be2):
                        if e3 == _TIMESTAMP_SCALE:
                            tscale = _uint(data, b3, e3e)
                        elif e3 == _DURATION:
                            import struct as _s
                            w = e3e - b3
                            duration = _s.unpack(
                                ">f" if w == 4 else ">d",
                                data[b3:e3e])[0]
                elif eid2 == _TRACKS:
                    for e3, b3, e3e in walk_elements(data, bs2, be2):
                        if e3 != _TRACK_ENTRY:
                            continue
                        trk = WebmTrack()
                        for e4, b4, e4e in walk_elements(data, b3, e3e):
                            if e4 == _TRACK_NUMBER:
                                trk.number = _uint(data, b4, e4e)
                            elif e4 == _TRACK_TYPE:
                                trk.track_type = _uint(data, b4, e4e)
                            elif e4 == _CODEC_ID:
                                trk.codec_id = data[b4:e4e].decode("latin-1")
                            elif e4 == _VIDEO:
                                for e5, b5, e5e in walk_elements(data, b4,
                                                                 e4e):
                                    if e5 == _PIXEL_W:
                                        trk.width = _uint(data, b5, e5e)
                                    elif e5 == _PIXEL_H:
                                        trk.height = _uint(data, b5, e5e)
                        tracks[trk.number] = trk
                elif eid2 == _CLUSTER:
                    cluster_ts = 0
                    for e3, b3, e3e in walk_elements(data, bs2, be2):
                        if e3 == _CLUSTER_TS:
                            cluster_ts = _uint(data, b3, e3e)
                        elif e3 == _SIMPLE_BLOCK:
                            tn, p = read_varint(data, b3, keep_marker=False)
                            rel = int.from_bytes(data[p:p + 2], "big",
                                                 signed=True)
                            flags = data[p + 2]
                            if flags & 0x06:
                                # laced block: the body is several frames
                                # plus lace-size headers — slicing it as
                                # ONE payload would silently hand a
                                # corrupted frame downstream
                                raise NotImplementedError(
                                    "laced SimpleBlocks are not supported"
                                    " by this demuxer (lacing bits set in"
                                    f" flags 0x{flags:02X})")
                            payload = data[p + 3:e3e]  # skip flags byte
                            if tn in tracks:
                                tracks[tn].frames.append(
                                    (cluster_ts + rel, payload))
    return WebmInfo(doctype, tscale, duration, list(tracks.values()))


def extract_frames(info: WebmInfo, track_type: int = 1,
                   every_n: int = 1) -> list[tuple[int, bytes]]:
    """Every n-th (index, opaque payload) of the first track of the given
    type — VP8/VP9 frames as bytes, NOT decoded pixels."""
    trk = next((t for t in info.tracks if t.track_type == track_type), None)
    if trk is None or not trk.frames:
        raise ValueError("no frames for the requested track type")
    return [(i, trk.frames[i][1])
            for i in range(0, len(trk.frames), every_n)]


# ---------------------------------------------------------------------------
# builder

def _vint_size(value: int) -> bytes:
    """Encode a SIZE vint (marker in the first byte) in the smallest
    width that fits."""
    for length in range(1, 9):
        if value < (1 << (7 * length)) - 1:
            out = value | (1 << (7 * length))
            return out.to_bytes(length, "big")
    raise ValueError("size too large for an EBML vint")


def _eid(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _el(eid: int, body: bytes) -> bytes:
    return _eid(eid) + _vint_size(len(body)) + body


def _uint_el(eid: int, value: int) -> bytes:
    width = max(1, (value.bit_length() + 7) // 8)
    return _el(eid, value.to_bytes(width, "big"))


def build_webm(frames: list[bytes], *, codec_id: str = "V_VP9",
               width: int = 0, height: int = 0,
               timestamp_scale: int = 1_000_000,
               frame_duration: int = 40,
               frames_per_cluster: int = 3) -> bytes:
    """Emit a minimal spec-valid WebM: one video track, `frames` as
    SimpleBlock payloads spread over clusters of `frames_per_cluster`
    (cluster timestamps advance so relative block times are exercised)."""
    import struct as _s

    ebml = _el(_EBML, _uint_el(0x4286, 1)        # EBMLVersion
               + _uint_el(0x42F7, 1)             # EBMLReadVersion
               + _uint_el(0x42F2, 4)             # EBMLMaxIDLength
               + _uint_el(0x42F3, 8)             # EBMLMaxSizeLength
               + _el(_DOCTYPE, b"webm")
               + _uint_el(0x4287, 2)             # DocTypeVersion
               + _uint_el(0x4285, 2))            # DocTypeReadVersion
    duration = float(len(frames) * frame_duration)
    info = _el(_INFO, _uint_el(_TIMESTAMP_SCALE, timestamp_scale)
               + _el(_DURATION, _s.pack(">d", duration)))
    video = _el(_VIDEO, _uint_el(_PIXEL_W, width)
                + _uint_el(_PIXEL_H, height)) if width else b""
    entry = _el(_TRACK_ENTRY, _uint_el(_TRACK_NUMBER, 1)
                + _uint_el(0x73C5, 1)            # TrackUID
                + _uint_el(_TRACK_TYPE, 1)
                + _el(_CODEC_ID, codec_id.encode("latin-1"))
                + video)
    tracks = _el(_TRACKS, entry)
    clusters = b""
    for c0 in range(0, len(frames), frames_per_cluster):
        cts = c0 * frame_duration
        body = _uint_el(_CLUSTER_TS, cts)
        for i, fr in enumerate(frames[c0:c0 + frames_per_cluster]):
            rel = i * frame_duration
            body += _el(_SIMPLE_BLOCK,
                        _vint_size(1)            # track number vint
                        + rel.to_bytes(2, "big", signed=True)
                        + b"\x80"                # flags: keyframe
                        + fr)
        clusters += body and _el(_CLUSTER, body)
    segment = _el(_SEGMENT, info + tracks + clusters)
    return ebml + segment
