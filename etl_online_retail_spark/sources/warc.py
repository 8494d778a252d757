"""WARC web-archive source (ISO 28500) — the crawl-ingest format.

A pretraining-data pipeline's raw input is a web crawl, and web crawls
ship as WARC: Common Crawl alone publishes petabytes of `.warc.gz`.
This implements the record grammar from the PUBLIC ISO 28500 / WARC 1.0
specification with nothing but the stdlib: a `WARC/1.0` version line,
`Name: value` named fields, `Content-Length` payload framing, and a
two-CRLF record separator — plus the per-record-gzip-MEMBER convention
(each record its own gzip member, concatenated) that real `.warc.gz`
files use, because it is what makes a 100 TB archive SPLITTABLE: a
reader can start at any member boundary without decompressing the
prefix. The parser walks members one `zlib.decompressobj` at a time
(the `unused_data` tail is the next member), so the split-at-member
property is exercised, not just claimed.

HTTP response payloads (`WARC-Type: response`, the record kind a
curation pipeline actually reads) are parsed one level deeper: status
line, headers, body — the body is what flows on to HTML text
extraction (functions/html_text.py), quality scoring, language ID and
dedup (operators/curation.py), completing the crawl -> curated-corpus
chain end to end.

Scale shape: archives arrive as opaque binary payloads (one row per
archive shard, exactly how CC shards land in object storage); record
explosion runs map-only inside Arrow-batched mapInPandas — no shuffle,
embarrassingly parallel, the same plumbing contract as the multimodal
codecs (multimodal/binary.py). The reference has no crawl surface (its
world is Excel -> Postgres retail, etl.py:46-269); this module extends
the LLM-data-pipeline surface the engine adds on top.
"""

from __future__ import annotations

import gzip
import zlib
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF = b"\r\n"
_SEP = b"\r\n\r\n"
_GZ_CHUNK = 1 << 20  # bounded decompressor feed (see parse_warc)


@dataclass
class WarcRecord:
    warc_type: str
    headers: dict[str, str]  # original-case keys; lookups use .get_ci
    payload: bytes

    def header(self, name: str, default: str | None = None) -> str | None:
        """Case-insensitive field lookup (ISO 28500 §5: field names are
        case-insensitive)."""
        low = name.lower()
        for k, v in self.headers.items():
            if k.lower() == low:
                return v
        return default


def format_warc_record(warc_type: str, headers: dict[str, str],
                       payload: bytes) -> bytes:
    """One record: version line, named fields (WARC-Type and
    Content-Length are owned by the serializer), blank line, payload,
    two-CRLF separator."""
    lines = [b"WARC/1.0"]
    lines.append(b"WARC-Type: " + warc_type.encode("ascii"))
    for k, v in headers.items():
        if k.lower() in ("warc-type", "content-length"):
            raise ValueError(f"header {k!r} is serializer-owned")
        lines.append(f"{k}: {v}".encode("utf-8"))
    lines.append(b"Content-Length: " + str(len(payload)).encode("ascii"))
    return _CRLF.join(lines) + _SEP + payload + _SEP


def build_warc(records: list[tuple[str, dict[str, str], bytes]],
               per_record_gzip: bool = False) -> bytes:
    """Serialize records into one archive. per_record_gzip=True emits
    the `.warc.gz` convention: each record compressed as its OWN gzip
    member, members concatenated (the splittability contract; a whole-
    file gzip stream would force serial decompression of 100 TB)."""
    out = bytearray()
    for warc_type, headers, payload in records:
        raw = format_warc_record(warc_type, headers, payload)
        out += gzip.compress(raw, mtime=0) if per_record_gzip else raw
    return bytes(out)


def _parse_one(data: bytes, pos: int) -> tuple[WarcRecord, int]:
    end_hdr = data.find(_SEP, pos)
    if end_hdr < 0:
        raise ValueError("WARC record missing header terminator")
    head = data[pos:end_hdr].split(_CRLF)
    if not head[0].startswith(b"WARC/"):
        raise ValueError(f"not a WARC record at offset {pos}")
    headers: dict[str, str] = {}
    for line in head[1:]:
        k, _, v = line.partition(b":")
        headers[k.decode("utf-8").strip()] = v.decode("utf-8").strip()
    rec = WarcRecord("", headers, b"")
    length = rec.header("Content-Length")
    if length is None:
        raise ValueError("WARC record missing Content-Length")
    body_start = end_hdr + len(_SEP)
    body_end = body_start + int(length)
    if data[body_end:body_end + len(_SEP)] != _SEP:
        raise ValueError("WARC record missing two-CRLF separator")
    rec.warc_type = rec.header("WARC-Type", "") or ""
    rec.payload = data[body_start:body_end]
    return rec, body_end + len(_SEP)


def parse_warc(data: bytes) -> list[WarcRecord]:
    """All records of one archive. Sniffs the gzip magic: a `.warc.gz`
    is decompressed member-by-member (each member = one record region),
    proving the member-boundary split a distributed reader relies on;
    plain archives walk Content-Length frames directly."""
    if data[:2] == b"\x1f\x8b":
        # feed each member BOUNDED chunks off a zero-copy memoryview:
        # handing the decompressor the whole remaining tail would make
        # it copy the tail into unused_data after every member — O(M^2)
        # bytes copied over a real crawl shard's tens of thousands of
        # members (r12 review). This walk is linear: per member, copies
        # are the decompressed output plus at most one chunk.
        records: list[WarcRecord] = []
        mv = memoryview(data)
        n = len(data)
        offset = 0
        while offset < n:
            d = zlib.decompressobj(wbits=31)  # one gzip member
            raw = bytearray()
            pos = offset
            while not d.eof and pos < n:
                chunk = mv[pos:pos + _GZ_CHUNK]
                raw += d.decompress(chunk)
                pos += len(chunk)
            if not d.eof:
                raise ValueError("truncated gzip member in WARC archive")
            raw += d.flush()
            offset = pos - len(d.unused_data)
            raw = bytes(raw)
            p = 0
            while p < len(raw):
                rec, p = _parse_one(raw, p)
                records.append(rec)
        return records
    records = []
    pos = 0
    while pos < len(data):
        rec, pos = _parse_one(data, pos)
        records.append(rec)
    return records


# ---------------------------------------------------------------------------
# HTTP payloads (WARC-Type: response carries an application/http message)


def http_response(status: int, reason: str, headers: dict[str, str],
                  body: bytes) -> bytes:
    lines = [f"HTTP/1.1 {status} {reason}".encode("ascii")]
    for k, v in headers.items():
        lines.append(f"{k}: {v}".encode("utf-8"))
    lines.append(f"Content-Length: {len(body)}".encode("ascii"))
    return _CRLF.join(lines) + _SEP + body


def parse_http_response(payload: bytes) -> tuple[int, dict[str, str],
                                                 bytes]:
    """(status, headers, body) from an HTTP/1.x response message."""
    end_hdr = payload.find(_SEP)
    if end_hdr < 0:
        raise ValueError("HTTP payload missing header terminator")
    head = payload[:end_hdr].split(_CRLF)
    parts = head[0].split(b" ", 2)
    if not parts[0].startswith(b"HTTP/") or len(parts) < 2:
        raise ValueError("not an HTTP response payload")
    headers: dict[str, str] = {}
    for line in head[1:]:
        k, _, v = line.partition(b":")
        headers[k.decode("utf-8").strip()] = v.decode("utf-8").strip()
    return int(parts[1]), headers, payload[end_hdr + len(_SEP):]


def _header_ci(headers: dict[str, str], name: str) -> str | None:
    low = name.lower()
    for k, v in headers.items():
        if k.lower() == low:
            return v
    return None


# ---------------------------------------------------------------------------
# Spark plumbing: archive shards -> one row per record

WARC_RECORD_SCHEMA = T.StructType([
    T.StructField("archive_id", T.LongType()),
    T.StructField("rec_seq", T.IntegerType()),
    T.StructField("warc_type", T.StringType()),
    T.StructField("target_uri", T.StringType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("http_status", T.IntegerType()),
    T.StructField("body", T.BinaryType()),
])


def warc_records(archives: DataFrame, id_col: str = "archive_id",
                 content_col: str = "content") -> DataFrame:
    """Explode archive payloads into records, Arrow-batched.

    One output row per WARC record: its type, target URI, content type
    and — for `response` records — the parsed HTTP status and body (the
    content_type then reports the HTTP entity's type, which is what a
    curation filter keys on, not the envelope's application/http).
    Non-response records carry their payload as the body with the
    envelope Content-Type. Map-only: no shuffle is introduced; the
    downstream filter/extract stages decide the partitioning."""
    import pandas as pd

    def explode(batches):
        for pdf in batches:
            out: dict[str, list] = {k.name: [] for k in WARC_RECORD_SCHEMA}
            for aid, blob in zip(pdf[id_col], pdf[content_col]):
                for seq, rec in enumerate(parse_warc(bytes(blob))):
                    ctype = rec.header("Content-Type", "")
                    status = None
                    body = rec.payload
                    if rec.warc_type == "response" and \
                            (ctype or "").startswith("application/http"):
                        status, hh, body = parse_http_response(rec.payload)
                        ctype = _header_ci(hh, "Content-Type") or ""
                    out["archive_id"].append(aid)
                    out["rec_seq"].append(seq)
                    out["warc_type"].append(rec.warc_type)
                    out["target_uri"].append(
                        rec.header("WARC-Target-URI"))
                    out["content_type"].append(ctype)
                    out["http_status"].append(status)
                    out["body"].append(body)
            yield pd.DataFrame(out)

    return (archives.select(id_col, content_col)
            .mapInPandas(explode, WARC_RECORD_SCHEMA))


# ---------------------------------------------------------------------------
# synthetic crawl fixture (the oracle pattern of multimodal/binary.py:
# generator parameters are closed-form in the documents row, so a SQL
# oracle verifies the full build -> parse -> extract path without itself
# touching a byte of WARC)

ARCHIVE_SCHEMA = T.StructType([
    T.StructField("archive_id", T.LongType()),
    T.StructField("content", T.BinaryType()),
])

# no text node outside the <p> payload: title-less head, script/style
# subtrees the extractor must DROP, entities the escape round-trip must
# decode — so extracted text == the document text, bit-equal
CRAWL_HTML_PREFIX = ('<html><head><meta charset="utf-8">'
                     '<style>p{margin:0}</style>'
                     '<script>var n = 1 && 2;</script>'
                     '</head><body><p>')
CRAWL_HTML_SUFFIX = "</p><script>done()</script></body></html>"

# the chrome=True page: the same payload <p> (its first 10 chars wrapped
# in an inline anchor — link density ~0.2, KEPT) surrounded by the site
# chrome a real crawl fights: a nav bar, a related-links list and a
# footer, each ~100% link density — the main-content extractor must
# drop every chrome block and return the document text alone
CHROME_HTML_PREFIX = (
    '<html><head><style>nav{color:red}</style>'
    '<script>var m = "<p>";</script></head><body>'
    '<nav><a href="/">Home</a> <a href="/cat">Products</a> '
    '<a href="/about">About</a></nav>'
    '<ul><li><a href="/r/1">Related page one</a></li>'
    '<li><a href="/r/2">Related page two</a></li></ul><p>')
CHROME_HTML_SUFFIX = (
    '</p><footer><a href="/terms">Terms of use</a> | '
    '<a href="/privacy">Privacy policy</a></footer></body></html>')

_WARCINFO = b"software: etl-online-retail-spark\r\n"


def synthetic_crawl_archives(docs: DataFrame, html: bool = False,
                             chrome: bool = False,
                             id_col: str = "doc_id",
                             source_col: str = "source",
                             text_col: str = "text",
                             uri_col: str | None = None) -> DataFrame:
    """One two-record archive per document — a `warcinfo` record then a
    `response` whose HTTP body is the document text (html=False, the
    WET-style plain-text shape) or an HTML page embedding the escaped
    text (html=True, the raw-crawl shape the extractor consumes). Odd
    ids serialize with per-record gzip members, even ids plain, so both
    archive flavors flow through every downstream query. Repartitioned
    to the session's parallelism before the render loop — same rule as
    the multimodal generators (an unpartitioned source serializes the
    corpus through one task).

    uri_col (r13) overrides the default per-archive Target-URI
    (http://{source}/doc/{archive_id}) — the dedup-gated ingest stream
    needs DISTINCT fetches (archive ids) of the SAME URL, which the
    default's embedded archive_id can never produce."""
    import html as _html

    import pandas as pd

    n = max(1, docs.sparkSession.sparkContext.defaultParallelism)
    uri = (F.col(uri_col) if uri_col is not None
           else F.concat(F.lit("http://"), F.col(source_col),
                         F.lit("/doc/"), F.col(id_col).cast("long")))
    src = (docs.select(F.col(id_col).cast("long").alias("archive_id"),
                       F.col(source_col).alias("_src"),
                       F.col(text_col).alias("_text"),
                       uri.alias("_uri"))
           .repartition(n))

    def render(batches):
        for pdf in batches:
            out_ids, out_blobs = [], []
            for aid, source, text, turi in zip(pdf["archive_id"],
                                               pdf["_src"],
                                               pdf["_text"],
                                               pdf["_uri"]):
                if chrome:
                    # escape() is per-character, so escaping the two
                    # slices separately equals escaping the whole text.
                    # The inline anchor covers at most a QUARTER of the
                    # text (capped at 10 chars), so the payload block's
                    # link density stays <= 0.25 for EVERY text length —
                    # a fixed 10-char anchor would cross the extractor's
                    # 0.5 threshold for texts of <= 20 chars and the
                    # oracle would mismatch at whatever SF first ships
                    # one (r12 review).
                    k = min(10, len(text) // 4)
                    body = (CHROME_HTML_PREFIX
                            + '<a href="/self">' + _html.escape(text[:k])
                            + "</a>" + _html.escape(text[k:])
                            + CHROME_HTML_SUFFIX).encode("utf-8")
                    ctype = "text/html; charset=utf-8"
                elif html:
                    body = (CRAWL_HTML_PREFIX + _html.escape(text)
                            + CRAWL_HTML_SUFFIX).encode("utf-8")
                    ctype = "text/html; charset=utf-8"
                else:
                    body = text.encode("utf-8")
                    ctype = "text/plain; charset=utf-8"
                payload = http_response(200, "OK",
                                        {"Content-Type": ctype}, body)
                records = [
                    ("warcinfo",
                     {"Content-Type": "application/warc-fields",
                      "WARC-Date": "2026-08-16T00:00:00Z"},
                     _WARCINFO),
                    ("response",
                     {"WARC-Target-URI": str(turi),
                      "WARC-Date": "2026-08-16T00:00:00Z",
                      "Content-Type":
                          "application/http;msgtype=response"},
                     payload),
                ]
                out_ids.append(aid)
                out_blobs.append(
                    build_warc(records, per_record_gzip=bool(aid % 2)))
            yield pd.DataFrame({"archive_id": out_ids,
                                "content": out_blobs})

    return src.mapInPandas(render, ARCHIVE_SCHEMA)


# ---------------------------------------------------------------------------
# WARC shard EXPORT: the write side of the interchange — a curated
# corpus handed back to crawl-ecosystem tooling as standard .warc.gz
# shard files (conversion records, the WET shape). Same discipline as
# the WebDataset exporter (multimodal/wds.py): deterministic hash-bucket
# shard assignment, records sorted by id within a shard, one
# applyInPandas group task assembles each shard file, nothing
# driver-side touches payload bytes, reruns are byte-identical (gzip
# mtime pinned to 0).

_EXPORT_MANIFEST_SCHEMA = T.StructType([
    T.StructField("shard", T.IntegerType()),
    T.StructField("path", T.StringType()),
    T.StructField("n_records", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
])


def write_warc_shards(docs: DataFrame, out_dir: str, n_shards: int = 8,
                      id_col: str = "doc_id",
                      text_col: str = "text",
                      uri_col: str | None = None) -> DataFrame:
    """Export (id, text[, uri]) rows as `shard-%05d.warc.gz` files of
    `conversion` records (one per-record gzip member each — the
    splittable convention parse_warc reads back). Returns the manifest
    (shard, path, n_records, n_bytes) — assert/commit on it."""
    import os

    from etl_online_retail_spark.operators.sampling import _bucket

    os.makedirs(out_dir, exist_ok=True)
    shard = F.pmod(_bucket(F.col(id_col)), F.lit(n_shards)).cast("int")
    cols = [F.col(id_col), F.col(text_col).alias("_text")]
    if uri_col is not None:
        cols.append(F.col(uri_col).alias("_uri"))
    work = docs.select(*cols).withColumn("_shard", shard)

    def pack(pdf):
        import pandas as pd

        sh = int(pdf["_shard"].iloc[0])
        path = os.path.join(out_dir, f"shard-{sh:05d}.warc.gz")
        records = []
        for _, row in pdf.sort_values(id_col).iterrows():
            headers = {"WARC-Date": "2026-08-16T00:00:00Z",
                       "Content-Type": "text/plain; charset=utf-8",
                       "WARC-Record-ID":
                           f"<urn:doc:{int(row[id_col])}>"}
            if "_uri" in pdf.columns:
                headers["WARC-Target-URI"] = str(row["_uri"])
            records.append(("conversion", headers,
                            str(row["_text"]).encode("utf-8")))
        data = build_warc(records, per_record_gzip=True)
        with open(path, "wb") as f:
            f.write(data)
        return pd.DataFrame({"shard": [sh], "path": [path],
                             "n_records": [len(records)],
                             "n_bytes": [len(data)]})

    return (work.groupBy("_shard")
            .applyInPandas(pack, schema=_EXPORT_MANIFEST_SCHEMA))
