"""WARC crawl-ingest source (sources/warc.py) + HTML text extraction
(functions/html_text.py): record grammar, gzip-member splitting, HTTP
payload parsing, extractor semantics, Spark plumbing. The composed
crawl -> text -> quality chain is oracle-verified end-to-end by the
registry queries (warc_record_stats / warc_html_extract /
warc_corpus_quality); these tests pin the pure layers and the error
contracts the oracle never exercises."""

from __future__ import annotations

import gzip
import html as H

import pytest

from etl_online_retail_spark.functions.html_text import html_to_text
from etl_online_retail_spark.sources import warc


def _two_records(body: bytes) -> list[tuple[str, dict, bytes]]:
    payload = warc.http_response(
        200, "OK", {"Content-Type": "text/html; charset=utf-8"}, body)
    return [
        ("warcinfo", {"Content-Type": "application/warc-fields"},
         b"software: test\r\n"),
        ("response", {"WARC-Target-URI": "http://s/doc/1",
                      "Content-Type": "application/http;msgtype=response"},
         payload),
    ]


def test_warc_round_trip_plain_and_gzip_members():
    body = b"<p>hello</p>"
    recs = _two_records(body)
    for gz in (False, True):
        blob = warc.build_warc(recs, per_record_gzip=gz)
        parsed = warc.parse_warc(blob)
        assert [r.warc_type for r in parsed] == ["warcinfo", "response"]
        status, headers, got = warc.parse_http_response(parsed[1].payload)
        assert (status, got) == (200, body)
        assert headers["Content-Type"] == "text/html; charset=utf-8"
        # ISO 28500: field names are case-insensitive
        assert parsed[1].header("warc-target-uri") == "http://s/doc/1"
        assert parsed[1].header("WARC-TARGET-URI") == "http://s/doc/1"
        assert parsed[0].header("absent") is None

    # each record is its OWN gzip member: a reader landing on the second
    # member's boundary decodes it with no knowledge of the first — the
    # splittability contract a distributed .warc.gz scan relies on
    blob = warc.build_warc(recs, per_record_gzip=True)
    first_len = len(gzip.compress(
        warc.format_warc_record(*recs[0]), mtime=0))
    tail = warc.parse_warc(blob[first_len:])
    assert [r.warc_type for r in tail] == ["response"]


def test_warc_gzip_member_walk_is_chunked(monkeypatch):
    """The .warc.gz walk feeds the decompressor BOUNDED chunks (linear
    in archive size, not O(members^2) tail copies — r12 review): force
    a tiny chunk so every member spans many feeds and member boundaries
    land mid-chunk, and the walk must still recover every record."""
    recs = _two_records(b"x" * 3000)
    blob = warc.build_warc(recs * 3, per_record_gzip=True)
    monkeypatch.setattr(warc, "_GZ_CHUNK", 7)
    parsed = warc.parse_warc(blob)
    assert [r.warc_type for r in parsed] == ["warcinfo", "response"] * 3
    with pytest.raises(ValueError, match="truncated gzip member"):
        warc.parse_warc(blob[:-40])


def test_warc_error_contracts():
    with pytest.raises(ValueError, match="not a WARC record"):
        warc.parse_warc(b"HTTP/1.1 200 OK\r\n\r\n\r\n\r\n")
    ok = warc.build_warc(_two_records(b"x"))
    with pytest.raises(ValueError):
        warc.parse_warc(ok[:-2])  # missing final two-CRLF separator
    with pytest.raises(ValueError, match="Content-Length"):
        warc.parse_warc(b"WARC/1.0\r\nWARC-Type: response\r\n\r\n\r\n\r\n")
    with pytest.raises(ValueError, match="serializer-owned"):
        warc.format_warc_record("response", {"content-length": "4"}, b"x")
    with pytest.raises(ValueError, match="not an HTTP response"):
        warc.parse_http_response(b"GET / HTTP/1.1\r\n\r\n")


def test_html_to_text_semantics():
    # script/style/template/noscript subtrees drop WHOLE; entities
    # decode; void elements (<br>, <meta>) must not corrupt drop state
    page = ('<html><head><title>T</title><style>p{color:red}</style>'
            '</head><body><p>a &amp; b</p><br><script>var x = "<p>";'
            '</script><div>c&#33;</div><noscript>no</noscript>'
            '</body></html>')
    assert html_to_text(page) == "T a & b c!"
    # HTML5 CDATA semantics (what browsers do, and what the stdlib
    # parser implements): script content ends at the FIRST </script> —
    # the inner <script> is raw text, "c" is visible body text, and the
    # stray trailing </script> must not corrupt drop state
    nested = "<script>a<script>b</script>c</script><p>keep</p>"
    assert html_to_text(nested) == "c keep"
    # a DIV-class drop tag (non-CDATA) does nest
    assert html_to_text(
        "<noscript>a<noscript>b</noscript>c</noscript><p>keep</p>"
    ) == "keep"
    # collapse=False keeps text nodes verbatim (the round-trip contract)
    text = 'x < y & "z"\n\ttabbed'
    page = warc.CRAWL_HTML_PREFIX + H.escape(text) + warc.CRAWL_HTML_SUFFIX
    assert html_to_text(page, collapse=False) == text
    assert html_to_text(page) == " ".join(text.split())


def test_write_warc_shards_round_trip_and_determinism(spark, tmp_path):
    """Export -> parse round trip: every doc comes back as a conversion
    record with its text intact; shard assignment is deterministic and
    a rerun produces byte-identical files (the wds.py contract)."""
    docs = spark.createDataFrame(
        [(i, f"text number {i}", f"http://s/d/{i}") for i in range(20)],
        "doc_id long, text string, uri string")
    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = {r.shard: (r.path, r.n_records, r.n_bytes) for r in
          warc.write_warc_shards(docs, out1, n_shards=3,
                                 uri_col="uri").collect()}
    assert sum(n for _, n, _ in m1.values()) == 20
    got = {}
    for path, _, _ in m1.values():
        with open(path, "rb") as f:
            for rec in warc.parse_warc(f.read()):
                assert rec.warc_type == "conversion"
                rid = rec.header("WARC-Record-ID")
                got[rid] = (rec.payload.decode(),
                            rec.header("WARC-Target-URI"))
    assert got == {f"<urn:doc:{i}>": (f"text number {i}",
                                      f"http://s/d/{i}")
                   for i in range(20)}
    # rerun -> byte-identical shards
    m2 = {r.shard: r.path for r in
          warc.write_warc_shards(docs, out2, n_shards=3,
                                 uri_col="uri").collect()}
    for sh, (p1, _, _) in m1.items():
        assert open(p1, "rb").read() == open(m2[sh], "rb").read()


def test_incremental_crawl_quality_equals_batch(spark, tmp_path):
    """Streaming crawl ingest (r12): WARC archives streamed in three
    micro-batches maintain per-(host, quality-decile) telemetry with
    bounded state; over the complete stream the merged partials equal
    the batch computation over ALL archives bit-for-bit (exact decimal
    partial sums)."""
    from pyspark.sql import functions as F

    from etl_online_retail_spark.catalog import load_table
    from etl_online_retail_spark.functions.html_text import (
        extract_main_text,
    )
    from etl_online_retail_spark.operators.curation import quality_expr
    from etl_online_retail_spark.streaming.ingest import (
        incremental_crawl_quality,
        read_crawl_quality,
    )

    docs = load_table(spark, "documents", "/root/testdata/sf0.001") \
        .limit(120).cache()
    archives = warc.synthetic_crawl_archives(docs, chrome=True).cache()
    src = str(tmp_path / "src")
    for part in range(3):
        (archives.filter(F.col("archive_id") % 3 == part)
         .coalesce(1).write.parquet(f"{src}/p{part}"))
    stream = (spark.readStream.schema(archives.schema)
              .option("maxFilesPerTrigger", 1).parquet(f"{src}/p*"))
    table = str(tmp_path / "agg")
    q = incremental_crawl_quality(stream, table,
                                  str(tmp_path / "ckpt"))
    q.awaitTermination()
    got = {(r.host, r.q_decile): (r.n_pages, r.quality_sum) for r in
           read_crawl_quality(spark, table).collect()}

    # the batch twin over ALL archives at once
    recs = warc.warc_records(archives)
    responses = (recs.filter(F.col("warc_type") == "response")
                 .select("archive_id",
                         F.regexp_extract("target_uri",
                                          r"^https?://([^/?#]+)", 1)
                          .alias("host"), "body"))
    texts = extract_main_text(
        responses.withColumn("_k", F.struct("archive_id", "host")),
        "body", "_k")
    want = {(r.host, r.q_decile): (r.n_pages, r.quality_sum) for r in
            (texts.select(
                F.col("_k")["host"].alias("host"),
                F.least(F.floor(quality_expr("text") * 10), F.lit(9))
                 .cast("int").alias("q_decile"),
                quality_expr("text").cast("decimal(18,9)").alias("_v"))
             .groupBy("host", "q_decile")
             .agg(F.count(F.lit(1)).alias("n_pages"),
                  F.sum("_v").cast("decimal(38,9)")
                   .alias("quality_sum"))).collect()}
    assert got == want and len(got) > 3


def test_main_content_block_semantics():
    from etl_online_retail_spark.functions.html_text import (
        extract_main_content,
        text_blocks,
    )

    page = ('<body><nav><a href="/">Home</a> <a href="/b">About</a></nav>'
            '<p>Real prose with an <a href="/x">inline link</a> inside '
            'a much longer paragraph of actual content text.</p>'
            '<footer><a href="/t">Terms</a></footer></body>')
    blocks = text_blocks(page)
    texts = [t for t, _ in blocks]
    assert texts == ["Home About",
                     "Real prose with an inline link inside a much "
                     "longer paragraph of actual content text.",
                     "Terms"]
    dens = {t: d for t, d in blocks}
    assert dens["Home About"] > 0.8         # pure-link nav
    assert dens["Terms"] == 1.0             # pure-link footer
    assert 0.0 < dens[texts[1]] < 0.2       # prose with one inline link
    assert extract_main_content(page) == texts[1]

    # nested blocks flush separately; li rows are their own blocks
    lst = "<ul><li><a href='/1'>one</a></li><li>plain text row</li></ul>"
    assert extract_main_content(lst) == "plain text row"
    # script/style CDATA stays dropped inside block segmentation
    assert text_blocks("<p>a</p><script>var x='<p>b</p>';</script>") == \
        [("a", 0.0)]
    # a page that is ALL chrome extracts to empty, not garbage
    assert extract_main_content(
        "<nav><a href='/'>Home</a></nav>") == ""
    # one UNCLOSED <a> (ubiquitous in real crawl markup) must not
    # poison every later block's link density — anchor state clamps at
    # block boundaries (r12 review: this used to drop the whole page)
    sloppy = ("<nav><a href='/'>Home</nav>"
              "<p>Real prose content of the page, a long paragraph "
              "of actual text.</p>")
    assert extract_main_content(sloppy) == (
        "Real prose content of the page, a long paragraph of actual "
        "text.")


def test_warc_records_and_extract_spark(spark):
    from pyspark.sql import functions as F

    from etl_online_retail_spark.functions.html_text import (
        extract_html_text,
    )

    docs = spark.createDataFrame(
        [(1, "site-a", "alpha & beta"), (2, "site-b", "<gamma>")],
        "doc_id long, source string, text string")
    recs = warc.warc_records(warc.synthetic_crawl_archives(docs, html=True))
    rows = {(r.archive_id, r.rec_seq): r for r in recs.collect()}
    assert len(rows) == 4  # 2 archives x (warcinfo + response)
    assert rows[(1, 0)].warc_type == "warcinfo"
    resp = rows[(2, 1)]
    assert resp.http_status == 200
    assert resp.target_uri == "http://site-b/doc/2"
    assert resp.content_type == "text/html; charset=utf-8"

    extracted = extract_html_text(
        recs.filter(F.col("warc_type") == "response")
            .select(F.col("archive_id").alias("doc_id"), "body"),
        "body", "doc_id", collapse=False)
    got = {r.doc_id: r.text for r in extracted.collect()}
    assert got == {1: "alpha & beta", 2: "<gamma>"}

    # plain-text (WET-style) flavor carries the raw text as the body
    recs_txt = warc.warc_records(
        warc.synthetic_crawl_archives(docs, html=False))
    body = {r.archive_id: bytes(r.body) for r in
            recs_txt.filter(F.col("warc_type") == "response").collect()}
    assert body == {1: b"alpha & beta", 2: b"<gamma>"}

    # null bodies flow through as null text, never a worker crash
    # (r12 review) — both binary and string input flavors
    nullable = spark.createDataFrame(
        [(1, b"<p>ok</p>"), (2, None)], "doc_id long, body binary")
    got = {r.doc_id: r.text for r in
           extract_html_text(nullable, "body", "doc_id").collect()}
    assert got == {1: "ok", 2: None}
    nullable_s = spark.createDataFrame(
        [(1, "<p>ok</p>"), (2, None)], "doc_id long, page string")
    got = {r.doc_id: r.text for r in
           extract_html_text(nullable_s, "page", "doc_id").collect()}
    assert got == {1: "ok", 2: None}


def test_crawl_dedup_gated_ingest_stream(spark, tmp_path):
    """Dedup-gated crawl ingest (r13): three micro-batches with
    re-crawled URLs (tracking-param variants), a within-batch URL
    duplicate, and exact-copy texts under new URLs. The stream must
    accept exactly the first-seen-URL, non-near-duplicate pages, and
    the accepted pages' telemetry must equal the batch chain over that
    set bit-for-bit."""
    import time as _time

    from pyspark.sql import functions as F

    from etl_online_retail_spark.operators.curation import quality_expr
    from etl_online_retail_spark.functions.html_text import (
        extract_main_text,
    )
    from etl_online_retail_spark.streaming.ingest import (
        incremental_crawl_dedup_ingest,
        read_accepted_pages,
        read_crawl_quality,
    )

    def text(i: int) -> str:
        return (f"alpha{i} bravo{i} charlie{i} delta{i} "
                f"echo{i} foxtrot{i} golf{i} hotel{i}")

    rows = []
    for i in range(20):                     # batch 0: 20 originals
        rows.append((i, f"h{i % 4}", text(i), f"http://h{i % 4}/p/{i}"))
    for i in range(20, 30):                 # batch 1: re-crawls of 0-9
        j = i - 20                          # (new fetch id, same page,
        rows.append((i, f"h{j % 4}", text(j),   # tracking-param variant)
                     f"http://h{j % 4}/p/{j}?utm_source=re"))
    for i in range(30, 40):                 # batch 1: 10 fresh pages
        rows.append((i, f"h{i % 4}", text(i), f"http://h{i % 4}/p/{i}"))
    rows.append((60, "h2", text(30),        # batch 1: WITHIN-batch URL
                 "http://h2/p/30"))         # dup of fetch 30 (min id wins)
    for i in range(40, 50):                 # batch 2: exact-copy TEXTS of
        rows.append((i, f"h{i % 4}", text(i - 40),  # 0-9 under NEW urls
                     f"http://h{i % 4}/p/{i}"))     # -> near-dup rejected
    for i in range(50, 60):                 # batch 2: 10 fresh pages
        rows.append((i, f"h{i % 4}", text(i), f"http://h{i % 4}/p/{i}"))
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string, uri string")
    archives = warc.synthetic_crawl_archives(docs, chrome=True,
                                             uri_col="uri").cache()
    src = str(tmp_path / "src")
    batches = [list(range(0, 20)),
               list(range(20, 40)) + [60],
               list(range(40, 60))]
    for b, ids in enumerate(batches):
        (archives.filter(F.col("archive_id").isin(ids))
         .coalesce(1).write.parquet(f"{src}/p{b}"))
        _time.sleep(1.1)   # the file source orders batches by mtime

    stream = (spark.readStream.schema(archives.schema)
              .option("maxFilesPerTrigger", 1).parquet(f"{src}/p*"))
    d = {n: str(tmp_path / n) for n in
         ("url_idx", "accepted", "quality", "mh_idx", "mh_dups", "ckpt")}
    q = incremental_crawl_dedup_ingest(
        stream, d["url_idx"], d["accepted"], d["quality"],
        d["mh_idx"], d["mh_dups"], d["ckpt"])
    q.awaitTermination()

    acc = read_accepted_pages(spark, d["accepted"]).cache()
    got_ids = {r.doc_id for r in acc.collect()}
    assert got_ids == (set(range(0, 20)) | set(range(30, 40))
                       | set(range(50, 60)))
    per_batch = {r._batch_id: r.cnt for r in
                 acc.groupBy("_batch_id")
                    .agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert per_batch == {0: 20, 1: 10, 2: 10}
    # the near-dup gate rejected exactly the copy-text pages
    rejected = {r.new_id for r in
                spark.read.parquet(d["mh_dups"]).collect()}
    assert rejected == set(range(40, 50))

    # telemetry == the batch chain over exactly the accepted pages
    got = {(r.host, r.q_decile): (r.n_pages, r.quality_sum) for r in
           read_crawl_quality(spark, d["quality"]).collect()}
    kept = docs.filter(F.col("doc_id").isin(sorted(got_ids)))
    recs = warc.warc_records(
        warc.synthetic_crawl_archives(kept, chrome=True, uri_col="uri"))
    responses = (recs.filter(F.col("warc_type") == "response")
                 .select("archive_id",
                         F.regexp_extract("target_uri",
                                          r"^https?://([^/?#]+)", 1)
                          .alias("host"), "body"))
    texts = extract_main_text(
        responses.withColumn("_k", F.struct("archive_id", "host")),
        "body", "_k")
    want = {(r.host, r.q_decile): (r.n_pages, r.quality_sum) for r in
            (texts.select(
                F.col("_k")["host"].alias("host"),
                F.least(F.floor(quality_expr("text") * 10), F.lit(9))
                 .cast("int").alias("q_decile"),
                quality_expr("text").cast("decimal(18,9)").alias("_v"))
             .groupBy("host", "q_decile")
             .agg(F.count(F.lit(1)).alias("n_pages"),
                  F.sum("_v").cast("decimal(38,9)")
                   .alias("quality_sum"))).collect()}
    assert got == want and len(got) >= 4
