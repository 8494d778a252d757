"""Regression tests for the round-8 review-wave findings.

Each test pins one closed finding (ROADMAP items 56-59) so the fix can
never silently regress:
  * customer_order_medians' boundary-key carry across Arrow batches,
  * run_sql's guard-before-execution for DDL carrying a JOIN without ON,
  * the webm demuxer's loud rejection of laced SimpleBlocks,
  * excel cells that legally omit the r= attribute,
  * read_jdbc's partition-bounds validation,
  * train_pq_codebooks' empty-corpus error,
  * native._load's graceful handling of an incomplete libwebp.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_medians_boundary_carry_across_arrow_batches(spark):
    """A customer whose rows straddle an Arrow batch boundary must still
    aggregate as ONE group: force 1-row batches so EVERY multi-row
    customer is split, and compare against the plain groupBy answer."""
    rows = [(k, float(10 * k + i)) for k in range(1, 8)
            for i in range(k)]  # customer k has k orders
    df = spark.createDataFrame(rows, "o_custkey long, o_totalprice double")

    import tempfile

    from etl_online_retail_spark.workload_ext import q_customer_order_medians

    with tempfile.TemporaryDirectory() as d:
        # q_customer_order_medians reads orders from a directory; write a
        # fixture orders table holding exactly these rows
        from etl_online_retail_spark.catalog import SCHEMAS, table_path

        base = spark.createDataFrame(
            [(i, r[0], "O", r[1], None, "1-URGENT")
             for i, r in enumerate(rows)], SCHEMAS["orders"])
        base.write.parquet(table_path(d, "orders"))
        old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch",
                             None)
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1")
        try:
            got = {r.o_custkey: (r.n_orders, r.median_price, r.min_price,
                                 r.max_price)
                   for r in q_customer_order_medians(spark, d).collect()}
        finally:
            if old is None:
                spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
            else:
                spark.conf.set(
                    "spark.sql.execution.arrow.maxRecordsPerBatch", old)
    want = {r.o_custkey: (r.n, r.med, r.lo, r.hi) for r in
            (df.groupBy("o_custkey")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.expr("percentile(o_totalprice, 0.5)").alias("med"),
                  F.min("o_totalprice").alias("lo"),
                  F.max("o_totalprice").alias("hi"))
             .collect())}
    assert got == want


def test_run_sql_rejects_ddl_with_unconditioned_join_before_executing(spark):
    """The cartesian guard must fire BEFORE spark.sql() executes a CTAS:
    the table must not exist afterwards."""
    from pyspark.errors import AnalysisException

    from etl_online_retail_spark.plans.sql_frontend import run_sql

    spark.createDataFrame([(1,)], "a int").createOrReplaceTempView("_g8a")
    spark.createDataFrame([(1,)], "b int").createOrReplaceTempView("_g8b")
    with pytest.raises(AnalysisException, match="IMPLICIT_CARTESIAN"):
        run_sql(spark,
                "CREATE TABLE _wave8_leak AS "
                "SELECT * FROM _g8a JOIN _g8b WHERE a = b")
    assert not spark.catalog.tableExists("_wave8_leak")


def test_webm_laced_simpleblock_raises():
    """Lacing bits in a SimpleBlock's flags must raise, never hand the
    merged lace payload downstream as one frame."""
    from etl_online_retail_spark.multimodal import webm as _webm

    good = _webm.build_webm([b"\x01\x02", b"\x03\x04"], width=16, height=16)
    # flip the lacing bits (0x06) on in the first SimpleBlock's flags
    # byte. Body layout (build_webm): track vint 0x81, rel ts 00 00,
    # flags 0x80, then the payload — locate the body bytes directly
    # (searching for the 0xA3 element id alone would hit the EBML magic,
    # whose fourth byte is also 0xA3).
    body = b"\x81\x00\x00\x80\x01\x02"
    flags_pos = good.index(body) + 3
    laced = good[:flags_pos] + bytes([good[flags_pos] | 0x06]) \
        + good[flags_pos + 1:]
    assert _webm.demux_webm(good).tracks[0].frames  # sanity: good decodes
    with pytest.raises(NotImplementedError, match="laced"):
        _webm.demux_webm(laced)


def test_excel_cells_without_ref_follow_predecessor(tmp_path):
    """Cells that legally omit r= land after their predecessor, not at
    column -1."""
    import zipfile

    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>'
        '<row r="1"><c r="A1" t="str"><v>h1</v></c>'
        '<c t="str"><v>h2</v></c></row>'     # h2 has no r= -> column B
        '<row r="2"><c r="A2"><v>1</v></c><c><v>2</v></c></row>'
        "</sheetData></worksheet>")
    path = tmp_path / "mini.xlsx"
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    from etl_online_retail_spark.sources.excel import _read_xlsx_minimal

    pdf = _read_xlsx_minimal(str(path))
    assert list(pdf.columns) == ["h1", "h2"]
    assert pdf.iloc[0].tolist() == [1, 2]


def test_read_jdbc_requires_partition_bounds(spark):
    from etl_online_retail_spark.sources.jdbc import read_jdbc

    with pytest.raises(ValueError, match="lower_bound"):
        read_jdbc(spark, "jdbc:derby:memory:x", "t",
                  partition_column="id", num_partitions=4)


def test_train_pq_codebooks_empty_corpus_raises(spark):
    from etl_online_retail_spark.operators.similarity import (
        train_pq_codebooks,
    )

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty corpus"):
        train_pq_codebooks(empty)


def test_native_load_incomplete_library_is_unavailable(monkeypatch):
    """A libwebp that loads but lacks an entry point must read as
    unavailable (honest NotImplementedError downstream), not crash."""
    from etl_online_retail_spark.multimodal import native

    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_LOAD_ERR", None)

    def broken_bind(lib):
        raise AttributeError("WebPDecodeRGB missing")

    monkeypatch.setattr(native, "_bind", broken_bind)
    assert native.libwebp_available() is False
    with pytest.raises(NotImplementedError):
        native._require()
    # undo the cached failure so later tests see the real library
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_LOAD_ERR", None)


def _scalar_fdct_quant(block, q):
    """Independent scalar T.81 A.3.3 FDCT + half-away quantize — the
    in-test reference the batched _quantized_block_grid is pinned to."""
    import math

    cos = [[math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)]
           for x in range(8)]
    alpha = [1.0 / math.sqrt(2.0)] + [1.0] * 7
    tmp = [[sum(block[y][x] * cos[x][u] for x in range(8))
            for u in range(8)] for y in range(8)]
    out = [[0.25 * alpha[u] * alpha[v]
            * sum(tmp[y][u] * cos[y][v] for y in range(8))
            for u in range(8)] for v in range(8)]

    def rha(x):
        import math as m
        return int(m.floor(x + 0.5)) if x >= 0 else int(m.ceil(x - 0.5))

    return [rha(out[v][u] / q[v * 8 + u])
            for v in range(8) for u in range(8)]


def test_batched_fdct_quantize_matches_scalar_reference():
    """The r8 batched encoder grid equals an independently written
    scalar FDCT+quantize on seeded random blocks (seeded, so any
    knife-edge divergence would be deterministic, not flaky)."""
    import numpy as np

    from etl_online_retail_spark.multimodal.jpeg import (
        STD_LUMA_Q,
        _quantized_block_grid,
    )

    rng = np.random.default_rng(7)
    plane = rng.integers(0, 256, size=(16, 24), dtype=np.int32)
    got = _quantized_block_grid(plane, 24, 16, 3, 2, STD_LUMA_Q)
    assert len(got) == 6
    for by in range(2):
        for bx in range(3):
            blk = [[float(plane[by * 8 + y, bx * 8 + x]) - 128.0
                    for x in range(8)] for y in range(8)]
            want = _scalar_fdct_quant(blk, STD_LUMA_Q)
            assert got[by * 3 + bx] == want, (by, bx)


def test_batched_idct_roundtrip_solid_blocks_bit_exact():
    """The decoder's batched IDCT keeps the documented bit-exact
    contract: solid even-intensity images decode to exactly v (the
    fixture invariant every JPEG oracle leans on)."""
    from etl_online_retail_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    for v in (0, 2, 126, 128, 200, 254):
        img = decode_jpeg(encode_jpeg(bytes([v]) * (11 * 6 * 3), 11, 6,
                                      channels=3))
        assert img.width == 11 and img.height == 6
        assert set(img.pixels) == {v}, v


def test_adpcm_vectorized_decode_matches_scalar_walk():
    """The r8 across-blocks vectorized IMA decode equals the scalar
    per-nibble walk (the encoder's _adpcm_reconstruct) on seeded random
    clips, including a ragged final block handled by the scalar tail."""
    import struct as S

    import numpy as np

    from etl_online_retail_spark.multimodal import wav as W

    def scalar_decode(data, ba):
        out = []
        for b0 in range(0, len(data), ba):
            block = data[b0:b0 + ba]
            pred, index, _ = S.unpack("<hBB", block[:4])
            index = max(0, min(88, index))
            out.append(pred)
            for byte in block[4:]:
                for nib in (byte & 0x0F, byte >> 4):
                    pred, index = W._adpcm_reconstruct(pred, index, nib)
                    out.append(pred)
        return out

    rng = np.random.default_rng(11)
    for _ in range(4):
        n = int(rng.integers(5, 900))
        enc = W.encode_wav_adpcm(rng.integers(-32768, 32768, size=n),
                                 8000, block_align=36)
        pos = 12
        data = b""
        while pos + 8 <= len(enc):
            cid = enc[pos:pos + 4]
            (sz,) = S.unpack("<I", enc[pos + 4:pos + 8])
            if cid == b"data":
                data = enc[pos + 8:pos + 8 + sz]
                break
            pos += 8 + sz + (sz & 1)
        got = W._decode_adpcm_data(data, 36, n)
        assert list(got) == scalar_decode(data, 36)[:n]
        # ragged tail: chop the stream mid-block and re-decode
        ragged = data[:len(data) - 7]
        got2 = W._decode_adpcm_data(ragged, 36, None)
        assert list(got2) == scalar_decode(ragged, 36)
