"""Sequence packing placement arithmetic (concat-and-chunk layout)."""

from __future__ import annotations

from etl_online_retail_spark.operators.packing import (
    pack_sequences,
    packing_summary,
)


def _packed(spark, rows, budget):
    df = spark.createDataFrame(rows, "source string, doc_id long, tok int")
    return {r.doc_id: r for r in
            pack_sequences(df, budget=budget, tokens_col="tok").collect()}


def test_doc_straddles_sequence_boundary(spark):
    out = _packed(spark, [("s", 1, 300), ("s", 2, 300), ("s", 3, 100)], 512)
    assert (out[1].start_offset, out[1].first_seq, out[1].last_seq) == (0, 0, 0)
    # doc 2 spans tokens [300, 600): crosses the 512 cut
    assert (out[2].start_offset, out[2].first_seq, out[2].last_seq) == (300, 0, 1)
    assert (out[3].start_offset, out[3].first_seq, out[3].last_seq) == (600, 1, 1)


def test_empty_doc_occupies_no_tokens(spark):
    out = _packed(spark, [("s", 1, 512), ("s", 2, 0), ("s", 3, 1)], 512)
    # doc 2 sits exactly on the cut; empty -> first_seq == last_seq == 1
    assert (out[2].n_tokens, out[2].first_seq, out[2].last_seq) == (0, 1, 1)
    assert (out[3].first_seq, out[3].last_seq) == (1, 1)
    # doc 1 ends exactly at the cut: last token offset 511 -> seq 0 only
    assert (out[1].first_seq, out[1].last_seq) == (0, 0)


def test_groups_pack_independently(spark):
    out = _packed(spark, [("a", 1, 600), ("b", 2, 600)], 512)
    assert out[1].start_offset == 0 and out[2].start_offset == 0
    assert out[1].last_seq == 1 and out[2].last_seq == 1


def test_packing_summary_counts_sequences(spark):
    df = spark.createDataFrame(
        [("a", 1, 600), ("a", 2, 600), ("b", 3, 10)],
        "source string, doc_id long, tok int")
    packed = pack_sequences(df, budget=512, tokens_col="tok")
    s = {r.source: r for r in packing_summary(packed).collect()}
    assert (s["a"].n_docs, s["a"].total_tokens, s["a"].n_sequences) == (2, 1200, 3)
    assert (s["b"].n_docs, s["b"].total_tokens, s["b"].n_sequences) == (1, 10, 1)


def _span_rows(spark, rows, budget):
    """rows: (source, doc_id, length, [(start, end), ...])."""
    df = spark.createDataFrame(
        [(s, d, n, [{"start": a, "end": b} for a, b in sp])
         for s, d, n, sp in rows],
        "source string, doc_id long, flat_len int, "
        "spans array<struct<start:int,end:int>>")
    from etl_online_retail_spark.operators.packing import pack_loss_spans

    return sorted(
        (r.doc_id, r.span_idx, r.seq_id, r.local_start, r.local_end)
        for r in pack_loss_spans(df, budget, "flat_len", "spans").collect())


def test_loss_span_rebased_and_split_at_cut(spark):
    # doc 1 fills [0, 300); doc 2's span [50, 350) lands globally at
    # [350, 650) and must split at the 512 cut into [350, 512) -> seq 0
    # local [350, 512) and [512, 650) -> seq 1 local [0, 138)
    out = _span_rows(spark, [("s", 1, 300, [(0, 10)]),
                             ("s", 2, 400, [(50, 350)])], 512)
    assert out == [(1, 0, 0, 0, 10),
                   (2, 0, 0, 350, 512),
                   (2, 0, 1, 0, 138)]
    # split pieces conserve total loss length
    assert sum(e - s for (_, _, _, s, e) in out[1:]) == 300


def test_loss_span_exactly_on_cut_does_not_split(spark):
    # span [212, 512) globally ends exactly AT the cut: one piece, seq 0
    out = _span_rows(spark, [("s", 1, 600, [(212, 512)])], 512)
    assert out == [(1, 0, 0, 212, 512)]
    # and a span STARTING at the cut lands wholly in seq 1
    out = _span_rows(spark, [("s", 1, 600, [(512, 600)])], 512)
    assert out == [(1, 0, 1, 0, 88)]


def test_multiple_spans_keep_ordinals_and_empty_spans_vanish(spark):
    out = _span_rows(spark, [("s", 1, 100, [(0, 10), (20, 20), (30, 40)])],
                     512)
    assert out == [(1, 0, 0, 0, 10), (1, 2, 0, 30, 40)]


def test_span_groups_pack_independently(spark):
    # identical docs in two sources: offsets restart per group, so both
    # spans land at the same local coordinates in their own seq 0
    rows = [("a", 1, 600, [(100, 200)]), ("b", 1, 600, [(100, 200)])]
    df = spark.createDataFrame(
        [(s, d, n, [{"start": a, "end": b} for a, b in sp])
         for s, d, n, sp in rows],
        "source string, doc_id long, flat_len int, "
        "spans array<struct<start:int,end:int>>")
    from etl_online_retail_spark.operators.packing import pack_loss_spans

    out = sorted((r.source, r.seq_id, r.local_start, r.local_end)
                 for r in pack_loss_spans(df, 512, "flat_len",
                                          "spans").collect())
    assert out == [("a", 0, 100, 200), ("b", 0, 100, 200)]
