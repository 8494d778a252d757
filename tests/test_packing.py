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
