"""Every fast fuzzy-join variant must EQUAL the naive blocked join."""

from __future__ import annotations

import pytest

from etl_online_retail_spark.catalog import load_table
from etl_online_retail_spark.operators.linkage import (
    blocked_fuzzy_pairs,
    contracted_fuzzy_pairs,
    qgram_fuzzy_pairs,
    segment_fuzzy_pairs,
)

SF = "/root/testdata/sf0.001"


def _pairs(df):
    return {(r.key_a, r.key_b, r.edit_dist) for r in df.collect()}


def test_qgram_equals_naive_on_parts(spark):
    p = load_table(spark, "part", SF).select(
        "p_partkey", "p_name", "p_brand").cache()
    naive = _pairs(blocked_fuzzy_pairs(p, "p_partkey", "p_name", "p_brand"))
    fast = _pairs(qgram_fuzzy_pairs(p, "p_partkey", "p_name", "p_brand"))
    assert fast == naive and len(naive) > 0


def test_qgram_handles_repeat_heavy_and_short_names(spark):
    # repeat-heavy strings have tiny DISTINCT gram sets — the case where a
    # bag-semantics count bound would wrongly prune; they must route
    # through the fallback and still match
    rows = [
        (1, "aaaaaa", "B"),    # |D| = 1 <= d*q -> unprunable
        (2, "aaaaab", "B"),    # dist 1 from row 1
        (3, "ab", "B"),        # shorter than q+? tiny
        (4, "ba", "B"),        # dist 2 from "ab"
        (5, "abcdefgh", "B"),
        (6, "abcdefgx", "B"),  # dist 1 from row 5 (prunable pair, kept)
        (7, "zzzzzzzz", "B"),  # far from everything
    ]
    df = spark.createDataFrame(rows, "k long, name string, blk string")
    naive = _pairs(blocked_fuzzy_pairs(df, "k", "name", "blk"))
    fast = _pairs(qgram_fuzzy_pairs(df, "k", "name", "blk"))
    assert fast == naive
    assert (1, 2, 1) in fast and (5, 6, 1) in fast and (3, 4, 2) in fast


def test_segment_equals_naive_on_parts(spark):
    p = load_table(spark, "part", SF).select(
        "p_partkey", "p_name", "p_brand").cache()
    naive = _pairs(blocked_fuzzy_pairs(p, "p_partkey", "p_name", "p_brand"))
    fast = _pairs(segment_fuzzy_pairs(p, "p_partkey", "p_name", "p_brand"))
    assert fast == naive and len(naive) > 0


def test_segment_handles_short_and_shifted_names(spark):
    # strings shorter than d+1 can't be segmented (fallback path); shifted
    # matches exercise the +-d probe window; equal-length pairs exercise
    # the both-directions-probe dedup
    rows = [
        (1, "ab", "B"),            # unsegmentable (len < 3)
        (2, "b", "B"),             # unsegmentable, dist 1 from "ab"
        (3, "abcdefghijkl", "B"),
        (4, "xbcdefghijkl", "B"),  # dist 1, equal length
        (5, "bcdefghijkl", "B"),   # dist 1 from row 3 (leading delete: all
                                   # later segments shift left by 1)
        (6, "abcdefghijklmn", "B"),  # dist 2 from row 3 (two inserts)
        (7, "zzzzzzzzzzzz", "B"),
        (8, "abcdefghijkl", "C"),  # same name, other block: must NOT pair
    ]
    df = spark.createDataFrame(rows, "k long, name string, blk string")
    naive = _pairs(blocked_fuzzy_pairs(df, "k", "name", "blk"))
    fast = _pairs(segment_fuzzy_pairs(df, "k", "name", "blk"))
    assert fast == naive
    assert (1, 2, 1) in fast and (3, 4, 1) in fast
    assert (3, 5, 1) in fast and (3, 6, 2) in fast
    assert not any(a == 8 or b == 8 for a, b, _ in fast)


@pytest.mark.parametrize("strategy", ["naive", "qgram", "segment"])
def test_contracted_equals_naive_on_parts(spark, strategy):
    p = load_table(spark, "part", SF).select(
        "p_partkey", "p_name", "p_brand").cache()
    naive = _pairs(blocked_fuzzy_pairs(p, "p_partkey", "p_name", "p_brand"))
    fast = _pairs(contracted_fuzzy_pairs(p, "p_partkey", "p_name", "p_brand",
                                         strategy=strategy))
    assert fast == naive and len(naive) > 0


def test_contracted_expands_repeated_names_with_correct_key_order(spark):
    # three rows share name "hot bolt"; expansion must emit every cross
    # pair exactly once with key_a < key_b and names following their keys,
    # and the same name in another block must stay separate
    rows = [
        (10, "hot bolt", "B"),
        (2, "hot bolt", "B"),
        (7, "hot bolts", "B"),   # dist 1 from "hot bolt"
        (5, "hot bolt", "B"),
        (9, "hot bolt", "C"),    # other block: no cross-block pairs
        (1, "cold bolt", "C"),   # dist 2 within C? h->c, o->o... no: dist 2
    ]
    df = spark.createDataFrame(rows, "k long, name string, blk string")
    naive = _pairs(blocked_fuzzy_pairs(df, "k", "name", "blk"))
    fast = _pairs(contracted_fuzzy_pairs(df, "k", "name", "blk"))
    assert fast == naive
    # identical-name pairs are excluded by contract; each (hot bolt,
    # hot bolts) key combo appears once
    assert {(2, 7, 1), (5, 7, 1), (7, 10, 1)} <= fast
    names = {(r.key_a, r.name_a, r.key_b, r.name_b)
             for r in contracted_fuzzy_pairs(df, "k", "name", "blk").collect()}
    assert (7, "hot bolts", 10, "hot bolt") in names


def test_golden_records_survivorship_rules_and_ties(spark):
    """Recency picks by (order, tie) not partition luck; mode breaks
    frequency ties to the smallest value; aggregates ride along."""
    from etl_online_retail_spark.operators.linkage import golden_records

    rows = [
        # cluster A: 'new' is latest by (ts, id); 'old' is modal (2x)
        ("A", "old", 1, 10), ("A", "old", 2, 11), ("A", "new", 3, 12),
        # cluster B: ts tie -> larger event_id wins latest; mode tie
        # between 'x' and 'y' (1 each) -> 'x' (smallest) wins
        ("B", "y", 5, 20), ("B", "x", 5, 21),
    ]
    df = spark.createDataFrame(
        rows, "cluster string, val string, ts long, eid long")
    out = {r.cluster: r for r in golden_records(
        df, "cluster",
        {"last_val": ("latest", "val", "ts", "eid"),
         "modal_val": ("mode", "val"),
         "n": ("count",),
         "max_ts": ("max", "ts")}).collect()}
    assert out["A"].last_val == "new" and out["A"].modal_val == "old"
    assert out["A"].n == 3 and out["A"].max_ts == 3
    assert out["B"].last_val == "x"   # ts tie broken by eid
    assert out["B"].modal_val == "x"  # frequency tie broken to smallest
    # layout independence
    again = {r.cluster: (r.last_val, r.modal_val) for r in golden_records(
        df.repartition(5), "cluster",
        {"last_val": ("latest", "val", "ts", "eid"),
         "modal_val": ("mode", "val")}).collect()}
    assert again == {c: (r.last_val, r.modal_val) for c, r in out.items()}
