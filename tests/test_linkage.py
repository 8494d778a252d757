"""q-gram-filtered fuzzy join must EQUAL the naive blocked join."""

from __future__ import annotations

from etl_online_retail_spark.catalog import load_table
from etl_online_retail_spark.operators.linkage import (
    blocked_fuzzy_pairs,
    qgram_fuzzy_pairs,
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
