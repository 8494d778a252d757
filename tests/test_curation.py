"""Curation operators: split determinism and stratified sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_online_retail_spark.catalog import load_table
from etl_online_retail_spark.operators.curation import (
    bernoulli_stratified_sample,
    with_split,
)

SF = "/root/testdata/sf0.001"


def test_split_is_deterministic_and_partitioned(spark):
    docs = load_table(spark, "documents", SF).select("doc_id")
    a = {r.doc_id: r.split for r in with_split(docs).collect()}
    b = {r.doc_id: r.split
         for r in with_split(docs.repartition(7)).collect()}
    assert a == b  # hash split: stable under any layout
    counts = {r.split: r.n for r in
              (with_split(docs).groupBy("split")
               .agg(F.count(F.lit(1)).alias("n")).collect())}
    total = sum(counts.values())
    assert 0.8 <= counts["train"] / total <= 0.97
    assert set(counts) <= {"train", "val", "test"}


def test_stratified_sample_rates_and_determinism(spark):
    docs = load_table(spark, "documents", SF)
    fractions = {"en": 0.5, "de": 1.0, "fr": 1.0, "es": 1.0, "zh": 1.0}
    s1 = bernoulli_stratified_sample(docs, "lang", fractions)
    s2 = bernoulli_stratified_sample(docs, "lang", fractions)
    assert sorted(r.doc_id for r in s1.collect()) == \
        sorted(r.doc_id for r in s2.collect())  # same seed -> same sample
    n_en_before = docs.filter(F.col("lang") == "en").count()
    n_en_after = s1.filter(F.col("lang") == "en").count()
    assert 0.25 * n_en_before <= n_en_after <= 0.75 * n_en_before
    # unsampled strata intact
    assert s1.filter(F.col("lang") == "de").count() == \
        docs.filter(F.col("lang") == "de").count()


def test_approx_percentiles_track_exact(spark):
    """The sketch percentiles must sit within rank tolerance of the exact
    order statistics (accuracy=1000 -> epsilon = 1/1000 of the rank)."""
    docs = load_table(spark, "documents", SF).cache()
    import __spark_entry__ as entry

    approx = {r.source: r for r in
              entry.queries()["approx_length_percentiles"](spark, SF).collect()}
    for src_row in (docs.groupBy("source")
                    .agg(F.expr("percentile_approx(n_chars, 0.5, 2147483647)")
                          .alias("exact_p50"))
                    .collect()):
        a = approx[src_row.source]
        # per-group n is small at this SF, so exact and sketch agree on
        # the discrete median element
        assert a.p50 == src_row.exact_p50
        assert a.p50 <= a.p90 <= a.p99


def test_minhash_calibration_scorecard(spark):
    from etl_online_retail_spark.operators.dedup import minhash_calibration

    # planted corpus: two exact-near-dup pairs + unrelated docs
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "the quick brown fox jumps over the lazy dog now"),
         (3, "completely different text about apples and oranges here"),
         (4, "completely different text about apples and oranges there"),
         (5, "nothing shares shingles with this lonely sentence at all"),
         (6, "yet another unrelated fragment of words goes right here")],
        "doc_id BIGINT, text STRING")
    r = minhash_calibration(docs, k=16, bands=8, threshold=0.5).collect()[0]
    assert r.n_exact == 2
    # consistency: the intersection can exceed neither side
    assert r.n_true <= min(r.n_exact, r.n_candidates)
    # 8 bands of 2 rows catch these high-jaccard pairs
    assert r.recall == 1.0
    assert r.precision is not None and 0.0 < r.precision <= 1.0
