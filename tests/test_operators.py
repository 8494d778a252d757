"""Unit tests for core operators (SURVEY.md §5.3 edge-case fixtures)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_online_retail_spark.operators.cleaning import digit_key, positive
from etl_online_retail_spark.operators.dedup import exact_duplicates, keep_last
from etl_online_retail_spark.operators.joins import anti_join, semi_join
from etl_online_retail_spark.operators.surrogate import dense_keys, with_unknown_member


def test_digit_key_drops_cancelled_and_alphanumeric(spark):
    # etl.py:73-81: 6-digit invoices only; C-prefix cancellations and
    # alphanumeric stock codes are dropped.
    df = spark.createDataFrame(
        [("536365",), ("C537251",), ("53636",), ("5363656",), ("85123A",),
         (None,)],
        "invoice_id string",
    )
    kept = [r.invoice_id for r in df.filter(digit_key("invoice_id", 6)).collect()]
    assert kept == ["536365"]


def test_positive_filter(spark):
    df = spark.createDataFrame([(1,), (0,), (-3,), (12,)], "quantity int")
    kept = sorted(r.quantity for r in df.filter(positive("quantity")).collect())
    assert kept == [1, 12]


def test_keep_last_uses_explicit_order(spark):
    # SCD1: same customer twice with changed country -> later order wins
    # (etl.py:104 keep='last'; order here is explicit, not positional).
    df = spark.createDataFrame(
        [("c1", "UK", 1), ("c1", "France", 2), ("c2", "Spain", 1)],
        "customer_id string, country string, src_order long",
    )
    out = {r.customer_id: r.country
           for r in keep_last(df, ["customer_id"], [F.desc("src_order")]).collect()}
    assert out == {"c1": "France", "c2": "Spain"}


def test_dense_keys_are_serial_like(spark):
    dim = spark.createDataFrame([("b",), ("a",), ("c",)], "k string")
    out = {r.k: r.dim_id for r in
           dense_keys(dim, order=["k"], key_name="dim_id", offset=1).collect()}
    assert out == {"a": 2, "b": 3, "c": 4}  # id 1 reserved for unknown member


def test_unknown_member_seeded_at_one(spark):
    dim = spark.createDataFrame(
        [(2, "11111", "UK")], "dim_id int, customer_id string, country string")
    out = with_unknown_member(dim, "dim_id", "customer_id").orderBy("dim_id").collect()
    assert (out[0].dim_id, out[0].customer_id, out[0].country) == (1, "00000", None)
    assert out[1].dim_id == 2


def test_semi_and_anti_join_partition(spark):
    left = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    right = spark.createDataFrame([(2,), (3,), (4,)], "k int")
    semi = sorted(r.k for r in semi_join(left, right, "k").collect())
    anti = sorted(r.k for r in anti_join(left, right, "k").collect())
    assert semi == [2, 3] and anti == [1]
    assert sorted(semi + anti) == [1, 2, 3]


def test_exact_duplicates_groups_normalized_text(spark):
    docs = spark.createDataFrame(
        [(1, "Hello,  World!"), (2, "hello world"), (3, "different")],
        "doc_id long, text string",
    )
    out = {r.canonical_id: r.n_copies for r in exact_duplicates(docs).collect()}
    assert out == {1: 2, 3: 1}  # normalization folds case/punct/whitespace


def test_hashed_keys_stable_and_injective(spark):
    from etl_online_retail_spark.operators.surrogate import (
        assert_injective,
        hashed_keys,
    )

    dim = spark.createDataFrame(
        [(f"c{i}", i % 3) for i in range(500)], "cust string, seg int")
    keyed = hashed_keys(dim, ["cust"], "k")
    assert_injective(keyed, ["cust"], "k")
    # stable across partitioning layouts (unlike row_number keys)
    again = {r.cust: r.k
             for r in hashed_keys(dim.repartition(7), ["cust"], "k").collect()}
    first = {r.cust: r.k for r in keyed.collect()}
    assert first == again
    # a different seed produces a different (still injective) key space
    other = {r.cust: r.k
             for r in hashed_keys(dim, ["cust"], "k", seed=1).collect()}
    assert other != first


def test_assert_injective_detects_collisions(spark):
    from etl_online_retail_spark.operators.surrogate import assert_injective

    import pytest as _pytest

    bad = spark.createDataFrame(
        [("a", 1), ("b", 1)], "cust string, k long")  # forced collision
    with _pytest.raises(ValueError, match="collides"):
        assert_injective(bad, ["cust"], "k")


def test_repeated_passage_stats_finds_cross_doc_boilerplate(spark):
    """A passage planted in several otherwise-unique docs must be flagged
    in each host; fully unique docs must score zero."""
    from etl_online_retail_spark.operators.dedup import repeated_passage_stats

    boiler = "all rights reserved by the example corp"
    rows = [(i, f"unique text number {i} alpha beta {boiler}")
            for i in range(4)]
    rows += [(10, "totally original content with no shared spans here"),
             (11, "short")]  # < n tokens: no shingles at all
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           repeated_passage_stats(docs, n=3, min_df=3).collect()}
    assert 11 not in out  # no shingles -> absent
    assert out[10].n_repeated == 0 and out[10].dup_fraction == 0.0
    for i in range(4):
        # the boilerplate span contributes >= len-2 repeated shingles
        assert out[i].n_repeated >= 5, out[i]
        assert 0.0 < out[i].dup_fraction < 1.0


def test_rrf_fuse_scores_and_null_ranks(spark):
    """Reciprocal-rank fusion: score = sum of 1/(k0+rank) over the lists
    the id appears in; a missing list leaves a NULL rank and adds 0."""
    from etl_online_retail_spark.operators.relevance import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)],
                              "doc_id int, rank int")
    b = spark.createDataFrame([(3, 1), (4, 2)], "doc_id int, rank int")
    out = {r.doc_id: r for r in
           rrf_fuse({"lex": a, "dense": b}, k0=60).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[3].lex_rank == 3 and out[3].dense_rank == 1
    assert abs(out[3].rrf_score - (1 / 63 + 1 / 61)) < 1e-12
    assert out[1].dense_rank is None
    assert abs(out[1].rrf_score - 1 / 61) < 1e-12
    assert out[4].lex_rank is None
    assert abs(out[4].rrf_score - 1 / 62) < 1e-12
    # the doc in both lists outranks single-list docs of similar depth
    assert out[3].rrf_score > out[1].rrf_score


def test_mad_outliers_flags_extremes_robustly(spark):
    """The MAD gate flags a gross outlier without the estimator itself
    being dragged by it (the failure mode of mean/stddev gating)."""
    from etl_online_retail_spark.operators.aggregates import mad_outliers

    rows = [("a", v) for v in range(1, 102)] + [("a", 10_000)]
    rows += [("b", v) for v in range(1, 102)]
    df = spark.createDataFrame(rows, "grp string, v long")
    out = {r.grp: r for r in
           mad_outliers(df, "grp", "v", k=3.0).collect()}
    # group a: median/MAD barely move despite the 10k point; it is the
    # single flagged outlier
    assert out["a"].n == 102 and out["a"].n_outliers == 1
    assert abs(out["a"].med - 51.5) < 1e-9
    assert out["b"].n == 101 and out["b"].n_outliers == 0
    assert abs(out["b"].med - 51.0) < 1e-9 and abs(out["b"].mad - 25.0) < 1e-9


def test_hashed_linear_score_semantics(spark):
    """Mean-pooled hashing-trick score: verify against a Python
    recomputation with the same weights/hash, and layout independence."""
    from etl_online_retail_spark.functions.hashing import (
        PRIME,
        hash_family,
    )
    from etl_online_retail_spark.operators.relevance import (
        HLC_DIM,
        HLC_SEED,
        hashed_linear_score,
        hlc_weights,
    )

    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "hash join hash join"),
         (3, ""), (4, "one")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in hashed_linear_score(docs).collect()}
    assert 3 not in out  # empty doc contributes no rows (matches twin)

    w = hlc_weights()
    a, b = hash_family(1, HLC_SEED)[0]

    def poly(t):
        h = 0
        for ch in t:
            h = (h * 31 + ord(ch)) % PRIME
        return h

    def score(text):
        toks = text.split()
        cs = [round(w[((a * poly(t) + b) % PRIME) % HLC_DIM], 9)
              for t in toks]
        return round(sum(cs) / len(cs), 6)

    for d, text in ((1, "the quick brown fox"),
                    (2, "hash join hash join"), (4, "one")):
        assert abs(out[d].z - score(text)) < 1e-9, d
        assert 0.0 < out[d].p_keep < 1.0
    # layout independence
    again = {r.doc_id: r.z for r in
             hashed_linear_score(docs.repartition(7)).collect()}
    assert {d: r.z for d, r in out.items()} == again
