"""Unit tests for the session-4 operators: cross-document duplicate spans
(operators/spans.py), the inverted index (relevance.inverted_index),
k-anonymity (operators/privacy.py), triangle counts (graph.triangle_counts)
and last-touch attribution (sessionize.last_touch_attribution) — golden
fixtures with hand-checked answers plus each operator's invariants."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_online_retail_spark.operators.graph import triangle_counts
from etl_online_retail_spark.operators.privacy import (
    k_anonymity_report,
    k_anonymize,
)
from etl_online_retail_spark.operators.relevance import inverted_index
from etl_online_retail_spark.operators.sessionize import last_touch_attribution
from etl_online_retail_spark.operators.spans import (
    duplicate_spans,
    span_dedup_stats,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


# ---------------------------------------------------------------------------
# duplicate_spans


@pytest.fixture(scope="module")
def span_docs(spark):
    rows = [
        (1, "a b c d e f g h"),          # shares a..f with doc 2
        (2, "x x a b c d e f y"),
        (3, "p q r z p q r"),            # verbatim repeat WITHIN one doc
        (4, "m n"),                      # fewer than width tokens
        (5, "   "),                      # blank after normalization
    ]
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


def test_duplicate_spans_golden(spark, span_docs):
    out = duplicate_spans(span_docs, width=3, min_count=2)
    got = {(r.doc_id, r.span_start, r.span_end, r.n_windows, r.dup_tokens)
           for r in out.collect()}
    assert got == {
        # doc 1: windows abc bcd cde def (pos 0..3) merge -> [0, 6)
        (1, 0, 6, 4, 6),
        # doc 2: same four windows at pos 2..5 -> [2, 8)
        (2, 2, 8, 4, 6),
        # doc 3: pqr at pos 0 and 4 -> two spans (gap breaks the island)
        (3, 0, 3, 1, 3),
        (3, 4, 7, 1, 3),
    }


def test_duplicate_spans_merges_adjacent_windows(spark):
    # 'a b c' at pos 0 and again at pos 3: spans [0,3) and [3,6) touch
    # (gap 0) and must merge into one [0, 6) span
    docs = spark.createDataFrame(
        [(1, "a b c a b c z"), (2, "a b c q")],
        "doc_id BIGINT, text STRING")
    out = duplicate_spans(docs, width=3, min_count=2)
    got = {(r.doc_id, r.span_start, r.span_end) for r in out.collect()}
    assert (1, 0, 6) in got
    assert (2, 0, 3) in got


def test_duplicate_spans_normalizes_text(spark):
    # case and punctuation differences must not defeat the match
    docs = spark.createDataFrame(
        [(1, "Alpha, Beta GAMMA delta!"), (2, "alpha beta gamma x")],
        "doc_id BIGINT, text STRING")
    out = duplicate_spans(docs, width=3, min_count=2).collect()
    assert {(r.doc_id, r.span_start, r.span_end) for r in out} == {
        (1, 0, 3), (2, 0, 3)}


def test_excise_spans_golden(spark, span_docs):
    from etl_online_retail_spark.operators.spans import excise_spans

    out = {r.doc_id: (r.n_tokens, r.dup_tokens, r.cleaned)
           for r in excise_spans(span_docs, width=3,
                                 min_count=2).collect()}
    # doc 1 loses tokens 0..5 (a..f), keeps "g h"; doc 2 keeps the flanks
    assert out[1] == (8, 6, "g h")
    assert out[2] == (9, 6, "x x y")
    # doc 3 loses both pqr copies, keeps the middle "z"
    assert out[3] == (7, 6, "z")
    # doc 4 is below the window width: untouched passthrough
    assert out[4] == (2, 0, "m n")
    # blank doc 5 is not tokenizable: absent (same contract as the
    # measurement queries)
    assert 5 not in out


def test_excise_spans_can_empty_a_document(spark):
    from etl_online_retail_spark.operators.spans import excise_spans

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], "doc_id BIGINT, text STRING")
    out = {r.doc_id: (r.dup_tokens, r.cleaned)
           for r in excise_spans(docs, width=3, min_count=2).collect()}
    assert out == {1: (3, ""), 2: (3, "")}


def test_span_dedup_stats_rollup(spark, span_docs):
    out = {r.doc_id: (r.n_spans, r.dup_tokens_total)
           for r in span_dedup_stats(span_docs, width=3,
                                     min_count=2).collect()}
    assert out == {1: (1, 6), 2: (1, 6), 3: (2, 6)}


# ---------------------------------------------------------------------------
# inverted_index


def test_inverted_index_golden(spark):
    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "apple")],
        "doc_id BIGINT, text STRING")
    out = inverted_index(docs, min_df=2)
    got = {(r.term, r.df, r.cf, r.posting_rank, r.doc_id, r.tf)
           for r in out.collect()}
    assert got == {
        ("apple", 2, 3, 1, 1, 2),    # tf 2 outranks tf 1
        ("apple", 2, 3, 2, 3, 1),
        ("banana", 2, 2, 1, 1, 1),   # tf tie -> doc_id order
        ("banana", 2, 2, 2, 2, 1),
    }  # cherry: df 1 < min_df, dropped


def test_inverted_index_max_postings_truncates(spark):
    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "apple")],
        "doc_id BIGINT, text STRING")
    out = inverted_index(docs, min_df=2, max_postings=1).collect()
    assert {(r.term, r.doc_id) for r in out} == {("apple", 1), ("banana", 1)}
    assert all(r.posting_rank == 1 for r in out)


# ---------------------------------------------------------------------------
# k-anonymity


@pytest.fixture(scope="module")
def qi_rows(spark):
    rows = [("us", "a", i) for i in range(3)] \
        + [("us", "b", 10)] \
        + [("de", "a", 20), ("de", "a", 21)]
    return spark.createDataFrame(rows, "country STRING, seg STRING, x INT")


def test_k_anonymity_report_flags_small_groups(spark, qi_rows):
    rep = {(r.country, r.seg): (r.n_rows, r.suppressed)
           for r in k_anonymity_report(qi_rows, ["country", "seg"],
                                       k=2).collect()}
    assert rep == {("us", "a"): (3, False),
                   ("us", "b"): (1, True),
                   ("de", "a"): (2, False)}


def test_k_anonymize_suppresses_and_preserves_schema(spark, qi_rows):
    out = k_anonymize(qi_rows, ["country", "seg"], k=2)
    assert out.columns == qi_rows.columns
    rows = out.collect()
    assert len(rows) == 5                       # the ("us","b") row is gone
    assert all((r.country, r.seg) != ("us", "b") for r in rows)
    # invariant: every released QI group has >= k members
    sizes = (out.groupBy("country", "seg").count().collect())
    assert all(r["count"] >= 2 for r in sizes)


def test_k_anonymize_k1_is_identity(spark, qi_rows):
    assert k_anonymize(qi_rows, ["country", "seg"], k=1).count() \
        == qi_rows.count()


def test_k_anonymity_rejects_bad_k(spark, qi_rows):
    with pytest.raises(ValueError):
        k_anonymity_report(qi_rows, ["country"], k=0)


# ---------------------------------------------------------------------------
# triangle_counts


def _sym(edges):
    return [(a, b) for a, b in edges] + [(b, a) for a, b in edges]


def test_triangle_counts_two_triangles_sharing_a_node(spark):
    e = spark.createDataFrame(
        _sym([(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5)]),
        "src BIGINT, dst BIGINT")
    got = {r.node: r.n_triangles for r in triangle_counts(e).collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1, 5: 1}


def test_triangle_counts_k4(spark):
    # K4 holds 4 triangles; every node sits in C(3,2) = 3 of them
    e = spark.createDataFrame(
        _sym([(a, b) for a in range(1, 5) for b in range(a + 1, 5)]),
        "src BIGINT, dst BIGINT")
    got = {r.node: r.n_triangles for r in triangle_counts(e).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    assert sum(got.values()) == 3 * 4           # 3 corners per triangle


def test_triangle_counts_no_triangle_in_a_path(spark):
    e = spark.createDataFrame(_sym([(1, 2), (2, 3), (3, 4)]),
                              "src BIGINT, dst BIGINT")
    assert triangle_counts(e).count() == 0


# ---------------------------------------------------------------------------
# last_touch_attribution


def test_last_touch_attribution_golden(spark):
    rows = [
        # user 1: view then click then purchase -> LAST touch (click) wins
        (1, 1, _ts("2024-01-01T00:00:00"), "view", 0.0),
        (2, 1, _ts("2024-01-01T01:00:00"), "click", 0.0),
        (3, 1, _ts("2024-01-01T02:00:00"), "purchase", 50.0),
        # user 2: touch 30h before purchase -> outside 24h window -> none
        (4, 2, _ts("2024-01-01T00:00:00"), "click", 0.0),
        (5, 2, _ts("2024-01-02T06:00:00"), "purchase", 30.0),
        # user 3: purchase with no preceding events at all -> none
        (6, 3, _ts("2024-01-01T00:00:00"), "purchase", 20.0),
        # user 4: touch at the SAME ts but HIGHER event_id is not
        # "preceding" under the (ts, event_id) order -> none
        (7, 4, _ts("2024-01-01T00:00:00"), "purchase", 10.0),
        (8, 4, _ts("2024-01-01T00:00:00"), "click", 0.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id INT, user_id INT, ts TIMESTAMP_NTZ, "
              "event_type STRING, value DOUBLE")
    got = {r.event_id: (r.attributed_type, r.lag_us)
           for r in last_touch_attribution(ev, window_hours=24).collect()}
    assert got == {
        3: ("click", 3_600_000_000),
        5: ("none", None),
        6: ("none", None),
        7: ("none", None),
    }


# ---------------------------------------------------------------------------
# physical-plan audits: the shapes the docstrings claim must be the
# shapes Catalyst actually produces


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_attribution_plan_shares_one_exchange(spark):
    """Both carried window values (touch ts, touch type) must ride ONE
    shuffle on user_id — the whole point of the windowed formulation
    over a touches x conversions range join."""
    ev = spark.createDataFrame(
        [(1, 1, dt.datetime(2024, 1, 1), "view", 0.0)],
        "event_id INT, user_id INT, ts TIMESTAMP_NTZ, "
        "event_type STRING, value DOUBLE")
    plan = _plan(last_touch_attribution(ev))
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]


def test_zscore_plan_shares_one_exchange_and_window(spark):
    """count/sum/sum-of-squares over the same frame must share one
    exchange AND one Window operator."""
    from etl_online_retail_spark.operators.timeseries import (
        rolling_zscore_anomalies,
    )

    ev = spark.createDataFrame(
        [(1, 1, dt.datetime(2024, 1, 1), 1.0)],
        "event_id INT, user_id INT, ts TIMESTAMP_NTZ, value DOUBLE")
    plan = _plan(rolling_zscore_anomalies(ev, "user_id", "ts",
                                          "event_id", "value"))
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]
    assert plan.count("Window ") == 1, plan[:2000]


def test_k_anonymize_plans_broadcast_semi_join(spark, qi_rows=None):
    """The surviving-group relation is group-sized — the release filter
    must plan as a BROADCAST semi-join, not a shuffle of the input."""
    df = spark.createDataFrame([("us", "a", 1)] * 8,
                               "country STRING, seg STRING, x INT")
    plan = _plan(k_anonymize(df, ["country", "seg"], k=2))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan[:2000]


def test_quarantine_routes_nulls_and_multi_violations(spark):
    from etl_online_retail_spark.operators.constraints import quarantine

    df = spark.createDataFrame(
        [(1, 10.0, "click"), (2, 999.0, "click"), (3, 10.0, "weird"),
         (4, 999.0, "weird"), (5, None, "click")],
        "id INT, value DOUBLE, event_type STRING")
    rules = [("value_cap", F.col("value") <= 300.0),
             ("known_type", F.col("event_type").isin("click", "view"))]
    valid, invalid = quarantine(df, rules)
    assert [r.id for r in valid.collect()] == [1]
    got = {r.id: r.violations for r in invalid.collect()}
    assert got == {2: "value_cap", 3: "known_type",
                   4: "value_cap,known_type",   # one row, both names
                   5: "value_cap"}              # NULL pred = violation
    # nothing falls into neither side (the three-valued-logic trap)
    assert valid.count() + invalid.count() == df.count()
    assert valid.columns == df.columns           # schema-preserving


def test_contrastive_triplets_shape(spark):
    from etl_online_retail_spark.operators.curation import (
        contrastive_triplets,
    )

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog", "s0"),
         (2, "the quick brown fox jumps over the lazy cat", "s0"),
         (3, "totally unrelated words about fruit and vegetables", "s1"),
         (4, "more unrelated content goes here with distinct terms", "s2")],
        "doc_id BIGINT, text STRING, source STRING")
    # n_buckets=1 so the single negative probe is guaranteed to see the
    # two eligible docs at this fixture scale (with 16 buckets a probe
    # may legitimately land in an empty bucket — documented behavior)
    rows = contrastive_triplets(docs, k=16, bands=8, threshold=0.5,
                                n_buckets=1).collect()
    assert rows, "the planted near-dup pair must anchor a triplet"
    for r in rows:
        assert r.anchor_id < r.pos_id          # canonical pair direction
        assert r.jaccard >= 0.5
        assert r.neg_id not in (r.anchor_id, r.pos_id)
        assert r.neg_group != "s0"             # different-group negative


def test_jackknife_mean_tracks_classic_se(spark):
    from etl_online_retail_spark.operators.aggregates import jackknife_mean

    # deterministic pseudo-data with real spread
    df = (spark.range(4000)
          .select(F.col("id"),
                  (F.pmod(F.col("id") * 2654435761, F.lit(1000)))
                  .cast("bigint").alias("v")))
    r = jackknife_mean(df, "id", "v", n_buckets=32).collect()[0]
    assert r.n_rows == 4000
    assert r.ci_lo < r.mean < r.ci_hi and r.se > 0
    # the delete-one jackknife of a mean ~ s/sqrt(n); agree within 25%
    import math
    rows = df.collect()
    vals = [row.v for row in rows]
    mu = sum(vals) / len(vals)
    sd = math.sqrt(sum((x - mu) ** 2 for x in vals) / (len(vals) - 1))
    classic = sd / math.sqrt(len(vals))
    assert abs(r.se - classic) / classic < 0.25
    assert r.mean == pytest.approx(mu, rel=1e-9)


def test_jackknife_constant_data_has_zero_se(spark):
    from etl_online_retail_spark.operators.aggregates import jackknife_mean

    df = spark.range(640).select(
        F.col("id"), F.lit(500).cast("bigint").alias("v"))
    r = jackknife_mean(df, "id", "v", n_buckets=32).collect()[0]
    assert (r.mean, r.se) == (500.0, 0.0)
    assert r.ci_lo == r.ci_hi == 500.0


def test_conversion_lag_sketch_tracks_exact_percentiles(spark):
    """The HDR-sketch default must agree with the exact interpolated
    fold within the sketch's relative-error bound: the bucket upper edge
    sits at or above the rank value and within a (1 + 1/M) factor of it
    (M = 32 sub-buckets -> ~3.1%; a little slack covers interpolation
    between adjacent ranks)."""
    from etl_online_retail_spark.workload_serving import (
        q_conversion_lag_percentiles,
        q_conversion_lag_percentiles_exact,
    )

    sf = "/root/testdata/sf0.001"
    est = {(r.attributed_type, r.q): r.est_lag_us
           for r in q_conversion_lag_percentiles(spark, sf).collect()}
    for r in q_conversion_lag_percentiles_exact(spark, sf).collect():
        for q, exact in ((0.5, r.p50_lag_us), (0.9, r.p90_lag_us),
                         (0.99, r.p99_lag_us)):
            sketch = est[(r.attributed_type, q)]
            assert sketch > 0
            # upper-edge estimate: never far below, bounded above
            assert sketch >= exact * 0.97, (r.attributed_type, q)
            assert sketch <= exact * 1.05 + 1, (r.attributed_type, q)


def test_jackknife_single_occupied_bucket_yields_null_not_nan(spark):
    """With every row in one bucket the leave-one-out mean has no
    complement: its 0/0 must be NULL (excluded by COUNT), so se/ci come
    back NULL — never a NaN that COUNT silently tallies as a value."""
    import math

    from etl_online_retail_spark.operators.aggregates import jackknife_mean

    df = spark.range(5).select(
        F.col("id"), (F.col("id") * 100).cast("bigint").alias("v"))
    r = jackknife_mean(df, "id", "v", n_buckets=1).collect()[0]
    assert r.n_rows == 5
    assert r.mean == 200.0                       # the mean itself is fine
    for x in (r.se, r.ci_lo, r.ci_hi):
        assert x is None or not math.isnan(x)
    assert r.se is None                          # honest NULL, not NaN


def test_k_anonymize_broadcast_false_still_correct(spark):
    """broadcast=False (the wide-QI escape hatch) must not hint the keep
    relation and must return the identical release."""
    df = spark.createDataFrame(
        [("us", "a", i) for i in range(4)] + [("fr", "b", 9)],
        "country STRING, seg STRING, x INT")
    hinted = k_anonymize(df, ["country", "seg"], k=2)
    unhinted = k_anonymize(df, ["country", "seg"], k=2, broadcast=False)
    assert sorted(map(tuple, unhinted.collect())) \
        == sorted(map(tuple, hinted.collect()))
    assert "ResolvedHint" not in unhinted._jdf.queryExecution() \
        .analyzed().toString()


def test_copurchase_pmi_golden(spark):
    import math

    from etl_online_retail_spark.operators.graph import copurchase_pmi

    rows = [  # (orderkey, partkey); o1 duplicates part 1 (must not count 2x)
        (1, 1), (1, 1), (1, 2),
        (2, 1), (2, 2),
        (3, 1), (3, 3),
        (4, 2),
    ]
    li = spark.createDataFrame(rows, "l_orderkey BIGINT, l_partkey BIGINT")
    out = copurchase_pmi(li, min_orders=2).collect()
    assert len(out) == 1                       # (1,3) joint support 1 drops
    r = out[0]
    assert (r.src, r.dst, r.n_both, r.n_src, r.n_dst) == (1, 2, 2, 3, 3)
    lift = 4.0 * 2.0 / (3.0 * 3.0)
    assert r.lift == pytest.approx(lift)
    assert r.pmi == pytest.approx(round(math.log(lift), 9))
    assert r.pmi < 0                           # below-chance co-occurrence


def test_copurchase_rules_confidence_asymmetric(spark):
    from etl_online_retail_spark.operators.graph import copurchase_rules

    rows = [  # part 1 in 4 baskets, part 2 in 2; both together in 2
        (1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (4, 1),
    ]
    li = spark.createDataFrame(rows, "l_orderkey BIGINT, l_partkey BIGINT")
    got = {(r.antecedent, r.consequent): (r.n_both, r.n_antecedent,
                                          r.confidence)
           for r in copurchase_rules(li, min_orders=2,
                                     min_confidence=0.0).collect()}
    # P(2|1) = 2/4, P(1|2) = 2/2 — direction matters
    assert got[(1, 2)] == (2, 4, 0.5)
    assert got[(2, 1)] == (2, 2, 1.0)
    # min_confidence prunes the weak direction only
    pruned = {(r.antecedent, r.consequent)
              for r in copurchase_rules(li, min_orders=2,
                                        min_confidence=0.75).collect()}
    assert pruned == {(2, 1)}


def test_rolling_zscore_flags_spike_not_head(spark):
    from etl_online_retail_spark.operators.timeseries import (
        rolling_zscore_anomalies,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: alternating 10/12 baseline, then a spike
    for i in range(10):
        rows.append((i, 1, t0 + dt.timedelta(minutes=i),
                     10.0 if i % 2 == 0 else 12.0))
    rows.append((10, 1, t0 + dt.timedelta(minutes=10), 100.0))
    # user 2: extreme 5th value but only 4 baseline rows -> unjudged
    for i in range(4):
        rows.append((20 + i, 2, t0 + dt.timedelta(minutes=i), 10.0))
    rows.append((24, 2, t0 + dt.timedelta(minutes=4), 1000.0))
    # user 3: flat baseline (sd = 0) -> spike emits no row
    for i in range(6):
        rows.append((30 + i, 3, t0 + dt.timedelta(minutes=i), 10.0))
    rows.append((36, 3, t0 + dt.timedelta(minutes=6), 100.0))
    ev = spark.createDataFrame(
        rows, "event_id INT, user_id INT, ts TIMESTAMP_NTZ, value DOUBLE")
    out = rolling_zscore_anomalies(ev, "user_id", "ts", "event_id", "value",
                                   lookback=10, min_obs=5,
                                   threshold=3.0).collect()
    assert [(r.user_id, r.event_id, r.baseline_n) for r in out] \
        == [(1, 10, 10)]
    # hand-computed: cents baseline mean 1100, sample sd over 5x(+-100)
    n, s, s2 = 10.0, 11000.0, 12200000.0
    sd = ((s2 - s * s / n) / (n - 1.0)) ** 0.5
    z = (10000.0 - s / n) / sd
    assert out[0].zscore == pytest.approx(round(z, 6))


def test_rank_normalize_golden_and_singleton(spark):
    from etl_online_retail_spark.operators.curation import rank_normalize

    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0), ("a", 4, 40.0),
         ("b", 5, 99.0)],
        "src STRING, id INT, score DOUBLE")
    got = {r.id: r.rank_pct
           for r in rank_normalize(df, "src", "score", "id").collect()}
    assert got == {1: 0.0, 3: pytest.approx(1 / 3), 2: pytest.approx(2 / 3),
                   4: 1.0, 5: 0.0}          # singleton partition -> 0


def test_psi_identical_vs_shifted_distributions(spark):
    from etl_online_retail_spark.operators.profile import psi_by_group

    rows = []
    # eight groups share one bucket mix (they ARE the corpus shape);
    # one group concentrates all mass elsewhere
    common = [f"g{i}" for i in range(8)]
    for g in common:
        rows += [(g, b) for b in (0, 0, 1, 1, 2, 2)]
    rows += [("shifted", 9)] * 6
    rel = spark.createDataFrame(rows, "src STRING, bkt INT")
    got = {r.src: (r.n_rows, r.psi) for r in
           psi_by_group(rel, "src", "bkt").collect()}
    assert all(n == 6 for n, _ in got.values())
    # the common groups match each other exactly and sit near the corpus
    # distribution -> stable band; the concentrated group is far shifted
    assert len({got[g] for g in common}) == 1
    assert got[common[0]][1] < 0.1              # "stable" band
    assert got["shifted"][1] > 0.25             # "shifted" band


def test_contrastive_negatives_invariants(spark):
    from etl_online_retail_spark.operators.curation import (
        contrastive_negatives,
    )

    docs = spark.createDataFrame(
        [(i, f"s{i % 5}") for i in range(200)],
        "doc_id BIGINT, source STRING")
    anchors = docs.filter(F.col("doc_id") % 40 == 0)
    out = contrastive_negatives(docs, anchors, k=3, n_buckets=8)
    rows = out.collect()
    assert rows, "expected at least one negative"
    for r in rows:
        assert r.neg_id != r.anchor_id
        assert r.neg_group != f"s{r.anchor_id % 5}"
        assert 0 <= r.neg_round < 3
    per_anchor = {}
    for r in rows:
        key = (r.anchor_id, r.neg_round)
        assert key not in per_anchor          # one winner per round
        per_anchor[key] = r.neg_id
    # deterministic under physical re-layout of the input
    again = {(r.anchor_id, r.neg_round): r.neg_id
             for r in contrastive_negatives(
                 docs.repartition(7), anchors, k=3, n_buckets=8).collect()}
    assert again == per_anchor


def test_l_diversity_flags_homogeneous_groups(spark):
    from etl_online_retail_spark.operators.privacy import l_diversity_report

    df = spark.createDataFrame(
        [("us", "cancer"), ("us", "cancer"), ("us", "cancer"),   # homogeneous
         ("de", "flu"), ("de", "cancer"),                        # diverse
         ("fr", "flu")],
        "country STRING, diagnosis STRING")
    rep = {r.country: (r.n_rows, r.n_sensitive, r.diverse)
           for r in l_diversity_report(df, ["country"], "diagnosis",
                                       l=2).collect()}
    # 'us' is 3-anonymous yet totally homogeneous — the case k-anonymity
    # alone cannot see
    assert rep == {"us": (3, 1, False), "de": (2, 2, True),
                   "fr": (1, 1, False)}
    with pytest.raises(ValueError):
        l_diversity_report(df, ["country"], "diagnosis", l=0)


def test_pca_invariants(spark):
    import math

    from etl_online_retail_spark.operators.similarity import (
        pca_project,
        train_pca,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    mean, comp = train_pca(emb, k=8)
    d = len(mean)
    # components orthonormal
    for i in range(8):
        for j in range(8):
            dot = sum(comp[i][t] * comp[j][t] for t in range(d))
            assert dot == pytest.approx(1.0 if i == j else 0.0, abs=1e-9)
        # deterministic sign: largest-|coeff| entry positive
        mx = max(range(d), key=lambda t: abs(comp[i][t]))
        assert comp[i][mx] > 0
    out8 = pca_project(emb, mean, comp).collect()
    assert all(0.0 <= r.var_ratio <= 1.0 + 1e-12 for r in out8
               if r.var_ratio is not None and not math.isnan(r.var_ratio))
    # k = d reconstructs exactly (full basis)
    mean_f, comp_f = train_pca(emb, k=d)
    outd = pca_project(emb, mean_f, comp_f).collect()
    assert all(r.recon_err < 1e-9 for r in outd)
    # more components capture no less energy, vector by vector
    e8 = {r.vec_id: r.recon_err for r in out8}
    mean4, comp4 = train_pca(emb, k=4)
    out4 = pca_project(emb, mean4, comp4).collect()
    assert all(e8[r.vec_id] <= r.recon_err + 1e-9 for r in out4)
    # layout determinism: training reads a hash-ORDERED sample
    mean_r, comp_r = train_pca(emb.repartition(7), k=8)
    assert mean_r == mean and comp_r == comp


def test_linear_attribution_splits_and_conserves(spark):
    from etl_online_retail_spark.operators.sessionize import (
        linear_attribution_credit,
    )

    rows = [
        # purchase 3 splits 10.0 across the two preceding touches
        (1, 1, _ts("2024-01-01T00:00:00"), "click", 0.0),
        (2, 1, _ts("2024-01-01T01:00:00"), "view", 0.0),
        (3, 1, _ts("2024-01-01T02:00:00"), "purchase", 10.0),
        # purchase 4 has no touches -> 'none' keeps its full value
        (4, 2, _ts("2024-01-01T00:00:00"), "purchase", 7.0),
        # purchase 6's only touch is outside 24h -> 'none' too
        (5, 3, _ts("2024-01-01T00:00:00"), "click", 0.0),
        (6, 3, _ts("2024-01-02T12:00:00"), "purchase", 3.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id INT, user_id INT, ts TIMESTAMP_NTZ, "
              "event_type STRING, value DOUBLE")
    got = {r.attributed_type: (r.n_credits, r.credit)
           for r in linear_attribution_credit(ev,
                                              window_hours=24).collect()}
    assert got == {"click": (1, 5.0), "view": (1, 5.0),
                   "none": (2, 10.0)}
    # conservation: total credit equals total conversion value
    assert sum(c for _, c in got.values()) == pytest.approx(20.0)


def test_last_touch_attribution_intervening_purchase_keeps_touch(spark):
    # touch, purchase, purchase: BOTH purchases attribute to the touch
    # (a purchase is not a touch and does not reset the carry)
    rows = [
        (1, 1, _ts("2024-01-01T00:00:00"), "view", 0.0),
        (2, 1, _ts("2024-01-01T00:30:00"), "purchase", 5.0),
        (3, 1, _ts("2024-01-01T01:00:00"), "purchase", 7.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id INT, user_id INT, ts TIMESTAMP_NTZ, "
              "event_type STRING, value DOUBLE")
    got = {r.event_id: r.attributed_type
           for r in last_touch_attribution(ev, window_hours=24).collect()}
    assert got == {2: "view", 3: "view"}


def test_observed_load_collects_metrics_in_one_pass(spark, tmp_path):
    from etl_online_retail_spark.operators.profile import observed_load

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None)],
        "id INT, name STRING")
    out, fetch = observed_load(df)
    out.write.parquet(str(tmp_path / "observed"))   # the ONLY action
    got = fetch()
    assert got == {"n_rows": 4, "null_id": 0, "null_name": 2}
    # the written data is untouched by the observation
    back = spark.read.parquet(str(tmp_path / "observed"))
    assert back.count() == 4


def test_pricing_summary_plan_is_one_scan_one_exchange(spark):
    """The Q1 report must stay a single scan with map-side partial
    aggregation and exactly one Exchange — nine aggregates or not."""
    import __spark_entry__ as m

    df = m.queries()["pricing_summary"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") + plan.count("FileScan") >= 1
    assert plan.count("Exchange") == 1, plan[:2000]
    assert "partial_sum" in plan          # map-side combine engaged


def test_t_closeness_report_exact_tvd(spark):
    """Handcrafted distributions: global sensitive mix is 50/50 (8
    rows); group g1 mirrors it exactly (TVD 0), group g2 is fully
    one-sided (4 rows of 's1' -> TVD = |1-0.5|/... = 0.5)."""
    from etl_online_retail_spark.operators.privacy import (
        t_closeness_report,
    )

    rows = ([("g1", "s1")] * 2 + [("g1", "s2")] * 2
            + [("g2", "s1")] * 4)
    # global: s1 6/8, s2 2/8; g1: s1 2/4 s2 2/4; g2: s1 4/4
    df = spark.createDataFrame(rows, "grp STRING, sens STRING")
    rep = {r.grp: (r.n_rows, r.tvd, r.t_close)
           for r in t_closeness_report(df, ["grp"], "sens",
                                       t_num=1, t_den=4).collect()}
    # g1: |2/4-6/8| + |2/4-2/8| = 0.25+0.25 -> TVD 0.25 <= 1/4 (close)
    assert rep["g1"] == (4, 0.25, True)
    # g2: |4/4-6/8| + |0-2/8| = 0.25+0.25 -> TVD 0.25, boundary EXACTLY
    # at t: the integer cross-multiplication keeps <= true
    assert rep["g2"] == (4, 0.25, True)
    # tighten t to 1/5: both groups now fail via the same exact compare
    rep5 = {r.grp: r.t_close
            for r in t_closeness_report(df, ["grp"], "sens",
                                        t_num=1, t_den=5).collect()}
    assert rep5 == {"g1": False, "g2": False}


def test_t_closeness_identical_distribution_is_zero(spark):
    from etl_online_retail_spark.operators.privacy import (
        t_closeness_report,
    )

    rows = [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")]
    df = spark.createDataFrame(rows, "grp STRING, sens STRING")
    rep = {r.grp: (r.tvd, r.t_close)
           for r in t_closeness_report(df, ["grp"], "sens",
                                       t_num=0, t_den=1).collect()}
    assert rep == {"a": (0.0, True), "b": (0.0, True)}
