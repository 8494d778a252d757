"""Deterministic sampling + count-min sketch operators.

Covers the properties the oracle hash-compare can't express directly:
nested samples under growing fractions, exact-k uniform sampling, the CMS
overestimate bound vs exact counts, duplicate-probe-row preservation, and
the int64 no-overflow guarantee for ids far beyond the hash prime
(cross-checked against the DuckDB twin at exactly those magnitudes).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_online_retail_spark.catalog import load_table
from etl_online_retail_spark.functions.text import normalize, tokens
from etl_online_retail_spark.operators import sampling, sketches

SF = "/root/testdata/sf0.001"


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_stratified_sample_is_nested_and_deterministic(spark):
    docs = load_table(spark, "documents", SF)
    small = sampling.stratified_sample(docs, "lang", "doc_id",
                                       {"en": 0.3}, 0.1)
    big = sampling.stratified_sample(docs, "lang", "doc_id",
                                     {"en": 0.6}, 0.2)
    s, b = set(_ids(small)), set(_ids(big))
    assert s <= b  # enlarging every fraction strictly grows the sample
    assert _ids(small) == _ids(sampling.stratified_sample(
        docs.repartition(7), "lang", "doc_id", {"en": 0.3}, 0.1))
    # realized per-stratum fraction tracks the requested one (RESOLUTION
    # granularity; small-N tolerance)
    n_en = docs.filter(F.col("lang") == "en").count()
    n_en_kept = small.filter(F.col("lang") == "en").count()
    assert 0.05 * n_en <= n_en_kept <= 0.55 * n_en


def test_uniform_sample_topk_exact_k_and_nested(spark):
    docs = load_table(spark, "documents", SF)
    n = docs.count()
    k = min(20, n)
    s1 = sampling.uniform_sample_topk(docs, "doc_id", k)
    assert s1.count() == k
    assert s1.columns == docs.columns  # helper column dropped
    # deterministic and nested: top-k is a prefix of top-2k
    s2 = sampling.uniform_sample_topk(docs.repartition(5), "doc_id", 2 * k)
    assert set(_ids(s1)) <= set(_ids(s2))
    assert _ids(s1) == _ids(sampling.uniform_sample_topk(docs, "doc_id", k))


def test_bucket_no_overflow_matches_duckdb_at_large_ids(spark):
    """hashing's no-overflow window only holds for h < PRIME; ids >= ~9.2e9
    must be pmod-reduced first on BOTH engines (ADVICE r3). Exercise ids at
    and beyond the old overflow point and hash-compare engines."""
    ids = [0, 1, 999_999_999, 9_200_000_000, 2**62, 2**63 - 1]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
    got = {r.doc_id: r.b for r in
           df.select("doc_id",
                     sampling._bucket(F.col("doc_id")).alias("b")).collect()}
    con = duckdb.connect()
    want = dict(con.execute(
        f"SELECT doc_id, {sampling.bucket_sql('doc_id')} FROM "
        f"(SELECT unnest({ids}::BIGINT[]) AS doc_id)").fetchall())
    assert got == want


def test_cms_overestimate_bound(spark):
    docs = load_table(spark, "documents", SF)
    terms = (docs.select(F.explode(tokens(normalize("text"))).alias("term"))
             .filter(F.col("term") != "").cache())
    n_total = terms.count()
    sketch = sketches.cms_sketch(terms)
    probe = terms.groupBy("term").agg(F.count(F.lit(1)).alias("n_exact"))
    rows = sketches.cms_estimate(probe, sketch).collect()
    assert len(rows) == probe.count()
    for r in rows:
        assert r.n_est >= r.n_exact  # CMS never underestimates
        # standard bound: overestimate <= 2N/width w.h.p. (deterministic
        # here: fixed data + fixed hash family)
        assert r.n_est - r.n_exact <= 2 * n_total / sketches.CMS_WIDTH
    terms.unpersist()


def test_cms_estimate_keeps_duplicate_probe_rows(spark):
    """The regroup keys on a synthetic row id, so duplicate probe rows each
    keep their own output row (ADVICE r3)."""
    corpus = spark.createDataFrame(
        [("alpha",)] * 5 + [("beta",)] * 3, "term string")
    sketch = sketches.cms_sketch(corpus)
    probe = spark.createDataFrame(
        [("alpha",), ("alpha",), ("beta",)], "term string")
    out = sketches.cms_estimate(probe, sketch).collect()
    assert len(out) == 3
    assert sorted((r.term, r.n_est) for r in out) == \
        [("alpha", 5), ("alpha", 5), ("beta", 3)]


def test_stratified_topk_exact_count_and_stability(spark):
    docs = load_table(spark, "documents", SF)
    k = 5
    out = sampling.stratified_topk_sample(docs, "lang", "doc_id", k)
    per = {r.lang: r.n for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    base = {r.lang: r.n for r in
            docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per == {lang: min(k, n) for lang, n in base.items()}
    # layout-stable and nested in k
    assert _ids(out) == _ids(sampling.stratified_topk_sample(
        docs.repartition(7), "lang", "doc_id", k))
    bigger = sampling.stratified_topk_sample(docs, "lang", "doc_id", 2 * k)
    assert set(_ids(out)) <= set(_ids(bigger))


def test_bloom_filter_no_false_negatives_and_bounded_fpr(spark):
    from etl_online_retail_spark.operators import sketches

    keys = spark.range(0, 2000, 2).withColumnRenamed("id", "k")  # evens
    m = sketches.bloom_sizing(1000)
    words = sketches.bloom_build(keys, "k", m)
    assert len(words) == m // 32
    probe = spark.range(0, 4000).withColumnRenamed("id", "k")
    hits = (probe.filter(sketches.bloom_might_contain(F.col("k"), words))
            .collect())
    hit_set = {r.k for r in hits}
    # every member passes (Bloom filters cannot have false negatives)
    assert all(k in hit_set for k in range(0, 2000, 2))
    # false-positive rate within a loose multiple of the design point
    fps = [k for k in hit_set if k % 2 == 1 or k >= 2000]
    assert len(fps) / 3000 < 0.10, len(fps)


def test_bloom_pruned_join_is_exact(spark):
    """The Bloom stage must be semantically transparent: pruned + exact
    semi-join == plain semi-join."""
    from etl_online_retail_spark.operators import sketches

    cust = (load_table(spark, "customer", SF)
            .filter(F.col("c_mktsegment") == "AUTOMOBILE")
            .select("c_custkey"))
    orders = load_table(spark, "orders", SF)
    words = sketches.bloom_build(cust, "c_custkey",
                                 sketches.bloom_sizing(cust.count()))
    pruned = orders.filter(
        sketches.bloom_might_contain(F.col("o_custkey"), words))
    via_bloom = (pruned.join(cust, pruned.o_custkey == cust.c_custkey,
                             "left_semi").select("o_orderkey"))
    plain = (orders.join(cust, orders.o_custkey == cust.c_custkey,
                         "left_semi").select("o_orderkey"))
    assert sorted(r.o_orderkey for r in via_bloom.collect()) == \
        sorted(r.o_orderkey for r in plain.collect())
    # and the prune actually prunes (scan survivors << full table)
    assert pruned.count() < orders.count()


def test_cms_is_a_monoid_under_merge(spark):
    """sketch(A ∪ B) must equal merge(sketch(A), sketch(B)) exactly — the
    property that lets shards/micro-batches sketch independently."""
    docs = load_table(spark, "documents", SF)
    terms = (docs.select("doc_id",
                         F.explode(tokens(normalize("text"))).alias("term"))
             .filter(F.col("term") != "").cache())
    a = terms.filter(F.col("doc_id") % 2 == 0).select("term")
    b = terms.filter(F.col("doc_id") % 2 == 1).select("term")
    merged = {(r.j, r.bucket): r.cnt for r in sketches.cms_merge(
        sketches.cms_sketch(a), sketches.cms_sketch(b)).collect()}
    whole = {(r.j, r.bucket): r.cnt
             for r in sketches.cms_sketch(terms.select("term")).collect()}
    assert merged == whole
    terms.unpersist()


def test_epoch_shuffle_is_stable_per_epoch_and_varies_across_epochs(spark):
    docs = load_table(spark, "documents", SF).select("doc_id")

    def layout(epoch, df):
        return {r.doc_id: (r.shard, r.pos) for r in
                sampling.epoch_shuffle(df, "doc_id", epoch, 8).collect()}

    e1 = layout(1, docs)
    assert e1 == layout(1, docs.repartition(7))  # layout-independent
    e2 = layout(2, docs)
    assert e1 != e2  # a different epoch is a different permutation
    # every (shard, pos) slot is unique and positions are dense per shard
    assert len(set(e1.values())) == len(e1)
    from collections import Counter
    per_shard = Counter(s for s, _ in e1.values())
    for s, n in per_shard.items():
        assert {p for sh, p in e1.values() if sh == s} == set(range(1, n + 1))


# ---------------------------------------------------------------------------
# KMV distinct sketch


def _kmv_rel(spark, n_vals: int, group: str = "g"):
    """(group, h0) relation with n_vals distinct portable hash values."""
    return (spark.range(n_vals)
            .select(F.lit(group).alias("src"),
                    F.pmod(F.col("id") * 7_919 + 13, F.lit(1_000_000_007))
                    .alias("h0")))


def test_kmv_estimate_within_error_bound(spark):
    """Relative error of the distinct estimate is ~1/sqrt(k); assert the
    3-sigma band on a value set well above k."""
    n = 20_000
    sk = sketches.kmv_sketch(_kmv_rel(spark, n), "src", "h0")
    est = sketches.kmv_stats(sk, "src").collect()[0].kmv_est
    tol = 3.0 / (sketches.KMV_K ** 0.5)
    assert abs(est - n) / n < tol


def test_kmv_exact_below_k(spark):
    """Fewer distinct values than k: the sketch holds them all and the
    estimate is exactly the distinct count."""
    n = sketches.KMV_K - 5
    sk = sketches.kmv_sketch(_kmv_rel(spark, n), "src", "h0")
    row = sketches.kmv_stats(sk, "src").collect()[0]
    assert row.n_kept == n and row.kmv_est == float(n)


def test_kmv_is_a_monoid(spark):
    """merge(sk(A), sk(B)) == sk(A ∪ B) exactly — the shardability
    property that lets 100 TB shards sketch locally."""
    rel = _kmv_rel(spark, 5_000).cache()
    a = rel.filter(F.col("h0") % 2 == 0)
    b = rel.filter(F.col("h0") % 2 == 1)
    merged = sketches.kmv_merge(
        sketches.kmv_sketch(a, "src", "h0"),
        sketches.kmv_sketch(b, "src", "h0"), group_col="src")
    whole = sketches.kmv_sketch(rel, "src", "h0")
    assert ({r.src for r in merged.collect()} ==
            {r.src for r in whole.collect()})
    assert (sorted(r._h for r in merged.collect()) ==
            sorted(r._h for r in whole.collect()))
    rel.unpersist()


def test_kmv_prefilter_equals_full_rank(spark):
    """The count-gated band pre-filter (the 100 TB sort-avoidance path)
    must select the identical sketch as the unfiltered rank."""
    rel = _kmv_rel(spark, 30_000)
    gated = sketches.kmv_sketch(rel, "src", "h0", prefilter_min=1)
    full = sketches.kmv_sketch(rel, "src", "h0",
                               prefilter_min=10**12)
    assert (sorted(r._h for r in gated.collect()) ==
            sorted(r._h for r in full.collect()))


def test_kmv_pair_overlap_tracks_exact_jaccard(spark):
    """Two groups built with a known 50% overlap: the sketch Jaccard and
    intersection estimates land within the 3/sqrt(k) band."""
    n = 6_000
    base = _kmv_rel(spark, 2 * n, "x").select("h0")
    rows = base.withColumn("_r", F.row_number().over(
        __import__("pyspark").sql.Window.orderBy("h0")))
    a = rows.filter(F.col("_r") <= int(1.5 * n)).select(
        F.lit("a").alias("src"), "h0")
    b = rows.filter(F.col("_r") > int(0.5 * n)).select(
        F.lit("b").alias("src"), "h0")
    sk = sketches.kmv_sketch(a.unionByName(b), "src", "h0").cache()
    out = sketches.kmv_pair_overlap(sk, "src").collect()[0]
    # |A|=|B|=1.5n, |A ∩ B|=n, |A ∪ B|=2n -> J = 0.5
    tol = 3.0 / (sketches.KMV_K ** 0.5)
    assert abs(out.jaccard_est - 0.5) < tol
    assert abs(out.union_est - 2 * n) / (2 * n) < tol
    assert abs(out.inter_est - n) / n < 2 * tol
    sk.unpersist()


# ---------------------------------------------------------------------------
# distributed prefix-sum + token-budget mix


def _scan_naive(df, part, idc, val):
    """Single-window exclusive cumsum (the semantics oracle)."""
    from pyspark.sql import Window
    w = (Window.partitionBy(part)
         .orderBy(F.asc(sampling._hval(F.col(idc))), F.asc(idc))
         .rowsBetween(Window.unboundedPreceding, -1))
    return df.withColumn(
        "cum_before",
        F.coalesce(F.sum(val).over(w), F.lit(0)).cast("bigint"))


def _rows(df):
    return sorted((r.doc_id, r.cum_before) for r in
                  df.select("doc_id", "cum_before").collect())


def test_ordered_prefix_sum_equals_single_window(spark):
    """The two-phase range-sharded scan must equal the naive one-window
    cumsum exactly, for several shard counts and under repartition."""
    docs = (load_table(spark, "documents", SF)
            .select("doc_id", "source",
                    F.col("n_chars").cast("bigint").alias("v")))
    want = _rows(_scan_naive(docs, "source", "doc_id", "v"))
    for n_shards in (1, 3, 16, 100):
        got = _rows(sampling.ordered_prefix_sum(
            docs.repartition(5), "source", "doc_id", "v",
            n_shards=n_shards))
        assert got == want, f"n_shards={n_shards}"


def test_token_budget_mix_budget_and_nesting(spark):
    docs = (load_table(spark, "documents", SF)
            .select("doc_id", "source",
                    F.col("n_chars").cast("bigint").alias("v")))
    small = sampling.token_budget_mix(docs, "source", "doc_id", "v",
                                      {}, 2_000)
    big = sampling.token_budget_mix(docs, "source", "doc_id", "v",
                                    {}, 5_000)
    s_ids = {r.doc_id for r in small.select("doc_id").collect()}
    b_ids = {r.doc_id for r in big.select("doc_id").collect()}
    assert s_ids <= b_ids  # larger budget strictly grows the mix
    # per-source total overshoots the budget by at most one document
    per = (small.groupBy("source")
           .agg(F.sum("v").alias("tot"), F.max("v").alias("mx")).collect())
    for r in per:
        assert r.tot - r.mx < 2_000
    # deterministic under physical layout changes
    again = sampling.token_budget_mix(docs.repartition(9), "source",
                                      "doc_id", "v", {}, 2_000)
    assert {r.doc_id for r in again.select("doc_id").collect()} == s_ids


# ---------------------------------------------------------------------------
# HDR log-histogram quantile sketch


def test_hdr_bucket_bounds_every_value(spark):
    """For every v: v < upper_edge(bucket(v)) <= v * (1 + 1/M) — the
    per-value relative containment the quantile bound builds on."""
    m = sketches.HDR_SUBBUCKETS
    vals = (spark.range(1, 4_000)
            .select((F.col("id") * 17 + 1).alias("v")))
    b, ub = sketches.hdr_bucket(F.col("v"), m)
    rows = vals.select("v", ub.alias("ub")).collect()
    for r in rows:
        assert r.v < r.ub <= r.v * (1 + 1.0 / m) * (1 + 1e-12)


def test_hdr_quantile_relative_error_bound(spark):
    """est is the upper edge of the bucket holding the ceil(q*N)-th
    value: exact < est <= exact * (1 + 1/M)."""
    import math

    m = sketches.HDR_SUBBUCKETS
    data = (spark.range(1, 20_000)
            .select(F.lit("g").alias("grp"),
                    (F.col("id") * F.col("id") % 999_983 + 1).alias("v")))
    hist = sketches.hdr_histogram(data, "grp", "v")
    qs = [0.5, 0.9, 0.99]
    got = {r.q: r.est for r in
           sketches.hdr_quantiles(hist, "grp", qs).collect()}
    xs = sorted(r.v for r in data.collect())
    for q in qs:
        exact = xs[math.ceil(q * len(xs)) - 1]
        assert exact < got[q] <= exact * (1 + 1.0 / m) * (1 + 1e-12), q


def test_hdr_histogram_is_mergeable(spark):
    """Shard histograms sum to the whole histogram — the monoid shape
    that makes the sketch shardable and streamable."""
    data = (spark.range(1, 10_000)
            .select(F.lit("g").alias("grp"),
                    (F.col("id") * 31 % 99_991 + 1).alias("v")))
    a = data.filter(F.col("v") % 2 == 0)
    b = data.filter(F.col("v") % 2 == 1)
    merged = (sketches.hdr_histogram(a, "grp", "v")
              .unionByName(sketches.hdr_histogram(b, "grp", "v"))
              .groupBy("grp", "bucket")
              .agg(F.min("ub").alias("ub"), F.sum("cnt").alias("cnt")))
    whole = sketches.hdr_histogram(data, "grp", "v")
    as_map = lambda df: {(r.grp, r.bucket): (r.ub, r.cnt)
                         for r in df.collect()}
    assert as_map(merged) == as_map(whole)


def test_cms_join_cardinality_overestimates_tightly(spark):
    """The sketch join-size estimate is always >= the true join size
    (collisions only add), and tight when the sketch is sparse."""
    a = spark.range(2_000).select(
        F.col("id").cast("string").alias("term"))
    # b: each key 0..499 appears 3x -> true join size = 500 * 3
    b = (spark.range(1_500)
         .select(F.pmod(F.col("id"), F.lit(500)).cast("string")
                 .alias("term")))
    est = sketches.cms_join_cardinality(
        sketches.cms_sketch(a), sketches.cms_sketch(b)).collect()[0].join_est
    true = 500 * 3
    assert est >= true
    # depth=4, width=1024: expected collision inflation ~ n_a*n_b/width
    assert est <= true + (2_000 * 1_500) // sketches.CMS_WIDTH + 100


def test_systematic_weighted_sample_properties(spark):
    """Weighted systematic selection: sample size ~ W/step, heavy rows
    always survive, survival tracks weight, layout-independent."""
    df = (spark.range(5_000)
          .select(F.col("id").alias("doc_id"),
                  (F.pmod(F.col("id") * 13, F.lit(40)) + 1).alias("w")))
    step = 100
    picked = sampling.systematic_weighted_sample(df, "doc_id", "w", step)
    rows = picked.collect()
    total_w = df.agg(F.sum("w")).collect()[0][0]
    # size within +-1 of total/step (systematic sampling exactness)
    assert abs(len(rows) - total_w / step) <= 1
    # a row heavier than the step always survives
    heavy = df.withColumn("w", F.col("w") + F.lit(step))
    hp = sampling.systematic_weighted_sample(heavy, "doc_id", "w", step)
    assert hp.count() == heavy.count()
    # deterministic under repartition
    again = sampling.systematic_weighted_sample(
        df.repartition(9), "doc_id", "w", step)
    assert ({r.doc_id for r in rows}
            == {r.doc_id for r in again.collect()})
    # survival frequency increases with weight (aggregate check)
    by_w = {r.w: r.frac for r in
            (df.join(picked.select("doc_id", F.lit(1).alias("_p")),
                     "doc_id", "left")
             .groupBy("w")
             .agg((F.sum(F.coalesce(F.col("_p"), F.lit(0)))
                   / F.count(F.lit(1))).alias("frac"))).collect()}
    light = sum(by_w[w] for w in range(1, 11)) / 10
    heavy_frac = sum(by_w[w] for w in range(31, 41)) / 10
    assert heavy_frac > 2 * light


def test_temperature_mix_flattens_and_nests(spark):
    from etl_online_retail_spark.operators import sampling

    # three sources with very different sizes: 1000 / 100 / 10
    rows = ([(i, "big") for i in range(1000)]
            + [(1000 + i, "mid") for i in range(100)]
            + [(1100 + i, "small") for i in range(10)])
    df = spark.createDataFrame(rows, "doc_id BIGINT, source STRING")
    rates = {r.source: r for r in
             sampling.temperature_rates(df, "source", 300).collect()}
    # alpha=0.5 weights: sqrt(1000):sqrt(100):sqrt(10) ~ 31.6:10:3.16
    import math
    denom = math.sqrt(1000) + math.sqrt(100) + math.sqrt(10)
    for name, n in (("big", 1000), ("mid", 100), ("small", 10)):
        assert rates[name].p_temp == pytest.approx(math.sqrt(n) / denom,
                                                   rel=1e-6)
    # flattening: the small source's SHARE of the sample beats its share
    # of the corpus; the big source's keep-RATE is the lowest
    assert rates["small"].p_temp > 10 / 1110
    assert rates["big"].p_temp < 1000 / 1110
    kept = sampling.temperature_mix(df, "source", "doc_id", 300)
    by = {r.source: r.n for r in
          kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by["small"] == 10        # rate clamps at 1.0: keep everything
    assert by.get("big", 0) < 1000  # big is genuinely downsampled
    # nested samples: a larger budget keeps a superset
    small_ids = {r.doc_id for r in kept.collect()}
    bigger = {r.doc_id for r in sampling.temperature_mix(
        df, "source", "doc_id", 600).collect()}
    assert small_ids <= bigger


def test_length_bucket_batches_integer_caps_and_waste(spark):
    from etl_online_retail_spark.operators.packing import (
        length_bucket_batches,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate([1, 2, 3, 4, 5, 8, 9, 15, 16, 17, 0])],
        "doc_id BIGINT, n_tok BIGINT")
    out = length_bucket_batches(df, "doc_id", F.col("n_tok"), 4)
    rows = out.collect()
    # zero-token doc excluded; capacities are next powers of two
    caps = {r.bucket_cap for r in rows}
    assert caps <= {1, 2, 4, 8, 16, 32}
    total_docs = sum(r.n_docs for r in rows)
    assert total_docs == 10
    for r in rows:
        assert r.padded_tokens >= r.real_tokens
        assert r.n_docs <= 4
    # bucketed beats naive on padded tokens for this spread
    naive = length_bucket_batches(df, "doc_id", F.col("n_tok"), 4,
                                  bucketed=False)
    pad_b = sum(r.padded_tokens for r in rows)
    pad_n = sum(r.padded_tokens for r in naive.collect())
    assert pad_b <= pad_n
