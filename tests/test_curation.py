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


def test_gopher_flags_rules_and_edges(spark):
    """Rule semantics on constructed fixtures: word-count bounds, symbol
    ratio, alpha ratio, stopword floor, and the empty-doc guards."""
    from etl_online_retail_spark.operators.curation import (
        gopher_quality_flags,
    )

    fixtures = [
        # 60 alpha words incl. two distinct stopwords -> passes all
        (1, "the and " + " ".join(f"word{i}" for i in range(58))),
        # too short
        (2, "the and tiny doc"),
        # symbol-heavy: '#' per word pushes symbol_ratio to 1.0 > 0.1
        (3, " ".join("#tag" for _ in range(60)) + " the and"),
        # numeric tokens sink the alpha ratio below 0.8
        (4, " ".join(str(i) for i in range(55)) + " the and aaa"),
        # empty text: every count guard must hold (no div-by-zero)
        (5, "   "),
    ]
    docs = spark.createDataFrame(fixtures, "doc_id bigint, text string")
    rows = {r.doc_id: r for r in gopher_quality_flags(docs).collect()}
    assert rows[1].passes_gopher
    assert not rows[2].word_count_ok and not rows[2].passes_gopher
    assert not rows[3].symbol_ratio_ok and rows[3].n_tokens == 62
    assert not rows[4].alpha_ratio_ok and rows[4].stopword_ok
    assert rows[5].n_tokens == 0 and not rows[5].passes_gopher
    assert rows[5].mean_word_len == 0.0 and rows[5].symbol_ratio == 0.0
    # '...' counting is non-overlapping and length-normalized
    ell = spark.createDataFrame(
        [(9, "x... y...... " + " ".join(f"w{i}" for i in range(58)))],
        "doc_id bigint, text string")
    r9 = gopher_quality_flags(ell).collect()[0]
    assert abs(r9.symbol_ratio - 3 / 60.0) < 1e-12


def test_cluster_representatives_keeps_best_quality(spark):
    """Every cluster elects exactly one member; the elected member has the
    cluster's max quality (ties -> min doc_id); singletons keep
    themselves; membership partitions the corpus."""
    from etl_online_retail_spark.operators.curation import (
        cluster_representatives,
        quality_scores,
    )
    from etl_online_retail_spark.operators.dedup import (
        duplicate_clusters,
        minhash_near_duplicates,
    )

    docs = load_table(spark, "documents", SF).cache()
    reps = cluster_representatives(docs).collect()
    n_docs = docs.count()
    assert sum(r.n_members for r in reps) == n_docs
    assert len({r.cluster_id for r in reps}) == len(reps)

    # cross-check the election against the components + scores directly
    pairs = minhash_near_duplicates(docs)
    comp = {r.doc_id: r.cluster_id
            for r in duplicate_clusters(pairs).collect()}
    qual = {r.doc_id: r.quality for r in quality_scores(docs).collect()}
    by_cluster: dict[int, list[int]] = {}
    for d in qual:
        by_cluster.setdefault(comp.get(d, d), []).append(d)
    for r in reps:
        members = by_cluster[r.cluster_id]
        assert len(members) == r.n_members
        best = min(members, key=lambda d: (-qual[d], d))
        assert r.doc_id == best and abs(r.quality - qual[best]) < 1e-15


def test_incremental_near_dups_matches_full_pair_set(spark):
    """The incremental probe finds exactly the full run's cross-side
    pairs: restrict minhash_near_duplicates(all docs) to (new, corpus)
    pairs and compare - same pairs, same jaccard."""
    from etl_online_retail_spark.operators.dedup import (
        incremental_near_duplicates,
        minhash_near_duplicates,
    )

    docs = load_table(spark, "documents", SF).cache()
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    new_batch = docs.filter(F.col("doc_id") % 10 == 0)
    inc = {(r.new_id, r.corpus_id): r.jaccard
           for r in incremental_near_duplicates(corpus, new_batch).collect()}
    full = minhash_near_duplicates(docs).collect()
    expected = {}
    for r in full:
        a_new, b_new = r.id_a % 10 == 0, r.id_b % 10 == 0
        if a_new and not b_new:
            expected[(r.id_a, r.id_b)] = r.jaccard
        elif b_new and not a_new:
            expected[(r.id_b, r.id_a)] = r.jaccard
    assert inc == expected and inc, "fixture found no cross-side pairs"


def test_dsir_importance_prefers_target_like_docs(spark):
    """DSIR-lite selection (operators/curation.dsir_importance): raw docs
    sharing the target's bigrams outrank raw docs that don't; the score
    is the exact-integer cross-difference sum (hand-computed on a tiny
    corpus); docs with < n tokens have no features and are never
    candidates; ties break deterministically by doc_id."""
    from pyspark.sql import functions as F

    from etl_online_retail_spark.operators.curation import dsir_importance

    rows = [
        # target distribution: "spark shuffle" bigrams
        (0, "spark shuffle spark shuffle", "t", "s0"),
        (1, "spark shuffle plan", "t", "s0"),
        # raw pool: one target-like, one off-distribution, one tie pair
        (10, "spark shuffle runs", "r", "s0"),
        (11, "pandas loop pandas loop", "r", "s0"),
        (12, "alpha beta", "r", "s0"),
        (13, "alpha beta", "r", "s0"),
        (14, "tiny", "r", "s0"),  # < 2 tokens -> no features
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, "
                                       "kind string, source string")
    out = dsir_importance(docs, F.col("kind") == "t", n=2, buckets=64,
                          k=10).orderBy("rank").collect()
    ids = [r.doc_id for r in out]
    assert 14 not in ids, "featureless doc must not be a candidate"
    assert ids[0] == 10, "target-like doc must rank first"
    assert ids[-1] == 11, "anti-target doc must rank last"
    # tie pair (12, 13): identical text -> identical score, doc_id order
    r12 = next(r for r in out if r.doc_id == 12)
    r13 = next(r for r in out if r.doc_id == 13)
    assert r12.score == r13.score and r12.rank + 1 == r13.rank
    # exact-integer invariant: a doc's score equals the hand-folded sum
    # over its bigram buckets of tc*R - rc*T
    from etl_online_retail_spark.functions.text import PRIME

    def gram_hash(g):
        acc = 0
        for ch in g:
            acc = (acc * 31 + ord(ch)) % PRIME
        return acc

    def bigrams(text):
        t = text.split()
        return [" ".join(t[i:i + 2]) for i in range(len(t) - 1)]

    tc, rc = {}, {}
    for _id, text, kind, _src in rows:
        for g in bigrams(text):
            b = gram_hash(g) % 64
            d = tc if kind == "t" else rc
            d[b] = d.get(b, 0) + 1
    T, R = sum(tc.values()), sum(rc.values())
    for r in out:
        text = next(t for i, t, *_ in rows if i == r.doc_id)
        want = sum(tc.get(gram_hash(g) % 64, 0) * R
                   - rc.get(gram_hash(g) % 64, 0) * T
                   for g in bigrams(text))
        assert r.score == want, (r.doc_id, r.score, want)


def test_blocklist_mechanisms_agree(spark):
    """The map-side array_intersect path and the broadcast set-join path
    (the 10k+-term scale mechanism) produce identical per-doc flags,
    including zero-match docs and docs matching multiple terms."""
    from etl_online_retail_spark.operators.curation import (
        blocklist_flags,
        blocklist_flags_joined,
    )

    docs = load_table(spark, "documents", SF)
    bl = ["slow", "dup", "absent_term"]
    expr_rows = {r.doc_id: (r.n_bad_terms, r.flagged)
                 for r in blocklist_flags(docs, bl).collect()}
    join_rows = {r.doc_id: (r.n_bad_terms, r.flagged)
                 for r in blocklist_flags_joined(docs, bl).collect()}
    assert expr_rows == join_rows
    assert len(expr_rows) == docs.count()
    counts = {v[0] for v in expr_rows.values()}
    assert 0 in counts and max(counts) >= 2, \
        "fixture should include zero- and multi-term matches"


def test_curriculum_order_interleaves_sources_easy_first(spark):
    """Positions form a strict total order; the first n_sources slots of
    the curriculum are each source's single best (src_rank 1) doc — no
    domain clumping; within a source, ascending position follows
    descending quality with doc_id tiebreak."""
    from etl_online_retail_spark.operators.curation import (
        curriculum_order,
        quality_scores,
    )

    docs = load_table(spark, "documents", SF)
    out = curriculum_order(docs).collect()
    positions = [r.position for r in out]
    assert len(positions) == len(set(positions)) == docs.count()
    n_src = docs.select("source").distinct().count()
    head = sorted(out, key=lambda r: r.position)[:n_src]
    assert {r.source for r in head} == \
        {r.source for r in docs.select("source").distinct().collect()}
    assert all(r.src_rank == 1 for r in head)
    # within-source: position order == (quality desc, doc_id) order
    q = {r.doc_id: r.quality for r in quality_scores(docs).collect()}
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    for src, rows in by_src.items():
        rows.sort(key=lambda r: r.position)
        keys = [(-q[r.doc_id], r.doc_id) for r in rows]
        assert keys == sorted(keys), src
