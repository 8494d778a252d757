"""Corpus curation: the composed training-data pipeline.

quality scoring -> exact dedup (canonical per fingerprint) -> MinHash+LSH
near-dup removal -> curated corpus. This is the end-to-end shape a
large-scale pretraining data pipeline runs; each stage is an operator this
package already oracle-checks individually, composed into one lazy plan.

Near-dup drop rule: a document is removed when any verified pair (a, b)
with a < b names it as b - deterministic, one pass, no iterative
connected-components (at 100 TB, CC over near-dup edges is a follow-up
GraphFrames/iterative job; the dominant-id rule removes every duplicate of
a surviving canonical and is the standard first-order policy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_online_retail_spark.functions.text import (
    STOPWORDS,
    normalize,
    punct_ratio,
    stopword_ratio,
    token_count,
    tokens,
)
from etl_online_retail_spark.operators.dedup import (
    _shingled,
    duplicate_clusters,
    exact_duplicates,
    minhash_near_duplicates,
)


def quality_scores(docs: DataFrame, text_col: str = "text",
                   norm_col: str | None = None) -> DataFrame:
    """doc_id, n_tokens, quality (the oracle-checked doc_quality formula).

    norm_col: already-normalized twin of text_col; only the stopword ratio
    reads it (token/punct ratios are defined over the RAW text).
    """
    nt = token_count(text_col)
    quality = quality_expr(text_col, norm_col=norm_col)
    return docs.select("doc_id", nt.alias("n_tokens"), quality.alias("quality"))


def quality_expr(text_col: str = "text",
                 norm_col: str | None = None):
    """THE quality formula as a Column — the single definition every
    consumer (doc_quality, the curation pipeline, rank normalization,
    quality-weighted sampling) builds on, so a tuning change can never
    silently diverge between them. SQL twin: workload_ext._QUALITY_SQL.
    """
    nt = token_count(text_col)
    pr = punct_ratio(text_col)
    if norm_col is not None:
        sr = stopword_ratio(norm_col, "en", normalized=True)
    else:
        sr = stopword_ratio(text_col, "en")
    return (F.lit(0.5) * sr
            + F.lit(0.3) * F.least(nt / F.lit(100.0), F.lit(1.0))
            + F.lit(0.2) * (F.lit(1.0) - pr))


# Gopher rule thresholds (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", table A1) — the
# standard per-document heuristic filter battery a pretraining pipeline
# runs before any model-based scoring.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_RATIO = 0.8
GOPHER_MIN_STOPWORDS = 2


def gopher_quality_flags(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id",
                         min_words: int = GOPHER_MIN_WORDS,
                         max_words: int = GOPHER_MAX_WORDS,
                         min_stopwords: int = GOPHER_MIN_STOPWORDS,
                         ) -> DataFrame:
    """Per-document Gopher rule flags (one boolean column per rule plus
    the conjunction) — the rule-level report a curation run audits before
    committing to a floor, beside the scalar quality_expr score.

    Every measure is integer counting plus one IEEE int/int division, so
    the flags are bit-exact cross-engine. Pure per-row projection: no
    shuffle, survives any scale as a map stage.

    Rules (raw whitespace tokens unless noted):
      word_count_ok     min_words <= n <= max_words
      mean_word_len_ok  3 <= (sum of token lengths / n) <= 10
      symbol_ratio_ok   ('#' + non-overlapping '...') / n <= 0.1
      alpha_ratio_ok    >= 80% of tokens contain an ASCII letter
      stopword_ok       >= min_stopwords DISTINCT English stopwords
                        present (normalized text)
    """
    t = F.col(text_col)
    toks = tokens(t)
    n = token_count(t)
    sum_len = F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
    mean_wl = (F.when(n == 0, F.lit(0.0))
               .otherwise(sum_len.cast("double") / n.cast("double")))
    hash_cnt = F.length(t) - F.length(F.regexp_replace(t, "#", ""))
    ell_cnt = ((F.length(t) - F.length(F.regexp_replace(t, r"\.\.\.", "")))
               / F.lit(3)).cast("int")
    sym_ratio = (F.when(n == 0, F.lit(0.0))
                 .otherwise((hash_cnt + ell_cnt).cast("double")
                            / n.cast("double")))
    alpha_cnt = F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]")))
    alpha_ratio = (F.when(n == 0, F.lit(0.0))
                   .otherwise(alpha_cnt.cast("double") / n.cast("double")))
    stop_cnt = F.size(F.array_intersect(
        F.array_distinct(tokens(normalize(t))),
        F.array(*[F.lit(w) for w in STOPWORDS["en"]])))
    flags = {
        "word_count_ok": (n >= min_words) & (n <= max_words),
        "mean_word_len_ok": ((n > 0)
                             & (mean_wl >= GOPHER_MIN_MEAN_WORD_LEN)
                             & (mean_wl <= GOPHER_MAX_MEAN_WORD_LEN)),
        "symbol_ratio_ok": sym_ratio <= GOPHER_MAX_SYMBOL_RATIO,
        "alpha_ratio_ok": (n > 0) & (alpha_ratio >= GOPHER_MIN_ALPHA_RATIO),
        "stopword_ok": stop_cnt >= min_stopwords,
    }
    passes = None
    for c in flags.values():
        passes = c if passes is None else (passes & c)
    return docs.select(
        F.col(id_col),
        n.alias("n_tokens"),
        mean_wl.alias("mean_word_len"),
        sym_ratio.alias("symbol_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        stop_cnt.cast("int").alias("n_stopwords"),
        *[c.alias(name) for name, c in flags.items()],
        passes.alias("passes_gopher"))


def cluster_representatives(docs: DataFrame, n: int = 2, k: int = 16,
                            bands: int = 4, threshold: float = 0.5,
                            ) -> DataFrame:
    """Keep-best retention: ONE representative per near-dup cluster — the
    retention policy that completes the dedup story (curate_corpus's
    dominant-id rule keeps the minimum id; real pipelines keep the
    highest-QUALITY member of each connected component).

    Returns (cluster_id, doc_id, quality, n_members) for the KEPT docs:
    the highest-quality member of every near-dup cluster (ties broken by
    minimum doc id — deterministic), singletons keeping themselves with
    n_members = 1.

    Scale shape: pairs/components come from the banded machinery (never
    all-pairs); the election is one groupBy(cluster_id) argmax via struct
    max — a single hash aggregation with map-side partials, no window, no
    sort. Quality is the shared oracle-exact formula, so the float
    comparison is cross-engine deterministic.
    """
    pairs = minhash_near_duplicates(docs, n=n, k=k, bands=bands,
                                    threshold=threshold)
    comps = duplicate_clusters(pairs)
    labeled = (quality_scores(docs)
               .join(comps, "doc_id", "left")
               .withColumn("cluster_id",
                           F.coalesce(F.col("cluster_id"), F.col("doc_id"))))
    # argmax by (quality, -doc_id): struct max orders lexicographically,
    # so equal-quality ties resolve to the SMALLEST doc id
    best = F.max(F.struct(F.col("quality"),
                          (-F.col("doc_id")).alias("_negid"))).alias("_best")
    return (labeled.groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("n_members"), best)
            .select("cluster_id",
                    (-F.col("_best._negid")).alias("doc_id"),
                    F.col("_best.quality").alias("quality"),
                    "n_members"))


SPLIT_A = 48271          # affine split hash (MINSTD multiplier)
SPLIT_B = 11213


def with_split(docs: DataFrame, id_col: str = "doc_id",
               train_pct: int = 90, val_pct: int = 5) -> DataFrame:
    """Deterministic train/val/test assignment from an affine hash of the
    id - stable across runs, engines, partitionings (no rand()), and
    reproducible downstream forever. bucket = ((id*a + b) % PRIME) % 100.
    """
    from etl_online_retail_spark.functions.hashing import PRIME

    # pmod into [0, PRIME) first: id * SPLIT_A overflows int64 for raw ids
    # >= ~1.9e14 (reachable at 100 TB); value-preserving for smaller ids
    h = F.pmod(F.col(id_col).cast("bigint"), F.lit(PRIME))
    bucket = ((h * SPLIT_A + SPLIT_B) % PRIME) % 100
    split = (F.when(bucket < train_pct, "train")
             .when(bucket < train_pct + val_pct, "val")
             .otherwise("test"))
    return docs.withColumn("split", split)


def split_sql(id_expr: str, train_pct: int = 90, val_pct: int = 5) -> str:
    """DuckDB twin of with_split's split expression."""
    from etl_online_retail_spark.functions.hashing import PRIME

    h = f"((({id_expr})::BIGINT % {PRIME} + {PRIME}) % {PRIME})"
    bucket = f"(({h} * {SPLIT_A}::BIGINT + {SPLIT_B}) % {PRIME}) % 100"
    return (f"(CASE WHEN {bucket} < {train_pct} THEN 'train' "
            f"WHEN {bucket} < {train_pct + val_pct} THEN 'val' "
            f"ELSE 'test' END)")


def bernoulli_stratified_sample(df: DataFrame, strata_col: str,
                                fractions: dict, seed: int = 42) -> DataFrame:
    """Per-stratum Bernoulli sampling (df.sampleBy): down-weight
    over-represented classes/languages/sources in one pass. Deterministic
    for a fixed seed and input, but engine-specific RNG - covered by tests
    (determinism + per-stratum rates), not by the SQL oracle.

    For exact, engine-portable, oracle-verifiable sampling use
    operators/sampling.stratified_sample (hash-bucket cutoffs) instead;
    sampleBy is the idiomatic Spark path when statistical (not
    reproducible-across-engines) sampling is wanted. Renamed from
    stratified_sample to make the RNG-vs-deterministic split explicit.
    """
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def decontamination_overlap(corpus: DataFrame, eval_docs: DataFrame,
                            n: int = 3, min_shared: int = 3,
                            text_col: str = "text",
                            id_col: str = "doc_id",
                            corpus_shingles: DataFrame | None = None,
                            eval_shingles: DataFrame | None = None) -> DataFrame:
    """Benchmark-decontamination check: per corpus doc, how many distinct
    word n-gram shingles it shares with ANY eval-set document.

    The standard pretraining hygiene op (eval-set n-gram overlap). Shape at
    100 TB: the eval set is small -> its distinct shingle set broadcasts;
    the corpus explodes shingles and semi-joins, so the only large relation
    streams map-side with a per-doc count aggregation. Output: doc_id,
    n_shared, contaminated (n_shared >= min_shared); docs with zero
    overlap are absent.

    corpus_shingles / eval_shingles: optional precomputed exploded
    (id_col, _h) relations. When corpus and eval set are carved from the
    same table, the caller shingles it ONCE (cached) and passes both
    filtered views, instead of running the normalize+ngram+hash pass per
    side (see workload_ext.q_decontamination_overlap).
    """
    from etl_online_retail_spark.functions.text import (
        normalize,
        tokens,
        word_shingle_hashes_of_tokens,
    )

    if eval_shingles is None:
        toked = eval_docs.select(tokens(normalize(text_col)).alias("_t"))
        eval_shingles = toked.select(
            F.explode(word_shingle_hashes_of_tokens(F.col("_t"), n))
             .alias("_h"))
    ev = eval_shingles.select("_h").distinct()
    if corpus_shingles is not None:
        co = corpus_shingles
    else:
        toked = corpus.select(F.col(id_col),
                              tokens(normalize(text_col)).alias("_t"))
        co = toked.select(
            F.col(id_col),
            F.explode(word_shingle_hashes_of_tokens(F.col("_t"), n))
             .alias("_h"))
    return (co.join(F.broadcast(ev), "_h")
              .groupBy(id_col)
              .agg(F.count(F.lit(1)).alias("n_shared"))
              .withColumn("contaminated", F.col("n_shared") >= min_shared))


def curate_corpus(docs: DataFrame, min_quality: float = 0.35,
                  n: int = 2, k: int = 16, bands: int = 4,
                  threshold: float = 0.5) -> DataFrame:
    """Curated corpus: doc_id, n_tokens, quality for every surviving doc.

    Keeps docs that (1) meet the quality floor, (2) are the canonical
    (minimum) id of their exact-content group, (3) are not the dominated
    side of any verified near-dup pair.
    """
    # One cached base relation carries the normalized text; every stage
    # (quality stopwords, exact-dedup fingerprint, near-dup shingles) reads
    # it instead of re-running the 3-regex normalization per stage. The
    # shingle relation is likewise computed ONCE and cached: it feeds the
    # minhash signature pipeline's two self-join sides AND the verify joins
    # (at 100 TB both caches become persist(DISK) or a staged parquet).
    base = (docs.select("doc_id", "text",
                        normalize("text").alias("_norm")).cache())
    shingled = _shingled(base, "text", "doc_id", n, norm_col="_norm").cache()
    scored = quality_scores(base, norm_col="_norm")
    canonical = (exact_duplicates(base, norm_col="_norm")
                 .select(F.col("canonical_id").alias("doc_id")))
    dominated = (minhash_near_duplicates(base, n=n, k=k, bands=bands,
                                         threshold=threshold,
                                         shingled=shingled)
                 .select(F.col("id_b").alias("doc_id"))
                 .distinct())
    return (scored
            .filter(F.col("quality") >= min_quality)
            .join(canonical, "doc_id", "left_semi")
            .join(dominated, "doc_id", "left_anti"))


def rank_normalize(df: DataFrame, part_col: str, order_col: str,
                   tiebreak_col: str,
                   out_col: str = "rank_pct") -> DataFrame:
    """Percentile-rank normalization within each partition: append
    out_col = (rank - 1) / (n - 1) in [0, 1] (0 when the partition is a
    singleton, matching PERCENT_RANK in both engines).

    The curation use: raw quality scores are not comparable across
    sources (each source has its own score distribution), so mixing
    policies threshold on the WITHIN-SOURCE percentile instead — "keep
    every source's top 40%" — which is exactly this transform. The
    tiebreak column makes the ordering total, so the rank (and the
    normalized value: one exact-integer division in double) is
    deterministic and oracle-hash-exact.

    One window pass per partition key; scales like any keyed window.
    """
    from pyspark.sql import Window

    w = (Window.partitionBy(part_col)
         .orderBy(F.col(order_col), F.col(tiebreak_col)))
    return df.withColumn(out_col, F.percent_rank().over(w))


def contrastive_negatives(docs: DataFrame, anchors: DataFrame,
                          k: int = 3, n_buckets: int = 16,
                          id_col: str = "doc_id",
                          group_col: str = "source",
                          seed: int = 77) -> DataFrame:
    """Deterministic random negatives for contrastive training: for each
    anchor document, k pseudo-random corpus documents from a DIFFERENT
    group (source), reproducible across runs and engines — the negative
    half of an (anchor, positive, negatives) triplet builder. Hard
    negatives (same-bucket near-misses) come from the similarity
    operators; these are the unbiased easy negatives every contrastive
    recipe also needs, without rand() (the repo's determinism rule).

    Shape: candidates get a hash bucket (affine universal hash, pmod-
    first so ids >= 2^61 can't overflow — the sampling.py lesson); each
    anchor probes k buckets derived from (anchor, round). The join is an
    EQUI-join on the bucket, so each (anchor, round) scans ~N/n_buckets
    candidates, never the corpus — n_buckets is the cost/diversity knob
    (at 100 TB, size it so a bucket is a few thousand docs). Within a
    probed bucket the winner is the minimum pairwise hash — one ranking
    window per (anchor, round).

    Output: (anchor_id, neg_round 0..k-1, neg_id, neg_group). A round
    whose bucket holds no eligible candidate yields no row (use more
    buckets per round or larger n_buckets if full coverage is needed).
    """
    from etl_online_retail_spark.functions.hashing import (
        PRIME,
        hash_family,
    )
    from pyspark.sql import Window

    (a1, b1), (a2, b2), (a3, b3), (a4, b4) = hash_family(4, seed=seed)

    def _aff(h, a, b):
        return (F.pmod(h.cast("bigint"), F.lit(PRIME)) * F.lit(a)
                + F.lit(b)) % F.lit(PRIME)

    cand = docs.select(
        F.col(id_col).alias("neg_id"),
        F.col(group_col).alias("neg_group"),
        F.pmod(_aff(F.col(id_col), a1, b1), F.lit(n_buckets))
         .alias("_bkt"),
        _aff(F.col(id_col), a3, b3).alias("_ch"))
    probes = (anchors
              .select(F.col(id_col).alias("anchor_id"),
                      F.col(group_col).alias("_agrp"))
              .select("anchor_id", "_agrp",
                      F.explode(F.sequence(F.lit(0), F.lit(k - 1)))
                       .alias("neg_round"))
              .withColumn(
                  "_bkt",
                  F.pmod(_aff(F.pmod(F.col("anchor_id").cast("bigint"),
                                     F.lit(PRIME)) * F.lit(k)
                              + F.col("neg_round"), a2, b2),
                         F.lit(n_buckets)))
              .withColumn("_ah", _aff(F.col("anchor_id"), a4, b4)))
    paired = (probes.join(cand, "_bkt")
              .filter((F.col("neg_id") != F.col("anchor_id"))
                      & (F.col("neg_group") != F.col("_agrp")))
              .withColumn("_ph", (F.col("_ch") + F.col("_ah"))
                          % F.lit(PRIME)))
    w = (Window.partitionBy("anchor_id", "neg_round")
         .orderBy(F.col("_ph"), F.col("neg_id")))
    return (paired
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("anchor_id",
                    F.col("neg_round").cast("bigint").alias("neg_round"),
                    "neg_id", "neg_group"))


def auto_n_buckets(n_docs: int, target_bucket: int = 1024,
                   floor: int = 16) -> int:
    """Bucket count for contrastive_negatives that holds the per-probe
    candidate scan ~constant as the corpus grows: ~target_bucket docs per
    bucket. With fixed buckets the probe cost is N/B per (anchor, round)
    — linear in N, i.e. anchors x N overall; sizing B ~ N/target makes it
    anchors x target instead (measured: the 2x->10x smoke is quadratic at
    B=16 and ~linear under auto sizing — the auto_n_planes lesson from
    the embedding LSH)."""
    return max(floor, n_docs // target_bucket)


def contrastive_triplets(docs: DataFrame, n: int = 2, k: int = 16,
                         bands: int = 4, threshold: float = 0.5,
                         n_buckets: int = 16, seed: int = 77,
                         id_col: str = "doc_id",
                         group_col: str = "source") -> DataFrame:
    """(anchor, positive, negative) training triplets — the complete
    contrastive-pair construction this module's pieces exist for:
    positives are verified MinHash near-duplicates (genuinely similar
    text), negatives the deterministic different-group easy negatives of
    contrastive_negatives, one per (anchor, round).

    Output: (anchor_id, pos_id, jaccard, neg_round, neg_id, neg_group) —
    one row per (near-dup pair, negative round) WHOSE ANCHOR FOUND AN
    ELIGIBLE NEGATIVE: the inner assembly join drops a pair when the
    anchor's probed bucket holds no different-group document (possible
    when one source dominates or n_buckets is large next to the
    corpus; raise the negative rounds or lower n_buckets to recover
    such anchors — documented r7). All construction is
    hash-deterministic: the same corpus yields the same triplets on any
    engine, run, or layout.

    Scale shape: the positive side is the LSH pipeline (banded
    candidates only); the negative side the bucket equi-join; the final
    assembly one keyed join between two output-bounded relations.
    """
    from etl_online_retail_spark.operators.dedup import (
        minhash_near_duplicates,
    )

    pos = (minhash_near_duplicates(docs, id_col=id_col, n=n, k=k,
                                   bands=bands, threshold=threshold)
           .select(F.col("id_a").alias("anchor_id"),
                   F.col("id_b").alias("pos_id"), "jaccard"))
    anchors = docs.join(
        pos.select(F.col("anchor_id").alias(id_col)).distinct(),
        id_col, "left_semi")
    negs = (contrastive_negatives(docs, anchors, k=1,
                                  n_buckets=n_buckets, id_col=id_col,
                                  group_col=group_col, seed=seed))
    return pos.join(negs, "anchor_id")


def dsir_importance(docs: DataFrame, is_target,
                    n: int = 2, buckets: int = 256, k: int = 10,
                    id_col: str = "doc_id", text_col: str = "text",
                    strata_col: str = "source") -> DataFrame:
    """DSIR-style importance-weighted data selection (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    score every RAW document by how target-like its hashed n-gram
    profile is, then keep the top-k per stratum.

    Public-method derivation, exact-integer variant: DSIR weights are
    log p_target(x)/p_raw(x) under bag-of-hashed-ngrams models. Logs
    are not bit-reproducible across engines, so this linearizes the
    per-feature term to the cross-difference
        c[b] = tc[b] * R - rc[b] * T
    (tc/rc = target/raw occurrence counts in hash bucket b, T/R their
    totals) — positive exactly when the bucket is over-represented in
    the target (tc/T > rc/R), i.e. the first-order expansion of the
    log-ratio around equal rates. A doc's score is the sum of c[bucket]
    over its n-gram OCCURRENCES — pure BIGINT/DECIMAL(38,0) arithmetic,
    so selection is deterministic and the DuckDB oracle is hash-exact
    (products stay < 10^38 up to ~10^12 total n-grams ≈ 100 TB of
    text).

    Scale shape (100 TB story): one explode over token n-grams, one
    map-combined groupBy down to `buckets` rows, a 1-row total, the
    bucket->contribution table BROADCAST back into the exploded
    relation (no shuffle on the big side beyond the per-doc groupBy),
    and the per-stratum top-k via distributed_rank_by — the
    range-sharded exact rank, never a per-source single-partition
    window. Docs with fewer than n tokens have no features and are
    not candidates (the oracle's join drops them identically).

    is_target: a boolean Column marking target-distribution rows.
    Returns (id, stratum, n_grams, score, rank) for rank <= k raw docs.
    """
    from etl_online_retail_spark.functions.text import (
        word_shingle_hashes_all_of_tokens,
    )
    from etl_online_retail_spark.operators.windows import (
        distributed_rank_by,
    )

    base = docs.select(
        F.col(id_col), F.col(strata_col),
        is_target.alias("_is_t"),
        tokens(normalize(F.col(text_col))).alias("_toks"))
    grams = (base.select(
        id_col, strata_col, "_is_t",
        F.explode(word_shingle_hashes_all_of_tokens(F.col("_toks"), n))
        .alias("_gh"))
        .withColumn("_bucket", (F.col("_gh") % buckets).cast("int")))
    grams = grams.cache()  # feeds both the model build and the scoring
    bucket_counts = (grams.groupBy("_bucket").agg(
        F.sum(F.col("_is_t").cast("bigint")).alias("_tc"),
        F.sum((~F.col("_is_t")).cast("bigint")).alias("_rc")))
    totals = bucket_counts.agg(F.sum("_tc").alias("_T"),
                               F.sum("_rc").alias("_R"))
    contrib = (bucket_counts.crossJoin(F.broadcast(totals)).select(
        "_bucket",
        (F.col("_tc").cast("decimal(19,0)")
         * F.col("_R").cast("decimal(19,0)")
         - F.col("_rc").cast("decimal(19,0)")
         * F.col("_T").cast("decimal(19,0)"))
        .cast("decimal(38,0)").alias("_c")))
    scored = (grams.filter(~F.col("_is_t"))
              .join(F.broadcast(contrib), "_bucket")
              .groupBy(id_col, strata_col)
              .agg(F.count(F.lit(1)).alias("n_grams"),
                   # internal arithmetic stays DECIMAL(38,0); the final
                   # BIGINT cast is presentation-layer (pandas-stable on
                   # both engines) and exact below 2^63 — at corpus
                   # scales where scores could exceed it, widen the
                   # output to keep the decimal
                   F.sum("_c").cast("bigint").alias("score")))
    ranked = distributed_rank_by(
        scored, [strata_col],
        order=[F.col("score").desc(), F.col(id_col).asc()],
        shard_by=-F.col("score").cast("double"),
        n_shards=32, alias="rank", nulls="last")
    return (ranked.filter(F.col("rank") <= k)
            .select(id_col, strata_col, "n_grams", "score",
                    F.col("rank").cast("int").alias("rank")))


def blocklist_flags(docs: DataFrame, blocklist: list[str],
                    id_col: str = "doc_id", text_col: str = "text",
                    strata_col: str = "source") -> DataFrame:
    """C4-style blocklist filtering (Raffel et al. 2020 drop documents
    containing denylist terms): per-doc distinct-match count + flag.

    Mechanism: array_intersect between the doc's distinct token set and
    a LITERAL array — a pure JVM map-side expression, zero shuffle, the
    right plan while the blocklist fits in an expression (hundreds of
    terms). For industrial lists (10k+ terms, where a regex alternation
    or literal array stops scaling) use blocklist_flags_joined — same
    output, broadcast set-join mechanism (equality-tested).
    """
    toks = F.array_distinct(tokens(normalize(F.col(text_col))))
    matched = F.array_intersect(
        toks, F.array(*[F.lit(t) for t in blocklist]))
    return docs.select(
        F.col(id_col), F.col(strata_col),
        F.size(matched).cast("int").alias("n_bad_terms"),
        (F.size(matched) > 0).alias("flagged"))


def blocklist_flags_joined(docs: DataFrame, blocklist: list[str],
                           id_col: str = "doc_id", text_col: str = "text",
                           strata_col: str = "source") -> DataFrame:
    """blocklist_flags via explode + broadcast set-join — the mechanism
    that scales to arbitrarily large blocklists (the list becomes a
    table; at 100 TB the join stays broadcast until the blocklist
    itself outgrows executors, then sort-merge on the term). LEFT join
    keeps zero-match docs in the output like the expression path."""
    spark = docs.sparkSession
    if not blocklist:
        # same output as the expression path: zero matches everywhere
        # (createDataFrame([]) cannot infer an empty schema — r7 review)
        return docs.select(
            F.col(id_col), F.col(strata_col),
            F.lit(0).cast("int").alias("n_bad_terms"),
            F.lit(False).alias("flagged"))
    bl = spark.createDataFrame([(t,) for t in blocklist], ["_term"])
    toks = (docs.select(
        F.col(id_col), F.col(strata_col),
        F.explode_outer(F.array_distinct(
            tokens(normalize(F.col(text_col))))).alias("_term")))
    hits = (toks.join(F.broadcast(bl.withColumn("_hit", F.lit(1))),
                      "_term", "left")
            .groupBy(id_col, strata_col)
            .agg(F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
                 .cast("int").alias("n_bad_terms")))
    return hits.select(id_col, strata_col, "n_bad_terms",
                       (F.col("n_bad_terms") > 0).alias("flagged"))


def curriculum_order(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     strata_col: str = "source") -> DataFrame:
    """Deterministic curriculum ordering: rank docs easy->hard per source
    (quality DESC — the standard proxy: cleanest data first), then
    round-robin INTERLEAVE the sources so no training window clumps on
    one domain. position = (src_rank - 1) * n_sources + source_index is
    a strict total order; sorting by it yields the curriculum. Positions
    are sparse once short sources exhaust — they are sort keys, not
    dense ids (a dense re-number would need a global pass the consumer's
    writer does anyway).

    Scale shape: per-source ranks via distributed_rank_by (range-sharded
    exact ranks — no per-source single-partition window); the source
    dimension is BOUNDED by construction, so its row_number window and
    broadcast join are dimension-sized; everything else is map-side
    integer arithmetic. Quality is the shared oracle-exact formula, so
    the ordering is cross-engine deterministic (ties by doc id).
    """
    from pyspark.sql import Window

    from etl_online_retail_spark.operators.windows import (
        distributed_rank_by,
    )

    base = docs.select(
        F.col(id_col), F.col(strata_col),
        quality_expr(text_col).alias("_q"))
    # nulls="last": F.desc is desc_nulls_last in Spark, so a NULL
    # quality (NULL text) must shard ABOVE every real value (r7 review)
    ranked = distributed_rank_by(
        base, [strata_col],
        order=[F.col("_q").desc(), F.col(id_col).asc()],
        shard_by=-F.col("_q"), n_shards=32, alias="src_rank",
        nulls="last")
    # bounded source dimension: index + count ride one broadcast each
    dim = (base.select(strata_col).distinct()
           .withColumn("_sidx",
                       F.row_number().over(Window.orderBy(strata_col))
                       .cast("bigint") - 1))
    nsrc = dim.agg(F.count(F.lit(1)).alias("_nsrc"))
    return (ranked.join(F.broadcast(dim), strata_col)
            .crossJoin(F.broadcast(nsrc))
            .select(id_col, strata_col,
                    F.col("src_rank").cast("bigint").alias("src_rank"),
                    ((F.col("src_rank") - 1) * F.col("_nsrc")
                     + F.col("_sidx")).cast("bigint").alias("position")))
