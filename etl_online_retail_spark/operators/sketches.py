"""Count-min sketch: sublinear-memory frequency estimation over a corpus.

The exact heavy-hitters query (groupBy term) shuffles the full vocabulary;
at 100 TB the vocabulary of noisy text (URLs, ids, typos) is itself huge.
The count-min sketch bounds the state at depth x width counters whatever
the vocabulary size: each occurrence increments one bucket per hash row,
and a term's estimate is the MIN over its buckets — always >= the true
count, over by at most ~2N/width with high probability.

Everything is deterministic portable arithmetic (functions/hashing: the
polynomial string hash composed with inlined affine maps), so unlike most
sketch implementations this one is oracle-verifiable bit-for-bit: the
DuckDB twin rebuilds the identical sketch in SQL.

Scale notes: building the sketch is ONE explode + hash aggregation over
(row, bucket) — depth x width groups, map-side combinable; the probe side
broadcasts the sketch (KB-sized) against whatever terms need estimates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_online_retail_spark.functions.hashing import (
    PRIME,
    affine,
    affine_sql,
    hash_family,
    poly_hash,
    poly_hash_sql,
)

CMS_WIDTH = 1024
CMS_DEPTH = 4
CMS_SEED = 99


def _cms_h0(col, numeric_keys: bool):
    """Portable base hash into [0, PRIME): char-fold for strings, a
    direct pmod for integer keys (stringifying 10^12 join keys through
    the per-character fold is pure waste — measured ~2x on the
    join-cardinality query)."""
    return (F.pmod(col.cast("bigint"), F.lit(PRIME)) if numeric_keys
            else poly_hash(col))


def cms_sketch(terms: DataFrame, term_col: str = "term",
               width: int = CMS_WIDTH, depth: int = CMS_DEPTH,
               seed: int = CMS_SEED, numeric_keys: bool = False) -> DataFrame:
    """Build the sketch from a term-occurrence relation: one row per
    (hash row j, bucket) with its counter. depth*width rows total.

    Occurrences are pre-aggregated per distinct term BEFORE hashing, so the
    expensive char-fold hash runs once per VOCAB entry, not once per
    occurrence — at 100 TB the occurrence count dwarfs the vocabulary and
    the pre-aggregation is a map-side-combinable count. Integer keys set
    numeric_keys=True and skip the string fold entirely."""
    counted = (terms.groupBy(term_col)
               .agg(F.count(F.lit(1)).alias("_w")))
    hashed = counted.select(
        _cms_h0(F.col(term_col), numeric_keys).alias("_h0"), "_w")
    rows = F.array(*[
        F.struct(F.lit(j).alias("j"),
                 (affine(F.col("_h0"), a, b) % width).alias("bucket"))
        for j, (a, b) in enumerate(hash_family(depth, seed))
    ])
    return (hashed
            .select(F.explode(rows).alias("_s"), "_w")
            .select(F.col("_s.j").alias("j"), F.col("_s.bucket").alias("bucket"),
                    "_w")
            .groupBy("j", "bucket")
            .agg(F.sum("_w").alias("cnt")))


def cms_estimate(probe: DataFrame, sketch: DataFrame,
                 term_col: str = "term",
                 width: int = CMS_WIDTH, depth: int = CMS_DEPTH,
                 seed: int = CMS_SEED,
                 numeric_keys: bool = False) -> DataFrame:
    """Attach `n_est` (the count-min estimate) to every probe row: compute
    the probe term's depth buckets, look each up in the broadcast sketch,
    take the min. Missing buckets count 0 (term never hashed there).

    Probe rows are tagged with a unique row id before the explode and the
    regroup keys on that id, so duplicate probe rows each keep their own
    output row and non-groupable probe column types (map, ...) are fine.

    `numeric_keys` MUST match the cms_sketch build flag: the sketch's
    integer fast path hashes pmod(key, PRIME) while the default path
    poly-hashes the digits — probing with the other convention silently
    reads unrelated counters (r7 review)."""
    h0 = _cms_h0(F.col(term_col), numeric_keys)
    rows = F.array(*[
        F.struct(F.lit(j).alias("j"),
                 (affine(h0, a, b) % width).alias("bucket"))
        for j, (a, b) in enumerate(hash_family(depth, seed))
    ])
    tagged = probe.withColumn("_rid", F.monotonically_increasing_id())
    probed = (tagged
              .withColumn("_s", F.explode(rows))
              .select("_rid", *probe.columns, F.col("_s.j").alias("j"),
                      F.col("_s.bucket").alias("bucket")))
    joined = (probed
              .join(F.broadcast(sketch), ["j", "bucket"], "left")
              .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0))))
    return (joined.groupBy("_rid")
            .agg(*[F.first(c).alias(c) for c in probe.columns],
                 F.min("cnt").alias("n_est"))
            .select(*probe.columns, "n_est"))


def cms_bucket_sql(term_expr: str, j: int,
                   width: int = CMS_WIDTH, depth: int = CMS_DEPTH,
                   seed: int = CMS_SEED) -> str:
    """DuckDB twin of hash row j's bucket for a term expression."""
    a, b = hash_family(depth, seed)[j]
    return f"({affine_sql(poly_hash_sql(term_expr), a, b)}) % {width}"


def cms_merge(*parts: DataFrame) -> DataFrame:
    """Merge sketches built over disjoint shards: element-wise counter sum.

    CMS is a monoid — sketch(A ∪ B) == merge(sketch(A), sketch(B)) exactly
    (tested) — which is what makes it shardable at 100 TB: each executor/
    micro-batch sketches its slice, the KB-sized partials merge in one
    tiny aggregation, and no term-level relation ever crosses the wire."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("j", "bucket").agg(F.sum("cnt").alias("cnt"))


# ---------------------------------------------------------------------------
# Bloom filter: broadcast-sized membership pre-filter for join pruning.
#
# The 100 TB structure this encodes: a fact⋈dim join where the dim subset
# is too big to broadcast as ROWS but its KEY SET compresses to a KB-MB bit
# array. The fact scan is pruned by the filter (pure JVM row expression, no
# shuffle, no join), and only survivors — true matches plus the small
# false-positive residue — reach the exact join. Results are EXACT (the
# residual join removes false positives); the Bloom stage only moves work
# off the shuffle. Spark's AQE runtime row-group filtering uses the same
# trick internally; this is the explicit, operator-level form.

BLOOM_K = 4
BLOOM_SEED = 1234
# filter words are 32-bit so the div/mod bit tests stay exact in DOUBLE


def _bloom_positions(key: "F.col", m_bits: int, k: int, seed: int) -> list:
    from etl_online_retail_spark.functions.hashing import PRIME

    h = F.pmod(key.cast("bigint"), F.lit(PRIME))
    return [affine(h, a, b) % m_bits for (a, b) in hash_family(k, seed)]


def bloom_build(keys: DataFrame, key_col: str, m_bits: int,
                k: int = BLOOM_K, seed: int = BLOOM_SEED) -> list[int]:
    """Build the filter distributed, collect it driver-side as 32-bit
    words (len = m_bits/32). The collect is bounded by m_bits — KB-scale,
    same class as the vocab/query-set collects documented elsewhere; at
    very large m a deployment switches to a broadcast variable with a
    native BloomFilter, semantics unchanged."""
    if m_bits % 32:
        raise ValueError("m_bits must be a multiple of 32")
    pos = (keys.filter(F.col(key_col).isNotNull())   # a NULL key can
           # never match a probe; unfiltered it NULLs every position and
           # crashes the driver-side word fold (r7 review)
           .select(F.explode(F.array(
               *_bloom_positions(F.col(key_col), m_bits, k, seed)))
               .alias("p"))
        .distinct().collect())
    words = [0] * (m_bits // 32)
    for r in pos:
        words[r.p // 32] |= 1 << (r.p % 32)
    return words


def bloom_might_contain(key, words: list[int], k: int = BLOOM_K,
                        seed: int = BLOOM_SEED):
    """JVM-only membership test: all k bit positions set. Bit extraction is
    floor-div/mod on 32-bit words — exact in DOUBLE (< 2^53), no shifts
    with column operands (unsupported), no UDF."""
    m_bits = len(words) * 32
    arr = F.lit(words)
    cond = F.lit(True)
    for p in _bloom_positions(key, m_bits, k, seed):
        word = F.element_at(arr, (p / F.lit(32)).cast("int") + F.lit(1))
        bit = F.pmod(F.floor(word / F.pow(F.lit(2.0),
                                          F.pmod(p, F.lit(32)))).cast("bigint"),
                     F.lit(2))
        cond = cond & (bit == F.lit(1))
    return cond


def bloom_sizing(n_keys: int, bits_per_key: int = 16) -> int:
    """m_bits for a target load: 16 bits/key with k=4 gives ~2-3% FPR —
    the pruned-scan sweet spot (residual join cost ∝ FPR)."""
    m = max(1024, n_keys * bits_per_key)
    return (m + 31) // 32 * 32


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch: bounded-state distinct counting
# WITH set operations. HLL (Spark's approx_count_distinct) answers only
# |A|; KMV's sketch of A is the k smallest hash values of A's elements,
# and because min-k values of A ∪ B are computable from min-k of A and
# min-k of B, the sketch is a monoid that additionally supports union /
# intersection / Jaccard ESTIMATES between groups — the corpus-overlap
# questions (how much does source X share with source Y?) that exact
# pairwise joins can't answer at 100 TB.
#
# Estimators (Bar-Yossef et al. 2002; Beyer et al. SIGMOD'07):
#   distinct(A)    ≈ (k-1) * PRIME / h_(k)      [exact = m when m < k]
#   jaccard(A, B)  ≈ |minK(A∪B) ∩ A ∩ B| / |minK(A∪B)|
#   union(A, B)    ≈ distinct-estimate of the merged sketch
#   intersection   = jaccard * union
# Relative error ~ 1/sqrt(k); k=128 → ~9%.
#
# Everything is the portable affine arithmetic of functions/hashing, so
# the whole sketch — not just its contract — is oracle-verifiable
# bit-for-bit in DuckDB, unlike native HLL implementations whose
# register layouts are engine-private (approx_customers_by_nation is
# rows-only for exactly that reason; this sketch family isn't).

KMV_K = 128
KMV_SEED = 31
_KMV_A, _KMV_B = hash_family(1, KMV_SEED)[0]
# when a group holds more distinct values than this, pre-filter to the
# expected min-k band before the exact rank (see kmv_sketch)
KMV_PREFILTER_MIN = 50_000
_KMV_PREFILTER_FACTOR = 8


def kmv_value_hash(h0) -> "F.Column":
    """Affine-scramble an already-portable BIGINT hash in [0, PRIME)."""
    return affine(h0, _KMV_A, _KMV_B)


def kmv_value_hash_sql(expr: str) -> str:
    return affine_sql(expr, _KMV_A, _KMV_B)


def kmv_sketch(values: DataFrame, group_col: str, hash_col: str,
               k: int = KMV_K,
               prefilter_min: int = KMV_PREFILTER_MIN) -> DataFrame:
    """Per-group KMV sketch from a (group, portable-hash) relation
    (duplicates fine — the sketch is over the DISTINCT value set).
    Returns (group_col, _h, _rn) with the k smallest scrambled hashes.

    Scale shape: distinct → [count-gated pre-filter] → one window rank
    per group. The pre-filter is what survives 100 TB: for groups with
    cnt > prefilter_min distinct values, only hashes below
    ~FACTOR*k/cnt * PRIME enter the sort, so the per-group rank touches
    O(FACTOR*k) rows instead of the whole value set. Hashes are uniform,
    so the true k-th minimum exceeds that band with probability
    ≤ exp(-k*(FACTOR-1)²/(FACTOR+1)) (Chernoff) ≈ 1e-300 at k=128 —
    deterministically negligible; equality with the unfiltered rank is
    asserted in tests with the gate forced on.
    """
    from pyspark.sql import Window

    d = (values
         .select(F.col(group_col), kmv_value_hash(F.col(hash_col)).alias("_h"))
         .distinct())
    counts = d.groupBy(group_col).agg(F.count(F.lit(1)).alias("_cnt"))
    band = F.least(
        F.lit(PRIME).cast("bigint"),
        F.ceil(F.lit(float(_KMV_PREFILTER_FACTOR * k) * PRIME)
               / F.col("_cnt")).cast("bigint"))
    thr = F.when(F.col("_cnt") > prefilter_min, band).otherwise(F.lit(PRIME))
    gated = (d.join(F.broadcast(counts.select(group_col, thr.alias("_thr"))),
                    group_col)
             .filter(F.col("_h") < F.col("_thr"))
             .drop("_thr"))
    w = Window.partitionBy(group_col).orderBy(F.asc("_h"))
    return (gated.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k))


def kmv_merge(*parts: DataFrame, group_col: str, k: int = KMV_K) -> DataFrame:
    """Merge sketches of disjoint shards: k smallest of the union — KMV
    is a monoid (merge(sk(A), sk(B)) == sk(A ∪ B) exactly, tested), so
    shards sketch locally and only k-row partials cross the wire."""
    from pyspark.sql import Window

    u = parts[0].select(group_col, "_h")
    for p in parts[1:]:
        u = u.unionByName(p.select(group_col, "_h"))
    w = Window.partitionBy(group_col).orderBy(F.asc("_h"))
    return (u.distinct()
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k))


def kmv_stats(sk: DataFrame, group_col: str, k: int = KMV_K) -> DataFrame:
    """Distinct-count estimate per group from its sketch:
    (group_col, n_kept INT, kmv_est DOUBLE). m < k → the sketch holds the
    whole value set and the estimate is exact; else (k-1)*PRIME/h_(k)."""
    agg = sk.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("_m"), F.max("_h").alias("_hk"))
    est = (F.when(F.col("_m") < k, F.col("_m").cast("double"))
           .otherwise(F.lit(float((k - 1) * PRIME))
                      / F.col("_hk").cast("double")))
    return agg.select(F.col(group_col),
                      F.col("_m").cast("int").alias("n_kept"),
                      est.alias("kmv_est"))


def kmv_est_sql(m_expr: str, hk_expr: str, k: int = KMV_K) -> str:
    """DuckDB twin of the distinct-count estimator."""
    return (f"CASE WHEN {m_expr} < {k} THEN CAST({m_expr} AS DOUBLE) "
            f"ELSE CAST({float((k - 1) * PRIME)} AS DOUBLE) "
            f"/ CAST({hk_expr} AS DOUBLE) END")


def kmv_pair_overlap(sk: DataFrame, group_col: str,
                     k: int = KMV_K) -> DataFrame:
    """Pairwise set-operation estimates between every two groups, from
    their sketches alone: (group_a, group_b, union_est, jaccard_est,
    inter_est) for group_a < group_b.

    Works entirely on k-row-per-group relations (groups × k rows total) —
    the corpus-scale pass ended at kmv_sketch; this is sketch algebra:
    merge each pair's sketches, estimate the union's cardinality, and
    read Jaccard as the fraction of the merged min-k present in BOTH
    input sketches (Beyer et al. SIGMOD'07)."""
    from pyspark.sql import Window

    a = sk.select(F.col(group_col).alias("_ga"), F.col("_h"))
    b = sk.select(F.col(group_col).alias("_gb"), F.col("_h").alias("_hb"))
    pairs = (a.select("_ga").distinct()
             .crossJoin(b.select("_gb").distinct())
             .filter(F.col("_ga") < F.col("_gb")))
    ua = pairs.join(a, "_ga").select("_ga", "_gb", "_h")
    ub = (pairs.join(b.select(F.col("_gb"), F.col("_hb").alias("_h")), "_gb")
          .select("_ga", "_gb", "_h"))
    u = ua.unionByName(ub).distinct()
    w = Window.partitionBy("_ga", "_gb").orderBy(F.asc("_h"))
    uk = (u.withColumn("_rn", F.row_number().over(w))
          .filter(F.col("_rn") <= k))
    # membership marks via left joins on (group, hash)
    mark_a = (uk.join(a.select(F.col("_ga"), F.col("_h"),
                               F.lit(1).alias("_ina")),
                      ["_ga", "_h"], "left"))
    marked = (mark_a.join(b.select(F.col("_gb"),
                                   F.col("_hb").alias("_h"),
                                   F.lit(1).alias("_inb")),
                          ["_gb", "_h"], "left"))
    stat = marked.groupBy("_ga", "_gb").agg(
        F.count(F.lit(1)).alias("_ku"),
        F.max("_h").alias("_hku"),
        F.sum(F.when((F.col("_ina") == 1) & (F.col("_inb") == 1), 1)
              .otherwise(0)).alias("_nboth"))
    union_est = (F.when(F.col("_ku") < k, F.col("_ku").cast("double"))
                 .otherwise(F.lit(float((k - 1) * PRIME))
                            / F.col("_hku").cast("double")))
    jaccard_est = F.col("_nboth").cast("double") / F.col("_ku").cast("double")
    return (stat.select(
        F.col("_ga").alias("group_a"), F.col("_gb").alias("group_b"),
        union_est.alias("union_est"), jaccard_est.alias("jaccard_est"))
        .withColumn("inter_est", F.col("jaccard_est") * F.col("union_est")))


# ---------------------------------------------------------------------------
# HDR log-histogram quantile sketch: mergeable approximate quantiles with
# a BOUNDED RELATIVE ERROR, in pure integer arithmetic. Spark's
# percentile_approx (KLL-ish) is engine-private — its registered query is
# rows-only by necessity. This sketch is the hash-verifiable alternative:
# a value v ≥ 1 lands in bucket (e, sub) where e is its bit length
# (octave) and sub one of M linear sub-buckets within the octave — the
# HdrHistogram layout. Bucket counts are a plain groupBy (map-side
# combinable, mergeable by addition across shards/streams); a quantile
# estimate is the upper edge of the first bucket whose cumulative count
# reaches ceil(q*N), which OVERESTIMATES the true quantile by at most a
# factor (1 + 1/M) — relative error ≤ 1/M whatever the value range.
#
# The exponent comes from the binary-string length (integer-exact on
# both engines: Spark conv(v,10,2) / DuckDB bin(v)), never floating
# log2, so bucket assignment is bit-identical cross-engine.

HDR_SUBBUCKETS = 32  # relative error <= 1/32 ~ 3.1%


def hdr_bucket(v, m: int = HDR_SUBBUCKETS):
    """(bucket_id, upper_edge) expressions for a positive BIGINT column.

    e   = bit_length(v)            (octave; p = 2^(e-1) <= v < 2^e)
    sub = min(m-1, floor(v*m/p) - m)   (linear position inside the octave)
    id  = (e-1)*m + sub
    ub  = p * (1 + (sub+1)/m)      (exclusive upper edge, DOUBLE)

    v*m must stay under 2^53 for the float-division floor to be
    engine-portable — fine for any realistic measure in cents/chars/ms.
    """
    e = F.length(F.conv(v.cast("string"), 10, 2))
    p = F.pow(F.lit(2.0), (e - F.lit(1)).cast("double"))
    sub = F.least(F.lit(m - 1),
                  (F.floor(v.cast("double") * m / p) - F.lit(m)).cast("int"))
    bucket_id = ((e - F.lit(1)) * m + sub).cast("int")
    ub = p * (F.lit(1.0) + (sub + F.lit(1)).cast("double") / F.lit(float(m)))
    return bucket_id, ub


def hdr_bucket_sql(v_expr: str, m: int = HDR_SUBBUCKETS) -> tuple[str, str]:
    """DuckDB twins of (bucket_id, upper_edge)."""
    e = f"length(bin(({v_expr})::BIGINT))"
    p = f"power(2.0, CAST({e} - 1 AS DOUBLE))"
    sub = (f"LEAST({m - 1}, CAST(FLOOR(CAST({v_expr} AS DOUBLE) * {m} / {p})"
           f" - {m} AS INTEGER))")
    bucket_id = f"CAST(({e} - 1) * {m} + {sub} AS INTEGER)"
    ub = f"{p} * (1.0 + CAST({sub} + 1 AS DOUBLE) / CAST({m} AS DOUBLE))"
    return bucket_id, ub


def hdr_histogram(values: DataFrame, group_col: str, value_col: str,
                  m: int = HDR_SUBBUCKETS) -> DataFrame:
    """Per-group histogram: (group, bucket, ub, cnt). The sketch itself —
    O(groups x 64*m) rows whatever N; merge shards by summing cnt."""
    bucket_id, ub = hdr_bucket(F.col(value_col), m)
    return (values
            .select(F.col(group_col), bucket_id.alias("bucket"),
                    ub.alias("ub"))
            .groupBy(group_col, "bucket")
            .agg(F.min("ub").alias("ub"), F.count(F.lit(1)).alias("cnt")))


def hdr_quantiles(hist: DataFrame, group_col: str,
                  qs: list[float]) -> DataFrame:
    """Quantile estimates from a histogram: for each q, the upper edge of
    the first bucket whose cumulative count reaches ceil(q*N). Works on
    the sketch relation only (tiny); output (group, q, est)."""
    from fractions import Fraction

    from pyspark.sql import Window

    w_cum = (Window.partitionBy(group_col).orderBy("bucket")
             .rowsBetween(Window.unboundedPreceding, 0))
    w_all = Window.partitionBy(group_col)
    cum = (hist
           .withColumn("_cum", F.sum("cnt").over(w_cum))
           .withColumn("_n", F.sum("cnt").over(w_all)))
    # EXACT integer target rank: ceil(q*N) in doubles overshoots by one
    # rank whenever q*N is an integer the float product exceeds by an
    # ulp (0.95 * 20 = 19.000000000000004 -> rank 20; r7 review). Each
    # q becomes an exact fraction and the rank is
    # (qn*N + qd - 1) div qd — pure int64.
    fracs = [Fraction(str(q)) for q in qs]
    q_rel = F.array(*[
        F.struct(F.lit(float(q)).alias("q"),
                 F.lit(fr.numerator).alias("qn"),
                 F.lit(fr.denominator).alias("qd"))
        for q, fr in zip(qs, fracs)])
    hit = (cum.withColumn("_qs", F.explode(q_rel))
           .select("*", F.col("_qs.q").alias("q"),
                   F.col("_qs.qn").alias("_qn"),
                   F.col("_qs.qd").alias("_qd"))
           .filter(F.col("_cum") >=
                   F.expr("(_qn * _n + _qd - 1) div _qd")))
    best = (hit.groupBy(group_col, "q")
            .agg(F.min_by(F.col("ub"), F.col("bucket")).alias("est")))
    return best.select(group_col, "q", "est")


def cms_join_cardinality(sk_a: DataFrame, sk_b: DataFrame,
                         depth: int = CMS_DEPTH) -> DataFrame:
    """Equi-join SIZE estimate from two count-min sketches alone:
    |A ⋈ B| on key k is Σ_k fA(k)·fB(k), and the sketch estimate is
    min over hash rows j of Σ_buckets cntA[j,b]·cntB[j,b] (an AMS-style
    inner product; always ≥ the true size, collisions only add). This is
    the planner-statistics use of the sketch: estimating a join's output
    size from two KB summaries without touching either relation — at
    100 TB the inputs never meet until the plan is chosen.

    Returns a single row (join_est BIGINT). Build both sketches with the
    SAME width/depth/seed or the row-wise product is meaningless.

    The min ranges over ALL depth rows: a row whose occupied buckets
    are disjoint has dot product 0 and must participate (the r7 review
    found the inner-join form excluding such rows — a fully disjoint
    pair returned NULL instead of 0).
    """
    a = sk_a.select("j", "bucket", F.col("cnt").alias("_ca"))
    b = sk_b.select("j", "bucket", F.col("cnt").alias("_cb"))
    prod = (a.join(b, ["j", "bucket"])
            .groupBy("j")
            .agg(F.sum(F.col("_ca") * F.col("_cb")).alias("_dot")))
    rows = sk_a.sparkSession.range(depth).select(
        F.col("id").cast("int").alias("j"))
    per_row = (rows.join(prod, "j", "left")
               .select(F.coalesce(F.col("_dot"), F.lit(0)).alias("_dot")))
    return per_row.agg(F.min("_dot").cast("bigint").alias("join_est"))
