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
    affine,
    affine_sql,
    hash_family,
    poly_hash,
    poly_hash_sql,
)

CMS_WIDTH = 1024
CMS_DEPTH = 4
CMS_SEED = 99


def cms_sketch(terms: DataFrame, term_col: str = "term",
               width: int = CMS_WIDTH, depth: int = CMS_DEPTH,
               seed: int = CMS_SEED) -> DataFrame:
    """Build the sketch from a term-occurrence relation: one row per
    (hash row j, bucket) with its counter. depth*width rows total.

    Occurrences are pre-aggregated per distinct term BEFORE hashing, so the
    expensive char-fold hash runs once per VOCAB entry, not once per
    occurrence — at 100 TB the occurrence count dwarfs the vocabulary and
    the pre-aggregation is a map-side-combinable count."""
    counted = (terms.groupBy(term_col)
               .agg(F.count(F.lit(1)).alias("_w")))
    hashed = counted.select(poly_hash(F.col(term_col)).alias("_h0"), "_w")
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
                 seed: int = CMS_SEED) -> DataFrame:
    """Attach `n_est` (the count-min estimate) to every probe row: compute
    the probe term's depth buckets, look each up in the broadcast sketch,
    take the min. Missing buckets count 0 (term never hashed there).

    Probe rows are tagged with a unique row id before the explode and the
    regroup keys on that id, so duplicate probe rows each keep their own
    output row and non-groupable probe column types (map, ...) are fine."""
    h0 = poly_hash(F.col(term_col))
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
    pos = (keys.select(F.explode(F.array(
        *_bloom_positions(F.col(key_col), m_bits, k, seed))).alias("p"))
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
