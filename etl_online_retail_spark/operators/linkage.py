"""Fuzzy record linkage: blocked and q-gram-filtered Levenshtein joins.

The naive blocked join (every in-block pair through the distance function)
is per-block quadratic — measured ~factor^2 under replication
(PERFORMANCE.md). `qgram_fuzzy_pairs` is the EXACT scale path: a
candidate-generation join on shared character q-grams with a count filter,
then distance verification on the survivors only.

Count-filter soundness (distinct-gram form): one edit operation touches at
most q gram positions, so d edits destroy at most d*q occurrences — a
distinct gram vanishes only if all its occurrences die, hence two strings
within distance d share >= max(|D(a)|, |D(b)|) - d*q DISTINCT q-grams
(D = distinct gram set). Pairs below the bound cannot be within distance d
and are never scored. Strings with |D| <= d*q can't be pruned (the bound
is vacuous) and take the naive in-block path — exactness holds for every
input, not just well-behaved ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_online_retail_spark.functions.text import char_ngrams


def blocked_fuzzy_pairs(df: DataFrame, key_col: str, name_col: str,
                        block_col: str, max_dist: int = 2) -> DataFrame:
    """All in-block pairs within edit distance: (key_a, key_b, name_a,
    name_b, edit_dist). Bounded Levenshtein (early exit) + length-bound
    prune; quadratic in block size — see qgram_fuzzy_pairs for scale."""
    a = df.select(F.col(key_col).alias("key_a"),
                  F.col(name_col).alias("name_a"),
                  F.col(block_col).alias("_blk"))
    b = df.select(F.col(key_col).alias("key_b"),
                  F.col(name_col).alias("name_b"),
                  F.col(block_col).alias("_blk"))
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"), max_dist)
    len_ok = F.abs(F.length("name_a") - F.length("name_b")) <= max_dist
    return (a.join(b, "_blk")
            .filter((F.col("key_a") < F.col("key_b"))
                    & (F.col("name_a") != F.col("name_b"))
                    & len_ok & (dist >= 0))
            .select("key_a", "key_b", "name_a", "name_b",
                    dist.cast("int").alias("edit_dist")))


def qgram_fuzzy_pairs(df: DataFrame, key_col: str, name_col: str,
                      block_col: str, max_dist: int = 2,
                      q: int = 2) -> DataFrame:
    """Exact prefix-filtered variant of blocked_fuzzy_pairs (same output).

    PPJoin-style: strings within distance d share >= max(|D(a)|,|D(b)|) -
    d*q distinct q-grams, so under ANY fixed global gram ordering their
    first d*q+1 grams must intersect (pigeonhole). The ordering is chosen
    by ascending global frequency (rarest first, gram tiebreak), making
    the candidate join's fan-out sum-of-RARE-gram-frequencies^2 — tiny —
    instead of block^2 or common-gram^2. Candidates are then distance-
    verified; short/repeat-heavy names (|D| <= d*q, vacuous bound) fall
    back to the naive in-block join, so the union is exhaustive for every
    input.
    """
    from pyspark.sql import Window

    base = (df.select(F.col(key_col).alias("_k"),
                      F.col(name_col).alias("_n"),
                      F.col(block_col).alias("_blk"),
                      char_ngrams(F.col(name_col), q).alias("_g"))
            .withColumn("_gs", F.size("_g"))
            .cache())
    bound = max_dist * q
    long_side = base.filter(F.col("_gs") > bound)
    short_side = base.filter(F.col("_gs") <= bound).drop("_g", "_gs")

    grams = long_side.select("_k", "_n", "_blk",
                             F.explode("_g").alias("_gram"))
    freq = grams.groupBy("_gram").agg(F.count(F.lit(1)).alias("_f"))
    w = Window.partitionBy("_k").orderBy(F.asc("_f"), F.asc("_gram"))
    prefix = (grams.join(F.broadcast(freq), "_gram")
              .withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") <= bound + 1)
              .select("_k", "_n", "_blk", "_gram"))
    pa = prefix.select(F.col("_k").alias("key_a"),
                       F.col("_n").alias("name_a"), "_blk", "_gram")
    pb = prefix.select(F.col("_k").alias("key_b"),
                       F.col("_n").alias("name_b"), "_blk", "_gram")
    cands = (pa.join(pb, ["_blk", "_gram"])
             .filter(F.col("key_a") < F.col("key_b"))
             .select("key_a", "key_b", "name_a", "name_b")
             .distinct())
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"), max_dist)
    verified = (cands
                .filter((F.col("name_a") != F.col("name_b"))
                        & (F.abs(F.length("name_a") - F.length("name_b"))
                           <= max_dist)
                        & (dist >= 0))
                .select("key_a", "key_b", "name_a", "name_b",
                        dist.cast("int").alias("edit_dist")))

    # unprunable names: naive join of short x (short + long) within block
    all_side = base.select(F.col("_k").alias("key_b"),
                           F.col("_n").alias("name_b"), "_blk")
    sa = short_side.select(F.col("_k").alias("key_a"),
                           F.col("_n").alias("name_a"), "_blk")
    dist2 = F.levenshtein(F.col("name_a"), F.col("name_b"), max_dist)
    short_pairs_l = (sa.join(all_side, "_blk")
                     .filter(F.col("key_a") < F.col("key_b")))
    sb = short_side.select(F.col("_k").alias("key_b"),
                           F.col("_n").alias("name_b"), "_blk")
    la = long_side.select(F.col("_k").alias("key_a"),
                          F.col("_n").alias("name_a"), "_blk")
    short_pairs_r = (la.join(sb, "_blk")
                     .filter(F.col("key_a") < F.col("key_b")))
    fallback = (short_pairs_l.unionByName(short_pairs_r)
                .filter((F.col("name_a") != F.col("name_b"))
                        & (F.abs(F.length("name_a") - F.length("name_b"))
                           <= max_dist)
                        & (dist2 >= 0))
                .select("key_a", "key_b", "name_a", "name_b",
                        dist2.cast("int").alias("edit_dist")))
    return verified.unionByName(fallback)
