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
    normalize,
    punct_ratio,
    stopword_ratio,
    token_count,
)
from etl_online_retail_spark.operators.dedup import (
    _shingled,
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
    pr = punct_ratio(text_col)
    if norm_col is not None:
        sr = stopword_ratio(norm_col, "en", normalized=True)
    else:
        sr = stopword_ratio(text_col, "en")
    quality = (F.lit(0.5) * sr
               + F.lit(0.3) * F.least(nt / F.lit(100.0), F.lit(1.0))
               + F.lit(0.2) * (F.lit(1.0) - pr))
    return docs.select("doc_id", nt.alias("n_tokens"), quality.alias("quality"))


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
