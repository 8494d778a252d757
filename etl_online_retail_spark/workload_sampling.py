"""Sampling + sketch workload: deterministic corpus sampling and the
count-min frequency sketch as first-class registered queries.

Everything here is reproducible-by-construction (portable affine-hash
arithmetic, functions/hashing) so each query carries a full DuckDB oracle
twin built from the SAME Python constants — the sketch is verified
bit-for-bit, not just "approximately right".

Reference parity note: the reference (minkminkk/etl-online-retail) has no
sampling/sketch surface; these are the training-data-pipeline extensions
(SURVEY.md M6 family) a 100 TB corpus needs: reproducible downsampling for
ablations, and sublinear-memory heavy-hitter detection over unbounded
vocabularies.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_online_retail_spark.functions.hashing import (
    affine_sql,
    hash_family,
    poly_hash_sql,
)
from etl_online_retail_spark.functions.text import normalize, normalize_sql, tokens
from etl_online_retail_spark.operators import sampling, sketches
from etl_online_retail_spark.workload import _t, register

# shared construction parameters (Spark defaults == these)
STRAT_FRACTIONS = {"en": 0.6, "de": 0.25}
STRAT_DEFAULT = 0.1
UNIFORM_K = 100
HH_MIN = 100  # heavy-hitter cutoff on the CMS estimate


# ---------------------------------------------------------------------------
# deterministic stratified sampling: per-stratum hash-bucket cutoffs.
# Pure filter — no shuffle, predicate pushes to the scan; the SAME rows
# survive on every run, engine, and cluster layout (nested for growing
# fractions — the ablation/curriculum rerun property).

@register(
    "stratified_docs_sample",
    f"SELECT doc_id, lang, source, n_chars FROM documents "
    f"WHERE ({sampling.bucket_sql('doc_id')}) < "
    f"({sampling.stratified_sample_cut_sql('lang', STRAT_FRACTIONS, STRAT_DEFAULT)})",
    "M6-sampling-stratified",
)
def q_stratified_docs_sample(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return sampling.stratified_sample(
        docs.select("doc_id", "lang", "source", "n_chars"),
        "lang", "doc_id", STRAT_FRACTIONS, STRAT_DEFAULT)


# uniform sample without replacement of exactly k rows: the k smallest
# affine-hash values — one global top-k reduce, no rand().

@register(
    "uniform_docs_sample",
    f"SELECT doc_id, lang, n_chars FROM documents "
    f"ORDER BY ({sampling.bucket_sql('doc_id')}) ASC, doc_id ASC "
    f"LIMIT {UNIFORM_K}",
    "M6-sampling-uniform-topk",
)
def q_uniform_docs_sample(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return sampling.uniform_sample_topk(docs, "doc_id", UNIFORM_K)


# ---------------------------------------------------------------------------
# count-min sketch heavy hitters: build the depth x width sketch over all
# term occurrences, probe every distinct term, keep terms whose ESTIMATE
# clears the cutoff. n_exact rides along so the overestimate property
# (n_est >= n_exact, within 2N/width w.h.p.) is visible in the output.
# The oracle rebuilds the identical sketch in SQL from the same constants.

_W, _D, _SEED = sketches.CMS_WIDTH, sketches.CMS_DEPTH, sketches.CMS_SEED


def _cms_oracle() -> str:
    bucket_rows = " UNION ALL ".join(
        f"SELECT term, c, {j} AS j, ({affine_sql('h0', a, b)}) % {_W} AS bucket "
        f"FROM hashed"
        for j, (a, b) in enumerate(hash_family(_D, _SEED)))
    return f"""
WITH terms AS (
  SELECT unnest(regexp_split_to_array({normalize_sql('text')}, '\\s+')) AS term
  FROM documents),
counted AS (
  SELECT term, COUNT(*) AS c FROM terms WHERE term <> '' GROUP BY term),
hashed AS (
  SELECT term, c, {poly_hash_sql('term')} AS h0 FROM counted),
pb AS ({bucket_rows}),
sketch AS (
  SELECT j, bucket, CAST(SUM(c) AS BIGINT) AS cnt FROM pb GROUP BY j, bucket),
est AS (
  SELECT pb.term, MIN(pb.c) AS n_exact,
         CAST(MIN(COALESCE(s.cnt, 0)) AS BIGINT) AS n_est
  FROM pb LEFT JOIN sketch s ON pb.j = s.j AND pb.bucket = s.bucket
  GROUP BY pb.term)
SELECT term, n_exact, n_est FROM est WHERE n_est >= {HH_MIN}
"""


@register("cms_heavy_hitters", _cms_oracle(), "M6-sketch-countmin")
def q_cms_heavy_hitters(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    # one cached occurrence relation feeds both the sketch build and the
    # probe side (at 100 TB: a staged parquet of per-shard term counts)
    terms = (docs.select(F.explode(tokens(normalize("text"))).alias("term"))
             .filter(F.col("term") != "")
             .cache())
    sketch = sketches.cms_sketch(terms)
    probe = terms.groupBy("term").agg(F.count(F.lit(1)).alias("n_exact"))
    est = sketches.cms_estimate(probe, sketch)
    return (est.filter(F.col("n_est") >= HH_MIN)
            .select("term", "n_exact", "n_est"))
