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
from etl_online_retail_spark.functions.text import (
    normalize,
    normalize_sql,
    token_count,
    token_count_sql,
    tokens,
    word_shingle_hashes,
    word_shingle_hashes_sql,
)
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
    f"ORDER BY ({sampling.hval_sql('doc_id')}) ASC, doc_id ASC "
    f"LIMIT {UNIFORM_K}",
    "M6-sampling-uniform-topk",
)
def q_uniform_docs_sample(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return sampling.uniform_sample_topk(docs, "doc_id", UNIFORM_K)


# exact-k per stratum: per-group reservoir semantics via one window pass
# (integer-only ordering -> engine-portable selection)

STRAT_K = 20


@register(
    "stratified_topk_docs",
    f"SELECT doc_id, lang, source FROM ("
    f"  SELECT doc_id, lang, source, ROW_NUMBER() OVER ("
    f"    PARTITION BY lang "
    f"    ORDER BY ({sampling.hval_sql('doc_id')}) ASC, doc_id ASC) AS rn"
    f"  FROM documents) WHERE rn <= {STRAT_K}",
    "M6-sampling-stratified-topk",
)
def q_stratified_topk_docs(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return sampling.stratified_topk_sample(docs, "lang", "doc_id", STRAT_K)


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


# ---------------------------------------------------------------------------
# CMS join-cardinality estimation: the PLANNER-STATISTICS use of the
# sketch — |orders ⋈ lineitem| on orderkey estimated from two KB
# summaries as the min-over-rows inner product of their counters
# (AMS-style; always >= truth, collisions only add). The exact size
# rides along so the overestimate property is visible; the oracle
# rebuilds both sketches and the dot product bit-for-bit.


def _cms_join_oracle() -> str:
    from etl_online_retail_spark.functions.hashing import PRIME

    def side(table: str, key: str, name: str) -> str:
        bucket_rows = " UNION ALL ".join(
            f"SELECT c, {j} AS j, ({affine_sql('h0', a, b)}) % {_W} AS bucket "
            f"FROM h{name}"
            for j, (a, b) in enumerate(hash_family(_D, _SEED)))
        return (
            f"k{name} AS (SELECT {key} AS term, COUNT(*) AS c "
            f"FROM {table} GROUP BY 1), "
            f"h{name} AS (SELECT term, c, "
            f"((term::BIGINT % {PRIME} + {PRIME}) % {PRIME}) AS h0 "
            f"FROM k{name}), "
            f"p{name} AS ({bucket_rows}), "
            f"s{name} AS (SELECT j, bucket, CAST(SUM(c) AS BIGINT) AS cnt "
            f"FROM p{name} GROUP BY j, bucket)")

    return f"""
WITH {side('orders', 'o_orderkey', 'a')},
{side('lineitem', 'l_orderkey', 'b')},
rows AS (SELECT unnest(range(0, {_D})) AS j),
dot AS (SELECT r.j, COALESCE(SUM(sa.cnt * sb.cnt), 0) AS d
        FROM rows r
        LEFT JOIN sa ON sa.j = r.j
        LEFT JOIN sb ON sb.j = r.j AND sb.bucket = sa.bucket
        GROUP BY r.j),
ex AS (SELECT CAST(SUM(ka.c * kb.c) AS BIGINT) AS join_exact
       FROM ka JOIN kb ON ka.term = kb.term)
SELECT CAST(MIN(d) AS BIGINT) AS join_est, ex.join_exact
FROM dot, ex GROUP BY ex.join_exact"""


@register("cms_join_size", _cms_join_oracle(), "M6-sketch-join-cardinality")
def q_cms_join_size(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    sk_a = sketches.cms_sketch(
        orders.select(F.col("o_orderkey").alias("term")),
        numeric_keys=True)
    sk_b = sketches.cms_sketch(
        li.select(F.col("l_orderkey").alias("term")),
        numeric_keys=True)
    est = sketches.cms_join_cardinality(sk_a, sk_b)
    ka = orders.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("_ca"))
    kb = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("_cb"))
    exact = (ka.join(kb, "k")
             .agg(F.sum(F.col("_ca") * F.col("_cb")).cast("bigint")
                  .alias("join_exact")))
    return est.crossJoin(F.broadcast(exact))


# ---------------------------------------------------------------------------
# Bloom-filter join pruning: the dim subset's KEY SET compresses to a KB
# bit array that prunes the fact scan as a pure row expression; only
# survivors (matches + ~2% false positives) reach the exact semi-join, so
# the result is EXACT and the oracle is the plain semi-join SQL. At 100 TB
# this is the structure that saves the fact-side shuffle when the dim
# slice is broadcast-hostile as rows but tiny as bits.

@register(
    "bloom_pruned_orders",
    "SELECT o_orderpriority, COUNT(*) AS n_orders, "
    "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price "
    "FROM orders WHERE o_custkey IN "
    "(SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE') "
    "GROUP BY o_orderpriority",
    "M6-sketch-bloom-join",
)
def q_bloom_pruned_orders(spark, sf_dir):
    cust = (_t(spark, sf_dir, "customer")
            .filter(F.col("c_mktsegment") == "AUTOMOBILE")
            .select("c_custkey"))
    orders = _t(spark, sf_dir, "orders")
    words = sketches.bloom_build(
        cust, "c_custkey", sketches.bloom_sizing(cust.count()))
    pruned = orders.filter(
        sketches.bloom_might_contain(F.col("o_custkey"), words))
    exact = pruned.join(cust, pruned.o_custkey == cust.c_custkey,
                        "left_semi")
    return (exact.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("double").alias("total_price")))


# epoch-stable deterministic shuffle: the reproducible data-order
# contract of a resumable pretraining run. One shuffle on the shard key,
# per-shard rank — no global ordering ever materialized.

SHUFFLE_EPOCH = 3
SHUFFLE_SHARDS = 8


# ---------------------------------------------------------------------------
# HDR log-histogram quantile sketch: mergeable approximate quantiles with
# bounded RELATIVE error in pure integer bucket arithmetic (bit-length
# octaves x linear sub-buckets). Unlike percentile_approx (engine-private
# KLL, rows-only), this sketch is rebuilt bit-for-bit by the oracle —
# a hash-verified approximate-quantile path. Value: order price in cents
# (exact via the decimal cast convention), grouped by priority.

_HDR_QS = (0.5, 0.9, 0.99)
_HDR_V = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"


def _hdr_oracle() -> str:
    from fractions import Fraction

    bucket_id, ub = sketches.hdr_bucket_sql("v")
    fracs = [Fraction(str(q)) for q in _HDR_QS]
    q_list = ", ".join(f"CAST({q} AS DOUBLE)" for q in _HDR_QS)
    qn_list = ", ".join(str(fr.numerator) for fr in fracs)
    qd_list = ", ".join(str(fr.denominator) for fr in fracs)
    # exact integer target rank ceil(q*N) = (qn*N + qd - 1) // qd —
    # CEIL(q*n) in doubles overshoots one rank when q*n is an integer
    # the float product exceeds by an ulp (matches the Spark side; r7)
    return f"""
WITH v AS (SELECT o_orderpriority, {_HDR_V} AS v FROM orders
           WHERE {_HDR_V} >= 1),
b AS (SELECT o_orderpriority, {bucket_id} AS bucket, {ub} AS ub FROM v),
hist AS (SELECT o_orderpriority, bucket, MIN(ub) AS ub, COUNT(*) AS cnt
         FROM b GROUP BY 1, 2),
cum AS (SELECT o_orderpriority, bucket, ub,
        CAST(SUM(cnt) OVER (PARTITION BY o_orderpriority
                            ORDER BY bucket) AS BIGINT) AS cum,
        CAST(SUM(cnt) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n
        FROM hist),
qq AS (SELECT unnest([{q_list}]) AS q, unnest([{qn_list}]) AS qn,
              unnest([{qd_list}]) AS qd),
hit AS (SELECT c.o_orderpriority, q.q, c.bucket, c.ub
        FROM cum c JOIN qq q
          ON c.cum >= (q.qn * c.n + q.qd - 1) // q.qd),
sel AS (SELECT o_orderpriority, q, MIN(bucket) AS b FROM hit GROUP BY 1, 2)
SELECT s.o_orderpriority, s.q, h.ub AS est
FROM sel s JOIN hist h
  ON h.o_orderpriority = s.o_orderpriority AND h.bucket = s.b"""


@register("hdr_price_quantiles", _hdr_oracle(), "M6-sketch-hdr-quantiles")
def q_hdr_price_quantiles(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    vals = (orders.select("o_orderpriority", cents.alias("v"))
            .filter(F.col("v") >= 1))
    hist = sketches.hdr_histogram(vals, "o_orderpriority", "v")
    return sketches.hdr_quantiles(hist, "o_orderpriority", list(_HDR_QS))


# ---------------------------------------------------------------------------
# Token-budget training-mix builder: fill per-source token quotas by
# walking documents in deterministic hash order and keeping a document
# iff the tokens consumed before it are under its source's budget. The
# Spark side computes the walk as a two-phase distributed scan
# (ordered_prefix_sum — range-sharded by the hash bucket, no
# single-reducer sort per source); the oracle states the SAME semantics
# as one naive window, so the scan decomposition itself is verified.

TOKEN_BUDGETS = {"src0": 2000, "src1": 900}
TOKEN_BUDGET_DEFAULT = 400


@register(
    "token_budget_mix",
    f"""WITH t AS (
  SELECT doc_id, source, CAST({token_count_sql('text')} AS BIGINT) AS n_tokens,
         {sampling.hval_sql('doc_id')} AS b
  FROM documents),
c AS (
  SELECT doc_id, source, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           PARTITION BY source ORDER BY b, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS cum_before
  FROM t)
SELECT doc_id, source, n_tokens, cum_before
FROM c
WHERE cum_before < CASE WHEN source = 'src0' THEN {TOKEN_BUDGETS['src0']}
                        WHEN source = 'src1' THEN {TOKEN_BUDGETS['src1']}
                        ELSE {TOKEN_BUDGET_DEFAULT} END""",
    "M6-sampling-token-budget",
)
def q_token_budget_mix(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", "source",
        token_count("text").cast("bigint").alias("n_tokens"))
    mix = sampling.token_budget_mix(
        base, "source", "doc_id", "n_tokens",
        TOKEN_BUDGETS, TOKEN_BUDGET_DEFAULT)
    return mix.select("doc_id", "source", "n_tokens", "cum_before")


# ---------------------------------------------------------------------------
# weighted sampling without rand(): systematic resampling over the hash
# order — keep every row whose integer-weight span crosses a multiple of
# STEP. Each doc survives with probability ~ n_tokens/STEP (the
# length-proportional sample a token-balanced eval slice wants), sample
# size ~ total_tokens/STEP, same rows on every run/engine. The A-ES
# exponential-key scheme needs log() — last-ulp portability risk; this
# stays in exact integer arithmetic on the distributed prefix-sum.

WEIGHTED_STEP = 500


def _wdiv(x: str) -> str:
    return (f"CAST((({x}) - (({x}) % {WEIGHTED_STEP})) "
            f"/ {WEIGHTED_STEP} AS BIGINT)")


@register(
    "weighted_docs_sample",
    f"""WITH t AS (
  SELECT doc_id, CAST({token_count_sql('text')} AS BIGINT) AS n_tokens,
         {sampling.hval_sql('doc_id')} AS b
  FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY b, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS cum_before
  FROM t)
SELECT doc_id, n_tokens, cum_before FROM c
WHERE {_wdiv('cum_before + n_tokens')} > {_wdiv('cum_before')}""",
    "M6-sampling-weighted-systematic",
)
def q_weighted_docs_sample(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", token_count("text").cast("bigint").alias("n_tokens"))
    picked = sampling.systematic_weighted_sample(
        base, "doc_id", "n_tokens", WEIGHTED_STEP)
    return picked.select("doc_id", "n_tokens", "cum_before")


# ---------------------------------------------------------------------------
# KMV distinct sketch: bounded-state distinct counting with SET OPERATIONS
# (union / intersection / Jaccard between sources) — the corpus-overlap
# questions HLL can't answer. Sketch values are portable affine hashes,
# so unlike native HLL (approx_customers_by_nation, rows-only by
# necessity) the whole sketch is rebuilt bit-for-bit by the DuckDB twin.
# Value space: word-bigram shingle hashes per source (the corpus's tiny
# unigram vocabulary would saturate every source to Jaccard 1).

_KMV_K = sketches.KMV_K


def _kmv_base() -> str:
    return (
        f"sh AS (SELECT source, unnest({word_shingle_hashes_sql('text', 2)}) "
        f"AS h0 FROM documents), "
        f"d AS (SELECT DISTINCT source, {sketches.kmv_value_hash_sql('h0')} "
        f"AS h FROM sh), "
        f"r AS (SELECT source, h, ROW_NUMBER() OVER "
        f"(PARTITION BY source ORDER BY h) AS rn FROM d), "
        f"sk AS (SELECT source, h FROM r WHERE rn <= {_KMV_K})")


@register(
    "kmv_source_distinct",
    f"""WITH {_kmv_base()},
st AS (SELECT source, COUNT(*) AS m, MAX(h) AS hk FROM sk GROUP BY source),
ex AS (SELECT source, COUNT(DISTINCT h0) AS n_exact FROM sh GROUP BY source)
SELECT ex.source, ex.n_exact, CAST(st.m AS INTEGER) AS n_kept,
       {sketches.kmv_est_sql('st.m', 'st.hk')} AS kmv_est
FROM ex JOIN st ON ex.source = st.source""",
    "M6-sketch-kmv-distinct",
)
def q_kmv_source_distinct(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    rel = (docs.select("source",
                       F.explode(word_shingle_hashes("text", 2)).alias("h0"))
           .cache())  # feeds both the sketch and the exact side
    sk = sketches.kmv_sketch(rel, "source", "h0")
    stats = sketches.kmv_stats(sk, "source")
    exact = rel.groupBy("source").agg(
        F.countDistinct("h0").alias("n_exact"))
    return (exact.join(stats, "source")
            .select("source", "n_exact", "n_kept", "kmv_est"))


@register(
    "kmv_source_overlap",
    f"""WITH {_kmv_base()},
gs AS (SELECT DISTINCT source FROM sk),
pairs AS (SELECT a.source AS sa, b.source AS sb
          FROM gs a JOIN gs b ON a.source < b.source),
u0 AS (SELECT p.sa, p.sb, s.h FROM pairs p JOIN sk s ON s.source = p.sa
       UNION
       SELECT p.sa, p.sb, s.h FROM pairs p JOIN sk s ON s.source = p.sb),
ur AS (SELECT sa, sb, h, ROW_NUMBER() OVER
       (PARTITION BY sa, sb ORDER BY h) AS rn FROM u0),
uk AS (SELECT sa, sb, h FROM ur WHERE rn <= {_KMV_K}),
mk AS (SELECT u.sa, u.sb, u.h,
              CASE WHEN a.h IS NOT NULL THEN 1 ELSE 0 END AS ina,
              CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END AS inb
       FROM uk u
       LEFT JOIN sk a ON a.source = u.sa AND a.h = u.h
       LEFT JOIN sk b ON b.source = u.sb AND b.h = u.h),
st AS (SELECT sa, sb, COUNT(*) AS ku, MAX(h) AS hku,
              SUM(CASE WHEN ina = 1 AND inb = 1 THEN 1 ELSE 0 END) AS nboth
       FROM mk GROUP BY sa, sb)
SELECT sa AS source_a, sb AS source_b,
       {sketches.kmv_est_sql('ku', 'hku')} AS union_est,
       CAST(nboth AS DOUBLE) / CAST(ku AS DOUBLE) AS jaccard_est,
       (CAST(nboth AS DOUBLE) / CAST(ku AS DOUBLE))
         * ({sketches.kmv_est_sql('ku', 'hku')}) AS inter_est
FROM st""",
    "M6-sketch-kmv-setops",
)
def q_kmv_source_overlap(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    rel = docs.select("source",
                      F.explode(word_shingle_hashes("text", 2)).alias("h0"))
    # the sketch feeds three self-joins in the pair algebra — cache it
    # (PERFORMANCE.md rule 7); it is groups x k rows, i.e. tiny
    sk = sketches.kmv_sketch(rel, "source", "h0").cache()
    out = sketches.kmv_pair_overlap(sk, "source")
    return out.select(F.col("group_a").alias("source_a"),
                      F.col("group_b").alias("source_b"),
                      "union_est", "jaccard_est", "inter_est")


@register(
    "epoch_shuffle_layout",
    f"SELECT doc_id, "
    f"{sampling.epoch_shuffle_sql('doc_id', SHUFFLE_EPOCH, SHUFFLE_SHARDS)} "
    f"FROM documents",
    "M6-sampling-epoch-shuffle",
)
def q_epoch_shuffle_layout(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return sampling.epoch_shuffle(docs, "doc_id", SHUFFLE_EPOCH,
                                  SHUFFLE_SHARDS)


# ---------------------------------------------------------------------------
# temperature-based data mixing (the XLM-R / mT5 multilingual recipe):
# p_source ∝ n^alpha flattens the natural source distribution. alpha=0.5
# keeps the weight function at sqrt — IEEE-CORRECTLY-ROUNDED on every
# engine (pow is not) — and the weight denominator folds under the
# decimal-contribution discipline, so the whole rate computation is
# hash-exact. Rates realize as integer bucket cutoffs (the sampler
# discipline), making the KEPT SET itself cross-engine identical.

MIX_BUDGET_DOCS = 200


def _temperature_oracle() -> str:
    res = sampling.SAMPLE_RESOLUTION
    return f"""
WITH stats AS (
  SELECT source, COUNT(*) AS n_total,
         CAST(ROUND(sqrt(CAST(COUNT(*) AS DOUBLE)), 9) AS DECIMAL(28,9))
           AS w
  FROM documents GROUP BY source),
d AS (SELECT CAST(SUM(w) AS DOUBLE) AS denom FROM stats),
rates AS (
  SELECT source, n_total, CAST(w AS DOUBLE) / denom AS p_temp,
         CAST(FLOOR(LEAST(1.0,
              ({MIX_BUDGET_DOCS}.0 * (CAST(w AS DOUBLE) / denom))
              / CAST(n_total AS DOUBLE)) * {res}) AS BIGINT) AS cutoff
  FROM stats CROSS JOIN d),
kept AS (
  SELECT doc_id, source FROM documents JOIN rates USING (source)
  WHERE ({sampling.bucket_sql('doc_id')}) < cutoff)
SELECT r.source, r.n_total, r.p_temp, r.cutoff,
       COUNT(k.doc_id) AS n_kept
FROM rates r LEFT JOIN kept k ON k.source = r.source
GROUP BY 1, 2, 3, 4
"""


@register("temperature_mix_report", _temperature_oracle(),
          "M6-sampling-temperature-mix")
def q_temperature_mix_report(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    rates = sampling.temperature_rates(docs, "source", MIX_BUDGET_DOCS)
    kept = sampling.temperature_mix(docs, "source", "doc_id",
                                    MIX_BUDGET_DOCS)
    counts = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("_nk"))
    return (rates.join(counts, "source", "left")
            .select("source", "n_total", "p_temp", "cutoff",
                    F.coalesce(F.col("_nk"), F.lit(0)).cast("bigint")
                    .alias("n_kept")))


# ---------------------------------------------------------------------------
# length-bucketed batch assembly: padded-batch waste under power-of-two
# length buckets vs the naive unbucketed baseline. Capacity comes from
# the BIT LENGTH of n_tokens - 1 (never floating log2); batches cut on
# row_number in the deterministic hash order; per-batch padding counts
# are pure integer arithmetic — fully hash-verified.

BATCH_SIZE = 8

_LB_TOKENS = f"({token_count_sql('text')})::BIGINT"

_LB_BASE = f"""
base AS (
  SELECT doc_id AS _id, {_LB_TOKENS} AS _t,
         ({sampling.hval_sql('doc_id')}) AS _ord
  FROM documents WHERE {_LB_TOKENS} >= 1)"""


def _lb_batches_sql(cap_expr: str, sfx: str = "") -> str:
    return f"""
capd{sfx} AS (SELECT _id, _t, _ord, {cap_expr} AS _cap FROM base),
rn{sfx} AS (SELECT _id, _t, _cap,
              ROW_NUMBER() OVER (PARTITION BY _cap
                                 ORDER BY _ord ASC, _id ASC) AS _rn
       FROM capd{sfx}),
b{sfx} AS (SELECT _cap AS bucket_cap, (_rn - 1) // {BATCH_SIZE} AS batch_id,
             _t FROM rn{sfx})
"""


_LB_CAP = ("CASE WHEN _t <= 1 THEN 1 "
           "ELSE (1::BIGINT << length(bin(_t - 1))) END")

_LB_ORACLE = f"""
WITH {_LB_BASE},
{_lb_batches_sql(_LB_CAP)}
SELECT bucket_cap, batch_id, COUNT(*) AS n_docs,
       CAST(SUM(_t) AS BIGINT) AS real_tokens,
       CAST(MAX(_t) * COUNT(*) AS BIGINT) AS padded_tokens
FROM b GROUP BY 1, 2
"""


@register("length_bucketed_batches", _LB_ORACLE, "M6-packing-length-buckets")
def q_length_bucketed_batches(spark, sf_dir):
    from etl_online_retail_spark.operators.packing import (
        length_bucket_batches,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").alias("_tok"))
    return length_bucket_batches(docs, "doc_id", F.col("_tok"), BATCH_SIZE)


_PAD_POLICY = """
SELECT '{name}' AS policy, COUNT(*) AS n_batches,
       CAST(SUM(real) AS BIGINT) AS real_tokens,
       CAST(SUM(pad) AS BIGINT) AS padded_tokens,
       CAST(SUM(pad) - SUM(real) AS DOUBLE) / CAST(SUM(pad) AS DOUBLE)
         AS waste
FROM (SELECT batch_id, bucket_cap, SUM(_t) AS real,
             MAX(_t) * COUNT(*) AS pad
      FROM {rel} GROUP BY 1, 2)"""

_PAD_ORACLE = f"""
WITH {_LB_BASE},
{_lb_batches_sql(_LB_CAP)},
bucketed AS ({_PAD_POLICY.format(name='bucketed', rel='b')}),
{_lb_batches_sql('0::BIGINT', sfx='2')},
naive AS ({_PAD_POLICY.format(name='naive', rel='b2')})
SELECT * FROM bucketed UNION ALL SELECT * FROM naive
"""


@register("padding_efficiency", _PAD_ORACLE, "M6-packing-padding-waste")
def q_padding_efficiency(spark, sf_dir):
    """Two-row policy comparison: total padding waste bucketed vs naive.
    The naive arm's global window is THE measured cost bucketing avoids
    (a comparison artifact, not a scale path — documented in
    packing.length_bucket_batches)."""
    from etl_online_retail_spark.operators.packing import (
        length_bucket_batches,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").alias("_tok"))

    def police(name, bucketed):
        b = length_bucket_batches(docs, "doc_id", F.col("_tok"),
                                  BATCH_SIZE, bucketed=bucketed)
        real = F.sum("real_tokens").cast("bigint")
        pad = F.sum("padded_tokens").cast("bigint")
        return b.agg(F.lit(name).alias("policy"),
                     F.count(F.lit(1)).alias("n_batches"),
                     real.alias("real_tokens"),
                     pad.alias("padded_tokens"),
                     ((pad - real).cast("double") / pad.cast("double"))
                     .alias("waste"))

    return police("bucketed", True).unionByName(police("naive", False))
