"""Serving-artifact / governance workload: the round-4 session-4 growth.

Cross-document duplicate-SPAN detection (the Lee-et-al exact-substring
dedup shape, re-expressed as sliding windows + frequency join + interval
merge), the inverted-index serving artifact behind BM25, k-anonymity
release gating (privacy — a new family), per-node triangle counts over the
co-purchase graph, and last-touch attribution over the event stream.
Registered into the same registry as workload.py; oracles follow the
module exactness rules (decimal sums, BIGINT casts, exact microsecond
gaps, identical aliases both sides).

Reference parity: the reference's curation is row-level filters and its
event analytics are grouped rollups (etl.py:150-210); nothing here exists
there — these are the operators a corpus/warehouse at 100 TB needs on top.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_online_retail_spark.operators import graph, privacy, relevance, spans
from etl_online_retail_spark.operators.sessionize import last_touch_attribution
from etl_online_retail_spark.workload import _t, register
from etl_online_retail_spark.workload_ext import TOK_BODY
from etl_online_retail_spark.functions.text import normalize_sql

# shared construction parameters (Spark defaults == these)
SPAN_W = 5              # duplicated-window width, tokens
SPAN_MIN_COUNT = 2      # occurrences corpus-wide to call a window duplicated
IDX_MIN_DF = 2          # inverted index: drop hapax terms
IDX_MAX_POSTINGS = 10   # inverted index: impact-ordered posting cut
K_ANON = 5              # k-anonymity crowd size
ATTR_TOUCHES = ("click", "view")
ATTR_WINDOW_HOURS = 24
TRI_MIN_ORDERS = 2      # co-purchase support threshold (== workload_ts)


# ---------------------------------------------------------------------------
# curation: cross-document duplicate spans (windows -> df -> island merge)

_NORM = normalize_sql("text")
_SPAN_PARTS = " || ' ' || ".join(f"toks[i + {j}]" for j in range(SPAN_W))

# occurrences of every stride-1 W-token window: (doc_id, pos, win)
_SPAN_OCC = f"""
t AS (SELECT doc_id, regexp_split_to_array({_NORM}, '\\s+') AS toks
      FROM documents WHERE trim({_NORM}) <> ''),
w AS (SELECT doc_id,
             unnest(generate_series(1, len(toks) - {SPAN_W - 1})) - 1 AS pos,
             unnest(list_transform(
                 generate_series(1, len(toks) - {SPAN_W - 1}),
                 i -> {_SPAN_PARTS})) AS win
      FROM t WHERE len(toks) >= {SPAN_W}),
d AS (SELECT win FROM w GROUP BY win HAVING COUNT(*) >= {SPAN_MIN_COUNT}),
o AS (SELECT w.doc_id, w.pos FROM w JOIN d USING (win)),
m AS (SELECT doc_id, pos,
             CASE WHEN pos > COALESCE(MAX(pos + {SPAN_W}) OVER (
                      PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS brk
      FROM o),
i AS (SELECT doc_id, pos,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS isl
      FROM m),
sp AS (SELECT doc_id,
              CAST(MIN(pos) AS BIGINT) AS span_start,
              CAST(MAX(pos) + {SPAN_W} AS BIGINT) AS span_end,
              COUNT(*) AS n_windows,
              CAST(MAX(pos) + {SPAN_W} - MIN(pos) AS BIGINT) AS dup_tokens
       FROM i GROUP BY doc_id, isl)
"""

_SPANS_ORACLE = f"""
WITH {_SPAN_OCC}
SELECT doc_id, span_start, span_end, n_windows, dup_tokens FROM sp
"""


@register("duplicate_spans", _SPANS_ORACLE, "M6-curation-span-dedup")
def q_duplicate_spans(spark, sf_dir):
    return spans.duplicate_spans(_t(spark, sf_dir, "documents"),
                                 width=SPAN_W, min_count=SPAN_MIN_COUNT)


_SPAN_STATS_ORACLE = f"""
WITH {_SPAN_OCC}
SELECT doc_id, COUNT(*) AS n_spans,
       CAST(SUM(dup_tokens) AS BIGINT) AS dup_tokens_total
FROM sp GROUP BY doc_id
"""


@register("span_dedup_stats", _SPAN_STATS_ORACLE, "M6-curation-span-dedup")
def q_span_dedup_stats(spark, sf_dir):
    return spans.span_dedup_stats(_t(spark, sf_dir, "documents"),
                                  width=SPAN_W, min_count=SPAN_MIN_COUNT)


# the ACTION: rebuild documents with duplicated spans cut out
_EXCISE_ORACLE = f"""
WITH {_SPAN_OCC},
tk AS (SELECT doc_id,
              unnest(generate_series(1, len(toks))) - 1 AS pos,
              unnest(toks) AS tok
       FROM t),
keep AS (
  SELECT tk.doc_id, tk.pos, tk.tok FROM tk
  WHERE NOT EXISTS (
    SELECT 1 FROM sp
    WHERE sp.doc_id = tk.doc_id
      AND tk.pos >= sp.span_start AND tk.pos < sp.span_end)),
kept AS (
  SELECT doc_id,
         string_agg(tok, ' ' ORDER BY pos) AS cleaned,
         COUNT(*) AS n_kept
  FROM keep GROUP BY doc_id),
tot AS (SELECT doc_id, COUNT(*) AS n_tokens FROM tk GROUP BY doc_id)
SELECT tot.doc_id, tot.n_tokens,
       CAST(tot.n_tokens - COALESCE(kept.n_kept, 0) AS BIGINT)
         AS dup_tokens,
       md5(COALESCE(kept.cleaned, '')) AS cleaned_md5
FROM tot LEFT JOIN kept ON tot.doc_id = kept.doc_id
"""


@register("span_excision", _EXCISE_ORACLE, "M6-curation-span-dedup")
def q_span_excision(spark, sf_dir):
    out = spans.excise_spans(_t(spark, sf_dir, "documents"),
                             width=SPAN_W, min_count=SPAN_MIN_COUNT)
    return out.select("doc_id", "n_tokens", "dup_tokens",
                      F.md5("cleaned").alias("cleaned_md5"))


# ---------------------------------------------------------------------------
# serving: the flattened inverted index behind BM25

_IDX_ORACLE = f"""
WITH tok AS (
  {TOK_BODY}),
tf AS (SELECT term, doc_id, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
stats AS (SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS cf
          FROM tf GROUP BY term HAVING COUNT(*) >= {IDX_MIN_DF}),
p AS (SELECT term, doc_id, tf,
             CAST(ROW_NUMBER() OVER (PARTITION BY term
                                     ORDER BY tf DESC, doc_id) AS BIGINT)
               AS posting_rank
      FROM tf)
SELECT p.term, s.df, s.cf, p.posting_rank, p.doc_id, p.tf
FROM p JOIN stats s USING (term)
WHERE p.posting_rank <= {IDX_MAX_POSTINGS}
"""


@register("inverted_index", _IDX_ORACLE, "M6-serving-inverted-index")
def q_inverted_index(spark, sf_dir):
    return relevance.inverted_index(_t(spark, sf_dir, "documents"),
                                    min_df=IDX_MIN_DF,
                                    max_postings=IDX_MAX_POSTINGS)


# ---------------------------------------------------------------------------
# privacy: k-anonymity audit + suppression release over customer QIs
# QI tuple: (nationkey, mktsegment, account-balance band of 1000).
# The band uses DOUBLE floor-division: band boundaries are x000.00, and
# x000.00/1000.0 is exact in binary floating point, so both engines band
# identically (the workload's float-boundary discipline).

_BAL_BAND = "CAST(FLOOR(CAST(c_acctbal AS DOUBLE) / 1000.0) AS BIGINT)"

_KANON_REPORT_ORACLE = f"""
SELECT c_nationkey, c_mktsegment, {_BAL_BAND} AS bal_band,
       COUNT(*) AS n_rows, (COUNT(*) < {K_ANON}) AS suppressed
FROM customer GROUP BY 1, 2, 3
"""

_KANON_QI = ["c_nationkey", "c_mktsegment", "bal_band"]


def _customer_banded(spark, sf_dir):
    return (_t(spark, sf_dir, "customer")
            .withColumn("bal_band",
                        F.floor(F.col("c_acctbal").cast("double") / 1000.0)
                        .cast("bigint")))


@register("k_anonymity_report", _KANON_REPORT_ORACLE, "M6-privacy-kanon")
def q_k_anonymity_report(spark, sf_dir):
    return privacy.k_anonymity_report(_customer_banded(spark, sf_dir),
                                      _KANON_QI, k=K_ANON)


_KANON_RELEASE_ORACLE = f"""
WITH g AS (
  SELECT c_nationkey, c_mktsegment, {_BAL_BAND} AS bal_band
  FROM customer GROUP BY 1, 2, 3 HAVING COUNT(*) >= {K_ANON})
SELECT COUNT(*) AS n_released,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
         AS total_acctbal
FROM customer c JOIN g
  ON c.c_nationkey = g.c_nationkey AND c.c_mktsegment = g.c_mktsegment
 AND {_BAL_BAND.replace('c_acctbal', 'c.c_acctbal')} = g.bal_band
"""


L_DIVERSITY = 3

_LDIV_ORACLE = f"""
SELECT c_nationkey, {_BAL_BAND} AS bal_band,
       COUNT(*) AS n_rows,
       COUNT(DISTINCT c_mktsegment) AS n_sensitive,
       (COUNT(DISTINCT c_mktsegment) >= {L_DIVERSITY}) AS diverse
FROM customer GROUP BY 1, 2
"""


@register("l_diversity_report", _LDIV_ORACLE, "M6-privacy-ldiversity")
def q_l_diversity_report(spark, sf_dir):
    return privacy.l_diversity_report(
        _customer_banded(spark, sf_dir),
        ["c_nationkey", "bal_band"], "c_mktsegment", l=L_DIVERSITY)


# t-closeness (Li et al. 2007): the skewness-attack audit completing the
# k-anon/l-div triad. TVD vs the global sensitive distribution in EXACT
# integer arithmetic — one fold over present values (the absent-value
# tail collapses into g*N), threshold by cross-multiplication so the
# boolean never touches a float. t = 1/4.

T_CLOSE_NUM, T_CLOSE_DEN = 1, 4

_TCLOSE_ORACLE = f"""
WITH base AS (
  SELECT c_nationkey, {_BAL_BAND} AS bal_band, c_mktsegment FROM customer),
gv AS (SELECT c_nationkey, bal_band, c_mktsegment, COUNT(*) AS ngv
       FROM base GROUP BY 1, 2, 3),
gs AS (SELECT c_nationkey, bal_band, COUNT(*) AS g
       FROM base GROUP BY 1, 2),
v AS (SELECT c_mktsegment, COUNT(*) AS nv FROM base GROUP BY 1),
n AS (SELECT COUNT(*) AS n FROM base),
f AS (
  SELECT gv.c_nationkey, gv.bal_band, gs.g, n.n,
    SUM(ABS(ngv::DECIMAL(18,0) * n::DECIMAL(18,0)
            - nv::DECIMAL(18,0) * g::DECIMAL(18,0))
        - nv::DECIMAL(18,0) * g::DECIMAL(18,0)) AS tail
  FROM gv JOIN gs USING (c_nationkey, bal_band)
  JOIN v USING (c_mktsegment) CROSS JOIN n
  GROUP BY 1, 2, 3, 4)
SELECT c_nationkey, bal_band, g AS n_rows,
  ROUND(CAST(g::DECIMAL(18,0) * n::DECIMAL(18,0) + tail AS DOUBLE)
        / CAST(2::DECIMAL(18,0) * g::DECIMAL(18,0) * n::DECIMAL(18,0)
               AS DOUBLE), 6) AS tvd,
  ({T_CLOSE_DEN}::DECIMAL(2,0)
     * (g::DECIMAL(18,0) * n::DECIMAL(18,0) + tail)
   <= {T_CLOSE_NUM}::DECIMAL(2,0)
     * (2::DECIMAL(18,0) * g::DECIMAL(18,0) * n::DECIMAL(18,0)))
  AS t_close
FROM f
"""


@register("t_closeness_report", _TCLOSE_ORACLE, "M6-privacy-tcloseness")
def q_t_closeness_report(spark, sf_dir):
    return privacy.t_closeness_report(
        _customer_banded(spark, sf_dir),
        ["c_nationkey", "bal_band"], "c_mktsegment",
        t_num=T_CLOSE_NUM, t_den=T_CLOSE_DEN)


# PCA projection audit: rows-only for the driver (BLAS reduction order,
# like knn_pq) — orthonormality/energy/determinism invariants are
# pytest-asserted (tests/test_serving_privacy.py).
PCA_K = 16


@register("embedding_pca", None, "M6-similarity-pca")
def q_embedding_pca(spark, sf_dir):
    from etl_online_retail_spark.operators.similarity import (
        pca_project,
        train_pca,
    )

    emb = _t(spark, sf_dir, "embeddings")
    mean, comp = train_pca(emb, k=PCA_K)
    return (pca_project(emb, mean, comp)
            .select("vec_id", "recon_err", "var_ratio"))


@register("k_anonymous_release", _KANON_RELEASE_ORACLE, "M6-privacy-kanon")
def q_k_anonymous_release(spark, sf_dir):
    released = privacy.k_anonymize(_customer_banded(spark, sf_dir),
                                   _KANON_QI, k=K_ANON)
    return released.agg(
        F.count(F.lit(1)).alias("n_released"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
         .cast("double").alias("total_acctbal"))


# ---------------------------------------------------------------------------
# graph: per-node triangle counts on the co-purchase graph

_TRI_ORACLE = f"""
WITH e0 AS (
  SELECT src, dst FROM (
    SELECT a.l_partkey AS src, b.l_partkey AS dst,
           COUNT(DISTINCT a.l_orderkey) AS n
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    GROUP BY 1, 2)
  WHERE n >= {TRI_MIN_ORDERS}),
c AS (SELECT DISTINCT src, dst FROM e0 WHERE src < dst),
t AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c2
      FROM c e1 JOIN c e2 ON e1.dst = e2.src
      JOIN c e3 ON e3.src = e1.src AND e3.dst = e2.dst),
u AS (SELECT a AS node FROM t
      UNION ALL SELECT b FROM t
      UNION ALL SELECT c2 FROM t)
SELECT node, COUNT(*) AS n_triangles FROM u GROUP BY node
"""


@register("part_triangle_counts", _TRI_ORACLE, "M6-graph-triangles")
def q_part_triangle_counts(spark, sf_dir):
    edges = graph.copurchase_edges(_t(spark, sf_dir, "lineitem"),
                                   min_orders=TRI_MIN_ORDERS)
    return graph.triangle_counts(edges)


# ---------------------------------------------------------------------------
# curation: within-source percentile-rank normalization of quality
# scores. Both sides reuse the CANONICAL quality formula (the review
# rule: one definition per formula) — curation.quality_expr on Spark,
# workload_ext._QUALITY_SQL in the oracle.

def _rank_oracle() -> str:
    from etl_online_retail_spark.workload_ext import _QUALITY_SQL

    return f"""
WITH q AS (SELECT doc_id, source, {_QUALITY_SQL} AS quality
           FROM documents)
SELECT doc_id, source, quality,
       PERCENT_RANK() OVER (PARTITION BY source
                            ORDER BY quality, doc_id) AS rank_pct
FROM q
"""


@register("quality_rank_normalized", _rank_oracle(),
          "M6-curation-rank-norm")
def q_quality_rank_normalized(spark, sf_dir):
    from etl_online_retail_spark.operators.curation import (
        quality_expr,
        rank_normalize,
    )

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select("doc_id", "source",
                         quality_expr("text").alias("quality"))
    return rank_normalize(scored, "source", "quality", "doc_id")


# ---------------------------------------------------------------------------
# drift: PSI of each source's token-length distribution vs the corpus

PSI_BUCKET_W = 20
PSI_MAX_BUCKET = 9


def _psi_oracle() -> str:
    from etl_online_retail_spark.functions.text import token_count_sql

    bkt = (f"least(CAST(FLOOR(CAST({token_count_sql('text')} AS DOUBLE) "
           f"/ {PSI_BUCKET_W}.0) AS BIGINT), {PSI_MAX_BUCKET})")
    return f"""
WITH r AS (SELECT source, {bkt} AS bkt FROM documents),
gb AS (SELECT source, bkt, COUNT(*) AS cgb FROM r GROUP BY 1, 2),
gt AS (SELECT source, COUNT(*) AS ng FROM r GROUP BY 1),
bt AS (SELECT bkt, COUNT(*) AS cb FROM r GROUP BY 1),
s AS (SELECT COUNT(*) AS n FROM r),
nb AS (SELECT COUNT(*) AS b FROM bt),
f AS (
  SELECT gt.source, gt.ng, bt.bkt, bt.cb,
         COALESCE(gb.cgb, 0) AS cgb, s.n, nb.b
  FROM gt CROSS JOIN bt
  LEFT JOIN gb ON gb.source = gt.source AND gb.bkt = bt.bkt, s, nb),
c AS (
  SELECT source, ng,
         CAST(ROUND(
           (CAST(cgb + 1 AS DOUBLE) / CAST(ng + b AS DOUBLE)
            - CAST(cb + 1 AS DOUBLE) / CAST(n + b AS DOUBLE))
           * ln((CAST(cgb + 1 AS DOUBLE) / CAST(ng + b AS DOUBLE))
                / (CAST(cb + 1 AS DOUBLE) / CAST(n + b AS DOUBLE))), 9)
           AS DECIMAL(18,9)) AS contrib
  FROM f)
SELECT source, CAST(ng AS BIGINT) AS n_rows,
       ROUND(CAST(SUM(contrib) AS DOUBLE), 6) AS psi
FROM c GROUP BY source, ng
"""


@register("source_length_psi", _psi_oracle(), "M6-drift-psi")
def q_source_length_psi(spark, sf_dir):
    from etl_online_retail_spark.functions.text import token_count
    from etl_online_retail_spark.operators.profile import psi_by_group

    docs = _t(spark, sf_dir, "documents")
    bkt = F.least(
        F.floor(token_count("text").cast("double") / PSI_BUCKET_W),
        F.lit(PSI_MAX_BUCKET)).cast("bigint")
    return psi_by_group(docs.select("source", bkt.alias("bkt")),
                        "source", "bkt")


# ---------------------------------------------------------------------------
# curation: deterministic contrastive negatives (bucket-probed, no rand())

NEG_K = 3
NEG_BUCKETS = 16
NEG_SEED = 77
NEG_ANCHOR_MOD = 50


def _neg_oracle() -> str:
    from etl_online_retail_spark.functions.hashing import (
        PRIME,
        hash_family,
    )

    (a1, b1), (a2, b2), (a3, b3), (a4, b4) = hash_family(4, seed=NEG_SEED)
    return f"""
WITH anc AS (SELECT doc_id AS anchor_id, source AS agrp
             FROM documents WHERE doc_id % {NEG_ANCHOR_MOD} = 0),
pr AS (SELECT anchor_id, agrp,
              unnest(generate_series(0, {NEG_K - 1})) AS neg_round
       FROM anc),
p2 AS (SELECT anchor_id, agrp, neg_round,
              (((((anchor_id % {PRIME}) * {NEG_K} + neg_round)
                 % {PRIME}) * {a2} + {b2}) % {PRIME}) % {NEG_BUCKETS}
                AS bkt,
              ((anchor_id % {PRIME}) * {a4} + {b4}) % {PRIME} AS ah
       FROM pr),
cd AS (SELECT doc_id AS neg_id, source AS neg_group,
              (((doc_id % {PRIME}) * {a1} + {b1}) % {PRIME})
                % {NEG_BUCKETS} AS bkt,
              ((doc_id % {PRIME}) * {a3} + {b3}) % {PRIME} AS ch
       FROM documents),
j AS (SELECT anchor_id, neg_round, neg_id, neg_group,
             (ch + ah) % {PRIME} AS ph
      FROM p2 JOIN cd USING (bkt)
      WHERE neg_id <> anchor_id AND neg_group <> agrp),
rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id, neg_round
                                    ORDER BY ph, neg_id) AS rn
       FROM j)
SELECT anchor_id, neg_round, neg_id, neg_group FROM rk WHERE rn = 1
"""


@register("contrastive_negatives", _neg_oracle(), "M6-curation-negatives")
def q_contrastive_negatives(spark, sf_dir):
    from etl_online_retail_spark.operators.curation import (
        contrastive_negatives,
    )

    docs = _t(spark, sf_dir, "documents")
    anchors = docs.filter(F.col("doc_id") % NEG_ANCHOR_MOD == 0)
    return contrastive_negatives(docs, anchors, k=NEG_K,
                                 n_buckets=NEG_BUCKETS, seed=NEG_SEED)


# ---------------------------------------------------------------------------
# curation: the complete contrastive TRIPLET builder (anchor, verified
# near-dup positive, deterministic different-source negative)


def _triplets_oracle() -> str:
    from etl_online_retail_spark.functions.hashing import (
        PRIME,
        hash_family,
    )
    from etl_online_retail_spark.workload_ext import _minhash_cte_block

    (a1, b1), (a2, b2), (a3, b3), (a4, b4) = hash_family(4, seed=NEG_SEED)
    B = NEG_BUCKETS
    return f"""
WITH {_minhash_cte_block()},
anc AS (SELECT DISTINCT p.id_a AS anchor_id, d.source AS agrp
        FROM neardup_pairs p JOIN documents d ON d.doc_id = p.id_a),
p2 AS (SELECT anchor_id, agrp,
              (((anchor_id % {PRIME}) * {a2} + {b2}) % {PRIME}) % {B}
                AS bkt,
              ((anchor_id % {PRIME}) * {a4} + {b4}) % {PRIME} AS ah
       FROM anc),
cd AS (SELECT doc_id AS neg_id, source AS neg_group,
              (((doc_id % {PRIME}) * {a1} + {b1}) % {PRIME}) % {B} AS bkt,
              ((doc_id % {PRIME}) * {a3} + {b3}) % {PRIME} AS ch
       FROM documents),
j AS (SELECT anchor_id, neg_id, neg_group, (ch + ah) % {PRIME} AS ph
      FROM p2 JOIN cd USING (bkt)
      WHERE neg_id <> anchor_id AND neg_group <> agrp),
rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                                    ORDER BY ph, neg_id) AS rn FROM j),
ng AS (SELECT anchor_id, CAST(0 AS BIGINT) AS neg_round,
              neg_id, neg_group FROM rk WHERE rn = 1)
SELECT p.id_a AS anchor_id, p.id_b AS pos_id, p.jaccard,
       ng.neg_round, ng.neg_id, ng.neg_group
FROM neardup_pairs p JOIN ng ON ng.anchor_id = p.id_a
"""


@register("contrastive_triplets", _triplets_oracle(),
          "M6-curation-triplets")
def q_contrastive_triplets(spark, sf_dir):
    from etl_online_retail_spark.operators.curation import (
        contrastive_triplets,
    )
    from etl_online_retail_spark.workload_ext import (
        JACCARD_THRESHOLD,
        MINHASH_BANDS,
        MINHASH_K,
        SHINGLE_N,
    )

    return contrastive_triplets(
        _t(spark, sf_dir, "documents"),
        n=SHINGLE_N, k=MINHASH_K, bands=MINHASH_BANDS,
        threshold=JACCARD_THRESHOLD,
        n_buckets=NEG_BUCKETS, seed=NEG_SEED)


# ---------------------------------------------------------------------------
# data quality: quarantine split summary (the expectations-with-drop
# ACTION on the event stream — every row lands in exactly one bucket
# keyed by the comma-joined list of rules it breaks; '' = valid)

QUAR_VALUE_CAP = 300.0
QUAR_KNOWN_TYPES = ("click", "view", "purchase", "signup")

_QUAR_IN = "', '".join(QUAR_KNOWN_TYPES)

_QUAR_ORACLE = f"""
WITH t AS (
  SELECT concat_ws(',',
    CASE WHEN (value <= {QUAR_VALUE_CAP}) IS NULL
           OR NOT (value <= {QUAR_VALUE_CAP}) THEN 'value_cap' END,
    CASE WHEN (event_type IN ('{_QUAR_IN}')) IS NULL
           OR NOT (event_type IN ('{_QUAR_IN}')) THEN 'known_type' END)
    AS violations
  FROM events)
SELECT violations, COUNT(*) AS n_rows FROM t GROUP BY violations
"""


@register("events_quarantine_summary", _QUAR_ORACLE, "S6-quarantine")
def q_events_quarantine_summary(spark, sf_dir):
    from etl_online_retail_spark.operators.constraints import quarantine

    ev = _t(spark, sf_dir, "events")
    rules = [
        ("value_cap", F.col("value") <= QUAR_VALUE_CAP),
        ("known_type", F.col("event_type").isin(*QUAR_KNOWN_TYPES)),
    ]
    valid, invalid = quarantine(ev, rules)
    tagged = (valid.withColumn("violations", F.lit(""))
              .select("violations")
              .unionByName(invalid.select("violations")))
    return tagged.groupBy("violations").agg(
        F.count(F.lit(1)).alias("n_rows"))


# ---------------------------------------------------------------------------
# statistics: deterministic jackknife CI for a dashboard mean

JK_BUCKETS = 32


def _jackknife_oracle() -> str:
    from etl_online_retail_spark.functions.hashing import PRIME, hash_family

    a, b = hash_family(1, seed=13)[0]
    frac = ("(CAST(nb AS DOUBLE) - 1.0) / CAST(nb AS DOUBLE)")
    return f"""
WITH r AS (
  SELECT ((((o_orderkey % {PRIME}) * {a} + {b}) % {PRIME})
          % {JK_BUCKETS}) AS bkt,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
  FROM orders),
per AS (SELECT bkt, COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS s
        FROM r GROUP BY bkt),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(s) AS BIGINT) AS st
        FROM per),
loo AS (SELECT nt, st,
               CAST(st - s AS DOUBLE) / CAST(nt - n AS DOUBLE) AS m
        FROM per, tot),
mb AS (SELECT CAST(SUM(CAST(ROUND(m, 9) AS DECIMAL(28,9))) AS DOUBLE)
              / CAST(COUNT(m) AS DOUBLE) AS mbar,
              COUNT(m) AS nb FROM loo),
v2 AS (SELECT MAX(nt) AS nt, MAX(st) AS st, MAX(nb) AS nb,
              CAST(SUM(CAST(ROUND((m - mbar) * (m - mbar), 9)
                            AS DECIMAL(28,9))) AS DOUBLE) AS ss
       FROM loo, mb)
SELECT nt AS n_rows,
       ROUND(CAST(st AS DOUBLE) / CAST(nt AS DOUBLE), 6) AS mean,
       ROUND(sqrt({frac} * ss), 6) AS se,
       ROUND(CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)
             - 1.96 * sqrt({frac} * ss), 6) AS ci_lo,
       ROUND(CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)
             + 1.96 * sqrt({frac} * ss), 6) AS ci_hi
FROM v2
"""


@register("orders_price_jackknife", _jackknife_oracle(),
          "A2-uncertainty-jackknife")
def q_orders_price_jackknife(spark, sf_dir):
    from etl_online_retail_spark.operators.aggregates import jackknife_mean

    orders = (_t(spark, sf_dir, "orders")
              .select("o_orderkey",
                      (F.col("o_totalprice").cast("decimal(18,2)") * 100)
                      .cast("bigint").alias("cents")))
    return jackknife_mean(orders, "o_orderkey", "cents",
                          n_buckets=JK_BUCKETS)


# ---------------------------------------------------------------------------
# graph: co-purchase association scores (support / lift / PMI)

PMI_MIN_ORDERS = 2

_PMI_ORACLE = f"""
WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
            FROM lineitem),
n AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM op),
supp AS (SELECT pk, COUNT(*) AS s FROM op GROUP BY pk),
p AS (SELECT a.pk AS src, b.pk AS dst, COUNT(*) AS n_both
      FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY 1, 2 HAVING COUNT(*) >= {PMI_MIN_ORDERS})
SELECT src, dst, n_both, sa.s AS n_src, sb.s AS n_dst,
       CAST(n_orders AS DOUBLE) * CAST(n_both AS DOUBLE)
         / (CAST(sa.s AS DOUBLE) * CAST(sb.s AS DOUBLE)) AS lift,
       ROUND(ln(CAST(n_orders AS DOUBLE) * CAST(n_both AS DOUBLE)
                / (CAST(sa.s AS DOUBLE) * CAST(sb.s AS DOUBLE))), 9)
         AS pmi
FROM p JOIN supp sa ON p.src = sa.pk
       JOIN supp sb ON p.dst = sb.pk, n
"""


@register("part_copurchase_pmi", _PMI_ORACLE, "M6-graph-association-pmi")
def q_part_copurchase_pmi(spark, sf_dir):
    return graph.copurchase_pmi(_t(spark, sf_dir, "lineitem"),
                                min_orders=PMI_MIN_ORDERS)


RULE_MIN_CONFIDENCE = 0.08

_RULES_ORACLE = f"""
WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
            FROM lineitem),
n AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM op),
supp AS (SELECT pk, COUNT(*) AS s FROM op GROUP BY pk),
p AS (SELECT a.pk AS src, b.pk AS dst, COUNT(*) AS n_both
      FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY 1, 2 HAVING COUNT(*) >= {PMI_MIN_ORDERS}),
scored AS (
  SELECT src, dst, n_both, sa.s AS n_src, sb.s AS n_dst,
         CAST(n_orders AS DOUBLE) * CAST(n_both AS DOUBLE)
           / (CAST(sa.s AS DOUBLE) * CAST(sb.s AS DOUBLE)) AS lift
  FROM p JOIN supp sa ON p.src = sa.pk
         JOIN supp sb ON p.dst = sb.pk, n),
directed AS (
  SELECT src AS antecedent, dst AS consequent, n_both,
         n_src AS n_antecedent, lift FROM scored
  UNION ALL
  SELECT dst AS antecedent, src AS consequent, n_both,
         n_dst AS n_antecedent, lift FROM scored)
SELECT antecedent, consequent, n_both, n_antecedent,
       CAST(n_both AS DOUBLE) / CAST(n_antecedent AS DOUBLE)
         AS confidence,
       lift
FROM directed
WHERE CAST(n_both AS DOUBLE) / CAST(n_antecedent AS DOUBLE)
      >= {RULE_MIN_CONFIDENCE}
"""


@register("part_copurchase_rules", _RULES_ORACLE, "M6-graph-association-rules")
def q_part_copurchase_rules(spark, sf_dir):
    return graph.copurchase_rules(_t(spark, sf_dir, "lineitem"),
                                  min_orders=PMI_MIN_ORDERS,
                                  min_confidence=RULE_MIN_CONFIDENCE)


# ---------------------------------------------------------------------------
# time series: rolling z-score anomaly gate over the event stream

Z_LOOKBACK = 10
Z_MIN_OBS = 5
Z_THRESHOLD = 3.0

_Z_FRAME = (f"PARTITION BY user_id ORDER BY ts, event_id "
            f"ROWS BETWEEN {Z_LOOKBACK} PRECEDING AND 1 PRECEDING")

_ZSCORE_ORACLE = f"""
WITH b AS (
  SELECT user_id, event_id, ts, value,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
         COUNT(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
           OVER ({_Z_FRAME}) AS n,
         SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
           OVER ({_Z_FRAME}) AS s,
         SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
             * CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
           OVER ({_Z_FRAME}) AS s2
  FROM events),
z AS (
  SELECT user_id, event_id, ts, value, n,
         sqrt((CAST(s2 AS DOUBLE)
               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                 / CAST(n AS DOUBLE))
              / (CAST(n AS DOUBLE) - 1.0)) AS sd,
         (CAST(c AS DOUBLE)
          - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS dev
  FROM b)
SELECT user_id, event_id, ts, value,
       CAST(n AS BIGINT) AS baseline_n,
       ROUND(dev / sd, 6) AS zscore
FROM z
WHERE n >= {Z_MIN_OBS} AND sd > 0 AND abs(dev / sd) > {Z_THRESHOLD}
"""


@register("events_anomaly_zscore", _ZSCORE_ORACLE, "T1-anomaly-zscore")
def q_events_anomaly_zscore(spark, sf_dir):
    from etl_online_retail_spark.operators.timeseries import (
        rolling_zscore_anomalies,
    )

    return rolling_zscore_anomalies(
        _t(spark, sf_dir, "events"), "user_id", "ts", "event_id", "value",
        lookback=Z_LOOKBACK, min_obs=Z_MIN_OBS, threshold=Z_THRESHOLD)


# ---------------------------------------------------------------------------
# events: last-touch attribution (one ordered pass, no range self-join)

_ATTR_WINDOW_US = ATTR_WINDOW_HOURS * 3600 * 1_000_000
_ATTR_IN = "', '".join(ATTR_TOUCHES)
_ATTR_FRAME = ("PARTITION BY user_id ORDER BY ts, event_id "
               "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING")

_ATTR_ORACLE = f"""
WITH c AS (
  SELECT event_id, user_id, ts, event_type, value,
         last_value(CASE WHEN event_type IN ('{_ATTR_IN}') THEN ts END
                    IGNORE NULLS) OVER ({_ATTR_FRAME}) AS t_ts,
         last_value(CASE WHEN event_type IN ('{_ATTR_IN}') THEN event_type END
                    IGNORE NULLS) OVER ({_ATTR_FRAME}) AS t_type
  FROM events),
a AS (
  SELECT CASE WHEN t_ts IS NOT NULL
                   AND epoch_us(ts) - epoch_us(t_ts) <= {_ATTR_WINDOW_US}
              THEN t_type ELSE 'none' END AS attributed_type,
         CASE WHEN t_ts IS NOT NULL
                   AND epoch_us(ts) - epoch_us(t_ts) <= {_ATTR_WINDOW_US}
              THEN epoch_us(ts) - epoch_us(t_ts) END AS lag_us,
         value
  FROM c WHERE event_type = 'purchase')
SELECT attributed_type, COUNT(*) AS n_conversions,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       CAST(SUM(lag_us) AS BIGINT) AS lag_us_total
FROM a GROUP BY attributed_type
"""


_ATTR_LINEAR_ORACLE = f"""
WITH t AS (SELECT user_id, ts, event_id, event_type FROM events
           WHERE event_type IN ('{_ATTR_IN}')),
c AS (SELECT user_id, ts, event_id, value FROM events
      WHERE event_type = 'purchase'),
p AS (SELECT c.event_id AS cid, t.event_type AS ttype, c.value
      FROM c JOIN t ON t.user_id = c.user_id
       AND epoch_us(c.ts) - epoch_us(t.ts) BETWEEN 0 AND {_ATTR_WINDOW_US}
       AND (t.ts < c.ts OR (t.ts = c.ts AND t.event_id < c.event_id))),
n AS (SELECT cid, COUNT(*) AS nt FROM p GROUP BY cid),
touched AS (
  SELECT p.ttype AS attributed_type, COUNT(*) AS n_credits,
         ROUND(CAST(SUM(CAST(ROUND(p.value / n.nt, 9) AS DECIMAL(18,9)))
                    AS DOUBLE), 6) AS credit
  FROM p JOIN n ON p.cid = n.cid GROUP BY p.ttype),
unattributed AS (
  SELECT 'none' AS attributed_type, COUNT(*) AS n_credits,
         ROUND(CAST(COALESCE(SUM(CAST(value AS DECIMAL(18,2))),
                             CAST(0 AS DECIMAL(18,2))) AS DOUBLE), 6)
           AS credit
  FROM c WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.cid = c.event_id))
SELECT * FROM touched UNION ALL SELECT * FROM unattributed
"""


@register("attribution_linear", _ATTR_LINEAR_ORACLE, "T1-attribution")
def q_attribution_linear(spark, sf_dir):
    from etl_online_retail_spark.operators.sessionize import (
        linear_attribution_credit,
    )

    return linear_attribution_credit(
        _t(spark, sf_dir, "events"),
        touch_types=ATTR_TOUCHES, conversion_type="purchase",
        window_hours=ATTR_WINDOW_HOURS)


# time-to-conversion profile: percentiles of the attribution lag per
# credited touch type (the latency read-out of the attribution
# pipeline). DEFAULT = the HDR log-histogram sketch (bounded per-group
# state: O(64 x 32) bucket counts however many conversions a type has,
# map-side combinable — the 100 TB shape), with the oracle rebuilding
# the identical integer bucketing so the row stays hash-exact. The
# exact interpolated fold survives as conversion_lag_percentiles_exact,
# the oracle/debug twin at test SF — the orders_profile pattern.
# Lags are bucketed at v = lag_us + 1 so a zero-lag conversion (touch
# and purchase sharing a microsecond) still lands in a bucket (the
# sketch needs v >= 1); both engines subtract the 1 back off the edge.
_LAG_CTE = f"""
c AS (
  SELECT event_id, user_id, ts, event_type, value,
         last_value(CASE WHEN event_type IN ('{_ATTR_IN}') THEN ts END
                    IGNORE NULLS) OVER ({_ATTR_FRAME}) AS t_ts,
         last_value(CASE WHEN event_type IN ('{_ATTR_IN}') THEN event_type END
                    IGNORE NULLS) OVER ({_ATTR_FRAME}) AS t_type
  FROM events),
a AS (
  SELECT t_type AS attributed_type,
         epoch_us(ts) - epoch_us(t_ts) AS lag_us
  FROM c
  WHERE event_type = 'purchase' AND t_ts IS NOT NULL
    AND epoch_us(ts) - epoch_us(t_ts) <= {_ATTR_WINDOW_US})"""

_LAG_QS = (0.5, 0.9, 0.99)


def _lag_hdr_oracle() -> str:
    from etl_online_retail_spark.operators import sketches

    bucket_id, ub = sketches.hdr_bucket_sql("v")
    q_list = ", ".join(f"CAST({q} AS DOUBLE)" for q in _LAG_QS)
    return f"""
WITH {_LAG_CTE},
v AS (SELECT attributed_type, lag_us + 1 AS v FROM a),
b AS (SELECT attributed_type, {bucket_id} AS bucket, {ub} AS ub FROM v),
hist AS (SELECT attributed_type, bucket, MIN(ub) AS ub, COUNT(*) AS cnt
         FROM b GROUP BY 1, 2),
cum AS (SELECT attributed_type, bucket, ub,
        CAST(SUM(cnt) OVER (PARTITION BY attributed_type
                            ORDER BY bucket) AS DOUBLE) AS cum,
        CAST(SUM(cnt) OVER (PARTITION BY attributed_type) AS DOUBLE) AS n
        FROM hist),
qq AS (SELECT unnest([{q_list}]) AS q),
hit AS (SELECT c.attributed_type, q.q, c.bucket, c.ub
        FROM cum c JOIN qq q ON c.cum >= CAST(CEIL(q.q * c.n) AS DOUBLE)),
sel AS (SELECT attributed_type, q, MIN(bucket) AS b FROM hit GROUP BY 1, 2)
SELECT s.attributed_type, s.q, h.ub - 1 AS est_lag_us
FROM sel s JOIN hist h
  ON h.attributed_type = s.attributed_type AND h.bucket = s.b"""


@register("conversion_lag_percentiles", _lag_hdr_oracle(), "T1-attribution")
def q_conversion_lag_percentiles(spark, sf_dir):
    from etl_online_retail_spark.operators import sketches

    attributed = last_touch_attribution(
        _t(spark, sf_dir, "events"),
        touch_types=ATTR_TOUCHES, conversion_type="purchase",
        window_hours=ATTR_WINDOW_HOURS)
    lags = (attributed
            .filter(F.col("attributed_type") != "none")
            .select("attributed_type",
                    (F.col("lag_us") + F.lit(1)).alias("v")))
    hist = sketches.hdr_histogram(lags, "attributed_type", "v")
    return (sketches.hdr_quantiles(hist, "attributed_type", list(_LAG_QS))
            .select("attributed_type", "q",
                    (F.col("est") - F.lit(1.0)).alias("est_lag_us")))


_LAG_EXACT_ORACLE = f"""
WITH {_LAG_CTE}
SELECT attributed_type, COUNT(*) AS n_conversions,
       ROUND(quantile_cont(lag_us, 0.5), 6) AS p50_lag_us,
       ROUND(quantile_cont(lag_us, 0.9), 6) AS p90_lag_us,
       ROUND(quantile_cont(lag_us, 0.99), 6) AS p99_lag_us
FROM a GROUP BY attributed_type
"""


@register("conversion_lag_percentiles_exact", _LAG_EXACT_ORACLE,
          "T1-attribution")
def q_conversion_lag_percentiles_exact(spark, sf_dir):
    """Exact interpolated percentiles (percentile()/quantile_cont share
    the (1-g)*lo + g*hi interpolation). Oracle/debug twin of the HDR
    default: each F.percentile buffer holds EVERY lag for its touch
    type, so at 100 TB this is the documented unbounded-state form —
    run it at test SF to calibrate the sketch, ship the sketch."""
    attributed = last_touch_attribution(
        _t(spark, sf_dir, "events"),
        touch_types=ATTR_TOUCHES, conversion_type="purchase",
        window_hours=ATTR_WINDOW_HOURS)
    return (attributed
            .filter(F.col("attributed_type") != "none")
            .groupBy("attributed_type")
            .agg(F.count(F.lit(1)).alias("n_conversions"),
                 F.round(F.percentile("lag_us", F.lit(0.5)), 6)
                  .alias("p50_lag_us"),
                 F.round(F.percentile("lag_us", F.lit(0.9)), 6)
                  .alias("p90_lag_us"),
                 F.round(F.percentile("lag_us", F.lit(0.99)), 6)
                  .alias("p99_lag_us")))


@register("attribution_last_touch", _ATTR_ORACLE, "T1-attribution")
def q_attribution_last_touch(spark, sf_dir):
    attributed = last_touch_attribution(
        _t(spark, sf_dir, "events"),
        touch_types=ATTR_TOUCHES, conversion_type="purchase",
        window_hours=ATTR_WINDOW_HOURS)
    return (attributed.groupBy("attributed_type")
            .agg(F.count(F.lit(1)).alias("n_conversions"),
                 F.sum(F.col("value").cast("decimal(18,2)"))
                  .cast("double").alias("total_value"),
                 F.sum("lag_us").alias("lag_us_total")))


# ---------------------------------------------------------------------------
# right-to-erasure impact audit (GDPR Art. 17): how many rows each table
# loses when a subject batch is forgotten, INCLUDING the cascade through
# referential chains (lineitems of erased orders) — the sign-off
# artifact before the destructive anti-join pass (privacy.erase_rows).

ERASE_MOD = 97  # deletion batch: customers with c_custkey % 97 == 0

_ERASURE_ORACLE = f"""
WITH s AS (SELECT DISTINCT c_custkey AS k FROM customer
           WHERE c_custkey % {ERASE_MOD} = 0),
eo AS (SELECT DISTINCT o_orderkey AS k FROM orders
       WHERE o_custkey IN (SELECT k FROM s))
SELECT 'customer' AS "table", COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN c_custkey IN (SELECT k FROM s)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_erased,
       CAST(SUM(CASE WHEN c_custkey IN (SELECT k FROM s)
                THEN 0 ELSE 1 END) AS BIGINT) AS n_retained
FROM customer
UNION ALL
SELECT 'orders', COUNT(*),
       CAST(SUM(CASE WHEN o_custkey IN (SELECT k FROM s)
                THEN 1 ELSE 0 END) AS BIGINT),
       CAST(SUM(CASE WHEN o_custkey IN (SELECT k FROM s)
                THEN 0 ELSE 1 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'lineitem', COUNT(*),
       CAST(SUM(CASE WHEN l_orderkey IN (SELECT k FROM eo)
                THEN 1 ELSE 0 END) AS BIGINT),
       CAST(SUM(CASE WHEN l_orderkey IN (SELECT k FROM eo)
                THEN 0 ELSE 1 END) AS BIGINT)
FROM lineitem
"""


@register("erasure_impact_audit", _ERASURE_ORACLE, "M6-privacy-erasure")
def q_erasure_impact_audit(spark, sf_dir):
    """Erasure scope over the referential chain customer -> orders ->
    lineitem: direct key hits on customer/orders, then the CASCADE (the
    lineitems belonging to erased orders — lineitem carries no customer
    key, so the order set is the propagation frontier). One broadcast +
    conditional aggregation per table; the fact tables never shuffle."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    subjects = (c.filter(F.col("c_custkey") % ERASE_MOD == 0)
                .select(F.col("c_custkey").alias("subject_key")))
    direct = privacy.erasure_scope(
        {"customer": c, "orders": o},
        {"customer": "c_custkey", "orders": "o_custkey"},
        subjects)
    erased_orders = (o.join(F.broadcast(subjects),
                            o.o_custkey == F.col("subject_key"),
                            "left_semi")
                     .select(F.col("o_orderkey").alias("subject_key")))
    cascade = privacy.erasure_scope(
        {"lineitem": li}, {"lineitem": "l_orderkey"}, erased_orders)
    return direct.unionByName(cascade)
