"""Full-text relevance scoring: corpus statistics + BM25.

Classic sparse retrieval over the documents table: whitespace terms from
normalized text, document frequencies over the corpus, Okapi BM25 for a
fixed query-term set. Everything is built-in expressions (explode + two
hash aggregations + small broadcast joins) — no UDFs.

Scale notes: `toks` is the only corpus-sized relation; both aggregations
over it are partial-agg-friendly (map-side combine on doc_id/term). The
per-term statistics (df) and the corpus scalars (N, avgdl) are tiny and
broadcast. The per-doc score join keys on doc_id — one shuffle, or zero if
the corpus is already bucketed by doc_id.

Cross-engine exactness: each per-term BM25 contribution is rounded to 9dp
and summed as DECIMAL(18,9) (order-independent), then the total rounds to
6dp — the workload's float-aggregation convention.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_online_retail_spark.functions.text import normalize, tokens

BM25_K1 = 1.2
BM25_B = 0.75


def corpus_terms(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(id, term) pairs: whitespace terms of normalized text, one row per
    occurrence. Empty documents contribute no rows (mirrors the SQL twin's
    WHERE trim(norm) <> '')."""
    norm = normalize(text_col)
    return (docs
            .filter(F.trim(norm) != "")
            .select(F.col(id_col), F.explode(tokens(norm)).alias("term")))


def bm25_scores(docs: DataFrame, query_terms: Sequence[str],
                k1: float = BM25_K1, b: float = BM25_B,
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """BM25 score of every matching document for the query-term set.

    idf = ln((N - df + 0.5) / (df + 0.5) + 1.0)        (Lucene's formula)
    tf-part = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    Output: (id_col, bm25) for documents containing >= 1 query term.
    """
    # toks feeds dl, the corpus scalars AND the hit set — cached so the
    # tokenize (normalize regexes + split + explode) runs once, not once
    # per consuming subtree
    toks = corpus_terms(docs, id_col, text_col).cache()
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"))

    hits = toks.filter(F.col("term").isin(list(query_terms)))
    tf = hits.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df = hits.groupBy("term").agg(F.count_distinct(F.col(id_col)).alias("df"))

    idf = F.log((F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5) + 1.0)
    tf_part = (F.col("tf") * (k1 + 1.0)) \
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    contrib = (tf
               .join(F.broadcast(df), "term")
               .join(dl, id_col)
               .crossJoin(F.broadcast(stats))
               .select(F.col(id_col),
                       F.round(idf * tf_part, 9).cast("decimal(18,9)")
                        .alias("_c")))
    return (contrib.groupBy(id_col)
            .agg(F.round(F.sum("_c").cast("double"), 6).alias("bm25")))


def inverted_index(docs: DataFrame, min_df: int = 2,
                   max_postings: int | None = None,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """The serving artifact BM25 scoring implies: a flattened inverted
    index — for every retained term, its corpus statistics and its
    tf-ranked posting list.

    Output, one row per (term, posting):
        (term, df BIGINT, cf BIGINT, posting_rank BIGINT, doc_id, tf
        BIGINT)
    where df = documents containing the term, cf = corpus frequency,
    posting_rank orders postings by (tf DESC, id) within the term.
    Hapax/noise terms drop below min_df; max_postings truncates each list
    to its top entries (impact-ordered posting pruning, the static index
    pruning of Carmel et al.) — unbounded by default.

    Scale shape: tokenize (no shuffle) -> one (id, term) hash agg for tfs
    -> per-term stats agg + one ranking window partitioned BY TERM. Both
    shuffles key on the term; a hot stop-term's partition is bounded by
    its df, and min_df/max_postings are the knobs that keep the emitted
    index (the thing a serving tier loads) bounded. Rows are
    integers/strings — oracle-hash-exact. Group the flat rows by term and
    collect to materialize physical posting lists; the flat form is the
    exchange format (and what a parquet-backed index scan reads back).
    """
    toks = corpus_terms(docs, id_col, text_col)
    # tf feeds BOTH the stats aggregate and the ranking window — cache
    # it or the tokenize+explode+agg lineage executes twice (rule 7;
    # r7 review)
    tf = (toks.groupBy("term", id_col)
          .agg(F.count(F.lit(1)).alias("tf"))).cache()
    stats = (tf.groupBy("term")
             .agg(F.count(F.lit(1)).alias("df"),
                  F.sum("tf").alias("cf"))
             .filter(F.col("df") >= min_df))
    w = Window.partitionBy("term").orderBy(F.col("tf").desc(), F.col(id_col))
    ranked = tf.withColumn("posting_rank",
                           F.row_number().over(w).cast("bigint"))
    if max_postings is not None:
        ranked = ranked.filter(F.col("posting_rank") <= max_postings)
    return (ranked.join(stats, "term")
            .select("term", "df", "cf", "posting_rank", id_col, "tf"))


def bigram_logprob(docs: DataFrame, k_smooth: float = 0.5,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Per-document mean bigram log-probability with add-k smoothing —
    one step up the LM-quality ladder from unigram_logprob: stereotyped
    word ORDER now scores high, shuffled bags of common words do not.

    p(w2|w1) = (c(w1,w2) + k) / (c(w1) + k*V),  V = unigram vocab size.
    Each document's first token is a context anchor only (no start
    symbol), so a doc scores over (n_tokens - 1) transitions; single-token
    and empty docs are ABSENT from the output (no bigrams -> no group
    row; the oracle matches — r7 review corrected an earlier claim that
    they emit NULL). Same float discipline as BM25:
    per-(doc,bigram) contributions tf*ln(p) rounded to 9dp, summed as
    DECIMAL, mean rounded to 6dp.
    """
    norm = normalize(text_col)
    # cached: the tokenize feeds the bigram explode AND the unigram counts
    toked = (docs
             .filter(F.trim(norm) != "")
             .select(F.col(id_col), tokens(norm).alias("_t"))
             .cache())
    n = F.size(F.col("_t"))
    bi = (toked
          .filter(n >= 2)
          .select(F.col(id_col),
                  # space-joined: normalized tokens are [a-z0-9]+ so the
                  # separator is unambiguous (and SQL-literal-friendly,
                  # unlike NUL)
                  F.explode(F.zip_with(
                      F.slice(F.col("_t"), 1, n - 1),
                      F.slice(F.col("_t"), 2, n - 1),
                      lambda a, b: F.concat(a, F.lit(" "), b)))
                   .alias("bigram")))
    uni = (toked.select(F.explode(F.col("_t")).alias("w"))
           .groupBy("w").agg(F.count(F.lit(1)).alias("c1")))
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    # corpus bigram counts and per-doc bigram tfs come from the same
    # exploded relation — cache it (3 consuming subtrees, BM25 lesson)
    bi = bi.cache()
    big = bi.groupBy("bigram").agg(F.count(F.lit(1)).alias("c2"))
    tf = bi.groupBy(id_col, "bigram").agg(F.count(F.lit(1)).alias("tf"))

    w1 = F.split_part(F.col("bigram"), F.lit(" "), F.lit(1))
    logp = F.log((F.col("c2") + k_smooth)
                 / (F.col("c1") + k_smooth * F.col("v")))
    contrib = (tf
               .join(F.broadcast(big), "bigram")
               .withColumn("_w1", w1)
               .join(F.broadcast(uni.withColumnRenamed("w", "_w1")), "_w1")
               .crossJoin(F.broadcast(vocab))
               .select(F.col(id_col), F.col("tf"),
                       F.round(F.col("tf") * logp, 9)
                        .cast("decimal(18,9)").alias("_c")))
    return (contrib.groupBy(id_col)
            .agg(F.sum("tf").alias("n_transitions"),
                 F.round(F.sum("_c").cast("double")
                         / F.sum("tf").cast("double"), 6)
                  .alias("avg_logprob")))


def unigram_logprob(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Per-document mean token log-probability under the corpus unigram MLE
    — the classic cheap LM quality score (a perplexity proxy): documents of
    rare/garbled tokens score low, stereotyped documents score high.

    Output: (id_col, n_tokens, avg_logprob). Per-(doc,term) contributions
    tf*ln(cnt/T) are rounded to 9dp and summed as DECIMAL so the mean is
    order-independent; the unigram table is corpus-wide but vocabulary-sized
    (broadcast), so scoring is one corpus-sized aggregation + one broadcast
    join.
    """
    # cached: feeds tf, the unigram table and the total (3 subtrees)
    toks = corpus_terms(docs, id_col, text_col).cache()
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    cnt = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    tot = toks.agg(F.count(F.lit(1)).alias("t_total"))
    contrib = (tf
               .join(F.broadcast(cnt), "term")
               .crossJoin(F.broadcast(tot))
               .select(F.col(id_col), F.col("tf"),
                       F.round(F.col("tf")
                               * F.log(F.col("cnt").cast("double")
                                       / F.col("t_total").cast("double")), 9)
                        .cast("decimal(18,9)").alias("_c")))
    return (contrib.groupBy(id_col)
            .agg(F.sum("tf").alias("n_tokens"),
                 F.round(F.sum("_c").cast("double")
                         / F.sum("tf").cast("double"), 6)
                  .alias("avg_logprob")))


def rrf_fuse(ranked: "dict[str, DataFrame]", id_col: str = "doc_id",
             rank_col: str = "rank", k0: int = 60) -> DataFrame:
    """Reciprocal-rank fusion of independently-ranked candidate lists
    (Cormack et al. SIGIR'09): score(d) = Σ_lists 1/(k0 + rank_list(d)),
    absent-from-list contributing 0. The standard hybrid-retrieval
    combiner (lexical BM25 + dense embedding ranks) because it needs no
    score calibration between heterogeneous scorers — only ranks.

    `ranked` maps a list name to its (id, rank) relation; each list's
    rank column survives in the output as `<name>_rank` (NULL when the
    document is missing from that list) for auditability. Scale shape:
    the inputs are already top-k lists (k rows each), so fusion is
    full-outer joins + a row expression over k-sized relations —
    nothing corpus-sized."""
    out = None
    names = list(ranked)
    for name, df in ranked.items():
        c = df.select(F.col(id_col),
                      F.col(rank_col).cast("int").alias(f"{name}_rank"))
        out = c if out is None else out.join(c, id_col, "full_outer")
    score = None
    for name in names:
        term = F.coalesce(
            F.lit(1.0) / (F.lit(k0) + F.col(f"{name}_rank")).cast("double"),
            F.lit(0.0))
        score = term if score is None else score + term
    return out.select(id_col, *[f"{n}_rank" for n in names],
                      score.alias("rrf_score"))


# ---------------------------------------------------------------------------
# hashed linear quality classifier (fasttext-style): model-based document
# quality filtering, the gate production pretraining pipelines run after
# the heuristic filters. Features are the hashing trick (token -> one of
# HLC_DIM buckets via the portable hash), the model is a fixed linear
# layer over mean bucket weights + sigmoid. Weights live as an inlined
# literal array on BOTH engines (generated once from a seeded LCG,
# serialized via repr), so scoring is JVM-only here — element_at on a
# literal array, no join, no UDF — and bit-reproducible in the oracle.
# A real trained model drops in by replacing the weight list; the
# plumbing (hashing trick, mean pooling, decimal-exact summation) is
# the part that has to survive 100 TB.

HLC_DIM = 256
HLC_SEED = 77


def hlc_weights(dim: int = HLC_DIM, seed: int = HLC_SEED) -> list[float]:
    """Deterministic stand-in weight vector in (-1, 1).

    Full-double-precision values (state/2^63), NOT round decimal
    fractions: grid-aligned weights make the pooled mean land exactly ON
    6dp rounding boundaries, where Spark (BigDecimal HALF_UP) and DuckDB
    (float rounding) legitimately disagree. Generic doubles put boundary
    hits at measure ~0 — the same reason the ln()-valued BM25
    contributions round consistently."""
    out, state = [], seed
    for _ in range(dim):
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        out.append(state / 2.0**63 * 2.0 - 1.0)
    return out


def _hlc_idx(term: "F.Column", dim: int, seed: int):
    from etl_online_retail_spark.functions.hashing import (
        affine,
        hash_family,
        poly_hash,
    )

    a, b = hash_family(1, seed)[0]
    return F.pmod(affine(poly_hash(term), a, b), F.lit(dim))


def hashed_linear_score(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", dim: int = HLC_DIM,
                        seed: int = HLC_SEED) -> DataFrame:
    """Per-document classifier score: z = mean over tokens of
    w[hash(token) % dim]; p_keep = sigmoid(z). Output (id, n_tokens,
    z, p_keep) with the BM25 float discipline (per-token contributions
    rounded to 9dp, summed as DECIMAL — order-independent; final values
    rounded to 6dp).

    Scale shape: one explode + element_at against a literal weight array
    (broadcast-free constant folding) + one hash aggregation per doc."""
    w_arr = F.array(*[F.lit(x) for x in hlc_weights(dim, seed)])
    toks = corpus_terms(docs, id_col, text_col)
    contrib = toks.select(
        F.col(id_col),
        F.round(F.element_at(w_arr, _hlc_idx(F.col("term"), dim, seed)
                             .cast("int") + F.lit(1)), 9)
        .cast("decimal(18,9)").alias("_c"))
    agg = (contrib.groupBy(id_col)
           .agg(F.count(F.lit(1)).alias("n_tokens"),
                F.sum("_c").alias("_zsum")))
    z = F.round(F.col("_zsum").cast("double")
                / F.col("n_tokens").cast("double"), 6)
    return (agg.withColumn("z", z)
            .withColumn("p_keep",
                        F.round(F.lit(1.0)
                                / (F.lit(1.0) + F.exp(-F.col("z"))), 6))
            .select(id_col, "n_tokens", "z", "p_keep"))


def hashed_linear_score_sql(dim: int = HLC_DIM,
                            seed: int = HLC_SEED) -> str:
    """DuckDB twin (same inlined weights, same hash, same rounding)."""
    from etl_online_retail_spark.functions.hashing import (
        affine_sql,
        hash_family,
        poly_hash_sql,
    )
    from etl_online_retail_spark.functions.text import normalize_sql

    a, b = hash_family(1, seed)[0]
    weights = "[" + ", ".join(repr(x) for x in hlc_weights(dim, seed)) \
        + "]::DOUBLE[]"
    norm = normalize_sql("text")
    idx = (f"(({affine_sql(poly_hash_sql('term'), a, b)}) % {dim} + {dim}) "
           f"% {dim}")
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim({norm}), '\\s+')) AS term
  FROM documents WHERE trim({norm}) <> ''),
contrib AS (
  SELECT doc_id,
         CAST(ROUND(({weights})[{idx} + 1], 9) AS DECIMAL(18,9)) AS c
  FROM toks),
agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         ROUND(CAST(SUM(c) AS DOUBLE) / COUNT(*)::DOUBLE, 6) AS z
  FROM contrib GROUP BY doc_id)
SELECT doc_id, n_tokens, z,
       ROUND(CAST(1.0 AS DOUBLE)
             / (CAST(1.0 AS DOUBLE) + exp(-z)), 6) AS p_keep
FROM agg"""


def tfidf_pair_cosine(docs: DataFrame, pairs: DataFrame,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """TF-IDF weighted cosine similarity for a CANDIDATE PAIR relation —
    the lexical scoring stage that sits behind any candidate generator
    (MinHash bands, LSH buckets, blocking keys): candidates are cheap and
    noisy, the TF-IDF cosine is the calibrated verdict.

        w(d, t) = tf(d, t) * (ln(N / df(t)) + 1)
        cos(a, b) = sum_t w(a,t) * w(b,t) / (||w(a)|| * ||w(b)||)

    Output: (id_a, id_b, tfidf_cos 6dp). Float discipline matches BM25:
    per-term products and per-doc norm-square contributions round to 9dp
    and sum as DECIMAL (order-independent), with one final double
    division — ln/sqrt are pointwise-deterministic on both engines.

    Scale shape: tf/df/norms are corpus-linear hash aggs (the tf relation
    is cached — it feeds the norm agg AND both pair sides); the scoring
    joins are OUTPUT-bound (pairs x shared terms), never corpus x corpus.
    """
    toks = corpus_terms(docs, id_col, text_col).cache()
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("term").agg(
        F.count_distinct(F.col(id_col)).alias("df"))
    n_docs = toks.select(id_col).distinct().count()
    w = (tf.join(df, "term")
         .select(F.col(id_col), F.col("term"),
                 (F.col("tf")
                  * (F.log(F.lit(float(n_docs)) / F.col("df")) + 1.0))
                 .alias("_w"))
         .cache())
    norms = (w.groupBy(id_col)
             .agg(F.sqrt(F.sum(F.round(F.col("_w") * F.col("_w"), 9)
                               .cast("decimal(18,9)")).cast("double"))
                  .alias("_n")))
    wa = w.select(F.col(id_col).alias("id_a"), "term",
                  F.col("_w").alias("_wa"))
    wb = w.select(F.col(id_col).alias("id_b"), "term",
                  F.col("_w").alias("_wb"))
    num = (pairs.join(wa, "id_a").join(wb, ["id_b", "term"])
           .groupBy("id_a", "id_b")
           .agg(F.sum(F.round(F.col("_wa") * F.col("_wb"), 9)
                      .cast("decimal(18,9)")).cast("double").alias("_num")))
    na = norms.select(F.col(id_col).alias("id_a"), F.col("_n").alias("_na"))
    nb = norms.select(F.col(id_col).alias("id_b"), F.col("_n").alias("_nb"))
    # LEFT norm joins (r7 review): a pair whose document has no tokens
    # must emit tfidf_cos = 0.0 (the zero-vector convention), not vanish
    # from the output — inner joins silently deleted such pairs
    cos = F.when(F.col("_na").isNull() | F.col("_nb").isNull(), F.lit(0.0))         .otherwise(F.coalesce(F.col("_num"), F.lit(0.0))
                   / (F.col("_na") * F.col("_nb")))
    return (pairs.join(num, ["id_a", "id_b"], "left")
            .join(na, "id_a", "left").join(nb, "id_b", "left")
            .select("id_a", "id_b",
                    F.round(cos, 6).alias("tfidf_cos")))
