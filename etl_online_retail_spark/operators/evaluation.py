"""Model-evaluation data ops: exact match + multiset token overlap/F1.

The evaluation side of a training pipeline scores prediction columns
against references at corpus scale: normalized EXACT MATCH and
token-level F1 (SQuAD-style — multiset token overlap, so a repeated
token only counts as many times as both sides contain it).

Scale shape: exact match is a pure map stage. Token overlap avoids the
per-row quadratic HOF (filter-per-distinct-token is O(tokens^2) inside
one row) AND the double self-join: both sides' tokens go through ONE
union tagged by side, ONE count per (id, token) and ONE sum of
per-token minimums per id — two hash aggregations co-partitioned on
the id, with only (id, token, count) triples ever riding the shuffle.
Counts are exact BIGINTs; precision/recall/F1 are single IEEE
divisions over them (bit-exact cross-engine, the gopher_quality_flags
convention).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_answer(col: Column | str) -> Column:
    """Whitespace collapse + trim + lowercase — the normalization both
    exact match and tokenization share (article stripping is
    benchmark-specific and stays out). COLLAPSE runs before TRIM:
    F.trim strips only 0x20 spaces, so trimming first would leave edge
    tabs/newlines to become phantom ' ' -> empty tokens (review r13)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def exact_match(pred: Column | str, ref: Column | str) -> Column:
    """NULL on either side scores False (a missing answer is wrong,
    not unknowable — NULL metrics would silently drop out of sums)."""
    return F.coalesce(normalize_answer(pred) == normalize_answer(ref),
                      F.lit(False)).alias("exact_match")


def _tokens(col: str) -> Column:
    """Normalized token array; NULL and whitespace-only answers are
    ZERO tokens (not NULL, not ['']) so every metric scores them 0
    instead of going NULL and vanishing from aggregates (review r13)."""
    norm = normalize_answer(col)
    return F.when(norm.isNotNull() & (F.length(norm) > 0),
                  F.split(norm, " ")) \
            .otherwise(F.expr("CAST(array() AS array<string>)"))


def token_overlap(df: DataFrame, pred_col: str, ref_col: str,
                  id_col: str = "doc_id") -> DataFrame:
    """id_col, n_pred, n_ref (token counts), n_overlap (MULTISET
    intersection size), f1 — 2*overlap/(n_pred+n_ref), the SQuAD token
    F1. Rows with zero overlap keep f1 = 0.0; token counts come from
    the normalized strings; a row where BOTH sides are empty/NULL has
    f1 = 0.0 by the 0/0 guard."""
    # ONE scan of df (review r13: the previous base + two explode legs
    # re-evaluated the upstream three times): both sides' tokens are
    # tagged inside ONE array (the transform lambdas touch only their
    # own argument — rule-7 safe), explode_outer keeps token-less rows
    # alive. Two hash aggregations, no join. id_col must be unique per
    # example — duplicate ids merge into one multiset. r14 (guide §2.3
    # "shuffle fewer bytes"): the per-side token totals are NOT carried
    # through the explode any more — n_pred/n_ref are recovered as the
    # sums of the per-token side counts (Σ_pc = |pred tokens| by
    # construction), so the exploded relation shuffles only
    # (id, token, p, r).
    p_toks = _tokens(pred_col)
    r_toks = _tokens(ref_col)
    pairs = F.concat(
        F.transform(p_toks, lambda t: F.struct(
            t.alias("t"), F.lit(1).alias("p"), F.lit(0).alias("r"))),
        F.transform(r_toks, lambda t: F.struct(
            t.alias("t"), F.lit(0).alias("p"), F.lit(1).alias("r"))))
    ex = df.select(F.col(id_col), F.explode_outer(pairs).alias("_e"))
    per_tok = (ex.groupBy(id_col, F.col("_e.t").alias("_tok"))
               .agg(F.sum("_e.p").alias("_pc"),
                    F.sum("_e.r").alias("_rc")))
    return (per_tok.groupBy(id_col)
            .agg(F.sum("_pc").alias("n_pred"),
                 F.sum("_rc").alias("n_ref"),
                 F.sum(F.least("_pc", "_rc")).alias("n_overlap"))
            .withColumn("n_pred",
                        F.coalesce(F.col("n_pred"), F.lit(0))
                        .cast("bigint"))
            .withColumn("n_ref",
                        F.coalesce(F.col("n_ref"), F.lit(0))
                        .cast("bigint"))
            .withColumn("n_overlap",
                        F.coalesce(F.col("n_overlap"), F.lit(0))
                        .cast("bigint"))
            .withColumn("f1",
                        F.when(F.col("n_pred") + F.col("n_ref") > 0,
                               F.lit(2.0) * F.col("n_overlap")
                               / (F.col("n_pred") + F.col("n_ref")))
                        .otherwise(F.lit(0.0))))


def eval_summary(df: DataFrame, pred_col: str, ref_col: str,
                 id_col: str = "doc_id",
                 group_col: str = "source") -> DataFrame:
    """Per-group scorecard: example count, exact matches, and the exact
    integer overlap/token sums macro-F1 is computed from (the sums are
    hash-stable; the division happens once per group)."""
    ov = token_overlap(df, pred_col, ref_col, id_col)
    em = df.select(F.col(id_col), F.col(group_col),
                   exact_match(pred_col, ref_col).alias("_em"))
    return (ov.join(em, id_col)
            .groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("n_examples"),
                 F.sum(F.col("_em").cast("bigint")).alias("n_exact"),
                 F.sum("n_overlap").cast("bigint").alias("overlap_sum"),
                 F.sum("n_pred").cast("bigint").alias("pred_tok_sum"),
                 F.sum("n_ref").cast("bigint").alias("ref_tok_sum")))


def pass_at_k(df: DataFrame, task_col: str = "task_id",
              passed_col: str = "passed",
              ks: tuple[int, ...] = (1, 3)) -> DataFrame:
    """Unbiased pass@k (Chen et al. 2021, "Evaluating Large Language
    Models Trained on Code" eq. 1): per task with n sampled candidates
    of which c pass,

        pass@k = 1 - C(n-c, k) / C(n, k)
               = 1 - prod_{i=0}^{k-1} (n - c - i) / (n - i)

    computed as that UNROLLED left-to-right product (k is a literal, so
    no HOF and no lambda — the product is a fixed expression tree,
    bit-exact cross-engine; pass_at_k_sql emits the identical tree).
    When n - c < k one factor is exactly 0.0 and pass@k is exactly 1;
    when n < k the estimator is undefined -> NULL. One hash
    aggregation per task, then a pure map stage. A NULL passed value
    counts as a FAILING sample (coalesced to false EXPLICITLY — a
    crashed harness run is a fail in code-eval convention; callers who
    mean "unscored, exclude it" must filter first). Review r13: the
    previous implicit behavior (NULL in n but not in c) had the same
    value with no stated policy.

    Output: (task, n, c, pass_at_<k>...) — per-task grain only; a
    corpus mean of IEEE doubles is order-dependent, so averaging is
    left to callers who don't need hash-stable output."""
    per = (df.groupBy(F.col(task_col).alias("task"))
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.coalesce(F.col(passed_col), F.lit(False))
                       .cast("long")).alias("c")))
    nd = F.col("n").cast("double")
    ncd = (F.col("n") - F.col("c")).cast("double")
    for k in ks:
        prod = F.lit(1.0)
        for i in range(k):
            prod = prod * ((ncd - i) / (nd - i))
        per = per.withColumn(
            f"pass_at_{k}",
            F.when(F.col("n") >= k, F.lit(1.0) - prod))
    return per


def pass_at_k_sql(k: int, n_expr: str = "n", c_expr: str = "c") -> str:
    """The pass@k SQL twin — the SAME unrolled product tree as
    pass_at_k, generated from the same loop so the two cannot drift."""
    prod = "1.0"
    for i in range(k):
        prod = (f"({prod} * ((CAST({n_expr} - {c_expr} AS DOUBLE) - {i})"
                f" / (CAST({n_expr} AS DOUBLE) - {i})))")
    return f"CASE WHEN {n_expr} >= {k} THEN 1.0 - {prod} END"
