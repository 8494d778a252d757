"""Inter-annotator agreement: confusion matrix + Cohen's kappa.

Labeled-data QA for training pipelines: two annotators (humans, or a
model judged against a human) label the same items; agreement beyond
chance is the signal that the labels are usable. Cohen's kappa
(po - pe) / (1 - pe) reduces to EXACT integer arithmetic:

    kappa = (n * n_agree - pe_num) / (n^2 - pe_num)
    pe_num = sum_k n_ak * n_bk     (marginal products per label k)

so the whole statistic is exact BIGINT counting plus ONE IEEE
division (cross-engine bit-exact, the gopher_quality_flags
convention). When the denominator is zero (both marginal
distributions concentrated on one identical label: pe = 1) kappa is
undefined and returned as NULL.

Scale shape (r14): item count is the big dimension (billions of
labeled rows); labels per annotator are the small one. Each operator
scans the item-scaled input EXACTLY ONCE, reducing it to its smallest
sufficient grain — the (group, label_a, label_b) confusion relation
for Cohen, the (group, item) panel relation (with per-item label
counts carried as a bounded struct list) for Fleiss/alpha — and
materializes that reduced relation with an EAGER localCheckpoint.
Every downstream marginal/total then derives from the materialized
grain: no repeated scans of the rating log, and (unlike the previous
`.cache()` with no unpersist path) nothing stays pinned in the cache
manager once the returned DataFrame is dropped — checkpoint blocks
are released by the context cleaner with the RDD, closing the
storage-growth leak flagged in the r13 review.

NULL is ONE MORE LABEL, consistently on both sides of every statistic
(NULL-safe equality for observed agreement AND for the marginal
join): po and pe must range over the same label space or the chance
correction stops meaning anything. The same NULL-safety applies to
the GROUP key: every group-grain join is eqNullSafe, so a NULL group
value keeps its marginal products instead of silently reporting
kappa = po (r13 advice). Callers who consider missing labels or
groups invalid should filter before calling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_online_retail_spark.session import cut_lineage

_GRP = "_kappa_grp"


def _join_grp(left: DataFrame, right: DataFrame,
              how: str = "left") -> DataFrame:
    """Group-grain join that keeps NULL group values paired
    (eqNullSafe — plain equality would drop the NULL group's row from
    one side and silently corrupt the statistic, r13 advice)."""
    r = right.withColumnRenamed(_GRP, "_grp_r")
    return (left.join(r, F.col(_GRP).eqNullSafe(F.col("_grp_r")), how)
            .drop("_grp_r"))


def confusion_matrix(labels: DataFrame, a_col: str = "label_a",
                     b_col: str = "label_b") -> DataFrame:
    """Counts at the (label_a, label_b) grain — one hash aggregation;
    the raw matrix behind kappa and any per-class drill-down."""
    return (labels.groupBy(F.col(a_col).alias("label_a"),
                           F.col(b_col).alias("label_b"))
            .agg(F.count(F.lit(1)).alias("n")))


def cohens_kappa(labels: DataFrame, a_col: str = "label_a",
                 b_col: str = "label_b",
                 group_col: str | None = None) -> DataFrame:
    """(group?, n, n_agree, pe_num, kappa) per group (or one global
    row when group_col is None). n/n_agree/pe_num are the exact
    BIGINTs kappa derives from — emitted so downstream re-weighting
    (pooled kappa across groups) never re-reads the items.

    One scan of the item-scaled input: the (group, a, b) confusion
    grain is materialized first (bounded by |labels|^2 per group) and
    totals/marginals derive from it — the previous shape scanned the
    rating log three times (totals + each marginal)."""
    g = F.col(group_col) if group_col else F.lit(0)
    base = labels.select(g.alias(_GRP),
                         F.col(a_col).alias("_a"), F.col(b_col).alias("_b"))
    zero = F.lit(0).cast("long")
    kl = (base.groupBy(_GRP, "_a", "_b")
          .agg(F.count(F.lit(1)).alias("_c"))
          .transform(cut_lineage))
    totals = kl.groupBy(_GRP).agg(
        F.sum("_c").alias("n"),
        F.sum(F.when(F.col("_a").eqNullSafe(F.col("_b")), F.col("_c"))
               .otherwise(zero)).alias("n_agree"))
    ma = (kl.groupBy(_GRP, "_a").agg(F.sum("_c").alias("_na"))
          .withColumnRenamed(_GRP, "_ga"))
    mb = (kl.groupBy(_GRP, "_b").agg(F.sum("_c").alias("_nb"))
          .withColumnRenamed(_GRP, "_gb"))
    pe = (ma.join(mb, F.col("_ga").eqNullSafe(F.col("_gb"))
                  & F.col("_a").eqNullSafe(F.col("_b")))
          .groupBy(F.col("_ga").alias(_GRP))
          .agg(F.sum(F.col("_na") * F.col("_nb")).alias("pe_num")))
    # LEFT join + coalesce: two annotators with fully DISJOINT label
    # sets produce no marginal-product row at all — that group must
    # report pe_num = 0, kappa = po, not silently vanish (review r13)
    out = (_join_grp(totals, pe, "left")
           .withColumn("pe_num",
                       F.coalesce(F.col("pe_num"),
                                  F.lit(0).cast("long")))
           .withColumn(
               "kappa",
               F.when(F.col("n") * F.col("n") - F.col("pe_num") != 0,
                      (F.col("n") * F.col("n_agree") - F.col("pe_num"))
                      .cast("double")
                      / (F.col("n") * F.col("n") - F.col("pe_num")))))
    if group_col:
        return out.withColumnRenamed(_GRP, group_col)
    return out.drop(_GRP)


def _panel(ratings: DataFrame, item_col: str, label_col: str,
           group_col: str | None) -> DataFrame:
    """The shared single-scan reduction for Fleiss/alpha: one pass from
    the rating log down to the (group, item) panel grain, carrying
    panel size (_m), the per-item agreement numerator (_ai) and the
    per-item label counts (_lcs — bounded by panel size), materialized
    with an eager localCheckpoint so every downstream statistic scans
    the reduced relation instead of re-reading the log."""
    g = F.col(group_col) if group_col else F.lit(0)
    base = ratings.select(g.alias(_GRP), F.col(item_col).alias("_item"),
                          F.col(label_col).alias("_lab"))
    il = (base.groupBy(_GRP, "_item", "_lab")
          .agg(F.count(F.lit(1)).alias("_c")))
    return (il.groupBy(_GRP, "_item")
            .agg(F.sum("_c").alias("_m"),
                 F.sum(F.col("_c") * (F.col("_c") - 1)).alias("_ai"),
                 F.collect_list(F.struct(F.col("_lab").alias("l"),
                                         F.col("_c").alias("c")))
                  .alias("_lcs"))
            .transform(cut_lineage))


def _label_totals(valid: DataFrame) -> DataFrame:
    """(group, label, total count) over the valid panel rows — the old
    shape re-joined the rating log (semi-join) to restrict label
    totals; the carried struct list makes it one explode + agg."""
    return (valid.select(_GRP, F.explode("_lcs").alias("_e"))
            .groupBy(_GRP, F.col("_e.l").alias("_lab"))
            .agg(F.sum("_e.c").alias("_t")))


def fleiss_kappa(ratings: DataFrame, item_col: str = "item_id",
                 label_col: str = "label", n_raters: int = 3,
                 group_col: str | None = None) -> DataFrame:
    """Fleiss' kappa: chance-corrected agreement for a FIXED number of
    raters per item, from long-format (item, label) rating rows.

        P_o = A / (N * n * (n-1)),  A = sum_i sum_c n_ic * (n_ic - 1)
        P_e = B / (N * n)^2,        B = sum_c (sum_i n_ic)^2
        kappa = (P_o - P_e) / (1 - P_e)

    Items that do not have EXACTLY n_raters ratings are dropped from
    the statistic and counted in n_dropped (Fleiss is undefined for
    ragged panels — use pairwise cohens_kappa or alpha-family metrics
    there). A and B are exact BIGINT sums; po/pe/kappa are the
    identical short chain of IEEE divisions on both engines (pe runs
    B / (Nn) / (Nn), never materializing (Nn)^2, so the integer side
    stays in int64 headroom for any N). kappa is NULL when pe = 1.
    NULL is one more label, as in cohens_kappa.

    Output: (group?, n_items, n_dropped, a_num, b_num, po, pe, kappa).
    Scale shape: see _panel — ONE scan of the rating log down to the
    (group, item) grain, then group-grain aggregations over the
    materialized panel; rating rows never ride a shuffle wider than
    group + item + label."""
    if n_raters < 2:
        raise ValueError("fleiss_kappa needs n_raters >= 2 "
                         "(agreement is pairwise)")
    im = _panel(ratings, item_col, label_col, group_col)
    valid = im.filter(F.col("_m") == n_raters)
    gstats = valid.groupBy(_GRP).agg(
        F.count(F.lit(1)).alias("n_items"), F.sum("_ai").alias("a_num"))
    dropped = im.groupBy(_GRP).agg(
        F.sum(F.when(F.col("_m") != n_raters, F.lit(1).cast("long"))
               .otherwise(F.lit(0).cast("long"))).alias("n_dropped"))
    bstats = _label_totals(valid).groupBy(_GRP).agg(
        F.sum(F.col("_t") * F.col("_t")).alias("b_num"))
    nn = F.col("n_items") * n_raters
    zl = F.lit(0).cast("long")
    # `dropped` covers EVERY group (it aggregates all items); gstats/
    # bstats only groups with >= 1 valid item. Driving the output from
    # dropped with left joins keeps an all-ragged group visible as
    # (n_items=0, n_dropped=K, kappa NULL) instead of losing it — the
    # docstring's "dropped AND counted" promise (review r13).
    out = (_join_grp(_join_grp(dropped, gstats), bstats)
           .withColumn("n_items", F.coalesce(F.col("n_items"), zl))
           .withColumn("a_num", F.coalesce(F.col("a_num"), zl))
           .withColumn("b_num", F.coalesce(F.col("b_num"), zl))
           .withColumn("po",
                       F.when(F.col("n_items") > 0,
                              F.col("a_num").cast("double")
                              / (nn * (n_raters - 1))))
           .withColumn("pe",
                       F.when(F.col("n_items") > 0,
                              F.col("b_num").cast("double") / nn / nn))
           .withColumn("kappa",
                       F.when(F.lit(1.0) - F.col("pe") != 0,
                              (F.col("po") - F.col("pe"))
                              / (F.lit(1.0) - F.col("pe"))))
           .select(_GRP, "n_items", "n_dropped", "a_num", "b_num",
                   "po", "pe", "kappa"))
    if group_col:
        return out.withColumnRenamed(_GRP, group_col)
    return out.drop(_GRP)


def krippendorff_alpha(ratings: DataFrame, item_col: str = "item_id",
                       label_col: str = "label",
                       group_col: str | None = None) -> DataFrame:
    """Krippendorff's alpha (nominal data) — chance-corrected
    agreement for RAGGED panels, the metric Fleiss' fixed-n constraint
    excludes. Items with m >= 2 ratings are "pairable"; single-rating
    items carry no agreement information and are counted in n_dropped
    (visible, never lost — the fleiss_kappa review lesson).

        A_o = (1/n) * sum_m S_m / (m - 1),
              S_m = sum over items with m ratings of sum_c n_ic(n_ic-1)
        A_e = sum_c n_c(n_c - 1) / (n (n - 1)),  n, n_c over pairable
        alpha = (A_o - A_e) / (1 - A_e)

    Exactness: S_m, n_c, n are exact BIGINTs; A_o folds the per-m
    terms in SORTED m order through the SAME sequential fold on both
    engines (F.aggregate vs list_reduce seeded with 0.0 — the EWMA
    precedent), so the handful of IEEE divisions/additions is
    bit-exact cross-engine. The per-m relation has at most
    max-panel-size rows per group — driver-tiny, never item-scaled.
    alpha is NULL when pe-side is degenerate (A_e = 1) or no pairable
    items exist.

    Output: (group?, n_ratings, n_items, n_dropped, ao, ae, alpha).
    Scale shape: see _panel (one scan of the rating log)."""
    im = _panel(ratings, item_col, label_col, group_col)
    pair = im.filter(F.col("_m") >= 2)
    zl = F.lit(0).cast("long")
    dropped = im.groupBy(_GRP).agg(
        F.sum(F.when(F.col("_m") < 2, F.lit(1).cast("long"))
               .otherwise(zl)).alias("n_dropped"))
    # per-panel-size sums, folded in sorted-m order (sequential fold:
    # both engines add the SAME doubles in the SAME order)
    sm = (pair.groupBy(_GRP, "_m")
          .agg(F.sum("_ai").alias("_s"))
          .select(_GRP,
                  F.struct(F.col("_m").alias("m"),
                           (F.col("_s").cast("double")
                            / (F.col("_m") - 1)).alias("t")).alias("_e")))
    ao_num = (sm.groupBy(_GRP)
              .agg(F.aggregate(
                  F.array_sort(F.collect_list("_e")), F.lit(0.0),
                  lambda acc, e: acc + e["t"]).alias("_ao_num")))
    stats = pair.groupBy(_GRP).agg(
        F.count(F.lit(1)).alias("n_items"))
    ne = _label_totals(pair).groupBy(_GRP).agg(
        F.sum("_t").alias("n_ratings"),
        F.sum(F.col("_t") * (F.col("_t") - 1)).alias("_e_num"))
    n = F.col("n_ratings")
    out = (_join_grp(_join_grp(_join_grp(dropped, stats), ao_num), ne)
           .withColumn("n_items", F.coalesce(F.col("n_items"), zl))
           .withColumn("n_ratings", F.coalesce(n, zl))
           .withColumn("ao",
                       F.when(n >= 2, F.col("_ao_num") / n))
           .withColumn("ae",
                       F.when(n >= 2,
                              F.col("_e_num").cast("double")
                              / n / (n - 1)))
           .withColumn("alpha",
                       F.when(F.lit(1.0) - F.col("ae") != 0,
                              (F.col("ao") - F.col("ae"))
                              / (F.lit(1.0) - F.col("ae"))))
           .select(_GRP, "n_ratings", "n_items", "n_dropped",
                   "ao", "ae", "alpha"))
    if group_col:
        return out.withColumnRenamed(_GRP, group_col)
    return out.drop(_GRP)
